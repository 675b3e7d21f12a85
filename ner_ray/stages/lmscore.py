"""Corpus-trained unigram language-model quality scoring — the CCNet
move (Wenzek et al., LREC 2020: score web text with an LM, split the
corpus into head/middle/tail quality buckets) rebuilt Ray-Data-first
with a unigram model trained ON the corpus itself (no external model
exists in this environment; the plumbing — train -> broadcast ->
score -> bucket — is exactly the KenLM-shaped pipeline's).

Scale shape:
* training is two bounded passes: per-batch token-count partials
  (group_by inside the batch — only (token, count) scalars shuffle)
  -> one global groupby sum over the vocabulary -> top-K heavy
  hitters kept (vocab rows, never corpus rows, reach the sort);
* the model (<=top_k tokens + log-probs, ~16 B/token) broadcasts once
  via ``ray.put``; scoring is ONE map-only pass (factorize the batch's
  tokens, searchsorted into the sorted vocab, bincount per row) — no
  shuffle, no driver loop;
* bucketing thresholds come from an exact-count histogram quantile
  (two scalar-only passes; error bounded by the score range / bins,
  documented at score_quantiles) so no global sort is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _batch_tokens(texts) -> tuple[np.ndarray, pd.Series]:
    """(row_idx, token) for every whitespace token in the batch."""
    s = pc.fill_null(texts, "").to_pandas()
    words = s.str.split()
    counts = words.str.len().fillna(0).to_numpy(dtype=np.int64)
    flat = words.explode(ignore_index=True).dropna().reset_index(drop=True)
    row = np.repeat(np.arange(len(s)), counts)
    return row, flat


def train_unigram(docs_ds, text_col: str = "text",
                  top_k: int = 1_000_000) -> dict:
    """Token frequencies over the corpus -> unigram log-prob model.
    Returns {"tokens": sorted str ndarray, "logp": float64 ndarray,
    "oov_logp": float, "total": int}. Tokens beyond the top_k heavy
    hitters (and unseen tokens at scoring time) get the floor
    probability 0.5/total (an add-half OOV floor)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        _, flat = _batch_tokens(t.column(text_col))
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"tok": pa.array(flat)}).group_by("tok") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["tok", "n"])

    counts = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("n", alias_name="n"))
    head = counts.sort("n", descending=True).limit(top_k).to_pandas()
    total = int(head["n"].sum())
    # tokens dropped by the top-K cut still count toward `total`?
    # No: total is the kept mass — the OOV floor then upper-bounds
    # every dropped token's probability, keeping scores monotone.
    order = np.argsort(head["tok"].to_numpy())
    tokens = head["tok"].to_numpy()[order]
    n = head["n"].to_numpy()[order].astype(np.float64)
    return {
        "tokens": tokens,
        "logp": np.log(n / max(total, 1)),
        "oov_logp": float(np.log(0.5 / max(total, 1))),
        "total": total,
    }


def score_docs(docs_ds, model: dict, text_col: str = "text",
               score_col: str = "lm_score", round_to: int = 6):
    """Append per-doc mean negative log-prob under the unigram model
    (lower = more natural under the corpus distribution; empty docs
    score 0). Map-only: the model broadcasts once via ray.put."""
    import ray

    ref = ray.put((model["tokens"], model["logp"], model["oov_logp"]))

    def fn(t: pa.Table) -> pa.Table:
        tokens, logp, oov = ray.get(ref)
        row, flat = _batch_tokens(t.column(text_col))
        scores = np.zeros(len(t), dtype=np.float64)
        if len(flat):
            # factorize-first rule: look up each UNIQUE token once
            codes, uniq = pd.factorize(flat)
            idx = np.searchsorted(tokens, uniq.to_numpy())
            idx_c = np.minimum(idx, len(tokens) - 1)
            hit = (idx < len(tokens)) & (tokens[idx_c] == uniq.to_numpy())
            uniq_lp = np.where(hit, logp[idx_c], oov)
            tok_lp = uniq_lp[codes]
            per_row = np.bincount(row, weights=-tok_lp, minlength=len(t))
            n_tok = np.bincount(row, minlength=len(t))
            scores = np.where(n_tok > 0, per_row / np.maximum(n_tok, 1),
                              0.0)
        return t.append_column(score_col,
                               pa.array(np.round(scores, round_to)))

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def score_minmax(ds, col: str) -> tuple[float, float]:
    """(min, max) of a numeric column via per-batch partials — the
    first pass of ``score_quantiles``, exposed so callers can inspect
    the range (e.g. detect a degenerate constant column) without
    paying it twice."""
    import pyarrow.compute as pc

    stats = [(pc.min(b.column(col)).as_py(), pc.max(b.column(col)).as_py())
             for b in ds.map_batches(
                 lambda t: pa.table({
                     col: pa.array([pc.min(t.column(col)).as_py(),
                                    pc.max(t.column(col)).as_py()],
                                   pa.float64())}),
                 batch_format="pyarrow").iter_batches(
                     batch_format="pyarrow")]
    lo = min(s[0] for s in stats if s[0] is not None)
    hi = max(s[1] for s in stats if s[1] is not None)
    return lo, hi


def score_quantiles(ds, col: str, qs: tuple[float, ...],
                    bins: int = 8192,
                    lohi: tuple[float, float] | None = None) -> list[float]:
    """Approximate quantiles of a numeric column from an exact-count
    histogram: pass 1 min/max (skipped when the caller passes a
    precomputed ``lohi``), pass 2 per-batch histogram partials.
    Only (bins,) count vectors reach the driver; the quantile error is
    bounded by (max-min)/bins. Deterministic for given data."""
    lo, hi = lohi if lohi is not None else score_minmax(ds, col)
    if hi <= lo:
        return [lo for _ in qs]
    edges = np.linspace(lo, hi, bins + 1)

    def hist(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        h, _ = np.histogram(v, bins=edges)
        return pa.table({"h": pa.array(h.astype(np.int64))})

    # concatenate before reshaping: iter_batches may split the
    # bins-row histogram blocks at arbitrary boundaries
    parts = [b.column("h").to_numpy(zero_copy_only=False)
             for b in ds.map_batches(hist, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    total = np.concatenate(parts).reshape(-1, bins).sum(axis=0)
    cum = np.cumsum(total)
    n = cum[-1]
    out = []
    for q in qs:
        k = min(int(np.searchsorted(cum, q * n)), bins - 1)
        out.append(float(edges[k + 1]))
    return out


def perplexity_buckets(docs_ds, text_col: str = "text",
                       top_k: int = 1_000_000,
                       quantiles: tuple[float, float] = (1 / 3, 2 / 3),
                       model: dict | None = None,
                       bucket_col: str = "lm_bucket"):
    """The CCNet head/middle/tail split: train (or take) a unigram
    model, score every doc, cut at the score quantiles (head = lowest
    scores = most natural). Returns (bucketed_ds, thresholds, model).
    Three passes over the corpus (count, score+histogram, assign) —
    all map-dominated; nothing but scalars reaches the driver."""
    if model is None:
        model = train_unigram(docs_ds, text_col=text_col, top_k=top_k)
    scored = score_docs(docs_ds, model, text_col=text_col).materialize()
    t_head, t_mid = score_quantiles(scored, "lm_score", quantiles)

    def assign(t: pa.Table) -> pa.Table:
        s = t.column("lm_score").to_numpy(zero_copy_only=False)
        b = np.where(s <= t_head, "head",
                     np.where(s <= t_mid, "middle", "tail"))
        return t.append_column(bucket_col, pa.array(b, pa.string()))

    return scored.map_batches(assign, batch_format="pyarrow"), \
        (t_head, t_mid), model
