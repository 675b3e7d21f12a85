"""Supervised quality classification — the GPT-3 recipe (Brown et al.
2020, appendix A; also WebText's "looks like a good page" filter):
train a linear classifier on hashed n-gram features to separate a
small POSITIVE corpus (wiki/books-like) from the raw crawl, score
every document, and keep a doc iff
``score >= 1 - X`` with ``X ~ Pareto(alpha)`` — the published
stochastic acceptance rule that keeps mostly-high-quality text without
hard-truncating the distribution. The unsupervised complement is DSIR
(stages/dsir.py); both share the hashed-feature extractor.

Ray-Data-first shape:
* features: stages.dsir._feature_buckets (hashed unigrams+bigrams,
  ``num_buckets`` dims) — per-batch CSR-style bincounts, vectorized;
* training: full-batch logistic regression via per-batch gradient
  PARTIALS (one (num_buckets,) vector + scalar loss per batch reaches
  the driver — mergeable, order-independent up to float addition) and
  a driver-side Adam loop — the same partial/reduce idiom as the CRF
  trainers (stages/train.py); epochs stream the corpus, nothing
  corpus-sized materializes;
* scoring: map-only with the weight vector broadcast once;
* the Pareto draw is deterministic — X = u^(-1/alpha) - 1 from the
  seed-stable per-id hash uniform (sampling.py contract), so the kept
  set is identical on any cluster size / layout / retry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.stages.dsir import DEFAULT_BUCKETS, _feature_buckets
from ner_ray.stages.sampling import _uniform01


def _batch_design(texts, num_buckets: int, n: int):
    """(rows, buckets, counts) sparse design of one batch; feature
    vectors are L1-normalized per doc (count / doc feature total) so
    long docs don't dominate the loss."""
    row, b = _feature_buckets(texts, num_buckets, n)
    if len(b) == 0:
        return row, b, np.zeros(0)
    # collapse duplicate (row, bucket) pairs
    key = row.astype(np.int64) * num_buckets + b
    uniq, cnt = np.unique(key, return_counts=True)
    rows = (uniq // num_buckets).astype(np.int64)
    buckets = (uniq % num_buckets).astype(np.int64)
    totals = np.bincount(rows, weights=cnt)
    return rows, buckets, cnt / totals[rows]


def _margins(rows, buckets, vals, w, b, n_rows):
    z = np.bincount(rows, weights=vals * w[buckets], minlength=n_rows)
    return z + b


def fit_quality_classifier(pos_ds, neg_ds, text_col: str = "text",
                           num_buckets: int = DEFAULT_BUCKETS,
                           n: int = 2, epochs: int = 20,
                           lr: float = 0.5, l2: float = 1e-6,
                           seed: int = 0,
                           pos_weight: float | None = None) -> dict:
    """Distributed full-batch logistic regression: label 1 = pos_ds,
    0 = neg_ds. Each epoch streams both datasets once, collecting
    per-batch (gradient, loss, count) partials; the driver runs Adam.
    ``pos_weight`` re-weights every positive example (the standard
    class-balance fix when the positive corpus is tiny against the raw
    crawl — pass n_neg/n_pos to calibrate scores around 0.5; default
    1.0 keeps plain unweighted likelihood). Returns
    {"w", "b", "num_buckets", "n", "loss_curve"}."""
    rng = np.random.default_rng(seed)
    w = rng.normal(scale=1e-3, size=num_buckets)
    bias = 0.0
    m = np.zeros(num_buckets + 1)
    v = np.zeros(num_buckets + 1)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    losses = []

    omega = 1.0 if pos_weight is None else float(pos_weight)

    def partials(ds, label):
        wt = omega if label == 1.0 else 1.0

        def grad(t: pa.Table) -> pa.Table:
            rows, buckets, vals = _batch_design(
                t.column(text_col), num_buckets, n)
            nr = len(t)
            z = _margins(rows, buckets, vals, w, bias, nr)
            p = 1.0 / (1.0 + np.exp(-z))
            err = wt * (p - label)               # dL/dz per doc
            if len(buckets):
                g = np.bincount(buckets, weights=vals * err[rows],
                                minlength=num_buckets)
            else:
                g = np.zeros(num_buckets)
            loss = wt * float(np.sum(
                np.logaddexp(0.0, z) - label * z))
            out = np.concatenate(
                [g, [err.sum(), loss, wt * float(nr)]])
            return pa.table({"p": pa.array(out)})

        return [bb.column("p").to_numpy(zero_copy_only=False)
                for bb in ds.map_batches(grad, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")]

    for step in range(1, epochs + 1):
        parts = partials(pos_ds, 1.0) + partials(neg_ds, 0.0)
        tot = np.concatenate(parts).reshape(-1, num_buckets + 3) \
            .sum(axis=0)
        cnt = max(tot[-1], 1.0)
        g = np.concatenate([tot[:num_buckets], [tot[num_buckets]]]) \
            / cnt
        g[:num_buckets] += l2 * w
        losses.append(tot[num_buckets + 1] / cnt)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        mh = m / (1 - beta1 ** step)
        vh = v / (1 - beta2 ** step)
        upd = lr * mh / (np.sqrt(vh) + eps)
        w = w - upd[:num_buckets]
        bias = bias - upd[num_buckets]
    return {"w": w, "b": bias, "num_buckets": num_buckets, "n": n,
            "loss_curve": losses}


def classifier_scores(ds, model: dict, text_col: str = "text",
                      score_col: str = "quality_score"):
    """Append P(positive) per doc. Map-only; weights broadcast once."""
    import ray

    ref = ray.put((model["w"], model["b"]))
    num_buckets, n = model["num_buckets"], model["n"]

    def fn(t: pa.Table) -> pa.Table:
        w, b = ray.get(ref)
        rows, buckets, vals = _batch_design(
            t.column(text_col), num_buckets, n)
        z = _margins(rows, buckets, vals, w, b, len(t))
        p = 1.0 / (1.0 + np.exp(-z))
        return t.append_column(score_col, pa.array(p))

    return ds.map_batches(fn, batch_format="pyarrow")


def pareto_filter(ds, model: dict, alpha: float = 9.0,
                  text_col: str = "text", id_col: str = "doc_id",
                  seed: int = 42, score_col: str = "quality_score"):
    """GPT-3's acceptance rule: keep a doc iff
    ``score >= 1 - X, X ~ Pareto(alpha)`` (high-score docs almost
    always survive; low-score docs survive with heavy-tailed luck, so
    the output isn't a hard cliff at a threshold). The draw is
    X = u^(-1/alpha) - 1 from the per-id hash uniform — deterministic,
    layout/retry independent. One map-only pass; returns survivors
    with the score column attached."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    scored = classifier_scores(ds, model, text_col=text_col,
                               score_col=score_col)

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        u = _uniform01(t.column(id_col), seed)
        u = np.clip(u, 1e-12, 1.0)
        x = np.power(u, -1.0 / alpha) - 1.0
        s = t.column(score_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s >= 1.0 - x))

    return scored.map_batches(keep, batch_format="pyarrow")
