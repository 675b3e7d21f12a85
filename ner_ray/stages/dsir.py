"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a small TARGET corpus (the "make 100 TB of web
look like Wikipedia+books" move). The public recipe:

1. featurize every doc as a bag of hashed unigrams+bigrams over
   ``num_buckets`` buckets;
2. fit two multinomial bucket models — target p and raw q — from
   feature counts (add-alpha smoothing);
3. importance log-weight of a doc = sum over its features of
   log p_f - log q_f;
4. resample without replacement via Gumbel top-k on the log-weights.

Ray-Data-first shape:
* model fitting is per-batch ``bincount`` partials -> ONE
  groupby(bucket).sum — only (bucket, count) scalars shuffle, the
  model is ``num_buckets`` floats (driver-sized by construction);
* scoring is ONE map-only pass with the log-ratio vector broadcast via
  ``ray.put`` (factorized token hashing, vectorized bincount dot);
* selection is deterministic: the Gumbel noise comes from the
  seed-stable per-id hash uniform (sampling.py's contract), so the
  selected set is identical on any cluster size / layout / retry; the
  keep threshold is a histogram quantile (lmscore.score_quantiles) —
  no global sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.stages.lmscore import (_batch_tokens, score_minmax,
                                    score_quantiles)
from ner_ray.stages.sampling import _uniform01
from ner_ray.util.hashing import combine_hashes, hash_column, to_bucket

DEFAULT_BUCKETS = 10_000


def _feature_buckets(texts, num_buckets: int,
                     n: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, bucket) of every hashed unigram (and bigram when
    ``n >= 2``; bigrams never pair across row boundaries)."""
    row, flat = _batch_tokens(texts)
    if len(flat) == 0:
        return (np.array([], dtype=np.int64),
                np.array([], dtype=np.int64))
    h = hash_column(flat)
    rows, buckets = [row], [to_bucket(h, num_buckets)]
    if n >= 2 and len(h) > 1:
        same = row[1:] == row[:-1]
        if same.any():
            bg = combine_hashes(h[:-1][same], h[1:][same])
            rows.append(row[:-1][same])
            buckets.append(to_bucket(bg, num_buckets))
    return np.concatenate(rows), np.concatenate(buckets)


def hashed_ngram_counts(ds, text_col: str = "text",
                        num_buckets: int = DEFAULT_BUCKETS,
                        n: int = 2) -> np.ndarray:
    """Corpus-wide hashed-feature count vector (len ``num_buckets``).
    Per-batch bincount partials emit only NONZERO (bucket, count) rows;
    one groupby(bucket).sum reduces; the driver sees at most
    ``num_buckets`` rows."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        _, b = _feature_buckets(t.column(text_col), num_buckets, n)
        c = np.bincount(b, minlength=num_buckets).astype(np.int64)
        nz = np.flatnonzero(c)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(c[nz])})

    out = np.zeros(num_buckets, dtype=np.float64)
    for bt in ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("bucket").aggregate(Sum("n", alias_name="n")) \
            .iter_batches(batch_format="pyarrow"):
        idx = bt.column("bucket").to_numpy(zero_copy_only=False)
        out[idx] += bt.column("n").to_numpy(zero_copy_only=False)
    return out


def fit_dsir(target_ds, raw_ds, text_col: str = "text",
             num_buckets: int = DEFAULT_BUCKETS, n: int = 2,
             alpha: float = 1.0) -> dict:
    """Fit the importance model: log_ratio[f] = log p_target(f) -
    log p_raw(f) with add-``alpha`` smoothing. Two counting passes
    (target is small by contract; raw streams once)."""
    tc = hashed_ngram_counts(target_ds, text_col, num_buckets, n)
    rc = hashed_ngram_counts(raw_ds, text_col, num_buckets, n)
    lp = np.log(tc + alpha) - np.log(tc.sum() + alpha * num_buckets)
    lq = np.log(rc + alpha) - np.log(rc.sum() + alpha * num_buckets)
    return {"log_ratio": lp - lq, "num_buckets": num_buckets, "n": n}


def dsir_weights(ds, model: dict, text_col: str = "text",
                 weight_col: str = "dsir_logw"):
    """Append each doc's importance log-weight (sum of its features'
    log-ratios). Map-only; the (num_buckets,) vector broadcasts once."""
    import ray

    ref = ray.put(model["log_ratio"])
    num_buckets, n = model["num_buckets"], model["n"]

    def fn(t: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        row, b = _feature_buckets(t.column(text_col), num_buckets, n)
        w = np.bincount(row, weights=lr[b], minlength=len(t)) \
            if len(b) else np.zeros(len(t))
        return t.append_column(weight_col, pa.array(w.astype(np.float64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def dsir_select(ds, model: dict, fraction: float,
                text_col: str = "text", id_col: str = "doc_id",
                seed: int = 42, gumbel: bool = True,
                weight_col: str = "dsir_logw", bins: int = 8192,
                materialize: bool = True):
    """Keep ~``fraction`` of the corpus by importance resampling:
    score = logw + Gumbel(hash(id, seed)) (the paper's without-
    replacement sampler, made deterministic by drawing the noise from
    the seed-stable id-hash uniform), thresholded at the score's
    (1 - fraction) histogram quantile. ``gumbel=False`` degenerates to
    hard top-fraction selection by weight. Returns the surviving rows
    with the weight column attached; the threshold is approximate to
    (score range / bins) — the histogram avoids a global sort.
    Three passes (score+min/max, histogram, filter), all map-dominated.
    The scored stream is consumed twice (quantile + filter), so it pins
    via ``materialize()`` by default; ``materialize=False`` re-executes
    the upstream per consumer instead (zero pinned footprint — right
    for corpora near cluster memory; scoring is deterministic, so both
    modes select identical rows).
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0,1], got {fraction}")
    scored = dsir_weights(ds, model, text_col=text_col,
                          weight_col=weight_col)

    def with_noise(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        if gumbel and len(t):
            u = _uniform01(t.column(id_col), seed)
            # clamp away from 0/1 so the double log stays finite
            u = np.clip(u, 1e-12, 1 - 1e-12)
            w = w + (-np.log(-np.log(u)))
        return t.append_column("_dsir_score",
                               pa.array(w.astype(np.float64)))

    noisy = scored.map_batches(with_noise, batch_format="pyarrow")
    if materialize:
        noisy = noisy.materialize()
    if fraction >= 1.0:
        thresh = -np.inf
    else:
        lo, hi = score_minmax(noisy, "_dsir_score")
        if hi <= lo:
            # degenerate constant scores (e.g. a zero log-ratio model
            # with gumbel=False): any score threshold keeps 0% or 100%,
            # silently ignoring ``fraction``. Fall back to the exact
            # seed-stable hash-threshold sampler so ~fraction survives
            # deterministically regardless of the flat weights.
            import logging

            logging.getLogger(__name__).warning(
                "dsir_select: all %d-bin scores equal (%.6g); falling "
                "back to hash-threshold sampling at fraction=%.4g",
                bins, lo, fraction)

            def keep_hash(t: pa.Table) -> pa.Table:
                u = _uniform01(t.column(id_col), seed) if len(t) \
                    else np.array([])
                return t.filter(pa.array(u < fraction)).drop_columns(
                    ["_dsir_score"])

            return noisy.map_batches(keep_hash, batch_format="pyarrow")
        (thresh,) = score_quantiles(noisy, "_dsir_score",
                                    (1.0 - fraction,), bins=bins,
                                    lohi=(lo, hi))

    def keep(t: pa.Table) -> pa.Table:
        s = t.column("_dsir_score").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s >= thresh)).drop_columns(
            ["_dsir_score"])

    return noisy.map_batches(keep, batch_format="pyarrow")
