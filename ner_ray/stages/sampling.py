"""Deterministic sampling and domain mixing for training-data pipelines.

Ray's ``random_sample`` draws per task, so the surviving row set
depends on block layout and scheduling. At 100 TB a sample must be
reproducible and resumable, so these operators decide per ROW: keep a
row iff ``stable_hash(id, seed) / 2^64 < fraction``. The decision is a
pure function of (row id, seed) — identical on any cluster size, any
block layout, any retry — and map-only (no shuffle, no driver loop).

Domain mixing (the "data mixture" step before training): given target
proportions per domain (e.g. ``{"web": 0.6, "books": 0.4}``), compute
per-domain keep fractions that hit the targets exactly while keeping as
many rows as possible (the scarcest domain becomes the binding
constraint and is kept at fraction 1.0), then apply one stratified
hash-filter pass. The counting pass pre-aggregates per batch, so only
(domain, count) partials — bounded by #domains x #blocks — reach the
driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray.util.hashing import (
    combine_hashes,
    hash_column,
    hash_str,
    splitmix_hash,
)

_TWO64 = float(2 ** 64)


def _uniform01(ids, seed: int) -> np.ndarray:
    """Seed-stable U[0,1) per id (vectorized).

    Integer ids take the PORTABLE path (splitmix64 of the bit pattern
    — recomputable in any SQL engine; the DuckDB correctness oracle
    replicates it bit-exactly via hashing.sql_sample_uniform_ctes, so
    integer-keyed sampling decisions are value-matchable, not just
    self-consistent). String/other ids fall back to the SipHash-based
    hash_column (deterministic in-process, engine-specific).
    """
    if hasattr(ids, "to_pandas"):  # pyarrow Array / ChunkedArray
        ids = ids.to_pandas()
    s = ids if isinstance(ids, pd.Series) else pd.Series(ids)
    h = (splitmix_hash(s) if pd.api.types.is_integer_dtype(s.dtype)
         else hash_column(s))
    sconst = np.full(len(h), np.uint64(hash_str(f"sample-seed:{seed}")),
                     dtype=np.uint64)
    return combine_hashes(h, sconst).astype(np.float64) / _TWO64


def hash_sample(ds, fraction: float, id_col: str = "doc_id",
                seed: int = 42):
    """Deterministic Bernoulli(fraction) sample keyed on id hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        u = _uniform01(t.column(id_col), seed)
        return t.filter(pa.array(u < fraction))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, fractions: dict, key_col: str = "source",
                      id_col: str = "doc_id", seed: int = 42,
                      default_fraction: float = 0.0):
    """Per-domain deterministic sample: row kept iff its id-hash
    uniform is below ``fractions[row[key_col]]`` (domains absent from
    the dict use default_fraction). The fractions dict is a broadcast
    small side (closure-captured once, read per batch)."""
    bad = {k: v for k, v in fractions.items() if not 0.0 <= v <= 1.0}
    if bad or not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"fractions must be in [0,1]: {bad or default_fraction}")

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        u = _uniform01(t.column(id_col), seed)
        keys = t.column(key_col).to_pandas()
        # few uniques: factorize-first rule — map uniques, gather.
        # factorize codes nulls as -1, which would WRAP to the last
        # unique on the gather — route them to default_fraction
        codes, uniq = pd.factorize(keys)
        per_uniq = np.array([fractions.get(k, default_fraction)
                             for k in uniq], dtype=np.float64)
        if len(uniq):
            frac = np.where(codes >= 0,
                            per_uniq[np.maximum(codes, 0)],
                            default_fraction)
        else:
            frac = np.full(len(t), default_fraction)
        return t.filter(pa.array(u < frac))

    return ds.map_batches(keep, batch_format="pyarrow")


def domain_counts(ds, key_col: str = "source") -> dict:
    """Row count per domain via per-batch pre-aggregation; only tiny
    (domain, n) partials reach the driver."""
    def partial(t: pa.Table) -> pa.Table:
        return t.select([key_col]).group_by(key_col).aggregate(
            [([], "count_all")])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return {}
    agg = parts.groupby(key_col)["count_all"].sum()
    return {k: int(v) for k, v in agg.items()}


def mix_fractions(counts: dict, targets: dict) -> dict:
    """Per-domain keep fractions that realize the target proportions
    exactly (in expectation) while maximizing retained rows: the
    domain with the least headroom (count/target) binds at fraction
    1.0 and every other domain downsamples to match. Domains not in
    ``targets`` get fraction 0.0."""
    neg = {k: v for k, v in targets.items() if v < 0}
    if neg:
        raise ValueError(f"target weights must be >= 0: {neg}")
    tot = sum(targets.values())
    if tot <= 0:
        raise ValueError("targets must have positive total weight")
    targets = {k: v / tot for k, v in targets.items() if v > 0}
    missing = [k for k in targets if counts.get(k, 0) == 0]
    if missing:
        raise ValueError(f"target domains absent from corpus: {missing}")
    scale = min(counts[k] / w for k, w in targets.items())
    # the binding domain computes to exactly 1.0 in real arithmetic but
    # can land at 1.0 + eps in floats — clamp
    return {k: min(1.0, (scale * w) / counts[k]) for k, w in targets.items()}


def downsample_to_mix(ds, targets: dict, key_col: str = "source",
                      id_col: str = "doc_id", seed: int = 42):
    """Two streaming passes: count domains, then stratified hash-filter
    to the computed mix fractions. Returns (sampled_ds, fractions)."""
    counts = domain_counts(ds, key_col)
    fracs = mix_fractions(counts, targets)
    return stratified_sample(ds, fracs, key_col=key_col, id_col=id_col,
                             seed=seed), fracs


def token_counts(ds, text_col: str = "text",
                 key_col: str | None = None) -> dict:
    """Whitespace-token totals, per ``key_col`` domain (or one
    ``"__all__"`` total). Per-batch pre-aggregation: only (domain,
    token-sum) partials reach the driver. Token convention matches
    q_text_stats' n_tokens (len(str_split(text, ' ')), empty/null
    text = 0)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column(text_col), "")
        nw = pc.list_value_length(pc.split_pattern(txt, " "))
        nonempty = pc.not_equal(pc.utf8_trim_whitespace(txt), "")
        nw = pc.if_else(nonempty, nw, 0)
        key = (t.column(key_col) if key_col is not None
               else pa.array(["__all__"] * len(t)))
        g = pa.table({"k": key, "n": pc.cast(nw, pa.int64())}) \
            .group_by("k").aggregate([("n", "sum")])
        return g.rename_columns(["k", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return {}
    agg = parts.groupby("k")["n"].sum()
    return {k: int(v) for k, v in agg.items()}


def downsample_to_token_budget(ds, budget_tokens, text_col: str = "text",
                               key_col: str | None = None,
                               id_col: str = "doc_id", seed: int = 42):
    """Downsample so the EXPECTED retained token count meets a budget
    (the pre-training move: "at most B tokens from domain d"). Global
    form: ``key_col=None`` + int budget. Per-domain form: ``key_col``
    + ``{domain: budget}`` dict (domains absent from the dict keep
    fraction 1.0). Keep fraction per domain = min(1, budget/total);
    the keep decision is the same pure (id, seed) hash threshold as
    every sampler here — layout/retry/cluster-size independent, and
    the budget holds in expectation (per-doc length variance makes an
    exact cut order-dependent, which would break determinism).
    Returns (sampled_ds, fractions)."""
    counts = token_counts(ds, text_col=text_col, key_col=key_col)
    if key_col is None:
        if not isinstance(budget_tokens, (int, float)) or budget_tokens < 0:
            raise ValueError(f"global budget must be >= 0: {budget_tokens}")
        total = counts.get("__all__", 0)
        frac = 1.0 if total == 0 else min(1.0, budget_tokens / total)
        return hash_sample(ds, frac, id_col=id_col, seed=seed), \
            {"__all__": frac}
    if not isinstance(budget_tokens, dict):
        raise ValueError("per-domain form needs a {domain: budget} dict")
    bad = {k: v for k, v in budget_tokens.items() if v < 0}
    if bad:
        raise ValueError(f"budgets must be >= 0: {bad}")
    fracs = {}
    for dom, total in counts.items():
        b = budget_tokens.get(dom)
        fracs[dom] = (1.0 if b is None or total == 0
                      else min(1.0, b / total))
    return stratified_sample(ds, fracs, key_col=key_col, id_col=id_col,
                             seed=seed, default_fraction=1.0), fracs


def split_by_hash(ds, fractions: dict, id_col: str = "doc_id",
                  seed: int = 42) -> dict:
    """Deterministic disjoint-exhaustive dataset split (train/val/test).

    Each row lands in exactly ONE split: the named interval of [0, 1)
    its id-hash uniform falls in (fractions must sum to 1). Pure
    function of (id, seed) — identical membership on any cluster
    size / block layout / retry, and stratification is free: within
    every domain the uniforms are uniform, so per-domain proportions
    match the global fractions in expectation without a shuffle.
    Invariant (tested): the FIRST split equals ``hash_sample`` at the
    same fraction and seed, so a split's train set is consistent with
    samples drawn elsewhere in a pipeline.

    Returns {name: Dataset}; each split is a lazy map-only filter over
    ``ds`` — materialize upstream first if re-execution is costly.
    """
    names = list(fractions)
    vals = np.array([float(fractions[n]) for n in names])
    if len(names) < 2 or (vals < 0).any() or abs(vals.sum() - 1.0) > 1e-9:
        raise ValueError(
            f"need >= 2 non-negative fractions summing to 1: {fractions}")
    cuts = np.cumsum(vals)
    cuts[-1] = 1.0  # close the last interval against float drift
    lows = np.concatenate([[0.0], cuts[:-1]])

    def make(lo: float, hi: float):
        def keep(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            u = _uniform01(t.column(id_col), seed)
            return t.filter(pa.array((u >= lo) & (u < hi)))

        return keep

    return {name: ds.map_batches(make(lo, hi), batch_format="pyarrow")
            for name, lo, hi in zip(names, lows, cuts)}
