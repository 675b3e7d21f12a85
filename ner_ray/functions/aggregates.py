"""Aggregation operators (SURVEY.md §2.5-2.6): partial+final grouped
aggregation, top-k, per-group top-k, HyperLogLog approx-distinct.

The partial+final path is the mandatory 10^12-scale shape: combine
inside map_batches (pyarrow group_by — C kernel, one row per key per
batch) so the all-to-all shuffle moves partials, not raw rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.util.hashing import hash_column

# map our agg names -> (pyarrow partial kernel, final ray Agg, merge kernel)
_MERGEABLE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def partial_final_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]]):
    """aggs: [(col, fn, out_name)] with fn in {sum,min,max,count,mean}.

    mean is decomposed into sum+count partials and finalized in a last
    map (algebraic decomposition — the classic combiner trick).
    Identical (col, fn) partials are computed ONCE and shared across
    outputs (pyarrow names group_by outputs "{col}_{fn}", so duplicate
    requests — e.g. mean + count of one column — would otherwise
    collide)."""
    from ray.data.aggregate import Max, Min, Sum

    needed: dict[tuple[str, str], str] = {}   # (col, pa_fn) -> tmp name
    for col, fn, out in aggs:
        for f in (("sum", "count") if fn == "mean" else (fn,)):
            needed.setdefault((col, f), f"__p_{col}_{f}")

    def partial(t: pa.Table) -> pa.Table:
        cols = keys + sorted({c for c, _f in needed})
        g = t.select(list(dict.fromkeys(cols))).group_by(keys).aggregate(
            sorted(needed))
        rename = {f"{c}_{f}": n for (c, f), n in needed.items()}
        names = [rename.get(nm, nm) for nm in g.column_names]
        return g.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    final_aggs = []
    for (c, f), n in sorted(needed.items()):
        # count partials merge by summation; the others by themselves
        agg_cls = {"sum": Sum, "count": Sum, "min": Min, "max": Max}[f]
        final_aggs.append(agg_cls(n, alias_name=n))
    out_ds = partials.groupby(keys).aggregate(*final_aggs)

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for col, fn, out in aggs:
            if fn == "mean":
                t = t.append_column(out, pc.divide(
                    pc.cast(t.column(needed[(col, "sum")]), pa.float64()),
                    pc.cast(t.column(needed[(col, "count")]),
                            pa.float64())))
            else:
                t = t.append_column(out, t.column(needed[(col, fn)]))
        return t.select(keys + [a[2] for a in aggs])

    return out_ds.map_batches(finalize, batch_format="pyarrow")


def topk(ds, by: list[str], k: int, descending=True):
    """Global top-k (O2): per-block local top-k prune, THEN the
    range-partitioned sort + limit. The prune is exact — a global
    top-k row is necessarily in its own block's top-k — so the sort
    input shrinks from the corpus (full payload columns!) to ~k rows
    per block (the local-top-k-then-tiny-sort rule, see ivf.py).
    Ties at the k boundary resolve per the sort keys; pass a unique
    tiebreaker column (as the graded queries do) for a deterministic
    row set. Arrow-native prune: nested payload columns survive."""
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    keys = [(c, "descending" if d else "ascending")
            for c, d in zip(by, descending)]

    def prune(t: pa.Table) -> pa.Table:
        if len(t) <= k:
            return t
        return t.take(pc.sort_indices(t, sort_keys=keys)[:k])

    return ds.map_batches(prune, batch_format="pyarrow") \
        .sort(by, descending=descending).limit(k)


def group_topk(ds, group_key: str, order_by: list[str], k: int,
               descending=True):
    """Per-group top-k (O3): per-BATCH top-k per key first (exact —
    a group's global top-k row is in its batch's top-k for that key),
    so a hot key ships at most k rows per block into the shuffle
    instead of its entire payload; then the usual groupby.map_groups
    final. Ties: pass a unique tiebreaker in ``order_by``."""
    asc = [not descending] * len(order_by) if isinstance(descending, bool) \
        else [not d for d in descending]

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by, ascending=asc, kind="stable").head(k)

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a null group key is still a group — pandas'
        # default would silently drop those rows before the shuffle
        return b.sort_values(order_by, ascending=asc, kind="stable") \
            .groupby(group_key, sort=False, dropna=False).head(k)

    return ds.map_batches(prune, batch_format="pandas") \
        .groupby(group_key).map_groups(head_k, batch_format="pandas")


# ------------------------------------------------------- HyperLogLog

HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(m) ~ 1.6%


def _hll_rows(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register_idx, rank) per hash — the sparse form of the sketch."""
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)  # low P bits now zero
    n = len(h)
    # leading-zero count via 6-step binary search (vectorized)
    lz = np.zeros(n, dtype=np.uint64)
    cur = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        mask = (cur >> np.uint64(64 - s)) == 0
        lz[mask] += np.uint64(s)
        cur[mask] = cur[mask] << np.uint64(s)
    rank = np.where(rest != 0, lz.astype(np.int64) + 1,
                    64 - HLL_P + 1).astype(np.uint8)
    return idx, rank


def _hll_partial(values) -> np.ndarray:
    """One HLL register array (uint8) from a column of values."""
    idx, rank = _hll_rows(hash_column(values))
    regs = np.zeros(1 << HLL_P, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds, col: str) -> float:
    """G5: mergeable per-batch HLL sketches -> tiny driver merge."""
    def sketch(t: pa.Table) -> pa.Table:
        regs = _hll_partial(t.column(col))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow")
    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for buf in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(buf, dtype=np.uint8))
    return _hll_estimate(merged)


# ------------------------------------------------- quantiles (DDSketch)

DD_OFFSET = 1 << 31  # keeps signed bucket keys disjoint from the 0 key


def _dd_keys(x: np.ndarray, gamma: float) -> np.ndarray:
    """Signed DDSketch bucket key per value (Masson/Rim/Lee, VLDB'19):
    positive x -> ceil(log_gamma x) + OFFSET, negative mirrored
    negative, exact-zero -> 0. Vectorized; NaN/inf must be filtered by
    the caller."""
    k = np.zeros(len(x), dtype=np.int64)
    nz = x != 0
    mag = np.ceil(np.log(np.abs(x[nz])) / np.log(gamma)).astype(np.int64)
    k[nz] = np.where(x[nz] > 0, mag + DD_OFFSET, -(mag + DD_OFFSET))
    return k


def _dd_value(k: np.ndarray, gamma: float) -> np.ndarray:
    """Bucket key -> representative value (midpoint of the bucket in
    relative terms: 2*gamma^i/(gamma+1), relative error <= alpha)."""
    sign = np.sign(k).astype(np.float64)
    mag = np.abs(k).astype(np.float64) - DD_OFFSET
    val = 2.0 * np.power(gamma, mag) / (gamma + 1.0)
    return np.where(k == 0, 0.0, sign * val)


def approx_quantile(ds, col: str, qs: list[float],
                    alpha: float = 0.01) -> list[float]:
    """Distributed quantiles with a RELATIVE-error guarantee
    (|est - true| <= alpha * |true| for the nearest-rank quantile):
    per-batch DDSketch bucket counts -> one tiny groupby(bucket).sum
    shuffle -> driver walks the cumulative histogram. Counts are
    additive, so the result is exactly layout/retry independent —
    unlike a sampling sketch. Nulls and NaNs are ignored (SQL
    semantics). Memory is O(buckets touched) ~ O(log(max/min)/alpha),
    independent of row count — the 100-TB path."""
    gamma = (1.0 + alpha) / (1.0 - alpha)

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[np.isfinite(x)]
        keys, counts = np.unique(_dd_keys(x, gamma), return_counts=True)
        return pa.table({"qb": pa.array(keys),
                         "cnt": pa.array(counts.astype(np.int64))})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("qb").sum("cnt").sort("qb").take_all()
    keys = np.array([r["qb"] for r in hist], dtype=np.int64)
    counts = np.array([r["sum(cnt)"] for r in hist], dtype=np.int64)
    if len(keys) == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = min(max(int(np.ceil(q * n)), 1), n)  # nearest-rank
        i = int(np.searchsorted(cum, rank))
        out.append(float(_dd_value(keys[i:i + 1], gamma)[0]))
    return out


def exact_quantile(ds, col: str, qs: list[float]) -> list[float]:
    """EXACT nearest-rank quantiles (DuckDB ``quantile_disc``
    semantics) via distributed value counts: per-batch unique+count ->
    groupby(value).sum -> driver cumulative walk. Shuffles one row per
    DISTINCT value — right for measure columns with bounded
    cardinality (prices, lengths, scores); for unbounded doubles at
    corpus scale use ``approx_quantile``."""
    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False)
        x = x[~pd.isna(x)]
        vals, counts = np.unique(x, return_counts=True)
        return pa.table({"v": pa.array(vals),
                         "cnt": pa.array(counts.astype(np.int64))})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").sum("cnt").sort("v").take_all()
    if not hist:
        return [float("nan")] * len(qs)
    vals = [r["v"] for r in hist]
    cum = np.cumsum([r["sum(cnt)"] for r in hist])
    n = int(cum[-1])
    return [vals[int(np.searchsorted(cum, min(max(int(np.ceil(q * n)), 1), n)))]
            for q in qs]


def _grouped_quantile(ds, key: str, col: str, qs: list[float],
                      bucketer, representative):
    """Shared grouped-quantile plan: per-batch (key, bucket, count)
    partials -> ONE fused-int64-key groupby (Ray's multi-key
    sort-aggregate penalty — see neardup._distinct_pairs; Min/Max
    carry drops hash-collided groups instead of fabricating rows) ->
    per-key cumulative walk in groupby(key).map_groups (each key's
    histogram is O(buckets), never O(rows))."""
    from ray.data.aggregate import Max, Min, Sum

    from ner_ray.util.hashing import hash_columns

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        k = t.column(key).to_pandas()
        m = np.isfinite(x)
        df = pd.DataFrame({"k": k[m], "qb": bucketer(x[m])})
        g = df.groupby(["k", "qb"], sort=False, observed=True).size()
        idx = g.index.to_frame(index=False)
        return pa.table({key: pa.array(idx["k"]),
                         "qb": pa.array(idx["qb"].to_numpy()),
                         "cnt": pa.array(g.to_numpy().astype(np.int64))})

    def fuse(t: pa.Table) -> pa.Table:
        h = hash_columns(t.column(key), t.column("qb")).view(np.int64)
        return t.append_column("_fk", pa.array(h))

    def unfuse(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.equal(t.column(key), t.column("_kmax")),
                     pc.equal(t.column("qb"), t.column("_qmax")))
        return t.filter(ok).select([key, "qb", "cnt"])

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(fuse, batch_format="pyarrow") \
        .groupby("_fk").aggregate(
            Min(key, alias_name=key), Min("qb", alias_name="qb"),
            Max(key, alias_name="_kmax"), Max("qb", alias_name="_qmax"),
            Sum("cnt", alias_name="cnt")) \
        .map_batches(unfuse, batch_format="pyarrow")

    q_names = [f"p{round(q * 100) if (q * 100) == int(q * 100) else q}"
               for q in qs]

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("qb")
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        kb = g["qb"].to_numpy()
        row = {key: [g[key].iloc[0]]}
        for q, name in zip(qs, q_names):
            rank = min(max(int(np.ceil(q * n)), 1), n)
            row[name] = [representative(kb[int(np.searchsorted(cum, rank))])]
        return pd.DataFrame(row)

    return hist.groupby(key).map_groups(walk)


def grouped_approx_quantile(ds, key: str, col: str, qs: list[float],
                            alpha: float = 0.01):
    """Per-group DDSketch quantiles (one row per key, one ``p<q>``
    column per requested quantile) — same relative-error guarantee and
    layout independence as ``approx_quantile``, with the shuffle
    carrying O(keys x buckets) scalar partials."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    return _grouped_quantile(
        ds, key, col, qs, bucketer=lambda x: _dd_keys(x, gamma),
        representative=lambda k: float(
            _dd_value(np.array([k], dtype=np.int64), gamma)[0]))


def grouped_exact_quantile(ds, key: str, col: str, qs: list[float]):
    """Per-group EXACT nearest-rank quantiles (DuckDB
    ``quantile_disc(col, q) GROUP BY key`` semantics) via per-group
    value counts — for bounded-cardinality measure columns."""
    return _grouped_quantile(ds, key, col, qs,
                             bucketer=lambda x: x,
                             representative=float)


# ------------------------------------- approx top-k (Misra-Gries)


def approx_topk(ds, col: str, k: int, capacity: int | None = None,
                candidates: int | None = None):
    """Heavy hitters over astronomically-many distinct keys (n-grams,
    URLs) with BOUNDED shuffle: the exact ``topk`` path ships one row
    per (distinct key x block); this ships at most ``capacity`` rows
    per block, whatever the key cardinality.

    Plan (Misra-Gries summaries, mergeable per Agarwal et al. 2012):
    per-batch exact counts compress to <= capacity (key, est) rows by
    subtracting the (capacity+1)-th largest count (per-key undercount
    <= that subtrahend, summed into a scalar bound E); one
    groupby(key).sum merges summaries; the top ``candidates`` keys by
    estimate are recounted EXACTLY in a second broadcast-filtered
    pass. Certificate: if the k-th exact count >= best non-candidate
    estimate + E, no excluded key can belong to the true top-k and the
    result is PROVABLY the exact top-k; otherwise a warning logs the
    gap (no silent caps) — raise ``capacity`` and rerun.

    Returns (pa.Table with [col, "count"] sorted desc, certified:
    bool, bound E)."""
    import logging

    capacity = capacity or max(8 * k, 1024)
    n_cand = candidates or max(2 * k, k + 16)

    def partial(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            t.column(col).to_numpy(zero_copy_only=False), return_counts=True)
        if len(vals) > capacity:
            # subtract the (capacity+1)-th largest; keep the positive
            cut = np.partition(counts, -capacity - 1)[-capacity - 1]
            keep = counts > cut
            vals, counts, sub = vals[keep], counts[keep] - cut, int(cut)
        else:
            sub = 0
        out = pa.table({col: pa.array(vals),
                        "est": pa.array(counts.astype(np.int64)),
                        "sub": pa.array(np.full(len(vals), 0, np.int64))})
        # the undercount bound rides as one extra row per batch (null
        # key) so ONE shuffle carries both summaries and bounds
        bound = pa.table({col: pa.array([None], out.column(col).type),
                          "est": pa.array([0], pa.int64()),
                          "sub": pa.array([sub], pa.int64())})
        return pa.concat_tables([out, bound])

    # partials are scalar (key, est, sub) rows bounded by
    # (capacity+1) x blocks — materialize once, then split the bound
    # rows (null key) out BEFORE the groupby so the shuffle never
    # sorts null keys
    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def summaries(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(col))).select([col, "est"])

    def bounds(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(col))).select(["sub"])

    e_bound = int(sum(
        b.column("sub").to_numpy().sum() for b in
        parts.map_batches(bounds, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if len(b)))
    top = parts.map_batches(summaries, batch_format="pyarrow") \
        .groupby(col).sum("est").rename_columns({"sum(est)": "est"}) \
        .sort("est", descending=True).limit(n_cand + 1).take_all()
    cands = top[:n_cand]
    cand_keys = np.array([r[col] for r in cands])
    runner_up_est = int(top[n_cand]["est"]) if len(top) > n_cand else 0

    def recount(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False)
        m = np.isin(x, cand_keys)
        vals, counts = np.unique(x[m], return_counts=True)
        return pa.table({col: pa.array(vals),
                         "count": pa.array(counts.astype(np.int64))})

    exact = ds.map_batches(recount, batch_format="pyarrow") \
        .groupby(col).sum("count").rename_columns({"sum(count)": "count"}) \
        .sort("count", descending=True).limit(k).take_all()
    table = pa.table({
        col: pa.array([r[col] for r in exact]),
        "count": pa.array([int(r["count"]) for r in exact], pa.int64()),
    })
    kth = int(exact[-1]["count"]) if len(exact) >= k else 0
    certified = len(exact) >= k and kth >= runner_up_est + e_bound
    if not certified:
        logging.getLogger(__name__).warning(
            "approx_topk NOT certified exact: kth exact count %d < best "
            "excluded estimate %d + undercount bound %d — raise capacity",
            kth, runner_up_est, e_bound)
    return table, certified, e_bound


def grouped_approx_distinct(ds, key: str, col: str,
                            num_buckets: int | None = None):
    """Per-group approx count-distinct with SPARSE mergeable HLL
    partials: per batch each touched (key, register) ships ONE
    (key, idx, rank) scalar row — never a dense 4 KiB blob per key
    per batch, so a near-unique key column costs O(values) scalars
    instead of rows x 4 KiB (the dense form's shuffle was ~1000x the
    raw data there), while a hot key still caps at 4096 rows per
    batch. Register-wise max is layout/retry independent; the sparse
    finale sees the identical register contents (untouched registers
    are the zeros term) and sums them in sorted register order, so
    the estimate is deterministic across layouts (the dense form's
    np.sum may differ in the last ULP — same sketch, same accuracy).
    Runs per coarse key-hash bucket
    with a vectorized per-key estimate — no per-key map_groups
    dispatch. Returns (key, approx_distinct)."""
    from ner_ray.stages.neardup import _auto_buckets
    from ner_ray.util.hashing import to_bucket

    if num_buckets is None:
        num_buckets = _auto_buckets(ds)
    m = 1 << HLL_P
    alpha = 0.7213 / (1 + 1.079 / m)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col)
        # notna, not is_valid: float NaN must not count as a value
        # (the dense form dropped it; approx_quantile does too)
        valid = v.to_pandas().notna().to_numpy()
        k = t.column(key).to_pandas()[valid]
        idx, rank = _hll_rows(hash_column(v.filter(pa.array(valid))))
        red = pd.DataFrame({"k": k.to_numpy(), "i": idx, "r": rank}) \
            .groupby(["k", "i"], sort=False)["r"].max().reset_index()
        return pa.table({
            key: pa.array(red["k"]),
            "i": pa.array(red["i"].to_numpy()),
            "r": pa.array(red["r"].to_numpy().astype(np.int64)),
            "_b": pa.array(to_bucket(hash_column(red["k"]),
                                     num_buckets)),
        })

    def est_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby([key, "i"], sort=False)["r"].max().reset_index()
        # sum the 2^-r terms in sorted register order: first-appearance
        # order is layout-dependent and the terms span >50 bits of
        # magnitude, so an unordered float sum could rint differently
        # across layouts — breaking the documented retry independence
        c = c.sort_values([key, "i"], kind="stable")
        c["w"] = np.exp2(-c["r"].to_numpy(dtype=np.float64))
        agg = c.groupby(key, sort=False).agg(
            present=("i", "size"), wsum=("w", "sum")).reset_index()
        present = agg["present"].to_numpy(dtype=np.float64)
        zeros = m - present          # untouched registers have rank 0
        est = alpha * m * m / (agg["wsum"].to_numpy() + zeros)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            est = np.where(small, m * np.log(m / np.maximum(zeros, 1)),
                           est)
        return pd.DataFrame({
            key: agg[key],
            "approx_distinct": np.rint(est).astype(np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(
            lambda g: est_bucket(g.drop(columns=["_b"])),
            batch_format="pandas")


def rollup_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]],
               grouping_id: str = "grouping_id", cube: bool = False):
    """GROUP BY ROLLUP / CUBE: one partial+final aggregation per
    grouping set, unioned, with dropped keys null-filled and a
    ``grouping_id`` bitmask column (DuckDB ``GROUPING(...)`` order:
    bit i set = keys[i] aggregated away, MSB-first like DuckDB's
    GROUPING(k1, k2)). ROLLUP emits the |keys|+1 prefix sets; CUBE
    all 2^|keys| subsets. Each grouping set re-streams the input once
    — at corpus scale prefer deriving coarser levels from the finest
    aggregate when the measures are re-aggregable; this operator picks
    correctness-for-any-agg (means can't re-aggregate) over pass
    minimization and documents it."""
    sets = []
    if cube:
        for mask in range(1 << len(keys)):
            sets.append([k for i, k in enumerate(keys)
                         if not (mask >> (len(keys) - 1 - i)) & 1])
    else:
        for depth in range(len(keys), -1, -1):
            sets.append(keys[:depth])

    outs = []
    for subset in sets:
        gid = sum(1 << (len(keys) - 1 - i)
                  for i, k in enumerate(keys) if k not in subset)
        if subset:
            part = partial_final_agg(ds, subset, aggs)
        else:
            # global set: aggregate with a constant key, then drop it
            const = ds.map_batches(
                lambda t: t.append_column(
                    "__all", pa.array(np.zeros(len(t), np.int8))),
                batch_format="pyarrow")
            part = partial_final_agg(const, ["__all"], aggs) \
                .map_batches(lambda t: t.drop_columns(["__all"]),
                             batch_format="pyarrow")

        def fill(t: pa.Table, _subset=tuple(subset), _gid=gid) -> pa.Table:
            # key columns surface as strings in EVERY grouping set so
            # the union never schema-conflicts with the null-filled
            # levels (int keys would promote against null strings)
            for i, k in enumerate(keys):
                if k not in _subset:
                    t = t.append_column(k, pa.nulls(len(t), pa.string()))
                else:
                    t = t.set_column(t.column_names.index(k), k,
                                     t.column(k).cast(pa.string()))
            t = t.append_column(grouping_id,
                                pa.array(np.full(len(t), _gid, np.int64)))
            return t.select(keys + [a[2] for a in aggs] + [grouping_id])

        outs.append(part.map_batches(fill, batch_format="pyarrow"))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def pivot_agg(ds, group_key: str, pivot_col: str, value_col: str,
              fn: str = "sum", max_pivot_values: int = 1000):
    """PIVOT: grouped aggregation reshaped wide — one output column
    per DISTINCT pivot value (sorted, stringified names, DuckDB PIVOT
    convention). The long-form aggregate is fully distributed
    (partial+final over (group, pivot) pairs); only the reshape of the
    already-aggregated result happens per group-key row. Pivot-value
    cardinality becomes the output WIDTH, so it must be driver-sized:
    more than ``max_pivot_values`` distinct values RAISES (a
    million-column table is a modeling error, not a scale problem)."""
    long = partial_final_agg(ds, [group_key, pivot_col],
                             [(value_col, fn, "_v")]).materialize()
    pvals = sorted({str(r[pivot_col]) for b in
                    long.select_columns([pivot_col])
                    .iter_batches(batch_format="pyarrow")
                    for r in b.to_pylist()},
                   key=lambda r: r)
    if len(pvals) > max_pivot_values:
        raise ValueError(
            f"pivot_col {pivot_col!r} has {len(pvals)} distinct values "
            f"> max_pivot_values={max_pivot_values}; pivot output width "
            "must stay driver-sized")

    def reshape(g: pd.DataFrame) -> pd.DataFrame:
        row = {group_key: [g[group_key].iloc[0]]}
        by = dict(zip(g[pivot_col].astype(str), g["_v"]))
        for p in pvals:
            row[p] = [by.get(p)]
        return pd.DataFrame(row)

    return long.groupby(group_key).map_groups(reshape,
                                              batch_format="pandas")
