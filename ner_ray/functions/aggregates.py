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

from ner_ray.util.hashing import hash_column

# map our agg names -> (pyarrow partial kernel, final ray Agg, merge kernel)
_MERGEABLE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def partial_final_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]]):
    """aggs: [(col, fn, out_name)] with fn in {sum,min,max,count,mean}.

    mean is decomposed into sum+count partials and finalized in a last
    map (algebraic decomposition — the classic combiner trick).
    """
    from ray.data.aggregate import Max, Min, Sum

    partial_specs = []   # (col, pa_fn, tmp_name)
    for col, fn, out in aggs:
        if fn == "mean":
            partial_specs.append((col, "sum", f"__{out}_sum"))
            partial_specs.append((col, "count", f"__{out}_cnt"))
        else:
            partial_specs.append((col, fn, out))

    def partial(t: pa.Table) -> pa.Table:
        cols = keys + sorted({c for c, _f, _n in partial_specs})
        g = t.select(list(dict.fromkeys(cols))).group_by(keys).aggregate(
            [(c, f) for c, f, _n in partial_specs]
        )
        # pyarrow names output "{col}_{fn}"
        rename = {f"{c}_{f}": n for c, f, n in partial_specs}
        names = [rename.get(nm, nm) for nm in g.column_names]
        return g.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    final_aggs = []
    for _c, f, n in partial_specs:
        # count partials merge by summation; the others by themselves
        agg_cls = {"sum": Sum, "count": Sum, "min": Min, "max": Max}[f]
        final_aggs.append(agg_cls(n, alias_name=n))
    out_ds = partials.groupby(keys).aggregate(*final_aggs)

    mean_outs = [(out, f"__{out}_sum", f"__{out}_cnt")
                 for col, fn, out in aggs if fn == "mean"]
    if mean_outs:
        def finalize(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            for out, s, c in mean_outs:
                t = t.append_column(
                    out, pc.divide(pc.cast(t.column(s), pa.float64()),
                                   pc.cast(t.column(c), pa.float64())))
                t = t.drop_columns([s, c])
            return t

        out_ds = out_ds.map_batches(finalize, batch_format="pyarrow")
    return out_ds


def topk(ds, by: list[str], k: int, descending=True):
    """Global top-k = range-partitioned sort + limit (O2)."""
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    return ds.sort(by, descending=descending).limit(k)


def group_topk(ds, group_key: str, order_by: list[str], k: int,
               descending=True):
    """Per-group top-k via groupby.map_groups (O3)."""
    asc = [not descending] * len(order_by) if isinstance(descending, bool) \
        else [not d for d in descending]

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by, ascending=asc, kind="stable").head(k)

    return ds.groupby(group_key).map_groups(head_k, batch_format="pandas")


# ------------------------------------------------------- HyperLogLog

HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(m) ~ 1.6%


def _hll_partial(values) -> np.ndarray:
    """One HLL register array (uint8) from a column of values."""
    h = hash_column(values)
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
