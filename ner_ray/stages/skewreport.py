"""Key-skew diagnostics for shuffle planning: before running a
groupby / join keyed on a column at corpus scale, measure how hot its
hottest keys are — the number that decides between a plain shuffle, a
salted two-phase aggregate (stages/graph.py's salted mode), or a
broadcast of the hot set (two_hop's hub cap).

Composes the repo's bounded-shuffle sketches: Misra-Gries certified
top-k (exact hot-key counts), HLL distinct, and a row count that rides
the same pass. Output is one driver-side dict — a diagnostic, not a
dataset."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.functions.aggregates import (
    _hll_estimate,
    _hll_partial,
    approx_topk,
)

# a single shuffle group beyond this many rows is where we recommend
# salting (matches TARGET_GROUP_BYTES at ~128 B scalar rows)
DEFAULT_HOT_ROWS = 1_000_000


def skew_report(ds, col: str, k: int = 20, capacity: int | None = None,
                hot_rows: int = DEFAULT_HOT_ROWS) -> dict:
    """Returns {total_rows, distinct_keys (HLL), top (list of (key,
    count)), top_certified (bool), top1_share, topk_share,
    mean_rows_per_key, recommendation}. Three streaming passes, all
    with capacity- or register-bounded shuffle payloads."""
    def count_and_hll(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "regs": pa.array([_hll_partial(t.column(col)).tobytes()],
                             pa.binary()),
        })

    total, merged = 0, None
    for b in ds.map_batches(count_and_hll, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        total += int(b.column("n").to_numpy().sum())
        for buf in b.column("regs").to_pylist():
            regs = np.frombuffer(buf, dtype=np.uint8)
            merged = regs if merged is None else np.maximum(merged, regs)
    distinct = int(round(_hll_estimate(merged))) if merged is not None else 0

    top_tbl, certified, _bound = approx_topk(ds, col, k=k,
                                             capacity=capacity)
    top = list(zip(top_tbl.column(col).to_pylist(),
                   top_tbl.column("count").to_pylist()))
    top1 = top[0][1] if top else 0
    topk_sum = sum(c for _, c in top)
    mean_per_key = total / distinct if distinct else 0.0

    if top1 > hot_rows:
        rec = (f"salt: hottest key {top[0][0]!r} holds {top1} rows "
               f"(> {hot_rows}); use a salted two-phase aggregate or "
               "broadcast the hot set")
    elif distinct and top1 > 100 * mean_per_key:
        rec = (f"watch: hottest key is {top1 / mean_per_key:.0f}x the "
               "mean key; plain shuffle is fine at this size but salts "
               "at larger inputs")
    else:
        rec = "ok: no key dominates; plain hash shuffle"
    return {
        "total_rows": total, "distinct_keys": distinct, "top": top,
        "top_certified": bool(certified),
        "top1_share": top1 / total if total else 0.0,
        "topk_share": topk_sum / total if total else 0.0,
        "mean_rows_per_key": mean_per_key,
        "recommendation": rec,
    }
