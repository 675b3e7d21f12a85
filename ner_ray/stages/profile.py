"""One-pass streaming dataset profiler: per-column count / nulls /
min / max / sum / mean / approximate-distinct in a SINGLE scan.

The first thing an engineer does with a new 100-TB table is profile
it; doing that with one pass per statistic (or a driver-side
``to_pandas``) is exactly the anti-pattern this engine exists to
avoid. Here every batch emits ONE tiny partial row per column
(counts, extrema, running sum, a 4 KiB HLL register block) and a
``groupby(column)`` merge reduces them — the shuffle payload is
O(columns x blocks) scalar rows, never data.

Type handling:
- numeric (int / uint / float / bool): num_min / num_max / num_sum /
  num_mean as float64;
- string: str_min / str_max;
- temporal: extrema stringified into str_min / str_max (ISO text);
- nested / binary: counts and nulls only (approx_distinct null —
  hashing list payloads row-wise would be a Python loop).

approx_distinct is the repo's mergeable HLL sketch
(functions/aggregates.py, P=12 -> ~1.6% relative error); NULLs are
excluded, matching SQL ``count(DISTINCT col)`` semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.functions.aggregates import (
    _dd_keys,
    _dd_value,
    _hll_estimate,
    _hll_partial,
)

# DDSketch accuracy for the profile quantiles: 1% relative error
_DD_ALPHA = 0.01
_DD_GAMMA = (1.0 + _DD_ALPHA) / (1.0 - _DD_ALPHA)

_PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("nulls", pa.int64()),
    ("regs", pa.binary()),        # HLL registers; b"" = not sketchable
    ("ddhist", pa.binary()),      # DDSketch (key,count) pairs; b"" = n/a
    ("num_min", pa.float64()),
    ("num_max", pa.float64()),
    ("num_sum", pa.float64()),
    ("num_sumsq", pa.float64()),
    ("str_min", pa.string()),
    ("str_max", pa.string()),
])

_PROFILE_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("nulls", pa.int64()),
    ("approx_distinct", pa.int64()),
    ("num_min", pa.float64()),
    ("num_max", pa.float64()),
    ("num_sum", pa.float64()),
    ("num_mean", pa.float64()),
    ("num_std", pa.float64()),
    ("p50", pa.float64()),
    ("p95", pa.float64()),
    ("p99", pa.float64()),
    ("str_min", pa.string()),
    ("str_max", pa.string()),
])


def _is_numeric(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_boolean(t))


def _column_partial(name: str, col: pa.ChunkedArray) -> dict:
    t = col.type
    n = len(col)
    nulls = col.null_count
    row = {"column": name, "count": n, "nulls": nulls, "regs": b"",
           "ddhist": b"", "num_min": None, "num_max": None,
           "num_sum": None, "num_sumsq": None,
           "str_min": None, "str_max": None}
    valid = col.drop_null() if nulls else col
    if len(valid) == 0:
        return row
    if _is_numeric(t):
        f = pc.cast(valid, pa.float64())
        mm = pc.min_max(f)
        row["num_min"] = mm["min"].as_py()
        row["num_max"] = mm["max"].as_py()
        row["num_sum"] = pc.sum(f).as_py()
        row["num_sumsq"] = pc.sum(pc.multiply(f, f)).as_py()
        row["regs"] = _hll_partial(valid).tobytes()
        x = f.to_numpy(zero_copy_only=False)
        x = x[np.isfinite(x)]
        if len(x):
            keys, counts = np.unique(_dd_keys(x, _DD_GAMMA),
                                     return_counts=True)
            row["ddhist"] = keys.tobytes() + counts.astype(np.int64).tobytes()
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        mm = pc.min_max(valid)
        row["str_min"] = mm["min"].as_py()
        row["str_max"] = mm["max"].as_py()
        row["regs"] = _hll_partial(valid).tobytes()
    elif pa.types.is_temporal(t):
        mm = pc.min_max(valid)
        row["str_min"] = str(mm["min"].as_py())
        row["str_max"] = str(mm["max"].as_py())
        # hash the physical int64 view (epoch units) for distinct
        ints = pc.cast(valid, pa.int64(), safe=False)
        row["regs"] = _hll_partial(ints).tobytes()
    return row


def _batch_partials(t: pa.Table, columns: list[str] | None) -> pa.Table:
    cols = columns or t.column_names
    rows = [_column_partial(c, t.column(c).combine_chunks()
                            if isinstance(t.column(c), pa.ChunkedArray)
                            else t.column(c)) for c in cols]
    return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)


def _merge_group(g: pa.Table) -> pa.Table:
    count = pc.sum(g.column("count")).as_py() or 0
    nulls = pc.sum(g.column("nulls")).as_py() or 0
    merged = None
    for buf in g.column("regs").to_pylist():
        if buf:
            regs = np.frombuffer(buf, dtype=np.uint8)
            merged = regs if merged is None else np.maximum(merged, regs)
    distinct = (int(round(_hll_estimate(merged)))
                if merged is not None else None)

    # merge DDSketch histograms (additive counts) and walk quantiles
    hist: dict[int, int] = {}
    for buf in g.column("ddhist").to_pylist():
        if buf:
            arr = np.frombuffer(buf, dtype=np.int64)
            half = len(arr) // 2
            for k, c in zip(arr[:half], arr[half:]):
                hist[int(k)] = hist.get(int(k), 0) + int(c)
    quants = {"p50": None, "p95": None, "p99": None}
    if hist:
        keys = np.array(sorted(hist), dtype=np.int64)
        cum = np.cumsum([hist[int(k)] for k in keys])
        n_fin = int(cum[-1])
        for name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            rank = min(max(int(np.ceil(q * n_fin)), 1), n_fin)
            i = int(np.searchsorted(cum, rank))
            quants[name] = float(_dd_value(keys[i:i + 1], _DD_GAMMA)[0])

    def agg(colname, fn):
        vals = g.column(colname).drop_null()
        return fn(vals).as_py() if len(vals) else None

    num_sum = agg("num_sum", pc.sum)
    num_sumsq = agg("num_sumsq", pc.sum)
    nn = count - nulls
    row = {
        "column": g.column("column")[0].as_py(),
        "count": count, "nulls": nulls, "approx_distinct": distinct,
        "num_min": agg("num_min", pc.min),
        "num_max": agg("num_max", pc.max),
        "num_sum": num_sum,
        "num_mean": (num_sum / nn) if num_sum is not None and nn else None,
        # population stddev (DuckDB stddev_pop); the sum-of-squares
        # identity loses precision when std << mean — documented
        "num_std": (float(np.sqrt(max(0.0, num_sumsq / nn
                                      - (num_sum / nn) ** 2)))
                    if num_sumsq is not None and nn else None),
        **quants,
        "str_min": agg("str_min", pc.min),
        "str_max": agg("str_max", pc.max),
    }
    return pa.Table.from_pylist([row], schema=_PROFILE_SCHEMA)


def profile_columns(ds, columns: list[str] | None = None):
    """Dataset -> Dataset with one profile row per column (schema:
    column, count, nulls, approx_distinct, num_min/max/sum/mean,
    p50/p95/p99 (DDSketch, 1% relative error), str_min/max). ONE
    streaming pass; partials are O(columns) scalar rows + a 4 KiB HLL
    block + an O(log range / alpha) histogram blob per batch."""
    partials = ds.map_batches(
        lambda t: _batch_partials(t, columns), batch_format="pyarrow")
    return partials.groupby("column").map_groups(
        _merge_group, batch_format="pyarrow")


def profile_table(ds, columns: list[str] | None = None) -> pa.Table:
    """Materialized profile sorted by column name (small output)."""
    out = profile_columns(ds, columns).to_pandas() \
        .sort_values("column").reset_index(drop=True)
    return pa.Table.from_pandas(out, schema=_PROFILE_SCHEMA,
                                preserve_index=False)
