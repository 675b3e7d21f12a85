"""Streaming-shaped operators over batch data (SURVEY.md §2.10).

The reference is pure batch (Wapiti-style single pass, no event time /
watermarks); for capability parity we provide tumbling and session
windows over a keyed, ts-sorted log. Ordering assumption: windowing is
exact because rows are grouped by key (shuffle) and sorted within the
group before windowing — no late-data / watermark semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _timestamp_us(col) -> np.ndarray:
    """Timestamp column -> int64 microseconds since epoch. An int64
    cast of a timestamp yields its NATIVE unit (ns for the pandas/Arrow
    default), so slabbing that by a µs divisor would silently misplace
    every slab edge ~1000x — in session_windows that flags every local
    session as a boundary session and hands a hot key's entire history
    back to the merge pass (the unbounded-task shape the slab
    decomposition exists to prevent). ns->µs uses floor division
    (truncation toward zero would misalign pre-epoch timestamps)."""
    native = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
    unit = col.type.unit if pa.types.is_timestamp(col.type) else "us"
    if unit == "ns":
        return np.floor_divide(native, 1_000)
    return native * {"s": 1_000_000, "ms": 1_000, "us": 1}[unit]


def add_tumbling_bucket(ds, ts_col: str, unit: str = "day",
                        out_col: str = "bucket"):
    """Vectorized event-time bucketing (pc.floor_temporal)."""
    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            out_col, pc.floor_temporal(t.column(ts_col), unit=unit))

    return ds.map_batches(bucket, batch_format="pyarrow")


def tumbling_window_agg(ds, key: str, ts_col: str, value_col: str,
                        unit: str = "day"):
    """Tumbling window = groupby(key, bucket) with partial pre-agg
    (the two-phase combiner — raw events never shuffle)."""
    from ray.data.aggregate import Count, Sum

    bucketed = add_tumbling_bucket(ds, ts_col, unit=unit)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key, "bucket"]).aggregate(
            [(value_col, "sum"), ([], "count_all")])
        return g.rename_columns([key, "bucket", "psum", "pn"])

    partials = bucketed.map_batches(partial, batch_format="pyarrow")
    return partials.groupby([key, "bucket"]).aggregate(
        Sum("psum", alias_name="sum_value"),
        Sum("pn", alias_name="n"),
    )


def sliding_window_agg(ds, key: str, ts_col: str, value_col: str,
                       width: int = 2, unit: str = "day"):
    """Sliding windows of `width` units, step 1 unit: each event is
    assigned to the `width` windows covering it (flat emit), then the
    usual partial+final two-phase aggregate. ``bucket`` = window START.
    Equivalent SQL: UNION ALL of `width` shifted tumblings, re-grouped."""
    from ray.data.aggregate import Sum

    assert unit == "day", "sandbox oracle pins day units"
    day_us = 86_400_000_000

    def explode(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t.column(ts_col), unit=unit)
        parts = []
        for k in range(width):
            shift = pc.subtract(
                base, pa.scalar(k * day_us, pa.duration("us")))
            parts.append(pa.table({
                key: t.column(key),
                "bucket": pc.cast(shift, pa.timestamp("us")),
                value_col: t.column(value_col),
            }))
        return pa.concat_tables(parts)

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key, "bucket"]).aggregate(
            [(value_col, "sum"), ([], "count_all")])
        return g.rename_columns([key, "bucket", "psum", "pn"])

    partials = exploded.map_batches(partial, batch_format="pyarrow")
    return partials.groupby([key, "bucket"]).aggregate(
        Sum("psum", alias_name="sum_value"),
        Sum("pn", alias_name="n"),
    )


def session_windows(ds, key: str, ts_col: str, gap_seconds: float,
                    slab_seconds: float | None = None):
    """Session windows per key: a new session starts when the
    inter-event gap exceeds ``gap_seconds``.

    Skew-safe decomposition: grouping by key alone puts a hot key's
    ENTIRE history in one task (unbounded). Instead events group by
    ``(key, time-slab)`` — slabs are fixed ``slab_seconds`` spans
    (default ``max(86400, 16 * gap)``; any value >= gap is exact) —
    and each slab computes its local sessions vectorized. A local
    session further than ``gap`` from both slab edges can never merge
    across a slab boundary, so it is FINAL immediately; only the <= 2
    boundary-touching sessions per (key, slab) enter the per-key merge
    pass, whose group size is O(slabs spanned), bounded by the time
    range — never by a hot key's event count. Because a slab is at
    least ``gap`` wide, sessions separated by an empty slab can never
    merge, so chain-merging adjacent boundary sessions is exact.
    The session-row stream (scalars, one row per LOCAL session) is
    pinned via ``materialize`` so the interior/boundary split does not
    re-execute the upstream."""
    gap_us = int(gap_seconds * 1_000_000)
    gap = np.timedelta64(gap_us, "us")
    if slab_seconds is None:
        slab_seconds = max(86_400.0, 16.0 * gap_seconds)
    slab_us = int(slab_seconds * 1_000_000)
    if slab_us < gap_us:
        raise ValueError(
            f"slab_seconds ({slab_seconds}) must be >= gap_seconds "
            f"({gap_seconds}) for boundary merging to be exact")

    def slab(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            ts_col: t.column(ts_col),
            "_slab": pa.array(np.floor_divide(
                _timestamp_us(t.column(ts_col)), slab_us)),
        })

    def local_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        out = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        ).reset_index(drop=True)
        out.insert(0, key, g[key].iloc[0])
        s = int(g["_slab"].iloc[0])
        lo = np.datetime64(s * slab_us, "us")
        hi = np.datetime64((s + 1) * slab_us, "us")
        out["_boundary"] = (
            (out["session_start"].to_numpy() - lo <= gap)
            | (hi - out["session_end"].to_numpy() <= gap))
        return out

    local = ds.map_batches(slab, batch_format="pyarrow") \
        .groupby([key, "_slab"]) \
        .map_groups(local_sessions, batch_format="pandas") \
        .materialize()
    def _split(keep_boundary: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = t.column("_boundary")
            mask = m if keep_boundary else pc.invert(m)
            return t.filter(mask).drop_columns(["_boundary"])

        return fn

    interior = local.map_batches(_split(False), batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("session_start", kind="stable")
        start = g["session_start"].to_numpy()
        end = g["session_end"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (start[1:] - end[:-1]) > gap
        sid = np.cumsum(new) - 1
        out = g.groupby(sid).agg(
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"),
        ).reset_index(drop=True)
        out.insert(0, key, g[key].iloc[0])
        # arrow block out: the union with the interior (arrow) stream
        # must not mix block types
        return pa.Table.from_pandas(out, preserve_index=False)

    merged = local.map_batches(_split(True), batch_format="pyarrow") \
        .groupby(key).map_groups(merge, batch_format="pandas")
    return interior.union(merged)
