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


def session_windows(ds, key: str, ts_col: str, gap_seconds: float):
    """Session windows per key: ts-sorted group scan; a new session
    starts when the inter-event gap exceeds ``gap_seconds``."""
    gap = np.timedelta64(int(gap_seconds * 1_000_000), "us")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
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
        return out

    return ds.groupby(key).map_groups(sessions, batch_format="pandas")
