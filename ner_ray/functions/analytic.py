"""Analytic (SQL window) functions over partitions: row_number, lag,
lead, running sum/mean — the OVER (PARTITION BY key ORDER BY col)
family, complementing functions/windows.py's time windows.

Shape: ONE groupby(key) shuffle; each partition sorts itself inside
map_groups and computes every requested function vectorized (numpy
shift/cumsum — no per-row Python). A partition must fit one worker —
the same contract as every map_groups here; for millions-of-rows
partitions, sessionize or bucket the key first."""

from __future__ import annotations

import numpy as np
import pandas as pd

_SUPPORTED = ("row_number", "lag", "lead", "cumsum", "cummean")


def window_analytics(ds, partition_by: str, order_by: str,
                     specs: list[tuple[str, str, str]]):
    """specs: [(fn, value_col, out_name)] with fn in {row_number, lag,
    lead, cumsum, cummean}; value_col is ignored for row_number.
    Ordering ties break by the full row's stable input order within
    the sorted partition (pandas stable sort), so give order_by a
    unique column (SQL's nondeterministic-peer caveat applies the same
    way)."""
    for fn, _c, _o in specs:
        if fn not in _SUPPORTED:
            raise ValueError(f"unsupported window fn {fn!r}; "
                             f"supported: {_SUPPORTED}")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="stable").reset_index(drop=True)
        n = len(g)
        for fn, col, out in specs:
            if fn == "row_number":
                g[out] = np.arange(1, n + 1, dtype=np.int64)
            elif fn == "lag":
                g[out] = g[col].shift(1)
            elif fn == "lead":
                g[out] = g[col].shift(-1)
            elif fn == "cumsum":
                g[out] = g[col].cumsum()
            elif fn == "cummean":
                g[out] = g[col].expanding().mean().to_numpy()
        return g

    return ds.groupby(partition_by).map_groups(per_partition,
                                               batch_format="pandas")
