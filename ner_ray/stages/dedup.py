"""Exact triple deduplication (operator D3) — the pipeline's first
shuffle, with mandatory partial pre-aggregation.

At 10^12-doc scale a bare ``groupby(s,p,o)`` would shuffle every raw
triple row; instead each batch is combined locally first (one row per
distinct (subj, pred, obj) per batch — pyarrow group_by, C kernel), so
the all-to-all exchange moves only partial counts (SURVEY.md §2.5 G3,
ray_guide.md §"Aggregation at scale"). The shuffle key is the triple
itself; no skew salt is needed because D3's groups are tiny by
construction (weight counts, not payloads).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

KEY = ["subj", "pred", "obj"]


def partial_dedup_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (s, p, o, weight=count)."""
    g = batch.select(KEY).group_by(KEY).aggregate([([], "count_all")])
    g = g.rename_columns(KEY + ["weight"])
    return g.set_column(3, "weight", pc.cast(g.column("weight"), pa.int64()))


COMBINE_BATCH = 131072  # rows per combiner call: a big combine window
# shrinks the shuffled partials by ~batch/|keys| while staying well
# inside a worker heap (3 string cols + int64)


def dedup_triples(triples_ds):
    """Dataset of TRIPLES rows -> Dataset of TRIPLES_DEDUP rows."""
    from ray.data.aggregate import Sum

    partial = triples_ds.map_batches(partial_dedup_batch,
                                     batch_format="pyarrow",
                                     batch_size=COMBINE_BATCH)
    return partial.groupby(KEY).aggregate(Sum("weight", alias_name="weight"))


def merge_weights(ds):
    """Re-aggregate weights after a key rewrite (used by Q4 resolve)."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda t: t.group_by(KEY).aggregate([("weight", "sum")])
                   .rename_columns(KEY + ["weight"]),
        batch_format="pyarrow",
        batch_size=COMBINE_BATCH,
    )
    return partial.groupby(KEY).aggregate(Sum("weight", alias_name="weight"))
