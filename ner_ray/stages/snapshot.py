"""Corpus snapshot diff: classify every doc id across two corpus
versions as added / removed / changed (content hash differs) — the
audit step before promoting a re-crawled or re-cleaned corpus, and the
input to incremental reprocessing (only ``added`` + ``changed`` need
to re-enter the pipeline; see stages/incdedup.py for the dedup side).

ONE scalar shuffle: both sides map to (doc_id, content_hash, side)
rows, union, and a single groupby(doc_id) aggregate classifies —
side-sum 1 = removed, 2 = added, 3 = present in both (hash min==max
decides unchanged vs changed). Text never moves. Each side must be
id-unique (run exact dedup first; duplicate ids raise)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.util.hashing import hash_column

_OLD, _NEW = 1, 2


def corpus_diff(old_ds, new_ds, text_col: str = "text",
                id_col: str = "doc_id", include_unchanged: bool = False):
    """Dataset[(doc_id, status)] with status in added | removed |
    changed (| unchanged when requested)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def keyed(side: int):
        def fn(t: pa.Table) -> pa.Table:
            h = hash_column(t.column(text_col)).view(np.int64)
            return pa.table({
                id_col: t.column(id_col),
                "h": pa.array(h),
                "side": pa.array(np.full(len(t), side, np.int64)),
            })

        return fn

    both = old_ds.map_batches(keyed(_OLD), batch_format="pyarrow") \
        .union(new_ds.map_batches(keyed(_NEW), batch_format="pyarrow"))
    agg = both.groupby(id_col).aggregate(
        Sum("side", alias_name="s"), Count(alias_name="c"),
        Min("h", alias_name="hmin"), Max("h", alias_name="hmax"))

    def classify(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        if ((c > 2) | ((c == 2) & (s != _OLD + _NEW))).any():
            raise ValueError(
                "corpus_diff requires id-unique sides (duplicate "
                f"{id_col} within one snapshot); run exact dedup first")
        hmin = t.column("hmin").to_numpy(zero_copy_only=False)
        hmax = t.column("hmax").to_numpy(zero_copy_only=False)
        status = np.where(
            s == _OLD, "removed",
            np.where(s == _NEW, "added",
                     np.where(hmin == hmax, "unchanged", "changed")))
        out = pa.table({id_col: t.column(id_col),
                        "status": pa.array(status)})
        if include_unchanged:
            return out
        return out.filter(pc.not_equal(out.column("status"),
                                       pa.scalar("unchanged")))

    return agg.map_batches(classify, batch_format="pyarrow")
