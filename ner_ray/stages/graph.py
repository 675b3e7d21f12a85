"""Adjacency-list materialization (operator Q5) with salted two-phase
grouping to defeat head-entity skew.

The Zipf head entities (fixture-injected; BASELINE.json:6/14 demand
explicit skew handling) make a naive ``groupby(src)`` concentrate the
hottest source's entire edge list in one task. Instead:

phase 1: groupby((src, salt)) where salt = hash(pred, obj) % S —
         builds S partial edge lists per hot src, spread across tasks;
phase 2: groupby(src) merges the (much smaller, pre-sorted) partials
         and produces the final weight-desc edge list.

Edges sort by (weight desc, dst asc, pred asc) — deterministic,
matching the reference oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray import schema as S
from ner_ray.util.hashing import hash_columns

DEFAULT_SALTS = 4


def _add_salt(batch: pa.Table, n_salts: int) -> pa.Table:
    h = hash_columns(batch.column("pred"), batch.column("obj"))
    return batch.append_column(
        "salt", pa.array((h % np.uint64(n_salts)).astype(np.int64)))


import pyarrow.compute as pc

_EDGE_SORT = [("weight", "descending"), ("dst", "ascending"),
              ("pred", "ascending")]
_PARTIAL_SCHEMA = pa.schema(
    [("src", pa.string()), ("partial", pa.list_(S.EDGE_STRUCT))])


def _edge_struct(t: pa.Table) -> pa.StructArray:
    return pa.StructArray.from_arrays(
        [t.column("dst").combine_chunks(), t.column("pred").combine_chunks(),
         t.column("weight").combine_chunks()],
        fields=list(S.EDGE_STRUCT))


def _partial_batch(t: pa.Table) -> pa.Table:
    """Within-batch combiner: one partial edge list per src per batch
    (no shuffle), built entirely with Arrow kernels — lexicographic
    sort_indices + ListArray.from_arrays, no per-row Python. Plays the
    same anti-skew role as salting: a hot src's edges are split across
    however many batches carry them."""
    if len(t) == 0:
        return _PARTIAL_SCHEMA.empty_table()
    idx = pc.sort_indices(
        t, sort_keys=[("subj", "ascending")] +
        [(k if k != "dst" else "obj", o) for k, o in _EDGE_SORT])
    t = t.take(idx)
    subj = t.column("subj").to_numpy(zero_copy_only=False)
    starts = np.concatenate(
        [[0], np.nonzero(subj[1:] != subj[:-1])[0] + 1])
    offsets = pa.array(
        np.concatenate([starts, [len(t)]]).astype(np.int32), pa.int32())
    et = t.rename_columns(
        [{"subj": "src", "obj": "dst"}.get(c, c) for c in t.column_names])
    edges = pa.ListArray.from_arrays(offsets, _edge_struct(et))
    return pa.table({"src": pa.array(subj[starts], pa.string()),
                     "partial": edges}, schema=_PARTIAL_SCHEMA)


def _partial_group(t: pa.Table) -> pa.Table:
    """Salted-mode phase 1: one (src, salt) group -> one partial list."""
    if len(t) == 0:
        return _PARTIAL_SCHEMA.insert(1, pa.field("salt", pa.int64())) \
            .empty_table()
    part = _partial_batch(t.drop_columns(["salt"]))
    return part.add_column(1, "salt", t.column("salt").slice(0, 1))


def _flat_edges(col) -> pa.Table:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return pa.table({"dst": flat.field("dst"), "pred": flat.field("pred"),
                     "weight": flat.field("weight")})


def _merge_group(t: pa.Table) -> pa.Table:
    """Phase 2: merge one src's partial lists, final edge order
    (weight desc, dst asc, pred asc) via Arrow sort_indices."""
    et = _flat_edges(t.column("partial"))
    et = et.take(pc.sort_indices(et, sort_keys=_EDGE_SORT))
    edges = pa.ListArray.from_arrays(
        pa.array([0, len(et)], pa.int32()), _edge_struct(et))
    return pa.table({
        "src": t.column("src").slice(0, 1),
        "degree": pa.array([len(et)], pa.int64()),
        "edges": edges,
    }, schema=S.ADJACENCY)


def build_adjacency(resolved_ds, n_salts: int = DEFAULT_SALTS,
                    mode: str = "combiner"):
    """Dataset[TRIPLES_DEDUP] -> Dataset[ADJACENCY].

    mode="combiner" (default): map-side partial edge lists per batch,
    then ONE groupby(src) merge — the scale path (single shuffle of
    pre-combined partials).
    mode="salted": explicit salted two-phase groupby((src, salt)) ->
    groupby(src) — the shape the north rule names; equal output,
    asserted in tests.

    Both phases stay in pyarrow batch format end to end: edge lists
    are list<struct> columns built with sort_indices +
    ListArray.from_arrays — no Python loop touches a row even in the
    final shuffle stage.
    """
    if mode == "combiner":
        partials = resolved_ds.map_batches(_partial_batch,
                                           batch_format="pyarrow")
        return partials.groupby("src").map_groups(
            _merge_group, batch_format="pyarrow")
    salted = resolved_ds.map_batches(
        lambda t: _add_salt(t, n_salts), batch_format="pyarrow")
    partials = salted.groupby(["subj", "salt"]).map_groups(
        _partial_group, batch_format="pyarrow")
    return partials.map_batches(
        lambda t: t.drop_columns(["salt"]), batch_format="pyarrow"
    ).groupby("src").map_groups(_merge_group, batch_format="pyarrow")


def adjacency_table(resolved_ds, n_salts: int = DEFAULT_SALTS) -> pa.Table:
    """Materialized, schema-normalized adjacency (tests / small outputs)."""
    df = build_adjacency(resolved_ds, n_salts).to_pandas()
    df = df.sort_values("src").reset_index(drop=True)
    return pa.Table.from_pandas(df, schema=S.ADJACENCY, preserve_index=False)
