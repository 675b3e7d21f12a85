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


def _edges_sorted(df: pd.DataFrame) -> list[dict]:
    df = df.sort_values(["weight", "obj", "pred"],
                        ascending=[False, True, True], kind="stable")
    return [
        {"dst": d, "pred": p, "weight": int(w)}
        for d, p, w in zip(df["obj"], df["pred"], df["weight"])
    ]


def _partial_group(df: pd.DataFrame) -> pd.DataFrame:
    src = df["subj"].iloc[0]
    salt = df["salt"].iloc[0]
    return pd.DataFrame(
        {"src": [src], "salt": [salt], "partial": [_edges_sorted(df)]}
    )


def _merge_group(df: pd.DataFrame) -> pd.DataFrame:
    edges = [e for part in df["partial"] for e in part]
    edges.sort(key=lambda e: (-e["weight"], e["dst"], e["pred"]))
    return pd.DataFrame(
        {"src": [df["src"].iloc[0]], "degree": [len(edges)],
         "edges": [edges]}
    )


def _partial_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Within-batch combiner: one partial edge list per src per batch
    (no shuffle). Plays the same anti-skew role as salting — a hot
    src's edges are split across however many batches carry them."""
    if df.empty:
        return pd.DataFrame({"src": [], "partial": []})
    groups = df.groupby("subj", sort=False)
    return pd.DataFrame({
        "src": [k for k, _ in groups],
        "partial": [_edges_sorted(g) for _, g in groups],
    })


def build_adjacency(resolved_ds, n_salts: int = DEFAULT_SALTS,
                    mode: str = "combiner"):
    """Dataset[TRIPLES_DEDUP] -> Dataset[ADJACENCY].

    mode="combiner" (default): map-side partial edge lists per batch,
    then ONE groupby(src) merge — the scale path (single shuffle of
    pre-combined partials).
    mode="salted": explicit salted two-phase groupby((src, salt)) ->
    groupby(src) — the shape the north rule names; equal output,
    asserted in tests.
    """
    if mode == "combiner":
        partials = resolved_ds.map_batches(_partial_batch,
                                           batch_format="pandas")
        return partials.groupby("src").map_groups(
            _merge_group, batch_format="pandas")
    salted = resolved_ds.map_batches(
        lambda t: _add_salt(t, n_salts), batch_format="pyarrow")
    partials = salted.groupby(["subj", "salt"]).map_groups(
        _partial_group, batch_format="pandas")
    return partials.groupby("src").map_groups(
        _merge_group, batch_format="pandas")


def adjacency_table(resolved_ds, n_salts: int = DEFAULT_SALTS) -> pa.Table:
    """Materialized, schema-normalized adjacency (tests / small outputs)."""
    df = build_adjacency(resolved_ds, n_salts).to_pandas()
    df = df.sort_values("src").reset_index(drop=True)
    return pa.Table.from_pandas(df, schema=S.ADJACENCY, preserve_index=False)
