"""SemDeDup-style semantic deduplication over an embedding column.

Public-literature algorithm (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
arXiv:2303.09540): cluster embeddings with spherical k-means, then
within each cluster drop every item whose cosine similarity to an
already-kept item is >= eps, keeping preferentially the items FURTHEST
from the centroid (low centroid similarity first — the paper's
"keep low-similarity" variant, which retains outliers and drops
redundant near-centroid mass).

Scale design (the partitioning assumption, documented per SURVEY
§2.10): the all-pairs comparison is confined to one k-means cluster at
a time — a single `groupby("cluster").map_groups` after a broadcast
centroid assignment, so only (id, cluster, centroid_sim, embedding)
rows shuffle and each group is processed independently on one worker.
Choose k so the expected cluster size (N/k) fits a worker's heap; the
within-cluster greedy scans in fixed-size chunks against the kept set,
so peak memory is O(chunk x kept) per group, not O(n^2). k-means
itself is the existing mergeable-partials implementation (ivf.py) and
supports materialize=False for embedding tables near cluster memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray.stages.ivf import kmeans_fit
from ner_ray.stages.similarity import _normalize, _to_matrix

CHUNK = 1024


def _greedy_keep(m: np.ndarray, eps: float) -> np.ndarray:
    """Greedy scan over rows of a normalized matrix (already in keep-
    priority order): row i is kept iff its cosine to every earlier kept
    row is < eps. Chunked so peak memory is O(CHUNK x kept); the
    within-chunk pass is a short sequential loop over candidate rows
    (each step vectorized over the remaining chunk) — inherent to the
    greedy's sequential dependency, bounded by CHUNK."""
    n = len(m)
    kept = np.zeros(n, dtype=bool)
    kept_rows: list[np.ndarray] = []
    for lo in range(0, n, CHUNK):
        chunk = m[lo:lo + CHUNK]
        if kept_rows:
            prev = np.concatenate(kept_rows, axis=0)
            ok = (chunk @ prev.T).max(axis=1) < eps
        else:
            ok = np.ones(len(chunk), dtype=bool)
        sims = chunk @ chunk.T
        cand = np.flatnonzero(ok)
        alive = np.ones(len(chunk), dtype=bool)
        for i in cand:
            if not alive[i]:
                continue
            kept[lo + i] = True
            later = sims[i, i + 1:] >= eps
            alive[i + 1:][later] = False
        new_rows = chunk[kept[lo:lo + len(chunk)]]
        if len(new_rows):
            kept_rows.append(new_rows)
    return kept


def semantic_dedup(embeddings_ds, k: int = 16, eps: float = 0.95,
                   iters: int = 8, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   materialize: bool = True):
    """SemDeDup decision table: one row per input embedding with
    (id_col, cluster, centroid_sim, kept). Filter ``kept`` for the
    survivor ids; anti-join the rest to remove dups from the corpus.

    Deterministic end to end: hash-init k-means, order-independent
    partial sums, and a (centroid_sim, id) sort inside each cluster
    before the greedy."""
    import ray

    if materialize:
        embeddings_ds = embeddings_ds.materialize()
    cents, _ = kmeans_fit(embeddings_ds, k=k, iters=iters, id_col=id_col,
                          emb_col=emb_col, materialize=False)
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        if len(t) == 0:
            return pa.table({
                id_col: t.column(id_col),
                "cluster": pa.array([], pa.int64()),
                "centroid_sim": pa.array([], pa.float64()),
                emb_col: t.column(emb_col),
            })
        m = _normalize(_to_matrix(t.column(emb_col)))
        sims = m @ c.T
        cl = sims.argmax(axis=1).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(cl),
            "centroid_sim": pa.array(sims.max(axis=1).astype(np.float64)),
            emb_col: t.column(emb_col),
        })

    assigned = embeddings_ds.map_batches(assign, batch_format="pyarrow")

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["centroid_sim", id_col],
                          kind="stable").reset_index(drop=True)
        m = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in g[emb_col]]))
        kept = _greedy_keep(m, eps)
        return pd.DataFrame({
            id_col: g[id_col],
            "cluster": g["cluster"],
            "centroid_sim": g["centroid_sim"],
            "kept": kept,
        })

    return assigned.groupby("cluster").map_groups(
        dedup_group, batch_format="pandas")


def semantic_dedup_keep_ids(embeddings_ds, **kwargs):
    """Survivor ids only (a Dataset with id_col), for anti-join removal."""
    id_col = kwargs.get("id_col", "vec_id")
    return semantic_dedup(embeddings_ds, **kwargs) \
        .filter(expr="kept == True").select_columns([id_col])
