"""IVF (inverted-file) ANN: distributed k-means coarse quantizer +
centroid-partitioned index + nprobe pruned search (the classic IVF
design from the FAISS literature [K Johnson, Douze & Jegou 2017],
re-expressed Ray-Data-first).

* ``kmeans_fit`` — Lloyd iterations as mergeable per-batch partials:
  each ``map_batches`` task assigns its rows to the nearest centroid
  and emits per-centroid (sum, count) partials; the driver reduces
  (k x d floats, tiny) and re-broadcasts. The dataset streams every
  iteration; nothing materializes driver-side except the centroids.
* ``build_ivf_index`` — assign each vector to its centroid and write
  parquet PARTITIONED BY LIST id (one directory per list), plus the
  centroid matrix as a sidecar parquet.
* ``ivf_ann_topk`` — rank centroids against the query, read ONLY the
  ``nprobe`` nearest list directories, exact cosine over candidates.
  Recall grows with nprobe (measured vs brute force in tests); the
  read fraction is ~nprobe/k of the index files.

Determinism: centroid init is a seeded reservoir-free pick (rows with
the k smallest stable hashes of their ids), so runs are reproducible
across processes with no RNG state in workers.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ner_ray.stages.similarity import _normalize, _to_matrix
from ner_ray.util.hashing import hash_column

CENTROIDS_FILE = "_centroids.parquet"


def _init_centroids(ds, k: int, id_col: str, emb_col: str) -> np.ndarray:
    """Deterministic init: the k rows whose stable id-hash is smallest.
    Per-batch LOCAL bottom-k first, so the global sort sees only ~k
    candidate rows per block instead of range-shuffling the whole
    embedding table (the repo's local-top-k-then-tiny-sort rule)."""
    def local_bottom_k(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             emb_col: t.column(emb_col)})
        h = hash_column(pa.compute.cast(t.column(id_col), pa.string())) \
            .view(np.int64)
        kk = min(k, len(t))
        idx = np.argpartition(h, kk - 1)[:kk]
        return pa.table({"h": pa.array(h[idx]),
                         emb_col: t.column(emb_col).take(pa.array(idx))})

    top = ds.map_batches(local_bottom_k, batch_format="pyarrow") \
        .sort("h").limit(k).to_pandas()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in top[emb_col]])
    return _normalize(m)


def kmeans_fit(ds, k: int = 16, iters: int = 8,
               id_col: str = "vec_id", emb_col: str = "embedding",
               materialize: bool = True):
    """Spherical k-means (cosine) over an embedding Dataset. Returns
    (centroids (k, d) normalized, shift history). Each iteration is one
    streaming pass; partials are (k, d) sums + (k,) counts per batch —
    mergeable, tiny, no shuffle.

    ``materialize=True`` (default) pins the embedding table in the
    object store once and reuses it across Lloyd iterations — fastest
    when it fits. ``materialize=False`` is the larger-than-cluster-
    memory mode: every iteration re-executes the upstream read (the
    lazy Dataset re-streams from storage), so nothing is pinned and the
    working set is one block per in-flight task. Centroids are
    identical either way (deterministic hash init, order-independent
    partial sums)."""
    import ray

    if materialize:
        ds = ds.materialize()
    cents = _init_centroids(ds, k, id_col, emb_col)
    history = []
    for _it in range(iters):
        cref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            if len(t) == 0:
                return pa.table({
                    "sums": pa.array([np.zeros(c.size).tolist()],
                                     pa.list_(pa.float64())),
                    "counts": pa.array(
                        [np.zeros(len(c), dtype=np.int64)],
                        pa.list_(pa.int64())),
                })
            m = _normalize(_to_matrix(t.column(emb_col)))
            assign = (m @ c.T).argmax(axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.reshape(-1)],
                                 pa.list_(pa.float64())),
                "counts": pa.array([counts], pa.list_(pa.int64())),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for s, c in zip(parts["sums"], parts["counts"]):
            sums += np.asarray(s, dtype=np.float64).reshape(cents.shape)
            counts += np.asarray(c, dtype=np.int64)
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = _normalize(sums[nonempty] /
                                   counts[nonempty, None])
        shift = float(np.linalg.norm(new - cents))
        history.append(round(shift, 6))
        cents = new
        if shift < 1e-9:
            break
    return cents, history


def build_ivf_index(ds, out_dir: str, centroids: np.ndarray,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """Assign vectors to their nearest centroid and write one parquet
    directory per inverted list; centroids go to a sidecar file."""
    import ray

    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("ivf_list", pa.array([], pa.int64()))
        m = _normalize(_to_matrix(t.column(emb_col)))
        lists = (m @ ray.get(cref).T).argmax(axis=1).astype(np.int64)
        return t.append_column("ivf_list", pa.array(lists))

    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["ivf_list"])
    k, d = centroids.shape
    pq.write_table(
        pa.table({"centroid": pa.array(
            [centroids[i].tolist() for i in range(k)],
            pa.list_(pa.float64()))}),
        os.path.join(out_dir, CENTROIDS_FILE))


def ivf_ann_topk(index_dir: str, query_vec: np.ndarray, k: int = 10,
                 nprobe: int = 4, id_col: str = "vec_id",
                 emb_col: str = "embedding", filesystem=None):
    """Pruned IVF search: read only the nprobe nearest inverted lists
    via the shared pruned-read helper (similarity._pruned_topk).
    Returns (Dataset[(id, sim)], read_fraction). All I/O goes through
    ``pyarrow.fs`` so the index may live on an object store."""
    from ner_ray.stages.similarity import _pruned_topk, _resolve_fs

    fs, root = _resolve_fs(index_dir, filesystem)
    with fs.open_input_file(f"{root.rstrip('/')}/{CENTROIDS_FILE}") as f:
        cent_tbl = pq.read_table(f)
    cents = np.stack([
        np.asarray(v, dtype=np.float64)
        for v in cent_tbl.column("centroid").to_pylist()])
    q = _normalize(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))
    order = np.argsort(-(q @ cents.T)[0])
    probe = set(int(i) for i in order[:nprobe])
    return _pruned_topk(root, "ivf_list", probe, q[0], k,
                        id_col, emb_col, filesystem=fs)
