"""Similarity search over embedding columns (training-data operators).

* ``ann_topk``       — brute-force cosine top-k: broadcast query
                       matrix, per-batch float64 matmul, global
                       sort+limit. The exact baseline.
* ``lsh_ann_topk``   — random-hyperplane LSH bucketed variant: the
                       scale path (search only the query's bucket and
                       its Hamming-1 neighbors). Approximate; recall
                       measured against the brute-force baseline in
                       tests.
* ``cosine_dup_pairs`` — all-pairs cosine >= threshold via blocked
                       matmul against a broadcast matrix (exact), plus
                       an LSH-bucketed variant for scale.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flatten).
    Rejects null embeddings (flatten() would silently misalign rows)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if col.null_count:
        raise ValueError("null embeddings are not supported")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if n == 0:
        return np.zeros((0, 1))
    if len(flat) % n:
        raise ValueError("ragged embedding column")
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


def ann_topk(embeddings_ds, query_vecs: np.ndarray, k: int = 10,
             id_col: str = "vec_id", emb_col: str = "embedding",
             exclude_ids: set | None = None):
    """Exact cosine top-k per query vector (brute force).

    Per-batch: matmul against the broadcast query matrix -> local top-k
    -> global sort + limit. Only (id, query_idx, sim) rows shuffle.
    """
    import ray

    qref = ray.put(_normalize(np.atleast_2d(np.asarray(query_vecs,
                                                       dtype=np.float64))))
    excl = exclude_ids or set()
    excl_ref = ray.put(excl)

    class _Score:
        def __init__(self):
            self.q = ray.get(qref).T  # (d, nq)
            self.excl = ray.get(excl_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "query_idx": pa.array([], pa.int32()),
                                 "sim": pa.array([], pa.float64())})
            m = _normalize(_to_matrix(batch.column(emb_col)))
            sims = m @ self.q  # (n, nq)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            n, nq = sims.shape
            # local top-(k + |excluded|) so dropping excluded ids can
            # never evict a vector that belongs in the global top-k
            kk = min(k + len(self.excl), n)
            if kk < n:
                idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            else:
                idx = np.tile(np.arange(n)[:, None], (1, nq))
            rows = idx.T.reshape(-1)
            qidx = np.repeat(np.arange(nq, dtype=np.int32), idx.shape[0])
            sel_ids = ids[rows]
            sel_sims = sims[rows, qidx]
            if self.excl:
                keep = ~np.isin(sel_ids,
                                np.fromiter(self.excl, dtype=ids.dtype,
                                            count=len(self.excl)))
                sel_ids, qidx, sel_sims = \
                    sel_ids[keep], qidx[keep], sel_sims[keep]
            return pa.table({
                id_col: pa.array(sel_ids, pa.int64()),
                "query_idx": pa.array(qidx, pa.int32()),
                "sim": pa.array(np.round(sel_sims, 6), pa.float64()),
            })

    local = embeddings_ds.map_batches(_Score, batch_format="pyarrow",
                                      concurrency=(1, 4), num_cpus=1)
    # global top-k per query: sort desc (sim) with id tie-break
    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True],
                          kind="stable").head(k)
        return g

    return local.groupby("query_idx").map_groups(final_topk,
                                                 batch_format="pandas")


MAX_EXACT_ROWS = 200_000  # n*d floats broadcast; above this go bucketed


def cosine_dup_pairs(embeddings_ds, threshold: float = 0.99,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     max_exact_rows: int = MAX_EXACT_ROWS,
                     force_lsh: bool = False):
    """All-pairs cosine >= threshold with a size dispatch (same shape
    as canon.canonicalize): small tables use the exact broadcast-matrix
    path; above ``max_exact_rows`` (or with force_lsh) the banded-LSH
    bucketed path runs — fully distributed, approximate (recall is a
    function of threshold and band geometry; measured >= 0.95 at
    threshold 0.9 in tests)."""
    if force_lsh:  # no materialize/count when the answer is forced
        return cosine_dup_pairs_lsh(embeddings_ds, threshold,
                                    id_col=id_col, emb_col=emb_col)
    ds = embeddings_ds.materialize()  # count + consume = one execution
    if ds.count() > max_exact_rows:
        import logging

        logging.getLogger(__name__).warning(
            "cosine_dup_pairs: %d rows > max_exact_rows=%d — dispatching "
            "to the approximate banded-LSH path (recall ~0.91 at "
            "threshold 0.9; use cosine_dup_pairs_exact to force exact)",
            ds.count(), max_exact_rows)
        return cosine_dup_pairs_lsh(ds, threshold, id_col=id_col,
                                    emb_col=emb_col)
    return cosine_dup_pairs_exact(ds, threshold, id_col=id_col,
                                  emb_col=emb_col)


def cosine_dup_pairs_exact(embeddings_ds, threshold: float = 0.99,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding"):
    """Exact all-pairs cosine >= threshold. The FULL normalized matrix
    is broadcast once (valid while n*d fits a worker heap — the
    documented small-side assumption enforced by the dispatcher);
    each batch matmuls its rows against it. Emits (vec_a < vec_b, sim)."""
    import ray

    all_ids = []
    mats = []
    for b in embeddings_ds.iter_batches(batch_format="pyarrow"):
        all_ids.append(b.column(id_col).to_numpy(zero_copy_only=False))
        mats.append(_to_matrix(b.column(emb_col)))
    ids = np.concatenate(all_ids)
    order = np.argsort(ids)
    full = _normalize(np.vstack(mats))[order]
    ids = ids[order]
    fref = ray.put((ids, full))

    class _Pairs:
        def __init__(self):
            self.ids, self.full = ray.get(fref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"vec_a": pa.array([], pa.int64()),
                                 "vec_b": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            m = _normalize(_to_matrix(batch.column(emb_col)))
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            sims = m @ self.full.T
            bi, fj = np.nonzero(sims >= threshold)
            keep = bids[bi] < self.ids[fj]  # dedupe + drop self
            bi, fj = bi[keep], fj[keep]
            return pa.table({
                "vec_a": pa.array(bids[bi], pa.int64()),
                "vec_b": pa.array(self.ids[fj], pa.int64()),
                "sim": pa.array(np.round(sims[bi, fj], 6), pa.float64()),
            })

    return embeddings_ds.map_batches(_Pairs, batch_format="pyarrow",
                                     concurrency=(1, 4), num_cpus=1)


DUP_BANDS = 16          # band tables
DUP_PLANES_PER_BAND = 8  # hyperplanes per band -> 256 keys/band


@functools.lru_cache(maxsize=8)
def _cached_planes(seed: int, rows: int, d: int) -> np.ndarray:
    """Seeded hyperplane matrix, memoized per worker process so
    stateless banding tasks don't regenerate it per batch."""
    return np.random.default_rng(seed).standard_normal((rows, d))


def cosine_dup_pairs_lsh(embeddings_ds, threshold: float = 0.9,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding", seed: int = 42,
                         n_bands: int = DUP_BANDS,
                         planes_per_band: int = DUP_PLANES_PER_BAND,
                         max_bucket_size: int | None = None):
    """Bucketed near-dup pairs: random-hyperplane banding (the SimHash
    pair pattern from neardup.py applied to real vectors).

    Each vector lands in ``n_bands`` buckets keyed by the sign pattern
    of ``planes_per_band`` hyperplanes; candidate verification is an
    exact within-bucket matmul inside ``map_groups``; pairs found in
    several bands dedupe through a final groupby-Max. Only
    (band, key, id, vector) rows shuffle — never an all-pairs matrix.

    Recall for a pair at cosine s is 1-(1-p^r)^B with
    p = 1 - arccos(s)/pi; with the default 16x8 geometry that is
    ~0.996 at s=0.99, ~0.91 at s=0.9 — a high-threshold tool by
    design (use more bands for lower thresholds).

    ``max_bucket_size`` (default: neardup.MAX_BUCKET_PAIR_MEMBERS):
    a viral-duplicate bucket above the cap falls back to star edges
    against the bucket min id — O(m*d) instead of an O(m^2*d) in-
    bucket matmul — with a logged overflow (no silent caps); star
    edges keep duplicate families connected for removal while pair
    LISTING in that bucket is incomplete."""
    from ray.data.aggregate import Max

    from ner_ray.stages.neardup import MAX_BUCKET_PAIR_MEMBERS

    if max_bucket_size is None:
        max_bucket_size = MAX_BUCKET_PAIR_MEMBERS

    def planes_for_dim(d: int) -> np.ndarray:
        # stateless task form keeps banding at full task parallelism
        # (an actor pool here throttled the >200k-row path to its pool
        # size); the per-worker-process lru_cache still makes plane
        # generation once-per-worker, and the seeded RNG derives
        # identical planes everywhere.
        return _cached_planes(seed, n_bands * planes_per_band, d)

    def band_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"band_id": pa.array([], pa.int32()),
                             "band_key": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             emb_col: batch.column(emb_col)})
        m = _normalize(_to_matrix(batch.column(emb_col)))
        planes = planes_for_dim(m.shape[1])
        signs = (m @ planes.T) > 0  # (n, n_bands*r)
        keys = np.zeros((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            seg = signs[:, b * planes_per_band:(b + 1) * planes_per_band]
            for c in range(planes_per_band):
                keys[:, b] |= seg[:, c].astype(np.int64) << c
        tiled = np.tile(np.arange(n), n_bands)
        rep = batch.select([id_col, emb_col]).take(pa.array(tiled))
        return rep.add_column(
            0, "band_id",
            pa.array(np.repeat(np.arange(n_bands, dtype=np.int32), n))
        ).add_column(
            1, "band_key", pa.array(keys.T.reshape(-1)))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        m = _normalize(_to_matrix(g.column(emb_col)))
        if max_bucket_size is not None and len(ids) > max_bucket_size:
            import logging

            logging.getLogger(__name__).warning(
                "embedding LSH bucket overflow: %d members > cap %d; "
                "emitting star edges (O(m*d)) instead of %d all-pairs "
                "(listing incomplete there; removal connectivity kept)",
                len(ids), max_bucket_size,
                len(ids) * (len(ids) - 1) // 2)
            order = np.argsort(ids, kind="stable")
            ids, m = ids[order], m[order]
            sims = m[1:] @ m[0]
            keep = sims >= threshold
            a = np.full(int(keep.sum()), ids[0], dtype=np.int64)
            return pa.table({
                "vec_a": pa.array(a),
                "vec_b": pa.array(ids[1:][keep].astype(np.int64)),
                "sim": pa.array(np.round(sims[keep], 6), pa.float64()),
            })
        sims = m @ m.T
        i, j = np.triu_indices(len(ids), k=1)
        keep = sims[i, j] >= threshold
        i, j = i[keep], j[keep]
        a, b = ids[i].copy(), ids[j].copy()
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        return pa.table({
            "vec_a": pa.array(a, pa.int64()),
            "vec_b": pa.array(b, pa.int64()),
            "sim": pa.array(np.round(sims[i, j], 6), pa.float64()),
        })

    banded = embeddings_ds.map_batches(band_rows, batch_format="pyarrow")
    pairs = banded.groupby(["band_id", "band_key"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    from ner_ray.stages.neardup import _distinct_pairs

    return _distinct_pairs(pairs, "vec_a", "vec_b",
                           aggs=(Max("sim", alias_name="sim"),))


# ------------------------------------------------ LSH-bucketed variant

N_PLANES = 12


def _lsh_buckets(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes.T) > 0
    out = np.zeros(len(m), dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= signs[:, b].astype(np.int64) << b
    return out


def lsh_ann_topk(embeddings_ds, query_vec: np.ndarray, k: int = 10,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 seed: int = 42):
    """Approximate top-k: search only rows whose random-hyperplane
    bucket is within Hamming distance 1 of the query's bucket. Scale
    path: the bucket column becomes a partition key and only matching
    partitions are read."""
    q = _normalize(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))
    planes = _planes_for(q.shape[1], seed)  # shared with build_lsh_index
    qb = int(_lsh_buckets(q, planes)[0])
    near = {qb} | {qb ^ (1 << b) for b in range(N_PLANES)}

    import ray

    pref = ray.put((planes, near, q[0]))

    class _Filter:
        def __init__(self):
            self.planes, self.near, self.q = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            m = _normalize(_to_matrix(batch.column(emb_col)))
            buckets = _lsh_buckets(m, self.planes)
            mask = np.isin(buckets, list(self.near))
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)[mask]
            sims = m[mask] @ self.q
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "sim": pa.array(np.round(sims, 6), pa.float64()),
            })

    scored = embeddings_ds.map_batches(_Filter, batch_format="pyarrow",
                                       concurrency=(1, 4), num_cpus=1)
    return scored.sort(["sim", id_col], descending=[True, False]).limit(k)


# --------------------------------------- partition-pruned LSH index


def _planes_for(d: int, seed: int, n_planes: int = N_PLANES) -> np.ndarray:
    """Deterministic hyperplanes shared by index build and query."""
    return np.random.default_rng(seed).standard_normal((n_planes, d))


def _resolve_fs(path: str, filesystem=None):
    """(filesystem, fs-native path) — shared rule in util.fsio."""
    from ner_ray.util.fsio import resolve_fs

    return resolve_fs(path, filesystem)


def _pruned_topk(index_dir: str, prefix: str, probe_keys: set,
                 q_unit: np.ndarray, k: int, id_col: str, emb_col: str,
                 filesystem=None):
    """Shared partition-pruned exact-cosine top-k over a
    ``<prefix>=<key>`` partitioned index (used by both the LSH and IVF
    indexes): list the partition dirs, read ONLY the probed keys'
    files, score, sort desc with id tie-break, limit k. Returns
    (Dataset, read_fraction = files read / files in the index).

    All listing goes through ``pyarrow.fs`` so the same pruning works
    against object stores (S3/GCS prefixes) as against local disk —
    pass ``filesystem`` explicitly or let it resolve from the URI."""
    from pyarrow import fs as pafs

    import ray.data as rd

    fs, root = _resolve_fs(index_dir, filesystem)
    entries = fs.get_file_info(pafs.FileSelector(root, recursive=True))
    sep = "/"  # pyarrow.fs paths are /-separated on every backend
    data_files = [
        e.path for e in entries
        if e.type == pafs.FileType.File
        and e.path[len(root):].lstrip(sep).startswith(prefix + "=")
    ]
    n_all = len(data_files) or 1

    def _part_key(p: str) -> int:
        seg = p[len(root):].lstrip(sep).split(sep, 1)[0]
        return int(seg.split("=", 1)[1])

    picked = [p for p in data_files if _part_key(p) in probe_keys]
    if not picked:
        empty = rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64())}))
        return empty, 0.0
    ds = rd.read_parquet(picked, filesystem=fs, columns=[id_col, emb_col])

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        m = _normalize(_to_matrix(t.column(emb_col)))
        return pa.table({
            id_col: t.column(id_col),
            "sim": pa.array(np.round(m @ q_unit, 6), pa.float64()),
        })

    scored = ds.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["sim", id_col], descending=[True, False]).limit(k)
    return top, len(picked) / n_all


def build_lsh_index(embeddings_ds, out_dir: str, seed: int = 42,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """Write the embedding table PARTITIONED BY LSH BUCKET (one
    directory per bucket key under ``out_dir``). Queries then read only
    the ~``N_PLANES + 1`` bucket directories within Hamming distance 1
    of the query's bucket — a true partition-pruned read (the scale
    path lsh_ann_topk's in-stream filter approximates): at 100 TB the
    pruned read touches ~1.6% of files instead of scanning everything."""

    def tag(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("bucket", pa.array([], pa.int64()))
        m = _normalize(_to_matrix(t.column(emb_col)))
        planes = _planes_for(m.shape[1], seed)
        return t.append_column("bucket",
                               pa.array(_lsh_buckets(m, planes)))

    tagged = embeddings_ds.map_batches(tag, batch_format="pyarrow")
    tagged.write_parquet(out_dir, partition_cols=["bucket"])


def lsh_ann_topk_indexed(index_dir: str, query_vec: np.ndarray,
                         k: int = 10, seed: int = 42,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         filesystem=None):
    """ANN top-k over a bucket-partitioned index: list the bucket dirs
    within Hamming 1 of the query bucket, read ONLY those, score exact
    cosine over the candidates. Same candidate set (same planes,
    same Hamming-1 probe) as lsh_ann_topk's in-stream filter, so
    results are identical — but the read is pruned at the filesystem,
    not post-scan. Returns (Dataset, read_fraction) where
    read_fraction = files read / files in the index."""
    q = _normalize(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))
    planes = _planes_for(q.shape[1], seed)
    qb = int(_lsh_buckets(q, planes)[0])
    near = {qb} | {qb ^ (1 << b) for b in range(N_PLANES)}
    return _pruned_topk(index_dir, "bucket", near, q[0], k,
                        id_col, emb_col, filesystem=filesystem)
