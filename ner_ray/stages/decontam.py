"""Benchmark decontamination — the standard corpus-curation step of
removing training documents that share any length-n word n-gram with a
held-out evaluation set (the public recipe used for GPT-3/PaLM-style
training-data hygiene; n=13 is the customary default).

Scale shape: the eval side is small by nature (benchmark suites are
MBs against a 100-TB corpus), so its distinct n-gram hashes collect to
the driver once and broadcast via ``ray.put``; the corpus then streams
through ONE map-only filter — no shuffle, no materialization of the
corpus. For a pathologically large eval set (above
``max_broadcast_hashes``) the operator switches to an exact bucketed
path: the corpus's (ngram-hash, id) scalar pairs and the eval hashes
co-shuffle into hash buckets, contaminated ids fall out per bucket,
and the shared anti-filter removes them — corpus text shuffles never.

n-gram identity is the seed-stable 64-bit hash of the space-joined
word window (ner_ray.util.hashing) — the same hash-equality contract
exact_dedup already value-matches under; the DuckDB oracle compares
the n-gram STRINGS directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.stages.neardup import _shingle_hashes, anti_filter_docs
from ner_ray.util.hashing import to_bucket

# eval n-gram hash sets above this switch from broadcast to the
# bucketed exact path (8 bytes/hash -> ~400 MB broadcast at the cap)
MAX_BROADCAST_HASHES = 50_000_000


def _batch_ngram_hashes(texts: pa.ChunkedArray | pa.Array,
                        n: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, uint64 hash) of every word n-gram in the batch."""
    import pyarrow.compute as pc

    s = pc.fill_null(texts, "").to_pandas()
    return _shingle_hashes(s, k=n)


def eval_ngram_hashes(eval_ds, text_col: str = "text",
                      n: int = 13) -> np.ndarray:
    """Sorted distinct uint64 n-gram hashes of the eval set. Per-batch
    partial dedup runs distributed; only unique hashes (bounded by the
    eval set's size, small by contract) reach the driver."""
    def partial(t: pa.Table) -> pa.Table:
        _, h = _batch_ngram_hashes(t.column(text_col), n)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = [b.column("h").to_numpy(zero_copy_only=False)
             for b in eval_ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(parts).view(np.uint64))


def decontaminate(docs_ds, eval_ds=None, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str | None = None,
                  eval_hashes: np.ndarray | None = None,
                  max_broadcast_hashes: int = MAX_BROADCAST_HASHES,
                  num_buckets: int | None = None):
    """Drop every doc sharing at least one word n-gram with the eval
    set. Pass ``eval_ds`` (a Dataset with ``eval_text_col``, default =
    ``text_col``) or precomputed ``eval_hashes`` (sorted uint64, e.g.
    persisted once and reused across corpus shards). Returns the
    surviving docs with all columns; map-only (no corpus shuffle) on
    the broadcast path."""
    import ray

    if eval_hashes is None:
        if eval_ds is None:
            raise ValueError("decontaminate needs eval_ds or eval_hashes")
        eval_hashes = eval_ngram_hashes(
            eval_ds, text_col=eval_text_col or text_col, n=n)
    eval_hashes = np.asarray(eval_hashes, dtype=np.uint64)
    if len(eval_hashes) == 0:
        return docs_ds

    if len(eval_hashes) <= max_broadcast_hashes:
        ref = ray.put(np.sort(eval_hashes))

        def drop(t: pa.Table) -> pa.Table:
            hs = ray.get(ref)
            row, h = _batch_ngram_hashes(t.column(text_col), n)
            idx = np.searchsorted(hs, h)
            hit = np.where(idx < len(hs), hs[np.minimum(idx, len(hs) - 1)]
                           == h, False)
            keep = np.ones(len(t), dtype=bool)
            keep[np.unique(row[hit])] = False
            return t.filter(pa.array(keep))

        return docs_ds.map_batches(drop, batch_format="pyarrow")

    # bucketed exact path: corpus (hash, id) pairs + eval hashes
    # co-shuffle by hash bucket; contaminated ids fall out per bucket
    return _decontaminate_bucketed(docs_ds, eval_hashes, n, text_col,
                                   id_col, num_buckets)


def contamination_report(docs_ds, eval_ds=None, n: int = 13,
                         text_col: str = "text", id_col: str = "doc_id",
                         eval_text_col: str | None = None,
                         eval_hashes: np.ndarray | None = None,
                         max_broadcast_hashes: int = MAX_BROADCAST_HASHES):
    """The audit view of ``decontaminate``: one row per CONTAMINATED
    doc with the number of distinct eval n-grams it shares
    (``n_shared``) and its own distinct n-gram count (``n_ngrams``) —
    what you inspect before deciding to drop. Broadcast map-only; same
    hash contract as decontaminate."""
    import ray

    if eval_hashes is None:
        if eval_ds is None:
            raise ValueError(
                "contamination_report needs eval_ds or eval_hashes")
        eval_hashes = eval_ngram_hashes(
            eval_ds, text_col=eval_text_col or text_col, n=n)
    hs = np.sort(np.asarray(eval_hashes, dtype=np.uint64))
    # same size guard as decontaminate's broadcast path: the audit view
    # has no bucketed fallback, so a pathological eval set must raise
    # (with the knob named) rather than OOM every map task
    if len(hs) > max_broadcast_hashes:
        raise ValueError(
            f"eval set has {len(hs)} distinct n-gram hashes, above "
            f"max_broadcast_hashes={max_broadcast_hashes}; shard the "
            "eval set and union the per-shard reports (summing "
            "n_shared per doc), or raise the cap explicitly if the "
            "cluster's workers can hold the broadcast")
    ref = ray.put(hs)

    def report(t: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        row, h = _batch_ngram_hashes(t.column(text_col), n)
        # distinct (row, hash) so repeated n-grams inside one doc
        # count once, matching COUNT(DISTINCT g) semantics
        if len(h):
            rh = np.unique(
                np.stack([row.astype(np.uint64), h], axis=1), axis=0)
            row, h = rh[:, 0].astype(np.int64), rh[:, 1]
        hit = np.zeros(len(h), dtype=bool)
        if len(ev) and len(h):
            idx = np.searchsorted(ev, h)
            idx_c = np.minimum(idx, len(ev) - 1)
            hit = (idx < len(ev)) & (ev[idx_c] == h)
        n_shared = np.bincount(row, weights=hit, minlength=len(t)) \
            .astype(np.int64)
        n_grams = np.bincount(row, minlength=len(t)).astype(np.int64)
        keep = n_shared > 0
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "n_shared": pa.array(n_shared[keep]),
            "n_ngrams": pa.array(n_grams[keep]),
        })

    return docs_ds.map_batches(report, batch_format="pyarrow")


# eval embedding matrices above this row count must be sharded by the
# caller (at 768 float32 dims the cap is ~6 GB broadcast — already far
# beyond any benchmark suite); raising beats silently degrading recall
MAX_EVAL_EMBEDDINGS = 2_000_000


def _eval_matrix(eval_ds, emb_col: str, max_rows: int) -> np.ndarray:
    """Collect + L2-normalize the eval embedding matrix (driver-sized
    by contract: benchmark suites are thousands of rows against a
    100-TB corpus). Row count is enforced, not truncated."""
    from ner_ray.stages.similarity import _normalize, _to_matrix

    mats, total = [], 0
    for b in eval_ds.select_columns([emb_col]) \
            .iter_batches(batch_format="pyarrow"):
        if len(b) == 0:
            continue
        total += len(b)
        if total > max_rows:
            raise ValueError(
                f"eval set exceeds max_eval_rows={max_rows}; shard the "
                "eval set and intersect survivor ids across shards")
        mats.append(_to_matrix(b.column(emb_col)))
    if not mats:
        return np.zeros((0, 1))
    return _normalize(np.vstack(mats))


def semantic_decontaminate(train_ds, eval_ds=None, tau: float = 0.95,
                           emb_col: str = "embedding",
                           eval_emb_col: str | None = None,
                           eval_matrix: np.ndarray | None = None,
                           max_eval_rows: int = MAX_EVAL_EMBEDDINGS,
                           eval_chunk: int = 8192):
    """Embedding-level decontamination: drop every training row whose
    cosine similarity against ANY eval embedding is >= ``tau`` — the
    semantic complement of the n-gram ``decontaminate`` (catches
    paraphrased/reformatted eval leakage that shares no 13-gram).

    Scale shape mirrors ``decontaminate``'s broadcast path: the eval
    matrix is normalized once, ``ray.put`` once, and the corpus streams
    through ONE map-only filter — no shuffle, nothing corpus-sized ever
    materializes. Per batch the matmul runs in ``eval_chunk``-column
    slabs with a running max, so peak memory is O(batch x chunk)
    however large the eval suite. Pass ``eval_matrix`` (already
    normalized or raw) to reuse one collection across corpus shards.
    """
    import ray

    from ner_ray.stages.similarity import _normalize, _to_matrix

    if eval_matrix is None:
        if eval_ds is None:
            raise ValueError(
                "semantic_decontaminate needs eval_ds or eval_matrix")
        eval_matrix = _eval_matrix(eval_ds, eval_emb_col or emb_col,
                                   max_eval_rows)
    else:
        eval_matrix = _normalize(
            np.atleast_2d(np.asarray(eval_matrix, dtype=np.float64)))
    if eval_matrix.shape[0] == 0:
        return train_ds
    ref = ray.put(np.ascontiguousarray(eval_matrix.T))  # (d, m)

    def drop(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        et = ray.get(ref)
        x = _normalize(_to_matrix(t.column(emb_col)))
        if x.shape[1] != et.shape[0]:
            raise ValueError(
                f"embedding dim mismatch: train {x.shape[1]} vs "
                f"eval {et.shape[0]}")
        mx = np.full(len(t), -np.inf)
        for lo in range(0, et.shape[1], eval_chunk):
            np.maximum(mx, (x @ et[:, lo:lo + eval_chunk]).max(axis=1),
                       out=mx)
        return t.filter(pa.array(mx < tau))

    return train_ds.map_batches(drop, batch_format="pyarrow")


def semantic_contamination_report(train_ds, eval_ds=None,
                                  tau: float = 0.95,
                                  emb_col: str = "embedding",
                                  id_col: str = "vec_id",
                                  eval_emb_col: str | None = None,
                                  eval_matrix: np.ndarray | None = None,
                                  max_eval_rows: int = MAX_EVAL_EMBEDDINGS,
                                  eval_chunk: int = 8192):
    """Audit view of ``semantic_decontaminate``: one row per
    CONTAMINATED training row with its max eval cosine (``max_sim``)
    and the offending eval row's position in the collected eval matrix
    (``eval_idx``, iteration order of the eval dataset). Broadcast
    map-only; same normalization contract as the filter."""
    import ray

    from ner_ray.stages.similarity import _normalize, _to_matrix

    if eval_matrix is None:
        if eval_ds is None:
            raise ValueError("semantic_contamination_report needs "
                             "eval_ds or eval_matrix")
        eval_matrix = _eval_matrix(eval_ds, eval_emb_col or emb_col,
                                   max_eval_rows)
    else:
        eval_matrix = _normalize(
            np.atleast_2d(np.asarray(eval_matrix, dtype=np.float64)))
    ref = ray.put(np.ascontiguousarray(eval_matrix.T))

    def report(t: pa.Table) -> pa.Table:
        et = ray.get(ref)
        if len(t) == 0 or et.shape[1] == 0:
            return pa.table({
                id_col: t.column(id_col).slice(0, 0),
                "max_sim": pa.array([], pa.float64()),
                "eval_idx": pa.array([], pa.int64()),
            })
        x = _normalize(_to_matrix(t.column(emb_col)))
        mx = np.full(len(t), -np.inf)
        arg = np.zeros(len(t), dtype=np.int64)
        for lo in range(0, et.shape[1], eval_chunk):
            sims = x @ et[:, lo:lo + eval_chunk]
            loc = sims.argmax(axis=1)
            val = sims[np.arange(len(t)), loc]
            upd = val > mx
            mx[upd] = val[upd]
            arg[upd] = loc[upd] + lo
        keep = mx >= tau
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "max_sim": pa.array(mx[keep]),
            "eval_idx": pa.array(arg[keep]),
        })

    return train_ds.map_batches(report, batch_format="pyarrow")


def _decontaminate_bucketed(docs_ds, eval_hashes, n, text_col, id_col,
                            num_buckets):
    if num_buckets is None:
        from ner_ray.stages.neardup import _auto_buckets

        num_buckets = _auto_buckets(docs_ds)
    import ray.data as rd

    def doc_rows(t: pa.Table) -> pa.Table:
        row, h = _batch_ngram_hashes(t.column(text_col), n)
        ids = t.column(id_col).take(pa.array(row))
        return pa.table({
            "_h": pa.array(h.view(np.int64)),
            id_col: ids,
            "_b": pa.array(to_bucket(h, num_buckets)),
            "_is_eval": pa.array(np.zeros(len(h), np.int8)),
        })

    id_type = None
    for b in docs_ds.limit(1).iter_batches(batch_format="pyarrow"):
        id_type = b.schema.field(id_col).type
    if id_type is None:
        # empty corpus: nothing to decontaminate, and a null-typed id
        # column could never union with the doc-rows schema anyway
        return docs_ds
    ev_tbl = pa.table({
        "_h": pa.array(eval_hashes.view(np.int64)),
        id_col: pa.nulls(len(eval_hashes), id_type),
        "_b": pa.array(to_bucket(eval_hashes, num_buckets)),
        "_is_eval": pa.array(np.ones(len(eval_hashes), np.int8)),
    })
    both = docs_ds.map_batches(doc_rows, batch_format="pyarrow") \
        .union(rd.from_arrow(ev_tbl))

    def contaminated(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_ev = pc.equal(g.column("_is_eval"), pa.scalar(1, pa.int8()))
        ev_h = g.filter(is_ev).column("_h")
        doc = g.filter(pc.invert(is_ev))
        hit = pc.is_in(doc.column("_h"), value_set=ev_h.combine_chunks())
        out = doc.filter(hit).select([id_col])
        return out.group_by(id_col).aggregate([])   # distinct ids

    drops = both.groupby("_b").map_groups(contaminated,
                                          batch_format="pyarrow")
    return anti_filter_docs(docs_ds, drops, drop_col=id_col,
                            id_col=id_col, num_buckets=num_buckets)
