"""Document -> training-sequence chunking: split each doc's token
stream into windows of at most ``max_tokens`` with optional overlap —
the step between a cleaned corpus and fixed-length pre-training
examples. Pure map (one doc's chunks never depend on another doc), so
it streams at any scale with zero shuffle; chunk identity
``(doc_id, chunk_idx)`` is deterministic, making downstream sampling /
dedup / resume stable.

Tokens are whitespace words (the repo-wide convention shared with
q_text_stats' n_tokens); a subword tokenizer drops in by swapping the
split kernel — the windowing math is tokenizer-agnostic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(docs_ds, max_tokens: int = 512, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id",
                    drop_empty: bool = True):
    """One row per chunk: (id_col, chunk_idx, text_col, n_tokens).
    Windows start every ``max_tokens - overlap`` tokens; the final
    window may be short (never padded — packing policy belongs to the
    trainer). Empty/whitespace docs vanish with ``drop_empty``, else
    produce one empty chunk. Window arithmetic is fully vectorized;
    the unavoidable per-chunk string join is a C-level ``str.join``
    inside one bounded Python iteration per chunk."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens): {overlap}")
    stride = max_tokens - overlap

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column(text_col), "").to_pandas()
        words = txt.str.split()
        n_tok = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        # chunks per doc: ceil((n - overlap) / stride), min 1 if n > 0
        n_chunks = np.maximum(
            0, -(-(n_tok - overlap) // stride)).astype(np.int64)
        n_chunks[n_tok > 0] = np.maximum(n_chunks[n_tok > 0], 1)
        if not drop_empty:
            n_chunks = np.maximum(n_chunks, 1)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                id_col: t.column(id_col).slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                text_col: pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            })
        doc_of = np.repeat(np.arange(len(t)), n_chunks)
        chunk_idx = (np.arange(total)
                     - np.repeat(np.cumsum(n_chunks) - n_chunks,
                                 n_chunks))
        starts = chunk_idx * stride
        ends = np.minimum(starts + max_tokens, n_tok[doc_of])
        # slice the token lists via one flat join per chunk (pandas
        # C-level str join inside a groupby-free comprehension over
        # the exploded frame would re-shuffle; a direct list slice per
        # chunk is the simple exact form — bounded by chunk count)
        wl = words.to_numpy()
        texts = [" ".join(wl[d][s:e]) if n_tok[d] else ""
                 for d, s, e in zip(doc_of, starts, ends)]
        return pa.table({
            id_col: t.column(id_col).take(pa.array(doc_of)),
            "chunk_idx": pa.array(chunk_idx),
            text_col: pa.array(texts, pa.string()),
            "n_tokens": pa.array(ends - starts),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(docs_ds, max_tokens: int = 1024,
                   num_shards: int | None = None, seed: int = 42,
                   text_col: str = "text", id_col: str = "doc_id",
                   drop_last: bool = False):
    """GPT-style sequence packing: concatenate documents into a token
    stream and cut fixed ``max_tokens`` windows (documents may straddle
    a boundary — the standard pre-training packing that wastes zero
    tokens to padding, vs ``chunk_documents`` which never crosses doc
    boundaries). One row per packed sequence:
    ``(shard, seq_idx, text, n_tokens, n_docs)`` where ``n_docs``
    counts the documents contributing tokens to the window.

    Scale shape: a global concatenation order would serialize the
    corpus, so the stream is sharded by the seed-stable id hash —
    shard membership and within-shard order (by id, tie-broken by the
    seed-stable text hash so duplicate ids stay deterministic) are pure
    functions of row content and seed, making the packed output
    identical on any cluster size / block layout / retry (Ray's
    ``random_shuffle`` or input-order packing would not be). ONE groupby(shard) shuffle; each
    shard packs itself vectorized (window arithmetic in numpy, one
    C-level join per output row). The final short window per shard is
    kept unless ``drop_last``. ``num_shards`` auto-sizes from input
    bytes (~128 MiB of shard payload) when unset.
    """
    import pyarrow.compute as pc

    from ner_ray.stages.neardup import _auto_buckets
    from ner_ray.util.hashing import combine_hashes, hash_column, hash_str

    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if num_shards is None:
        num_shards = _auto_buckets(docs_ds)
    sconst = np.uint64(hash_str(f"pack-seed:{seed}"))

    def tag(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("_shard", pa.array([], pa.int64()))
        h = combine_hashes(hash_column(t.column(id_col)),
                           np.full(len(t), sconst, dtype=np.uint64))
        return t.append_column(
            "_shard", pa.array((h % np.uint64(num_shards))
                               .astype(np.int64)))

    def pack(g: pa.Table) -> pa.Table:
        shard = g.column("_shard")[0].as_py()
        # within-shard order must be a pure function of row CONTENT:
        # id alone ties on duplicate ids (e.g. chunk_documents emits
        # doc_id once per chunk) and Ray's post-shuffle arrival order
        # is not deterministic, so break ties by the seed-stable text
        # hash. Rows identical in BOTH keys are interchangeable — the
        # packed token stream is unchanged by their relative order.
        th = hash_column(g.column(text_col)).astype(np.int64)
        keyed = pa.table({"_k1": g.column(id_col),
                          "_k2": pa.array(th)})
        order = pc.sort_indices(
            keyed, sort_keys=[("_k1", "ascending"),
                              ("_k2", "ascending")])
        txt = pc.fill_null(g.column(text_col).take(order), "").to_pandas()
        words = txt.str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        n_seq = total // max_tokens
        rem = total - n_seq * max_tokens
        if rem and not drop_last:
            n_seq += 1
        if n_seq == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "seq_idx": pa.array([], pa.int64()),
                text_col: pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            })
        flat = np.concatenate(
            [np.asarray(w, dtype=object) for w in words if len(w)]) \
            if total else np.array([], dtype=object)
        starts = np.arange(n_seq, dtype=np.int64) * max_tokens
        ends = np.minimum(starts + max_tokens, total)
        # contributing docs per window [s, e): nonempty docs with
        # token-range start < e minus those fully before s (empty docs
        # never count — they contribute no tokens)
        nz = lens > 0
        nz_ends = np.cumsum(lens)[nz]
        nz_starts = nz_ends - lens[nz]
        n_docs = (np.searchsorted(nz_starts, ends, side="left")
                  - np.searchsorted(nz_ends, starts, side="right"))
        texts = [" ".join(flat[s:e]) for s, e in zip(starts, ends)]
        return pa.table({
            "shard": pa.array(np.full(n_seq, shard, dtype=np.int64)),
            "seq_idx": pa.array(np.arange(n_seq, dtype=np.int64)),
            text_col: pa.array(texts, pa.string()),
            "n_tokens": pa.array(ends - starts),
            "n_docs": pa.array(n_docs),
        })

    return docs_ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_shard").map_groups(pack, batch_format="pyarrow")
