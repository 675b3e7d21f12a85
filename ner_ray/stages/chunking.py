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
