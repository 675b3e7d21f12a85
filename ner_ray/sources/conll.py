"""CoNLL token-per-line source & sink (operators S1, S6).

The reference streams row-oriented CoNLL text: one token per line,
whitespace-separated observation columns, last column = label, blank
line terminates a sentence (cf. Wapiti src/reader.c, reconstructed;
CoNLL-2003 shared task layout). Our reader parallelizes file-at-a-time
(exactly the reference's unit of parallelism): each file is parsed in
one task via read_binary_files, emitting one row per SEQUENCE with
Arrow list columns — sentence boundaries can never straddle a block.

Column-arity validation mirrors the reference's load error: every
token line in a file must carry the same number of columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEQUENCES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seq_idx", pa.int32()),
        ("tokens", pa.list_(pa.string())),
        ("columns", pa.list_(pa.list_(pa.string()))),  # extra obs columns
        ("tags", pa.list_(pa.string())),               # empty if unlabeled
    ]
)


def parse_conll_text(text: str, doc_id: str, labeled: bool = True) -> pa.Table:
    """One CoNLL file's text -> SEQUENCES rows (validating arity)."""
    seqs_tokens: list[list[str]] = []
    seqs_cols: list[list[list[str]]] = []
    seqs_tags: list[list[str]] = []
    cur_t: list[str] = []
    cur_c: list[list[str]] = []
    cur_g: list[str] = []
    arity = None
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if cur_t:
                seqs_tokens.append(cur_t)
                seqs_cols.append(cur_c)
                seqs_tags.append(cur_g)
                cur_t, cur_c, cur_g = [], [], []
            continue
        parts = line.split()
        if arity is None:
            arity = len(parts)
        elif len(parts) != arity:
            raise ValueError(
                f"{doc_id}: column arity {len(parts)} != {arity} "
                f"at line {line!r}")
        cur_t.append(parts[0])
        if labeled and len(parts) > 1:
            cur_g.append(parts[-1])
            cur_c.append(parts[1:-1])
        else:
            cur_c.append(parts[1:])
    if cur_t:
        seqs_tokens.append(cur_t)
        seqs_cols.append(cur_c)
        seqs_tags.append(cur_g)
    n = len(seqs_tokens)
    return pa.table(
        {
            "doc_id": pa.array([doc_id] * n, pa.string()),
            "seq_idx": pa.array(np.arange(n, dtype=np.int32), pa.int32()),
            "tokens": pa.array(seqs_tokens, pa.list_(pa.string())),
            "columns": pa.array(seqs_cols, pa.list_(pa.list_(pa.string()))),
            "tags": pa.array(seqs_tags, pa.list_(pa.string())),
        },
        schema=SEQUENCES,
    )


def read_conll(paths, labeled: bool = True):
    """S1: CoNLL file(s) -> Dataset[SEQUENCES], one parse task per file."""
    import os

    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            # full path as doc_id: basenames collide across directories
            tables.append(parse_conll_text(
                data.decode("utf-8"), path, labeled))
        return pa.concat_tables(tables) if tables else SEQUENCES.empty_table()

    return files.map_batches(parse, batch_format="pyarrow")


def sequences_to_spans(seq_ds):
    """Adapter: SEQUENCES rows -> text-span rows consumable by the
    tagger (doc_id, span_idx = seq_idx, text = space-joined tokens —
    the frozen single-space convention keeps offsets exact)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        toks = t.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        joined = pc.binary_join(toks, " ")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "span_idx": t.column("seq_idx"),
            "text": joined,
            "offset": pa.array(np.zeros(len(t), dtype=np.int32), pa.int32()),
        })

    return seq_ds.map_batches(fn, batch_format="pyarrow")


def format_conll_batch(batch: pa.Table) -> pa.Table:
    """Token rows (doc_id, span_idx, tok_idx, token, tag) -> one CoNLL
    text blob per (doc_id, span_idx) group present in the batch
    (groups are contiguous by construction upstream)."""
    import pandas as pd

    df = batch.to_pandas()
    blobs = []
    keys = []
    for (d, s), g in df.groupby(["doc_id", "span_idx"], sort=False):
        lines = [f"{t} {tag}" for t, tag in zip(g["token"], g["tag"])]
        blobs.append("\n".join(lines) + "\n")
        keys.append(f"{d}#{s}")
    return pa.table({"key": pa.array(keys, pa.string()),
                     "conll": pa.array(blobs, pa.string())})


def write_conll(token_ds, out_dir: str) -> None:
    """S6: tagged token rows -> CoNLL text files (one file per block,
    blank line between sentences). Distributed write via the standard
    parquet-of-text fallback plus a plain-text mirror per block."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    blobs = token_ds.map_batches(format_conll_batch, batch_format="pyarrow")

    def dump(batch: pa.Table) -> pa.Table:
        if len(batch):
            first = batch.column("key")[0].as_py().replace("/", "_")
            path = os.path.join(out_dir, f"part-{first}.conll")
            with open(path, "w") as f:
                f.write("\n".join(batch.column("conll").to_pylist()))
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    blobs.map_batches(dump, batch_format="pyarrow").materialize()
