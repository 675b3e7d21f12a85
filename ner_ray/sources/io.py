"""Sources & sinks (S2, S3, S6, S7).

Lance-first with Parquet fallback: the north rule pins Lance tables,
but ``import lance`` fails in this sandbox (no pylance wheel, no
network — SURVEY.md §1.3), so ``read_docs`` / ``write_graph`` try
Lance and fall back to Parquet. The Lance branch is a thin,
untested-in-sandbox path and documented as such.

``docs_from_testdata`` adapts the driver's flat documents table
(doc_id:int64, text, lang, source, n_chars — TESTDATA.md) into the
pinned interleaved shape, deterministically injecting alias mentions
so the full KG pipeline (mentions -> links -> triples -> graph) has
signal on driver data. Pure arithmetic on doc_id — no RNG state, no
wall clock — so output is stable across runs and processes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray import schema as S
from ner_ray.fixtures.gen import VOCAB


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except Exception:
        return False


def read_docs(path: str, *, columns: list[str] | None = None):
    """Interleaved-docs table from a Lance dataset dir or Parquet."""
    import ray.data as rd

    if path.endswith(".lance") and _lance_available():
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_graph(ds, path: str) -> None:
    """Adjacency partitions back to Lance (or Parquet fallback)."""
    if path.endswith(".lance") and _lance_available():
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


def read_docs_jsonl(path: str):
    """Interleaved docs from JSON-lines — the shape web-scale text
    corpora usually arrive in. Each line is one document object:

        {"doc_id": "...", "spans": [{"kind": "text", "text": "...",
                                     "media_ref": "", "offset": 0}, ...]}

    Missing span fields are filled with typed defaults and the spans
    column is CAST to the pinned DOCS schema, so downstream stages see
    exactly the same Arrow layout as the Parquet/Lance readers (the
    span-sequence invariant applies from the first batch). Distributed:
    Ray's JSON datasource splits files into blocks like any other read."""
    import ray.data as rd

    def coerce(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        out = {"doc_id": [], "spans": []}
        for r in rows:
            out["doc_id"].append(str(r["doc_id"]))
            spans = []
            for s in r.get("spans") or []:
                spans.append({
                    "kind": str(s.get("kind") or "text"),
                    "text": str(s.get("text") or ""),
                    "media_ref": str(s.get("media_ref") or ""),
                    "offset": int(s.get("offset") or 0),
                })
            out["spans"].append(spans)
        return pa.table(
            {"doc_id": pa.array(out["doc_id"], pa.string()),
             "spans": pa.array(out["spans"],
                               S.DOCUMENTS.field("spans").type)})

    return rd.read_json(path).map_batches(coerce, batch_format="pyarrow")


class ToInterleaved:
    """Driver documents -> interleaved docs (3 spans: original text,
    injected mention-bearing text, media ref). Stateless + vectorized;
    alias surfaces are captured at construction (small broadcast).

    ``replicas`` deterministically amplifies the corpus (R interleaved
    docs per driver doc, each with a distinct id and injected entity
    pair) — the bench corpus generator. Pure doc_id arithmetic: no RNG
    state, reproducible across runs and parallelism levels.
    """

    def __init__(self, aliases: list[str], replicas: int = 1):
        self.aliases = np.array(aliases, dtype=object)
        self.replicas = int(replicas)

    def __call__(self, batch: pa.Table) -> pa.Table:
        R = self.replicas
        base_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        base_text = batch.column("text").to_numpy(zero_copy_only=False)
        ids = base_ids.repeat(R) * R + np.tile(np.arange(R), len(base_ids))
        text = base_text.repeat(R)
        n = len(ids)
        na = len(self.aliases)
        a1 = self.aliases[ids % na]
        a2 = self.aliases[(ids * 7 + 3) % na]
        gap = np.array(VOCAB, dtype=object)[ids % len(VOCAB)]
        injected = pd.Series(a1).str.title().str.cat(
            [pd.Series(gap), pd.Series(a2).str.title()], sep=" "
        ).to_numpy(dtype=object)

        doc_id = pa.array([f"tdoc{i}" for i in ids], pa.string())
        kinds = np.empty(3 * n, dtype=object)
        texts = np.empty(3 * n, dtype=object)
        refs = np.empty(3 * n, dtype=object)
        offs = np.zeros(3 * n, dtype=np.int32)
        kinds[0::3], kinds[1::3], kinds[2::3] = "text", "text", "image"
        texts[0::3], texts[1::3], texts[2::3] = text, injected, ""
        refs[0::3], refs[1::3] = "", ""
        refs[2::3] = [f"media://tdoc{i}/2" for i in ids]
        tlen = pd.Series(text).str.len().to_numpy()
        ilen = pd.Series(injected).str.len().to_numpy()
        offs[1::3] = tlen + 1
        offs[2::3] = tlen + ilen + 2

        struct = pa.StructArray.from_arrays(
            [pa.array(list(kinds), pa.string()),
             pa.array(list(texts), pa.string()),
             pa.array(list(refs), pa.string()),
             pa.array(offs, pa.int32())],
            fields=list(S.SPAN_STRUCT),
        )
        offsets = pa.array(np.arange(0, 3 * n + 1, 3, dtype=np.int32),
                           pa.int32())
        spans = pa.ListArray.from_arrays(offsets, struct)
        return pa.table({"doc_id": doc_id, "spans": spans},
                        schema=S.DOCUMENTS)


def docs_from_testdata(sf_dir: str, alias_path: str, replicas: int = 1,
                       num_blocks: int | None = None):
    """Driver documents.parquet -> interleaved Dataset (deterministic;
    column-pruned read, amplified by ``replicas`` for benching).

    The documents file is small pre-amplification, so Ray's
    size-based splitting would yield too few blocks to feed the
    downstream actor pool — presplit with override_num_blocks
    (parallelism = blocks, not batch_size)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    aliases = sorted(set(
        pq.read_table(alias_path, columns=["alias"]).column("alias").to_pylist()
    ))
    if num_blocks is None:
        n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        num_blocks = max(8, min(256, (n_rows * replicas) // 1000))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         override_num_blocks=num_blocks)
    return ds.map_batches(ToInterleaved(aliases, replicas),
                          batch_format="pyarrow")
