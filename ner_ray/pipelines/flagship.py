"""The flagship KG-construction pipeline (SURVEY.md §3.2).

read interleaved docs -> flatten text spans -> [TaggerActor pool]
-> [LinkerStage] -> triples -> canonical rewrite (Q3 broadcast map,
fused) -> dedup (shuffle #1) -> adjacency (combiner shuffle #2)
-> partitioned sink. The canonicalize/resolve tail goes through the
size dispatch in canon.canonicalize_and_resolve, so a large alias
table switches to distributed label propagation + join-based resolve
instead of silently union-finding on the driver.

Everything upstream of dedup is a fused map-only chain that preserves
doc/span locality by construction (nested mention/link lists — batch
boundaries can never split a span). The model + alias dict travel via
``ray.put`` once (broadcast), never per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray import schema as S
from ner_ray.sources.io import read_docs
from ner_ray.stages.canon import canonicalize_and_resolve
from ner_ray.stages.dedup import dedup_triples
from ner_ray.stages.graph import build_adjacency
from ner_ray.stages.link import LinkerStage
from ner_ray.stages.spans import flatten_text_spans
from ner_ray.stages.tagger import TaggerActor
from ner_ray.stages.triples import extract_triples_batch
from ner_ray.state.model import put_bundle


def mention_rows(batch: pa.Table, list_col: str = "mentions") -> pa.Table:
    """Explode nested mention/link lists into flat rows with doc keys."""
    col = batch.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    counts = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    flat = col.flatten()
    cols: dict[str, pa.Array] = {
        "doc_id": pa.array(
            np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False),
                      counts), pa.string()),
        "span_idx": pa.array(
            np.repeat(batch.column("span_idx").to_numpy(zero_copy_only=False),
                      counts).astype(np.int32), pa.int32()),
    }
    for i, field in enumerate(flat.type):
        cols[field.name] = flat.field(i)
    return pa.table(cols)


def tagged_spans(docs_ds, bundle_ref, *, tagger_concurrency=(1, 8),
                 batch_size: int = 2048):
    """docs -> span rows + mentions (the actor-pool tagging stage)."""
    spans = docs_ds.map_batches(flatten_text_spans, batch_format="pyarrow")
    return spans.map_batches(
        TaggerActor,
        fn_constructor_kwargs={"bundle": bundle_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=tagger_concurrency,
        num_cpus=1,
    )


def linked_spans(tagged_ds, bundle_ref, *, concurrency=(1, 4)):
    return tagged_ds.map_batches(
        LinkerStage,
        fn_constructor_kwargs={"bundle": bundle_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def raw_triples(linked_ds):
    return linked_ds.map_batches(extract_triples_batch,
                                 batch_format="pyarrow")


def build_graph(docs_ds, model_path: str, alias_path: str, *,
                tagger_concurrency=(1, 8), batch_size: int = 2048,
                n_salts: int = 4, checkpoint=None, docs_fp: str = ""):
    """Compose the pipeline. Returns a dict of Datasets / tables.

    The doc-processing chain (tagged/linked/triples/deduped/resolved/
    adjacency) stays LAZY — nothing touches the corpus until a sink or
    aggregate consumes it. The one eager step is the canonicalization
    dispatch: the (small) alias table is read and counted at
    construction to pick the local-union-find vs distributed-labelprop
    path (canon.canonicalize_and_resolve), and on the small path the
    union-find runs immediately — that cost scales with the alias
    table, never the corpus.

    ``checkpoint`` (a CheckpointManager or a root path) opts the tail
    stages (resolved, adjacency) into per-partition lineage +
    skip-on-rerun, same records as jobs/build_graph.py. Checkpointing
    is eager by nature — each wrapped stage executes and writes at
    construction — so the default (None) keeps the pure-streaming
    no-extra-materialize path. ``docs_fp`` feeds the fingerprint chain
    when the docs Dataset came from a known location."""
    import ray.data as rd

    bundle_ref = put_bundle(model_path, alias_path)
    tagged = tagged_spans(docs_ds, bundle_ref,
                          tagger_concurrency=tagger_concurrency,
                          batch_size=batch_size)
    linked = linked_spans(tagged, bundle_ref)
    triples = raw_triples(linked)
    # lazy two-step dedup kept for stage-level consumers; the flagship
    # tail itself uses the FUSED resolve-then-dedup (one all-to-all)
    # behind the canonicalize() size dispatch
    deduped = dedup_triples(triples)

    alias_ds = rd.read_parquet(alias_path, columns=["entity_id", "alias"])
    canon_tbl, resolved = canonicalize_and_resolve(triples, alias_ds)
    if checkpoint is not None:
        from ner_ray.state.lineage import (
            CheckpointManager,
            fingerprint,
            input_fingerprint,
        )

        cm = (checkpoint if isinstance(checkpoint, CheckpointManager)
              else CheckpointManager(checkpoint))
        if not docs_fp:
            # skip-on-rerun keys on this fingerprint chain; without a
            # corpus fingerprint a rerun over DIFFERENT docs would
            # silently return the previous run's graph.
            raise ValueError(
                "checkpoint= requires docs_fp (a fingerprint of the docs "
                "corpus, e.g. input_fingerprint(docs_path)) so stale "
                "checkpoints are not reused across corpora")
        fp_res = fingerprint("flagship_resolved", docs_fp,
                             input_fingerprint(model_path),
                             input_fingerprint(alias_path))
        res_ds = resolved
        resolved = cm.run_stage("flagship_resolved", fp_res,
                                lambda: res_ds)
        fp_adj = fingerprint("flagship_adjacency", fp_res, str(n_salts))
        adjacency = cm.run_stage(
            "flagship_adjacency", fp_adj,
            lambda: build_adjacency(resolved, n_salts=n_salts))
    else:
        adjacency = build_adjacency(resolved, n_salts=n_salts)
    return {
        "tagged": tagged,
        "linked": linked,
        "triples": triples,
        "deduped": deduped,
        "canon": canon_tbl,
        "resolved": resolved,
        "adjacency": adjacency,
    }


def run_fixture_pipeline(fixture_dir: str, checkpoint=None, **kw):
    """Convenience: flagship over a generated fixture directory. Pass
    ``checkpoint`` to get lineage + resume for the tail stages."""
    docs = read_docs(f"{fixture_dir}/docs.parquet")
    docs_fp = ""
    if checkpoint is not None:
        from ner_ray.state.lineage import input_fingerprint

        docs_fp = input_fingerprint(f"{fixture_dir}/docs.parquet")
    return build_graph(docs, f"{fixture_dir}/model.parquet",
                       f"{fixture_dir}/alias.parquet",
                       checkpoint=checkpoint, docs_fp=docs_fp, **kw)
