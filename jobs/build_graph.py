#!/usr/bin/env python
"""The cluster-form KG build job (``ray job submit``-able).

    python jobs/build_graph.py --docs <docs.parquet|dir> \
        --model <model.parquet> --alias <alias.parquet> \
        --output /tmp/graph --checkpoint /tmp/ckpt [--num-cpus N]

Checkpointed stages: triples -> deduped -> resolved -> adjacency.
Rerunning with identical inputs skips completed stages (per-stage
fingerprints; see ner_ray/state/lineage.py) and reports per-partition
lineage. The final adjacency is written partitioned by a hash bucket
of src (one directory per bucket = the resume/consume unit).

This script OWNS the Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--alias", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--fail-after", default=os.environ.get(
        "NER_RAY_FAIL_AFTER_STAGE", ""),
        help="test hook: raise after this stage completes")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from ner_ray.pipelines.flagship import (
        linked_spans,
        raw_triples,
        tagged_spans,
    )
    from ner_ray.sources.io import read_docs
    from ner_ray.stages.canon import canonicalize_local, resolve_triples
    from ner_ray.stages.dedup import dedup_triples
    from ner_ray.stages.graph import build_adjacency
    from ner_ray.state.lineage import (
        CheckpointManager,
        fingerprint,
        input_fingerprint,
    )
    from ner_ray.state.model import put_bundle
    from ner_ray.util.hashing import hash_column, to_bucket

    cm = CheckpointManager(args.checkpoint)
    fp_docs = input_fingerprint(args.docs)
    fp_model = input_fingerprint(args.model)
    fp_alias = input_fingerprint(args.alias)

    bundle = put_bundle(args.model, args.alias)

    def fail_hook(stage: str) -> None:
        if args.fail_after == stage:
            print(f"[build_graph] injected failure after stage {stage}",
                  flush=True)
            raise SystemExit(42)

    fp_triples = fingerprint("triples", fp_docs, fp_model, fp_alias)
    triples = cm.run_stage(
        "triples", fp_triples,
        lambda: raw_triples(linked_spans(
            tagged_spans(read_docs(args.docs), bundle), bundle)))
    fail_hook("triples")

    fp_dedup = fingerprint("deduped", fp_triples)
    deduped = cm.run_stage("deduped", fp_dedup,
                           lambda: dedup_triples(triples))
    fail_hook("deduped")

    alias_ds = rd.read_parquet(args.alias, columns=["entity_id", "alias"])
    canon_tbl = canonicalize_local(alias_ds)

    fp_resolved = fingerprint("resolved", fp_dedup, fp_alias)
    resolved = cm.run_stage("resolved", fp_resolved,
                            lambda: resolve_triples(deduped, canon_tbl))
    fail_hook("resolved")

    fp_adj = fingerprint("adjacency", fp_resolved, str(args.n_buckets))

    def compute_adj():
        adj = build_adjacency(resolved)

        def add_bucket(t: pa.Table) -> pa.Table:
            b = to_bucket(hash_column(t.column("src")), args.n_buckets)
            return t.append_column("bucket", pa.array(b))

        return adj.map_batches(add_bucket, batch_format="pyarrow")

    adjacency = cm.run_stage("adjacency", fp_adj, compute_adj,
                             partition_cols=["bucket"])
    fail_hook("adjacency")

    # materialize the final graph under --output (bucket-partitioned),
    # independent of the checkpoint dir's lifetime
    import shutil

    os.makedirs(args.output, exist_ok=True)
    out_graph = os.path.join(args.output, "adjacency")
    shutil.copytree(cm.stage_dir("adjacency", fp_adj), out_graph,
                    dirs_exist_ok=True)
    summary = {
        "triples": triples.count(),
        "deduped": deduped.count(),
        "resolved": resolved.count(),
        "adjacency_rows": adjacency.count(),
        "lineage_records": len(cm.lineage()),
        "checkpoint": args.checkpoint,
        "adjacency_dir": cm.stage_dir("adjacency", fp_adj),
    }
    with open(os.path.join(args.output, "graph_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
