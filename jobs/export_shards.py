"""Deterministic training-shard export — the `ray job submit`-able
tail of the curation pipeline (stages/shardexport.export_shards),
optionally chained after the C4-style cleaner.

    python jobs/export_shards.py --docs DOCS.parquet --out SHARDS \
        --num-shards 128 --seed 42 [--clean] [--checkpoint /tmp/ckpt]

Owns its Ray session (guarded init) — library code never calls
ray.init. Shard assignment and within-shard order are pure functions
of (id, seed): a rerun after a kill writes only the missing shards
(their rows are filtered out before the shuffle), and a finished
export is a no-op stamped by the atomic _MANIFEST.json. Shard files
double as the lineage partitions when --checkpoint is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input parquet")
    ap.add_argument("--out", required=True, help="shard output dir")
    ap.add_argument("--num-shards", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--clean", action="store_true",
                    help="run clean_corpus (quality filter + exact "
                         "dedup) before sharding")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--checkpoint", default="",
                    help="lineage root: per-shard records to "
                         "<checkpoint>/lineage.jsonl")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        from ner_ray.stages.shardexport import export_shards
        from ner_ray.state.lineage import (
            CheckpointManager,
            fingerprint,
            input_fingerprint,
        )

        t0 = time.time()
        docs = rd.read_parquet(args.docs)
        if args.clean:
            from ner_ray.pipelines.clean import clean_corpus

            docs = clean_corpus(docs, text_col=args.text_col,
                                id_col=args.id_col)
        resumed = os.path.exists(
            os.path.join(args.out, "_MANIFEST.json"))
        manifest = export_shards(docs, args.out, args.num_shards,
                                 seed=args.seed, id_col=args.id_col)
        summary = {
            "out": args.out, "num_shards": args.num_shards,
            "seed": args.seed, "total_rows": manifest["total_rows"],
            "written_this_run": (0 if resumed else
                                 manifest.get("written_this_run", 0)),
            "skipped": resumed, "cleaned": bool(args.clean),
            "wall_s": round(time.time() - t0, 3),
        }
        if args.checkpoint:
            fp = fingerprint("export_shards",
                             input_fingerprint(args.docs),
                             str(args.num_shards), str(args.seed),
                             args.id_col, "clean" if args.clean else "raw")
            cm = CheckpointManager(args.checkpoint)
            rows = cm.log_partitioned_output(
                "export_shards", fp, args.out,
                wall_s=time.time() - t0,
                status="skipped" if resumed else "computed")
            summary["lineage_records"] = len(rows)
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
