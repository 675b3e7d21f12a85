"""End-to-end pre-training curation job — the `ray job submit`-able
CLI for pipelines/curate.curate_pretrain: (optional) HTML extraction
-> clean_corpus (checkpointed: quality filter, exact dedup, optional
near-dedup, optional benchmark decontamination) -> optional DSIR /
quality-classifier selection -> optional sequence packing -> the
deterministic resumable shard export.

    python jobs/curate.py --docs CRAWL.parquet --out /tmp/shards \
        [--html-col html] [--checkpoint /tmp/ckpt] \
        [--eval EVAL.parquet] \
        [--select dsir --select-ref TARGET.parquet --select-knob 0.3] \
        [--pack-tokens 1024] [--num-shards 64]

The export is resumable on its own manifest (finished shards skip);
the cleaning stages resume from --checkpoint. Owns its Ray session
(guarded init) — library code never calls ray.init.
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
    ap.add_argument("--out", required=True, help="shard export dir")
    ap.add_argument("--html-col", default="",
                    help="extract visible text from this column first")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--checkpoint", default="",
                    help="lineage root for the cleaning stages")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--langs", default="", help="comma list; empty = off")
    ap.add_argument("--near-method", default="",
                    choices=["", "minhash", "simhash"])
    ap.add_argument("--normalize", default="",
                    choices=["", "NFC", "NFD", "NFKC", "NFKD"])
    ap.add_argument("--eval", default="",
                    help="eval parquet to decontaminate against")
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--select", default="",
                    choices=["", "dsir", "classifier"])
    ap.add_argument("--select-ref", default="",
                    help="target/positive corpus parquet for --select")
    ap.add_argument("--select-knob", type=float, default=None,
                    help="dsir keep fraction (default 0.3) / classifier "
                    "Pareto alpha (default 9.0) — the two knobs live on "
                    "different scales, so the default is per-mode")
    ap.add_argument("--pack-tokens", type=int, default=0,
                    help="0 = no packing")
    ap.add_argument("--pack-shards", type=int, default=0,
                    help="packing shard count override (0 = auto-size "
                    "from pinned input bytes)")
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()
    if args.select and not args.select_ref:
        ap.error("--select requires --select-ref")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        from ner_ray.pipelines.curate import curate_pretrain
        from ner_ray.state.lineage import input_fingerprint

        t0 = time.time()
        docs = rd.read_parquet(args.docs)
        clean_kwargs: dict = {
            "min_words": args.min_words,
            "langs": [x for x in args.langs.split(",") if x] or None,
            "near_dup_method": args.near_method or None,
            "normalize": args.normalize or None,
        }
        if args.checkpoint:
            clean_kwargs["checkpoint"] = args.checkpoint
            # the clean stages see EXTRACTED text when --html-col is
            # set — fold that into the fingerprint so toggling the
            # flag can never reuse checkpoints built from other text
            clean_kwargs["docs_fp"] = (
                input_fingerprint(args.docs)
                + (f"|html={args.html_col}" if args.html_col else ""))
        eval_ds = None
        if args.eval:
            eval_ds = rd.read_parquet(args.eval)
            if args.checkpoint:
                clean_kwargs["eval_fp"] = input_fingerprint(args.eval)
        select = None
        if args.select:
            knob = args.select_knob
            if knob is None:
                knob = 0.3 if args.select == "dsir" else 9.0
            select = (args.select, rd.read_parquet(args.select_ref),
                      knob)
        man = curate_pretrain(
            docs, html_col=args.html_col or None,
            text_col=args.text_col, id_col=args.id_col,
            clean_kwargs=clean_kwargs, eval_ds=eval_ds,
            decontam_n=args.decontam_n, select=select,
            pack_tokens=args.pack_tokens or None,
            pack_kwargs=({"num_shards": args.pack_shards}
                         if args.pack_shards else None),
            out_dir=args.out, num_shards=args.num_shards,
            seed=args.seed)
        print(json.dumps({
            "out": args.out,
            "shards": len(man["shards"]),
            "rows": sum(s["rows"] for s in man["shards"]),
            "wall_s": round(time.time() - t0, 3),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
