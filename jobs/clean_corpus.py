"""Checkpointed corpus-cleaning job — the `ray job submit`-able CLI
for the curation chain (pipelines/clean.clean_corpus): quality filter
-> exact dedup -> optional near-dedup -> optional benchmark
decontamination, every stage written as a manifest-stamped Parquet
checkpoint with per-partition lineage rows, so a killed 100-TB clean
run resumes from the last finished stage instead of restarting.

    python jobs/clean_corpus.py --docs DOCS.parquet --out SURVIVORS \
        --checkpoint /tmp/ckpt [--near-method minhash --threshold 0.7] \
        [--eval EVAL.parquet --decontam-n 13]

Owns its Ray session (guarded init) — library code never calls
ray.init. NER_RAY_FAIL_AFTER_STAGE (or --fail-after) kills the run
after the named stage completes (exit 42) — the resume test hook,
same contract as jobs/build_graph.py.
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
    ap.add_argument("--out", required=True, help="survivors dir")
    ap.add_argument("--checkpoint", required=True, help="lineage root")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--min-mean-word-len", type=float, default=2.0)
    ap.add_argument("--max-mean-word-len", type=float, default=15.0)
    ap.add_argument("--min-uniq-ratio", type=float, default=0.1)
    ap.add_argument("--langs", default="", help="comma list; empty = off")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--near-method", default="",
                    choices=["", "minhash", "simhash", "embedding"])
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--eval", default="", help="eval parquet to "
                    "decontaminate against (text column)")
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--normalize", default="",
                    choices=["", "NFC", "NFD", "NFKC", "NFKD"],
                    help="Unicode-normalize text before filtering/dedup "
                    "keying (empty = byte-exact semantics)")
    ap.add_argument("--no-materialize", action="store_true",
                    help="re-read mode: re-execute upstream per consumer "
                    "instead of pinning stage outputs (corpora near "
                    "cluster memory)")
    ap.add_argument("--n-buckets", type=int, default=8,
                    help="output partition count")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--fail-after", default=os.environ.get(
        "NER_RAY_FAIL_AFTER_STAGE", ""),
        help="test hook: die after this stage completes (exit 42)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow as pa

        from ner_ray.pipelines.clean import clean_corpus
        from ner_ray.state.lineage import (
            CheckpointManager,
            input_fingerprint,
        )
        from ner_ray.util.hashing import hash_column, to_bucket

        t0 = time.time()
        cm = CheckpointManager(args.checkpoint)
        docs = rd.read_parquet(args.docs)
        eval_ds, eval_fp = None, ""
        if args.eval:
            eval_ds = rd.read_parquet(args.eval)
            eval_fp = input_fingerprint(args.eval)
        near_kwargs = {}
        if args.near_method and args.near_method != "simhash":
            near_kwargs["threshold"] = args.threshold
        try:
            out, stats = clean_corpus(
                docs, text_col=args.text_col, id_col=args.id_col,
                min_words=args.min_words,
                min_mean_word_len=args.min_mean_word_len,
                max_mean_word_len=args.max_mean_word_len,
                min_uniq_ratio=args.min_uniq_ratio,
                langs=[x for x in args.langs.split(",") if x] or None,
                dedup=not args.no_dedup,
                near_dup_method=args.near_method or None,
                near_dup_kwargs=near_kwargs,
                decontaminate_against=eval_ds,
                decontam_n=args.decontam_n,
                normalize=args.normalize or None,
                materialize=not args.no_materialize,
                checkpoint=cm, docs_fp=input_fingerprint(args.docs),
                eval_fp=eval_fp, fail_after=args.fail_after,
                return_stats=True)
        except RuntimeError as e:
            if "fail_after test hook" in str(e):
                print(json.dumps({"failed_after": args.fail_after}))
                sys.exit(42)
            raise

        # clear any prior output: write_parquet appends uniquely-named
        # files, so a rerun would otherwise mix old and new survivors
        from pyarrow import fs as pafs

        from ner_ray.util.fsio import resolve_fs

        fs, root = resolve_fs(args.out)
        if fs.get_file_info(root).type == pafs.FileType.Directory:
            fs.delete_dir_contents(root)

        id_col = args.id_col

        def add_bucket(t: pa.Table) -> pa.Table:
            b = to_bucket(hash_column(t.column(id_col)), args.n_buckets)
            return t.append_column("bucket", pa.array(b))

        out.map_batches(add_bucket, batch_format="pyarrow") \
            .write_parquet(args.out, partition_cols=["bucket"])
        n_out = rd.read_parquet(args.out, columns=[id_col]).count()
        lineage = cm.lineage()
        summary = dict(stats, survivors=n_out, out=args.out,
                       wall_s=round(time.time() - t0, 3),
                       lineage_records=len(lineage),
                       stages={r["stage"]: r["status"] for r in lineage})
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
