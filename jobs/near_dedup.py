"""Corpus-level near-duplicate removal — the `ray job submit`-able CLI
for the training-data dedup path (stages/neardup.near_dedup_docs).

    python jobs/near_dedup.py --docs DOCS.parquet --out SURVIVORS \
        --method minhash --threshold 0.7 --checkpoint /tmp/ckpt

Owns its Ray session (guarded init) — library code never calls
ray.init. Survivors are written partitioned by an id-hash bucket (one
directory per bucket = the resume/consume unit); a finished run stamps
a fingerprint manifest so an identical rerun streams nothing and just
records "skipped" lineage rows, and a changed input/config clears the
stale output before rebuilding (same gate as jobs/ann_index.py).
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
    ap.add_argument("--method", default="minhash",
                    choices=["minhash", "simhash", "embedding"])
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--threshold", type=float, default=0.7,
                    help="Jaccard (minhash) / cosine (embedding) floor")
    ap.add_argument("--max-hamming", type=int, default=3,
                    help="simhash Hamming ceiling")
    ap.add_argument("--n-buckets", type=int, default=8,
                    help="output partition count")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--checkpoint", default="",
                    help="lineage root: emits per-partition records to "
                         "<checkpoint>/lineage.jsonl")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        import pyarrow as pa
        from pyarrow import fs as pafs

        from ner_ray.state.lineage import (
            CheckpointManager,
            fingerprint,
            input_fingerprint,
        )
        from ner_ray.util.fsio import resolve_fs

        if args.method == "simhash":
            detector_cfg = f"h{args.max_hamming}"
        else:
            detector_cfg = f"t{args.threshold}"
        fp = fingerprint("near_dedup", input_fingerprint(args.docs),
                         args.method, detector_cfg, str(args.n_buckets),
                         args.text_col, args.id_col)
        fs, root = resolve_fs(args.out)
        marker = f"{root.rstrip('/')}/_DEDUP_MANIFEST.json"
        prev = None
        if fs.get_file_info(marker).type == pafs.FileType.File:
            with fs.open_input_stream(marker) as f:
                prev = json.loads(f.read().decode())
        if prev and prev.get("fingerprint") == fp:
            summary = dict(prev, skipped=True)
            if args.checkpoint:
                cm = CheckpointManager(args.checkpoint)
                rows = cm.log_partitioned_output(
                    "near_dedup", fp, args.out, status="skipped")
                summary["lineage_records"] = len(rows)
            print(json.dumps(summary))
            return
        # clear ANY prior content: a stale completed output (config or
        # input changed) AND the debris of a crashed run that died
        # before stamping its manifest — write_parquet appends
        # uniquely-named files, so leftovers would mix into the rerun
        if fs.get_file_info(root).type == pafs.FileType.Directory:
            fs.delete_dir_contents(root)

        from ner_ray.stages.neardup import near_dedup_docs
        from ner_ray.util.hashing import hash_column, to_bucket

        t0 = time.time()
        if args.method == "embedding":
            docs = rd.read_parquet(args.docs)
            kw = {"threshold": args.threshold}
        else:
            docs = rd.read_parquet(args.docs)
            kw = {"text_col": args.text_col} | (
                {"max_hamming": args.max_hamming}
                if args.method == "simhash"
                else {"threshold": args.threshold})
        n_in = docs.count()
        survivors = near_dedup_docs(docs, method=args.method,
                                    id_col=args.id_col, **kw)

        id_col = args.id_col

        def add_bucket(t: pa.Table) -> pa.Table:
            b = to_bucket(hash_column(t.column(id_col)), args.n_buckets)
            return t.append_column("bucket", pa.array(b))

        bucketed = survivors.map_batches(add_bucket,
                                         batch_format="pyarrow")
        bucketed.write_parquet(args.out, partition_cols=["bucket"])
        n_out = rd.read_parquet(args.out, columns=[id_col]).count()
        summary = {"docs_in": n_in, "survivors": n_out,
                   "dropped": n_in - n_out, "method": args.method,
                   "out": args.out, "fingerprint": fp,
                   "wall_s": round(time.time() - t0, 3)}
        with fs.open_output_stream(marker) as f:
            f.write(json.dumps(summary).encode())
        if args.checkpoint:
            cm = CheckpointManager(args.checkpoint)
            rows = cm.log_partitioned_output("near_dedup", fp, args.out,
                                             wall_s=time.time() - t0)
            summary["lineage_records"] = len(rows)
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
