"""Incremental-dedup index CLI — the steady-state ingest loop for a
continuously-growing corpus (stages/incdedup):

    # one-time: fingerprint the already-deduplicated base corpus
    python jobs/dedup_index.py build --docs BASE.parquet --index IDX

    # daily: dedup an increment against everything kept so far,
    # write survivors, record their fingerprints as a new generation
    python jobs/dedup_index.py ingest --docs DAY.parquet --index IDX \
        --out /data/kept/day=2026-08-18 --threshold 0.7

Owns its Ray session (guarded init) — library code never calls
ray.init. Survivor output is partitioned by an id-hash bucket like
jobs/near_dedup.py; the index itself appends per-generation files
inside its bucket= partition dirs, so no generation is ever
rewritten."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="fingerprint a deduped base corpus")
    b.add_argument("--docs", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--method", default="minhash",
                   choices=["minhash", "exact"])
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--index-buckets", type=int, default=64)
    b.add_argument("--num-cpus", type=int, default=None)

    g = sub.add_parser("ingest", help="dedup an increment, keep+append")
    g.add_argument("--docs", required=True, help="increment parquet")
    g.add_argument("--index", required=True)
    g.add_argument("--out", required=True, help="survivors dir")
    g.add_argument("--threshold", type=float, default=0.7)
    g.add_argument("--no-self-dedup", action="store_true",
                   help="skip within-increment dedup")
    g.add_argument("--no-append", action="store_true",
                   help="report survivors without recording a generation")
    g.add_argument("--n-buckets", type=int, default=8,
                   help="survivor output partition count")
    g.add_argument("--num-cpus", type=int, default=None)

    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        t0 = time.time()
        if args.cmd == "build":
            from ner_ray.stages.incdedup import build_dedup_index

            m = build_dedup_index(
                rd.read_parquet(args.docs), args.index,
                method=args.method, text_col=args.text_col,
                id_col=args.id_col, n_buckets=args.index_buckets)
            print(json.dumps({"built": True, "n_docs": m["n_docs"],
                              "method": m["method"],
                              "sec": round(time.time() - t0, 3)}))
            return

        import pyarrow as pa

        from ner_ray.stages.incdedup import (
            _read_manifest,
            dedup_against_index,
        )
        from ner_ray.util.hashing import hash_column, to_bucket

        m = _read_manifest(args.index)
        docs = rd.read_parquet(args.docs)
        n_in = docs.count()
        survivors = dedup_against_index(
            docs, args.index, threshold=args.threshold,
            self_dedup=not args.no_self_dedup,
            append=not args.no_append)

        id_col = m["id_col"]

        def add_bucket(t: pa.Table) -> pa.Table:
            b = to_bucket(hash_column(t.column(id_col)), args.n_buckets)
            return t.append_column("bucket", pa.array(b))

        n_out = survivors.count()  # materialized by dedup_against_index
        if n_out:  # write_parquet of an empty dataset creates nothing
            survivors.map_batches(add_bucket, batch_format="pyarrow") \
                .write_parquet(args.out, partition_cols=["bucket"])
        print(json.dumps({
            "n_in": n_in, "n_kept": n_out, "n_dropped": n_in - n_out,
            "index_docs": _read_manifest(args.index)["n_docs"],
            "appended": not args.no_append,
            "sec": round(time.time() - t0, 3),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
