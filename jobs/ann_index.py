"""Build and query ANN indexes over an embedding table — the
`ray job submit`-able CLI for the similarity scale paths.

    python jobs/ann_index.py build --embeddings E.parquet --out IDX \
        --method ivf --lists 64
    python jobs/ann_index.py query --index IDX --method ivf \
        --embeddings E.parquet --query-id 0 --topk 10 --nprobe 4

Owns its Ray session (guarded init) — library code never calls
ray.init. The index layout is one parquet directory per bucket /
inverted list, so a failed build can be restarted and a query reads
only the probed partitions (read fraction printed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# resolve ner_ray relative to this file so the job runs from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "query"])
    ap.add_argument("--embeddings", required=True)
    ap.add_argument("--out", help="index dir (build)")
    ap.add_argument("--index", help="index dir (query)")
    ap.add_argument("--method", choices=["lsh", "ivf"], default="ivf")
    ap.add_argument("--lists", type=int, default=64,
                    help="IVF inverted lists (k-means k)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--query-id", type=int, default=0)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--checkpoint", default="",
                    help="lineage root: build emits per-partition "
                         "records to <checkpoint>/lineage.jsonl")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        ds = rd.read_parquet(args.embeddings,
                             columns=["vec_id", "embedding"])
        if args.mode == "build":
            assert args.out, "--out required for build"
            import time

            from ner_ray.state.lineage import (
                CheckpointManager,
                fingerprint,
                input_fingerprint,
            )
            from ner_ray.util.fsio import resolve_fs

            fp = fingerprint(f"ann_{args.method}",
                             input_fingerprint(args.embeddings),
                             str(args.lists), str(args.iters))
            # skip-on-rerun: a finished build stamps a manifest (with
            # its lineage fingerprint) into the index dir; a rerun with
            # identical inputs/config streams nothing and just records
            # "skipped" lineage rows. Stamped through pyarrow.fs so the
            # gate works on object-store index prefixes too.
            fs, root = resolve_fs(args.out)
            marker = f"{root.rstrip('/')}/_ANN_MANIFEST.json"
            from pyarrow import fs as pafs

            prev = None
            if fs.get_file_info(marker).type == pafs.FileType.File:
                with fs.open_input_stream(marker) as f:
                    prev = json.loads(f.read().decode())
            if prev and prev.get("fingerprint") == fp:
                summary = dict(prev, skipped=True)
                if args.checkpoint:
                    cm = CheckpointManager(args.checkpoint)
                    rows = cm.log_partitioned_output(
                        f"ann_{args.method}", fp, args.out,
                        status="skipped")
                    summary["lineage_records"] = len(rows)
                print(json.dumps(summary))
                return
            if prev is not None:
                # stale completed index (inputs/config changed): clear
                # it so old bucket partitions can't shadow the rebuild
                fs.delete_dir_contents(root)

            t0 = time.time()
            if args.method == "ivf":
                from ner_ray.stages.ivf import build_ivf_index, kmeans_fit

                cents, hist = kmeans_fit(ds, k=args.lists,
                                         iters=args.iters)
                build_ivf_index(ds, args.out, cents)
                summary = {"built": args.out, "method": "ivf",
                           "lists": args.lists, "kmeans_shift": hist,
                           "fingerprint": fp}
            else:
                from ner_ray.stages.similarity import build_lsh_index

                build_lsh_index(ds, args.out)
                summary = {"built": args.out, "method": "lsh",
                           "fingerprint": fp}
            with fs.open_output_stream(marker) as f:
                f.write(json.dumps(summary).encode())
            if args.checkpoint:
                cm = CheckpointManager(args.checkpoint)
                rows = cm.log_partitioned_output(
                    f"ann_{args.method}", fp, args.out,
                    wall_s=time.time() - t0)
                summary["lineage_records"] = len(rows)
            print(json.dumps(summary))
            return
        assert args.index, "--index required for query"
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ner_ray.stages.similarity import _to_matrix

        qtbl = pq.read_table(args.embeddings).filter(
            pc.equal(pc.field("vec_id"), args.query_id))
        if qtbl.num_rows == 0:
            sys.exit(f"query id {args.query_id} not found in "
                     f"{args.embeddings}")
        q = _to_matrix(qtbl.column("embedding"))[0]
        if args.method == "ivf":
            from ner_ray.stages.ivf import ivf_ann_topk

            top, frac = ivf_ann_topk(args.index, q, k=args.topk,
                                     nprobe=args.nprobe)
        else:
            from ner_ray.stages.similarity import lsh_ann_topk_indexed

            top, frac = lsh_ann_topk_indexed(args.index, q, k=args.topk)
        rows = top.to_pandas().to_dict("records")
        print(json.dumps({"query_id": args.query_id,
                          "read_fraction": round(frac, 4),
                          "results": rows}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
