"""Small-file compaction CLI for partitioned parquet layouts.

    python jobs/compact.py --root /data/graph --target-mb 128 \
        --sort-by src

Merges each partition directory's small-file tail into ~target-size
files (ner_ray/sources/compact.py), preserving the directory layout
that resume/consumers key on. Crash-safe: rerunning after a kill
settles the previous plan before planning anew. Owns its Ray session
(guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="partitioned parquet root directory")
    ap.add_argument("--target-mb", type=float, default=128.0,
                    help="target output file size")
    ap.add_argument("--small-fraction", type=float, default=0.5,
                    help="files >= fraction*target are left alone")
    ap.add_argument("--sort-by", default="",
                    help="comma-separated columns to sort merged files by "
                         "(keeps clustered layouts prunable)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        from ner_ray.sources.compact import compact_dir

        sort_by = tuple(c for c in args.sort_by.split(",") if c)
        stats = compact_dir(args.root,
                            target_bytes=int(args.target_mb * 2**20),
                            small_fraction=args.small_fraction,
                            sort_by=sort_by)
        print(json.dumps(stats))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
