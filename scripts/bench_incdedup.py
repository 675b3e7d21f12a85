#!/usr/bin/env python
"""Incremental-dedup scale evidence: a FIXED 1k-doc increment ingested
against staged corpora of two sizes (10x = 50k docs, 20x = 100k docs).
The claim under test: ingest cost is O(increment + index-key scan) —
near-flat in corpus size — while the rescan alternative
(near_dedup_docs over base+increment) grows with the corpus.

    RAY_GRAFT_CPUS=32 python scripts/bench_incdedup.py

Emits ONE JSON line; effective-cores probes bracket each corpus size
so numbers are contention-adjudicable. Owns its Ray session."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SIZES = (10, 20)
INC_DOCS = 1000


def main() -> None:
    from bench import _effective_cores

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from ner_ray.stages.incdedup import build_dedup_index, dedup_against_index
    from ner_ray.stages.neardup import near_dedup_docs

    res = {"metric": "incdedup_scale", "unit": "sec",
           "num_cpus": NUM_CPUS, "increment_docs": INC_DOCS, "sizes": {}}

    for replicas in SIZES:
        os.environ["NER_RAY_SF1_REPLICAS"] = str(replicas)
        import importlib

        import scripts.bench_sf1 as b1

        importlib.reload(b1)
        out_dir = f"/tmp/ner_ray_sf1_x{replicas}"
        b1.stage(out_dir)
        docs_path = os.path.join(out_dir, "documents.parquet")
        base = rd.read_parquet(docs_path, columns=["doc_id", "text"])
        n_base = base.count()

        # fixed increment: 500 exact dups of base texts + 500 novel
        head = base.take(500)
        inc_rows = [{"doc_id": 10_000_000 + i, "text": r["text"]}
                    for i, r in enumerate(head)]
        inc_rows += [{"doc_id": 10_000_500 + i,
                      "text": f"novel increment document {i} with tokens "
                              f"{' '.join(str(i * 13 + j) for j in range(30))}"}
                     for i in range(INC_DOCS - 500)]
        inc = rd.from_arrow(pa.Table.from_pylist(inc_rows))

        probe_pre = _effective_cores(NUM_CPUS)
        index_dir = f"/tmp/ner_ray_incdedup_idx_x{replicas}"
        shutil.rmtree(index_dir, ignore_errors=True)

        t0 = time.perf_counter()
        base_kept = near_dedup_docs(base, method="minhash", threshold=0.7)
        build_dedup_index(base_kept, index_dir, method="minhash")
        one_time = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        surv = dedup_against_index(inc, index_dir, threshold=0.7)
        n_kept = surv.count()
        ingest = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        joint = near_dedup_docs(base.union(inc), method="minhash",
                                threshold=0.7)
        n_joint = joint.count()
        rescan = round(time.perf_counter() - t0, 3)

        res["sizes"][f"x{replicas}"] = {
            "base_docs": n_base,
            "base_dedup_plus_index_sec": one_time,
            "ingest_sec": ingest, "increment_kept": n_kept,
            "rescan_joint_sec": rescan, "rescan_survivors": n_joint,
            "probe_pre": probe_pre,
            "probe_post": _effective_cores(NUM_CPUS),
        }

    ray.shutdown()
    a, b = res["sizes"]["x10"], res["sizes"]["x20"]
    res["ingest_growth_x10_to_x20"] = round(
        b["ingest_sec"] / a["ingest_sec"], 2)
    res["rescan_growth_x10_to_x20"] = round(
        b["rescan_joint_sec"] / a["rescan_joint_sec"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
