#!/usr/bin/env python
"""One-notch scale bench: the dedup/similarity suite at ~sf1 (10x the
sf0.1 tables) — VERDICT r2 item 8.

Stages an amplified sf directory under /tmp (documents 10x with
re-keyed doc_ids and a per-replica suffix token so replicas are NOT
trivial duplicates of each other — dup structure scales linearly like
a real 10x corpus; embeddings 10x re-keyed with a tiny deterministic
per-replica rotation for the same reason), then times each suite query
at sf1 and at sf0.1 in the SAME session and reports the per-row rate
ratio. The bar (BENCH item 8): sf1 per-row rate within 2x of sf0.1.

    RAY_GRAFT_CPUS=32 python scripts/bench_sf1.py

Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("NER_RAY_SF1_REPLICAS", "10"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

SUITE = [
    "q_dedup_exact", "q_neardup_pairs",
    "q_text_stats", "q_doc_signals", "q_ngram_jaccard",
    "q_ann_topk", "q_embed_dup_pairs",
]
# which table drives each query's row count (for per-row rates)
DRIVER_TABLE = {q: ("embeddings" if q.startswith(("q_ann", "q_embed"))
                    else "documents") for q in SUITE}


def stage(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(out_dir, "_COMPLETE")):
        return
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = docs.num_rows
    parts = []
    for r in range(REPLICAS):
        t = docs
        t = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pc.add(t.column("doc_id"), r * n))
        # one extra token per replica: near-dup pairs WITHIN a replica
        # survive (one token barely moves Jaccard), replicas of the
        # same doc do NOT collapse into exact dups across replicas
        t = t.set_column(
            t.schema.get_field_index("text"), "text",
            pc.binary_join_element_wise(t.column("text"), f"zrep{r}", " "))
        parts.append(t)
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=4096)

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    m = emb.num_rows
    flat = emb.column("embedding").combine_chunks()
    mat = flat.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float32).reshape(m, -1)
    d = mat.shape[1]
    eparts = []
    for r in range(REPLICAS):
        # tiny deterministic perturbation so replicas are near but not
        # identical vectors (mirrors a real 10x embedding table)
        pert = mat + 0.01 * np.float32(r) * np.roll(mat, 1, axis=1)
        off = pa.array(
            np.arange(0, (m + 1) * d, d, dtype=np.int32), pa.int32())
        col = pa.ListArray.from_arrays(
            off, pa.array(pert.reshape(-1), pa.float32()))
        eparts.append(pa.table({
            "vec_id": pc.add(emb.column("vec_id"), r * m),
            "embedding": col,
            "label": emb.column("label"),
        }))
    pq.write_table(pa.concat_tables(eparts),
                   os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=4096)
    with open(os.path.join(out_dir, "_COMPLETE"), "w") as f:
        f.write("ok\n")


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    out_dir = f"/tmp/ner_ray_sf1_x{REPLICAS}"
    stage(out_dir)

    import pyarrow.parquet as pq

    rows = {t: pq.read_metadata(os.path.join(out_dir, f"{t}.parquet"))
            .num_rows for t in ("documents", "embeddings")}
    rows01 = {t: pq.read_metadata(os.path.join(SRC, f"{t}.parquet"))
              .num_rows for t in ("documents", "embeddings")}

    from ner_ray.pipelines.queries import registry

    reg = registry()

    def consume(r):
        return r.count() if hasattr(r, "count") else len(r)

    res: dict = {"metric": "sf1_suite", "unit": "sec",
                 "replicas": REPLICAS, "num_cpus": NUM_CPUS,
                 "rows_sf1": rows, "queries": {}}
    for name in SUITE:
        t0 = time.perf_counter()
        n_out = consume(reg[name](out_dir))
        t_sf1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        consume(reg[name](SRC))
        t_sf01 = time.perf_counter() - t0
        tbl = DRIVER_TABLE[name]
        rate1 = rows[tbl] / t_sf1
        rate01 = rows01[tbl] / t_sf01
        res["queries"][name] = {
            "sf1_sec": round(t_sf1, 3), "sf01_sec": round(t_sf01, 3),
            "sf1_rows_out": n_out,
            "rate_ratio_sf1_vs_sf01": round(rate1 / rate01, 3),
        }
    worst = min(v["rate_ratio_sf1_vs_sf01"] for v in res["queries"].values())
    res["worst_rate_ratio"] = worst
    res["within_2x"] = bool(worst >= 0.5)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
