#!/usr/bin/env python
"""Round-4 scale evidence: the new/reworked curation operators at the
10x staged corpus (50k docs; staging shared with scripts/bench_sf1.py)
plus a 100k-member viral-duplicate family — the skew case the
hot-bucket work exists for.

    RAY_GRAFT_CPUS=32 python scripts/bench_r4_scale.py

Emits ONE JSON line with per-op seconds, row counts, and the host
effective-cores probes (bench._effective_cores) bracketing the run so
numbers are contention-adjudicable. Owns its Ray session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("NER_RAY_SF1_REPLICAS", "10"))


def main() -> None:
    from bench import _effective_cores
    from scripts.bench_sf1 import stage

    probe_pre = _effective_cores(NUM_CPUS)

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    out_dir = f"/tmp/ner_ray_sf1_x{REPLICAS}"
    stage(out_dir)
    res: dict = {"metric": "r4_scale_suite", "unit": "sec",
                 "num_cpus": NUM_CPUS, "ops": {}}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        res["ops"][name] = dict(out, sec=round(time.perf_counter() - t0, 3))

    docs_path = os.path.join(out_dir, "documents.parquet")
    n_docs = rd.read_parquet(docs_path).count()
    res["docs_10x"] = n_docs

    # 1. near-dup REMOVAL, star-edge detectors (round-3 all-pairs
    # baseline on this corpus: 123.8 s)
    def near_dedup():
        from ner_ray.stages.neardup import near_dedup_docs

        out = near_dedup_docs(rd.read_parquet(docs_path),
                              method="minhash", threshold=0.7)
        return {"survivors": out.count(), "docs_in": n_docs}

    timed("near_dedup_docs_star", near_dedup)

    # 2. exact dedup with auto-sized buckets (r3: 2.8 s fixed-64)
    def exact():
        from ner_ray.stages.neardup import exact_dedup_docs

        return {"survivors":
                exact_dedup_docs(rd.read_parquet(docs_path)).count()}

    timed("exact_dedup_docs_auto", exact)

    # 3. paragraph dedup, auto buckets + bucketed reassembly
    def paras():
        from ner_ray.stages.neardup import dedup_paragraphs

        return {"docs_out":
                dedup_paragraphs(rd.read_parquet(docs_path)).count()}

    timed("dedup_paragraphs_auto", paras)

    # 4. benchmark decontamination: 50k train docs vs a 500-doc eval
    # set (every 100th doc), broadcast map-only path
    def decontam():
        from ner_ray.stages.decontam import decontaminate

        def is_eval(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 100 == 7))

        def is_train(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 100 != 7))

        all_docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
        ev = all_docs.map_batches(is_eval, batch_format="pyarrow")
        tr = all_docs.map_batches(is_train, batch_format="pyarrow")
        out = decontaminate(tr, ev, n=13)
        return {"survivors": out.count()}

    timed("decontaminate_n13", decontam)

    # 5. per-domain cap on the 10x corpus (20 domains x ~2.5k docs;
    # cap 1000 binds on every domain)
    def cap():
        from ner_ray.stages.urlfilter import cap_per_domain

        out = cap_per_domain(
            rd.read_parquet(docs_path, columns=["doc_id", "source"]),
            cap=1000, domain_col="source")
        return {"survivors": out.count()}

    timed("cap_per_domain_1000", cap)

    # 6. the skew case: a 100k-member viral duplicate family. Star
    # candidate generation must stay O(m) (all-pairs would be 5e9).
    def viral():
        from ner_ray.stages.neardup import (
            lsh_candidate_pairs,
            near_dedup_docs,
        )

        m = 100_000
        text = ("breaking news template page with identical boilerplate "
                "body repeated across the entire mirror farm tonight")
        fam = pa.table({
            "doc_id": pa.array(np.arange(m + 1, dtype=np.int64)),
            "text": pa.array([text] * m + ["one unrelated control doc"]),
        })
        ds = rd.from_arrow(fam).materialize()
        cand = lsh_candidate_pairs(ds, pair_mode="star")
        n_edges = cand.count()
        survivors = near_dedup_docs(ds, method="minhash",
                                    threshold=0.9).count()
        return {"family": m, "star_edges": n_edges,
                "survivors": survivors}

    timed("viral_100k_family", viral)

    ray.shutdown()
    res["probe_pre"] = probe_pre
    res["probe_post"] = _effective_cores(NUM_CPUS)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
