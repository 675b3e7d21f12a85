#!/usr/bin/env python
"""Wave-5 scale evidence: the selection/tokenization operators at 1x
(sf0.1, 5k docs) vs the 10x staged corpus (50k docs; staging shared
with scripts/bench_sf1.py). Superlinear per-row cost is the thing this
measures — a scale-safe operator holds its docs/s rate within host
noise as data grows 10x.

    RAY_GRAFT_CPUS=32 python scripts/bench_wave5_scale.py

Emits ONE JSON line: per-op seconds + rows at both scales, the
10x/1x per-row rate ratio, and effective-core probes bracketing the
run. Owns its Ray session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import _effective_cores
    from scripts.bench_sf1 import REPLICAS, stage

    probe_pre = _effective_cores(NUM_CPUS)

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    out_dir = f"/tmp/ner_ray_sf1_x{REPLICAS}"
    stage(out_dir)
    paths = {"1x": os.path.join(SF, "documents.parquet"),
             "10x": os.path.join(out_dir, "documents.parquet")}
    res: dict = {"metric": "wave5_scale_suite", "unit": "sec",
                 "num_cpus": NUM_CPUS, "ops": {}}

    def run(op_name, scale, fn):
        t0 = time.perf_counter()
        rows = fn()
        res["ops"].setdefault(op_name, {})[scale] = {
            "sec": round(time.perf_counter() - t0, 3), "rows": rows}

    def ratio(op_name):
        o = res["ops"][op_name]
        r1 = o["1x"]["rows"] / max(o["1x"]["sec"], 1e-9)
        r10 = o["10x"]["rows"] / max(o["10x"]["sec"], 1e-9)
        o["rate_ratio_10x_over_1x"] = round(r10 / r1, 3)

    def count(ds):
        return sum(len(b) for b in
                   ds.iter_batches(batch_format="pyarrow"))

    for scale, path in paths.items():
        docs = rd.read_parquet(path, columns=["doc_id", "text"])

        # 1. sequence packing (auto shards)
        from ner_ray.stages.chunking import pack_sequences

        run("pack_sequences", scale,
            lambda: count(pack_sequences(docs, max_tokens=512)))

        # 2. DSIR fit + select (target = 500-doc sample of the corpus)
        from ner_ray.stages.dsir import dsir_select, fit_dsir

        def dsir():
            tgt = docs.limit(500).materialize()
            model = fit_dsir(tgt, docs)
            return count(dsir_select(docs, model, 0.3))

        run("dsir_fit_select", scale, dsir)

        # 3. BPE: count -> learn(2000) -> encode whole corpus
        from ner_ray.stages.bpe import bpe_encode, learn_bpe

        def bpe():
            model = learn_bpe(docs, vocab_size=2000)
            return count(bpe_encode(docs, model,
                                    concurrency=(1, NUM_CPUS // 2)))

        run("bpe_learn_encode", scale, bpe)

        # 4. quality classifier: fit 5 epochs (pos = 500-doc sample)
        #    + pareto filter
        from ner_ray.stages.qualityclf import (fit_quality_classifier,
                                               pareto_filter)

        def clf():
            pos = docs.limit(500).materialize()
            pinned = docs.materialize()
            model = fit_quality_classifier(pos, pinned, epochs=5)
            return count(pareto_filter(pinned, model, alpha=3.0))

        run("qualityclf_fit_filter", scale, clf)

        # 5. HTML extraction (wrap each doc in markup on the fly —
        #    measures the parser actor pool at corpus width)
        from ner_ray.stages.htmlextract import extract_text_from_html

        def htmlx():
            def wrap(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                h = pc.binary_join_element_wise(
                    "<html><head><title>t</title><script>j()</script>"
                    "</head><body><p>", t.column("text"),
                    "</p></body></html>", "")
                return t.drop_columns(["text"]) \
                    .append_column("html", h)

            wrapped = docs.map_batches(wrap, batch_format="pyarrow")
            return count(extract_text_from_html(
                wrapped, concurrency=(1, NUM_CPUS // 2)))

        run("html_extract", scale, htmlx)

        # 6. semantic decontamination over an embedding table scaled
        #    to match (corpus-width synthetic embeddings, 64-dim)
        from ner_ray.stages.decontam import semantic_decontaminate

        def semdec():
            def embed(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                rng = np.random.default_rng(7)
                base = rng.normal(size=(64, 64))
                v = base[ids % 64] + (ids[:, None] % 997) / 997.0
                return pa.table({
                    "vec_id": t.column("doc_id"),
                    "embedding": pa.array(
                        [row for row in v.astype(np.float32)],
                        pa.list_(pa.float32()))})

            emb = docs.map_batches(embed, batch_format="pyarrow") \
                .materialize()
            ev = np.random.default_rng(8).normal(size=(2000, 64))
            return count(semantic_decontaminate(emb, eval_matrix=ev,
                                                tau=0.99))

        run("semantic_decontam", scale, semdec)

    for op in res["ops"]:
        ratio(op)
    res["probe_pre"] = probe_pre
    res["probe_post"] = _effective_cores(NUM_CPUS)
    ray.shutdown()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
