"""near_dedup_docs: corpus-level near-duplicate removal — detector
pairs cluster into components, one min-id representative survives per
cluster, both anti-filter paths agree, list payload columns survive
the bucketed path, and the operator is idempotent."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _dup_corpus():
    """3-doc near-dup cluster (a0,a1,a2), 2-doc cluster (b0,b1), two
    singletons. Texts differ by one trailing token so shingle Jaccard
    stays high but not 1.0."""
    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "colorless green ideas sleep furiously every single night"
    rows = [
        {"doc_id": "a0", "text": base_a},
        {"doc_id": "a1", "text": base_a + " ok"},
        {"doc_id": "a2", "text": base_a + " yes"},
        {"doc_id": "b0", "text": base_b},
        {"doc_id": "b1", "text": base_b + " too"},
        {"doc_id": "c0", "text": "completely unrelated text about ray data pipelines"},
        {"doc_id": "d0", "text": "another singleton document with its own words"},
    ]
    # a list<> payload column: survives only the list-safe paths
    for i, r in enumerate(rows):
        r["tags_list"] = [f"t{i}", f"u{i}"]
    return rows


def _ids(ds):
    return sorted(b for batch in ds.iter_batches(batch_format="pyarrow")
                  for b in batch.column("doc_id").to_pylist())


@pytest.fixture()
def dup_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(_dup_corpus()))


def test_minhash_removal_keeps_min_per_cluster(ray_session, dup_ds):
    from ner_ray.stages.neardup import near_dedup_docs

    out = near_dedup_docs(dup_ds, method="minhash", threshold=0.5)
    assert _ids(out) == ["a0", "b0", "c0", "d0"]


def test_bucketed_path_matches_broadcast_and_keeps_lists(ray_session,
                                                         dup_ds):
    from ner_ray.stages.neardup import near_dedup_docs

    out = near_dedup_docs(dup_ds, method="minhash", threshold=0.5,
                          max_broadcast_drops=0, num_buckets=4)
    assert _ids(out) == ["a0", "b0", "c0", "d0"]
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert pa.types.is_list(t.schema.field("tags_list").type)
    by_id = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("tags_list").to_pylist()))
    assert by_id["a0"] == ["t0", "u0"]  # payload intact, not nulled


def test_idempotent(ray_session, dup_ds):
    from ner_ray.stages.neardup import near_dedup_docs

    once = near_dedup_docs(dup_ds, method="minhash",
                           threshold=0.5).materialize()
    twice = near_dedup_docs(once, method="minhash", threshold=0.5)
    assert _ids(twice) == _ids(once)


def test_embedding_method_int_ids(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import near_dedup_docs

    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    rows = []
    # cluster ids {2, 10, 11}: lexicographic min of the stringified
    # ids would keep 10 ("10" < "2") — the NUMERIC min 2 must survive
    for i in (2, 10, 11):
        v = base + 1e-3 * rng.standard_normal(8)
        rows.append({"vec_id": i, "embedding": v.tolist()})
    for i in (3, 4, 5):     # independent random directions: expected
        # |cosine| ~ 1/sqrt(8), far below the 0.99 threshold
        rows.append({"vec_id": i,
                     "embedding": rng.standard_normal(8).tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = near_dedup_docs(ds, method="embedding", id_col="vec_id",
                          threshold=0.99)
    ids = sorted(b for batch in out.iter_batches(batch_format="pyarrow")
                 for b in batch.column("vec_id").to_pylist())
    assert ids == [2, 3, 4, 5]
    # id column keeps its integer type through the string-keyed
    # component step
    t = next(iter(out.iter_batches(batch_format="pyarrow")))
    assert pa.types.is_integer(t.schema.field("vec_id").type)


@pytest.mark.slow
def test_near_dedup_job_skip_on_rerun(tmp_path):
    """jobs/near_dedup.py: bucketed survivor output, fingerprint
    manifest, identical rerun skips and logs 'skipped' lineage."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = str(tmp_path)
    docs = f"{tmp}/docs.parquet"
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": r["doc_id"], "text": r["text"]}
         for r in _dup_corpus()]), docs)

    def run():
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "near_dedup.py"),
             "--docs", docs, "--out", f"{tmp}/out",
             "--checkpoint", f"{tmp}/ckpt", "--threshold", "0.5",
             "--n-buckets", "2", "--num-cpus", "4"],
            capture_output=True, text=True, cwd=repo, timeout=600)

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["survivors"] == 4 and s1["dropped"] == 3, s1
    ids = sorted(pq.read_table(f"{tmp}/out",
                               columns=["doc_id"])["doc_id"].to_pylist())
    assert ids == ["a0", "b0", "c0", "d0"]

    r2 = run()
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2.get("skipped") is True, s2
    lineage = [json.loads(ln) for ln in
               open(f"{tmp}/ckpt/lineage.jsonl", encoding="utf-8")]
    assert any(row["status"] == "skipped" for row in lineage)


def test_custom_column_names(ray_session):
    """text_col/id_col forwarding: detectors see a renamed canonical
    view even when the table carries a DIFFERENT column literally
    named 'text' (which must be ignored)."""
    import ray.data as rd

    from ner_ray.stages.neardup import near_dedup_docs

    corpus = _dup_corpus()
    # simhash needs tight Hamming distance: make the a-cluster bodies
    # IDENTICAL (distance 0) while every decoy 'text' value is distinct
    # — dups are found only if the detector reads 'body'
    for r in corpus:
        if r["doc_id"].startswith("a"):
            r["text"] = corpus[0]["text"]
    rows = [{"uid": r["doc_id"], "body": r["text"],
             "text": f"decoy {i}"}      # decoy column named 'text'
            for i, r in enumerate(corpus)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    for method in ("minhash", "simhash"):
        kw = {"threshold": 0.5} if method == "minhash" else {}
        out = near_dedup_docs(ds, method=method, text_col="body",
                              id_col="uid", **kw)
        ids = sorted(b for batch in out.iter_batches(batch_format="pyarrow")
                     for b in batch.column("uid").to_pylist())
        assert ids[0] == "a0" and "a1" not in ids and "a2" not in ids, \
            (method, ids)


def test_precomputed_pairs_chain_transitive(ray_session):
    """A chain a-b, b-c (b only pairs with each neighbor) collapses to
    ONE component — removal is transitive, not pairwise."""
    import ray.data as rd

    from ner_ray.stages.neardup import near_dedup_docs

    docs = rd.from_arrow(pa.table({
        "doc_id": ["a", "b", "c", "z"],
        "text": ["x", "x", "x", "y"],
    }))
    pairs = rd.from_arrow(pa.table({
        "doc_a": ["a", "b"], "doc_b": ["b", "c"],
    }))
    out = near_dedup_docs(docs, pairs_ds=pairs)
    assert _ids(out) == ["a", "z"]
