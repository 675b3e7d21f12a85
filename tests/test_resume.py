"""Checkpoint/resume lifecycle (SURVEY.md §5.5): kill a run between
stages, rerun, assert identical final output and that lineage shows
skipped partitions."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(tmp, fail_after="", extra_env=None):
    from ner_ray.fixtures.gen import ensure_fixtures

    fx = ensure_fixtures("tiny")
    env = dict(os.environ, NER_RAY_FAIL_AFTER_STAGE=fail_after,
               RAY_GRAFT_CPUS="4", **(extra_env or {}))
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "build_graph.py"),
         "--docs", f"{fx}/docs.parquet", "--model", f"{fx}/model.parquet",
         "--alias", f"{fx}/alias.parquet",
         "--output", f"{tmp}/out", "--checkpoint", f"{tmp}/ckpt",
         "--num-cpus", "4"],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=600)


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    tmp = str(tmp_path)
    # run 1: die after the deduped stage
    r1 = _run_job(tmp, fail_after="deduped")
    assert r1.returncode == 42, r1.stderr[-2000:]
    lineage_path = f"{tmp}/ckpt/lineage.jsonl"
    l1 = [json.loads(x) for x in open(lineage_path)]
    stages1 = {r["stage"] for r in l1}
    assert "triples" in stages1 and "deduped" in stages1
    assert "adjacency" not in stages1
    assert all(r["status"] == "computed" for r in l1)

    # run 2: completes; earlier stages are skipped, not recomputed
    r2 = _run_job(tmp)
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["resolved"] > 0 and summary["adjacency_rows"] > 0
    l2 = [json.loads(x) for x in open(lineage_path)][len(l1):]
    by_stage = {}
    for r in l2:
        by_stage.setdefault(r["stage"], set()).add(r["status"])
    assert by_stage["triples"] == {"skipped"}
    assert by_stage["deduped"] == {"skipped"}
    assert by_stage["resolved"] == {"computed"}
    assert by_stage["adjacency"] == {"computed"}

    # run 3: everything skipped; output unchanged
    r3 = _run_job(tmp)
    assert r3.returncode == 0, r3.stderr[-2000:]
    summary3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert summary3["resolved"] == summary["resolved"]
    l3 = [json.loads(x) for x in open(lineage_path)][len(l1) + len(l2):]
    assert {r["status"] for r in l3} == {"skipped"}

    # adjacency output is hash-partitioned by bucket (the resume unit)
    adj_dir = summary["adjacency_dir"]
    buckets = [d for d in os.listdir(adj_dir) if d.startswith("bucket=")]
    assert len(buckets) >= 2

    # resolved checkpoint content matches the golden resolved triples
    import pyarrow.parquet as pq

    from ner_ray.fixtures.gen import ensure_fixtures

    fx = ensure_fixtures("tiny")
    got = pq.read_table(
        os.path.dirname(os.path.join(adj_dir, ""))  # adjacency dir itself
    )
    gold = pq.read_table(f"{fx}/gold_adjacency.parquet").to_pandas()
    got_df = got.to_pandas().sort_values("src").reset_index(drop=True)
    assert got_df["src"].tolist() == gold["src"].tolist()
    assert got_df["degree"].tolist() == gold["degree"].tolist()


def test_flagship_checkpoint_lineage(ray_session, tmp_path):
    """The queries() flagship path emits lineage when opted in: run 1
    computes the tail stages, run 2 skips both and returns identical
    adjacency (SURVEY §2.10 S8 as a cross-cutting wrapper, not only the
    job script)."""
    import json

    from ner_ray.fixtures.gen import ensure_fixtures
    from ner_ray.pipelines.flagship import run_fixture_pipeline

    fx = ensure_fixtures("tiny")
    ckpt = str(tmp_path / "ckpt")
    out1 = run_fixture_pipeline(fx, checkpoint=ckpt)
    adj1 = out1["adjacency"].to_pandas().sort_values("src") \
        .reset_index(drop=True)
    lineage_path = f"{ckpt}/lineage.jsonl"
    l1 = [json.loads(x) for x in open(lineage_path)]
    by_stage = {}
    for r in l1:
        by_stage.setdefault(r["stage"], set()).add(r["status"])
    assert by_stage["flagship_resolved"] == {"computed"}
    assert by_stage["flagship_adjacency"] == {"computed"}

    out2 = run_fixture_pipeline(fx, checkpoint=ckpt)
    adj2 = out2["adjacency"].to_pandas().sort_values("src") \
        .reset_index(drop=True)
    l2 = [json.loads(x) for x in open(lineage_path)][len(l1):]
    assert l2 and {r["status"] for r in l2} == {"skipped"}
    pd.testing.assert_frame_equal(adj1, adj2)
