"""Deterministic shard export: layout independence, seed-stable
order, kill/resume shard skipping, completion stamp."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ner_ray.stages.shardexport import completed_shards, export_shards

N_SHARDS = 6


def _df(n: int = 500) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": [f"d{i:05d}" for i in range(n)],
        "text": [f"text {i} " * 3 for i in range(n)],
    })


def _read_all(out: str) -> dict[int, pd.DataFrame]:
    return {s: pq.read_table(
        os.path.join(out, f"shard-{s:05d}.parquet")).to_pandas()
        for s in range(N_SHARDS)}


def test_export_deterministic_across_layouts(ray_session, tmp_path):
    import ray.data as rd

    df = _df()
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    m_a = export_shards(rd.from_pandas(df), out_a, N_SHARDS, seed=7)
    m_b = export_shards(rd.from_pandas(df).repartition(11), out_b,
                        N_SHARDS, seed=7)
    assert m_a["total_rows"] == m_b["total_rows"] == len(df)
    sa, sb = _read_all(out_a), _read_all(out_b)
    for s in range(N_SHARDS):
        pd.testing.assert_frame_equal(sa[s], sb[s])
        assert len(sa[s]) > 0
    # manifest fingerprints equal too
    assert [x["content_fp"] for x in m_a["shards"]] == \
        [x["content_fp"] for x in m_b["shards"]]
    # different seed -> different assignment
    out_c = str(tmp_path / "c")
    m_c = export_shards(rd.from_pandas(df), out_c, N_SHARDS, seed=8)
    assert [x["content_fp"] for x in m_c["shards"]] != \
        [x["content_fp"] for x in m_a["shards"]]


def test_within_shard_order_is_shuffled_not_input_order(ray_session,
                                                        tmp_path):
    import ray.data as rd

    out = str(tmp_path / "o")
    export_shards(rd.from_pandas(_df()), out, N_SHARDS, seed=7)
    sh = _read_all(out)[0]
    ids = list(sh.doc_id)
    assert ids != sorted(ids), "order must be the seeded shuffle"


def test_resume_skips_finished_shards(ray_session, tmp_path):
    import ray.data as rd

    df = _df()
    full = str(tmp_path / "full")
    export_shards(rd.from_pandas(df), full, N_SHARDS, seed=7)

    part = str(tmp_path / "part")
    shutil.copytree(full, part)
    # simulate a kill: manifest missing, two shards missing
    os.remove(os.path.join(part, "_MANIFEST.json"))
    for s in (1, 4):
        os.remove(os.path.join(part, f"shard-{s:05d}.parquet"))
        os.remove(os.path.join(part, f"_shard_{s:05d}.json"))
    assert completed_shards(part, N_SHARDS) == {0, 2, 3, 5}

    m = export_shards(rd.from_pandas(df), part, N_SHARDS, seed=7)
    rows_14 = sum(len(_read_all(full)[s]) for s in (1, 4))
    assert m["written_this_run"] == rows_14
    assert m["total_rows"] == len(df)
    fa, fb = _read_all(full), _read_all(part)
    for s in range(N_SHARDS):
        pd.testing.assert_frame_equal(fa[s], fb[s])

    # a third run is a no-op (manifest stamps completion)
    m2 = export_shards(rd.from_pandas(df), part, N_SHARDS, seed=7)
    assert m2 == m


def test_manifest_shape(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "m")
    m = export_shards(rd.from_pandas(_df(50)), out, N_SHARDS, seed=7)
    assert m["num_shards"] == N_SHARDS
    assert sum(x["rows"] for x in m["shards"]) == 50
    disk = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert disk == m


def test_prepin_partial_export_refused(ray_session, tmp_path):
    import ray.data as rd

    from ner_ray.stages.shardexport import export_shards

    out = str(tmp_path / "exp")
    docs = rd.range(100).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    export_shards(docs, out, num_shards=4)
    # simulate a pre-pin-era partial export: sidecars exist, pin and
    # manifest gone — auto-sizing would resume under a DIFFERENT
    # membership (verified: duplicated rows), so it must refuse
    os.remove(os.path.join(out, "_MANIFEST.json"))
    os.remove(os.path.join(out, "_NUM_SHARDS.json"))
    with pytest.raises(ValueError, match="pin"):
        export_shards(docs, out, num_shards=None)
    # the documented escape hatch: the original explicit count resumes
    m = export_shards(docs, out, num_shards=4)
    assert m["total_rows"] == 100


def test_pin_conflict_refused(ray_session, tmp_path):
    import ray.data as rd

    from ner_ray.stages.shardexport import export_shards

    out = str(tmp_path / "exp2")
    docs = rd.range(50).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    export_shards(docs, out, num_shards=4)
    os.remove(os.path.join(out, "_MANIFEST.json"))
    with pytest.raises(ValueError, match="num_shards=4"):
        export_shards(docs, out, num_shards=8)
