"""Partition-pruned LSH ANN index: the pruned read touches a strict
subset of the index's files and returns exactly what the in-stream
LSH filter (lsh_ann_topk) returns for the same planes."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    from ner_ray.stages.similarity import build_lsh_index

    out = str(tmp_path_factory.mktemp("lsh_index"))
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(4)
    build_lsh_index(ds, out)
    return out


def _query_vec():
    from ner_ray.stages.similarity import _to_matrix

    qtbl = pq.read_table(f"{SF}/embeddings.parquet").filter(
        pc.equal(pc.field("vec_id"), 0))
    return _to_matrix(qtbl.column("embedding"))[0]


def test_pruned_read_is_strict_subset(ray_session, index_dir):
    import ray.data as rd

    from ner_ray.stages.similarity import lsh_ann_topk, lsh_ann_topk_indexed

    q = _query_vec()
    top, read_fraction = lsh_ann_topk_indexed(index_dir, q, k=10)
    got = top.to_pandas()
    assert 0 < read_fraction < 1.0, read_fraction  # strict subset of files

    # identical result to the in-stream filter path (same planes/probe)
    emb = rd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    want = lsh_ann_topk(emb, q, k=10).to_pandas()
    assert got["vec_id"].to_list() == want["vec_id"].to_list()
    assert np.allclose(got["sim"], want["sim"])


def test_empty_probe_returns_empty(ray_session, tmp_path):
    from ner_ray.stages.similarity import lsh_ann_topk_indexed

    (tmp_path / "bucket=999999").mkdir()  # index with no matching bucket
    top, frac = lsh_ann_topk_indexed(str(tmp_path), np.ones(64), k=5)
    assert top.count() == 0


def test_index_build_lineage(ray_session, index_dir, tmp_path):
    """Index builds emit per-partition lineage records (one per data
    file, sidecars skipped) through the shared CheckpointManager."""
    import json
    import os

    from ner_ray.state.lineage import CheckpointManager, fingerprint

    cm = CheckpointManager(str(tmp_path / "ckpt"))
    rows = cm.log_partitioned_output("ann_lsh", fingerprint("t"),
                                     index_dir, wall_s=1.0)
    n_files = sum(
        1 for root, _d, files in os.walk(index_dir)
        for f in files if f.endswith(".parquet") and not f.startswith("_"))
    assert len(rows) == n_files > 0
    logged = [json.loads(x)
              for x in open(tmp_path / "ckpt" / "lineage.jsonl")]
    assert len(logged) == n_files
    assert all(r["stage"] == "ann_lsh" and r["rows_out"] > 0
               for r in logged)


def test_explicit_filesystem_handle(ray_session, index_dir):
    """The pruned read is pyarrow.fs-abstracted: an explicit
    LocalFileSystem handle gives byte-identical results and the same
    read fraction as the path-resolved default (the shape an
    object-store deployment uses: pass the S3FileSystem + prefix)."""
    from pyarrow import fs as pafs

    from ner_ray.stages.similarity import lsh_ann_topk_indexed

    q = _query_vec()
    top_d, frac_d = lsh_ann_topk_indexed(index_dir, q, k=10)
    top_e, frac_e = lsh_ann_topk_indexed(
        index_dir, q, k=10, filesystem=pafs.LocalFileSystem())
    assert frac_e == frac_d and 0 < frac_e < 1.0
    pd_d, pd_e = top_d.to_pandas(), top_e.to_pandas()
    assert pd_e["vec_id"].to_list() == pd_d["vec_id"].to_list()
    assert np.allclose(pd_e["sim"], pd_d["sim"])
