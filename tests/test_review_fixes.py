"""Regression tests for the round-3 review findings: model-text
versioning, reserved pattern family names, drop-detection in the span
invariant, zero-frame media spans, fs-portable lineage enumeration,
and the checkpoint corpus-fingerprint guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_v1_model_text_backslash_not_unescaped():
    """A v1 file (written before escaping existed) with a literal
    backslash sequence must import verbatim — only v2 un-escapes."""
    from ner_ray.state.model import export_model_text, import_model_text

    v1 = ("#ner_ray_model#1\n"
          "#patterns#1\n"
          "U00:%x[0,low]\n"
          "#features#1\n"
          "low:c\\temp\tB-PER\t" + float(1.0).hex() + "\n")
    tbl, _ = import_model_text(v1)
    assert tbl.column("feature").to_pylist() == ["low:c\\temp"]

    # the same value exported today round-trips through v2 escaping
    text = export_model_text(tbl, "U00:%x[0,low]\nB\n")
    assert text.startswith("#ner_ray_model#2")
    back, _ = import_model_text(text)
    assert back.column("feature").to_pylist() == ["low:c\\temp"]


def test_v2_model_text_tab_in_feature_roundtrips():
    from ner_ray import schema as S
    from ner_ray.state.model import export_model_text, import_model_text

    tbl = pa.table({"feature": ["m0:a\tb\nc"], "label": ["B-ORG"],
                    "weight": [0.5]}, schema=S.CRF_MODEL)
    back, _ = import_model_text(
        export_model_text(tbl, "U00:%x[0,low]\nB\n"))
    assert back.column("feature").to_pylist() == ["m0:a\tb\nc"]


def test_reserved_pattern_family_name_rejected():
    from ner_ray.stages.train import _plan_from_patterns

    # the parser prefixes %t/%m ids with t/m, so the reachable
    # collision is the 'trans' family (payload key g_trans), via a
    # template id of 'trans' or 'rans'
    for bad in ("trans", "rans"):
        with pytest.raises(ValueError, match="reserved"):
            _plan_from_patterns(f'U{bad}:%t[0,low,"^[0-9]+$"]\nB\n')
    # a non-reserved id still parses
    fams, _ = _plan_from_patterns('Umyfam:%t[0,low,"^[0-9]+$"]\nB\n')
    assert "tmyfam" in fams


def test_span_invariant_catches_dropped_doc(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.stages.spans import span_invariant_verdicts

    docs = rd.read_parquet(f"{tiny_dir}/docs.parquet")
    first = docs.take(1)[0]["doc_id"]

    # identity: all true
    ok = span_invariant_verdicts(docs, docs).to_pandas()
    assert ok["equal"].all() and len(ok) == docs.count()

    # output missing one doc: exactly that doc flips to False
    dropped = docs.filter(expr=f"doc_id != {first!r}") \
        if isinstance(first, str) else \
        docs.filter(expr=f"doc_id != {first}")
    bad = span_invariant_verdicts(docs, dropped).to_pandas()
    assert len(bad) == docs.count()
    failed = bad[~bad["equal"]]
    assert list(failed["doc_id"]) == [first]


def test_media_pipeline_zero_frames(ray_session):
    """max_frames=0 legally samples nothing: every media span row must
    come back with n_frames_sampled=0 and an empty frame list instead
    of tripping the frames/stats reconciliation."""
    import ray.data as rd

    from ner_ray.fixtures.gen import ensure_fixtures
    from ner_ray.stages.multimodal import media_pipeline

    fx = ensure_fixtures("tiny")
    docs = rd.read_parquet(f"{fx}/docs.parquet")
    out = media_pipeline(docs, max_frames=0).to_pandas()
    assert len(out) > 0
    assert (out["n_frames_sampled"] == 0).all()
    assert out["frames"].map(len).eq(0).all()


def test_partition_rows_fs_handle(tmp_path):
    """The shared partition enumeration skips sidecars and accepts an
    explicit pyarrow filesystem handle (the object-store seam)."""
    from pyarrow import fs as pafs

    from ner_ray.state.lineage import _partition_rows, input_fingerprint

    d = tmp_path / "out"
    d.mkdir()
    pq.write_table(pa.table({"x": list(range(7))}), d / "part-0.parquet")
    pq.write_table(pa.table({"x": [1]}), d / "_sidecar.parquet")
    (d / "_MANIFEST.json").write_text("{}")

    got = _partition_rows(str(d))
    assert got == [("part-0.parquet", 7)]
    got_fs = _partition_rows(str(d), filesystem=pafs.LocalFileSystem())
    assert got_fs == got

    fp_a = input_fingerprint(str(d))
    fp_b = input_fingerprint(str(d), filesystem=pafs.LocalFileSystem())
    assert fp_a == fp_b
    with pytest.raises(FileNotFoundError):
        input_fingerprint(str(tmp_path / "missing"))


def test_build_graph_checkpoint_requires_docs_fp(ray_session, tiny_dir,
                                                 tmp_path):
    import ray.data as rd

    from ner_ray.pipelines.flagship import build_graph

    docs = rd.read_parquet(f"{tiny_dir}/docs.parquet")
    with pytest.raises(ValueError, match="docs_fp"):
        build_graph(docs, f"{tiny_dir}/model.parquet",
                    f"{tiny_dir}/alias.parquet",
                    checkpoint=str(tmp_path / "ckpt"))
