"""JSONL docs source: coerces web-corpus-shaped JSON lines into the
pinned interleaved DOCUMENTS layout; downstream stages (flatten, tag)
see the exact Arrow schema the Parquet reader produces."""

import json

import pytest

from ner_ray import schema as S


@pytest.fixture()
def jsonl_path(tmp_path):
    rows = [
        {"doc_id": "d1", "spans": [
            {"kind": "text", "text": "Alice Chen maps the region",
             "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "img://1",
             "offset": 1}]},
        {"doc_id": "d2", "spans": [
            {"kind": "text", "text": "hello world"}]},   # missing fields
        {"doc_id": "d3", "spans": []},                   # no spans
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


def test_jsonl_missing_kind_defaults_to_text(ray_session, tmp_path):
    """Arrow's JSON schema unification fills absent struct fields with
    null once ANY line carries the field — the default must treat that
    null as kind='text', not the string 'None' (regression)."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": "a", "spans": [{"kind": "image", "text": "", '
        '"media_ref": "m", "offset": 0}]}\n'
        '{"doc_id": "b", "spans": [{"text": "hello world"}]}\n')
    from ner_ray.sources.io import read_docs_jsonl
    from ner_ray.stages.spans import flatten_text_spans

    ds = read_docs_jsonl(str(p))
    flat = ds.map_batches(flatten_text_spans,
                          batch_format="pyarrow").to_pandas()
    assert flat["doc_id"].tolist() == ["b"]  # b's span is kind text


def test_jsonl_roundtrip_schema_and_flatten(ray_session, jsonl_path):
    from ner_ray.sources.io import read_docs_jsonl
    from ner_ray.stages.spans import flatten_text_spans

    ds = read_docs_jsonl(jsonl_path)
    tbl = ds.to_pandas()
    assert sorted(tbl["doc_id"].tolist()) == ["d1", "d2", "d3"]
    # schema parity with the pinned DOCUMENTS layout
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow").take_batch(
        10, batch_format="pyarrow")
    assert arrow.schema.field("spans").type == \
        S.DOCUMENTS.field("spans").type
    # missing fields got typed defaults
    d2 = tbl.loc[tbl["doc_id"] == "d2", "spans"].iloc[0]
    assert d2[0]["media_ref"] == "" and d2[0]["offset"] == 0
    # flows through the standard flatten stage
    flat = ds.map_batches(flatten_text_spans,
                          batch_format="pyarrow").to_pandas()
    assert set(flat["doc_id"]) == {"d1", "d2"}  # d3 has no text spans
