"""Round-5 regression tests for the ADVICE findings:

* pack_sequences stays deterministic under duplicate id_col values
  (tie-broken by the seed-stable text hash), including the natural
  chunk_documents -> pack_sequences composition;
* extract_text_from_html keeps the extracted text when the extraction
  writes INTO the html column (html_col == text_col) with drop_html;
* contamination_report raises (with guidance) above its broadcast cap
  instead of OOMing the map tasks;
* the bucketed decontaminate path no-ops on an empty corpus instead of
  crashing on a null-typed id column;
* dsir_select detects the degenerate all-equal-scores case and honors
  ``fraction`` via the hash-threshold fallback.
"""

import numpy as np
import pyarrow as pa
import pytest

from ner_ray.stages.chunking import chunk_documents, pack_sequences
from ner_ray.stages.decontam import contamination_report, decontaminate
from ner_ray.stages.dsir import dsir_select
from ner_ray.stages.htmlextract import extract_text_from_html

_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]


def _collect(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({}).to_pandas()
    return pa.concat_tables(batches).to_pandas()


def _pack_df(ds, **kw):
    return _collect(pack_sequences(ds, **kw)) \
        .sort_values(["shard", "seq_idx"]).reset_index(drop=True)


def test_pack_duplicate_ids_deterministic(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    # 40 rows over only 8 distinct ids -> heavy duplication; texts vary
    rows = [{"doc_id": int(rng.integers(0, 8)),
             "text": " ".join(rng.choice(_WORDS, size=int(rng.integers(1, 9))))}
            for _ in range(40)]
    tbl = pa.Table.from_pylist(rows)
    outs = [_pack_df(rd.from_arrow(tbl).repartition(p),
                     max_tokens=11, num_shards=4)
            for p in (1, 3, 9)]
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])
    n_total = sum(len(r["text"].split()) for r in rows)
    assert int(outs[0]["n_tokens"].sum()) == n_total


def test_chunk_then_pack_deterministic(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(_WORDS, size=int(rng.integers(0, 40))))}
            for i in range(25)]
    tbl = pa.Table.from_pylist(rows)

    def run(parts):
        chunks = chunk_documents(rd.from_arrow(tbl).repartition(parts),
                                 max_tokens=7)
        return _pack_df(chunks, max_tokens=13, num_shards=3)

    a, b = run(1), run(6)
    assert a.equals(b)


def test_html_extract_into_html_col(ray_session):
    import ray.data as rd

    tbl = pa.Table.from_pylist([
        {"doc_id": 0,
         "html": "<html><title>T</title><body><p>hello</p>"
                 "<p>world</p></body></html>"},
    ])
    out = _collect(extract_text_from_html(
        rd.from_arrow(tbl), html_col="html", text_col="html",
        title_col="title", drop_html=True))
    assert out["html"].tolist() == ["hello\nworld"]
    assert out["title"].tolist() == ["T"]
    # the normal (distinct-columns) path still drops the raw html
    out2 = _collect(extract_text_from_html(
        rd.from_arrow(tbl), drop_html=True))
    assert "html" not in out2.columns
    assert out2["text"].tolist() == ["hello\nworld"]


def test_contamination_report_broadcast_cap(ray_session):
    import ray.data as rd

    docs = rd.from_items([{"doc_id": 0, "text": "a b c d e"}])
    hashes = np.arange(10, dtype=np.uint64)
    with pytest.raises(ValueError, match="max_broadcast_hashes"):
        contamination_report(docs, eval_hashes=hashes, n=3,
                             max_broadcast_hashes=5)
    # at/below the cap the report still runs
    rep = _collect(contamination_report(docs, eval_hashes=hashes, n=3,
                                        max_broadcast_hashes=10))
    assert len(rep) == 0


def test_bucketed_decontam_empty_corpus(ray_session):
    import ray.data as rd

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    hashes = np.arange(4, dtype=np.uint64)
    # max_broadcast_hashes=0 forces the bucketed path
    out = decontaminate(rd.from_arrow(empty), eval_hashes=hashes, n=3,
                        max_broadcast_hashes=0, num_buckets=4)
    assert out.count() == 0


def test_dsir_degenerate_scores_honor_fraction(ray_session):
    import ray.data as rd

    docs = rd.from_items([{"doc_id": i, "text": "x y z"}
                          for i in range(400)]).repartition(4)
    model = {"log_ratio": np.zeros(64), "num_buckets": 64, "n": 2}
    kept = dsir_select(docs, model, fraction=0.5, gumbel=False)
    frac = kept.count() / 400
    assert 0.38 <= frac <= 0.62  # ~fraction, NOT 100%
    # deterministic across layouts
    kept2 = dsir_select(docs.repartition(9), model, fraction=0.5,
                        gumbel=False)
    a = sorted(_collect(kept)["doc_id"].tolist())
    b = sorted(_collect(kept2)["doc_id"].tolist())
    assert a == b
