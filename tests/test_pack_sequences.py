"""Sequence packing (stages/chunking.py pack_sequences):

* DuckDB value equality at num_shards=1: global position via
  generate_subscripts + window arithmetic replicates (seq_idx, text,
  n_tokens, n_docs) exactly;
* token conservation: sum(n_tokens) == corpus token count (keep-last),
  and == floor multiple with drop_last;
* layout independence: repartitioning the input changes nothing;
* seed sensitivity: a different seed reshards;
* empty docs contribute nothing and never inflate n_docs;
* brute-force n_docs check across straddled boundaries.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ner_ray.stages.chunking import pack_sequences

RNG = np.random.default_rng(11)
_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
          "golf", "hotel"]


def _docs(n=40, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        k = int(rng.integers(0, 30))
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(_WORDS, size=k))})
    return pa.Table.from_pylist(rows)


def _collect(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.to_pandas().sort_values(["shard", "seq_idx"]) \
        .reset_index(drop=True)


def test_duckdb_equality_single_shard(ray_session):
    import ray.data as rd

    tbl = _docs()
    mt = 17
    got = _collect(pack_sequences(rd.from_arrow(tbl), max_tokens=mt,
                                  num_shards=1))
    con = duckdb.connect()
    con.register("docs", tbl)
    want = con.sql(f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM docs
        ), clean AS (
          SELECT doc_id, w,
                 row_number() OVER (ORDER BY doc_id, pos) - 1 AS gpos
          FROM toks WHERE w <> ''
        )
        SELECT gpos // {mt} AS seq_idx,
               string_agg(w, ' ' ORDER BY gpos) AS text,
               count(*) AS n_tokens,
               count(DISTINCT doc_id) AS n_docs
        FROM clean GROUP BY 1 ORDER BY 1
    """).df()
    assert got["seq_idx"].tolist() == want["seq_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert (got["shard"] == 0).all()


def test_token_conservation_and_drop_last(ray_session):
    import ray.data as rd

    tbl = _docs(60, seed=4)
    n_total = sum(len(t.split()) for t in tbl.column("text").to_pylist())
    keep = _collect(pack_sequences(rd.from_arrow(tbl), max_tokens=32,
                                   num_shards=4))
    assert int(keep["n_tokens"].sum()) == n_total
    drop = _collect(pack_sequences(rd.from_arrow(tbl), max_tokens=32,
                                   num_shards=4, drop_last=True))
    assert (drop["n_tokens"] == 32).all()
    # keep-last: every sequence except at most one per shard is full
    short = keep[keep["n_tokens"] < 32]
    assert short.groupby("shard").size().max() <= 1


def test_layout_independence_and_seed(ray_session):
    import ray.data as rd

    tbl = _docs(50, seed=5)
    a = _collect(pack_sequences(rd.from_arrow(tbl).repartition(1),
                                max_tokens=13, num_shards=8))
    b = _collect(pack_sequences(rd.from_arrow(tbl).repartition(7),
                                max_tokens=13, num_shards=8))
    assert a.equals(b)
    c = _collect(pack_sequences(rd.from_arrow(tbl), max_tokens=13,
                                num_shards=8, seed=99))
    assert not a["text"].equals(c["text"])
    assert int(a["n_tokens"].sum()) == int(c["n_tokens"].sum())


def test_empty_docs_ignored(ray_session):
    import ray.data as rd

    tbl = pa.Table.from_pylist([
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": "d e f"},
    ])
    got = _collect(pack_sequences(rd.from_arrow(tbl), max_tokens=6,
                                  num_shards=1))
    assert got["text"].tolist() == ["a b c d e f"]
    assert got["n_docs"].tolist() == [2]  # empty docs don't count


def test_ndocs_brute_force(ray_session):
    import ray.data as rd

    tbl = _docs(30, seed=6)
    mt = 11
    got = _collect(pack_sequences(rd.from_arrow(tbl), max_tokens=mt,
                                  num_shards=1))
    # brute force: token -> doc map in id order
    owners = []
    for r in tbl.sort_by("doc_id").to_pylist():
        owners += [r["doc_id"]] * len(r["text"].split())
    for _, row in got.iterrows():
        s = row["seq_idx"] * mt
        want = len(set(owners[s:s + row["n_tokens"]]))
        assert row["n_docs"] == want


def test_validation(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(rd.from_arrow(_docs(3)), max_tokens=0)
