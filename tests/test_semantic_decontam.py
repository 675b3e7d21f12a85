"""Semantic (embedding-level) decontamination
(stages/decontam.py semantic_decontaminate / _contamination_report):

* planted leakage: a train embedding equal (or near-equal) to an eval
  embedding is dropped; orthogonal-ish rows survive;
* DuckDB value equality: survivor id set == NOT EXISTS
  (list_cosine_similarity >= tau) over the same two tables;
* brute-force numpy equality on random data incl. eval_chunk slabbing;
* layout independence (repartition changes nothing);
* eval_matrix reuse across shards == eval_ds path; report view fields;
* dim-mismatch and oversized-eval guards raise.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.stages.decontam import (semantic_contamination_report,
                                     semantic_decontaminate)

RNG = np.random.default_rng(7)


def _emb_table(vecs, start_id=0):
    return pa.table({
        "vec_id": pa.array(range(start_id, start_id + len(vecs)),
                           pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def _mk(n, d=16, seed=0):
    return np.random.default_rng(seed).normal(size=(n, d))


def _ids(ds):
    return sorted(x for b in ds.iter_batches(batch_format="pyarrow")
                  for x in b.column("vec_id").to_pylist())


def _brute_survivors(train, evalm, tau):
    tn = train / np.maximum(
        np.linalg.norm(train, axis=1, keepdims=True), 1e-30)
    en = evalm / np.maximum(
        np.linalg.norm(evalm, axis=1, keepdims=True), 1e-30)
    sims = tn @ en.T
    return sorted(np.flatnonzero(sims.max(axis=1) < tau).tolist())


def test_planted_leakage_dropped(ray_session):
    import ray.data as rd

    evalm = _mk(5, seed=1)
    train = _mk(40, seed=2)
    # rows 3 and 17: exact copy + tiny-noise copy of eval rows
    train[3] = evalm[0]
    train[17] = evalm[4] + RNG.normal(scale=1e-4, size=16)
    out = semantic_decontaminate(rd.from_arrow(_emb_table(train)),
                                 rd.from_arrow(_emb_table(evalm)),
                                 tau=0.95)
    kept = _ids(out)
    assert 3 not in kept and 17 not in kept
    assert kept == _brute_survivors(train, evalm, 0.95)


def test_duckdb_value_equality(ray_session):
    import ray.data as rd

    evalm = _mk(8, seed=3)
    train = _mk(200, seed=4)
    train[10] = evalm[2]
    train[55] = 0.9 * evalm[5] + 0.1 * _mk(1, seed=9)[0]
    # float32 storage both sides; tau chosen away from any actual sim
    tn = train / np.linalg.norm(train, axis=1, keepdims=True)
    en = evalm / np.linalg.norm(evalm, axis=1, keepdims=True)
    sims = (tn @ en.T).max(axis=1)
    tau = 0.9  # verify no sim within 1e-3 of the threshold
    assert np.abs(sims - tau).min() > 1e-3
    ttbl, etbl = _emb_table(train), _emb_table(evalm)
    out = semantic_decontaminate(rd.from_arrow(ttbl),
                                 rd.from_arrow(etbl), tau=tau)
    con = duckdb.connect()
    con.register("train", ttbl)
    con.register("ev", etbl)
    want = [r[0] for r in con.sql(
        "SELECT t.vec_id FROM train t WHERE NOT EXISTS ("
        "  SELECT 1 FROM ev e WHERE list_cosine_similarity("
        f"    t.embedding, e.embedding) >= {tau}) "
        "ORDER BY t.vec_id").fetchall()]
    assert _ids(out) == want


def test_chunked_matmul_and_layout_independence(ray_session):
    import ray.data as rd

    evalm = _mk(30, seed=5)
    train = _mk(300, seed=6)
    train[[7, 8, 250]] = evalm[[0, 11, 29]]
    want = _brute_survivors(train, evalm, 0.99)
    for chunk in (4, 7, 8192):
        out = semantic_decontaminate(
            rd.from_arrow(_emb_table(train)).repartition(5),
            rd.from_arrow(_emb_table(evalm)), tau=0.99,
            eval_chunk=chunk)
        assert _ids(out) == want
    out1 = semantic_decontaminate(
        rd.from_arrow(_emb_table(train)).repartition(1),
        rd.from_arrow(_emb_table(evalm)), tau=0.99)
    assert _ids(out1) == want


def test_eval_matrix_reuse_matches_ds_path(ray_session):
    import ray.data as rd

    evalm = _mk(6, seed=8)
    train = _mk(50, seed=9)
    train[0] = evalm[3]
    a = semantic_decontaminate(rd.from_arrow(_emb_table(train)),
                               rd.from_arrow(_emb_table(evalm)),
                               tau=0.9)
    b = semantic_decontaminate(rd.from_arrow(_emb_table(train)),
                               eval_matrix=evalm, tau=0.9)
    assert _ids(a) == _ids(b)


def test_report_fields(ray_session):
    import ray.data as rd

    evalm = _mk(4, seed=10)
    train = _mk(20, seed=11)
    train[5] = evalm[2]
    rep = semantic_contamination_report(
        rd.from_arrow(_emb_table(train)),
        rd.from_arrow(_emb_table(evalm)), tau=0.95)
    rows = pa.concat_tables(
        list(rep.iter_batches(batch_format="pyarrow"))).to_pylist()
    assert [r["vec_id"] for r in rows] == [5]
    assert rows[0]["eval_idx"] == 2
    assert rows[0]["max_sim"] == pytest.approx(1.0)


def test_guards(ray_session):
    import ray.data as rd

    train = rd.from_arrow(_emb_table(_mk(5, d=16)))
    with pytest.raises(ValueError, match="needs eval_ds"):
        semantic_decontaminate(train)
    bad_eval = rd.from_arrow(_emb_table(_mk(3, d=8)))
    with pytest.raises(Exception, match="dim mismatch"):
        semantic_decontaminate(train, bad_eval, tau=0.9) \
            .materialize()
    big_eval = rd.from_arrow(_emb_table(_mk(9, d=16)))
    with pytest.raises(ValueError, match="max_eval_rows"):
        semantic_decontaminate(train, big_eval, max_eval_rows=4)


def test_empty_eval_is_identity(ray_session):
    import ray.data as rd

    train = _mk(10)
    out = semantic_decontaminate(
        rd.from_arrow(_emb_table(train)),
        rd.from_arrow(_emb_table(np.zeros((0, 16)))), tau=0.5)
    assert _ids(out) == list(range(10))


def test_on_testdata_embeddings(ray_session):
    """End-to-end over the real embeddings table: eval = 10 rows of
    the table itself, so exactly those near-identical rows drop."""
    import ray.data as rd

    full = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    head = pa.concat_tables(
        list(full.limit(10).iter_batches(batch_format="pyarrow")))
    out = semantic_decontaminate(full, eval_matrix=np.vstack(
        [np.asarray(v, dtype=np.float64)
         for v in head.column("embedding").to_pylist()]), tau=0.999999)
    kept = _ids(out)
    dropped = set(head.column("vec_id").to_pylist())
    assert dropped.isdisjoint(kept)
    assert len(kept) >= full.count() - len(dropped) - 5  # few natural dups
