"""Co-occurrence + PMI: brute force, DuckDB equivalence, path
equality (broadcast vs grouped-join), layout independence."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from ner_ray.stages.cooccur import cooccurrence_pmi, entity_doc_freq


def _links(seed: int = 5, n_docs: int = 80) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n_docs):
        ents = rng.choice([f"E{i:02d}" for i in range(25)],
                          size=rng.integers(1, 8), replace=True)
        for e in ents:
            rows.append((f"d{d:03d}", e))
    return pd.DataFrame(rows, columns=["doc_id", "entity_id"])


def _brute(df: pd.DataFrame):
    per_doc = defaultdict(set)
    for d, e in zip(df.doc_id, df.entity_id):
        per_doc[d].add(e)
    n_docs = len(per_doc)
    ent_n = Counter()
    pair_n = Counter()
    for ents in per_doc.values():
        s = sorted(ents)
        ent_n.update(s)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_n[(s[i], s[j])] += 1
    return n_docs, ent_n, pair_n


@pytest.fixture(scope="module")
def scored(ray_session):
    import ray.data as rd

    df = _links()
    out = cooccurrence_pmi(rd.from_pandas(df)).to_pandas() \
        .sort_values(["e1", "e2"]).reset_index(drop=True)
    return df, out


def test_counts_match_brute_force(scored):
    df, out = scored
    n_docs, ent_n, pair_n = _brute(df)
    assert len(out) == len(pair_n)
    for r in out.itertuples():
        assert pair_n[(r.e1, r.e2)] == r.n_pair
        assert ent_n[r.e1] == r.n_e1 and ent_n[r.e2] == r.n_e2
        exp = np.log(r.n_pair * n_docs / (r.n_e1 * r.n_e2))
        assert abs(r.pmi - exp) < 1e-12


def test_doc_freq(ray_session, scored):
    import ray.data as rd

    df, _ = scored
    _, ent_n, _ = _brute(df)
    got = entity_doc_freq(rd.from_pandas(df)).to_pandas() \
        .set_index("entity_id")["n_doc"].to_dict()
    assert got == dict(ent_n)


def test_matches_duckdb(scored):
    import duckdb

    df, out = scored
    con = duckdb.connect()
    con.register("links", df)
    oracle = con.sql("""
        WITH de AS (SELECT DISTINCT doc_id, entity_id FROM links),
        nd AS (SELECT count(DISTINCT doc_id) AS n FROM links),
        ef AS (SELECT entity_id, count(*) AS n_doc FROM de
               GROUP BY entity_id),
        pairs AS (SELECT a.entity_id AS e1, b.entity_id AS e2,
                         CAST(count(*) AS BIGINT) AS n_pair
                  FROM de a JOIN de b ON a.doc_id = b.doc_id
                   AND a.entity_id < b.entity_id
                  GROUP BY a.entity_id, b.entity_id)
        SELECT p.e1, p.e2, p.n_pair,
               CAST(f1.n_doc AS BIGINT) AS n_e1,
               CAST(f2.n_doc AS BIGINT) AS n_e2,
               ln(p.n_pair * (SELECT n FROM nd)
                  / (f1.n_doc * f2.n_doc)) AS pmi
        FROM pairs p JOIN ef f1 ON f1.entity_id = p.e1
        JOIN ef f2 ON f2.entity_id = p.e2
        ORDER BY p.e1, p.e2
    """).df()
    assert len(out) == len(oracle)
    for c in ("e1", "e2", "n_pair", "n_e1", "n_e2"):
        assert (out[c].to_numpy() == oracle[c].to_numpy()).all(), c
    assert np.allclose(out.pmi, oracle.pmi, rtol=0, atol=1e-12)


def test_join_path_equals_broadcast(ray_session, scored):
    import ray.data as rd

    df, out = scored
    viaj = cooccurrence_pmi(rd.from_pandas(df),
                            max_broadcast_entities=0).to_pandas() \
        .sort_values(["e1", "e2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, viaj[out.columns])


def test_layout_independent_and_min_count(ray_session, scored):
    import ray.data as rd

    df, out = scored
    out2 = cooccurrence_pmi(rd.from_pandas(df).repartition(9)) \
        .to_pandas().sort_values(["e1", "e2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
    k = int(out.n_pair.median())
    filt = cooccurrence_pmi(rd.from_pandas(df), min_pair_count=k + 1) \
        .to_pandas()
    assert (filt.n_pair >= k + 1).all()
    assert len(filt) == (out.n_pair >= k + 1).sum()
