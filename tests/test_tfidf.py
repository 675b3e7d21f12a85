"""TF-IDF: full DuckDB SQL replication (df, idf, per-doc top-k with
deterministic tie-break), vocabulary policies, layout independence."""

import duckdb
import numpy as np
import pandas as pd
import pytest

PATH = "/root/testdata/sf0.001/documents.parquet"

# the whole pipeline in SQL: tokenize -> tf -> df -> score -> rank
ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lower(u.tok) AS tok
  FROM '{PATH}', unnest(string_split(text, ' ')) AS u(tok)
  WHERE u.tok <> ''
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
), n AS (SELECT count(*) AS n FROM '{PATH}'),
scored AS (
  SELECT tf.doc_id, tf.tok AS term, tf.tf,
         tf.tf * ln(n.n / df.df) AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(n.n / df.df) DESC,
                                     tf.tok ASC) AS rank
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, term, tf, score, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 5
ORDER BY doc_id, rank
"""


def _ours(ds, **kw):
    from ner_ray.stages.tfidf import tfidf_topk_terms

    out = tfidf_topk_terms(ds, k=5, **kw).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def test_tfidf_matches_duckdb(ray_session):
    import ray.data as rd

    got = _ours(rd.read_parquet(PATH, columns=["doc_id", "text"]))
    want = duckdb.sql(ORACLE).df()
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["doc_id"].astype("int64"),
                                   want["doc_id"].astype("int64"))
    assert (got["term"].to_numpy() == want["term"].to_numpy()).all()
    assert (got["tf"].to_numpy() == want["tf"].to_numpy()).all()
    assert np.allclose(got["score"], want["score"], rtol=1e-12, atol=0)
    assert (got["rank"].to_numpy() == want["rank"].to_numpy()).all()


def test_tfidf_layout_independent(ray_session):
    import ray.data as rd

    base = rd.read_parquet(PATH, columns=["doc_id", "text"])
    a = _ours(base.repartition(1))
    b = _ours(base.repartition(11))
    pd.testing.assert_frame_equal(a, b)


def test_min_df_and_vocab_cap(ray_session, caplog):
    import logging

    import ray.data as rd

    from ner_ray.stages.tfidf import document_frequencies

    ds = rd.read_parquet(PATH, columns=["doc_id", "text"])
    full = document_frequencies(ds).count()
    n_docs = ds.count()
    floored = document_frequencies(ds, min_df=n_docs + 1).count()
    assert floored == 0 < full
    with caplog.at_level(logging.WARNING, logger="ner_ray.stages.tfidf"):
        capped = document_frequencies(ds, max_vocab=10).count()
    assert capped == 10 < full
    assert any("capped" in r.message for r in caplog.records)


def test_topk_default_cap_is_finite(ray_session, caplog):
    """The driver-collected idf vocabulary must be bounded BY DEFAULT:
    a synthetic high-cardinality corpus (every token unique) crosses a
    small injected cap, logs the drop, and still scores; None remains
    the explicit unbounded opt-in."""
    import logging

    import ray.data as rd

    from ner_ray.stages import tfidf as T
    from ner_ray.stages.tfidf import tfidf_topk_terms

    assert T.DEFAULT_MAX_VOCAB is not None  # the default IS finite
    rows = [{"doc_id": i,
             "text": " ".join(f"tok{i}_{j}" for j in range(20))}
            for i in range(30)]  # 600 distinct tokens
    ds = rd.from_items(rows)
    orig = T.DEFAULT_MAX_VOCAB
    try:
        T.DEFAULT_MAX_VOCAB = 50
        with caplog.at_level(logging.WARNING,
                             logger="ner_ray.stages.tfidf"):
            got = tfidf_topk_terms(ds, k=3).to_pandas()
    finally:
        T.DEFAULT_MAX_VOCAB = orig
    assert any("capped" in r.message for r in caplog.records)
    assert got["term"].nunique() <= 50
    # explicit opt-out keeps the full vocabulary
    full = tfidf_topk_terms(ds, k=3, max_vocab=None).to_pandas()
    assert len(full) == 30 * 3
