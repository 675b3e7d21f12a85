"""Unigram-LM quality scoring (stages/lmscore.py): DuckDB recomputes
the corpus-trained unigram mean -log p per doc exactly; buckets cover
the corpus with head scoring better than tail; OOV floor and quantile
machinery behave."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    # repeated natural-ish docs + one gibberish doc (rare tokens)
    rows = []
    for i in range(12):
        rows.append({"doc_id": i,
                     "text": "the cat sat on the mat and the dog slept"})
    for i in range(12, 18):
        rows.append({"doc_id": i,
                     "text": "the dog ran to the park and the cat ran"})
    rows.append({"doc_id": 18, "text": "zqx wvu jkl pqr mno zqx"})
    rows.append({"doc_id": 19, "text": ""})
    return pa.Table.from_pylist(rows)


def test_lm_score_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.stages.lmscore import score_docs, train_unigram

    tbl = _corpus()
    ds = rd.from_arrow(tbl)
    model = train_unigram(ds, top_k=10_000)     # >= vocab: no OOV cut
    scored = score_docs(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    expected = duckdb.connect().execute("""
        WITH w AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
                   FROM tbl WHERE text <> ''),
        c AS (SELECT tok, count(*) AS n FROM w GROUP BY tok),
        tot AS (SELECT sum(n) AS s FROM c),
        sc AS (SELECT doc_id, avg(-ln(n / s)) AS lm_score
               FROM w JOIN c USING (tok), tot GROUP BY doc_id)
        SELECT t.doc_id, coalesce(round(sc.lm_score, 6), 0.0) AS lm_score
        FROM tbl t LEFT JOIN sc USING (doc_id) ORDER BY t.doc_id
    """).df()
    assert np.allclose(scored["lm_score"].to_numpy(),
                       expected["lm_score"].to_numpy(), atol=1e-6)
    # gibberish doc scores strictly worse than the natural docs
    by_id = dict(zip(scored["doc_id"], scored["lm_score"]))
    assert by_id[18] > max(by_id[i] for i in range(18))
    assert by_id[19] == 0.0


def test_oov_floor_below_any_seen_token(ray_session):
    import ray.data as rd

    from ner_ray.stages.lmscore import score_docs, train_unigram

    ds = rd.from_arrow(_corpus())
    model = train_unigram(ds, top_k=10_000)
    assert model["oov_logp"] < model["logp"].min()
    # scoring unseen text uses the floor -> worse than anything seen
    unseen = rd.from_arrow(pa.table(
        {"doc_id": [0], "text": ["totally unseen tokens everywhere"]}))
    s = score_docs(unseen, model).to_pandas()["lm_score"][0]
    assert s == pytest.approx(-model["oov_logp"], abs=1e-6)


def test_top_k_cut_keeps_heavy_hitters(ray_session):
    import ray.data as rd

    from ner_ray.stages.lmscore import train_unigram

    ds = rd.from_arrow(_corpus())
    model = train_unigram(ds, top_k=3)
    assert len(model["tokens"]) == 3
    assert "the" in model["tokens"]             # the heaviest hitter


def test_perplexity_buckets_cover_and_order(ray_session):
    import ray.data as rd

    from ner_ray.stages.lmscore import perplexity_buckets

    ds = rd.from_arrow(_corpus())
    bucketed, (t_head, t_mid), model = perplexity_buckets(ds)
    df = bucketed.to_pandas()
    assert set(df["lm_bucket"]) <= {"head", "middle", "tail"}
    assert len(df) == 20 and t_head <= t_mid
    # the gibberish doc lands in the worst bucket present
    worst = df.loc[df["doc_id"] == 18, "lm_bucket"].iloc[0]
    assert worst == "tail"
    # head docs score <= tail docs
    if (df["lm_bucket"] == "head").any() and \
            (df["lm_bucket"] == "tail").any():
        assert df.loc[df["lm_bucket"] == "head", "lm_score"].max() <= \
            df.loc[df["lm_bucket"] == "tail", "lm_score"].min()


def test_score_quantiles_accuracy(ray_session):
    import ray.data as rd

    from ner_ray.stages.lmscore import score_quantiles

    rng = np.random.default_rng(9)
    v = rng.uniform(0, 100, size=5000)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(8)
    qs = score_quantiles(ds, "x", (0.25, 0.5, 0.9), bins=4096)
    exact = np.quantile(v, [0.25, 0.5, 0.9])
    assert np.allclose(qs, exact, atol=100 / 4096 + 0.2)
