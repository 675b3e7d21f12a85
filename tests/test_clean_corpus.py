"""clean_corpus: fused quality/language row filter + exact-dedup
survivor removal + optional near-dedup chain; payload columns pass
through untouched and exact_dedup_docs agrees with the exact_dedup
summary's min-id survivors on both anti paths."""

import pyarrow as pa
import pytest


def _corpus():
    en = ("the cat and the dog sat in a warm house for it was "
          "raining outside all day")
    return [
        {"doc_id": "good1", "text": en, "payload": [1, 2]},
        {"doc_id": "good2", "text": en + " again today", "payload": [3]},
        {"doc_id": "short", "text": "too short", "payload": [4]},
        {"doc_id": "spam", "text": "spam spam spam spam spam spam spam "
                                   "spam spam spam", "payload": [5]},
        {"doc_id": "french", "text": "de la le les et est dans une pour "
                                     "que sur avec ce il", "payload": [6]},
        {"doc_id": "z_dup_good1", "text": en, "payload": [7]},
    ]


def _ids(ds):
    return sorted(b for batch in ds.iter_batches(batch_format="pyarrow")
                  for b in batch.column("doc_id").to_pylist())


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(_corpus()))


def test_filter_dedup_and_stats(ray_session, corpus_ds):
    from ner_ray.pipelines.clean import clean_corpus

    out, stats = clean_corpus(corpus_ds, min_words=5,
                              min_uniq_ratio=0.3, langs=("en",),
                              min_lang_score=0.05, dedup=True,
                              return_stats=True)
    # short (min_words), spam (uniq_ratio), french (langid) filtered;
    # dup_of_good1 deduped against good1 (min id survives)
    assert _ids(out) == ["good1", "good2"]
    assert stats == {"docs_in": 6, "after_filter": 3, "after_exact": 2}
    # payload column intact through both stages
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    by_id = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("payload").to_pylist()))
    assert by_id["good1"] == [1, 2]


def test_near_dup_chain(ray_session, corpus_ds):
    from ner_ray.pipelines.clean import clean_corpus

    out = clean_corpus(corpus_ds, min_words=5, min_uniq_ratio=0.3,
                       langs=("en",), min_lang_score=0.05, dedup=True,
                       near_dup_method="minhash",
                       near_dup_kwargs={"threshold": 0.5})
    # good2 is a near-dup of good1 (one extra bigram) -> removed too
    assert _ids(out) == ["good1"]


def test_empty_and_null_texts_drop_at_min_words_1(ray_session):
    import ray.data as rd

    from ner_ray.pipelines.clean import clean_corpus

    ds = rd.from_arrow(pa.table({
        "doc_id": ["empty", "null", "spaces", "ok"],
        "text": ["", None, "   ", "one real word here"],
    }))
    out = clean_corpus(ds, min_words=1, min_mean_word_len=0.0,
                       max_mean_word_len=100.0, min_uniq_ratio=0.0,
                       langs=None, dedup=False)
    assert _ids(out) == ["ok"]


def test_exact_dedup_docs_matches_summary(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import exact_dedup, exact_dedup_docs

    rows = [{"doc_id": f"d{i}", "text": f"text {i % 3}"}
            for i in range(9)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    survivors = sorted(
        b for batch in exact_dedup(ds).iter_batches(batch_format="pyarrow")
        for b in batch.column("doc_id").to_pylist())
    broadcast = exact_dedup_docs(ds)
    bucketed = exact_dedup_docs(ds, max_broadcast_drops=0, num_buckets=3)
    for out in (broadcast, bucketed):
        got = sorted(b for batch in out.iter_batches(batch_format="pyarrow")
                     for b in batch.column("doc_id").to_pylist())
        assert got == survivors == ["d0", "d1", "d2"]
