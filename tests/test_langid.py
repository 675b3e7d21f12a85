"""Trainable language ID (stages/langid.py):

* held-out accuracy >= 0.9 across 5 fixture languages (two of them —
  es/it — deliberately share surface words, and one — it — has NO
  stopword profile, the case the heuristic cannot cover);
* scoring is layout-independent and deterministic;
* char-n-gram extraction matches a brute-force reference;
* < 2 labels is rejected.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.stages.langid import (_char_ngram_buckets, fit_langid,
                                   langid_scores)
from ner_ray.util.hashing import combine_hashes, to_bucket

VOCAB = {
    "en": ["the", "and", "with", "house", "water", "friend",
           "morning", "people", "would", "think", "street", "light"],
    "fr": ["bonjour", "maison", "avec", "toujours", "homme",
           "chose", "temps", "monde", "ville", "soir", "rue", "eau"],
    "de": ["zeit", "haus", "fenster", "immer", "mensch", "schoen",
           "stadt", "wasser", "freund", "morgen", "strasse", "licht"],
    "es": ["tiempo", "casa", "ventana", "siempre", "hombre",
           "bonito", "ciudad", "agua", "amigo", "calle", "noche",
           "luz"],
    "it": ["tempo", "casa", "finestra", "sempre", "uomo", "bello",
           "citta", "acqua", "amico", "strada", "notte", "luce"],
}


def _corpus(n_per_lang, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for lang, words in sorted(VOCAB.items()):
        for i in range(n_per_lang):
            k = int(rng.integers(6, 14))
            rows.append({"doc_id": f"{lang}-{seed}-{i}", "lang": lang,
                         "text": " ".join(rng.choice(words, size=k))})
    return pd.DataFrame(rows)


def _collect(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.to_pandas()


def test_char_ngrams_match_brute_force():
    texts = pa.array(["Ab c", "", None, "xyz"])
    B = 64
    rows, buckets = _char_ngram_buckets(texts, B, n_lo=1, n_hi=2)
    want = []
    for r, s in enumerate(["ab c", "", "", "xyz"]):
        for n in (1, 2):
            for i in range(len(s) - n + 1):
                h = combine_hashes(*[
                    np.array([ord(c)], dtype=np.uint64)
                    for c in s[i:i + n]])
                want.append((r, int(to_bucket(h, B)[0])))
    got = sorted(zip(rows.tolist(), buckets.tolist()))
    assert got == sorted(want)


def test_heldout_accuracy(ray_session):
    import ray.data as rd

    train = _corpus(60, seed=10)
    test = _corpus(15, seed=99)
    model = fit_langid(rd.from_pandas(train).repartition(4),
                       num_buckets=2048, epochs=40)
    assert model["langs"] == sorted(VOCAB)
    assert model["loss_curve"][-1] < model["loss_curve"][0]
    scored = _collect(langid_scores(rd.from_pandas(test), model))
    acc = (scored["pred_lang"] == scored["lang"]).mean()
    assert acc >= 0.9
    # the no-stopword-profile language is handled (it not in STOPWORDS)
    from ner_ray.stages.textstats import STOPWORDS

    assert "it" not in STOPWORDS
    it = scored[scored.lang == "it"]
    assert (it["pred_lang"] == "it").mean() >= 0.8


def test_scoring_layout_independent(ray_session):
    import ray.data as rd

    train = _corpus(30, seed=3)
    model = fit_langid(rd.from_pandas(train), num_buckets=1024,
                       epochs=15)
    test = _corpus(10, seed=7)
    a = _collect(langid_scores(rd.from_pandas(test).repartition(1),
                               model)).sort_values("doc_id") \
        .reset_index(drop=True)
    b = _collect(langid_scores(rd.from_pandas(test).repartition(9),
                               model)).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert ((a["lang_prob"] > 0) & (a["lang_prob"] <= 1)).all()


def test_needs_two_labels(ray_session):
    import ray.data as rd

    one = pd.DataFrame({"doc_id": ["a"], "lang": ["en"],
                        "text": ["hello"]})
    with pytest.raises(ValueError, match="2 distinct labels"):
        fit_langid(rd.from_pandas(one))


def test_null_labels_are_dropped_not_mistrained(ray_session):
    import ray.data as rd

    from ner_ray.stages.langid import fit_langid

    # regression: pd.Index.get_indexer maps a null label to -1, which
    # fancy-indexes the LAST class — null rows trained as arbitrary
    # supervision. They must contribute nothing: a fit over labeled
    # rows + nulls must equal the fit over the labeled rows alone
    # (single block -> deterministic partial order -> bitwise equal).
    df = _corpus(20, seed=7)
    nulls = pd.DataFrame({
        "doc_id": [f"null-{i}" for i in range(30)],
        "lang": [None] * 30,
        "text": ["zzzz qqqq jjjj xxxx wwww"] * 30,
    })
    both = pd.concat([df, nulls], ignore_index=True)
    m_clean = fit_langid(rd.from_pandas(df), num_buckets=256, epochs=5)
    m_mixed = fit_langid(rd.from_pandas(both), num_buckets=256, epochs=5)
    assert m_mixed["langs"] == m_clean["langs"]
    np.testing.assert_allclose(m_mixed["W"], m_clean["W"], rtol=1e-12)
    np.testing.assert_allclose(m_mixed["b"], m_clean["b"], rtol=1e-12)
