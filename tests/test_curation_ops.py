"""Round-3 curation additions: repetition signals (Gopher-shaped),
PII count/redaction, paragraph-granular corpus dedup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ner_ray.stages.textstats import (
    pii_batch,
    redact_pii_batch,
    repetition_batch,
)


def _rep_brute(text: str, n: int) -> tuple[float, float]:
    """(top_frac, dup_frac) for word n-grams, by definition."""
    w = text.split(" ")
    grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
    tot = max(len(grams), 1)
    if not grams:
        return 0.0, 0.0
    from collections import Counter

    c = Counter(grams)
    return max(c.values()) / tot, (len(grams) - len(c)) / tot


@pytest.mark.parametrize("text,exp_top2,exp_dup5", [
    ("a b a b a b", 0.6, None),            # "a b" fires 3 of 5 positions
    ("x", 0.0, 0.0),                        # too short for any n-gram
    ("", 0.0, 0.0),                         # empty text
    ("w1 w2 w3 w4 w5 w6 w7 w8", None, 0.0),  # all distinct
])
def test_repetition_matches_brute_force(text, exp_top2, exp_dup5):
    t = pa.table({"doc_id": [0], "text": [text]})
    out = repetition_batch(t)
    top2 = out.column("top2gram_frac")[0].as_py()
    dup5 = out.column("dup5gram_frac")[0].as_py()
    bt2, _ = _rep_brute(text, 2)
    _, bd5 = _rep_brute(text, 5)
    assert top2 == bt2 and dup5 == bd5
    if exp_top2 is not None:
        assert top2 == exp_top2
    if exp_dup5 is not None:
        assert dup5 == exp_dup5


def test_repetition_batch_is_per_doc():
    """Cross-doc n-grams must not leak: the same batch split across
    rows gives each row its own stats."""
    rep = "spam spam spam spam spam spam spam spam spam spam"
    uniq = "the quick brown fox jumps over a lazy dog today"
    out = repetition_batch(pa.table({"doc_id": [1, 2],
                                     "text": [rep, uniq]}))
    top2 = out.column("top2gram_frac").to_pylist()
    dup5 = out.column("dup5gram_frac").to_pylist()
    assert top2[0] == 1.0 and dup5[0] == 5 / 6
    assert top2[1] == 1 / 9 and dup5[1] == 0.0
    # batch of many docs == per-doc singleton batches
    texts = [rep, uniq, "", "a b a b c", "one two one two one"]
    big = repetition_batch(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    for i, txt in enumerate(texts):
        one = repetition_batch(pa.table({"doc_id": [0], "text": [txt]}))
        assert big.column("top2gram_frac")[i] == \
            one.column("top2gram_frac")[0]
        assert big.column("dup5gram_frac")[i] == \
            one.column("dup5gram_frac")[0]


def test_pii_counts_and_redaction():
    texts = [
        "mail me at jane.doe+x@example.org or j@x.co thanks",
        "call +1 (555) 123-4567 now",
        "server at 192.168.0.1 and 10.0.0.255 responded",
        "no pii here at all",
    ]
    t = pa.table({"doc_id": [0, 1, 2, 3], "text": texts})
    c = pii_batch(t)
    assert c.column("n_email").to_pylist() == [2, 0, 0, 0]
    assert c.column("n_phone").to_pylist() == [0, 1, 0, 0]
    assert c.column("n_ipv4").to_pylist() == [0, 0, 2, 0]
    r = redact_pii_batch(t).column("text").to_pylist()
    assert r[0] == "mail me at [EMAIL] or [EMAIL] thanks"
    assert "[PHONE]" in r[1] and "555" not in r[1]
    assert r[2] == "server at [IPV4] and [IPV4] responded"
    assert r[3] == texts[3]
    # payload columns pass through untouched
    t2 = t.append_column("source", pa.array(["s"] * 4))
    assert redact_pii_batch(t2).column("source").to_pylist() == ["s"] * 4
    # redacted text has no remaining PII
    again = pii_batch(redact_pii_batch(t))
    for col in ("n_email", "n_phone", "n_ipv4"):
        assert sum(again.column(col).to_pylist()) == 0


def _para_docs(rd, blocks=1):
    """Four docs sharing a boilerplate paragraph (and one intra-doc
    repeat); doc 40 is nothing but boilerplate."""
    boiler = "subscribe to our newsletter"
    rows = [
        {"doc_id": 10, "text": f"alpha one\n{boiler}\nalpha two"},
        {"doc_id": 20, "text": f"{boiler}\nbeta one\nbeta one"},
        {"doc_id": 30, "text": "gamma solo"},
        {"doc_id": 40, "text": boiler},
    ]
    ds = rd.from_items(rows)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_dedup_paragraphs_first_occurrence_wins(ray_session):
    import ray.data as rd

    out = {r["doc_id"]: r["text"]
           for r in ner_out(_para_docs(rd)).take_all()}
    # doc 10 holds the first global occurrence of the boilerplate
    assert out[10] == "alpha one\nsubscribe to our newsletter\nalpha two"
    # doc 20 loses the boilerplate AND its own internal repeat
    assert out[20] == "beta one"
    assert out[30] == "gamma solo"
    # doc 40 was only boilerplate -> dropped entirely
    assert 40 not in out


def ner_out(docs):
    from ner_ray.stages.neardup import dedup_paragraphs

    return dedup_paragraphs(docs)


def test_dedup_paragraphs_layout_independent_and_idempotent(ray_session):
    import ray.data as rd

    a = sorted(ner_out(_para_docs(rd, 1)).take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(ner_out(_para_docs(rd, 4)).take_all(),
               key=lambda r: r["doc_id"])
    assert a == b
    # idempotent: re-running on the output changes nothing
    again = sorted(ner_out(ner_out(_para_docs(rd))).take_all(),
                   key=lambda r: r["doc_id"])
    assert again == a


def test_dedup_paragraphs_noop_on_distinct_corpus(ray_session):
    """Driver docs have no newlines and no exact dups -> identity."""
    import ray.data as rd

    from ner_ray.stages.neardup import dedup_paragraphs

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    out = dedup_paragraphs(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    src = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.equals(src[["doc_id", "text"]])


def test_clean_corpus_repetition_caps(ray_session):
    import ray.data as rd

    from ner_ray.pipelines.clean import clean_corpus

    rows = [
        {"doc_id": 1, "text": "spam spam spam spam spam spam spam spam"},
        {"doc_id": 2, "text": "a perfectly normal sentence with words "
                              "that vary nicely across tokens here"},
    ]
    ds = rd.from_items(rows)
    kept = clean_corpus(ds, min_words=1, min_mean_word_len=0.0,
                        max_mean_word_len=99.0, min_uniq_ratio=0.0,
                        langs=None, dedup=False,
                        max_top2gram_frac=0.5).to_pandas()
    assert kept["doc_id"].tolist() == [2]


def test_pii_phone_not_grouped_numerics_or_dates():
    """The phone pattern must not rewrite ordinary numeric text:
    whitespace-grouped figures, ISO dates and dotted quads are not
    phones (RE2 has no lookahead, so the shape itself disambiguates)."""
    texts = [
        "sales were 1 200 000 in 2026 overall",
        "scores 12 34 56 78 end",
        "released 2026-08-17 and 1999-12-31",
        "versions 1.2.3 and 10.0.0.1 deployed",
        "call +1 (555) 123-4567 or 555-123-4567 today",
        "fax (0221)-123-456 works",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    c = pii_batch(t)
    assert c.column("n_phone").to_pylist() == [0, 0, 0, 0, 2, 1]
    r = redact_pii_batch(t).column("text").to_pylist()
    assert r[0] == texts[0] and r[1] == texts[1] and r[2] == texts[2]
    assert "[PHONE]" in r[4] and "555" not in r[4]


def test_dedup_paragraphs_keeps_blank_line_structure(ray_session):
    """Blank lines are layout, not content: every doc keeps its own
    empty paragraphs even though they hash identically corpus-wide."""
    import ray.data as rd

    from ner_ray.stages.neardup import dedup_paragraphs

    docs = rd.from_items([
        {"doc_id": 1, "text": "alpha\n\nbeta"},
        {"doc_id": 2, "text": "gamma\n\ndelta"},
        {"doc_id": 3, "text": "alpha\n\nepsilon"},
    ])
    out = {r["doc_id"]: r["text"]
           for r in dedup_paragraphs(docs).take_all()}
    assert out[1] == "alpha\n\nbeta"
    assert out[2] == "gamma\n\ndelta"          # blank line survives
    assert out[3] == "\nepsilon"               # only "alpha" deduped
