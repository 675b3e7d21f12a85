"""Distributed BPE learning + encoding (stages/bpe.py):

* learn_bpe equals a brute-force single-process reference (the
  textbook Sennrich loop re-derived independently here) on random
  corpora — merges list identical, including tie-breaks;
* word_counts equals collections.Counter; the max_words cap keeps the
  top of the frequency table and logs dropped mass;
* encoding: applying the merges greedily reconstructs each word
  (round-trip through the end-of-word marker); encode of the training
  corpus only emits vocab symbols; memo-cache path == fresh path;
* layout independence of the learned merges; counts= reuse skips the
  counting pass; lowercase mode.
"""

import logging

import numpy as np
import pyarrow as pa
import pytest

from ner_ray.stages.bpe import (END, BpeEncoder, bpe_encode,
                                bpe_token_count, learn_bpe, word_counts)

_VOCAB = ["low", "lower", "lowest", "newer", "wider", "new", "widest"]


def _docs(n=30, seed=0):
    rng = np.random.default_rng(seed)
    return pa.Table.from_pylist(
        [{"doc_id": i, "text": " ".join(rng.choice(_VOCAB,
                                                   size=rng.integers(1, 9)))}
         for i in range(n)])


def _ref_learn(word_freqs: dict, vocab_size: int):
    """Independent naive reference: full pair recount every step."""
    words = {tuple(w) + (END,): f for w, f in word_freqs.items()}
    vocab = set(s for w in words for s in w)
    merges = []
    while len(vocab) < vocab_size:
        pairs = {}
        for syms, f in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        vocab.add(a + b)
        new_words = {}
        for syms, f in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def _freqs(tbl):
    from collections import Counter

    c = Counter()
    for t in tbl.column("text").to_pylist():
        c.update(t.split())
    return dict(c)


def test_learn_matches_reference(ray_session):
    import ray.data as rd

    for seed in (0, 1, 2):
        tbl = _docs(40, seed=seed)
        got = learn_bpe(rd.from_arrow(tbl).repartition(5),
                        vocab_size=30)
        want = _ref_learn(_freqs(tbl), 30)
        assert got["merges"] == want


def test_word_counts_and_cap(ray_session, caplog):
    import ray.data as rd

    tbl = _docs(25, seed=3)
    wc = word_counts(rd.from_arrow(tbl))
    from collections import Counter

    want = Counter(_freqs(tbl))
    assert dict(zip(wc["word"], wc["n"])) == dict(want)
    with caplog.at_level(logging.WARNING, logger="ner_ray.stages.bpe"):
        capped = word_counts(rd.from_arrow(tbl), max_words=3)
    assert len(capped) == 3
    top3 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(capped["word"], capped["n"])) == top3
    assert any("kept" in r.message for r in caplog.records)


def test_encode_roundtrip_and_vocab_closure(ray_session):
    import ray.data as rd

    tbl = _docs(30, seed=4)
    model = learn_bpe(rd.from_arrow(tbl), vocab_size=25)
    enc = bpe_encode(rd.from_arrow(tbl), model, concurrency=2)
    vocab = set(model["vocab"])
    rows = pa.concat_tables(
        list(enc.iter_batches(batch_format="pyarrow"))).to_pylist()
    for r in rows:
        toks = r["bpe_tokens"]
        assert set(toks) <= vocab
        # round-trip: concatenation restores the word stream
        rebuilt = "".join(toks).replace(END, " ").strip()
        assert rebuilt == r["text"]


def test_encoder_cache_equals_fresh():
    model = {"merges": [("l", "o"), ("lo", "w"), ("e", "r"),
                        ("er", END)]}
    enc = BpeEncoder(model)
    a = enc._tokens_for("lower")
    b = BpeEncoder(model)._tokens_for("lower")
    assert a == b == ("low", "er" + END)
    assert enc._tokens_for("lower") is a  # memo hit


def test_layout_independence_and_counts_reuse(ray_session):
    import ray.data as rd

    tbl = _docs(35, seed=5)
    m1 = learn_bpe(rd.from_arrow(tbl).repartition(1), vocab_size=28)
    m2 = learn_bpe(rd.from_arrow(tbl).repartition(9), vocab_size=28)
    assert m1["merges"] == m2["merges"]
    wc = word_counts(rd.from_arrow(tbl))
    m3 = learn_bpe(counts=wc, vocab_size=28)
    assert m3["merges"] == m1["merges"]
    with pytest.raises(ValueError, match="needs ds or counts"):
        learn_bpe(vocab_size=10)


def test_token_count_and_lowercase(ray_session):
    import ray.data as rd

    tbl = pa.Table.from_pylist([{"doc_id": 0, "text": "Low low LOW"},
                                {"doc_id": 1, "text": ""}])
    model = learn_bpe(rd.from_arrow(tbl), vocab_size=10, lowercase=True)
    out = pa.concat_tables(list(
        bpe_token_count(rd.from_arrow(tbl), model, lowercase=True,
                        concurrency=1)
        .iter_batches(batch_format="pyarrow"))).to_pylist()
    by_id = {r["doc_id"]: r["bpe_len"] for r in out}
    assert by_id[1] == 0 and by_id[0] > 0
    assert all(r.keys() == {"doc_id", "text", "bpe_len"} for r in out)
