"""DSIR importance resampling (stages/dsir.py):

* hashed_ngram_counts / dsir_weights equal a single-process numpy
  reference (same hash, brute-force per-doc feature bags);
* planted distribution shift: raw docs written in the target's
  vocabulary out-weigh (and out-select) off-target docs;
* layout independence and materialize=False equality;
* selection fraction lands near the ask; gumbel=False is a hard
  top-fraction cut; seed changes the gumbel draw but not weights;
* validation guards.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.stages.dsir import (DEFAULT_BUCKETS, _feature_buckets,
                                 dsir_select, dsir_weights, fit_dsir,
                                 hashed_ngram_counts)
from ner_ray.util.hashing import combine_hashes, hash_column, to_bucket

_TGT = ["science", "theorem", "proof", "lemma", "axiom", "integral"]
_OFF = ["buy", "cheap", "click", "deal", "sale", "offer"]


def _mk_docs(rng, vocab, n, start_id, k=12):
    return [{"doc_id": start_id + i,
             "text": " ".join(rng.choice(vocab, size=k))}
            for i in range(n)]


def _ref_features(text, num_buckets, n=2):
    """Single-process reference feature bag of one doc."""
    words = text.split()
    if not words:
        return np.array([], dtype=np.int64)
    h = hash_column(pd.Series(words))
    b = [to_bucket(h, num_buckets)]
    if n >= 2 and len(h) > 1:
        b.append(to_bucket(combine_hashes(h[:-1], h[1:]), num_buckets))
    return np.concatenate(b)


def _weights_df(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_counts_and_weights_match_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    docs = _mk_docs(rng, _TGT + _OFF, 30, 0)
    tgt = _mk_docs(rng, _TGT, 10, 1000)
    B = 512
    raw_ds = rd.from_items(docs).repartition(4)
    tgt_ds = rd.from_items(tgt)

    got = hashed_ngram_counts(raw_ds, num_buckets=B)
    want = np.zeros(B)
    for d in docs:
        np.add.at(want, _ref_features(d["text"], B), 1.0)
    assert np.array_equal(got, want)

    model = fit_dsir(tgt_ds, raw_ds, num_buckets=B)
    wdf = _weights_df(dsir_weights(raw_ds, model))
    lr = model["log_ratio"]
    for _, r in wdf.iterrows():
        ref = lr[_ref_features(r["text"], B)].sum()
        assert r["dsir_logw"] == pytest.approx(ref, rel=1e-12)


def test_planted_shift_ranks_target_like_higher(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    on = _mk_docs(rng, _TGT, 25, 0)
    off = _mk_docs(rng, _OFF, 25, 100)
    raw = rd.from_items(on + off)
    tgt = rd.from_items(_mk_docs(rng, _TGT, 15, 1000))
    model = fit_dsir(tgt, raw, num_buckets=2048)
    wdf = _weights_df(dsir_weights(raw, model))
    on_w = wdf[wdf.doc_id < 100]["dsir_logw"]
    off_w = wdf[wdf.doc_id >= 100]["dsir_logw"]
    assert on_w.min() > off_w.max()
    # hard selection at 50% keeps exactly the on-target half
    kept = _weights_df(dsir_select(raw, model, 0.5, gumbel=False))
    assert set(kept.doc_id) == set(range(25))


def test_layout_independence_and_reread(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    docs = _mk_docs(rng, _TGT + _OFF, 60, 0)
    tgt = rd.from_items(_mk_docs(rng, _TGT, 10, 1000))
    model = fit_dsir(tgt, rd.from_items(docs), num_buckets=1024)
    a = _weights_df(dsir_select(rd.from_items(docs).repartition(1),
                                model, 0.4, seed=7))
    b = _weights_df(dsir_select(rd.from_items(docs).repartition(9),
                                model, 0.4, seed=7))
    assert a.doc_id.tolist() == b.doc_id.tolist()
    c = _weights_df(dsir_select(rd.from_items(docs), model, 0.4,
                                seed=7, materialize=False))
    assert a.doc_id.tolist() == c.doc_id.tolist()


def test_fraction_and_seed(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    docs = _mk_docs(rng, _TGT + _OFF, 300, 0)
    raw = rd.from_items(docs)
    tgt = rd.from_items(_mk_docs(rng, _TGT, 10, 9000))
    model = fit_dsir(tgt, raw, num_buckets=1024)
    kept = _weights_df(dsir_select(raw, model, 0.3, seed=1))
    assert 0.2 <= len(kept) / 300 <= 0.4
    other = _weights_df(dsir_select(raw, model, 0.3, seed=2))
    assert kept.doc_id.tolist() != other.doc_id.tolist()
    # weights themselves are seed-free
    w1 = _weights_df(dsir_weights(raw, model))
    assert (w1.columns == ["doc_id", "text", "dsir_logw"]).all()


def test_empty_and_guards(ray_session):
    import ray.data as rd

    raw = rd.from_items([{"doc_id": 0, "text": ""},
                         {"doc_id": 1, "text": "proof lemma"}])
    tgt = rd.from_items([{"doc_id": 9, "text": "proof theorem"}])
    model = fit_dsir(tgt, raw, num_buckets=256)
    wdf = _weights_df(dsir_weights(raw, model))
    assert wdf.loc[wdf.doc_id == 0, "dsir_logw"].iloc[0] == 0.0
    with pytest.raises(ValueError, match="fraction"):
        dsir_select(raw, model, 0.0)
    assert model["log_ratio"].shape == (256,)
    assert DEFAULT_BUCKETS == 10_000
    # unigram-only mode has no bigram features
    r, b = _feature_buckets(pa.array(["a b c"]), 64, n=1)
    assert len(b) == 3
