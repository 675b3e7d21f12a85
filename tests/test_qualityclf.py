"""Supervised quality classifier (stages/qualityclf.py):

* gradient partials match a single-process numpy reference (same
  features, same normalization) — the distributed fit IS full-batch
  logistic regression;
* separable planted data: positive-vocabulary docs score > 0.9,
  negative < 0.1 after training; loss curve decreases;
* pareto_filter: keeps essentially all high scorers, few low scorers,
  deterministic across layouts and sensitive to seed;
* empty docs and guards.
"""

import numpy as np
import pyarrow as pa
import pytest

from ner_ray.stages.qualityclf import (classifier_scores,
                                       fit_quality_classifier,
                                       pareto_filter)

_POS = ["theorem", "proof", "integral", "manifold", "tensor", "lemma"]
_NEG = ["click", "cheap", "casino", "winner", "jackpot", "prize"]


def _docs(vocab, n, start, seed):
    rng = np.random.default_rng(seed)
    return [{"doc_id": start + i,
             "text": " ".join(rng.choice(vocab, size=10))}
            for i in range(n)]


def _scores(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _ref_fit(pos_texts, neg_texts, num_buckets, n, epochs, lr, l2,
             seed):
    """Single-process reference: identical math on dense matrices."""
    from ner_ray.stages.qualityclf import _batch_design

    def design(texts):
        rows, buckets, vals = _batch_design(
            pa.array(texts, pa.string()), num_buckets, n)
        X = np.zeros((len(texts), num_buckets))
        X[rows, buckets] = vals
        return X

    Xp, Xn = design(pos_texts), design(neg_texts)
    X = np.vstack([Xp, Xn])
    y = np.concatenate([np.ones(len(Xp)), np.zeros(len(Xn))])
    rng = np.random.default_rng(seed)
    w = rng.normal(scale=1e-3, size=num_buckets)
    b = 0.0
    m = np.zeros(num_buckets + 1)
    v = np.zeros(num_buckets + 1)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    for step in range(1, epochs + 1):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.concatenate([X.T @ err, [err.sum()]]) / len(y)
        g[:num_buckets] += l2 * w
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        mh = m / (1 - beta1 ** step)
        vh = v / (1 - beta2 ** step)
        upd = lr * mh / (np.sqrt(vh) + eps)
        w = w - upd[:num_buckets]
        b = b - upd[num_buckets]
    return w, b


def test_fit_matches_reference(ray_session):
    import ray.data as rd

    pos = _docs(_POS, 12, 0, 1)
    neg = _docs(_NEG, 12, 100, 2)
    model = fit_quality_classifier(
        rd.from_items(pos).repartition(3),
        rd.from_items(neg).repartition(2),
        num_buckets=256, epochs=5, lr=0.3)
    w, b = _ref_fit([d["text"] for d in pos], [d["text"] for d in neg],
                    256, 2, 5, 0.3, 1e-6, 0)
    assert np.allclose(model["w"], w, atol=1e-10)
    assert model["b"] == pytest.approx(b, abs=1e-10)


def test_separable_and_loss_decreases(ray_session):
    import ray.data as rd

    pos = rd.from_items(_docs(_POS, 30, 0, 3))
    neg = rd.from_items(_docs(_NEG, 30, 100, 4))
    model = fit_quality_classifier(pos, neg, num_buckets=512,
                                   epochs=25)
    assert model["loss_curve"][-1] < model["loss_curve"][0]
    mixed = rd.from_items(_docs(_POS, 10, 500, 5)
                          + _docs(_NEG, 10, 600, 6))
    s = _scores(classifier_scores(mixed, model))
    assert (s[s.doc_id < 600]["quality_score"] > 0.9).all()
    assert (s[s.doc_id >= 600]["quality_score"] < 0.1).all()


def test_pareto_filter(ray_session):
    import ray.data as rd

    pos = rd.from_items(_docs(_POS, 30, 0, 7))
    neg = rd.from_items(_docs(_NEG, 30, 100, 8))
    model = fit_quality_classifier(pos, neg, num_buckets=512,
                                   epochs=25)
    mixed_rows = _docs(_POS, 50, 1000, 9) + _docs(_NEG, 200, 2000, 10)
    kept = _scores(pareto_filter(rd.from_items(mixed_rows), model,
                                 alpha=9.0))
    hi = kept[kept.doc_id < 2000]
    lo = kept[kept.doc_id >= 2000]
    assert len(hi) >= 48          # high quality nearly always kept
    assert len(lo) <= 20          # low quality ~always dropped at a=9
    # heavier tail at alpha=3: P(keep | score~0) = 2^-3, so some of
    # the 200 low scorers survive — the rule is not a hard cliff
    soft = _scores(pareto_filter(rd.from_items(mixed_rows), model,
                                 alpha=3.0))
    n_lo_soft = (soft.doc_id >= 2000).sum()
    assert 5 <= n_lo_soft <= 80
    # layout independence + seed sensitivity
    again = _scores(pareto_filter(
        rd.from_items(mixed_rows).repartition(7), model, alpha=9.0))
    assert kept.doc_id.tolist() == again.doc_id.tolist()
    other = _scores(pareto_filter(rd.from_items(mixed_rows), model,
                                  alpha=3.0, seed=1))
    assert soft.doc_id.tolist() != other.doc_id.tolist()


def test_empty_docs_and_guards(ray_session):
    import ray.data as rd

    pos = rd.from_items([{"doc_id": 0, "text": "proof lemma"}])
    neg = rd.from_items([{"doc_id": 1, "text": ""}])
    model = fit_quality_classifier(pos, neg, num_buckets=64, epochs=2)
    s = _scores(classifier_scores(
        rd.from_items([{"doc_id": 5, "text": ""}]), model))
    assert 0.0 <= s["quality_score"].iloc[0] <= 1.0
    with pytest.raises(ValueError, match="alpha"):
        pareto_filter(pos, model, alpha=0.0)
