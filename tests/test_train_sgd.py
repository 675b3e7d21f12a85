"""CRF log-likelihood training: analytic gradient vs finite
differences, NLL monotonicity, and end-model accuracy."""

import numpy as np
import pyarrow as pa
import pytest

from ner_ray.constants import LABEL_INDEX, N_LABELS
from ner_ray.stages.train import (
    TrainWeights,
    _gaz_flags_for,
    _sequence_features,
    sequence_nll_gradient,
)


def _toy_weights():
    value_ids = {
        "low": {"alice": 1, "chen": 2, "maps": 3, "the": 4},
        "shape": {"x": 1}, "pre1": {"a": 1, "c": 2},
        "pre2": {"al": 1}, "pre3": {"ali": 1},
        "suf1": {"e": 1, "n": 2}, "suf2": {"ce": 1}, "suf3": {"ice": 1},
        "gaz": {"": 1, "B-PER": 2, "I-PER": 3, "B-ORG": 4, "I-ORG": 5,
                "B-LOC": 6, "I-LOC": 7, "B-MISC": 8, "I-MISC": 9},
    }
    w = TrainWeights.zeros(value_ids)
    rng = np.random.default_rng(3)
    for fam in w.weights:
        w.weights[fam] = rng.normal(scale=0.3, size=w.weights[fam].shape)
    w.trans = rng.normal(scale=0.3, size=(N_LABELS, N_LABELS))
    w.start = rng.normal(scale=0.3, size=N_LABELS)
    return w


def _nll_only(ids, gold, w):
    return sequence_nll_gradient(ids, gold, w)[0]


def test_gradient_matches_finite_differences():
    w = _toy_weights()
    tokens = ["alice", "chen", "maps", "the"]
    gold = np.array([LABEL_INDEX[t] for t in
                     ["B-PER", "I-PER", "O", "O"]])
    gaz = _gaz_flags_for(tokens, {"alice chen": "PER"})
    ids = _sequence_features(tokens, w.value_ids, gaz)
    nll, gw, gt, gs = sequence_nll_gradient(ids, gold, w)
    assert nll > 0
    eps = 1e-6
    rng = np.random.default_rng(7)
    # spot-check 20 random weight coordinates per tensor family
    for fam in ["low", "gaz", "suf1"]:
        W = w.weights[fam]
        for _ in range(10):
            idx = tuple(rng.integers(0, s) for s in W.shape)
            orig = W[idx]
            W[idx] = orig + eps
            up = _nll_only(ids, gold, w)
            W[idx] = orig - eps
            down = _nll_only(ids, gold, w)
            W[idx] = orig
            num = (up - down) / (2 * eps)
            assert abs(num - gw[fam][idx]) < 1e-5, (fam, idx, num,
                                                    gw[fam][idx])
    for _ in range(10):
        i, j = rng.integers(0, N_LABELS, 2)
        orig = w.trans[i, j]
        w.trans[i, j] = orig + eps
        up = _nll_only(ids, gold, w)
        w.trans[i, j] = orig - eps
        down = _nll_only(ids, gold, w)
        w.trans[i, j] = orig
        num = (up - down) / (2 * eps)
        assert abs(num - gt[i, j]) < 1e-5, ("trans", i, j, num, gt[i, j])
    for i in range(N_LABELS):
        orig = w.start[i]
        w.start[i] = orig + eps
        up = _nll_only(ids, gold, w)
        w.start[i] = orig - eps
        down = _nll_only(ids, gold, w)
        w.start[i] = orig
        num = (up - down) / (2 * eps)
        assert abs(num - gs[i]) < 1e-5, ("start", i, num, gs[i])


@pytest.mark.slow
def test_sgd_training_reduces_nll_and_learns(ray_session, tiny_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ner_ray.stages.train import train_sgd
    from tests.test_train import _training_table

    rows = _training_table(tiny_dir)[:150]
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    seq_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in rows]))
    w, history = train_sgd(seq_ds, alias_types, epochs=6, lr=0.5,
                           batch_size=64, concurrency=(1, 2))
    nlls = [h["mean_nll"] for h in history]
    assert nlls[-1] < nlls[0] * 0.5, nlls  # NLL at least halves
    # trained model decodes the training data well through the tagger
    import pandas as pd

    from ner_ray.stages.tagger import tag_spans
    from ner_ray.state.model import GAZ_VALUES, ModelBundle
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(w.to_model_table(), f"{td}/model.parquet")
        bundle = ModelBundle.load(f"{td}/model.parquet",
                                  f"{tiny_dir}/alias.parquet")
    gid = bundle.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    texts = pd.Series([" ".join(r["tokens"]) for r in rows], dtype=object)
    mentions = tag_spans(texts, bundle, gaz_row)
    assert len(mentions.flatten()) > 0


@pytest.mark.slow
def test_sgd_lr_decay_schedule(ray_session, tiny_dir):
    """lr_decay anneals the recorded step as lr/(1+decay*epoch) and
    training still reduces NLL."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ner_ray.stages.train import train_sgd
    from tests.test_train import _training_table

    rows = _training_table(tiny_dir)[:80]
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    seq_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in rows]))
    w, history = train_sgd(seq_ds, alias_types, epochs=4, lr=0.8,
                           lr_decay=0.5, batch_size=64,
                           concurrency=(1, 2))
    steps = [h["lr"] for h in history]
    assert steps == [round(0.8 / (1 + 0.5 * t), 6) for t in range(4)]
    assert history[-1]["mean_nll"] < history[0]["mean_nll"]
