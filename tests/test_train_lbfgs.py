"""A5 L-BFGS trainer: objective monotone under Armijo, beats-or-matches
SGD's held-out F1 on the tiny fixture, and the trained model serves
through the unmodified TaggerActor path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ner_ray.constants import LABELS


def _f1_of(weights, eval_rows, tiny_dir):
    import tempfile

    from ner_ray.evaluation.conll import evaluate_mentions
    from ner_ray.oracle.reference_oracle import bio_decode
    from ner_ray.stages.tagger import tag_spans
    from ner_ray.state.model import GAZ_VALUES, ModelBundle

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(weights.to_model_table(), f"{td}/model.parquet")
        bundle = ModelBundle.load(f"{td}/model.parquet",
                                  f"{tiny_dir}/alias.parquet")
    gid = bundle.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    texts = pd.Series([" ".join(r["tokens"]) for r in eval_rows],
                      dtype=object)
    mentions = tag_spans(texts, bundle, gaz_row)
    counts = np.diff(mentions.offsets.to_numpy(zero_copy_only=False))
    flat = mentions.flatten()
    row_of = np.repeat(np.arange(len(eval_rows)), counts)
    pred = [
        {"doc_id": eval_rows[r]["doc_id"],
         "span_idx": eval_rows[r]["span_idx"],
         "tok_begin": tb, "tok_end": te, "ne_type": nt}
        for r, tb, te, nt in zip(
            row_of, flat.field("tok_begin").to_pylist(),
            flat.field("tok_end").to_pylist(),
            flat.field("ne_type").to_pylist())
    ]
    gold = []
    for r in eval_rows:
        tags = [LABELS.index(t) for t in r["tags"]]
        for (b, e, typ) in bio_decode(tags):
            gold.append({"doc_id": r["doc_id"], "span_idx": r["span_idx"],
                         "tok_begin": b, "tok_end": e, "ne_type": typ})
    return evaluate_mentions(pred, gold).as_dict()["overall"]["f1"]


@pytest.mark.slow
def test_lbfgs_monotone_and_matches_sgd_f1(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.stages.train import train_lbfgs, train_sgd
    from tests.test_train import _training_table

    rows = _training_table(tiny_dir)[:200]
    split = int(len(rows) * 0.8)
    train_rows, eval_rows = rows[:split], rows[split:]
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    seq_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in train_rows]))

    w_lbfgs, hist = train_lbfgs(seq_ds, alias_types, iters=12,
                                batch_size=64, concurrency=(1, 2))
    objs = [h["mean_obj"] for h in hist]
    assert len(objs) >= 3, objs
    assert all(b <= a + 1e-9 for a, b in zip(objs, objs[1:])), objs
    assert objs[-1] < objs[0] * 0.5, objs  # real progress, not noise

    w_sgd, _ = train_sgd(seq_ds, alias_types, epochs=6, lr=0.5,
                         batch_size=64, concurrency=(1, 2))
    f1_lbfgs = _f1_of(w_lbfgs, eval_rows, tiny_dir)
    f1_sgd = _f1_of(w_sgd, eval_rows, tiny_dir)
    assert f1_lbfgs >= f1_sgd - 1e-9, (f1_lbfgs, f1_sgd)
    assert f1_lbfgs >= 0.9, f1_lbfgs


def _nnz(w):
    n = sum(int((w.weights[f] != 0).sum()) for f in w.weights)
    return n + int((w.trans != 0).sum()) + int((w.start != 0).sum())


@pytest.mark.slow
def test_owlqn_l1_is_monotone_and_sparser(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.stages.train import train_lbfgs, train_owlqn
    from tests.test_train import _training_table

    rows = _training_table(tiny_dir)[:120]
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    seq_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in rows]))

    w_l1, hist = train_owlqn(seq_ds, alias_types, iters=10, l1=0.005,
                             batch_size=64, concurrency=(1, 2))
    objs = [h["mean_obj"] for h in hist]
    assert len(objs) >= 3 and objs[-1] < objs[0], objs
    assert all(b <= a + 1e-9 for a, b in zip(objs, objs[1:])), objs

    w_l2, _ = train_lbfgs(seq_ds, alias_types, iters=10,
                          batch_size=64, concurrency=(1, 2))
    assert _nnz(w_l1) < _nnz(w_l2), (_nnz(w_l1), _nnz(w_l2))  # L1 sparsity


@pytest.mark.slow
def test_bcd_reduces_nll_blockwise(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.stages.train import train_bcd
    from tests.test_train import _training_table

    rows = _training_table(tiny_dir)[:120]
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    seq_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in rows]))
    w, history = train_bcd(seq_ds, alias_types, passes=3, lr=0.5,
                           batch_size=64, concurrency=(1, 2))
    nlls = [h["mean_nll"] for h in history]
    assert len(nlls) == 3
    assert nlls[-1] < nlls[0], nlls         # block updates make progress
    assert all(b <= a + 1e-9 for a, b in zip(nlls, nlls[1:])), nlls
    for fam in w.weights:
        assert (w.weights[fam][0] == 0).all()  # pad rows stay frozen
