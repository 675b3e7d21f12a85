"""Deterministic trainer == single-process oracle, bitwise.

Three claims behind the value-matched q_train_eval:
1. `train_perceptron(..., deterministic_buckets=B)` is independent of
   block layout (same weights/history for 1-block vs many-block input).
2. It equals the independent single-process replay
   (oracle/train_oracle.py) bit-for-bit, tensor by tensor.
3. The committed gold_train_metrics fixture equals the Ray-side
   metrics table (the exact comparison the driver gate runs via SQL).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _inputs(tiny_dir: str):
    from ner_ray.oracle.train_oracle import training_sequences

    rows = training_sequences(
        pq.read_table(f"{tiny_dir}/docs.parquet").to_pylist(),
        pq.read_table(f"{tiny_dir}/gold_mentions.parquet").to_pylist())
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    return rows, alias_types


def _ray_train(rows, alias_types, n_blocks: int):
    import ray.data as rd

    from ner_ray.oracle.train_oracle import (
        TRAIN_EVAL_BUCKETS,
        TRAIN_EVAL_EPOCHS,
    )
    from ner_ray.stages.train import train_perceptron

    seq_ds = rd.from_arrow(pa.Table.from_pylist(rows)) \
        .repartition(n_blocks)
    return train_perceptron(seq_ds, alias_types,
                            epochs=TRAIN_EVAL_EPOCHS,
                            deterministic_buckets=TRAIN_EVAL_BUCKETS)


def _assert_weights_equal(a, b):
    assert set(a.weights) == set(b.weights)
    for fam in a.weights:
        assert np.array_equal(a.weights[fam], b.weights[fam]), fam
    assert np.array_equal(a.trans, b.trans)
    assert np.array_equal(a.start, b.start)


@pytest.mark.slow
def test_layout_independent_and_matches_oracle(ray_session, tiny_dir):
    from ner_ray.oracle.train_oracle import oracle_train

    rows, alias_types = _inputs(tiny_dir)
    # subset keeps the three full trainings fast; still >1 per bucket
    rows = rows[:160]

    w1, h1 = _ray_train(rows, alias_types, n_blocks=1)
    w2, h2 = _ray_train(rows, alias_types, n_blocks=13)
    assert h1 == h2
    _assert_weights_equal(w1, w2)

    wo, ho = oracle_train(rows, alias_types)
    assert h1 == ho
    _assert_weights_equal(w1, wo)


@pytest.mark.slow
def test_golden_matches_ray_metrics(ray_session, tiny_dir):
    """Exactly the driver-gate comparison: q_train_eval's table vs the
    committed gold_train_metrics parquet, value for value."""
    from ner_ray.pipelines.queries_kg import q_train_eval

    got = q_train_eval(tiny_dir)
    gold = pq.read_table(f"{tiny_dir}/gold_train_metrics.parquet")
    assert got.schema == gold.schema
    assert got.to_pylist() == gold.to_pylist()
    m = got.to_pylist()[0]
    assert m["n_sequences"] > 100
    assert m["first_epoch_errors"] > 0
    assert m["weight_checksum"] > 0.0
