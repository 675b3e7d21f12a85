"""A5 RProp trainer (iRprop-, cf. Wapiti src/rprop.c reconstructed):
sign-only adaptive-step training makes net objective progress without
a line search, accepts pattern files like every other trainer, and the
trained model serves a held-out F1 in SGD's league."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _split_rows(tiny_dir):
    import ray.data as rd

    from tests.test_train import _training_table

    rows = _training_table(tiny_dir)[:200]
    split = int(len(rows) * 0.8)
    train_rows, eval_rows = rows[:split], rows[split:]
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    seq_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in train_rows]))
    return seq_ds, eval_rows, alias_types


@pytest.mark.slow
def test_rprop_progress_and_f1(ray_session, tiny_dir):
    from ner_ray.stages.train import train_rprop
    from tests.test_train_lbfgs import _f1_of

    seq_ds, eval_rows, alias_types = _split_rows(tiny_dir)
    w, hist = train_rprop(seq_ds, alias_types, iters=18,
                          batch_size=64, concurrency=(1, 2))
    objs = [h["mean_obj"] for h in hist]
    assert len(objs) == 19, objs
    # no line search -> not strictly monotone, but net progress must be
    # real: the best iterate halves the initial objective and the FINAL
    # iterate (what the caller gets) keeps most of it
    assert min(objs) < objs[0] * 0.5, objs
    assert objs[-1] < objs[0] * 0.7, objs
    f1 = _f1_of(w, eval_rows, tiny_dir)
    assert f1 >= 0.85, f1


@pytest.mark.slow
def test_rprop_accepts_patterns(ray_session, tiny_dir):
    from ner_ray.functions.patterns import parse_pattern_file
    from ner_ray.stages.train import train_rprop

    seq_ds, _eval_rows, alias_types = _split_rows(tiny_dir)
    ps = parse_pattern_file("Ulow0:%x[0,low]\nUshape0:%x[0,shape]\nB\n")
    w, hist = train_rprop(seq_ds, alias_types, iters=3, batch_size=64,
                          concurrency=(1, 2), patterns=ps)
    assert set(w.weights) == {"low", "shape"}
    assert hist[-1]["mean_obj"] < hist[0]["mean_obj"], hist
