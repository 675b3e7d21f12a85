"""Pattern-file-driven training (A5 x M4): every trainer accepts a
Wapiti-style pattern file whose %x/%t/%m families replace the frozen
built-in layout; the exported model serves through the unmodified
tagger with the same pattern set (train/serve parity)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

PATTERN_TEXT = """
# custom layout: narrow %x set + one regex test + one extractor
Ulow-1:%x[-1,low]
Ulow0:%x[0,low]
Ushape0:%x[0,shape]
Usuf20:%x[0,suf2]
Utnum:%t[0,low,"^[0-9]+$"]
Umcap:%m[0,shape,"^(X+)"]
B
"""


def _seq_ds(tiny_dir: str):
    import ray.data as rd

    from tests.test_train import _training_table

    rows = _training_table(tiny_dir)
    return rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in rows])), rows


def _alias_types(tiny_dir: str) -> dict:
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    return dict(zip(alias_tbl.column("alias").to_pylist(),
                    alias_tbl.column("ne_type").to_pylist()))


def test_family_value_matches_tagger_semantics():
    """The trainer's per-token %t/%m values equal the tagger's pandas
    kernels (str.contains / str.extract) on the same inputs."""
    from ner_ray.functions.patterns import parse_pattern_file
    from ner_ray.oracle.reference_oracle import norm as _norm
    from ner_ray.stages.tagger import _family_values, normalize_series
    from ner_ray.stages.train import _family_value

    ps = parse_pattern_file(PATTERN_TEXT)
    toks = ["Paris", "42", "the", "McDonald", "A1-B2", "x", ""]
    uniq = pd.Series(toks, dtype=object)
    u_norm = normalize_series(uniq)
    for t in ps.tests:
        want = _family_values(t.template_id, uniq, u_norm, ps).tolist()
        got = [_family_value(t.template_id, tok, _norm(tok), ps.tests)
               for tok in toks]
        assert got == want, (t.template_id, got, want)


@pytest.mark.slow
def test_pattern_trained_model_serves(ray_session, tiny_dir):
    """train_sgd with a custom pattern file: NLL decreases, the model
    table contains %t/%m feature rows, and the exported model tags
    through the standard pipeline with the same pattern set."""
    from ner_ray.functions.patterns import parse_pattern_file
    from ner_ray.stages.tagger import tag_spans
    from ner_ray.stages.train import train_sgd
    from ner_ray.state.model import GAZ_VALUES, ModelBundle

    ps = parse_pattern_file(PATTERN_TEXT)
    seq_ds, rows = _seq_ds(tiny_dir)
    w, history = train_sgd(seq_ds, _alias_types(tiny_dir), epochs=4,
                           batch_size=64, concurrency=(1, 2), patterns=ps)
    assert set(w.weights) == set(ps.score_families)
    assert history[-1]["mean_nll"] < history[0]["mean_nll"]

    model_tbl = w.to_model_table()
    feats = model_tbl.column("feature").to_pylist()
    assert any(f.startswith("tnum:") for f in feats), "no %t features"
    assert any(f.startswith("mcap:") for f in feats), "no %m features"

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(model_tbl, f"{td}/model.parquet")
        bundle = ModelBundle.load(f"{td}/model.parquet",
                                  f"{tiny_dir}/alias.parquet",
                                  families=ps.score_families)
    # the pattern scores no gaz family -> the model has no gaz vocab;
    # the all-OOV row is the correct stand-in (tagger guards on
    # "gaz" in families before touching it)
    gid = bundle.value_ids.get("gaz", {})
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    texts = pd.Series([" ".join(r["tokens"]) for r in rows[:200]],
                      dtype=object)
    mentions = tag_spans(texts, bundle, gaz_row, pats=ps)
    assert len(mentions) == len(texts)
    n_mentions = int(np.diff(
        mentions.offsets.to_numpy(zero_copy_only=False)).sum())
    assert n_mentions > 0  # the pattern-trained model finds entities


@pytest.mark.slow
def test_perceptron_accepts_patterns(ray_session, tiny_dir):
    from ner_ray.functions.patterns import parse_pattern_file
    from ner_ray.stages.train import train_perceptron

    ps = parse_pattern_file("Ulow0:%x[0,low]\nUshape0:%x[0,shape]\nB\n")
    seq_ds, _rows = _seq_ds(tiny_dir)
    w, history = train_perceptron(seq_ds, _alias_types(tiny_dir),
                                  epochs=2, batch_size=64,
                                  concurrency=(1, 2), patterns=ps)
    assert set(w.weights) == {"low", "shape"}
    assert history[0]["errors"] > 0
