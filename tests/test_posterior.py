"""A2 forward-backward posteriors: brute-force enumeration check +
pipeline smoke over the tiny fixture."""

import itertools

import numpy as np
import pytest

from ner_ray.constants import N_LABELS
from ner_ray.stages.tagger import _posteriors_batch


def _brute_marginals(E, trans, start):
    T = E.shape[0]
    scores = {}
    for path in itertools.product(range(N_LABELS), repeat=T):
        s = start[path[0]] + E[0, path[0]]
        for t in range(1, T):
            s += trans[path[t - 1], path[t]] + E[t, path[t]]
        scores[path] = np.exp(s)
    Z = sum(scores.values())
    marg = np.zeros((T, N_LABELS))
    for path, p in scores.items():
        for t, y in enumerate(path):
            marg[t, y] += p
    return marg / Z


@pytest.mark.parametrize("seed,T", [(0, 1), (1, 2), (2, 3), (3, 4)])
def test_posteriors_match_brute_force(seed, T):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(T, N_LABELS))
    trans = rng.normal(size=(N_LABELS, N_LABELS))
    start = rng.normal(size=N_LABELS)
    seq_id = np.zeros(T, dtype=np.int64)
    pos = np.arange(T)
    lens = np.array([T])
    got = _posteriors_batch(E, seq_id, pos, lens, trans, start)
    want = _brute_marginals(E, trans, start)
    assert np.allclose(got, want, atol=1e-9)


def test_posteriors_ragged_batch():
    """Mixed-length sequences in one padded trellis must each match
    their standalone computation."""
    rng = np.random.default_rng(7)
    lens = np.array([3, 1, 4])
    N = int(lens.sum())
    E = rng.normal(size=(N, N_LABELS))
    trans = rng.normal(size=(N_LABELS, N_LABELS))
    start = rng.normal(size=N_LABELS)
    seq_id = np.repeat(np.arange(3), lens)
    starts = np.cumsum(lens) - lens
    pos = np.arange(N) - np.repeat(starts, lens)
    got = _posteriors_batch(E, seq_id, pos, lens, trans, start)
    for b in range(3):
        lo, L = starts[b], lens[b]
        solo = _posteriors_batch(E[lo:lo + L], np.zeros(L, dtype=np.int64),
                                 np.arange(L), np.array([L]), trans, start)
        assert np.allclose(got[lo:lo + L], solo, atol=1e-9)
    # rows are proper distributions
    assert np.allclose(got.sum(axis=1), 1.0, atol=1e-9)


def test_posterior_actor_pipeline(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.pipelines.flagship import mention_rows  # noqa: F401
    from ner_ray.stages.spans import flatten_text_spans
    from ner_ray.stages.tagger import PosteriorActor
    from ner_ray.state.model import put_bundle

    docs = rd.read_parquet(f"{tiny_dir}/docs.parquet")
    bundle = put_bundle(f"{tiny_dir}/model.parquet",
                        f"{tiny_dir}/alias.parquet")
    spans = docs.map_batches(flatten_text_spans, batch_format="pyarrow")
    out = spans.map_batches(
        PosteriorActor, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=(1, 2), num_cpus=1).to_pandas()
    assert len(out) > 5000  # one row per token
    assert out["post"].between(0, 1).all()
    # the +4/+10 gazetteer margins make decode confident (e^4/(e^4+8)
    # ~ 0.87 floor for O tokens, higher for gaz-flagged)
    assert out["post"].median() > 0.8
    assert out["post"].mean() > 0.8


@pytest.mark.parametrize("seed,T", [(0, 1), (4, 3), (5, 8), (6, 17)])
def test_oracle_marginals_match_batched_kernel(seed, T):
    """The golden-producing sequential forward-backward in the frozen
    oracle must agree with the distributed batched kernel (q_posterior
    value-matches the two after shared 6-dp rounding)."""
    from ner_ray.oracle.reference_oracle import posterior_marginals

    rng = np.random.default_rng(seed)
    E = rng.normal(size=(T, N_LABELS))
    trans = rng.normal(size=(N_LABELS, N_LABELS))
    start = rng.normal(size=N_LABELS)
    got = _posteriors_batch(E, np.zeros(T, dtype=np.int64), np.arange(T),
                            np.array([T]), trans, start)
    want = posterior_marginals(E, trans, start)
    assert np.allclose(got, want, atol=1e-12)
