"""approx_topk: Misra-Gries candidates + exact recount — certified
equality with exact counts on skewed data, honest de-certification on
adversarial uniform data, layout independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def zipf_keys(ray_session):
    rng = np.random.default_rng(3)
    z = rng.zipf(1.5, 60_000)
    return pa.table({"k": np.char.add("key_", np.minimum(z, 5000).astype(str))})


def _exact_top(t, k):
    vc = pd.Series(t.column("k").to_pylist()).value_counts()
    return list(zip(vc.index[:k], vc.iloc[:k]))


def test_certified_equals_exact(ray_session, zipf_keys):
    import ray.data as rd

    from ner_ray.functions.aggregates import approx_topk

    out, certified, bound = approx_topk(
        rd.from_arrow(zipf_keys).repartition(9), "k", k=10, capacity=2048)
    assert certified, f"should certify on zipf data (bound={bound})"
    got = list(zip(out.column("k").to_pylist(),
                   out.column("count").to_pylist()))
    want = _exact_top(zipf_keys, 10)
    # counts must match exactly; key order ties broken arbitrarily
    assert [c for _, c in got] == [int(c) for _, c in want]
    assert dict(got) == {k: int(c) for k, c in want} or \
        sorted(got) == sorted((k, int(c)) for k, c in want)


def test_uniform_data_decertifies(ray_session, caplog):
    import ray.data as rd

    from ner_ray.functions.aggregates import approx_topk

    rng = np.random.default_rng(5)
    t = pa.table({"k": rng.integers(0, 20_000, 40_000).astype(str)})
    out, certified, bound = approx_topk(
        rd.from_arrow(t).repartition(8), "k", k=10, capacity=32)
    assert not certified  # uniform counts can't beat the MG bound
    assert bound > 0
    assert len(out) == 10  # still returns a best-effort table


def test_layout_independent_when_certified(ray_session, zipf_keys):
    import ray.data as rd

    from ner_ray.functions.aggregates import approx_topk

    a, ca, _ = approx_topk(rd.from_arrow(zipf_keys).repartition(1),
                           "k", k=5, capacity=4096)
    b, cb, _ = approx_topk(rd.from_arrow(zipf_keys).repartition(13),
                           "k", k=5, capacity=4096)
    assert ca and cb
    assert a.column("count").to_pylist() == b.column("count").to_pylist()
    assert sorted(a.column("k").to_pylist()) == \
        sorted(b.column("k").to_pylist())
