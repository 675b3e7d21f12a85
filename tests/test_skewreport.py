"""skew_report: exact top counts, HLL accuracy, recommendation
triggers on planted hot keys."""

import numpy as np
import pyarrow as pa
import pytest


def test_hot_key_triggers_salt_recommendation(ray_session):
    import ray.data as rd

    from ner_ray.stages.skewreport import skew_report

    rng = np.random.default_rng(2)
    keys = np.concatenate([np.repeat("viral", 30_000),
                           rng.integers(0, 5_000, 20_000).astype(str)])
    rng.shuffle(keys)
    rep = skew_report(rd.from_arrow(pa.table({"k": keys})).repartition(6),
                      "k", k=5, hot_rows=10_000)
    assert rep["total_rows"] == 50_000
    assert rep["top"][0] == ("viral", 30_000)  # exact recount
    assert rep["top_certified"]
    assert rep["top1_share"] == pytest.approx(0.6)
    assert rep["recommendation"].startswith("salt:")
    assert abs(rep["distinct_keys"] - 5_001) / 5_001 < 0.05


def test_uniform_keys_ok(ray_session):
    import ray.data as rd

    from ner_ray.stages.skewreport import skew_report

    rng = np.random.default_rng(4)
    keys = rng.integers(0, 2_000, 40_000).astype(str)
    rep = skew_report(rd.from_arrow(pa.table({"k": keys})), "k", k=5)
    assert rep["recommendation"].startswith("ok:")
