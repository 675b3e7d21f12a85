"""Quantile operators: DDSketch relative-error bound, exact
nearest-rank equality with DuckDB quantile_disc, layout independence,
and sign/zero handling."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.fixture()
def mixed_values(ray_session):
    rng = np.random.default_rng(7)
    x = np.concatenate([
        rng.lognormal(3.0, 2.0, 40_000),          # heavy positive tail
        -rng.lognormal(1.0, 1.5, 15_000),         # negatives
        np.zeros(500),                            # exact zeros
        np.repeat(rng.lognormal(3.0, 1.0, 10), 400),  # heavy duplicates
    ])
    rng.shuffle(x)
    return x


def _nearest_rank(x, q):
    s = np.sort(x)
    return s[min(max(int(np.ceil(q * len(s))), 1), len(s)) - 1]


def test_approx_quantile_relative_error(ray_session, mixed_values):
    import ray.data as rd

    from ner_ray.functions.aggregates import approx_quantile

    ds = rd.from_arrow(pa.table({"v": mixed_values}))
    est = approx_quantile(ds, "v", QS, alpha=0.01)
    for q, e in zip(QS, est):
        true = _nearest_rank(mixed_values, q)
        if true == 0:
            assert e == 0
        else:
            assert abs(e - true) / abs(true) <= 0.0105, (q, e, true)


def test_approx_quantile_layout_independent(ray_session, mixed_values):
    import ray.data as rd

    from ner_ray.functions.aggregates import approx_quantile

    t = pa.table({"v": mixed_values})
    a = approx_quantile(rd.from_arrow(t).repartition(1), "v", QS)
    b = approx_quantile(rd.from_arrow(t).repartition(17), "v", QS)
    assert a == b  # additive counts -> bit-identical, not just close


def test_exact_quantile_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.functions.aggregates import exact_quantile

    path = "/root/testdata/sf0.001/lineitem.parquet"
    ds = rd.read_parquet(path, columns=["l_quantity"])
    got = exact_quantile(ds, "l_quantity", QS)
    con = duckdb.connect()
    want = [con.sql(
        f"SELECT quantile_disc(l_quantity, {q}) FROM '{path}'"
    ).fetchone()[0] for q in QS]
    assert [float(g) for g in got] == [float(w) for w in want]


def test_exact_quantile_nulls_ignored(ray_session):
    import ray.data as rd

    from ner_ray.functions.aggregates import exact_quantile

    t = pa.table({"v": pa.array([3.0, None, 1.0, None, 2.0])})
    assert exact_quantile(rd.from_arrow(t), "v", [0.5]) == [2.0]


def test_grouped_approx_distinct(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ner_ray.functions.aggregates import grouped_approx_distinct

    rng = np.random.default_rng(9)
    t = pa.table({"g": rng.choice(["x", "y"], 50_000),
                  "v": rng.integers(0, 8_000, 50_000)})
    out = {r["g"]: r["approx_distinct"]
           for r in grouped_approx_distinct(
               rd.from_arrow(t).repartition(7), "g", "v").take_all()}
    import pandas as pd

    df = t.to_pandas()
    for g, sub in df.groupby("g"):
        true = sub["v"].nunique()
        assert abs(out[g] - true) / true < 0.05, (g, out[g], true)

    # register-wise-max merge => layout independent, bit-exact
    out2 = {r["g"]: r["approx_distinct"]
            for r in grouped_approx_distinct(
                rd.from_arrow(t).repartition(1), "g", "v").take_all()}
    assert out == out2


def test_grouped_approx_distinct_ignores_nan_counts_null_key(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ner_ray.functions.aggregates import grouped_approx_distinct

    # regression: the sparse rewrite briefly used pc.is_valid, which
    # kept float NaN as a countable value (the dense form's notna
    # dropped it — SQL semantics)
    t = pa.table({"g": ["a", "a", "a", "b"],
                  "v": pa.array([1.0, float("nan"), None, 2.0])})
    out = {r["g"]: r["approx_distinct"]
           for r in grouped_approx_distinct(
               rd.from_arrow(t), "g", "v").take_all()}
    assert out == {"a": 1, "b": 1}


def test_group_topk_keeps_null_key_group(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ner_ray.functions.aggregates import group_topk

    # regression: the map-side prune's pandas groupby silently dropped
    # NaN-key rows (dropna defaults True) before the shuffle
    df = pd.DataFrame({"g": [1.0, np.nan, 1.0, np.nan, 2.0],
                       "x": [5, 9, 3, 7, 1]})
    rows = group_topk(rd.from_pandas(df).repartition(3), "g", ["x"],
                      k=1).take_all()
    by_key = {("nan" if r["g"] != r["g"] else r["g"]): r["x"]
              for r in rows}
    assert by_key == {1.0: 5, 2.0: 1, "nan": 9}
