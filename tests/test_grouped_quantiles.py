"""Grouped quantiles: per-group relative-error bound (approx),
DuckDB grouped quantile_disc equality (exact), layout independence."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

QS = [0.25, 0.5, 0.9]


@pytest.fixture()
def grouped_values(ray_session):
    rng = np.random.default_rng(11)
    n = 30_000
    return pa.table({
        "grp": rng.choice(["a", "b", "c", "d"], n),
        "v": np.concatenate([rng.lognormal(2, 1.5, n // 2),
                             -rng.lognormal(1, 1, n - n // 2)]),
    })


def _sorted_df(ds):
    return ds.to_pandas().sort_values("grp").reset_index(drop=True)


def _nearest_rank(x, q):
    s = np.sort(x)
    return s[min(max(int(np.ceil(q * len(s))), 1), len(s)) - 1]


def test_grouped_approx_error_bound(ray_session, grouped_values):
    import ray.data as rd

    from ner_ray.functions.aggregates import grouped_approx_quantile

    out = _sorted_df(grouped_approx_quantile(
        rd.from_arrow(grouped_values), "grp", "v", QS, alpha=0.01))
    df = grouped_values.to_pandas()
    for _, row in out.iterrows():
        x = df.loc[df["grp"] == row["grp"], "v"].to_numpy()
        for q, name in zip(QS, ["p25", "p50", "p90"]):
            true = _nearest_rank(x, q)
            assert abs(row[name] - true) <= 0.0105 * abs(true), \
                (row["grp"], q, row[name], true)


def test_grouped_exact_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.functions.aggregates import grouped_exact_quantile

    path = "/root/testdata/sf0.001/lineitem.parquet"
    got = grouped_exact_quantile(
        rd.read_parquet(path, columns=["l_returnflag", "l_quantity"]),
        "l_returnflag", "l_quantity", QS).to_pandas().rename(
            columns={"l_returnflag": "grp"}).sort_values("grp") \
        .reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT l_returnflag AS grp,
               quantile_disc(l_quantity, 0.25) AS p25,
               quantile_disc(l_quantity, 0.5)  AS p50,
               quantile_disc(l_quantity, 0.9)  AS p90
        FROM '{path}' GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(
        got[["grp", "p25", "p50", "p90"]].astype({c: float for c in
                                                  ("p25", "p50", "p90")}),
        want.astype({c: float for c in ("p25", "p50", "p90")}))


def test_grouped_approx_layout_independent(ray_session, grouped_values):
    import ray.data as rd

    from ner_ray.functions.aggregates import grouped_approx_quantile

    a = _sorted_df(grouped_approx_quantile(
        rd.from_arrow(grouped_values).repartition(1), "grp", "v", QS))
    b = _sorted_df(grouped_approx_quantile(
        rd.from_arrow(grouped_values).repartition(13), "grp", "v", QS))
    pd.testing.assert_frame_equal(a, b)
