"""window_analytics: DuckDB OVER (PARTITION BY ... ORDER BY ...)
equality for row_number / lag / lead / cumsum / cummean."""

import duckdb
import numpy as np
import pandas as pd
import pytest

PATH = "/root/testdata/sf0.001/orders.parquet"


def test_window_analytics_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.functions.analytic import window_analytics

    ds = rd.read_parquet(
        PATH, columns=["o_custkey", "o_orderkey", "o_totalprice"])
    got = window_analytics(
        ds, "o_custkey", "o_orderkey",
        [("row_number", "", "rn"),
         ("lag", "o_totalprice", "prev_price"),
         ("lead", "o_totalprice", "next_price"),
         ("cumsum", "o_totalprice", "run_total"),
         ("cummean", "o_totalprice", "run_avg")]).to_pandas() \
        .sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               sum(o_totalprice) OVER (w ROWS UNBOUNDED PRECEDING)
                   AS run_total,
               avg(o_totalprice) OVER (w ROWS UNBOUNDED PRECEDING)
                   AS run_avg
        FROM '{PATH}'
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """).df()
    assert len(got) == len(want)
    assert got["rn"].tolist() == want["rn"].tolist()
    for c in ("prev_price", "next_price", "run_total", "run_avg"):
        assert np.allclose(got[c].astype(float), want[c].astype(float),
                           rtol=0, atol=1e-9, equal_nan=True), c


def test_unsupported_fn_raises(ray_session):
    import ray.data as rd

    from ner_ray.functions.analytic import window_analytics

    with pytest.raises(ValueError, match="unsupported"):
        window_analytics(rd.range(3), "id", "id", [("ntile", "id", "x")])
