"""pivot_agg: DuckDB PIVOT equality on real testdata + width guard."""

import duckdb
import numpy as np
import pandas as pd
import pytest

PATH = "/root/testdata/sf0.001/lineitem.parquet"


def test_pivot_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.functions.aggregates import pivot_agg

    ds = rd.read_parquet(
        PATH, columns=["l_returnflag", "l_linestatus", "l_quantity"])
    got = pivot_agg(ds, "l_returnflag", "l_linestatus", "l_quantity",
                    fn="sum").to_pandas() \
        .sort_values("l_returnflag").reset_index(drop=True)
    want = duckdb.sql(f"""
        PIVOT (SELECT l_returnflag, l_linestatus, l_quantity
               FROM '{PATH}')
        ON l_linestatus USING sum(l_quantity)
        ORDER BY l_returnflag
    """).df()
    assert sorted(got.columns) == sorted(want.columns)
    for c in want.columns:
        if c == "l_returnflag":
            assert got[c].tolist() == want[c].tolist()
        else:
            a = got[c].astype(float).to_numpy()
            b = want[c].astype(float).to_numpy()
            assert np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True)


def test_pivot_width_guard(ray_session):
    import ray.data as rd

    from ner_ray.functions.aggregates import pivot_agg

    ds = rd.read_parquet(PATH, columns=["l_returnflag", "l_orderkey",
                                        "l_quantity"])
    with pytest.raises(ValueError, match="distinct values"):
        pivot_agg(ds, "l_returnflag", "l_orderkey", "l_quantity",
                  max_pivot_values=50).to_pandas()
