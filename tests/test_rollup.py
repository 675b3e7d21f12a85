"""rollup_agg: DuckDB GROUP BY ROLLUP / CUBE equality including the
GROUPING() bitmask, on real testdata."""

import duckdb
import numpy as np
import pandas as pd
import pytest

PATH = "/root/testdata/sf0.001/lineitem.parquet"


def _got(cube=False):
    import ray.data as rd

    from ner_ray.functions.aggregates import rollup_agg

    ds = rd.read_parquet(
        PATH, columns=["l_returnflag", "l_linestatus", "l_quantity"])
    out = rollup_agg(ds, ["l_returnflag", "l_linestatus"],
                     [("l_quantity", "sum", "sum_qty"),
                      ("l_quantity", "count", "n")], cube=cube).to_pandas()
    return out.sort_values(
        ["grouping_id", "l_returnflag", "l_linestatus"],
        na_position="last").reset_index(drop=True)


def _want(cube=False):
    op = "CUBE" if cube else "ROLLUP"
    return duckdb.sql(f"""
        SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag,
               CAST(l_linestatus AS VARCHAR) AS l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(count(l_quantity) AS BIGINT) AS n,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                   AS grouping_id
        FROM '{PATH}'
        GROUP BY {op} (l_returnflag, l_linestatus)
        ORDER BY grouping_id, l_returnflag NULLS LAST,
                 l_linestatus NULLS LAST
    """).df()


@pytest.mark.parametrize("cube", [False, True])
def test_rollup_cube_matches_duckdb(ray_session, cube):
    got, want = _got(cube), _want(cube)
    assert len(got) == len(want)
    for c in ("l_returnflag", "l_linestatus"):
        assert got[c].fillna("∅").tolist() == want[c].fillna("∅").tolist()
    assert np.allclose(got["sum_qty"], want["sum_qty"], rtol=0, atol=1e-9)
    assert got["n"].tolist() == want["n"].tolist()
    assert got["grouping_id"].tolist() == want["grouping_id"].tolist()
