"""Streaming profiler vs DuckDB ground truth on the driver tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.stages.profile import profile_table

SF_DIR = "/root/testdata/sf0.001"


def _duck_profile(path: str, col: str) -> dict:
    con = duckdb.connect()
    return con.sql(f"""
        SELECT count(*) AS count,
               count(*) - count({col}) AS nulls,
               count(DISTINCT {col}) AS distinct_exact,
               min({col}) AS vmin, max({col}) AS vmax,
               sum(TRY_CAST({col} AS DOUBLE)) AS vsum
        FROM read_parquet('{path}')
    """).df().iloc[0].to_dict()


@pytest.mark.parametrize("table,num_cols,str_cols", [
    ("documents", ["n_chars", "doc_id"], ["lang", "source"]),
    ("lineitem", ["l_quantity", "l_extendedprice", "l_orderkey"],
     ["l_returnflag", "l_linestatus"]),
])
def test_profile_matches_duckdb(ray_session, table, num_cols, str_cols):
    import ray.data as rd

    path = f"{SF_DIR}/{table}.parquet"
    ds = rd.read_parquet(path)
    prof = profile_table(ds).to_pandas().set_index("column")
    for c in num_cols + str_cols:
        d = _duck_profile(path, c)
        row = prof.loc[c]
        assert row["count"] == d["count"], c
        assert row["nulls"] == d["nulls"], c
        # HLL P=12 -> ~1.6% expected relative error
        assert abs(row["approx_distinct"] - d["distinct_exact"]) <= \
            max(3, 0.05 * d["distinct_exact"]), c
        if c in num_cols:
            assert row["num_min"] == pytest.approx(float(d["vmin"]))
            assert row["num_max"] == pytest.approx(float(d["vmax"]))
            assert row["num_sum"] == pytest.approx(float(d["vsum"]),
                                                   rel=1e-12)
            assert row["num_mean"] == pytest.approx(
                float(d["vsum"]) / (d["count"] - d["nulls"]), rel=1e-12)
        else:
            assert row["str_min"] == d["vmin"]
            assert row["str_max"] == d["vmax"]


def test_profile_temporal_and_nulls(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01", "2024-06-15", None]),
        "x": [1.5, None, 3.0],
        "s": [None, None, None],
    })
    df["s"] = df["s"].astype(object)
    t = pa.table({"ts": pa.array(df.ts), "x": pa.array(df.x),
                  "s": pa.array([None, None, None], pa.string())})
    prof = profile_table(rd.from_arrow(t)).to_pandas().set_index("column")
    assert prof.loc["ts", "nulls"] == 1
    assert prof.loc["ts", "str_min"].startswith("2024-01-01")
    assert prof.loc["ts", "approx_distinct"] == 2
    assert prof.loc["x", "num_sum"] == 4.5
    assert prof.loc["x", "num_mean"] == 2.25
    s = prof.loc["s"]
    assert s["count"] == 3 and s["nulls"] == 3
    assert s["approx_distinct"] is None or np.isnan(s["approx_distinct"])


def test_profile_nested_columns_counted_only(ray_session, small_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{small_dir}/docs.parquet")
    prof = profile_table(ds).to_pandas().set_index("column")
    row = prof.loc["spans"]  # list<struct> column
    assert row["count"] == ds.count()
    assert row["nulls"] == 0
    assert row["approx_distinct"] is None or np.isnan(
        row["approx_distinct"])


def test_profile_is_single_pass_partials(ray_session):
    """Partial rows per batch are O(columns): the shuffle payload for
    a 3-column table is exactly 3 partial rows per block."""
    import ray.data as rd

    from ner_ray.stages.profile import _batch_partials

    t = pa.table({"a": pa.array(range(100)),
                  "b": pa.array([f"v{i}" for i in range(100)]),
                  "c": pa.array(np.linspace(0, 1, 100))})
    p = _batch_partials(t, None)
    assert len(p) == 3
    assert p.column("regs")[0].as_py() != b""


def test_profile_quantiles_within_relative_error(ray_session):
    """p50/p95/p99 are DDSketch estimates: within 1% relative error of
    DuckDB's exact quantile_disc; null for non-numeric columns."""
    import duckdb

    import ray.data as rd

    from ner_ray.stages.profile import profile_table

    path = "/root/testdata/sf0.001/lineitem.parquet"
    prof = profile_table(
        rd.read_parquet(path, columns=["l_extendedprice", "l_returnflag"]))
    rows = {r["column"]: r for r in prof.to_pylist()}
    for name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
        true = duckdb.sql(
            f"SELECT quantile_disc(l_extendedprice, {q}) FROM '{path}'"
        ).fetchone()[0]
        est = rows["l_extendedprice"][name]
        assert abs(est - true) <= 0.0101 * abs(true), (name, est, true)
    assert rows["l_returnflag"]["p50"] is None


def test_profile_stddev_matches_duckdb(ray_session):
    import duckdb

    import ray.data as rd

    from ner_ray.stages.profile import profile_table

    path = "/root/testdata/sf0.001/lineitem.parquet"
    prof = profile_table(rd.read_parquet(path, columns=["l_quantity"]))
    got = prof.to_pylist()[0]["num_std"]
    want = duckdb.sql(
        f"SELECT stddev_pop(l_quantity) FROM '{path}'").fetchone()[0]
    assert abs(got - want) / want < 1e-9
