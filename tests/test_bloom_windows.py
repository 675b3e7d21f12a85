"""Bloom semi-join equivalence + sliding-window oracle parity."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_bloom_filter_basics():
    from ner_ray.functions.joins import BloomFilter

    bf = BloomFilter(n_bits=1 << 16)
    members = pd.Series([f"k{i}" for i in range(500)])
    bf.add(members)
    assert bf.might_contain(members).all()
    probes = pd.Series([f"absent{i}" for i in range(2000)])
    fp = bf.might_contain(probes).mean()
    assert fp < 0.05, fp  # false-positive rate stays low


@pytest.mark.parametrize("anti", [False, True])
def test_bloom_semi_join_equals_exact(ray_session, anti):
    import ray.data as rd

    from ner_ray.functions.joins import bloom_semi_join, semi_join

    c = rd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_name"])
    keys = list(range(1, 50)) + [999999]
    a = semi_join(c, keys, on="c_custkey", anti=anti).to_pandas()
    b = bloom_semi_join(
        rd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_name"]),
        keys, on="c_custkey", anti=anti).to_pandas()
    a = a.sort_values("c_custkey").reset_index(drop=True)
    b = b.sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sliding_window_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    ours = e.queries()["q_windows"](SF).to_pandas()
    ours = ours[ours["kind"] == "sliding"].drop(columns=["kind"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(e.oracle_sql()["q_windows"]).fetchdf()
    want = want[want["kind"] == "sliding"].drop(columns=["kind"])
    a = ours.sort_values(["user_id", "bucket"]).reset_index(drop=True)
    b = want.sort_values(["user_id", "bucket"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["user_id"].to_numpy() == b["user_id"].to_numpy()).all()
    assert (a["bucket"].to_numpy() == b["bucket"].to_numpy()).all()
    assert np.allclose(a["sum_value"], b["sum_value"], atol=1e-9)
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()


def test_asof_join_keyed_with_timestamps(ray_session):
    """Keyed as-of with datetime columns: typed-null schema
    harmonization must survive the union + groupby (review finding)."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from ner_ray.functions.joins import asof_join_keyed

    def ts(h):
        return dt.datetime(2020, 1, 1, h)

    left = rd.from_arrow(pa.table({
        "k": ["a", "a", "b", "c"],
        "lts": pa.array([ts(5), ts(9), ts(7), ts(1)], pa.timestamp("us")),
        "lval": [1, 2, 3, 4],
    }))
    right = rd.from_arrow(pa.table({
        "k": ["a", "a", "b"],
        "rts": pa.array([ts(4), ts(8), ts(9)], pa.timestamp("us")),
        "rval": [10.0, 20.0, 30.0],
    }))
    out = asof_join_keyed(left, right, "k", "lts", "rts").to_pandas()
    out = out.sort_values(["k", "lts"]).reset_index(drop=True)
    got = {(r["k"], r["lval"]): (None if pd.isna(r["rval"]) else r["rval"])
           for _, r in out.iterrows()}
    # a@5 -> rts 4 (10.0); a@9 -> rts 8 (20.0); b@7 -> no earlier right
    # row (NaN); c has no right rows at all -> kept with nulls (LEFT)
    assert got[("a", 1)] == 10.0
    assert got[("a", 2)] == 20.0
    assert got[("b", 3)] is None
    assert got[("c", 4)] is None  # left row kept, right cols null
