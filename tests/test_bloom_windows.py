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

    ours = e.queries()["q_window_sliding"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(e.oracle_sql()["q_window_sliding"]).fetchdf()
    a = ours.sort_values(["user_id", "bucket"]).reset_index(drop=True)
    b = want.sort_values(["user_id", "bucket"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["user_id"].to_numpy() == b["user_id"].to_numpy()).all()
    assert (a["bucket"].to_numpy() == b["bucket"].to_numpy()).all()
    assert np.allclose(a["sum_value"], b["sum_value"], atol=1e-9)
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()
