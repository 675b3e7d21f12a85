"""Range (interval) join vs a DuckDB brute-force oracle on the events
table — overlapping intervals, exact inclusive-bound semantics."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_range_join_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from ner_ray.functions.joins import range_join

    # overlapping intervals over the events value range
    iv = pd.DataFrame({
        "start": [0.0, 50.0, 100.0, 120.0, 400.0],
        "end": [60.0, 150.0, 130.0, 500.0, 450.0],
        "label": ["a", "b", "c", "d", "e"],
    })
    e = rd.read_parquet(f"{SF}/events.parquet",
                        columns=["event_id", "value"])
    got = range_join(e, iv, "value").to_pandas() \
        .sort_values(["event_id", "label"]).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    con.register("iv", iv)
    want = con.execute(
        "SELECT e.event_id, e.value, i.start, i.\"end\", i.label "
        "FROM events e JOIN iv i "
        "ON e.value BETWEEN i.start AND i.\"end\"").fetchdf() \
        .sort_values(["event_id", "label"]).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["label"].to_numpy() == want["label"].to_numpy()).all()
    assert np.allclose(got["value"], want["value"])


def test_range_join_empty_and_validation(ray_session):
    import ray.data as rd

    from ner_ray.functions.joins import range_join

    e = rd.read_parquet(f"{SF}/events.parquet",
                        columns=["event_id", "value"])
    none = range_join(
        e, pd.DataFrame({"start": [1e9], "end": [2e9], "label": ["x"]}),
        "value").to_pandas()
    assert len(none) == 0
    with pytest.raises(ValueError):
        range_join(e, pd.DataFrame({"start": [2.0], "end": [1.0],
                                    "label": ["bad"]}), "value")


def test_range_join_keyed_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from ner_ray.functions.joins import range_join_keyed

    # per-event_type interval sets with deliberately different widths
    # (the global-max_len pathology the keyed variant avoids)
    iv = pd.DataFrame({
        "event_type": ["click", "click", "view", "purchase"],
        "start": [0.0, 100.0, 0.0, 200.0],
        "end": [80.0, 5000.0, 20.0, 260.0],
        "label": ["c1", "c2", "v1", "p1"],
    })
    e = rd.read_parquet(f"{SF}/events.parquet",
                        columns=["event_id", "event_type", "value"])
    got = range_join_keyed(e, iv, "event_type", "value").to_pandas() \
        .sort_values(["event_id", "label"]).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    con.register("iv", iv)
    want = con.execute(
        "SELECT e.event_id, i.label FROM events e JOIN iv i "
        "ON e.event_type = i.event_type "
        "AND e.value BETWEEN i.start AND i.\"end\"").fetchdf() \
        .sort_values(["event_id", "label"]).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["label"].to_numpy() == want["label"].to_numpy()).all()
    # keys absent from the interval table match nothing
    types_kept = set(got["event_type"])
    assert types_kept <= {"click", "view", "purchase"}
