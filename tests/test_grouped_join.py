"""grouped_join / bucketed_hash_join: pandas-merge ground truth,
schema-promotion regression (extra columns on both sides), empty-side
buckets, and left-outer mode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.functions.joins import bucketed_hash_join, grouped_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": [f"k{i}" for i in rng.integers(0, 30, 200)],
        "lv": rng.integers(0, 100, 200),
        "ls": [f"l{i}" for i in range(200)],
    })
    right = pd.DataFrame({
        "k": [f"k{i}" for i in rng.integers(0, 40, 80)],
        "rv": rng.normal(size=80),
        "rs": [f"r{i}" for i in range(80)],
    })
    return left, right


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(
        sorted(df.columns)).reset_index(drop=True)


def test_bucketed_hash_join_extra_columns_both_sides(ray_session, frames):
    """Regression: the old pandas-merge implementation suffix-collided
    on the union's null-padded promoted columns when BOTH sides
    carried non-key columns, emitting lv_x/lv_y null junk."""
    import ray.data as rd

    left, right = frames
    got = bucketed_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                             "k", "k", num_buckets=4).to_pandas()
    exp = left.merge(right, on="k", how="inner")
    assert sorted(got.columns) == sorted(exp.columns)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))
    # dtypes survive (no pandas NaN/float coercion of int columns)
    assert got["lv"].dtype == exp["lv"].dtype


def test_grouped_join_left_outer_and_empty_side(ray_session, frames):
    import ray.data as rd

    left, right = frames
    ty = {"k": pa.string(), "lv": pa.int64(), "ls": pa.string(),
          "rv": pa.float64(), "rs": pa.string()}
    # right side filtered to nothing: every bucket sees only left rows
    empty_right = rd.from_pandas(right).filter(expr="rv > 1e18")
    got = grouped_join(rd.from_pandas(left), empty_right, "k", "k",
                       ["k", "lv", "ls"], ["k", "rv", "rs"], ty,
                       num_buckets=4, how="left outer").to_pandas()
    assert len(got) == len(left)
    assert got["rv"].isna().all()
    # inner with the empty side -> zero rows
    inner = grouped_join(rd.from_pandas(left), empty_right, "k", "k",
                         ["k", "lv", "ls"], ["k", "rv", "rs"], ty,
                         num_buckets=4).to_pandas()
    assert len(inner) == 0


def test_grouped_join_matches_dataset_join_keys(ray_session, frames):
    """Same rows as the Dataset.join-based hash_join (J2)."""
    import ray.data as rd

    from ner_ray.functions.joins import hash_join

    left, right = frames
    ty = {"k": pa.string(), "lv": pa.int64(), "ls": pa.string(),
          "rv": pa.float64(), "rs": pa.string()}
    a = grouped_join(rd.from_pandas(left), rd.from_pandas(right),
                     "k", "k", ["k", "lv", "ls"], ["k", "rv", "rs"],
                     ty, num_buckets=4).to_pandas()
    b = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  "k", "k", num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b[a.columns]))
