"""Arrow-native broadcast_join (functions/joins.py J1):

* value-equality with a pandas-merge reference on scalar tables
  (inner + left, 1:N small-side multiplicity, string + int keys);
* nested ``list<struct>`` columns on BOTH sides survive the join
  byte-identically (the reason the operator is take-based: pandas
  mangles nested columns and Acero rejects nested non-key fields);
* unmatched left rows carry nulls; non-key name collisions raise.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.functions.joins import broadcast_join


def _collect(ds):
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow")))


def _big(n=200, seed=1):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": rng.integers(0, 12, n),
        "val": rng.normal(size=n),
        "spans": [[{"s": int(i), "e": int(i + 2), "kind": "X"}]
                  if i % 3 else [] for i in range(n)],
    })


SMALL = pd.DataFrame({
    "sk": [0, 1, 1, 2, 5, 7],          # key 1 is 1:N
    "label": ["a", "b1", "b2", "c", "f", "h"],
})


@pytest.mark.parametrize("how", ["inner", "left"])
def test_matches_pandas_reference(ray_session, how):
    import ray.data as rd

    big = _big()
    got = _collect(broadcast_join(
        rd.from_arrow(big).repartition(5), SMALL, "k", "sk", how=how)) \
        .to_pandas()
    want = big.select(["k", "val"]).to_pandas().merge(
        SMALL, how=how, left_on="k", right_on="sk")
    key = ["k", "val", "label"]
    g = got[["k", "val", "sk", "label"]].sort_values(key) \
        .reset_index(drop=True)
    w = want[["k", "val", "sk", "label"]].sort_values(key) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_nested_columns_roundtrip(ray_session):
    import ray.data as rd

    big = _big(60)
    small = pa.table({
        "sk": [0, 1, 5],
        "meta": [[{"x": 1}, {"x": 2}], [], [{"x": 9}]],
    })
    out = _collect(broadcast_join(rd.from_arrow(big), small, "k", "sk",
                                  how="inner"))
    assert out.schema.field("spans").type == big.schema.field("spans").type
    assert out.schema.field("meta").type == small.schema.field("meta").type
    # left nested payload untouched: compare against direct take
    kept = big.filter(pa.compute.is_in(
        big.column("k"), value_set=pa.array([0, 1, 5])))
    assert sorted(out.column("spans").to_pylist(), key=str) \
        == sorted(kept.column("spans").to_pylist(), key=str)
    by_k = dict(zip(small.column("sk").to_pylist(),
                    small.column("meta").to_pylist()))
    for k, meta in zip(out.column("k").to_pylist(),
                       out.column("meta").to_pylist()):
        assert meta == by_k[k]


def test_left_join_nulls_and_string_keys(ray_session):
    import ray.data as rd

    big = pa.table({"name": ["x", "y", "z", None], "v": [1, 2, 3, 4]})
    small = pd.DataFrame({"name2": ["y", "z"], "tag": ["Y", "Z"]})
    out = _collect(broadcast_join(rd.from_arrow(big), small, "name",
                                  "name2", how="left")).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert out["tag"].tolist() == [None, "Y", "Z", None]
    # inner drops unmatched + null keys
    inner = _collect(broadcast_join(rd.from_arrow(big), small, "name",
                                    "name2")).to_pandas()
    assert sorted(inner["v"].tolist()) == [2, 3]


def test_collision_and_how_validation(ray_session):
    import ray.data as rd

    big = pa.table({"k": [1], "label": ["dup"]})
    with pytest.raises(ValueError, match="inner/left"):
        broadcast_join(rd.from_arrow(big), SMALL, "k", "sk", how="outer")
    ds = broadcast_join(rd.from_arrow(big), SMALL, "k", "sk")
    with pytest.raises(Exception, match="label"):
        _collect(ds)


def test_same_key_name_keeps_one(ray_session):
    import ray.data as rd

    big = pa.table({"k": [1, 2], "v": [10, 20]})
    small = pd.DataFrame({"k": [2], "tag": ["two"]})
    out = _collect(broadcast_join(rd.from_arrow(big), small, "k", "k"))
    assert out.column_names == ["k", "v", "tag"]
    assert out.to_pylist() == [{"k": 2, "v": 20, "tag": "two"}]


def test_null_small_side_keys(ray_session):
    """Null keys on the BROADCAST side never match (SQL semantics) and
    must not crash key sorting. Regression: np.argsort over an object
    array with None raised TypeError at plan-build time."""
    import pandas as pd
    import ray.data as rd

    from ner_ray.functions.joins import broadcast_join

    left = rd.from_items([{"k": "a"}, {"k": "b"}, {"k": None}])
    dim = pd.DataFrame({"sk": ["a", None, None], "label": ["x", "y", "z"]})
    got = broadcast_join(left, dim, "k", "sk").to_pandas()
    assert got[["k", "label"]].values.tolist() == [["a", "x"]]
    got_left = broadcast_join(left, dim, "k", "sk", how="left").to_pandas()
    assert sorted(map(tuple, got_left[["k", "label"]].fillna("-").values)) \
        == [("-", "-"), ("a", "x"), ("b", "-")]
