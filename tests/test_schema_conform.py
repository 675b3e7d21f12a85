"""conform_schema / union_by_name: DuckDB UNION ALL BY NAME equality,
type promotion, fills, extra-column policy."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

A = pa.table({"doc_id": pa.array([1, 2], pa.int32()),
              "text": ["a", "b"],
              "lang": ["en", "fr"]})
B = pa.table({"text": ["c", "d"],
              "doc_id": pa.array([3, 4], pa.int64()),
              "score": pa.array([0.5, 0.7], pa.float64())})


def _sorted(df):
    return df.sort_values("doc_id").reset_index(drop=True) \
        .reindex(sorted(df.columns), axis=1)


def test_union_by_name_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.stages.schema import union_by_name

    got = union_by_name([rd.from_arrow(A), rd.from_arrow(B)]).to_pandas()
    con = duckdb.connect()
    con.register("a", A.to_pandas())
    con.register("b", B.to_pandas())
    want = con.sql("SELECT * FROM a UNION ALL BY NAME SELECT * FROM b").df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)
    # first-seen column order + int promotion
    assert list(got.columns) == ["doc_id", "text", "lang", "score"]
    assert got["doc_id"].dtype == "int64"


def test_conform_fill_and_extra_policy(ray_session):
    import ray.data as rd

    from ner_ray.stages.schema import conform_schema

    target = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    filled = conform_schema(rd.from_arrow(B), target,
                            fill={"lang": "und"}).to_pandas()
    assert filled["lang"].tolist() == ["und", "und"]
    assert list(filled.columns) == ["doc_id", "lang"]
    with pytest.raises(Exception, match="unexpected columns"):
        conform_schema(rd.from_arrow(B), target,
                       on_extra="raise").to_pandas()
    with pytest.raises(ValueError, match="fill keys"):
        conform_schema(rd.from_arrow(B), target, fill={"nope": 1})


def test_union_three_way_with_fill(ray_session):
    import ray.data as rd

    from ner_ray.stages.schema import union_by_name

    c = pa.table({"doc_id": pa.array([5], pa.int16())})
    got = union_by_name([rd.from_arrow(A), rd.from_arrow(B),
                         rd.from_arrow(c)],
                        fill={"lang": "und"}).to_pandas()
    assert len(got) == 5
    assert got.sort_values("doc_id")["lang"].tolist() == \
        ["en", "fr", "und", "und", "und"]
    assert got["score"].isna().sum() == 3
