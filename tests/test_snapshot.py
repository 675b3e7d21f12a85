"""corpus_diff: DuckDB full-outer-join classification equality on a
mutated copy of the documents table, duplicate-id guard, unchanged
inclusion."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

PATH = "/root/testdata/sf0.001/documents.parquet"


def _snapshots():
    """old = the documents table; new = drop ids % 7 == 0, mutate text
    of ids % 5 == 0, add fresh ids."""
    import pyarrow.parquet as pq

    import numpy as np

    old = pq.read_table(PATH, columns=["doc_id", "text"])
    ids = old.column("doc_id").to_numpy()
    new = old.filter(pa.array(ids % 7 != 0))
    mut = pa.array(new.column("doc_id").to_numpy() % 5 == 0)
    txt = pc.if_else(mut,
                     pc.binary_join_element_wise(
                         new.column("text"), "MUTATED", " "),
                     new.column("text"))
    new = new.set_column(new.schema.get_field_index("text"), "text", txt)
    extra = pa.table({"doc_id": pa.array([900001, 900002], pa.int64()),
                      "text": pa.array(["brand new doc one",
                                        "brand new doc two"])})
    return old, pa.concat_tables([new.select(["doc_id", "text"]), extra])


def test_diff_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.stages.snapshot import corpus_diff

    old, new = _snapshots()
    got = corpus_diff(rd.from_arrow(old), rd.from_arrow(new),
                      include_unchanged=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("old", old.to_pandas())
    con.register("new", new.to_pandas())
    want = con.sql("""
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.text = n.text THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n USING (doc_id)
        ORDER BY doc_id
    """).df()
    assert got["doc_id"].tolist() == want["doc_id"].astype(int).tolist()
    assert got["status"].tolist() == want["status"].tolist()


def test_default_excludes_unchanged(ray_session):
    import ray.data as rd

    from ner_ray.stages.snapshot import corpus_diff

    old, new = _snapshots()
    out = corpus_diff(rd.from_arrow(old), rd.from_arrow(new)).to_pandas()
    assert set(out["status"]) == {"added", "removed", "changed"}


def test_duplicate_ids_raise(ray_session):
    import ray.data as rd

    from ner_ray.stages.snapshot import corpus_diff

    dup = pa.table({"doc_id": [1, 1], "text": ["a", "b"]})
    ok = pa.table({"doc_id": [1], "text": ["a"]})
    with pytest.raises(Exception, match="id-unique"):
        corpus_diff(rd.from_arrow(dup), rd.from_arrow(ok)).to_pandas()
