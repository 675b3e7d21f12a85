"""Document chunking (stages/chunking.py): window math against a
brute-force reference, DuckDB equivalence for the no-overlap form,
overlap semantics, reconstruction, and edge cases."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _chunks(ds):
    df = ds.to_pandas()
    return df.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def _mk(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows))


def _brute(rows, max_tokens, overlap):
    out = []
    stride = max_tokens - overlap
    for r in rows:
        w = r["text"].split()
        if not w:
            continue
        i, ci = 0, 0
        while True:
            win = w[i:i + max_tokens]
            out.append((r["doc_id"], ci, " ".join(win), len(win)))
            if i + max_tokens >= len(w):
                break
            i += stride
            ci += 1
    return out


@pytest.mark.parametrize("max_tokens,overlap", [(4, 0), (4, 1), (5, 2),
                                                (100, 0)])
def test_matches_brute_force(ray_session, max_tokens, overlap):
    from ner_ray.stages.chunking import chunk_documents

    rows = [
        {"doc_id": 0, "text": "a b c d e f g h i j"},
        {"doc_id": 1, "text": "one two three"},
        {"doc_id": 2, "text": "x"},
        {"doc_id": 3, "text": ""},
    ]
    got = _chunks(chunk_documents(_mk(rows), max_tokens, overlap))
    exp = _brute(rows, max_tokens, overlap)
    assert list(map(tuple, got[["doc_id", "chunk_idx", "text",
                                "n_tokens"]].to_numpy())) == exp


def test_no_overlap_matches_duckdb(ray_session):
    from ner_ray.stages.chunking import chunk_documents

    rows = [{"doc_id": i,
             "text": " ".join(f"w{i}_{j}" for j in range(3 + 5 * i))}
            for i in range(6)]
    got = _chunks(chunk_documents(_mk(rows), max_tokens=4))
    tbl = pa.Table.from_pylist(rows)  # noqa: F841  (duckdb scans it)
    exp = duckdb.connect().execute("""
        WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM tbl),
        c AS (SELECT doc_id,
                     unnest(range(0, CAST(ceil(len(ws) / 4.0) AS INT)))
                         AS chunk_idx, ws
              FROM w)
        SELECT doc_id, chunk_idx,
               array_to_string(ws[chunk_idx*4+1 : chunk_idx*4+4], ' ')
                   AS text,
               least(4, len(ws) - chunk_idx*4) AS n_tokens
        FROM c ORDER BY doc_id, chunk_idx
    """).df()
    assert got["text"].tolist() == exp["text"].tolist()
    assert got["n_tokens"].tolist() == exp["n_tokens"].astype(int).tolist()


def test_no_overlap_chunks_reconstruct_doc(ray_session):
    from ner_ray.stages.chunking import chunk_documents

    text = " ".join(f"t{i}" for i in range(23))
    got = _chunks(chunk_documents(_mk([{"doc_id": 7, "text": text}]),
                                  max_tokens=5))
    assert " ".join(got["text"]) == text
    assert got["n_tokens"].sum() == 23
    assert got["n_tokens"].iloc[:-1].eq(5).all()


def test_edges_and_validation(ray_session):
    from ner_ray.stages.chunking import chunk_documents

    ds = _mk([{"doc_id": 0, "text": None},
              {"doc_id": 1, "text": "only four words here"}])
    got = _chunks(chunk_documents(ds, max_tokens=10))
    assert got["doc_id"].tolist() == [1]        # null text dropped
    kept = _chunks(chunk_documents(ds, max_tokens=10, drop_empty=False))
    assert kept["doc_id"].tolist() == [0, 1]
    assert kept.loc[kept["doc_id"] == 0, "n_tokens"].iloc[0] == 0
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=4, overlap=4)


def test_layout_independent(ray_session):
    import ray.data as rd

    from ner_ray.stages.chunking import chunk_documents

    rows = [{"doc_id": i, "text": " ".join(["w"] * (7 + i))}
            for i in range(30)]
    a = _chunks(chunk_documents(_mk(rows), 5, 1))
    b = _chunks(chunk_documents(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(9), 5, 1))
    assert a.equals(b)
