"""normalize_text: DuckDB NFC+lower+collapse+trim equality on the
documents table, composed/decomposed convergence, NFKC folding,
idempotence, out_col."""

import unicodedata

import duckdb
import pyarrow as pa

PATH = "/root/testdata/sf0.001/documents.parquet"


def _run(ds, **kw):
    from ner_ray.stages.normalize import normalize_text

    return normalize_text(ds, **kw).to_pandas()


def test_matches_duckdb_on_documents(ray_session):
    import ray.data as rd

    got = _run(rd.read_parquet(PATH, columns=["doc_id", "text"]),
               lowercase=True).sort_values("doc_id")
    want = duckdb.sql(f"""
        SELECT doc_id,
               trim(regexp_replace(lower(nfc_normalize(text)),
                                   '\\s+', ' ', 'g')) AS text
        FROM read_parquet('{PATH}') ORDER BY doc_id
    """).df()
    assert got["text"].tolist() == want["text"].tolist()


def test_unicode_forms_converge(ray_session):
    import ray.data as rd

    composed = "café"
    decomposed = "café"
    wide = "Ｈｉ"  # fullwidth "Hi" — NFKC folds, NFC keeps
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [composed, decomposed, wide]})
    nfc = _run(rd.from_arrow(t))["text"].tolist()
    assert nfc[0] == nfc[1] == composed
    assert nfc[2] == wide
    nfkc = _run(rd.from_arrow(t), form="NFKC")["text"].tolist()
    assert nfkc[2] == unicodedata.normalize("NFKC", wide) == "Hi"


def test_whitespace_and_idempotence(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": [1], "text": ["  a\t\tb\n\nc  "]})
    once = _run(rd.from_arrow(t))["text"].tolist()
    assert once == ["a b c"]
    twice = _run(rd.from_arrow(
        pa.table({"doc_id": [1], "text": once})))["text"].tolist()
    assert twice == once


def test_out_col_preserves_original(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": [1], "text": ["A  B"]})
    df = _run(rd.from_arrow(t), lowercase=True, out_col="norm")
    assert df["text"].tolist() == ["A  B"]
    assert df["norm"].tolist() == ["a b"]


def test_clean_corpus_normalize_collapses_unicode_dups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ner_ray.pipelines.clean import clean_corpus

    base = "the quick brown fox jumps over the lazy dog near a caf"
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": [base + "é", base + "é",
                           "an entirely different english document here"]})
    kw = dict(min_words=1, min_uniq_ratio=0.0, langs=None)
    plain = clean_corpus(rd.from_arrow(t), **kw).to_pandas()
    assert len(plain) == 3  # byte-distinct -> both unicode variants kept
    normed = clean_corpus(rd.from_arrow(t), normalize="NFC",
                          **kw).to_pandas()
    assert sorted(normed["doc_id"]) == [1, 3]  # min-id survivor wins
