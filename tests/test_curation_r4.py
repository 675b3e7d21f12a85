"""Round-4 curation additions: scope-keyed exact dedup (per-domain),
token-budget downsampling, and idempotence of decontaminate /
cap_per_domain."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _ids(ds):
    return sorted(b for batch in ds.iter_batches(batch_format="pyarrow")
                  for b in batch.column("doc_id").to_pylist())


# -------------------------------------------- scope-keyed exact dedup


def _scoped_tbl():
    return pa.table({
        "doc_id": list(range(8)),
        "domain": ["a.com", "a.com", "b.com", "b.com",
                   "a.com", "b.com", "a.com", "b.com"],
        "text": ["same", "same", "same", "same",
                 "only-a", "only-b", "same", "uniq"],
    })


def test_exact_dedup_scoped_by_domain_matches_duckdb(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import exact_dedup_docs

    tbl = _scoped_tbl()
    out = exact_dedup_docs(rd.from_arrow(tbl), scope_cols=("domain",))
    expected = duckdb.connect().execute("""
        SELECT doc_id FROM tbl
        WHERE doc_id IN (SELECT min(doc_id) FROM tbl
                         GROUP BY domain, text)
        ORDER BY doc_id""").df()["doc_id"].tolist()
    assert _ids(out) == expected
    # 'same' survives once per domain (0 for a.com, 2 for b.com)
    assert 0 in expected and 2 in expected
    # global dedup keeps only one 'same' in total
    global_out = exact_dedup_docs(rd.from_arrow(tbl))
    assert 2 not in _ids(global_out)


# ------------------------------------------ token-budget downsampling


def _token_tbl(n=60, words_per_doc=10):
    doms = ["web", "books", "code"]
    return pa.table({
        "doc_id": list(range(n)),
        "source": [doms[i % 3] for i in range(n)],
        "text": [" ".join([f"w{j}" for j in range(words_per_doc)])
                 for i in range(n)],
    })


def test_token_counts_convention(ray_session):
    import ray.data as rd

    from ner_ray.stages.sampling import token_counts

    ds = rd.from_arrow(pa.table({
        "source": ["a", "a", "b", "b"],
        "text": ["one two three", "", None, "x"]}))
    assert token_counts(ds, key_col="source") == {"a": 3, "b": 1}
    assert token_counts(ds) == {"__all__": 4}


def test_token_budget_global_and_identity(ray_session):
    import ray.data as rd

    from ner_ray.stages.sampling import (
        _uniform01,
        downsample_to_token_budget,
    )

    tbl = _token_tbl()
    ds = rd.from_arrow(tbl)
    # budget >= total: identity at fraction 1.0
    full, fr = downsample_to_token_budget(ds, 10_000)
    assert fr == {"__all__": 1.0} and _ids(full) == list(range(60))
    # half budget: survivors are exactly the ids whose hash uniform is
    # below the computed fraction (deterministic, layout-independent)
    sampled, fr = downsample_to_token_budget(ds, 300)
    frac = fr["__all__"]
    assert frac == pytest.approx(0.5)
    u = _uniform01(tbl.column("doc_id"), 42)
    expected = sorted(np.flatnonzero(u < frac).tolist())
    assert _ids(sampled) == expected
    # layout independence
    again = downsample_to_token_budget(
        rd.from_arrow(tbl).repartition(7), 300)[0]
    assert _ids(again) == expected


def test_token_budget_per_domain(ray_session):
    import ray.data as rd

    from ner_ray.stages.sampling import (
        downsample_to_token_budget,
        token_counts,
    )

    tbl = _token_tbl()
    ds = rd.from_arrow(tbl)
    sampled, fr = downsample_to_token_budget(
        ds, {"web": 100, "books": 10_000}, key_col="source")
    # web: 200 tokens total -> frac 0.5; books capped at 1.0;
    # code absent from the dict -> untouched (frac 1.0)
    assert fr["web"] == pytest.approx(0.5)
    assert fr["books"] == 1.0 and fr["code"] == 1.0
    out = sampled.to_pandas()
    by = out.groupby("source").size()
    assert by["books"] == 20 and by["code"] == 20 and by["web"] < 20
    with pytest.raises(ValueError):
        downsample_to_token_budget(ds, {"web": -1}, key_col="source")
    with pytest.raises(ValueError):
        downsample_to_token_budget(ds, {"web": 1})   # dict w/o key_col


# ----------------------------------------------------- idempotence


def test_decontaminate_idempotent(ray_session):
    import ray.data as rd

    from ner_ray.stages.decontam import decontaminate

    ev = rd.from_arrow(pa.table(
        {"text": ["alpha bravo charlie delta echo"]}))
    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["alpha bravo charlie delta echo foxtrot",
                 "totally clean words here now"]}))
    once = decontaminate(docs, ev, n=5).materialize()
    twice = decontaminate(once, ev, n=5)
    assert _ids(once) == _ids(twice) == [1]


def test_cap_per_domain_idempotent(ray_session):
    import ray.data as rd

    from ner_ray.stages.urlfilter import cap_per_domain

    tbl = pa.table({
        "doc_id": list(range(40)),
        "domain": [f"d{i % 2}" for i in range(40)],
    })
    once = cap_per_domain(rd.from_arrow(tbl), 7).materialize()
    twice = cap_per_domain(once, 7)
    assert _ids(once) == _ids(twice)
    assert len(_ids(once)) == 14
