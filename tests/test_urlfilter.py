"""URL/domain curation (stages/urlfilter.py): domain extraction,
C4-style blocklist with subdomain suffix matching, and deterministic
per-domain caps — including DuckDB equivalence for the SQL-replicable
order="id" variant and layout independence for order="hash"."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ids(ds):
    return sorted(b for batch in ds.iter_batches(batch_format="pyarrow")
                  for b in batch.column("doc_id").to_pylist())


def test_extract_domain_cases():
    from ner_ray.stages.urlfilter import extract_domain

    urls = pd.Series([
        "https://WWW.Example.COM/path?q=1",
        "http://user:pw@sub.host.org:8080/x",
        "ftp://files.example.net",
        "bare.domain.io/path",
        "https://example.com",
        None,
    ])
    out = extract_domain(urls).tolist()
    assert out == ["www.example.com", "sub.host.org", "files.example.net",
                   "bare.domain.io", "example.com", ""]


def test_blocklist_subdomain_matching(ray_session):
    import ray.data as rd

    from ner_ray.stages.urlfilter import filter_blocklist

    rows = [
        {"doc_id": 0, "url": "http://spam.example.org/a"},
        {"doc_id": 1, "url": "http://deep.mirror.spam.example.org/b"},
        {"doc_id": 2, "url": "http://example.org/c"},      # parent: kept
        {"doc_id": 3, "url": "http://fine.example.com/d"},
        {"doc_id": 4, "url": "http://notspam.example.org/e"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = filter_blocklist(ds, ["spam.example.org"])
    assert _ids(out) == [2, 3, 4]
    # exact-only matching keeps the subdomain row
    exact = filter_blocklist(ds, ["spam.example.org"],
                             include_subdomains=False)
    assert _ids(exact) == [1, 2, 3, 4]


def test_blocklist_on_domain_column(ray_session):
    import ray.data as rd

    from ner_ray.stages.urlfilter import filter_blocklist

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "domain": ["a.bad.net", "good.net", None]}))
    out = filter_blocklist(ds, ["bad.net"], url_col=None,
                           domain_col="domain")
    assert _ids(out) == [1, 2]


def _domain_corpus(n=120, n_domains=4):
    rng = np.random.default_rng(5)
    doms = [f"d{i}.example.com" for i in range(n_domains)]
    # skew: domain 0 gets most rows
    weights = np.array([0.6, 0.25, 0.1, 0.05])
    return pa.table({
        "doc_id": list(range(n)),
        "domain": [doms[i] for i in rng.choice(n_domains, size=n,
                                               p=weights)],
        "text": [f"doc {i}" for i in range(n)],
    })


def test_cap_per_domain_id_order_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from ner_ray.stages.urlfilter import cap_per_domain

    tbl = _domain_corpus()
    ds = rd.from_arrow(tbl)
    cap = 12
    out = cap_per_domain(ds, cap, order="id")
    expected = duckdb.connect().execute(f"""
        SELECT doc_id FROM (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY domain
                                    ORDER BY doc_id) AS rn
          FROM tbl) WHERE rn <= {cap} ORDER BY doc_id
    """).df()["doc_id"].tolist()
    assert _ids(out) == expected


def test_cap_per_domain_hash_order_properties(ray_session):
    import ray.data as rd

    from ner_ray.stages.urlfilter import cap_per_domain

    tbl = _domain_corpus()
    cap = 10
    a = _ids(cap_per_domain(rd.from_arrow(tbl), cap))
    # layout independence: different block structure, same survivors
    b = _ids(cap_per_domain(rd.from_arrow(tbl).repartition(13), cap))
    assert a == b
    # per-domain counts: hot domains exactly at cap, cold untouched
    df = tbl.to_pandas()
    kept = df[df["doc_id"].isin(a)]
    pre = df.groupby("domain").size()
    post = kept.groupby("domain").size().reindex(pre.index, fill_value=0)
    for dom in pre.index:
        assert post[dom] == min(pre[dom], cap)
    # different seed -> (almost surely) different survivor set
    c = _ids(cap_per_domain(rd.from_arrow(tbl), cap, seed=7))
    assert c != a


def test_cap_per_domain_paths_and_edges(ray_session):
    import ray.data as rd

    from ner_ray.stages.urlfilter import cap_per_domain

    tbl = _domain_corpus()
    ds = rd.from_arrow(tbl)
    broad = _ids(cap_per_domain(ds, 8))
    bucketed = _ids(cap_per_domain(ds, 8, max_broadcast_keeps=0,
                                   num_buckets=4))
    assert broad == bucketed
    # cap above every domain size: identity
    assert _ids(cap_per_domain(ds, 10_000)) == list(range(120))
    with pytest.raises(ValueError):
        cap_per_domain(ds, 0)
    with pytest.raises(ValueError):
        cap_per_domain(ds, 5, order="rand")


def test_cap_per_domain_reread_mode(ray_session):
    import ray.data as rd

    from ner_ray.stages.urlfilter import cap_per_domain

    tbl = _domain_corpus()
    pinned = _ids(cap_per_domain(rd.from_arrow(tbl), 9,
                                 materialize=True))
    reread = _ids(cap_per_domain(rd.from_arrow(tbl), 9,
                                 materialize=False))
    assert pinned == reread


def test_add_domain_column_then_blocklist_chain(ray_session):
    import ray.data as rd

    from ner_ray.stages.urlfilter import add_domain_column, filter_blocklist

    rows = [{"doc_id": i,
             "url": f"http://{'bad' if i % 3 == 0 else 'ok'}.site.net/{i}"}
            for i in range(9)]
    ds = add_domain_column(rd.from_arrow(pa.Table.from_pylist(rows)))
    out = filter_blocklist(ds, ["bad.site.net"], url_col=None,
                           domain_col="domain")
    assert _ids(out) == [1, 2, 4, 5, 7, 8]
