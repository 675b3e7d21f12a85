"""URL/domain-level curation for web corpora (the C4 recipe's other
half): extract a registrable domain from a ``url`` column, drop
blocklisted domains (with subdomain suffix matching), and cap the
number of documents any single domain contributes (web corpora are
domain-skewed; a handful of mirror farms otherwise dominate the
training mixture).

Scale shape:
* domain extraction and the blocklist are map-only (the blocklist —
  at most ~1e5-1e6 entries — broadcasts once via ``ray.put``);
* per-domain caps run in two bounded passes: a per-batch partial
  top-``cap`` prunes every batch locally (a row outside its batch's
  smallest ``cap`` keys cannot be in the global smallest ``cap``), so
  the shuffle carries at most cap x n_blocks scalar (domain, key, id)
  rows per hot domain — never the corpus; the keep-id set is bounded
  by cap x #over-cap-domains and size-dispatches between a broadcast
  is_in filter and the bucketed semi filter (neardup.anti_filter_docs
  with anti=False).
* the keep decision orders rows by the seed-stable id-hash uniform
  (``order="hash"`` — a deterministic random sample of each hot
  domain, layout/cluster-size/retry independent, same contract as
  stages/sampling.py) or by plain id (``order="id"`` — SQL-replicable:
  row_number() OVER (PARTITION BY domain ORDER BY id) <= cap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.stages.sampling import _uniform01

MAX_DOMAIN_DEPTH = 10   # suffix-match iterations for subdomain rules


def extract_domain(urls: pd.Series) -> pd.Series:
    """Vectorized host extraction: strip scheme, userinfo, port and
    path; lowercase. Not a full RFC 3986 parser — the deterministic
    subset a curation blocklist needs."""
    s = urls.fillna("").astype(str).str.lower()
    s = s.str.replace(r"^[a-z][a-z0-9+.\-]*://", "", regex=True)
    s = s.str.replace(r"^[^/@?#]*@", "", regex=True)      # userinfo
    s = s.str.replace(r"[/?#].*$", "", regex=True)        # path/query
    s = s.str.replace(r":\d+$", "", regex=True)           # port
    return s


def add_domain_column(ds, url_col: str = "url",
                      domain_col: str = "domain"):
    """Append the extracted domain as a column (map-only)."""
    def fn(t: pa.Table) -> pa.Table:
        dom = extract_domain(t.column(url_col).to_pandas())
        return t.append_column(domain_col,
                               pa.array(dom.to_numpy(), pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _blocked_mask(domains: pd.Series, blocked: frozenset,
                  include_subdomains: bool) -> np.ndarray:
    """True where the domain (or, with include_subdomains, any of its
    dot-suffixes) is in the blocklist. Vectorized per suffix level:
    strip one leading label per iteration (<= MAX_DOMAIN_DEPTH)."""
    hit = domains.isin(blocked).to_numpy()
    if include_subdomains:
        cur = domains
        for _ in range(MAX_DOMAIN_DEPTH):
            cur = cur.str.partition(".")[2]
            alive = cur.str.len() > 0
            if not alive.any():
                break
            hit |= (cur.isin(blocked) & alive).to_numpy()
    return hit


def filter_blocklist(ds, blocked, url_col: str | None = "url",
                     domain_col: str | None = None,
                     include_subdomains: bool = True):
    """Drop rows whose domain is blocklisted. Pass ``domain_col`` if
    the domain is already a column, else ``url_col`` to extract it per
    batch. The blocklist broadcasts once (ray.put); the corpus streams
    through one map-only filter."""
    import ray

    blocked_ref = ray.put(frozenset(
        str(b).lower().lstrip(".") for b in blocked))

    def fn(t: pa.Table) -> pa.Table:
        bset = ray.get(blocked_ref)
        if domain_col is not None:
            dom = t.column(domain_col).to_pandas().fillna("")
        else:
            dom = extract_domain(t.column(url_col).to_pandas())
        return t.filter(pa.array(
            ~_blocked_mask(dom, bset, include_subdomains)))

    return ds.map_batches(fn, batch_format="pyarrow")


def cap_per_domain(ds, cap: int, domain_col: str = "domain",
                   id_col: str = "doc_id", seed: int = 42,
                   order: str = "hash",
                   max_broadcast_keeps: int | None = None,
                   num_buckets: int | None = None,
                   materialize: bool = True):
    """Keep at most ``cap`` rows per domain, deterministically: the
    ``cap`` rows with the smallest order key (seed-stable id-hash
    uniform for ``order="hash"``, the id itself for ``order="id"``;
    ties broken by id — a total order, so the result is independent of
    block layout, cluster size and retries). Domains at or under the
    cap pass through untouched. ``materialize=False`` is the re-read
    mode (the corpus is consumed by the count, candidate and filter
    passes)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if order not in ("hash", "id"):
        raise ValueError(f"order must be 'hash' or 'id': {order!r}")
    import ray
    from ray.data.aggregate import Sum

    from ner_ray.stages.neardup import MAX_BROADCAST_DROPS

    if max_broadcast_keeps is None:
        max_broadcast_keeps = MAX_BROADCAST_DROPS
    if materialize:
        ds = ds.materialize()

    # pass 1: exact per-domain counts (per-batch partials; only
    # (domain, n) scalars shuffle) -> the over-cap domain set, bounded
    # by total_rows/cap, broadcasts
    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select([domain_col]).group_by(domain_col).aggregate(
            [([], "count_all")])
        return g.rename_columns([domain_col, "n"])

    counts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby(domain_col).aggregate(Sum("n", alias_name="n"))
    over_batches = list(counts.filter(expr=f"n > {int(cap)}")
                        .iter_batches(batch_format="pyarrow"))
    over = (pa.concat_tables(over_batches, promote_options="default")
            .column(domain_col).combine_chunks()
            if over_batches else None)
    if over is None or len(over) == 0:
        return ds
    over_ref = ray.put(over)

    # pass 2: candidate keys for over-cap domains only, pruned to the
    # batch-local smallest cap per domain before the shuffle
    def order_key(t: pa.Table) -> np.ndarray:
        if order == "hash":
            return _uniform01(t.column(id_col), seed)
        return t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)

    from ner_ray.util.hashing import hash_column, to_bucket

    # coarse domain-hash buckets for the global-top-cap pass: one
    # map_groups call per DOMAIN would pay ~1 ms of dispatch per hot
    # domain (there can be millions over cap at corpus scale); one
    # call per bucket selects for thousands of domains vectorized
    sel_buckets = 64

    def candidates(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column(domain_col),
                        value_set=ray.get(over_ref))
        sub = t.filter(mask)
        df = pd.DataFrame({
            domain_col: sub.column(domain_col).to_pandas(),
            "_k": order_key(sub),
            id_col: sub.column(id_col).to_pandas(),
        })
        pruned = df.sort_values([domain_col, "_k", id_col],
                                kind="stable") \
            .groupby(domain_col, sort=False).head(cap)
        pruned["_sb"] = to_bucket(hash_column(pruned[domain_col]),
                                  sel_buckets)
        return pa.Table.from_pandas(pruned, preserve_index=False)

    def keep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([domain_col, "_k", id_col], kind="stable")
        return s.groupby(domain_col, sort=False).head(cap)[[id_col]]

    keeps = ds.map_batches(candidates, batch_format="pyarrow") \
        .groupby("_sb").map_groups(keep_bucket,
                                   batch_format="pandas") \
        .materialize()

    n_keeps = keeps.count()
    if n_keeps <= max_broadcast_keeps:
        ids = pa.concat_arrays(
            [b.column(id_col).combine_chunks()
             for b in keeps.iter_batches(batch_format="pyarrow")])
        keep_ref = ray.put(ids)

        def final(t: pa.Table) -> pa.Table:
            in_over = pc.is_in(t.column(domain_col),
                               value_set=ray.get(over_ref))
            kept = pc.is_in(t.column(id_col),
                            value_set=ray.get(keep_ref))
            return t.filter(pc.or_(pc.invert(in_over), kept))

        return ds.map_batches(final, batch_format="pyarrow")

    # bucketed path: split by over-cap membership; semi-filter the hot
    # side by keep id, union the cold side back (corpus shuffles once)
    from ner_ray.stages.neardup import anti_filter_docs

    def in_over_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(domain_col),
                                 value_set=ray.get(over_ref)))

    def out_over_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(
            t.column(domain_col), value_set=ray.get(over_ref))))

    hot = ds.map_batches(in_over_rows, batch_format="pyarrow")
    cold = ds.map_batches(out_over_rows, batch_format="pyarrow")
    kept_hot = anti_filter_docs(hot, keeps, drop_col=id_col,
                                id_col=id_col, anti=False,
                                num_buckets=num_buckets)
    return cold.union(kept_hot)
