"""Entity co-occurrence counting + PMI scoring over linked mentions —
the statistical edge-weighting layer between entity linking (A4) and
graph construction (Q5): how strongly two entities associate, beyond
raw triple counts.

    pmi(a, b) = ln( n_pair(a,b) * n_docs / (n_doc(a) * n_doc(b)) )

computed at DOCUMENT granularity (an entity pair co-occurs once per
document regardless of mention multiplicity — the standard PMI-over-
documents formulation).

Scale design
------------
- Input is the flat (doc_id, entity_id) mention stream; a document's
  rows can straddle block boundaries, so pair generation shuffles by a
  doc-hash bucket and emits each doc's distinct-entity triu pairs with
  ONE vectorized _pair_indices call per bucket group (no per-doc
  Python). Per-doc pair count is quadratic in the doc's DISTINCT
  entity count — bounded by document length, not corpus size (the only
  safe place in this repo for an all-pairs).
- Pair counts reduce via per-batch partial counts + a fused int64
  pair-key groupby (the _distinct_pairs contract: Min/Max carry drops
  hash-collided groups instead of fabricating pairs).
- Per-entity document frequencies reduce the same way and broadcast
  for the final map-side PMI pass when driver-sized
  (<= max_broadcast_entities), with a grouped-join fallback above.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.functions.joins import grouped_join
from ner_ray.stages.neardup import _auto_buckets, _pair_indices
from ner_ray.util.hashing import hash_column, hash_columns, to_bucket

_S, _I, _F = pa.string(), pa.int64(), pa.float64()

MAX_BROADCAST_ENTITIES = 5_000_000


def _pairs_in_bucket(g: pa.Table, doc_col: str, ent_col: str) -> pa.Table:
    """Distinct-entity triu pairs per doc, vectorized across every doc
    in the bucket group (sort + run-length + one _pair_indices)."""
    empty = pa.schema([("e1", _S), ("e2", _S)]).empty_table()
    if len(g) == 0:
        return empty
    df = g.select([doc_col, ent_col]).to_pandas().drop_duplicates()
    df = df.sort_values([doc_col, ent_col], kind="stable")
    doc = df[doc_col].to_numpy()
    ent = df[ent_col].to_numpy()
    starts = np.concatenate([[0], np.nonzero(doc[1:] != doc[:-1])[0] + 1])
    sizes = np.diff(np.concatenate([starts, [len(doc)]]))
    ai, bi = _pair_indices(sizes, np.ones(len(sizes), dtype=bool))
    if len(ai) == 0:
        return empty
    return pa.table({"e1": pa.array(ent[ai], _S),
                     "e2": pa.array(ent[bi], _S)})


def _count_pairs(pairs_ds):
    """(e1, e2) rows -> (e1, e2, n_pair) via per-batch partials + one
    fused-key groupby."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("e1", _S), ("e2", _S), ("n", _I),
                              ("_k", _I)]).empty_table()
        g = t.group_by(["e1", "e2"]).aggregate([([], "count_all")])
        g = g.rename_columns(["e1", "e2", "n"])
        k = hash_columns(g.column("e1"), g.column("e2")).view(np.int64)
        return g.append_column("_k", pa.array(k))

    def drop_collisions(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t.column("e1"), t.column("_a")),
                       pc.equal(t.column("e2"), t.column("_b")))
        return t.filter(mask).select(["e1", "e2", "n_pair"])

    return pairs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(
            Min("e1", alias_name="e1"), Min("e2", alias_name="e2"),
            Max("e1", alias_name="_a"), Max("e2", alias_name="_b"),
            Sum("n", alias_name="n_pair")) \
        .map_batches(drop_collisions, batch_format="pyarrow")


def entity_doc_freq(links_ds, doc_col: str = "doc_id",
                    ent_col: str = "entity_id"):
    """(entity_id, n_doc): documents containing each entity."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([doc_col, ent_col]).to_pandas().drop_duplicates()
        c = df.groupby(ent_col, sort=False).size()
        return pa.table({ent_col: pa.array(c.index, _S),
                         "n": pa.array(c.to_numpy(np.int64))})

    # NOTE: per-batch distinct is a partial — the same doc's rows may
    # span batches, so finish distinctness by bucketing on the doc
    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bkt", pa.array(
            to_bucket(hash_column(t.column(doc_col)), 32)))

    def group_partial(g: pa.Table) -> pa.Table:
        return partial(g.drop_columns(["_bkt"]))

    return links_ds.select_columns([doc_col, ent_col]) \
        .map_batches(bucket, batch_format="pyarrow") \
        .groupby("_bkt").map_groups(group_partial,
                                    batch_format="pyarrow") \
        .groupby(ent_col).aggregate(Sum("n", alias_name="n_doc"))


def cooccurrence_pmi(links_ds, doc_col: str = "doc_id",
                     ent_col: str = "entity_id",
                     min_pair_count: int = 1,
                     num_buckets: int | None = None,
                     max_broadcast_entities: int = MAX_BROADCAST_ENTITIES):
    """(doc, entity) mention stream -> (e1, e2, n_pair, n_e1, n_e2,
    pmi) for every entity pair co-occurring in >= min_pair_count docs
    (e1 < e2 lexicographically)."""
    import ray

    if num_buckets is None:
        num_buckets = _auto_buckets(links_ds)
    links = links_ds.select_columns([doc_col, ent_col])

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bkt", pa.array(
            to_bucket(hash_column(t.column(doc_col)), num_buckets)))

    pairs = links.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_bkt").map_groups(
            lambda g: _pairs_in_bucket(g.drop_columns(["_bkt"]),
                                       doc_col, ent_col),
            batch_format="pyarrow")
    counts = _count_pairs(pairs)
    if min_pair_count > 1:
        counts = counts.filter(expr=f"n_pair >= {int(min_pair_count)}")

    n_docs = _distinct_doc_count(links, doc_col)
    freq = entity_doc_freq(links, doc_col, ent_col).materialize()
    if freq.count() <= max_broadcast_entities:
        ft = freq.to_pandas()
        order = np.argsort(ft[ent_col].to_numpy())
        ents = ft[ent_col].to_numpy()[order].astype("U")
        nds = ft["n_doc"].to_numpy()[order].astype(np.int64)
        ref = ray.put((ents, nds))

        def score(t: pa.Table, _ref=ref) -> pa.Table:
            if len(t) == 0:
                return pa.schema(
                    [("e1", _S), ("e2", _S), ("n_pair", _I),
                     ("n_e1", _I), ("n_e2", _I), ("pmi", _F)]
                ).empty_table()
            e, nd = ray.get(_ref)
            a = t.column("e1").to_numpy(zero_copy_only=False)
            b = t.column("e2").to_numpy(zero_copy_only=False)
            na = nd[np.searchsorted(e, a)]
            nb = nd[np.searchsorted(e, b)]
            npair = t.column("n_pair").to_numpy(zero_copy_only=False)
            pmi = np.log(npair.astype(np.float64) * n_docs
                         / (na.astype(np.float64) * nb))
            return pa.table({"e1": t.column("e1"), "e2": t.column("e2"),
                             "n_pair": t.column("n_pair"),
                             "n_e1": pa.array(na), "n_e2": pa.array(nb),
                             "pmi": pa.array(pmi)})

        return counts.map_batches(score, batch_format="pyarrow")

    # web-scale fallback: two grouped joins attach the frequencies
    f1 = freq.map_batches(lambda t: t.rename_columns(["e1", "n_e1"]),
                          batch_format="pyarrow")
    f2 = freq.map_batches(lambda t: t.rename_columns(["e2", "n_e2"]),
                          batch_format="pyarrow")
    ty = {"e1": _S, "e2": _S, "n_pair": _I, "n_e1": _I, "n_e2": _I}
    out = grouped_join(counts, f1, "e1", "e1", ["e1", "e2", "n_pair"],
                       ["e1", "n_e1"], ty, num_buckets=num_buckets)
    out = grouped_join(out, f2, "e2", "e2",
                       ["e1", "e2", "n_pair", "n_e1"], ["e2", "n_e2"],
                       ty, num_buckets=num_buckets)

    def score_joined(t: pa.Table) -> pa.Table:
        npair = t.column("n_pair").to_numpy(zero_copy_only=False)
        na = t.column("n_e1").to_numpy(zero_copy_only=False)
        nb = t.column("n_e2").to_numpy(zero_copy_only=False)
        pmi = np.log(npair.astype(np.float64) * n_docs
                     / (na.astype(np.float64) * nb.astype(np.float64)))
        return t.append_column("pmi", pa.array(pmi))

    return out.map_batches(score_joined, batch_format="pyarrow")


def _distinct_doc_count(links, doc_col: str) -> int:
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column(doc_col).combine_chunks())
        return pa.table({doc_col: u,
                         "n": pa.array(np.ones(len(u), np.int64))})

    # partial-unique per batch, then exact distinct via groupby
    return links.map_batches(partial, batch_format="pyarrow") \
        .groupby(doc_col).aggregate(Sum("n", alias_name="_n")).count()
