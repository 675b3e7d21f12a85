"""Graph analytics over the resolved triple store (Q5 extensions):
undirected distinct-pair edges, per-node triangle counts, 2-hop
neighborhood sizes, and iterative PageRank.

The north rule's KG build ends at adjacency lists; the first things a
KG consumer computes on top are exactly these: local clustering
evidence (triangles), neighborhood reach (k-hop counts), and entity
importance (PageRank).

Scale design
------------
- Every shuffle payload is id scalars (strings / fused int64 hash
  keys) — never edge lists or text.
- All joins here are GROUPED joins (bucket both sides by key hash,
  one Arrow-native join per bucket group): multiple Dataset.join
  operators in one streaming DAG can deadlock the executor when join
  aggregators exhaust the CPU budget (see SCALE.md "Join-DAG
  scheduling hazard"), and triangle counting needs three joins.
  Grouped joins are plain groupby shuffles — arbitrarily many compose
  in one DAG.
- Triangle counting uses degree-ordered edge orientation (Schank &
  Wagner 2005, "Finding, Counting and Listing All Triangles in Large
  Graphs"): each undirected edge points from its lower-(degree, id)
  endpoint to the higher, so oriented out-degree is O(sqrt(m)) and
  total wedge work is O(m^1.5) — the bound that survives power-law
  hubs (a hub's edges are oriented INTO it, so it emits no wedges).
  Wedges close against the oriented edge set with one fused-key
  grouped join + post-join string-equality filter (the
  _distinct_pairs collision contract: a 64-bit collision drops a
  candidate, never fabricates one).
- Wedge emission is bucketed + vectorized: oriented edges shuffle
  once by hash(src) bucket and each bucket group emits ALL its wedge
  pairs with one _pair_indices call — no per-src Python.
- 2-hop counts self-join the symmetric neighbor table on the middle
  node: inherently O(sum deg^2) candidate rows before dedup, so hubs
  dominate. ``max_mid_degree`` skips middle nodes over the cap with a
  LOGGED overflow count (no-silent-caps); the hub set is collected to
  the driver — by definition it is the tail of the degree
  distribution (a handful of nodes even at web scale). Default None =
  exact. Size dispatch mirrors triangles: driver-sized node tables
  broadcast a sorted label array and run everything on dense int64
  ids (candidates ship as ONE u*n+w code column, dedup is np.unique);
  both 2-hop shuffles are bucket-sized from the EXACT quadratic work
  sum(deg^2) computed on the driver from the degrees vector — sizing
  from edge bytes undersizes quadratic stages (measured 20.5 s -> 0.9
  s for the pair stage at sf0.1 on 32 CPUs).
- PageRank keeps the edge set as the large pinned dataset and the
  rank vector as a small (node, out_deg, rank) dataset re-derived per
  iteration: one grouped join (edges x ranks on src) + one
  groupby(dst) Sum per iteration; the left-outer "nodes without
  inbound mass" case is a union + groupby(node) merge, not a join;
  dangling mass is a driver scalar. Bulk-synchronous, one scalar-pair
  shuffle per iteration.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.functions.joins import grouped_join
from ner_ray.stages.neardup import (
    _auto_buckets,
    _distinct_pairs,
    _pair_indices,
)
from ner_ray.util.hashing import hash_column, hash_columns, to_bucket

logger = logging.getLogger(__name__)

_S, _I, _F = pa.string(), pa.int64(), pa.float64()

_EMPTY_COUNTS = pa.schema([("node", pa.string()), ("n", pa.int64())])


# --------------------------------------------------------------- edges


def undirected_edges(ds, src_col: str = "subj", dst_col: str = "obj"):
    """Directed (src, dst) rows -> distinct undirected node pairs
    (a < b lexicographically; self-loops dropped)."""

    def canon(t: pa.Table) -> pa.Table:
        a, b = t.column(src_col), t.column(dst_col)
        lt = pc.less(a, b)
        out = pa.table({"a": pc.if_else(lt, a, b), "b": pc.if_else(lt, b, a)})
        return out.filter(pc.not_equal(out.column("a"), out.column("b")))

    return _distinct_pairs(ds.map_batches(canon, batch_format="pyarrow"),
                           "a", "b")


def directed_edges(ds, src_col: str = "subj", dst_col: str = "obj"):
    """Distinct directed (src, dst) pairs, self-loops dropped."""

    def canon(t: pa.Table) -> pa.Table:
        out = pa.table({"src": t.column(src_col), "dst": t.column(dst_col)})
        return out.filter(
            pc.not_equal(out.column("src"), out.column("dst")))

    return _distinct_pairs(ds.map_batches(canon, batch_format="pyarrow"),
                           "src", "dst")


def _partial_counts(t: pa.Table, col: str) -> pa.Table:
    """Map-side combiner: per-batch counts, shuffling only (key, n)."""
    if len(t) == 0:
        return _EMPTY_COUNTS.empty_table()
    g = t.select([col]).group_by([col]).aggregate([([], "count_all")])
    return g.rename_columns(["node", "n"])


def node_degrees(edges_ds):
    """Undirected (a, b) pairs -> (node, degree). Partial per-batch
    counts shuffle, not edges."""
    from ray.data.aggregate import Sum

    def both(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t.column("a").combine_chunks(),
                                  t.column("b").combine_chunks()])
        return _partial_counts(pa.table({"node": nodes}), "node")

    return edges_ds.map_batches(both, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("n", alias_name="degree"))


# ----------------------------------------------------------- triangles


def _oriented_edges(edges_ds, degrees_ds, num_buckets: int):
    """Undirected (a, b) + (node, degree) -> (src, dst, dst_deg) with
    rank(src) < rank(dst) where rank = (degree, node)."""
    deg_a = degrees_ds.map_batches(
        lambda t: t.rename_columns(["a", "deg_a"]), batch_format="pyarrow")
    deg_b = degrees_ds.map_batches(
        lambda t: t.rename_columns(["b", "deg_b"]), batch_format="pyarrow")
    ty = {"a": _S, "b": _S, "deg_a": _I, "deg_b": _I}
    e = grouped_join(edges_ds, deg_a, "a", "a", ["a", "b"],
                     ["a", "deg_a"], ty, num_buckets=num_buckets)
    e = grouped_join(e, deg_b, "b", "b", ["a", "b", "deg_a"],
                     ["b", "deg_b"], ty, num_buckets=num_buckets)

    def orient(t: pa.Table) -> pa.Table:
        da, db = t.column("deg_a"), t.column("deg_b")
        a, b = t.column("a"), t.column("b")
        a_first = pc.or_(pc.less(da, db),
                         pc.and_(pc.equal(da, db), pc.less(a, b)))
        return pa.table({
            "src": pc.if_else(a_first, a, b),
            "dst": pc.if_else(a_first, b, a),
            "dst_deg": pc.if_else(a_first, db, da),
        })

    return e.map_batches(orient, batch_format="pyarrow")


def _wedges_in_bucket(t: pa.Table) -> pa.Table:
    """All (u, v, w) wedges of one src-hash bucket, vectorized: sort
    by (src, rank(dst)), run-length the src column, one _pair_indices
    call for every src group at once."""
    empty = pa.schema([("u", pa.string()), ("v", pa.string()),
                       ("w", pa.string())])
    if len(t) == 0:
        return empty.empty_table()
    idx = pc.sort_indices(t, sort_keys=[
        ("src", "ascending"), ("dst_deg", "ascending"),
        ("dst", "ascending")])
    t = t.take(idx)
    src = t.column("src").to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.nonzero(src[1:] != src[:-1])[0] + 1])
    sizes = np.diff(np.concatenate([starts, [len(t)]]))
    ai, bi = _pair_indices(sizes, np.ones(len(sizes), dtype=bool))
    if len(ai) == 0:
        return empty.empty_table()
    dst = t.column("dst").combine_chunks()
    return pa.table({
        "u": pa.array(src[ai]),
        "v": dst.take(pa.array(ai)),
        "w": dst.take(pa.array(bi)),
    })


def _sorted_node_degrees(degrees_ds):
    """Shared driver prologue of the broadcast graph paths: the
    (node, degree) table collected and label-sorted so that
    ``searchsorted`` rank-encoding is an exact bijection (ids are the
    label ranks, so id order == label order)."""
    dt = degrees_ds.to_pandas()
    order = np.argsort(dt["node"].to_numpy())
    labels = dt["node"].to_numpy()[order].astype("U")
    degs = dt["degree"].to_numpy()[order].astype(np.int64)
    return labels, degs


def _encode_ids(lab, col) -> np.ndarray:
    """Label column -> dense int64 rank ids against the sorted label
    vector (exact: every edge endpoint appears in the degree table)."""
    return np.searchsorted(
        lab, col.to_numpy(zero_copy_only=False).astype("U")
    ).astype(np.int64)


def _triangle_rows_broadcast(edges_ds, degrees_ds, num_buckets: int):
    """Fully int-encoded triangle listing for driver-sized node
    tables (the two_hop_counts broadcast recipe applied to triangles):
    orientation, wedge emission and the closing step all run on dense
    int64 ids; wedges ship as (u, v*n+w code) scalar pairs and the
    close is a per-bucket sorted-membership test against the oriented
    edge codes — EXACT (codes are a bijection; the undirected edge set
    is distinct), so the string-path's collision verify is unneeded.
    Quadratic stages are bucket-sized from the driver-computed wedge
    work bound sum(min(deg, sqrt(2m))^2)."""
    import ray

    labels, degs = _sorted_node_degrees(degrees_ds)
    n = len(labels)
    ref = ray.put((labels, degs))
    cap = np.sqrt(float(degs.sum()))          # oriented outdeg <= sqrt(2m)
    work = float((np.minimum(degs, cap).astype(np.float64) ** 2).sum())
    wedge_buckets = int(np.clip(work / 500_000, num_buckets, 65_536))
    join_buckets = int(np.clip(work / 1_000_000, num_buckets, 65_536))

    def orient_ids(t: pa.Table) -> pa.Table:
        lab, dg = ray.get(ref)
        a = _encode_ids(lab, t.column("a"))
        b = _encode_ids(lab, t.column("b"))
        da, db = dg[a], dg[b]
        # ids are label-sorted ranks, so id order == label order and
        # the (degree, label) tie-break is exactly (degree, id)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        return pa.table({
            "src": pa.array(src),
            "dst": pa.array(np.where(a_first, b, a)),
            "dd": pa.array(np.where(a_first, db, da)),
            "_bkt": pa.array(src % wedge_buckets),
        })

    def wedge_codes(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        dd = g.column("dd").to_numpy(zero_copy_only=False)
        o = np.lexsort((dst, dd, src))
        src, dst = src[o], dst[o]
        starts = np.concatenate(
            [[0], np.nonzero(src[1:] != src[:-1])[0] + 1])
        sizes = np.diff(np.concatenate([starts, [len(src)]]))
        ai, bi = _pair_indices(sizes, np.ones(len(sizes), dtype=bool))
        if len(ai) == 0:
            return pa.table({"u": pa.array([], _I),
                             "_c": pa.array([], _I),
                             "_b2": pa.array([], _I)})
        c = dst[ai] * n + dst[bi]
        return pa.table({"u": pa.array(src[ai]), "_c": pa.array(c),
                         "_b2": pa.array(c % join_buckets)})

    def edge_codes(t: pa.Table) -> pa.Table:
        c = (t.column("src").to_numpy(zero_copy_only=False) * n
             + t.column("dst").to_numpy(zero_copy_only=False))
        return pa.table({
            "u": pa.array(np.full(len(t), -1, np.int64)),  # edge marker
            "_c": pa.array(c),
            "_b2": pa.array(c % join_buckets),
        })

    oriented = edges_ds.map_batches(orient_ids, batch_format="pyarrow")
    wedges = oriented.groupby("_bkt").map_groups(
        lambda g: wedge_codes(g.drop_columns(["_bkt"])),
        batch_format="pyarrow")
    both = wedges.union(oriented.map_batches(edge_codes,
                                             batch_format="pyarrow"))

    def close(g: pa.Table) -> pa.Table:
        lab, _ = ray.get(ref)
        u = g.column("u").to_numpy(zero_copy_only=False)
        c = g.column("_c").to_numpy(zero_copy_only=False)
        is_edge = u < 0
        ec = np.unique(c[is_edge])
        wu, wc = u[~is_edge], c[~is_edge]
        if len(ec) == 0 or len(wc) == 0:
            return pa.schema(
                [("u", _S), ("v", _S), ("w", _S)]).empty_table()
        idx = np.searchsorted(ec, wc)
        hit = (idx < len(ec)) & (ec[np.minimum(idx, len(ec) - 1)] == wc)
        wu, wc = wu[hit], wc[hit]
        return pa.table({"u": pa.array(lab[wu], _S),
                         "v": pa.array(lab[wc // n], _S),
                         "w": pa.array(lab[wc % n], _S)})

    return both.groupby("_b2").map_groups(close, batch_format="pyarrow")


def triangle_rows(edges_ds, num_buckets: int | None = None,
                  max_broadcast_nodes: int | None = None):
    """Undirected distinct (a, b) pairs -> one (u, v, w) row per
    triangle, each triangle listed exactly once (u, v, w in
    (degree, id)-rank order). Size dispatch: driver-sized node tables
    take the int-encoded broadcast path (_triangle_rows_broadcast);
    above the cap, two grouped degree-attach joins orient and the
    string-keyed wedge/close chain runs (fused-key join + collision
    verify)."""
    if num_buckets is None:
        num_buckets = _auto_buckets(edges_ds)
    if max_broadcast_nodes is None:
        max_broadcast_nodes = MAX_BROADCAST_NODES
    degrees = node_degrees(edges_ds).materialize()
    n_nodes = degrees.count()
    if n_nodes == 0:
        empty = pa.schema([("u", _S), ("v", _S), ("w", _S)])
        return edges_ds.map_batches(lambda t: empty.empty_table(),
                                    batch_format="pyarrow")
    if n_nodes <= max_broadcast_nodes:
        return _triangle_rows_broadcast(edges_ds, degrees, num_buckets)
    oriented = _oriented_edges(edges_ds, degrees, num_buckets)

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bkt", pa.array(
            to_bucket(hash_column(t.column("src")), num_buckets)))

    wedges = oriented.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_bkt").map_groups(
            lambda t: _wedges_in_bucket(t.drop_columns(["_bkt"])),
            batch_format="pyarrow")

    def key_wedge(t: pa.Table) -> pa.Table:
        k = hash_columns(t.column("v"), t.column("w")).view(np.int64)
        return t.append_column("_k", pa.array(k))

    def key_edge(t: pa.Table) -> pa.Table:
        k = hash_columns(t.column("src"), t.column("dst")).view(np.int64)
        return pa.table({"_k": pa.array(k), "e_v": t.column("src"),
                         "e_w": t.column("dst")})

    closed = grouped_join(
        wedges.map_batches(key_wedge, batch_format="pyarrow"),
        oriented.map_batches(key_edge, batch_format="pyarrow"),
        "_k", "_k", ["u", "v", "w", "_k"], ["_k", "e_v", "e_w"],
        {"u": _S, "v": _S, "w": _S, "_k": _I, "e_v": _S, "e_w": _S},
        num_buckets=num_buckets)

    def verify(t: pa.Table) -> pa.Table:
        # fused-key equality stood in for pair identity; a collision
        # must drop the candidate, never fabricate a triangle
        mask = pc.and_(pc.equal(t.column("v"), t.column("e_v")),
                       pc.equal(t.column("w"), t.column("e_w")))
        return t.filter(mask).select(["u", "v", "w"])

    return closed.map_batches(verify, batch_format="pyarrow")


def triangle_counts(edges_ds, num_buckets: int | None = None):
    """(node, tri_count): triangles through each node. Nodes in no
    triangle are absent (callers left-join + fill 0)."""
    from ray.data.aggregate import Sum

    tri = triangle_rows(edges_ds, num_buckets=num_buckets)

    def explode(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t.column(c).combine_chunks()
                                  for c in ("u", "v", "w")])
        return _partial_counts(pa.table({"node": nodes}), "node")

    return tri.map_batches(explode, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("n", alias_name="tri_count"))


# -------------------------------------------------------------- k-hop


def two_hop_counts(edges_ds, num_buckets: int | None = None,
                   max_mid_degree: int | None = None,
                   max_broadcast_nodes: int | None = None):
    """(node, two_hop_count): distinct nodes within <=2 undirected
    hops of each node (the node itself excluded).

    Size dispatch (same contract as ``triangle_rows``): when the node
    table is driver-sized (<= ``max_broadcast_nodes``) the sorted label
    array broadcasts once and ALL candidate-pair work runs on dense
    int64 node ids — the O(sum deg^2) candidate set ships as ONE int64
    code column (u * n_nodes + w, an exact bijection) and dedup is a
    vectorized ``np.unique``, not string comparisons. Above the cap the
    string-keyed grouped-join path runs (per-bucket dictionary-encoded
    dedup), exact at any node count.

    ``max_mid_degree``: skip middle nodes whose degree exceeds the cap
    (hub fan-out control); the number of skipped middle nodes is
    LOGGED, and capping only UNDERcounts reach through mega-hubs —
    documented lossy mode, default exact."""
    if num_buckets is None:
        num_buckets = _auto_buckets(edges_ds)
    if max_broadcast_nodes is None:
        max_broadcast_nodes = MAX_BROADCAST_NODES
    degrees = node_degrees(edges_ds).materialize()
    n_nodes = degrees.count()
    if n_nodes == 0:
        empty = pa.schema([("node", _S), ("two_hop_count", _I)])
        return edges_ds.map_batches(lambda t: empty.empty_table(),
                                    batch_format="pyarrow")
    if n_nodes <= max_broadcast_nodes:
        return _two_hop_broadcast(edges_ds, degrees, num_buckets,
                                  max_mid_degree)
    return _two_hop_grouped(edges_ds, degrees, num_buckets,
                            max_mid_degree)


def _two_hop_broadcast(edges_ds, degrees_ds, num_buckets: int,
                       max_mid_degree: int | None):
    """Int-encoded exact 2-hop for driver-sized node tables. Two
    shuffles: sym adjacency by middle-id (pairs emitted per bucket via
    one vectorized block-Cartesian), then unique codes by source-id.
    Shuffle payloads are int64 scalars only."""
    import ray

    labels, degs = _sorted_node_degrees(degrees_ds)
    degs = degs.astype(np.float64)
    n = len(labels)
    hot_ids = np.array([], dtype=np.int64)
    if max_mid_degree is not None:
        hot_ids = np.flatnonzero(degs > int(max_mid_degree))
        if len(hot_ids):
            logger.warning(
                "two_hop_counts: skipping %d middle nodes over "
                "max_mid_degree=%d (reach through them is undercounted)",
                len(hot_ids), max_mid_degree)
            degs = degs.copy()
            degs[hot_ids] = 0.0
    # candidate-pair work is O(sum deg^2) — quadratic in degrees, so
    # the edge-table-sized num_buckets undersizes the pair stage badly
    # (16 groups of 2.5M pairs serialize on a 32-core node: measured
    # 20.5 s -> 0.9 s at sf0.1 after this). The degrees vector is
    # already on the driver: size both shuffles from the EXACT work.
    work = float((degs * degs).sum())
    pair_buckets = int(np.clip(work / 500_000, num_buckets, 65_536))
    fin_buckets = int(np.clip(work / 2_000_000, num_buckets, 65_536))
    ref = ray.put((labels, hot_ids))

    def sym_ids(t: pa.Table) -> pa.Table:
        lab, hot = ray.get(ref)
        a = _encode_ids(lab, t.column("a"))
        b = _encode_ids(lab, t.column("b"))
        m = np.concatenate([a, b])
        u = np.concatenate([b, a])
        if len(hot):
            keep = ~np.isin(m, hot)
            m, u = m[keep], u[keep]
        # dense ids -> plain mod is a balanced bucket assignment
        return pa.table({"m": pa.array(m), "u": pa.array(u),
                         "_bkt": pa.array(m % pair_buckets)})

    def pair_codes(g: pa.Table) -> pa.Table:
        m = g.column("m").to_numpy(zero_copy_only=False)
        u = g.column("u").to_numpy(zero_copy_only=False)
        o = np.argsort(m, kind="stable")
        m, u = m[o], u[o]
        starts = np.concatenate(
            [[0], np.nonzero(m[1:] != m[:-1])[0] + 1])
        sizes = np.diff(np.concatenate([starts, [len(m)]]))
        # full ordered Cartesian per middle group, all groups at once
        sq = sizes * sizes
        grp = np.repeat(np.arange(len(sizes)), sq)
        within = np.arange(int(sq.sum())) - np.repeat(
            np.cumsum(sq) - sq, sq)
        ai = starts[grp] + within // sizes[grp]
        bi = starts[grp] + within % sizes[grp]
        src, dst = u[ai], u[bi]
        ne = src != dst
        codes = np.unique(src[ne] * n + dst[ne])  # map-side partial dedup
        return pa.table({"_c": pa.array(codes),
                         "_b2": pa.array((codes // n) % fin_buckets)})

    def edge_codes(t: pa.Table) -> pa.Table:
        lab, _ = ray.get(ref)
        a = _encode_ids(lab, t.column("a"))
        b = _encode_ids(lab, t.column("b"))
        codes = np.concatenate([a * n + b, b * n + a])
        return pa.table({"_c": pa.array(codes),
                         "_b2": pa.array((codes // n) % fin_buckets)})

    two = edges_ds.map_batches(sym_ids, batch_format="pyarrow") \
        .groupby("_bkt").map_groups(
            lambda g: pair_codes(g.drop_columns(["_bkt"])),
            batch_format="pyarrow")
    reach = two.union(edges_ds.map_batches(edge_codes,
                                           batch_format="pyarrow"))

    def finalize(g: pa.Table) -> pa.Table:
        lab, _ = ray.get(ref)
        c = np.unique(g.column("_c").to_numpy(zero_copy_only=False))
        uids, counts = np.unique(c // n, return_counts=True)
        return pa.table({"node": pa.array(lab[uids], _S),
                         "two_hop_count": pa.array(
                             counts.astype(np.int64))})

    return reach.groupby("_b2").map_groups(finalize,
                                           batch_format="pyarrow")


def _two_hop_grouped(edges_ds, degrees_ds, num_buckets: int,
                     max_mid_degree: int | None):
    """String-keyed exact 2-hop for node tables too large to
    broadcast: grouped self-join on the middle node, per-bucket
    dictionary-encoded dedup-and-count."""

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    nb = edges_ds.map_batches(sym, batch_format="pyarrow")
    mid = nb.map_batches(lambda t: t.rename_columns(["m", "w"]),
                         batch_format="pyarrow")
    if max_mid_degree is not None:
        from ner_ray.functions.joins import semi_join

        # the over-cap hub set is the extreme tail of the degree
        # distribution — small by construction, safe to collect
        hot = degrees_ds \
            .filter(expr=f"degree > {int(max_mid_degree)}") \
            .select_columns(["node"]).take_all()
        if hot:
            logger.warning(
                "two_hop_counts: skipping %d middle nodes over "
                "max_mid_degree=%d (reach through them is undercounted)",
                len(hot), max_mid_degree)
            mid = semi_join(mid, [r["node"] for r in hot], on="m",
                            anti=True)
    left = nb.map_batches(lambda t: t.rename_columns(["u", "m"]),
                          batch_format="pyarrow")
    two = grouped_join(left, mid, "m", "m", ["u", "m"], ["m", "w"],
                       {"u": _S, "m": _S, "w": _S},
                       num_buckets=num_buckets) \
        .map_batches(lambda t: t.select(["u", "w"]).filter(
            pc.not_equal(t.column("u"), t.column("w"))),
        batch_format="pyarrow")
    reach = two.union(nb.map_batches(
        lambda t: t.rename_columns(["u", "w"]), batch_format="pyarrow"))

    # every (u, *) row lands in u's hash bucket, so per-bucket
    # dedup-and-count is FINAL — one shuffle, no Min/Max-carry distinct
    # pass + count pass (each extra groupby costs ~3 s of latency)
    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bkt", pa.array(
            to_bucket(hash_column(t.column("u")), num_buckets)))

    def finalize(g: pa.Table) -> pa.Table:
        # dictionary-encode both columns and dedup on fused int codes
        # (exact: a local bijection) — ~10x over string-pair
        # drop_duplicates at millions of rows per bucket
        ue = pc.dictionary_encode(g.column("u").combine_chunks())
        we = pc.dictionary_encode(g.column("w").combine_chunks())
        nw = len(we.dictionary)
        codes = (ue.indices.to_numpy().astype(np.int64) * nw
                 + we.indices.to_numpy().astype(np.int64))
        uids, counts = np.unique(np.unique(codes) // nw,
                                 return_counts=True)
        return pa.table({"node": ue.dictionary.take(pa.array(uids)),
                         "two_hop_count": pa.array(
                             counts.astype(np.int64))})

    return reach.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_bkt").map_groups(finalize, batch_format="pyarrow")


# ------------------------------------------------------------ pagerank


MAX_BROADCAST_NODES = 2_000_000  # rank vector comfortably driver-sized


def pagerank(edges_ds, iters: int = 20, damping: float = 0.85,
             num_buckets: int | None = None, mode: str = "auto",
             max_broadcast_nodes: int = MAX_BROADCAST_NODES):
    """Distinct directed (src, dst) pairs -> (node, rank) after
    ``iters`` power iterations with uniform teleport and dangling mass
    redistributed uniformly (the standard formulation):

    rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u)
                              + dangling_mass/N)

    Size dispatch (``mode="auto"``, the canonicalize pattern): the
    EDGE set is always distributed and streamed once per iteration;
    what dispatches is where the (node, rank) vector lives.

    - ``broadcast`` (nodes <= max_broadcast_nodes): the rank vector is
      driver numpy; per iteration the per-node share array broadcasts
      via ``ray.put`` and one map-only pass over the edges emits
      per-batch pre-summed (node_idx, contribution) partials that the
      driver accumulates — ZERO shuffles per iteration.
    - ``distributed`` (above): the rank vector is a Dataset; per
      iteration one grouped join (edges x ranks) + one groupby(node)
      fused sum/merge — two scalar-pair shuffles, no driver state.

    Both paths are equality-tested (tests/test_graphops.py).
    """
    from ray.data.aggregate import Max, Sum

    edges = edges_ds.materialize()
    if num_buckets is None:
        num_buckets = _auto_buckets(edges)

    out_deg = edges.map_batches(
        lambda t: _partial_counts(
            t.select(["src"]).rename_columns(["node"]), "node"),
        batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("n", alias_name="out_deg"))

    def all_nodes(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t.column("src").combine_chunks(),
                                  t.column("dst").combine_chunks()])
        return _partial_counts(pa.table({"node": nodes}), "node")

    nodes = edges.map_batches(all_nodes, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("n", alias_name="_c")) \
        .map_batches(lambda t: t.append_column(
            "out_deg", pa.array(np.zeros(len(t), np.int64))),
        batch_format="pyarrow").select_columns(["node", "out_deg"])

    # base = (node, out_deg) for ALL nodes: union + groupby(Max) — no
    # left-outer join (out_deg rows win over the zero placeholders)
    base = nodes.union(out_deg).groupby("node").aggregate(
        Max("out_deg", alias_name="out_deg")).materialize()
    n = base.count()
    if n == 0:
        return base.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "rank": pa.nulls(0, pa.float64())}),
            batch_format="pyarrow")

    if mode == "auto":
        mode = "broadcast" if n <= max_broadcast_nodes else "distributed"
    if mode == "broadcast":
        return _pagerank_broadcast(edges, base, n, iters, damping)

    ranks = base.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(len(t), 1.0 / n))),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        agg = ranks.filter(expr="out_deg == 0") \
            .aggregate(Sum("rank", alias_name="s"))
        dangling = (agg or {}).get("s") or 0.0
        contrib_rows = grouped_join(
            edges, ranks.filter(expr="out_deg > 0"),
            "src", "node", ["src", "dst"], ["node", "out_deg", "rank"],
            {"src": _S, "dst": _S, "node": _S, "out_deg": _I, "rank": _F},
            num_buckets=num_buckets)

        def per_edge(t: pa.Table) -> pa.Table:
            share = pc.divide(
                t.column("rank"),
                pc.cast(t.column("out_deg"), pa.float64()))
            g = pa.table({"node": t.column("dst"), "c": share}) \
                .group_by(["node"]).aggregate([("c", "sum")])
            g = g.rename_columns(["node", "c"])
            return g.add_column(1, "out_deg", pa.array(
                np.full(len(g), -1, np.int64)))

        # ONE fused groupby merges contribution partials with the
        # (node, out_deg) base rows: Sum(c) totals contributions
        # (base contributes 0), Max(out_deg) recovers the real
        # out-degree over the -1 placeholders — no second shuffle
        contrib = contrib_rows.map_batches(per_edge,
                                           batch_format="pyarrow")
        base_rows = base.map_batches(
            lambda t: t.append_column("c", pa.array(np.zeros(len(t)))),
            batch_format="pyarrow").select_columns(
                ["node", "out_deg", "c"])
        merged = contrib.union(base_rows).groupby("node").aggregate(
            Max("out_deg", alias_name="out_deg"),
            Sum("c", alias_name="c"))
        teleport = (1.0 - damping) / n + damping * dangling / n

        def update(t: pa.Table) -> pa.Table:
            rank = pc.add(pc.multiply(t.column("c"), damping), teleport)
            return pa.table({"node": t.column("node"),
                             "out_deg": t.column("out_deg"),
                             "rank": rank})

        ranks = merged.map_batches(update,
                                   batch_format="pyarrow").materialize()

    return ranks.select_columns(["node", "rank"])


def _pagerank_broadcast(edges, base, n: int, iters: int, damping: float):
    """Broadcast-mode power iteration: rank vector on the driver,
    node-id array broadcast once, per-iteration share array broadcast
    via ray.put; edges stream through one map-only pass emitting
    per-batch pre-summed (node_idx, c) partials. Zero shuffles."""
    import ray
    import ray.data as rd

    bt = base.to_pandas()
    order = np.argsort(bt["node"].to_numpy())
    nodes = bt["node"].to_numpy()[order].astype("U")
    out_deg = bt["out_deg"].to_numpy()[order].astype(np.int64)
    nodes_ref = ray.put(nodes)
    rank = np.full(n, 1.0 / n)

    for _ in range(iters):
        share = np.where(out_deg > 0, rank / np.maximum(out_deg, 1), 0.0)
        share_ref = ray.put(share)

        def partial(t: pa.Table, _nr=nodes_ref, _sr=share_ref) -> pa.Table:
            nd = ray.get(_nr)
            sh = ray.get(_sr)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            si = np.searchsorted(nd, src)
            di = np.searchsorted(nd, dst)
            u, inv = np.unique(di, return_inverse=True)
            c = np.bincount(inv, weights=sh[si], minlength=len(u))
            return pa.table({"i": pa.array(u.astype(np.int64)),
                             "c": pa.array(c)})

        ctot = np.zeros(n)
        for b in edges.map_batches(
                partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            np.add.at(ctot, b.column("i").to_numpy(zero_copy_only=False),
                      b.column("c").to_numpy(zero_copy_only=False))
        dangling = rank[out_deg == 0].sum()
        rank = (1.0 - damping) / n + damping * (ctot + dangling / n)

    return rd.from_arrow(pa.table({"node": pa.array(nodes),
                                   "rank": pa.array(rank)}))


# --------------------------------------------------- components


def connected_components(edges_ds, a_col: str = "a", b_col: str = "b"):
    """Undirected (a, b) edges -> Dataset[(node, component)] where
    component = lexicographically-min node id of the component.

    Reuses canon.canonicalize's size dispatch (driver union-find below
    the threshold, iterated groupby-min label propagation above) via
    the pair-as-alias reduction near_dedup_docs uses: each edge
    becomes two (entity, alias=edge-key) rows, so nodes sharing an
    edge share an alias. Isolated nodes (no edges) are absent."""
    import ray.data as rd

    from ner_ray.stages.canon import canonicalize

    def pair_edges(t: pa.Table) -> pa.Table:
        a = t.column(a_col).cast(pa.string())
        b = t.column(b_col).cast(pa.string())
        key = pc.binary_join_element_wise(a, b, "\x1f")
        return pa.table({
            "entity_id": pa.concat_arrays([a.combine_chunks(),
                                           b.combine_chunks()]),
            "alias": pa.concat_arrays([key.combine_chunks()] * 2),
        })

    edges = edges_ds.map_batches(pair_edges, batch_format="pyarrow")
    comp = canonicalize(edges)
    if not hasattr(comp, "map_batches"):
        comp = rd.from_arrow(comp)
    return comp.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow")


# ------------------------------------------------------------- k-core


def k_core(edges_ds, k: int, max_rounds: int = 100):
    """Undirected distinct (a, b) pairs -> the k-core subgraph's edge
    set (every surviving node has degree >= k within the subgraph).

    Standard iterative peeling as a driver loop: each round computes
    degrees (per-batch partial counts -> one groupby), broadcasts the
    UNDER-k node set (the peeled set shrinks monotonically and each
    round's removals are the degree-distribution tail, driver-sized by
    the same argument as two_hop's hub set), and drops incident edges
    map-only. Converges when a round removes nothing; the edge set
    only shrinks, so rounds are bounded by the peeling depth
    (<= max_rounds guard raises rather than silently stopping early).
    """
    import ray

    edges = edges_ds.materialize()
    for _ in range(max_rounds):
        if edges.count() == 0:
            return edges
        degs = node_degrees(edges)
        low = degs.filter(expr=f"degree < {int(k)}") \
            .select_columns(["node"]).take_all()
        if not low:
            return edges
        low_ref = ray.put(pa.array(sorted(r["node"] for r in low)))

        def drop(t: pa.Table, _ref=low_ref) -> pa.Table:
            bad = ray.get(_ref)
            mask = pc.and_(
                pc.invert(pc.is_in(t.column("a"), value_set=bad)),
                pc.invert(pc.is_in(t.column("b"), value_set=bad)))
            return t.filter(mask)

        edges = edges.map_batches(drop, batch_format="pyarrow") \
            .materialize()
    raise RuntimeError(
        f"k_core did not converge in {max_rounds} rounds (k={k})")


# ------------------------------------------- label propagation (LPA)


def label_propagation(edges_ds, max_rounds: int = 20,
                      num_buckets: int | None = None,
                      a_col: str = "a", b_col: str = "b"):
    """Community detection by DETERMINISTIC synchronous label
    propagation (Raghavan et al. 2007, made reproducible): every node
    starts labeled with its own id; each round a node adopts the most
    frequent label among its neighbors plus ONE self-vote for its
    current label, ties broken by minimum label. Synchronous updates +
    total tie order make the result independent of layout, retries and
    cluster size (asynchronous LPA is not).

    Fully distributed — per round: one grouped join (edges x labels),
    one fused-key (node, label) vote count (scalar pairs only), one
    per-node argmax in map_groups, one change-count join. Stops when
    no label changes; a non-converged run WARNS at ``max_rounds``
    (LPA can oscillate on bipartite structures — the result is still
    a valid labeling, communities are heuristic).

    Returns Dataset[(node, community)]; nodes cast to string (the
    connected_components convention). Isolated nodes are absent."""
    from ray.data.aggregate import Max, Min, Sum

    from ner_ray.util.hashing import hash_columns

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(a_col).cast(pa.string())
        b = t.column(b_col).cast(pa.string())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(),
                                     b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(),
                                     a.combine_chunks()]),
        })

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()
    if num_buckets is None:
        num_buckets = _auto_buckets(edges)

    labels = edges.map_batches(
        lambda t: _partial_counts(pa.table({"node": t.column("src")}),
                                  "node"),
        batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("n", alias_name="_n")) \
        .map_batches(lambda t: pa.table({"node": t.column("node"),
                                         "label": t.column("node")}),
                     batch_format="pyarrow").materialize()

    types = {"src": _S, "dst": _S, "node": _S, "label": _S,
             "new_label": _S}

    def precount(t: pa.Table) -> pa.Table:
        # per-batch (node, label) vote reduction; "own" tags the
        # self-vote so the pick stage can see the OLD label and emit a
        # changed flag — no separate old-vs-new join per round. The
        # shuffle groups by a coarse node-hash bucket, NOT per node:
        # one Python map_groups dispatch per node per round (~1 ms
        # each, see neardup.py's measurement) would dominate at graph
        # scale; per bucket the argmax is one vectorized pass.
        g = t.group_by(["node", "label"]).aggregate(
            [("own", "count"), ("own", "max")])
        g = g.select(["node", "label", "own_count", "own_max"]) \
            .rename_columns(["node", "label", "n", "own"])
        return g.append_column("_bkt", pa.array(to_bucket(
            hash_columns(g.column("node")), num_buckets)))

    def pick_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket finale: sum votes per (node, label),
        # argmax per node (max n, ties -> min label — same total order
        # as the previous per-node pick), changed-flag vs the own row
        c = g.groupby(["node", "label"], sort=False).agg(
            n=("n", "sum"), own=("own", "max")).reset_index()
        c = c.sort_values(["node", "n", "label"],
                          ascending=[True, False, True], kind="stable")
        top = c.drop_duplicates("node", keep="first")
        olds = c.loc[c["own"] == 1, ["node", "label"]] \
            .drop_duplicates("node").rename(columns={"label": "_old"})
        out = top.merge(olds, on="node", how="left")
        out["_chg"] = (out["label"] != out["_old"]).astype(int)
        return out[["node", "label", "_chg"]]

    def tag(own: int):
        def fn(t: pa.Table) -> pa.Table:
            node = t.column("dst" if not own else "node")
            label = t.column("label")
            return pa.table({"node": node, "label": label,
                             "own": pa.array(
                                 np.full(len(t), own, np.int64))})

        return fn

    converged = False
    for _ in range(max_rounds):
        nbr_votes = grouped_join(
            edges, labels, "src", "node", ["src", "dst"],
            ["node", "label"], types, num_buckets=num_buckets) \
            .map_batches(tag(0), batch_format="pyarrow")
        new_labels = nbr_votes.union(
            labels.map_batches(tag(1), batch_format="pyarrow")) \
            .map_batches(precount, batch_format="pyarrow") \
            .groupby("_bkt").map_groups(
                lambda g: pick_bucket(g.drop(columns=["_bkt"])),
                batch_format="pandas") \
            .materialize()
        changed = int(new_labels.sum("_chg") or 0)
        labels = new_labels.select_columns(["node", "label"])
        if changed == 0:
            converged = True
            break
    if not converged:
        logger.warning("label_propagation: no fixpoint after %d rounds — "
                     "returning the current (valid) labeling", max_rounds)
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "community"]),
        batch_format="pyarrow")
