"""Graph analytics (graphops): brute-force equivalence on random
graphs, triangle/2-hop DuckDB equivalence, PageRank vs a dense numpy
power iteration, and hub-cap logging."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ner_ray.stages.graphops import (
    directed_edges,
    node_degrees,
    pagerank,
    triangle_counts,
    triangle_rows,
    two_hop_counts,
    undirected_edges,
)


def _random_triples(seed: int, n_nodes: int = 40, n_edges: int = 300):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "subj": [f"E{i:03d}" for i in rng.integers(0, n_nodes, n_edges)],
        "pred": "p",
        "obj": [f"E{i:03d}" for i in rng.integers(0, n_nodes, n_edges)],
    })


def _brute(df: pd.DataFrame):
    E = set()
    for s, o in zip(df.subj, df.obj):
        if s != o:
            E.add((min(s, o), max(s, o)))
    adj: dict[str, set] = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for a, b in E:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted([a, b, c])))
    tri_n: dict[str, int] = {}
    for t in tris:
        for x in t:
            tri_n[x] = tri_n.get(x, 0) + 1
    two = {}
    for u in adj:
        reach = set(adj[u])
        for m in adj[u]:
            reach |= adj[m]
        reach.discard(u)
        two[u] = len(reach)
    return E, adj, tris, tri_n, two


@pytest.fixture(scope="module")
def graph(ray_session):
    import ray.data as rd

    df = _random_triples(7)
    ds = rd.from_pandas(df)
    und = undirected_edges(ds).materialize()
    return df, ds, und


def test_undirected_edges_and_degrees(graph):
    df, _, und = graph
    E, adj, *_ = _brute(df)
    up = und.to_pandas()
    assert set(zip(up.a, up.b)) == E
    assert (up.a < up.b).all()
    deg = node_degrees(und).to_pandas().set_index("node")["degree"]
    assert deg.to_dict() == {u: len(vs) for u, vs in adj.items()}


def test_triangles_match_brute_force(graph):
    df, _, und = graph
    _, _, tris, tri_n, _ = _brute(df)
    tr = triangle_rows(und).to_pandas()
    assert len(tr) == len(tris)
    assert set(tuple(sorted([r.u, r.v, r.w]))
               for r in tr.itertuples()) == tris
    tc = triangle_counts(und).to_pandas()
    assert tc.set_index("node")["tri_count"].to_dict() == tri_n
    # force the grouped-join (web-scale) orientation path: same rows
    tr2 = triangle_rows(und, max_broadcast_nodes=0).to_pandas()
    assert set(tuple(sorted([r.u, r.v, r.w]))
               for r in tr2.itertuples()) == tris


def test_two_hop_matches_brute_force(graph):
    df, _, und = graph
    *_, two = _brute(df)
    th = two_hop_counts(und).to_pandas()
    assert th.set_index("node")["two_hop_count"].to_dict() == two


def test_triangles_two_hop_match_duckdb(graph):
    """The exact SQL shapes used by the q_adjacency_degree oracle."""
    import duckdb

    df, _, und = graph
    con = duckdb.connect()
    con.register("res", df)
    tri_sql = con.sql("""
        WITH und AS (SELECT DISTINCT least(subj, obj) AS a,
                            greatest(subj, obj) AS b
                     FROM res WHERE subj <> obj),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1 JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT node, CAST(count(*) AS BIGINT) AS tri_count FROM (
            SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri) GROUP BY node ORDER BY node
    """).df()
    tc = triangle_counts(und).to_pandas().sort_values(
        "node").reset_index(drop=True)
    pd.testing.assert_frame_equal(tc, tri_sql)

    two_sql = con.sql("""
        WITH und AS (SELECT DISTINCT least(subj, obj) AS a,
                            greatest(subj, obj) AS b
                     FROM res WHERE subj <> obj),
        nb AS (SELECT a AS u, b AS v FROM und
               UNION ALL SELECT b, a FROM und)
        SELECT u AS node, CAST(count(DISTINCT w) AS BIGINT)
               AS two_hop_count
        FROM (SELECT n1.u AS u, n2.v AS w FROM nb n1
              JOIN nb n2 ON n2.u = n1.v WHERE n2.v <> n1.u
              UNION SELECT u, v FROM nb) GROUP BY u ORDER BY u
    """).df()
    th = two_hop_counts(und).to_pandas().sort_values(
        "node").reset_index(drop=True)
    pd.testing.assert_frame_equal(th, two_sql)


def test_two_hop_grouped_path_matches_broadcast(graph):
    df, _, und = graph
    *_, two = _brute(df)
    # force the string-keyed (web-scale) path: same exact counts
    th = two_hop_counts(und, max_broadcast_nodes=0).to_pandas()
    assert th.set_index("node")["two_hop_count"].to_dict() == two


def test_two_hop_hub_cap_grouped_matches_broadcast(graph):
    df, _, und = graph
    a = two_hop_counts(und, max_mid_degree=5).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = two_hop_counts(und, max_mid_degree=5, max_broadcast_nodes=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_two_hop_hub_cap_logs_and_undercounts(graph, caplog):
    import logging

    df, _, und = graph
    exact = two_hop_counts(und).to_pandas().set_index(
        "node")["two_hop_count"]
    with caplog.at_level(logging.WARNING, logger="ner_ray.stages.graphops"):
        capped = two_hop_counts(und, max_mid_degree=5).to_pandas() \
            .set_index("node")["two_hop_count"]
    assert any("max_mid_degree" in r.message for r in caplog.records)
    # capping only ever undercounts
    joint = pd.concat([exact, capped], axis=1, keys=["e", "c"]).fillna(0)
    assert (joint.c <= joint.e).all()
    assert (joint.c < joint.e).any()


def test_pagerank_matches_dense_power_iteration(graph):
    df, ds, _ = graph
    de = directed_edges(ds).materialize()
    dp = de.to_pandas()
    nodes = sorted(set(dp.src) | set(dp.dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    outd = np.zeros(n)
    for s, o in zip(dp.src, dp.dst):
        M[idx[o], idx[s]] += 1.0
        outd[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    d = 0.85
    iters = 8
    for _ in range(iters):
        dangling = r[outd == 0].sum()
        contrib = M @ np.where(outd > 0, r / np.maximum(outd, 1), 0.0)
        r = (1 - d) / n + d * (contrib + dangling / n)
    pr = pagerank(de, iters=iters).to_pandas().set_index("node")["rank"]
    got = np.array([pr[v] for v in nodes])
    assert np.allclose(got, r, rtol=0, atol=1e-12)
    assert abs(pr.sum() - 1.0) < 1e-9
    # the distributed (web-scale) path computes the same vector
    prd = pagerank(de, iters=iters, mode="distributed").to_pandas() \
        .set_index("node")["rank"]
    gotd = np.array([prd[v] for v in nodes])
    assert np.allclose(gotd, r, rtol=0, atol=1e-12)


def test_empty_graph(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"subj": ["A"], "pred": ["p"], "obj": ["A"]})
    und = undirected_edges(rd.from_pandas(df)).materialize()
    assert und.count() == 0
    assert triangle_counts(und).count() == 0
    assert two_hop_counts(und).count() == 0


def test_connected_components(graph, ray_session):
    from ner_ray.stages.graphops import connected_components

    df, _, und = graph
    E, adj, *_ = _brute(df)
    # brute-force union-find
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in E:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_sets: dict = {}
    for x in parent:
        comp_sets.setdefault(find(x), set()).add(x)
    exp = {x: min(s) for r, s in comp_sets.items() for x in s}
    got = connected_components(und).to_pandas() \
        .set_index("node")["component"].to_dict()
    assert got == exp


def test_connected_components_forced_distributed(graph, ray_session,
                                                 monkeypatch):
    from ner_ray.stages import canon
    from ner_ray.stages.graphops import connected_components

    df, _, und = graph
    base = connected_components(und).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    monkeypatch.setattr(canon, "LOCAL_THRESHOLD", 0)
    dist = connected_components(und).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(base, dist)


def test_k_core_matches_brute_force(graph, ray_session):
    from ner_ray.stages.graphops import k_core

    df, _, und = graph
    E, adj, *_ = _brute(df)
    for k in (2, 4, 7):
        # brute-force peeling
        cur = {u: set(vs) for u, vs in adj.items()}
        changed = True
        while changed:
            changed = False
            for u in list(cur):
                if len(cur[u]) < k:
                    for v in cur[u]:
                        cur[v].discard(u)
                    del cur[u]
                    changed = True
        exp = set()
        for u, vs in cur.items():
            for v in vs:
                exp.add((min(u, v), max(u, v)))
        got = k_core(und, k).to_pandas()
        assert set(zip(got.a, got.b)) == exp, f"k={k}"


def test_k_core_degenerate(ray_session, graph):
    from ner_ray.stages.graphops import k_core

    _, _, und = graph
    assert k_core(und, 10_000).count() == 0
    full = k_core(und, 1).to_pandas()
    assert len(full) == und.count()
