"""label_propagation: deterministic synchronous LPA — brute-force
fixpoint equality, clique separation, layout independence."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _reference_lpa(edges, max_rounds=20):
    """Single-process mirror of the distributed rules: sync rounds,
    neighbor votes + one self-vote, ties to min label."""
    adj: dict[str, list[str]] = {}
    for a, b in edges:
        a, b = str(a), str(b)
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(max_rounds):
        new = {}
        for n, nbrs in adj.items():
            votes = Counter(labels[m] for m in nbrs)
            votes[labels[n]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], ),
                       default=(labels[n], 0))
            top = best[1]
            new[n] = min(l for l, c in votes.items() if c == top)
        if new == labels:
            return labels
        labels = new
    return labels


def _edges_ds(edges):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "a": pa.array([str(a) for a, _ in edges]),
        "b": pa.array([str(b) for _, b in edges]),
    }))


def _run(edges, **kw):
    from ner_ray.stages.graphops import label_propagation

    out = label_propagation(_edges_ds(edges), **kw)
    return {r["node"]: r["community"] for r in out.take_all()}


def test_two_cliques_bridge(ray_session):
    clique1 = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    clique2 = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    got = _run(clique1 + clique2 + [("a0", "b0")])
    comm_a = {got[f"a{i}"] for i in range(4)}
    comm_b = {got[f"b{i}"] for i in range(4)}
    assert len(comm_a) == 1 and len(comm_b) == 1
    assert comm_a != comm_b  # the bridge does not merge the cliques


def test_matches_reference_on_random_graph(ray_session):
    rng = np.random.default_rng(23)
    n = 40
    edges = {(f"n{min(i, j)}", f"n{max(i, j)}")
             for i, j in rng.integers(0, n, (120, 2)) if i != j}
    edges = sorted(edges)
    # max_rounds=5: both sides stop at the same non-converged labeling,
    # which validates the synchronous update rule exactly without
    # paying ~6 s of shuffle latency per extra round
    assert _run(edges, max_rounds=5) == _reference_lpa(edges, max_rounds=5)


def test_layout_independent(ray_session):
    rng = np.random.default_rng(31)
    edges = sorted({(f"n{min(i, j)}", f"n{max(i, j)}")
                    for i, j in rng.integers(0, 25, (60, 2)) if i != j})
    a = _run(edges, max_rounds=4)
    ds = _edges_ds(edges).repartition(9)
    from ner_ray.stages.graphops import label_propagation

    b = {r["node"]: r["community"]
         for r in label_propagation(ds, max_rounds=4).take_all()}
    assert a == b
