"""SemDeDup-style semantic dedup: greedy-keep semantics, cluster
confinement, chunking equivalence, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ner_ray.stages import semdedup
from ner_ray.stages.semdedup import (
    _greedy_keep,
    semantic_dedup,
    semantic_dedup_keep_ids,
)
from ner_ray.stages.similarity import _normalize


def _corpus(n_groups: int = 12, dups_per_group: int = 4, d: int = 16,
            noise: float = 0.01, seed: int = 7):
    """Well-separated base directions, each with near-identical copies
    (cosine ~> 0.999 within a group, << 0.95 across groups)."""
    rng = np.random.default_rng(seed)
    base = _normalize(rng.normal(size=(n_groups, d)))
    # reject accidental cross-group similarity so the planted structure
    # is unambiguous at eps=0.95
    while (np.abs(np.triu(base @ base.T, 1)) >= 0.8).any():
        base = _normalize(rng.normal(size=(n_groups, d)))
    vecs, gid = [], []
    for g in range(n_groups):
        for _ in range(dups_per_group):
            vecs.append(base[g] + noise * rng.normal(size=d))
            gid.append(g)
    ids = np.arange(len(vecs), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    return tbl, np.array(gid), _normalize(np.stack(vecs))


def _brute_greedy(m: np.ndarray, eps: float) -> np.ndarray:
    kept = []
    out = np.zeros(len(m), dtype=bool)
    for i in range(len(m)):
        if all(float(m[i] @ m[j]) < eps for j in kept):
            kept.append(i)
            out[i] = True
    return out


def test_greedy_keep_matches_bruteforce_across_chunk_sizes(monkeypatch):
    rng = np.random.default_rng(3)
    m = _normalize(rng.normal(size=(50, 8)))
    # inject some exact duplicates
    m[10] = m[0]
    m[33] = m[20]
    expect = _brute_greedy(m, 0.9)
    for chunk in (4, 7, 50, 128):
        monkeypatch.setattr(semdedup, "CHUNK", chunk)
        np.testing.assert_array_equal(_greedy_keep(m, 0.9), expect)


def test_semantic_dedup_drops_planted_dups(ray_session):
    import ray.data as rd

    tbl, gid, m = _corpus()
    res = semantic_dedup(rd.from_arrow(tbl), k=6, eps=0.95,
                         iters=6).to_pandas()
    assert len(res) == len(gid)
    kept = res[res["kept"]].sort_values("vec_id")
    # exactly one survivor per planted near-dup group
    assert len(kept) == gid.max() + 1
    assert sorted(gid[kept["vec_id"].to_numpy()]) == \
        sorted(range(gid.max() + 1))
    # SemDeDup guarantee: every dropped item has a kept item with
    # cosine >= eps in the SAME cluster
    by_cluster = res.groupby("cluster")
    for _, grp in by_cluster:
        km = m[grp[grp["kept"]]["vec_id"].to_numpy()]
        for vid in grp[~grp["kept"]]["vec_id"]:
            assert (m[vid] @ km.T).max() >= 0.95


def test_semantic_dedup_single_cluster_equals_bruteforce(ray_session):
    import ray.data as rd

    tbl, _, m = _corpus(n_groups=5, dups_per_group=3)
    res = semantic_dedup(rd.from_arrow(tbl), k=1, eps=0.95,
                         iters=2).to_pandas().sort_values("vec_id")
    # k=1: one cluster, keep order = (centroid_sim, id); replicate
    order = np.lexsort((res["vec_id"].to_numpy(),
                        res["centroid_sim"].to_numpy()))
    expect_sorted = _brute_greedy(m[res["vec_id"].to_numpy()[order]], 0.95)
    got_sorted = res["kept"].to_numpy()[order]
    np.testing.assert_array_equal(got_sorted, expect_sorted)


def test_semantic_dedup_deterministic_and_keep_ids(ray_session):
    import ray.data as rd

    tbl, gid, _ = _corpus(seed=11)
    a = semantic_dedup(rd.from_arrow(tbl), k=4, eps=0.95, iters=4) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = semantic_dedup(rd.from_arrow(tbl), k=4, eps=0.95, iters=4) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    ids = semantic_dedup_keep_ids(rd.from_arrow(tbl), k=4, eps=0.95,
                                  iters=4).to_pandas()
    assert set(ids.columns) == {"vec_id"}
    assert set(ids["vec_id"]) == set(a[a["kept"]]["vec_id"])


def test_semantic_dedup_on_fixture_embeddings(ray_session):
    """Real driver-shaped input: the sf0.001 embeddings table."""
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n = ds.count()
    res = semantic_dedup(ds, k=8, eps=0.99, iters=4).to_pandas()
    assert len(res) == n
    assert res["kept"].any()
    assert res["vec_id"].is_unique
