"""Scale-path equivalence tests for the round-2 distributed rewrites:

* minhash_near_dups (join-back + map_batches verify) must produce the
  exact same pairs as the round-1 driver-side algorithm (candidates
  to_pandas + broadcast texts + verify_jaccard).
* cosine_dup_pairs_lsh must reach >= 0.95 recall vs the exact path at
  its design threshold (0.9) on clustered vectors, and the dispatcher
  must pick the exact path for small inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_distributed_equals_driver_side(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        verify_jaccard,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    new = minhash_near_dups(docs, threshold=0.7,
                            max_driver_verify_pairs=0).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    # the small-side dispatch (bounded driver verify) must agree with
    # the join-back path
    small = minhash_near_dups(docs, threshold=0.7).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        new.astype({"doc_a": "int64", "doc_b": "int64"}),
        small.astype({"doc_a": "int64", "doc_b": "int64"}))

    # round-1 algorithm, inline: driver-side candidates + broadcast texts
    cand = lsh_candidate_pairs(docs).to_pandas()
    texts = {}
    for b in docs.iter_batches(batch_format="pyarrow"):
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            texts[i] = t
    old = verify_jaccard(cand[["doc_a", "doc_b"]], texts, 3, 0.7) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    assert len(new) == len(old) and len(new) > 0
    pd.testing.assert_frame_equal(
        new.astype({"doc_a": "int64", "doc_b": "int64"}),
        old.astype({"doc_a": "int64", "doc_b": "int64"}))


def _clustered_embeddings(n_clusters=60, per_cluster=5, d=64, noise=0.12):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_clusters, d))
    vecs, ids = [], []
    for c in range(n_clusters):
        for m in range(per_cluster):
            vecs.append(base[c] + noise * rng.standard_normal(d))
            ids.append(c * per_cluster + m)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })


def test_cosine_lsh_recall_vs_exact(ray_session):
    import ray.data as rd

    from ner_ray.stages.similarity import (
        cosine_dup_pairs_exact,
        cosine_dup_pairs_lsh,
    )

    ds = rd.from_arrow(_clustered_embeddings()).repartition(4)
    exact = cosine_dup_pairs_exact(ds, threshold=0.9).to_pandas()
    approx = cosine_dup_pairs_lsh(ds, threshold=0.9).to_pandas()
    pe = set(zip(exact.vec_a, exact.vec_b))
    pl = set(zip(approx.vec_a, approx.vec_b))
    assert len(pe) > 50
    assert not (pl - pe), "LSH path emitted a pair the exact path lacks"
    recall = len(pe & pl) / len(pe)
    assert recall >= 0.95, recall


def test_cosine_dispatch_small_uses_exact(ray_session):
    import ray.data as rd

    from ner_ray.stages.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_exact,
    )

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    via_dispatch = cosine_dup_pairs(ds, threshold=0.45).to_pandas() \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    direct = cosine_dup_pairs_exact(ds, threshold=0.45).to_pandas() \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(via_dispatch, direct)
