"""End-to-end Ray pipeline conformance vs the reference oracle:
the driver's correctness gate (triple P/R >= 0.95; target 1.0) plus
the per-row span-sequence invariant (BASELINE.json:2,15)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ner_ray.evaluation.conll import evaluate_mentions, evaluate_triples


@pytest.fixture(scope="module")
def flagship(ray_session, tiny_dir):
    from ner_ray.pipelines.flagship import run_fixture_pipeline

    return run_fixture_pipeline(tiny_dir)


def _gold(tiny_dir, name):
    return pq.read_table(os.path.join(tiny_dir, f"{name}.parquet"))


def test_triples_pr_1_0(flagship, tiny_dir):
    pred = flagship["triples"].to_pandas().to_dict("records")
    gold = _gold(tiny_dir, "gold_triples").to_pylist()
    rep = evaluate_triples(pred, gold)
    d = rep.as_dict()["overall"]
    assert d["precision"] == 1.0 and d["recall"] == 1.0, d


def test_mentions_pr_1_0(flagship, tiny_dir):
    from ner_ray.pipelines.flagship import mention_rows

    pred = (
        flagship["tagged"]
        .map_batches(mention_rows, batch_format="pyarrow")
        .to_pandas()
        .to_dict("records")
    )
    gold = _gold(tiny_dir, "gold_mentions").to_pylist()
    rep = evaluate_mentions(pred, gold)
    d = rep.as_dict()["overall"]
    assert d["precision"] == 1.0 and d["recall"] == 1.0, d


def test_dedup_matches_gold(flagship, tiny_dir):
    pred = flagship["deduped"].to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    gold = _gold(tiny_dir, "gold_triples_dedup").to_pandas()
    pd.testing.assert_frame_equal(pred[gold.columns.tolist()], gold)


def test_canon_matches_gold(flagship, tiny_dir):
    pred = flagship["canon"].to_pandas().sort_values("entity_id") \
        .reset_index(drop=True)
    gold = _gold(tiny_dir, "gold_components").to_pandas()
    pd.testing.assert_frame_equal(pred, gold)


def test_resolved_matches_gold(flagship, tiny_dir):
    pred = flagship["resolved"].to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    gold = _gold(tiny_dir, "gold_resolved").to_pandas()
    pd.testing.assert_frame_equal(pred[gold.columns.tolist()], gold)


def test_adjacency_matches_gold(flagship, tiny_dir):
    pred = flagship["adjacency"].to_pandas().sort_values("src") \
        .reset_index(drop=True)
    gold = _gold(tiny_dir, "gold_adjacency").to_pandas()
    assert pred["src"].tolist() == gold["src"].tolist()
    assert pred["degree"].tolist() == gold["degree"].tolist()
    for p_edges, g_edges in zip(pred["edges"], gold["edges"]):
        assert [tuple(sorted(e.items())) for e in p_edges] == \
               [tuple(sorted(e.items())) for e in g_edges]


def test_span_invariant(ray_session, tiny_dir):
    """Q6: annotated docs preserve (kind, text, media_ref, order)."""
    import ray.data as rd

    from ner_ray.stages.annotate import AnnotateDocsActor
    from ner_ray.stages.spans import check_span_invariant
    from ner_ray.state.model import put_bundle

    docs = rd.read_parquet(os.path.join(tiny_dir, "docs.parquet"))
    bundle = put_bundle(os.path.join(tiny_dir, "model.parquet"),
                        os.path.join(tiny_dir, "alias.parquet"))
    annotated = docs.map_batches(
        AnnotateDocsActor, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
    assert check_span_invariant(docs, annotated)
    # and the annotation is non-trivial
    assert annotated.sum("n_mentions") > 0


def test_distributed_canon_equals_local(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.stages.canon import canonicalize_distributed, canonicalize_local

    edges = rd.read_parquet(os.path.join(tiny_dir, "alias.parquet"),
                            columns=["entity_id", "alias"])
    local = canonicalize_local(edges).to_pandas()
    dist = canonicalize_distributed(edges, num_partitions=4).to_pandas() \
        .sort_values("entity_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, local)


def test_distributed_canon_chain(ray_session):
    """Deep-chain edge case the fixture's star components don't cover."""
    import ray.data as rd

    from ner_ray.stages.canon import canonicalize_distributed

    items = []
    for i in range(7):  # chain E0-a0-E1-a1-...-E7 (diameter 7)
        items.append({"entity_id": f"E{i}", "alias": f"a{i}"})
        items.append({"entity_id": f"E{i + 1}", "alias": f"a{i}"})
    edges = rd.from_items(items)
    out = canonicalize_distributed(edges, num_partitions=2).to_pandas()
    assert set(out["canonical_id"]) == {"E0"}


def test_resolve_join_path_equals_broadcast(flagship, ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.stages.canon import resolve_triples_join

    canon_ds = rd.from_arrow(flagship["canon"])
    # materialize the dedup checkpoint first: two JoinOperators
    # downstream of the tagger/linker actor pools can deadlock the
    # 4-CPU test session (join aggregators + min actors > CPUs) —
    # same checkpoint canonicalize_and_resolve's large path takes
    deduped = flagship["deduped"].materialize()
    joined = resolve_triples_join(deduped, canon_ds,
                                  num_partitions=4).to_pandas()
    joined = joined.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    gold = _gold(tiny_dir, "gold_resolved").to_pandas()
    pd.testing.assert_frame_equal(joined[gold.columns.tolist()], gold)
