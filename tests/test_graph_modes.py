"""Equality of the adjacency execution modes (combiner vs salted) and
of the fused resolve-then-dedup fast path vs the two-step operators."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pieces(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.pipelines.flagship import run_fixture_pipeline

    return run_fixture_pipeline(tiny_dir), tiny_dir


def _norm_adj(df: pd.DataFrame) -> list:
    df = df.sort_values("src").reset_index(drop=True)
    return [
        (r["src"], r["degree"], [tuple(sorted(e.items())) for e in r["edges"]])
        for _, r in df.iterrows()
    ]


def test_salted_equals_combiner(pieces):
    from ner_ray.stages.graph import build_adjacency

    out, _ = pieces
    combiner = build_adjacency(out["resolved"], mode="combiner").to_pandas()
    salted = build_adjacency(out["resolved"], mode="salted",
                             n_salts=4).to_pandas()
    assert _norm_adj(combiner) == _norm_adj(salted)


def test_resolve_then_dedup_equals_two_step(pieces):
    from ner_ray.stages.canon import resolve_then_dedup

    out, tiny_dir = pieces
    fused = resolve_then_dedup(out["triples"], out["canon"]).to_pandas()
    fused = fused.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    gold = pq.read_table(
        os.path.join(tiny_dir, "gold_resolved.parquet")).to_pandas()
    pd.testing.assert_frame_equal(fused[gold.columns.tolist()], gold)
