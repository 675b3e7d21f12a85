"""Fixture determinism + schema conformance + eval harness units."""

import json
import os

import pyarrow.parquet as pq

from ner_ray import schema as S
from ner_ray.evaluation.conll import evaluate_mentions, evaluate_triples
from ner_ray.fixtures.gen import SIZES, ensure_fixtures, gen_alias_table, gen_docs
import numpy as np


def test_tiny_fixture_schemas(tiny_dir):
    docs = pq.read_table(os.path.join(tiny_dir, "docs.parquet"))
    assert docs.schema.equals(S.DOCUMENTS)
    alias = pq.read_table(os.path.join(tiny_dir, "alias.parquet"))
    assert alias.schema.equals(S.ALIAS_DICT)
    mentions = pq.read_table(os.path.join(tiny_dir, "gold_mentions.parquet"))
    assert mentions.schema.equals(S.MENTIONS)
    adj = pq.read_table(os.path.join(tiny_dir, "gold_adjacency.parquet"))
    assert adj.schema.equals(S.ADJACENCY)
    meta = json.load(open(os.path.join(tiny_dir, "meta.json")))
    assert meta["rows_gold_triples"] > 100  # non-trivial corpus


def test_generation_deterministic():
    rng1 = np.random.default_rng(42)
    rng2 = np.random.default_rng(42)
    a1 = gen_alias_table(rng1, 100)
    a2 = gen_alias_table(rng2, 100)
    assert a1.equals(a2)
    d1 = gen_docs(rng1, 20, a1)
    d2 = gen_docs(rng2, 20, a2)
    assert d1.equals(d2)


def test_span_offsets_monotone(tiny_dir):
    docs = pq.read_table(os.path.join(tiny_dir, "docs.parquet")).to_pylist()
    for d in docs:
        offs = [s["offset"] for s in d["spans"]]
        assert offs == sorted(offs)
        for s in d["spans"]:
            if s["kind"] == "text":
                assert s["media_ref"] == ""
            else:
                assert s["text"] == "" and s["media_ref"].startswith("media://")


def test_eval_harness_counts():
    gold = [
        {"doc_id": "d", "span_idx": 0, "tok_begin": 0, "tok_end": 2, "ne_type": "PER"},
        {"doc_id": "d", "span_idx": 0, "tok_begin": 5, "tok_end": 6, "ne_type": "LOC"},
    ]
    pred = [
        gold[0],
        {"doc_id": "d", "span_idx": 0, "tok_begin": 5, "tok_end": 7, "ne_type": "LOC"},
    ]
    rep = evaluate_mentions(pred, gold)
    assert rep.overall.tp == 1 and rep.overall.fp == 1 and rep.overall.fn == 1
    assert rep.per_type["PER"].f1 == 1.0
    assert rep.per_type["LOC"].tp == 0


def test_eval_triples_perfect():
    rows = [{"subj": "E1", "pred": "per:x:loc", "obj": "E2", "doc_id": "d",
             "span_idx": 0}]
    rep = evaluate_triples(rows, rows)
    assert rep.overall.precision == 1.0 and rep.overall.recall == 1.0
