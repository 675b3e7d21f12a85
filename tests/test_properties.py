"""Property-based tests (hypothesis) for the frozen kernels and
engine-level determinism under different partitionings (SURVEY.md §5.3)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ner_ray.constants import LABELS, N_LABELS
from ner_ray.oracle import reference_oracle as O

# ------------------------------------------------------- oracle kernels

tag_ids = st.lists(st.integers(0, N_LABELS - 1), min_size=0, max_size=30)


@given(tag_ids)
@settings(max_examples=200, deadline=None)
def test_bio_decode_chunks_are_valid(tags):
    chunks = O.bio_decode(tags)
    prev_end = -1
    for (b, e, typ) in chunks:
        assert 0 <= b < e <= len(tags)
        assert b >= prev_end  # disjoint, ordered
        prev_end = e
        # every covered tag belongs to this type
        for t in range(b, e):
            assert LABELS[tags[t]].endswith(typ)
    # every non-O tag is covered by exactly one chunk
    covered = set()
    for (b, e, _t) in chunks:
        covered |= set(range(b, e))
    assert covered == {i for i, t in enumerate(tags) if LABELS[t] != "O"}


@given(st.text(alphabet="aA1 .\t", max_size=40))
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_monotone(text):
    toks = O.tokenize(text)
    offs = O.char_offsets(toks)
    assert offs == sorted(offs)
    assert len(offs) == len(toks)


@given(st.lists(st.sampled_from(["alice", "chen", "paris", "map", "x1"]),
                min_size=0, max_size=15))
@settings(max_examples=200, deadline=None)
def test_gazetteer_flags_wellformed(tokens):
    aliases = {"alice chen": "PER", "chen": "PER", "paris": "LOC"}
    flags = O.gazetteer_flags(tokens, aliases)
    for i, f in enumerate(flags):
        if f.startswith("I-"):
            assert i > 0 and flags[i - 1] in (f, "B" + f[1:])


@given(st.lists(st.tuples(st.sampled_from(["E1", "E2", "E3", "E4"]),
                          st.sampled_from(["a", "b", "c"])),
                min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_unionfind_permutation_invariant(pairs):
    rows = [(a, e, "PER", 1.0) for e, a in pairs]
    c1 = O.components_from_alias(rows)
    c2 = O.components_from_alias(list(reversed(rows)))
    assert c1 == c2
    # canonical is the component min and is idempotent
    for e, c in c1.items():
        assert c <= e
        assert c1[c] == c


# -------------------------------------------------- engine determinism


def test_tagger_batchsize_invariant(tiny_dir):
    """Same mentions regardless of how span rows are batched."""
    import pyarrow.parquet as pq

    from ner_ray.stages.spans import flatten_text_spans
    from ner_ray.stages.tagger import FeatureCache, tag_spans
    from ner_ray.state.model import GAZ_VALUES, ModelBundle

    docs = pq.read_table(f"{tiny_dir}/docs.parquet")
    b = ModelBundle.load(f"{tiny_dir}/model.parquet",
                         f"{tiny_dir}/alias.parquet")
    gid = b.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    spans = flatten_text_spans(docs)
    texts = spans.column("text").to_pandas()

    whole = tag_spans(texts, b, gaz_row).flatten().to_pylist()
    cache = FeatureCache(b)
    parts = []
    for lo in range(0, len(texts), 97):  # deliberately odd batch size
        part = tag_spans(texts.iloc[lo:lo + 97].reset_index(drop=True),
                         b, gaz_row, cache=cache)
        parts.extend(part.flatten().to_pylist())
    assert whole == parts


def test_dedup_idempotent(ray_session, tiny_dir):
    from ner_ray.pipelines.flagship import run_fixture_pipeline
    from ner_ray.stages.dedup import merge_weights

    out = run_fixture_pipeline(tiny_dir)
    once = out["deduped"].to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    twice = merge_weights(out["deduped"]).to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(once[twice.columns.tolist()], twice)


def test_pipeline_parallelism_invariant(ray_session, tiny_dir):
    """Identical resolved triples when the input is re-blocked."""
    import ray.data as rd

    from ner_ray.pipelines.flagship import build_graph

    def run(nblocks):
        docs = rd.read_parquet(f"{tiny_dir}/docs.parquet",
                               override_num_blocks=nblocks)
        out = build_graph(docs, f"{tiny_dir}/model.parquet",
                          f"{tiny_dir}/alias.parquet")
        return out["resolved"].to_pandas().sort_values(
            ["subj", "pred", "obj"]).reset_index(drop=True)

    a = run(1)
    b = run(7)
    pd.testing.assert_frame_equal(a, b)


def test_partial_final_mean_decomposition(ray_session):
    """mean = sum/count decomposition in the combiner path matches a
    direct computation (engine-level check of the algebraic split)."""
    import duckdb

    import ray.data as rd

    from ner_ray.functions.aggregates import partial_final_agg

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"],
                         override_num_blocks=7)
    out = partial_final_agg(
        ds, ["l_returnflag"],
        [("l_quantity", "mean", "avg_qty"),
         ("l_quantity", "min", "min_qty"),
         ("l_quantity", "max", "max_qty")],
    ).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    want = duckdb.connect().execute(
        f"SELECT l_returnflag, avg(l_quantity) avg_qty, "
        f"min(l_quantity) min_qty, max(l_quantity) max_qty "
        f"FROM read_parquet('{sf}/lineitem.parquet') "
        f"GROUP BY 1 ORDER BY 1").fetchdf()
    assert np.allclose(out["avg_qty"], want["avg_qty"], atol=1e-9)
    assert (out["min_qty"] == want["min_qty"]).all()
    assert (out["max_qty"] == want["max_qty"]).all()


@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=12),
       st.data())
@settings(max_examples=150, deadline=None)
def test_portable_text_hash_batch_composition_invariant(texts, data):
    """portable_text_hash(s) must not depend on what other strings
    share the batch — any co-batching (including NUL-bearing and
    much longer neighbors) yields the same per-row hash as hashing
    the row alone. This is the seed-stable contract every dedup /
    fingerprint path builds on."""
    from ner_ray.util.hashing import portable_text_hash

    # adversarial neighbors: force matrix vs scalar vs bucketed paths
    extra = data.draw(st.lists(
        st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=0x24F),
                min_size=0, max_size=400),
        min_size=0, max_size=10))
    alone = np.array([portable_text_hash(pd.Series([t]))[0] for t in texts])
    together = portable_text_hash(pd.Series(list(texts) + list(extra)))
    assert np.array_equal(together[: len(texts)], alone)
