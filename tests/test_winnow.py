"""Winnowing fingerprints: the shared-run guarantee (two docs sharing
a run of >= w+k-1 words share a fingerprint), determinism, and the
fingerprint-candidate pipeline finding planted near-dups."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_shared_run_guarantee_and_determinism():
    from ner_ray.stages.textstats import winnow_fingerprint_batch

    shared = "the quick brown fox jumps over the lazy dog again"
    t = _docs_table([
        f"alpha beta {shared} gamma delta",
        f"one two three {shared} four five six",
        "completely different words with no overlap here at all",
    ])
    out = winnow_fingerprint_batch(t, k=3, w=4).to_pandas()
    by_doc = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    assert by_doc[0] & by_doc[1], "shared 10-word run must share a fp"
    assert not (by_doc[0] & by_doc[2])
    # deterministic across calls
    again = winnow_fingerprint_batch(t, k=3, w=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["doc_id", "fp"]).reset_index(drop=True),
        again.sort_values(["doc_id", "fp"]).reset_index(drop=True))


def test_short_docs_get_min_fingerprint():
    from ner_ray.stages.textstats import winnow_fingerprint_batch

    t = _docs_table(["just three words here", "", "a b"])
    out = winnow_fingerprint_batch(t, k=3, w=4).to_pandas()
    # doc 0 has 2 shingles (< w) -> one global-min fp; doc 1 and 2
    # have no 3-shingles -> nothing
    assert set(out["doc_id"]) == {0}
    assert len(out[out["doc_id"] == 0]) == 1


def test_winnow_candidates_find_planted_dups(ray_session):
    import ray.data as rd

    from ner_ray.stages.textstats import winnow_dup_candidates

    base = ("records show the committee approved the annual budget "
            "during the spring session of parliament")
    texts = [f"{base} variant {i}" for i in range(3)]
    # fillers must not share any >= w+k-1 word run with each other —
    # winnowing GUARANTEES catching such runs (that is the point)
    words = ("apple boat cloud desk ember fig grove hill iris jade "
             "kiln lemon moss nook opal pine quartz reef stone tide "
             "umber vale wick xenon yarn zinc arch bloom crest dune").split()
    rng = np.random.default_rng(5)
    texts += [" ".join(rng.permutation(words)[:12]) for _ in range(20)]
    ds = rd.from_arrow(_docs_table(texts)).repartition(3)
    pairs = winnow_dup_candidates(ds, min_shared=2).to_pandas()
    got = {tuple(sorted(p)) for p in
           zip(pairs["doc_a"], pairs["doc_b"])}
    assert {(0, 1), (0, 2), (1, 2)} <= got
    assert all(a < 3 and b < 3 for a, b in got), got
