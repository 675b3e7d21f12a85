"""Incremental dedup vs a persisted fingerprint index: exact-leg
equivalence with joint dedup, near-dup drops across generations,
append/idempotence, manifest bookkeeping, and layout independence."""

import pyarrow as pa
import pytest


def _tbl(rows):
    return pa.Table.from_pylist(rows)


BASE_A = "the quick brown fox jumps over the lazy dog again and again"
BASE_B = "colorless green ideas sleep furiously every single night ok fine"


def _corpus_a():
    return [
        {"doc_id": "a0", "text": BASE_A},
        {"doc_id": "a1", "text": BASE_B},
        {"doc_id": "a2", "text": "a standalone document about ray data and arrow"},
    ]


def _corpus_b():
    return [
        {"doc_id": "b0", "text": BASE_A},                # exact dup of a0
        {"doc_id": "b1", "text": BASE_A + " ok"},        # near dup of a0
        {"doc_id": "b2", "text": "fresh unseen words entirely new content here today"},
        {"doc_id": "b3", "text": "fresh unseen words entirely new content here today"},  # exact dup of b2
        {"doc_id": "b4", "text": BASE_B + " too"},       # near dup of a1
    ]


def _ids(ds):
    return sorted(b for batch in ds.iter_batches(batch_format="pyarrow")
                  for b in batch.column("doc_id").to_pylist())


@pytest.fixture()
def minhash_index(ray_session, tmp_path):
    import ray.data as rd

    from ner_ray.stages.incdedup import build_dedup_index

    idx = str(tmp_path / "idx")
    build_dedup_index(rd.from_arrow(_tbl(_corpus_a())), idx,
                      method="minhash")
    return idx


def test_manifest_counts(ray_session, minhash_index):
    from ner_ray.stages.incdedup import _read_manifest

    m = _read_manifest(minhash_index)
    assert m["n_docs"] == 3
    assert m["method"] == "minhash"
    assert m["generations"] == [{"n_docs": 3}]


def test_minhash_increment_drops_exact_and_near(ray_session, minhash_index):
    import ray.data as rd

    from ner_ray.stages.incdedup import dedup_against_index

    out = dedup_against_index(rd.from_arrow(_tbl(_corpus_b())),
                              minhash_index, threshold=0.5)
    # b0 exact-dups a0; b1 near-dups a0; b4 near-dups a1; b3 exact-dups
    # b2 within the increment -> only b2 survives
    assert _ids(out) == ["b2"]


def test_exact_index_keeps_near_dups(ray_session, tmp_path):
    import ray.data as rd

    from ner_ray.stages.incdedup import build_dedup_index, dedup_against_index

    idx = str(tmp_path / "idx_exact")
    build_dedup_index(rd.from_arrow(_tbl(_corpus_a())), idx, method="exact")
    out = dedup_against_index(rd.from_arrow(_tbl(_corpus_b())), idx)
    # exact matches (b0) and within-increment exacts (b3) drop; near
    # dups (b1, b4) survive an exact-only index
    assert _ids(out) == ["b1", "b2", "b4"]


def test_exact_leg_matches_joint_dedup(ray_session, tmp_path):
    """Incremental exact dedup == joint exact_dedup_docs(A ∪ B)
    restricted to B, when A ids order before B ids (the incremental
    contract: the past is immutable)."""
    import ray.data as rd

    from ner_ray.stages.incdedup import build_dedup_index, dedup_against_index
    from ner_ray.stages.neardup import exact_dedup_docs

    a, b = _tbl(_corpus_a()), _tbl(_corpus_b())
    idx = str(tmp_path / "idx_joint")
    build_dedup_index(rd.from_arrow(a), idx, method="exact")
    inc = _ids(dedup_against_index(rd.from_arrow(b), idx))
    joint = _ids(exact_dedup_docs(
        rd.from_arrow(pa.concat_tables([a, b]))))
    assert inc == sorted(i for i in joint if i.startswith("b"))


def test_append_makes_rerun_empty_and_guards_next_gen(ray_session,
                                                      minhash_index):
    import ray.data as rd

    from ner_ray.stages.incdedup import _read_manifest, dedup_against_index

    out = dedup_against_index(rd.from_arrow(_tbl(_corpus_b())),
                              minhash_index, threshold=0.5, append=True)
    assert _ids(out) == ["b2"]
    m = _read_manifest(minhash_index)
    assert m["n_docs"] == 4
    assert m["generations"] == [{"n_docs": 3}, {"n_docs": 1}]

    # replaying the same increment: everything now exact-matches gen 2
    again = dedup_against_index(rd.from_arrow(_tbl(_corpus_b())),
                                minhash_index, threshold=0.5)
    assert _ids(again) == []

    # a third generation near-dupping a SECOND-generation survivor
    c = [{"doc_id": "c0",
          "text": "fresh unseen words entirely new content here today yes"},
         {"doc_id": "c1", "text": "totally novel third generation text"}]
    out_c = dedup_against_index(rd.from_arrow(_tbl(c)), minhash_index,
                                threshold=0.5)
    assert _ids(out_c) == ["c1"]


def test_layout_independence(ray_session, minhash_index):
    import ray.data as rd

    from ner_ray.stages.incdedup import dedup_against_index

    one = dedup_against_index(
        rd.from_arrow(_tbl(_corpus_b())).repartition(1), minhash_index,
        threshold=0.5)
    many = dedup_against_index(
        rd.from_arrow(_tbl(_corpus_b())).repartition(5), minhash_index,
        threshold=0.5)
    assert _ids(one) == _ids(many)


def test_stale_index_format_rejected(ray_session, minhash_index):
    import json

    import ray.data as rd

    from ner_ray.stages.incdedup import MANIFEST, dedup_against_index

    # regression: the shingle-hash kernel changed in format v2 — a v1
    # index's band keys/signatures would silently miss every near-dup.
    # A manifest claiming an older format must hard-fail, not degrade.
    mpath = f"{minhash_index}/{MANIFEST}"
    m = json.loads(open(mpath).read())
    m["format"] = 1
    open(mpath, "w").write(json.dumps(m))
    with pytest.raises(ValueError, match="format"):
        dedup_against_index(rd.from_arrow(_tbl(_corpus_b())),
                            minhash_index)
