"""Round-4 scale-safety suite for the near-dup stack:

* star-edge candidate generation (pair_mode="star") — removal survivor
  set equals the all-pairs implementation on fixtures; a planted
  10k-member viral-dup family emits O(m) edges, not O(m^2);
* pair-listing bucket cap — oversized buckets degrade to star edges
  WITH a logged overflow (no-silent-caps), never O(m^2);
* simhash clean-block-subset banding — candidate generation stays
  EXACT (pairs equal brute force at max_hamming 1..3) while the bucket
  keyspace grows past the old 2^16 cap;
* auto-sized shuffle bucket counts — derived from input bytes, outputs
  bucket-count independent;
* re-read (materialize=False) mode — outputs identical to the pinned
  mode.
"""

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ids(ds):
    return sorted(b for batch in ds.iter_batches(batch_format="pyarrow")
                  for b in batch.column("doc_id").to_pylist())


def _pairs(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return []
    t = pa.concat_tables(batches, promote_options="default")
    return sorted(zip(t.column("doc_a").to_pylist(),
                      t.column("doc_b").to_pylist()))


def _dup_corpus_rows():
    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "colorless green ideas sleep furiously every single night"
    return [
        {"doc_id": "a0", "text": base_a},
        {"doc_id": "a1", "text": base_a + " ok"},
        {"doc_id": "a2", "text": base_a + " yes"},
        {"doc_id": "b0", "text": base_b},
        {"doc_id": "b1", "text": base_b + " too"},
        {"doc_id": "c0", "text": "completely unrelated text about ray data"},
        {"doc_id": "d0", "text": "another singleton document with own words"},
    ]


@pytest.fixture()
def dup_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(_dup_corpus_rows()))


# ------------------------------------------------------- star edges


def test_star_and_all_modes_same_survivors(ray_session, dup_ds):
    from ner_ray.stages.neardup import near_dedup_docs

    star = near_dedup_docs(dup_ds, method="minhash", threshold=0.5,
                           pair_mode="star")
    allp = near_dedup_docs(dup_ds, method="minhash", threshold=0.5,
                           pair_mode="all")
    assert _ids(star) == _ids(allp) == ["a0", "b0", "c0", "d0"]


def test_star_and_all_modes_same_survivors_simhash(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import near_dedup_docs

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rng = np.random.default_rng(11)
    rows = []
    for i in range(12):
        rows.append({"doc_id": f"s{i:02d}",
                     "text": " ".join(rng.choice(words, size=30))})
    # planted family: identical word multiset => identical simhash
    fam = " ".join(words)
    for j in range(4):
        rows.append({"doc_id": f"f{j}", "text": fam})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    star = near_dedup_docs(ds, method="simhash", max_hamming=3,
                           pair_mode="star")
    allp = near_dedup_docs(ds, method="simhash", max_hamming=3,
                           pair_mode="all")
    assert _ids(star) == _ids(allp)
    assert "f0" in _ids(star) and "f1" not in _ids(star)


def test_viral_family_emits_linear_edges(ray_session):
    """A 10k-member duplicate family (the post-exact-dedup templated-
    page scenario) must produce m-1 star edges, not m(m-1)/2 pairs —
    the one thing standing between the dedup stack and 1e11 docs."""
    import ray.data as rd

    from ner_ray.stages.neardup import lsh_candidate_pairs, near_dedup_docs

    m = 10_000
    text = ("breaking news template page with identical boilerplate "
            "body repeated across the entire mirror farm tonight")
    rows = [{"doc_id": i, "text": text} for i in range(m)]
    rows.append({"doc_id": m, "text": "one unrelated control document"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).materialize()

    cand = lsh_candidate_pairs(ds, pair_mode="star").materialize()
    # every band bucket holds the same 10k ids -> same m-1 star edges
    assert cand.count() == m - 1
    pairs = _pairs(cand)
    assert pairs[0] == (0, 1) and pairs[-1] == (0, m - 1)

    out = near_dedup_docs(ds, method="minhash", threshold=0.9)
    assert _ids(out) == [0, m]


def test_bucket_cap_degrades_to_star_edges(ray_session):
    from ner_ray.stages.neardup import lsh_candidate_pairs
    import ray.data as rd

    m = 12
    text = "identical boilerplate body for the capped bucket case here"
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": i, "text": text} for i in range(m)]))
    capped = lsh_candidate_pairs(ds, pair_mode="all", max_bucket_size=5)
    assert capped.count() == m - 1          # star fallback, not 66 pairs
    full = lsh_candidate_pairs(ds, pair_mode="all", max_bucket_size=None)
    assert full.count() == m * (m - 1) // 2


def test_bucket_cap_overflow_is_logged(caplog):
    """No-silent-caps: the star fallback announces itself (unit-level —
    inside Ray workers the warning goes to the worker log)."""
    from ner_ray.stages.neardup import _make_bucket_pairs

    g = pd.DataFrame({"doc_id": np.arange(10)})
    with caplog.at_level(logging.WARNING, logger="ner_ray.stages.neardup"):
        out = _make_bucket_pairs("all", 4)(g)
    assert len(out) == 9
    assert any("overflow" in r.message for r in caplog.records)
    # under the cap: full listing, no warning
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="ner_ray.stages.neardup"):
        out = _make_bucket_pairs("all", 100)(g)
    assert len(out) == 45 and not caplog.records


def test_bad_pair_mode_rejected():
    from ner_ray.stages.neardup import (
        _bucketed_pair_emitter,
        _make_bucket_pairs,
    )

    with pytest.raises(ValueError):
        _make_bucket_pairs("both")
    with pytest.raises(ValueError):
        _bucketed_pair_emitter(["k"], "both", None)


@pytest.mark.parametrize("mode,cap", [("all", None), ("all", 4),
                                      ("star", None)])
def test_vectorized_emitter_matches_reference(mode, cap):
    """The coarse-bucketed vectorized emitter (production path) must
    emit exactly the pairs of the per-group reference implementation
    on random multi-group data, in every mode."""
    from ner_ray.stages.neardup import (
        _bucketed_pair_emitter,
        _make_bucket_pairs,
    )

    rng = np.random.default_rng(31)
    g = pd.DataFrame({
        "band_id": rng.integers(0, 3, size=300),
        "band_hash": rng.integers(0, 12, size=300),
        "doc_id": rng.integers(0, 40, size=300),
    })
    got = _bucketed_pair_emitter(["band_id", "band_hash"], mode, cap)(g)
    ref_fn = _make_bucket_pairs(mode, cap)
    ref = (g.groupby(["band_id", "band_hash"], sort=True)
           .apply(lambda x: ref_fn(x), include_groups=False)
           .reset_index(drop=True))
    key = lambda d: sorted(map(tuple, d[["doc_a", "doc_b"]]
                               .drop_duplicates().to_numpy()))
    assert key(got) == key(ref)


# ------------------------------------------------ simhash wide bands


def _brute_hamming_pairs(ids, sigs, max_hamming):
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = int(bin(int(sigs[i]) ^ int(sigs[j])).count("1"))
            if d <= max_hamming:
                out.append((ids[i], ids[j]))
    return sorted(out)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_simhash_pairs_equal_brute_force(ray_session, k):
    """Candidate generation is EXACT by pigeonhole, so the final pair
    set must equal the brute-force Hamming scan at every k."""
    import ray.data as rd

    from ner_ray.stages.neardup import simhash_batch, simhash_near_dups

    vocab = ("aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr "
             "ss tt uu vv ww xx").split()
    rng = np.random.default_rng(23)
    rows = []
    for i in range(40):
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, size=12))})
    # near-identical family: one word swapped flips few simhash bits
    base = " ".join(vocab[:12])
    for j in range(4):
        rows.append({"doc_id": 100 + j,
                     "text": base + (" " + vocab[12 + j] if j else "")})
    tbl = pa.Table.from_pylist(rows)
    sig = simhash_batch(tbl)
    expected = _brute_hamming_pairs(
        sig.column("doc_id").to_pylist(),
        sig.column("simhash").to_numpy(zero_copy_only=False), k)

    ds = rd.from_arrow(tbl)
    got = simhash_near_dups(ds, max_hamming=k)
    assert _pairs(got) == expected


def test_simhash_table_schedule_geometry():
    """k=3: C(6,3)=20 tables, 32-bit keys — the band keyspace is no
    longer capped at 2^16."""
    from ner_ray.stages.neardup import _simhash_tables

    tables, widths, offsets = _simhash_tables(3)
    assert len(tables) == 20
    assert sum(widths) == 64 and len(widths) == 6
    assert offsets[0] == 0 and offsets[-1] + widths[-1] == 64
    for tbl in tables:
        key_bits = sum(widths[b] for b in tbl)
        assert 31 <= key_bits <= 33          # ~32-bit keys, >> 16

    t1, w1, _ = _simhash_tables(1)
    assert len(t1) == 2 and sum(w1) == 64
    t0, w0, _ = _simhash_tables(0)
    assert t0 == [(0,)] and w0 == [64]


def test_embedding_lsh_bucket_cap_star_fallback(ray_session):
    """A viral family of identical vectors over the cap must still
    connect (star edges to the bucket min), never O(m^2) matmul."""
    import ray.data as rd

    from ner_ray.stages.similarity import cosine_dup_pairs_lsh

    rng = np.random.default_rng(3)
    fam = rng.standard_normal(16)
    rows = [{"vec_id": i, "embedding": fam.tolist()} for i in range(8)]
    rows += [{"vec_id": 100 + i,
              "embedding": rng.standard_normal(16).tolist()}
             for i in range(10)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    capped = cosine_dup_pairs_lsh(ds, threshold=0.95, max_bucket_size=4)
    got = _pairs(capped.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "sim"]),
        batch_format="pyarrow"))
    assert got == [(0, i) for i in range(1, 8)]     # star of the family
    full = cosine_dup_pairs_lsh(ds, threshold=0.95)
    assert len(_pairs(full.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "sim"]),
        batch_format="pyarrow"))) == 8 * 7 // 2


# ------------------------------------------- auto-sized bucket counts


def test_auto_buckets_scale_with_input_bytes(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import _auto_buckets

    small = rd.from_arrow(pa.table(
        {"doc_id": list(range(10)), "text": ["x" * 100] * 10})) \
        .materialize()
    big = rd.from_arrow(pa.table(
        {"doc_id": list(range(200)), "text": ["y" * 2000] * 200})) \
        .materialize()
    # tiny target so the scaling shows at fixture size
    b_small = _auto_buckets(small, target_bytes=1 << 10)
    b_big = _auto_buckets(big, target_bytes=1 << 10)
    assert b_big > b_small >= 16
    # clamps: floor without size info, ceiling at 2^16
    assert _auto_buckets(small) == 16          # default 128MiB target
    assert _auto_buckets(big, target_bytes=1) == 1 << 16


def test_dedup_paragraphs_output_bucket_count_independent(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import dedup_paragraphs

    rows = [
        {"doc_id": 1, "text": "shared para\nunique one\nshared tail"},
        {"doc_id": 2, "text": "shared para\nunique two\nshared tail"},
        {"doc_id": 3, "text": "unique three\nshared para"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))

    def out(nb):
        o = dedup_paragraphs(ds, num_buckets=nb).to_pandas()
        return o.sort_values("doc_id").reset_index(drop=True)

    auto = dedup_paragraphs(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out(3), out(64))
    pd.testing.assert_frame_equal(out(64), auto)


def test_exact_dedup_docs_auto_equals_fixed(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import exact_dedup_docs

    rows = [{"doc_id": i, "text": f"t{i % 4}"} for i in range(20)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    auto = exact_dedup_docs(ds)
    fixed = exact_dedup_docs(ds, num_buckets=64)
    assert _ids(auto) == _ids(fixed) == [0, 1, 2, 3]


# -------------------------------------------------- re-read mode


def test_exact_dedup_docs_reread_mode_identical(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import exact_dedup_docs

    rows = [{"doc_id": i, "text": f"t{i % 7}"} for i in range(30)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    pinned = exact_dedup_docs(ds, materialize=True)
    reread = exact_dedup_docs(ds, materialize=False)
    assert _ids(pinned) == _ids(reread) == list(range(7))


def test_near_dedup_docs_reread_mode_identical(ray_session, dup_ds):
    from ner_ray.stages.neardup import near_dedup_docs

    pinned = near_dedup_docs(dup_ds, method="minhash", threshold=0.5,
                             materialize=True)
    reread = near_dedup_docs(dup_ds, method="minhash", threshold=0.5,
                             materialize=False)
    assert _ids(pinned) == _ids(reread) == ["a0", "b0", "c0", "d0"]


# -------------------------------------------------- semi filter mode


def test_anti_filter_semi_mode_both_paths(ray_session):
    import ray.data as rd

    from ner_ray.stages.neardup import anti_filter_docs

    docs = rd.from_arrow(pa.table({
        "doc_id": list(range(10)),
        "text": [f"d{i}" for i in range(10)]}))
    keys = rd.from_arrow(pa.table({"k": [2, 5, 7]}))
    semi_b = anti_filter_docs(docs, keys, drop_col="k", anti=False)
    assert _ids(semi_b) == [2, 5, 7]
    semi_s = anti_filter_docs(docs, keys, drop_col="k", anti=False,
                              max_broadcast_drops=0, num_buckets=4)
    assert _ids(semi_s) == [2, 5, 7]
    # empty key set: semi keeps nothing (anti keeps all)
    empty = keys.filter(expr="k > 100")
    assert anti_filter_docs(docs, empty, drop_col="k",
                            anti=False).count() == 0
    assert anti_filter_docs(docs, empty, drop_col="k").count() == 10
