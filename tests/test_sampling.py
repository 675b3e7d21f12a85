"""Deterministic sampling / domain mixing: layout independence,
proportion math, stratified semantics."""

from __future__ import annotations

import numpy as np
import pytest

from ner_ray.stages.sampling import (
    domain_counts,
    downsample_to_mix,
    hash_sample,
    mix_fractions,
    stratified_sample,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"


def _docs(rd, blocks=None):
    kw = {"columns": ["doc_id", "source"]}
    if blocks:
        kw["override_num_blocks"] = blocks
    return rd.read_parquet(DOCS, **kw)


def test_hash_sample_layout_independent(ray_session):
    """Same surviving ids regardless of block layout or repartition —
    the property Ray's random_sample does not have."""
    import ray.data as rd

    a = set(hash_sample(_docs(rd, 1), 0.3).to_pandas()["doc_id"])
    b = set(hash_sample(_docs(rd, 7), 0.3).to_pandas()["doc_id"])
    c = set(hash_sample(_docs(rd).repartition(5), 0.3)
            .to_pandas()["doc_id"])
    assert a == b == c
    n = _docs(rd).count()
    assert abs(len(a) / n - 0.3) < 0.06
    # different seed -> different (but still deterministic) sample
    d = set(hash_sample(_docs(rd), 0.3, seed=7).to_pandas()["doc_id"])
    assert d != a
    with pytest.raises(ValueError):
        hash_sample(_docs(rd), 1.5)


def test_hash_sample_is_nested(ray_session):
    """fraction=0.1 sample is a subset of the fraction=0.5 sample under
    the same seed (threshold semantics) — lets pipelines grow a sample
    without resampling everything."""
    import ray.data as rd

    small = set(hash_sample(_docs(rd), 0.1).to_pandas()["doc_id"])
    big = set(hash_sample(_docs(rd), 0.5).to_pandas()["doc_id"])
    assert small <= big


def test_stratified_sample_per_domain(ray_session):
    import ray.data as rd

    counts = domain_counts(_docs(rd), "source")
    assert len(counts) >= 2
    domains = sorted(counts)
    fr = {domains[0]: 1.0, domains[1]: 0.25}
    out = stratified_sample(_docs(rd), fr, key_col="source").to_pandas()
    got = out.groupby("source").size().to_dict()
    assert got[domains[0]] == counts[domains[0]]  # fraction 1.0 = all
    assert abs(got[domains[1]] / counts[domains[1]] - 0.25) < 0.08
    # unlisted domains dropped entirely (default_fraction=0)
    assert set(got) == {domains[0], domains[1]}


def test_mix_fractions_math():
    counts = {"web": 1000, "books": 100, "code": 400}
    fr = mix_fractions(counts, {"web": 0.5, "books": 0.25, "code": 0.25})
    # books is scarcest relative to its target -> binds at 1.0
    assert fr["books"] == 1.0
    kept = {k: counts[k] * fr[k] for k in fr}
    tot = sum(kept.values())
    assert abs(kept["web"] / tot - 0.5) < 1e-9
    assert abs(kept["books"] / tot - 0.25) < 1e-9
    # weights normalize; zero-weight domains are excluded
    fr2 = mix_fractions(counts, {"web": 2, "books": 1, "code": 1})
    assert fr2 == fr
    with pytest.raises(ValueError):
        mix_fractions(counts, {"web": 0.5, "missing": 0.5})
    with pytest.raises(ValueError):
        mix_fractions(counts, {"web": 0.0})


def test_downsample_to_mix_end_to_end(ray_session):
    import ray.data as rd

    counts = domain_counts(_docs(rd), "source")
    domains = sorted(counts)[:2]
    targets = {domains[0]: 0.7, domains[1]: 0.3}
    sampled, fracs = downsample_to_mix(_docs(rd), targets,
                                       key_col="source")
    got = sampled.to_pandas().groupby("source").size()
    tot = got.sum()
    # realized mix within sampling noise of the target
    assert abs(got[domains[0]] / tot - 0.7) < 0.08
    assert set(got.index) == set(domains)
    # one domain binds at 1.0
    assert max(fracs.values()) == 1.0


def test_stratified_sample_null_keys_use_default(ray_session):
    """factorize codes nulls as -1; they must sample at
    default_fraction, not wrap to the last domain's rate."""
    import ray.data as rd

    ds = rd.from_items([
        {"doc_id": f"d{i}", "source": None if i % 3 == 0 else "z"}
        for i in range(300)
    ])
    out = stratified_sample(ds, {"z": 1.0}, default_fraction=0.0) \
        .to_pandas()
    # every null-source row dropped, every z row kept
    assert out["source"].notna().all()
    assert len(out) == 200
    # and the reverse: nulls kept when default_fraction = 1.0
    out2 = stratified_sample(ds, {"z": 0.0}, default_fraction=1.0) \
        .to_pandas()
    assert out2["source"].isna().all()
    assert len(out2) == 100


def test_mix_fractions_rejects_negative_weights():
    with pytest.raises(ValueError, match=">= 0"):
        mix_fractions({"a": 10, "b": 10}, {"a": 1.0, "b": -0.5})
