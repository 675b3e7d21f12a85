"""split_by_hash: disjoint-exhaustive membership, proportions, layout
independence, hash_sample consistency, validation."""

import numpy as np
import pytest

PATH = "/root/testdata/sf0.001/documents.parquet"
FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ids(ds):
    return set(r["doc_id"] for b in ds.iter_batches(batch_format="pandas")
               for r in b.to_dict("records"))


def test_disjoint_exhaustive(ray_session):
    import ray.data as rd

    from ner_ray.stages.sampling import split_by_hash

    ds = rd.read_parquet(PATH, columns=["doc_id", "text"])
    splits = split_by_hash(ds, FRACS)
    got = {k: _ids(v) for k, v in splits.items()}
    all_ids = _ids(ds)
    assert set().union(*got.values()) == all_ids
    assert sum(len(v) for v in got.values()) == len(all_ids)  # disjoint
    # proportions: binomial tolerance on 500 rows
    n = len(all_ids)
    for k, f in FRACS.items():
        assert abs(len(got[k]) / n - f) < 4 * np.sqrt(f * (1 - f) / n)


def test_layout_independent_and_seeded(ray_session):
    import ray.data as rd

    from ner_ray.stages.sampling import split_by_hash

    ds = rd.read_parquet(PATH, columns=["doc_id"])
    a = {k: _ids(v) for k, v in split_by_hash(ds, FRACS).items()}
    b = {k: _ids(v) for k, v in
         split_by_hash(ds.repartition(13), FRACS).items()}
    assert a == b
    c = {k: _ids(v) for k, v in split_by_hash(ds, FRACS, seed=7).items()}
    assert a["train"] != c["train"]


def test_first_split_equals_hash_sample(ray_session):
    import ray.data as rd

    from ner_ray.stages.sampling import hash_sample, split_by_hash

    ds = rd.read_parquet(PATH, columns=["doc_id"])
    split_train = _ids(split_by_hash(ds, FRACS)["train"])
    sampled = _ids(hash_sample(ds, 0.8))
    assert split_train == sampled


def test_validation(ray_session):
    import ray.data as rd

    from ner_ray.stages.sampling import split_by_hash

    ds = rd.read_parquet(PATH, columns=["doc_id"])
    with pytest.raises(ValueError):
        split_by_hash(ds, {"train": 0.8, "val": 0.1})  # sums to 0.9
    with pytest.raises(ValueError):
        split_by_hash(ds, {"all": 1.0})  # single split
    with pytest.raises(ValueError):
        split_by_hash(ds, {"a": 1.2, "b": -0.2})
