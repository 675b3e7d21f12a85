"""Embedding-inference stage (stages/embed.py):

* output shape/type contract (list<double>, L2-normalized) and
  determinism across layouts/seeds;
* downstream compatibility: the produced column feeds ann_topk and
  semantic_decontaminate unchanged;
* a custom encoder_factory is honored (built per actor, not per
  batch) and bad shapes raise;
* similar texts land closer than dissimilar ones (the projection is a
  real featurizer, not noise).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.stages.embed import HashedProjectionEncoder, embed_texts


def _docs():
    return pd.DataFrame({
        "doc_id": list(range(6)),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox leaps over the lazy dog",
            "stock markets rallied on strong earnings reports",
            "stock markets fell on weak earnings reports",
            "",
            None,
        ],
    })


def _collect(ds):
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow")))


def test_shape_norm_and_determinism(ray_session):
    import ray.data as rd

    df = _docs()
    a = _collect(embed_texts(rd.from_pandas(df).repartition(1)))
    b = _collect(embed_texts(rd.from_pandas(df).repartition(5)))
    assert a.schema.field("embedding").type == pa.list_(pa.float64())
    am = np.array(a.sort_by("doc_id").column("embedding").to_pylist())
    bm = np.array(b.sort_by("doc_id").column("embedding").to_pylist())
    assert am.shape == (6, 64)
    np.testing.assert_array_equal(am, bm)
    norms = np.linalg.norm(am, axis=1)
    assert np.allclose(norms[:4], 1.0)        # non-empty rows unit norm
    assert np.allclose(norms[4:], 0.0)        # empty/null rows zero vec


def test_similar_texts_closer(ray_session):
    import ray.data as rd

    m = np.array(_collect(embed_texts(rd.from_pandas(_docs())))
                 .sort_by("doc_id").column("embedding").to_pylist())
    sim_close = m[0] @ m[1]       # one-word-different sentences
    sim_far = m[0] @ m[2]         # unrelated topics
    assert sim_close > sim_far + 0.2


def test_feeds_similarity_and_decontam(ray_session):
    import ray.data as rd

    from ner_ray.stages.decontam import semantic_decontaminate
    from ner_ray.stages.similarity import ann_topk

    df = _docs().iloc[:4]
    emb = embed_texts(rd.from_pandas(df), emb_col="embedding") \
        .map_batches(lambda t: t.rename_columns(
            ["vec_id", "text", "embedding"]), batch_format="pyarrow")
    m = np.array(_collect(emb).sort_by("vec_id")
                 .column("embedding").to_pylist())
    top = ann_topk(emb.drop_columns(["text"]), m[0], k=2,
                   exclude_ids={0}).to_pandas()
    assert top.iloc[0]["vec_id"] == 1         # the near-paraphrase
    kept = semantic_decontaminate(emb, eval_matrix=m[:1], tau=0.95)
    ids = sorted(_collect(kept).column("vec_id").to_pylist())
    assert 0 not in ids and 2 in ids and 3 in ids


def test_custom_encoder_and_bad_shape(ray_session):
    import ray.data as rd

    class TwoDim:
        def encode(self, texts):
            return np.array([[len(t), 1.0] for t in texts])

    df = _docs().iloc[:3]
    out = _collect(embed_texts(rd.from_pandas(df),
                               encoder_factory=TwoDim,
                               normalize=False))
    m = np.array(out.sort_by("doc_id").column("embedding").to_pylist())
    assert m.shape == (3, 2)
    assert m[0, 0] == len(df["text"][0])

    class Bad:
        def encode(self, texts):
            return np.zeros((1, 2))

    with pytest.raises(Exception, match="shape"):
        _collect(embed_texts(rd.from_pandas(df), encoder_factory=Bad))


def test_projection_encoder_pure():
    e1 = HashedProjectionEncoder(dim=16, seed=3)
    e2 = HashedProjectionEncoder(dim=16, seed=3)
    np.testing.assert_array_equal(e1.encode(["a b c"]),
                                  e2.encode(["a b c"]))
    e3 = HashedProjectionEncoder(dim=16, seed=4)
    assert not np.array_equal(e1.encode(["a b c"]), e3.encode(["a b c"]))
