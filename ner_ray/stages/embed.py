"""Text -> embedding inference stage — the actor-pool plumbing a real
encoder (sentence-transformers / ONNX / any batch text encoder) slots
into. No model runtime is installable in this environment, so the
MODEL is pluggable and a deterministic hashed-random-projection
encoder ships as the default: it exercises every piece of the real
path (actor-pool construction, per-actor model load, batched encode,
``list<float>`` Arrow output, optional L2 normalization, downstream
compatibility with stages/similarity.py / semdedup.py / decontam.py)
and is itself a legitimate cheap featurizer (hashed bag-of-ngrams
projected to d dims — the fastText/DSIR feature family).

Contract for a real encoder: pass ``encoder_factory`` — a zero-arg
callable returning an object with ``encode(list[str]) -> (n, d)
ndarray``. The factory runs ONCE per actor in ``__init__`` (model
load), never per batch; batches arrive text-only and leave with the
embedding column appended. Size ``concurrency`` x ``num_cpus`` (or
num_gpus for a GPU encoder) to the cluster; keep ``batch_size``
small enough that (batch x d floats) x concurrency fits worker heaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.stages.dsir import _feature_buckets
from ner_ray.util.hashing import hash_str


class HashedProjectionEncoder:
    """Deterministic stand-in encoder: hashed unigram+bigram counts
    (L1-normalized) projected through a seeded Gaussian matrix, then
    L2-normalized. Pure function of (text, dim, seed) — identical on
    any cluster size / layout / retry."""

    def __init__(self, dim: int = 64, num_buckets: int = 4096,
                 seed: int = 0, n: int = 2):
        self.dim, self.num_buckets, self.n = dim, num_buckets, n
        rng = np.random.default_rng(
            np.uint64(hash_str(f"embed-proj:{seed}")))
        self.proj = rng.normal(
            size=(num_buckets, dim)).astype(np.float64) / np.sqrt(dim)

    def encode(self, texts: list[str]) -> np.ndarray:
        row, b = _feature_buckets(
            pa.array([t if t is not None else "" for t in texts],
                     pa.string()),
            self.num_buckets, self.n)
        out = np.zeros((len(texts), self.dim))
        if len(b):
            w = np.ones(len(b))
            totals = np.bincount(row, weights=w, minlength=len(texts))
            np.add.at(out, row, self.proj[b] / np.maximum(
                totals[row], 1.0)[:, None])
        return out


class EncoderStage:
    """Actor-pool stage: text_col -> + emb_col (list<float64>).
    The encoder is built once per actor (model load happens HERE)."""

    def __init__(self, encoder_factory=None, text_col: str = "text",
                 emb_col: str = "embedding", normalize: bool = True):
        self.enc = (encoder_factory or HashedProjectionEncoder)()
        self.text_col, self.emb_col = text_col, emb_col
        self.normalize = normalize

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(t.column(self.text_col), "").to_pylist()
        m = np.asarray(self.enc.encode(texts), dtype=np.float64)
        if m.ndim != 2 or m.shape[0] != len(t):
            raise ValueError(
                f"encoder returned shape {m.shape} for {len(t)} texts")
        if self.normalize:
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.maximum(norms, 1e-12)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), m.shape[1]) \
            .cast(pa.list_(pa.float64()))
        if self.emb_col in t.column_names:
            t = t.drop_columns([self.emb_col])
        return t.append_column(self.emb_col, col)


def embed_texts(ds, encoder_factory=None, text_col: str = "text",
                emb_col: str = "embedding", normalize: bool = True,
                batch_size: int = 256, concurrency=(1, 8),
                num_cpus: float = 1, num_gpus: float = 0):
    """Append an embedding column to every row — map-only, streams at
    any scale. ``encoder_factory`` builds the model once per actor;
    omit it for the deterministic hashed-projection featurizer. The
    output column is ``list<double>`` — the exact shape
    similarity.ann_topk / semdedup / semantic_decontaminate consume."""
    kwargs = dict(
        fn_constructor_kwargs={
            "encoder_factory": encoder_factory, "text_col": text_col,
            "emb_col": emb_col, "normalize": normalize},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(EncoderStage, **kwargs)
