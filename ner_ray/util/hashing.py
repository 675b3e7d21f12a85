"""Seed-stable 64-bit content hashing (vectorized).

Everything downstream (dedup keys, shuffle buckets, salting, MinHash)
depends on hashes being identical across processes and runs. Python's
builtin ``hash()`` is salted per process — never used here. We build on
``pandas.util.hash_pandas_object`` (a fixed-key SipHash-like C kernel,
deterministic for a given pandas version, which is pinned in this
environment) plus a splitmix64 finalizer for mixing/combining.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_SEED = np.uint64(0x243F6A8885A308D3)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer; x is uint64 ndarray (wrapping arithmetic)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


def hash_column(values) -> np.ndarray:
    """Stable uint64 hash of a column (str/int/float/bytes).

    Accepts a pandas Series, numpy array, pyarrow Array/ChunkedArray or
    a Python list. Vectorized (C kernel); no Python per-row loop.
    """
    if hasattr(values, "to_pandas"):  # pyarrow Array / ChunkedArray
        values = values.to_pandas()
    s = values if isinstance(values, pd.Series) else pd.Series(values)
    if pd.api.types.is_integer_dtype(s.dtype):
        # width-normalize: int32(-1) and int64(-1) must hash equally
        # (pandas hashes the raw two's-complement view otherwise)
        s = s.astype(np.int64)
    h = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
    return _splitmix(h)


def combine_hashes(*hashes: np.ndarray) -> np.ndarray:
    """Order-sensitive combination of equal-length uint64 hash arrays."""
    out = np.full(len(hashes[0]), _SEED, dtype=np.uint64)
    for h in hashes:
        out = (out ^ np.asarray(h, dtype=np.uint64)) * _GOLDEN
    return _splitmix(out)


def hash_columns(*columns) -> np.ndarray:
    """Stable uint64 hash of a tuple of columns (e.g. (subj, pred, obj))."""
    return combine_hashes(*[hash_column(c) for c in columns])


def to_bucket(h: np.ndarray, n_buckets: int) -> np.ndarray:
    """Map uint64 hashes to int64 buckets in [0, n_buckets)."""
    return (np.asarray(h, dtype=np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def hash_str(value: str) -> int:
    """Scalar convenience wrapper (tests, salting single keys)."""
    return int(hash_column(pd.Series([value]))[0])
