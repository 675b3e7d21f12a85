"""Vectorized text kernels shared by the hot stages.

All operate on pandas Series / numpy arrays with C-level kernels; the
only Python-per-item loops in the package run over *unique* values
(factorize trick) or over sparse events (gazetteer matches, mentions),
never over every token.

Semantics mirror the frozen reference oracle exactly (ASCII-equivalent
regex char classes; the fixture corpus is ASCII).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize_series(tokens: pd.Series) -> pd.Series:
    """oracle.norm: lowercase + digits -> '0'."""
    return tokens.str.lower().str.replace(r"\d", "0", regex=True)


def shape_series(tokens: pd.Series) -> pd.Series:
    """oracle.shape: char classes X/x/0/p with runs collapsed."""
    s = tokens.str.replace(r"[A-Z]", "X", regex=True)
    s = s.str.replace(r"[a-z]", "x", regex=True)
    s = s.str.replace(r"[0-9]", "0", regex=True)
    s = s.str.replace(r"[^Xx0]", "p", regex=True)
    return s.str.replace(r"(.)\1+", r"\1", regex=True)


def map_to_ids(values: pd.Series, mapping: dict[str, int]) -> np.ndarray:
    """Map strings -> int ids via dict, visiting each UNIQUE value once.

    factorize() is a C kernel; the Python dict lookups run only over the
    batch's unique values (small: vocab + names), then a numpy gather
    scatters them back. Unknown values -> 0 (the OOV/pad row).
    """
    codes, uniques = pd.factorize(values, use_na_sentinel=True)
    lut = np.fromiter(
        (mapping.get(u, 0) for u in uniques), dtype=np.int64, count=len(uniques)
    )
    lut = np.concatenate([lut, [0]])  # NA code (-1) -> last slot -> 0
    return lut[codes]


def map_to_strings(values: pd.Series, mapping: dict[str, str],
                   default: str = "") -> np.ndarray:
    """Like map_to_ids but to strings (e.g. ngram -> ne_type)."""
    codes, uniques = pd.factorize(values, use_na_sentinel=True)
    lut = np.array(
        [mapping.get(u, default) for u in uniques] + [default], dtype=object
    )
    return lut[codes]


def shifted_within_seq(ids: np.ndarray, seq_id: np.ndarray, offset: int,
                       fill: int = 0) -> np.ndarray:
    """ids shifted by `offset` tokens, zeroed across sequence boundaries.

    offset=+1 returns the id of the NEXT token in the same sequence
    (Wapiti %x[+1,col]); out-of-sequence positions get `fill` (the
    OOV/pad row, contributing zero weight).
    """
    n = len(ids)
    out = np.full(n, fill, dtype=ids.dtype)
    if n == 0 or offset == 0:
        return ids.copy() if offset == 0 else out
    if offset > 0:
        valid = seq_id[:-offset] == seq_id[offset:]
        out[:-offset][valid] = ids[offset:][valid]
    else:
        k = -offset
        valid = seq_id[k:] == seq_id[:-k]
        out[k:][valid] = ids[:-k][valid]
    return out


def ngrams_within_seq(norm: pd.Series, seq_id: np.ndarray, L: int) -> pd.Series:
    """Space-joined L-grams starting at each token; positions whose
    L-gram would cross a sequence boundary get NA."""
    if L == 1:
        return norm
    parts = [norm.reset_index(drop=True)]
    valid = np.ones(len(norm), dtype=bool)
    for k in range(1, L):
        shifted = norm.shift(-k)
        parts.append(shifted.reset_index(drop=True))
        v = np.zeros(len(norm), dtype=bool)
        v[:-k] = seq_id[:-k] == seq_id[k:]
        valid &= v
    out = parts[0].str.cat(parts[1:], sep=" ")
    return out.where(valid)
