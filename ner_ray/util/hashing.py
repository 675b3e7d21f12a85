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


# ------------------------------------------------------------------
# Portable integer hashing (SQL-replicable)
#
# hash_column rides pandas' SipHash-like kernel — deterministic, but
# not reproducible outside this process stack. Sampling DECISIONS
# (keep/drop per row) are part of a pipeline's auditable contract, so
# for integer keys we use pure splitmix64 of the two's-complement bit
# pattern: any engine with 64-bit integer arithmetic can recompute it,
# and the DuckDB correctness oracle does (the generators below emit
# the bit-exact SQL). splitmix64 is a bijective finalizer with full
# avalanche — ample mixing for sampling uniforms.
# ------------------------------------------------------------------

_TWO32_I = 4294967296
_TWO64_I = 18446744073709551616


def splitmix_hash(values) -> np.ndarray:
    """Portable uint64 hash of an INTEGER column: splitmix64 of the
    int64 two's-complement bit pattern (no pandas kernel involved)."""
    if hasattr(values, "to_pandas"):  # pyarrow Array / ChunkedArray
        values = values.to_pandas()
    arr = np.asarray(values, dtype=np.int64).view(np.uint64)
    return _splitmix(arr)


def _sql_mul64(a: str, b: int) -> str:
    """DuckDB expression for (a * b) mod 2^64, a a HUGEINT expression
    in [0, 2^64), b a constant — split into 32-bit halves because a
    full 64x64 product overflows INT128."""
    lo, hi = b & 0xFFFFFFFF, b >> 32
    return (
        f"(((({a}) % {_TWO32_I}::HUGEINT) * {lo}::HUGEINT + "
        f"(((({a}) % {_TWO32_I}::HUGEINT) * {hi}::HUGEINT + "
        f"(({a}) >> 32) * {lo}::HUGEINT) % {_TWO32_I}::HUGEINT) * "
        f"{_TWO32_I}::HUGEINT) % {_TWO64_I}::HUGEINT)")


def _sql_mul64_var(a: str, b: str) -> str:
    """DuckDB expression for (a * b) mod 2^64 with BOTH operands
    HUGEINT expressions in [0, 2^64) — the 32-bit-half split of
    _sql_mul64 with the second operand's halves computed in SQL."""
    return (
        f"(((({a}) % {_TWO32_I}::HUGEINT) * (({b}) % {_TWO32_I}::HUGEINT) + "
        f"(((({a}) % {_TWO32_I}::HUGEINT) * (({b}) >> 32) + "
        f"(({a}) >> 32) * (({b}) % {_TWO32_I}::HUGEINT)) % {_TWO32_I}::HUGEINT) * "
        f"{_TWO32_I}::HUGEINT) % {_TWO64_I}::HUGEINT)")


def _sql_splitmix_steps(col_in: str, tag: str):
    """Stepwise splitmix64 as (column, expression) pairs (nesting the
    expressions textually would grow exponentially)."""
    a, b, c, d, e = (f"_{tag}{i}" for i in range(1, 6))
    return [
        (a, f"xor({col_in}, ({col_in}) >> 30)"),
        (b, _sql_mul64(a, int(_MIX1))),
        (c, f"xor({b}, {b} >> 27)"),
        (d, _sql_mul64(c, int(_MIX2))),
        (e, f"xor({d}, {d} >> 31)"),
    ], e


_FNV_BASIS = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv_fold(strings) -> np.ndarray:
    """Raw FNV-1a code-point fold (pre-splitmix) over a string array.
    The column becomes one padded UCS4 matrix and the fold runs one
    masked numpy op per character position — O(rows × maxlen), so
    callers must keep rows of similar length together (see
    portable_text_hash). NUL code points are SKIPPED (they are
    indistinguishable from padding in the UCS4 matrix); the scalar
    fold and the DuckDB replay skip them identically, so a string
    with an embedded NUL hashes the same on every path and under any
    batch composition."""
    arr = np.asarray(strings, dtype="U")
    h = np.full(len(arr), _FNV_BASIS, dtype=np.uint64)
    maxlen = arr.dtype.itemsize // 4
    if maxlen and len(arr):
        mat = arr.view(np.uint32).reshape(len(arr), maxlen)
        for j in range(maxlen):
            cp = mat[:, j].astype(np.uint64)
            active = cp != 0
            if not active.any():
                # all-dead COLUMN != end of all strings: an embedded
                # NUL row can resurrect later, so never break early
                continue
            h = np.where(active, (h ^ cp) * _FNV_PRIME, h)
    return h


def portable_text_hash(values) -> np.ndarray:
    """Portable uint64 hash of a STRING column: FNV-1a over Unicode
    CODE POINTS (not bytes — both numpy's UCS4 view and DuckDB's
    unicode() see code points natively), finished with splitmix64 for
    avalanche. Null hashes as the empty string.

    Skew guard: the fold pads the batch to a rows × maxlen UCS4
    matrix, so ONE megabyte-long outlier must not pad every row to its
    length (a 1k-row web batch with a 1 MB doc would allocate ~4 GB
    and scan 250k mostly-dead positions). When lengths are skewed,
    rows are grouped into power-of-two length buckets and folded per
    bucket — bit-identical results, work/memory O(Σ 2·len) instead of
    O(rows × maxlen).
    """
    if hasattr(values, "to_pandas"):  # pyarrow Array / ChunkedArray
        values = values.to_pandas()
    s = pd.Series(values).fillna("")
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = s.str.len().to_numpy(dtype=np.int64)
    maxlen = int(lens.max())
    if n == 1 or maxlen <= 64 or maxlen <= 4 * float(lens.mean()):
        return _splitmix(_fnv_fold(s))
    bucket = np.ceil(np.log2(np.maximum(lens, 1) + 1)).astype(np.int64)
    obj = np.asarray(s, dtype=object)
    h = np.empty(n, dtype=np.uint64)
    for b in np.unique(bucket):
        idx = np.nonzero(bucket == b)[0]
        # near-singleton buckets (the megabyte outliers): the matrix
        # fold's per-position numpy dispatch (~µs × len) loses to a
        # scalar fold (~0.4 µs/char); both skip NUL code points
        if len(idx) <= 8:
            h[idx] = _fnv_fold_scalar(obj[idx])
        else:
            h[idx] = _fnv_fold(obj[idx])
    return _splitmix(h)


def _fnv_fold_scalar(strings) -> np.ndarray:
    """Per-string scalar FNV-1a fold, bit-identical to _fnv_fold
    (NUL code points skipped, as the padded-matrix mask does)."""
    out = np.empty(len(strings), dtype=np.uint64)
    mask = (1 << 64) - 1
    prime, basis = int(_FNV_PRIME), int(_FNV_BASIS)
    for i, t in enumerate(strings):
        h = basis
        for cp in map(ord, t):
            if cp:
                h = ((h ^ cp) * prime) & mask
        out[i] = h
    return out


def sql_text_hash_steps(text_col: str, tag: str):
    """(column, expression) steps recomputing portable_text_hash in
    DuckDB: FNV-1a fold via list_reduce over unicode code points, then
    the stepwise splitmix64 finalizer. Feed to sql_steps_to_ctes."""
    fold = (
        f"list_reduce(list_prepend({int(_FNV_BASIS)}::HUGEINT, "
        f"list_transform(string_split(coalesce({text_col}, ''), ''), "
        f"c -> CAST(unicode(c) AS HUGEINT))), "
        # cp = 0 (embedded NUL) is skipped, matching both numpy folds
        f"(h, cp) -> CASE WHEN cp = 0 THEN h "
        f"ELSE {_sql_mul64('xor(h, cp)', int(_FNV_PRIME))} END)")
    raw = f"_{tag}f"
    steps = [(raw,
              f"CASE WHEN coalesce({text_col}, '') = '' "
              f"THEN {int(_FNV_BASIS)}::HUGEINT ELSE {fold} END")]
    sm, final = _sql_splitmix_steps(raw, tag)
    return steps + sm, final


def sql_int_hash_steps(id_col: str, tag: str):
    """(column, expression) steps recomputing splitmix_hash for an
    integer column in DuckDB (two's-complement into [0, 2^64), then
    stepwise splitmix64)."""
    raw = f"_{tag}x"
    steps = [(raw,
              f"CAST(CASE WHEN {id_col} < 0 "
              f"THEN CAST({id_col} AS HUGEINT) + {_TWO64_I}::HUGEINT "
              f"ELSE CAST({id_col} AS HUGEINT) END AS HUGEINT)")]
    sm, final = _sql_splitmix_steps(raw, tag)
    return steps + sm, final


def sql_combine_steps(hash_cols: list[str], tag: str):
    """(column, expression) steps recomputing combine_hashes over
    already-hashed HUGEINT columns."""
    steps, acc = [], f"{int(_SEED)}::HUGEINT"
    for i, h in enumerate(hash_cols):
        col = f"_{tag}c{i}"
        steps.append((col, _sql_mul64(f"xor({acc}, {h})", int(_GOLDEN))))
        acc = col
    sm, final = _sql_splitmix_steps(acc, f"{tag}z")
    return steps + sm, final


def sql_steps_to_ctes(source_sql: str, steps, prefix: str):
    """Chain (column, expression) steps into named CTEs; returns
    (cte_body, final_cte_name)."""
    ctes, prev = [], f"({source_sql})"
    for i, (col, expr) in enumerate(steps):
        name = f"{prefix}{i}"
        ctes.append(f"{name} AS (SELECT *, {expr} AS {col} FROM {prev})")
        prev = name
    return ",\n".join(ctes), prev


def sql_sample_uniform_ctes(source_sql: str, id_col: str, seed: int,
                            prefix: str = "smp") -> tuple[str, str]:
    """DuckDB CTE chain recomputing stages/sampling._uniform01 for
    integer ids BIT-EXACTLY (verified in tests/test_hashing.py over
    random ids): splitmix64(id) combined with the seed constant via
    combine_hashes, then cast to DOUBLE / 2^64 (DuckDB's HUGEINT ->
    DOUBLE cast is the same round-half-even as numpy's).

    Returns (cte_body, final_cte_name); the final CTE carries every
    column of ``source_sql`` plus a DOUBLE column ``_u``.
    """
    sconst = int(hash_str(f"sample-seed:{seed}"))
    steps = [("_x0",
              f"CAST(CASE WHEN {id_col} < 0 "
              f"THEN CAST({id_col} AS HUGEINT) + {_TWO64_I}::HUGEINT "
              f"ELSE CAST({id_col} AS HUGEINT) END AS HUGEINT)")]
    sm1, h = _sql_splitmix_steps("_x0", "a")
    steps += sm1
    # combine_hashes(h, sconst): out = splitmix(((SEED^h)*G ^ sconst)*G)
    steps.append(("_t1", _sql_mul64(f"xor({int(_SEED)}::HUGEINT, {h})",
                                    int(_GOLDEN))))
    steps.append(("_t2", _sql_mul64(f"xor(_t1, {sconst}::HUGEINT)",
                                    int(_GOLDEN))))
    sm2, f = _sql_splitmix_steps("_t2", "b")
    steps += sm2
    steps.append(("_u", f"CAST({f} AS DOUBLE) / 18446744073709551616.0"))
    return sql_steps_to_ctes(source_sql, steps, prefix)
