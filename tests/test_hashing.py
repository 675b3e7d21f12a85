"""Seed-stable hashing: cross-process stability is load-bearing for
every shuffle key, dedup key and salt in the engine."""

import subprocess
import sys

import numpy as np
import pandas as pd

from ner_ray.util.hashing import (
    combine_hashes,
    hash_column,
    hash_columns,
    hash_str,
    to_bucket,
)


def test_deterministic_within_process():
    a = hash_column(pd.Series(["x", "y", "zebra"]))
    b = hash_column(pd.Series(["x", "y", "zebra"]))
    assert (a == b).all()
    assert len(set(a.tolist())) == 3


def test_stable_across_processes():
    code = (
        "from ner_ray.util.hashing import hash_str;"
        "print(hash_str('stable-probe'))"
    )
    out1 = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, check=True, cwd="/root/repo").stdout.strip()
    assert int(out1) == hash_str("stable-probe")


def test_combine_order_sensitive():
    a = hash_column(pd.Series(["s1", "s2"]))
    b = hash_column(pd.Series(["p1", "p2"]))
    ab = combine_hashes(a, b)
    ba = combine_hashes(b, a)
    assert (ab != ba).any()


def test_hash_columns_triple_key():
    h = hash_columns(
        pd.Series(["E1", "E1", "E2"]),
        pd.Series(["p", "p", "p"]),
        pd.Series(["E9", "E9", "E9"]),
    )
    assert h[0] == h[1] and h[0] != h[2]


def test_buckets_in_range():
    h = hash_column(pd.Series([f"k{i}" for i in range(1000)]))
    b = to_bucket(h, 16)
    assert b.min() >= 0 and b.max() < 16
    # rough uniformity
    counts = np.bincount(b, minlength=16)
    assert counts.min() > 20


def test_int_columns_hashable():
    h = hash_column(pd.Series([1, 2, 3], dtype="int64"))
    assert len(set(h.tolist())) == 3


def test_splitmix_hash_matches_sql():
    """The portable integer-hash path (splitmix_hash + the sampling
    uniform built on it) must be BIT-EXACTLY replicable in DuckDB via
    sql_sample_uniform_ctes — this is what makes integer-keyed
    sampling decisions value-matchable by the correctness oracle."""
    import duckdb

    from ner_ray.stages.sampling import _uniform01
    from ner_ray.util.hashing import sql_sample_uniform_ctes

    rng = np.random.default_rng(11)
    ids = np.concatenate([
        rng.integers(0, 2 ** 62, 20000),
        np.arange(100),
        np.array([-1, -7, 2 ** 63 - 1, -2 ** 63]),
    ]).astype(np.int64)
    for seed in (42, 7):
        want = _uniform01(pd.Series(ids), seed)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"id": ids}))
        ctes, final = sql_sample_uniform_ctes(
            "SELECT id FROM t", "id", seed)
        got = con.execute(
            f"WITH {ctes} SELECT _u FROM {final}").fetchnumpy()["_u"]
        assert np.array_equal(got, want)


def test_splitmix_hash_mixes():
    from ner_ray.util.hashing import splitmix_hash

    h = splitmix_hash(pd.Series(np.arange(100000, dtype=np.int64)))
    assert len(set(h.tolist())) == 100000
    b = to_bucket(h, 64)
    counts = np.bincount(b, minlength=64)
    # sequential ids must spread uniformly across buckets
    assert counts.min() > 100000 / 64 * 0.9


def test_portable_text_hash_matches_sql():
    """portable_text_hash must be BIT-EXACTLY replicable in DuckDB via
    sql_text_hash_steps — the basis of q_doc_signals' value match."""
    import duckdb

    from ner_ray.util.hashing import (
        portable_text_hash,
        sql_steps_to_ctes,
        sql_text_hash_steps,
    )

    rng = np.random.default_rng(3)
    texts = ["".join(chr(int(c)) for c in rng.integers(32, 0x2FFF, int(l)))
             for l in rng.integers(0, 80, 300)]
    texts += ["", "ascii only", "emoji \U0001F600\U0001F680 mix", None]
    df = pd.DataFrame({"text": pd.Series(texts, dtype=object)})
    want = portable_text_hash(df["text"])
    con = duckdb.connect()
    con.register("t", df)
    steps, final_col = sql_text_hash_steps("text", "h")
    ctes, final_cte = sql_steps_to_ctes("SELECT text FROM t", steps, "th")
    rows = con.execute(
        f"WITH {ctes} SELECT {final_col} FROM {final_cte}"
    ).fetchall()  # HUGEINT as exact Python ints (fetchnumpy -> float64)
    got = np.array([r[0] for r in rows], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_portable_text_hash_skew_bucketing():
    """A megabyte outlier in a short-doc batch must neither change the
    hash (length-bucketed + scalar folds are bit-identical to the
    single padded fold) nor pad the whole batch to its length."""
    from ner_ray.util.hashing import (
        _fnv_fold,
        _fnv_fold_scalar,
        _splitmix,
    )
    from ner_ray.util.hashing import portable_text_hash

    rng = np.random.default_rng(5)
    texts = ["".join(chr(int(c)) for c in rng.integers(32, 0x2FFF, int(l)))
             for l in rng.integers(0, 200, 400)]
    texts[0] = ""
    texts[7] = "a\x00b embedded nul"
    texts[137] = "x" * 300_000  # forces the bucketed path
    s = pd.Series(texts)
    bucketed = portable_text_hash(s)
    naive = _splitmix(_fnv_fold(s))
    assert np.array_equal(bucketed, naive)
    # the two fold kernels agree row-wise (incl. NUL-skip semantics)
    assert np.array_equal(_fnv_fold_scalar(np.asarray(s, dtype=object)),
                          _fnv_fold(s))
    # uniform short batch takes the single-pass path, same answers
    short = s.str.slice(0, 50)
    assert np.array_equal(portable_text_hash(short),
                          _splitmix(_fnv_fold(short)))
    assert portable_text_hash(pd.Series([], dtype=object)).shape == (0,)


def test_portable_text_hash_embedded_nul_layout_independent():
    """An embedded NUL must hash identically on every path: the padded
    matrix fold (NUL indistinguishable from padding -> skipped, but a
    dead COLUMN must not end the fold for resurrecting rows), the
    scalar fold, and the DuckDB replay. Regression: the matrix fold
    used to break at the first all-dead column, truncating NUL-row
    tails whenever co-batched rows were all shorter."""
    import duckdb

    from ner_ray.util.hashing import (
        _fnv_fold,
        _fnv_fold_scalar,
        portable_text_hash,
        sql_steps_to_ctes,
        sql_text_hash_steps,
    )

    cases = ["ab\x00cd", "x", "", "\x00", "ab\x00" + "c" * 100,
             "tail\x00" * 40, "plain"]
    assert np.array_equal(
        _fnv_fold(pd.Series(cases)),
        _fnv_fold_scalar(np.array(cases, dtype=object)))
    # batch-composition independence: alone vs next to longer rows
    for c in cases:
        assert (portable_text_hash(pd.Series([c]))[0]
                == portable_text_hash(pd.Series([c, "z" * 400]))[0]), repr(c)
    # bucketed (>8 rows, matrix) vs singleton (scalar) path equality
    big = pd.Series(["ab\x00" + "c" * 100] * 12)
    assert (portable_text_hash(big)
            == portable_text_hash(big[:1])[0]).all()
    # DuckDB replay skips NUL code points identically
    df = pd.DataFrame({"text": pd.Series(cases, dtype=object)})
    want = portable_text_hash(df["text"])
    con = duckdb.connect()
    con.register("t", df)
    steps, final_col = sql_text_hash_steps("text", "h")
    ctes, final_cte = sql_steps_to_ctes("SELECT text FROM t", steps, "th")
    rows = con.execute(
        f"WITH {ctes} SELECT {final_col} FROM {final_cte}").fetchall()
    assert np.array_equal(np.array([r[0] for r in rows], dtype=np.uint64),
                          want)
