"""Mini driver harness: run every queries() entry at sf0.001 and
compare against its oracle_sql() via DuckDB — the same shape as the
driver's CORRECTNESS gate (row count + schema + order-insensitive
values). SQL-less queries are executed and smoke-checked."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        df = res.to_pandas()
        if df.empty and not len(df.columns) and hasattr(res, "schema"):
            sch = res.schema()
            names = sch.names if hasattr(sch, "names") else sch.names
            df = pd.DataFrame({n: [] for n in names})
        return df
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)
    return df


def _registry():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def reg(ray_session):
    return _registry()


def _compare(name, ours: pd.DataFrame, oracle: pd.DataFrame):
    assert len(ours) == len(oracle), \
        f"{name}: rows {len(ours)} != {len(oracle)}"
    assert sorted(ours.columns) == sorted(oracle.columns), \
        f"{name}: columns {sorted(ours.columns)} != {sorted(oracle.columns)}"
    a, b = _canon(ours), _canon(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or \
                np.issubdtype(b[c].dtype, np.floating):
            assert np.allclose(av.astype(float), bv.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True), \
                f"{name}: float col {c} differs"
        else:
            same = (av == bv)
            assert same.all(), (
                f"{name}: col {c} differs at rows "
                f"{np.flatnonzero(~same)[:5]}: "
                f"{av[~same][:3]} vs {bv[~same][:3]}")


def test_all_sql_queries_match(reg):
    queries, sqls = reg
    failures = []
    for name, sql in sorted(sqls.items()):
        try:
            ours = _to_pandas(queries[name](SF_DIR))
            oracle = _duck(sql)
            _compare(name, ours, oracle)
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: ERROR {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(reg):
    queries, sqls = reg
    for name in sorted(set(queries) - set(sqls)):
        res = _to_pandas(queries[name](SF_DIR))
        assert res is not None, name
        # sanity floors for specific operators
        if name == "q_span_invariant":
            assert res["equal"].all()
        if name == "q_doc_signals":
            assert len(res) == _duck("SELECT count(*) n FROM documents") \
                ["n"].iloc[0]


def test_every_query_has_callable(reg):
    queries, sqls = reg
    assert set(sqls) <= set(queries)
    assert len(queries) >= 35, len(queries)
