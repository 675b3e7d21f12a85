"""The driver-facing operator registry (SURVEY.md §2 oracle column).

Every implemented operator gets a ``queries()`` entry — a callable
``(sf_dir) -> Dataset | DataFrame | Table`` — and, where ANSI-SQL can
express it, a matching ``oracle_sql()`` string for DuckDB over the same
inputs. The driver runs both sides at sf=0.01 and compares row count +
schema + order-insensitive value hash, so:

* column NAMES match exactly between Ray output and SQL aliases;
* float aggregates are ROUNDED identically on both sides (sum order
  differs between engines; rounding pins the value);
* int aggregates are cast to BIGINT in SQL (DuckDB count/sum widths).

KG-pipeline queries run over the deterministic synthetic fixtures
(the driver tables have no spans column); their oracle SQL reads the
fixture parquet via read_parquet() — either recomputing independently
in SQL (canon propagation, dedup, degrees) or reading the committed
single-process-oracle goldens (mentions/links/triples), which are
derived by ner_ray/oracle/reference_oracle.py with no Ray involvement.
Genuinely non-SQL ops (sketches, LSH, langid, media stubs) have no SQL
entry -> the driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.fixtures.gen import ensure_fixtures

_REGISTRY: dict[str, Callable] = {}
_SQL: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        _REGISTRY[name] = fn
        if sql is not None:
            _SQL[name] = sql
        return fn

    return deco


def _load_all() -> None:
    import ner_ray.pipelines.queries_kg  # noqa: F401  (registers on import)


def registry() -> dict[str, Callable]:
    _load_all()
    ensure_fixtures("small")
    ensure_fixtures("tiny")   # q_train_eval's golden lives here
    return dict(_REGISTRY)


def sql_registry() -> dict[str, str]:
    _load_all()
    ensure_fixtures("small")
    # the driver may run an entry's DuckDB side before its Ray side;
    # q_train_eval's SQL reads the tiny fixture's golden, so it must
    # exist as soon as the SQL string is handed out
    ensure_fixtures("tiny")
    return dict(_SQL)


def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _fx() -> str:
    return ensure_fixtures("small")


# =====================================================================
# relational core (driver tables)
# =====================================================================


@q("q_filter_project", sql="""
SELECT l_orderkey, l_quantity,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.02
""")
def q_filter_project(sf_dir: str):
    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
              "l_shipdate"])

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(t.column("l_shipdate"), pa.scalar(
                pd.Timestamp("1996-01-01"), pa.timestamp("us"))),
            pc.greater(t.column("l_discount"), 0.02))
        t = t.filter(mask)
        # per-row IEEE arithmetic is engine-identical: no rounding needed
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "l_quantity": t.column("l_quantity"),
                         "revenue": rev})

    return ds.map_batches(fn, batch_format="pyarrow")


@q("q_global_agg", sql="""
SELECT CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 3) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(min(l_discount), 6) AS min_disc,
       round(max(l_tax), 6) AS max_tax,
       quantile_disc(l_quantity, 0.5) AS median_qty,
       quantile_disc(l_extendedprice, 0.99) AS p99_price
FROM lineitem
""")
def q_global_agg(sf_dir: str):
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from ner_ray.functions.aggregates import exact_quantile

    ds = _rp(sf_dir, "lineitem",
             ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    res = ds.aggregate(
        Count(alias_name="n"),
        Sum("l_quantity", alias_name="sum_qty"),
        Mean("l_extendedprice", alias_name="avg_price"),
        Min("l_discount", alias_name="min_disc"),
        Max("l_tax", alias_name="max_tax"),
    )
    # exact nearest-rank quantiles (distributed value counts) — the
    # values are raw data points, so no rounding is needed for the
    # DuckDB quantile_disc match
    (median_qty,) = exact_quantile(ds, "l_quantity", [0.5])
    (p99_price,) = exact_quantile(ds, "l_extendedprice", [0.99])
    return pa.table({
        "n": pa.array([int(res["n"])], pa.int64()),
        "sum_qty": pa.array([round(res["sum_qty"], 3)]),
        "avg_price": pa.array([round(res["avg_price"], 4)]),
        "min_disc": pa.array([round(res["min_disc"], 6)]),
        "max_tax": pa.array([round(res["max_tax"], 6)]),
        "median_qty": pa.array([float(median_qty)]),
        "p99_price": pa.array([float(p99_price)]),
    })


_GROUPED_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def _grouped_round(t: pa.Table) -> pa.Table:
    t = t.set_column(t.schema.get_field_index("sum_qty"), "sum_qty",
                     pc.round(t.column("sum_qty"), 2))
    return t.set_column(t.schema.get_field_index("revenue"), "revenue",
                        pc.round(t.column("revenue"), 2))


@q("q_grouped_agg", sql=_GROUPED_SQL)
def q_grouped_agg(sf_dir: str):
    """Direct groupby-aggregate (Ray shuffles raw rows)."""
    from ray.data.aggregate import Count, Sum

    ds = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity",
              "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rev", pc.multiply(t.column("l_extendedprice"),
                               pc.subtract(1.0, t.column("l_discount"))))

    out = ds.map_batches(add_rev, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                   Sum("rev", alias_name="revenue"),
                   Count(alias_name="n"))
    return out.map_batches(_grouped_round, batch_format="pyarrow")


@q("q_partial_final", sql=_GROUPED_SQL)
def q_partial_final(sf_dir: str):
    """Same result via the two-phase combiner path (G3): shuffle moves
    one partial row per key per batch instead of raw rows."""
    from ner_ray.functions.aggregates import partial_final_agg

    ds = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity",
              "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rev", pc.multiply(t.column("l_extendedprice"),
                               pc.subtract(1.0, t.column("l_discount"))))

    out = partial_final_agg(
        ds.map_batches(add_rev, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        aggs=[("l_quantity", "sum", "sum_qty"), ("rev", "sum", "revenue"),
              ("rev", "count", "n")])
    return out.map_batches(_grouped_round, batch_format="pyarrow")


@q("q_distinct", sql="SELECT DISTINCT o_orderpriority FROM orders")
def q_distinct(sf_dir: str):
    ds = _rp(sf_dir, "orders", ["o_orderpriority"])
    vals = sorted(ds.unique("o_orderpriority"))
    return pa.table({"o_orderpriority": pa.array(vals, pa.string())})


@q("q_topk", sql="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""")
def q_topk(sf_dir: str):
    from ner_ray.functions.aggregates import topk

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return topk(ds, ["o_totalprice", "o_orderkey"], 10,
                descending=[True, False])


@q("q_group_topk", sql="""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 2
""")
def q_group_topk(sf_dir: str):
    from ner_ray.functions.aggregates import group_topk

    ds = _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = group_topk(ds, "o_custkey", ["o_totalprice", "o_orderkey"], 2,
                     descending=[True, False])
    return out


@q("q_sort", sql="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def q_sort(sf_dir: str):
    """Global sort (O1); the driver compare is order-insensitive, the
    determinism property is asserted in tests."""
    return _rp(sf_dir, "nation").sort("n_name")


@q("q_union", sql="""
SELECT n_name AS name FROM nation
UNION ALL SELECT r_name AS name FROM region
""")
def q_union(sf_dir: str):
    n = _rp(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow")
    r = _rp(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow")
    return n.union(r)


@q("q_intersect_except", sql="""
SELECT 'intersect' AS op, nationkey FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
UNION ALL
SELECT 'except' AS op, nationkey FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
""")
def q_intersect_except(sf_dir: str):
    """D2 both halves in one graded entry, merged so both fit the
    driver's 50-row correctness budget; the op column marks each half.
    Distinct key sets come from ONE distributed unique() per side
    (Ray's aggregate = the semi/anti building block for key columns);
    the final set partition runs on the two small key sets. The
    broadcast semi/anti JOIN operators on full rows are exercised by
    q_semi_join / q_anti_join."""
    c = set(_rp(sf_dir, "customer", ["c_nationkey"])
            .unique("c_nationkey") or [])
    s = set(_rp(sf_dir, "supplier", ["s_nationkey"])
            .unique("s_nationkey") or [])
    inter, exc = sorted(c & s), sorted(c - s)
    return pa.table({
        "op": pa.array(["intersect"] * len(inter) + ["except"] * len(exc),
                       pa.string()),
        "nationkey": pa.array(inter + exc, pa.int32()),
    })


@q("q_hash_join", sql="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""")
def q_hash_join(sf_dir: str):
    from ner_ray.functions.joins import hash_join

    o = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    j = hash_join(o, c, "o_custkey", "c_custkey", num_partitions=8)
    return j.select_columns(["o_orderkey", "o_totalprice", "c_name",
                             "c_mktsegment"])


@q("q_broadcast_join", sql="""
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
""")
def q_broadcast_join(sf_dir: str):
    import pyarrow.parquet as pq

    from ner_ray.functions.joins import broadcast_join

    c = _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    j = broadcast_join(c, nat, "c_nationkey", "n_nationkey")
    return j.map_batches(lambda df: df[["c_custkey", "c_name", "n_name"]],
                         batch_format="pandas")


def _big_order_custkeys(sf_dir: str):
    """Key set: customers holding at least one order > 300k (both the
    semi and the anti side are non-empty at every sf)."""
    ds = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), 300000.0))
                   .select(["o_custkey"]),
        batch_format="pyarrow")
    return big.unique("o_custkey")


@q("q_semi_join", sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
""")
def q_semi_join(sf_dir: str):
    from ner_ray.functions.joins import semi_join

    c = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    return semi_join(c, _big_order_custkeys(sf_dir), on="c_custkey")


@q("q_anti_join", sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 300000)
""")
def q_anti_join(sf_dir: str):
    from ner_ray.functions.joins import semi_join

    c = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    return semi_join(c, _big_order_custkeys(sf_dir), on="c_custkey",
                     anti=True)


@q("q_asof_join", sql="""
SELECT e.event_id, e.ts, o.o_orderdate
FROM events e ASOF JOIN (SELECT DISTINCT o_orderdate FROM orders) o
ON e.ts >= o.o_orderdate
""")
def q_asof_join(sf_dir: str):
    import pyarrow.parquet as pq

    from ner_ray.functions.joins import asof_join_global

    e = _rp(sf_dir, "events", ["event_id", "ts"])
    dates = pq.read_table(f"{sf_dir}/orders.parquet",
                          columns=["o_orderdate"]).column("o_orderdate") \
        .to_numpy(zero_copy_only=False)
    return asof_join_global(e, "ts", dates, "o_orderdate")


@q("q_windows", sql="""
SELECT 'tumbling' AS kind, user_id, date_trunc('day', ts) AS bucket,
       round(sum(value), 4) AS sum_value, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id, date_trunc('day', ts)
UNION ALL
SELECT 'sliding' AS kind, user_id, bucket,
       round(sum(value), 4) AS sum_value, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT user_id, date_trunc('day', ts) AS bucket, value FROM events
  UNION ALL
  SELECT user_id, date_trunc('day', ts) - INTERVAL 1 DAY AS bucket, value
  FROM events
) GROUP BY user_id, bucket
""")
def q_windows(sf_dir: str):
    """Tumbling (1-day) + sliding (2-day window, 1-day step — each
    event lands in 2 windows, key = start day) aggregates in one graded
    entry, marked by the kind column (merged for the driver's 50-row
    correctness budget)."""
    from ner_ray.functions.windows import sliding_window_agg, \
        tumbling_window_agg

    def finish(kind):
        def fn(t: pa.Table) -> pa.Table:
            t = t.set_column(t.schema.get_field_index("sum_value"),
                             "sum_value", pc.round(t.column("sum_value"), 4))
            return t.add_column(
                0, "kind", pa.array([kind] * len(t), pa.string()))

        return fn

    e = _rp(sf_dir, "events", ["user_id", "ts", "value"])
    tum = tumbling_window_agg(e, "user_id", "ts", "value", unit="day") \
        .map_batches(finish("tumbling"), batch_format="pyarrow")
    sli = sliding_window_agg(e, "user_id", "ts", "value", width=2) \
        .map_batches(finish("sliding"), batch_format="pyarrow")
    return tum.union(sli)


@q("q_sessions", sql="""
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts,
                                event_id) AS sid
  FROM (SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) > INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END AS new_sess FROM events))
GROUP BY user_id, sid
""")
def q_sessions(sf_dir: str):
    from ner_ray.functions.windows import session_windows

    e = _rp(sf_dir, "events", ["user_id", "event_id", "ts"])
    return session_windows(e, "user_id", "ts", gap_seconds=3600) \
        .select_columns(["user_id", "session_start", "session_end",
                         "n_events"])


# =====================================================================
# scalar function families
# =====================================================================


@q("q_scalar_string", sql="""
SELECT c_custkey, upper(c_name) AS uname, lower(c_name) AS lname,
       CAST(length(c_name) AS BIGINT) AS name_len,
       substr(c_name, 1, 8) AS name8,
       c_name || '|' || c_mktsegment AS tagged,
       contains(c_name, '1') AS has1,
       replace(c_name, '#', '-') AS dashed,
       trim(c_name) AS trimmed
FROM customer
""")
def q_scalar_string(sf_dir: str):
    ds = _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def fn(t: pa.Table) -> pa.Table:
        name = t.column("c_name")
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "uname": pc.utf8_upper(name),
            "lname": pc.utf8_lower(name),
            "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
            "name8": pc.utf8_slice_codeunits(name, 0, 8),
            "tagged": pc.binary_join_element_wise(
                name, t.column("c_mktsegment"), "|"),
            "has1": pc.match_substring(name, "1"),
            "dashed": pc.replace_substring(name, "#", "-"),
            "trimmed": pc.utf8_trim_whitespace(name),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


@q("q_scalar_date", sql="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
           AS days_since_95
FROM orders
""")
def q_scalar_date(sf_dir: str):
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    epoch95 = pd.Timestamp("1995-01-01")

    def fn(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        days = pc.days_between(pa.scalar(epoch95, pa.timestamp("us")), d)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "y": pc.cast(pc.year(d), pa.int64()),
            "m": pc.cast(pc.month(d), pa.int64()),
            "d": pc.cast(pc.day(d), pa.int64()),
            "month_start": pc.floor_temporal(d, unit="month"),
            "days_since_95": pc.cast(days, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


@q("q_scalar_math", sql="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 + l_tax) * (1 - l_discount) AS charge,
       abs(l_discount - 0.05) AS absd,
       round(ln(l_extendedprice), 6) AS lnp,
       round(pow(l_quantity, 2), 3) AS q2,
       CAST(l_quantity AS BIGINT) % 5 AS qmod
FROM lineitem
""")
def q_scalar_math(sf_dir: str):
    ds = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_extendedprice", "l_tax",
              "l_discount", "l_quantity"])

    def fn(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice")
        charge = pc.multiply(pc.multiply(price,
                                         pc.add(1.0, t.column("l_tax"))),
                             pc.subtract(1.0, t.column("l_discount")))
        qint = t.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "charge": charge,
            "absd": pc.abs(pc.subtract(t.column("l_discount"), 0.05)),
            "lnp": pc.round(pc.ln(price), 6),
            "q2": pc.round(pc.power(t.column("l_quantity"), 2), 3),
            "qmod": pa.array(qint % 5, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


@q("q_scalar_array", sql="""
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 5) AS e0,
       round(CAST(embedding[-1] AS DOUBLE), 5) AS e_last,
       label
FROM embeddings
""")
def q_scalar_array(sf_dir: str):
    ds = _rp(sf_dir, "embeddings")

    def fn(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = pc.list_value_length(emb)
        e0 = pc.list_element(emb, 0)
        lens = n.to_numpy(zero_copy_only=False)
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        last_idx = np.cumsum(lens) - 1
        e_last = flat[last_idx]
        return pa.table({
            "vec_id": t.column("vec_id"),
            "dim": pc.cast(n, pa.int64()),
            "e0": pc.round(pc.cast(e0, pa.float64()), 5),
            "e_last": pa.array(np.round(e_last.astype(np.float64), 5)),
            "label": t.column("label"),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


@q("q_json_extract", sql="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""")
def q_json_extract(sf_dir: str):
    ds = _rp(sf_dir, "events", ["event_id", "props"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized JSON-scalar extraction for the fixed '$.k' path
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        return pd.DataFrame({"event_id": df["event_id"],
                             "k": k.astype("int64")})

    return ds.map_batches(fn, batch_format="pandas")


# (the seed-stable multi-column row hash that used to be the standalone
# q_hash_stability entry is graded inside q_doc_signals — merged to free
# a slot in the driver's 50-row correctness budget for the round-3
# corpus-curation operators; cross-process self-consistency stays
# asserted in tests/test_hashing.py)
