"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Nothing here (or in ner_ray) calls ray.init()/ray.shutdown(): the
driver, bench.py and the pytest session fixture own the Ray session.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the repo root importable for THIS process regardless of cwd.
# NOTE: Ray worker processes inherit the driver's CWD (not its
# sys.path mutations), so the driver must ray.init() with
# cwd == /root/repo for workers to resolve `ner_ray` — which is how
# the harness, bench.py, jobs/ and tests all run. Without ray.init
# access we cannot ship the package via runtime_env py_modules.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship KG pipeline over /root/testdata/sf0.001: driver docs
    adapted to the pinned interleaved shape (deterministic mention
    injection), then tag -> link -> triples -> dedup -> canonicalize ->
    resolve. Returns the resolved triple Dataset."""
    from ner_ray.fixtures.gen import ensure_fixtures
    from ner_ray.pipelines.flagship import build_graph
    from ner_ray.sources.io import docs_from_testdata

    fx = ensure_fixtures("small")
    docs = docs_from_testdata("/root/testdata/sf0.001", f"{fx}/alias.parquet")
    out = build_graph(docs, f"{fx}/model.parquet", f"{fx}/alias.parquet")
    return out["resolved"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (relational core, scalar families, joins, windows, KG pipeline,
    dedup suite, similarity search, text analysis, multimodal stub)."""
    from ner_ray.pipelines.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (driver
    tables are pre-registered views; synthetic fixture tables are
    reached via read_parquet on their deterministic /tmp paths, which
    queries()/oracle_sql() materialize on call)."""
    from ner_ray.pipelines.queries import sql_registry

    return sql_registry()
