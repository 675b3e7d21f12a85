"""Schema conformance for heterogeneous corpus ingestion.

A 100-TB web corpus is never one schema: crawls drift (columns appear,
widths widen), and Ray's ``Dataset.union`` requires block schemas to
agree, so "read everything and union it" fails on exactly the inputs
that need it most. These operators pin a TARGET schema and conform
every batch to it map-only (DuckDB's ``UNION ALL BY NAME`` semantics):
missing columns materialize as NULLs (or a per-column default), present
columns cast to the target type, extras drop (or raise), order is the
target's. Conformance is per batch and shuffle-free, so it composes
into any read without breaking streaming.
"""

from __future__ import annotations

import pyarrow as pa


def _conform_table(t: pa.Table, schema: pa.Schema, fill: dict,
                   on_extra: str) -> pa.Table:
    if on_extra == "raise":
        extra = set(t.schema.names) - set(schema.names)
        if extra:
            raise ValueError(f"unexpected columns {sorted(extra)} "
                             f"(target schema has {schema.names})")
    cols = []
    for field in schema:
        if field.name in t.schema.names:
            cols.append(t.column(field.name).cast(field.type))
        elif field.name in fill:
            cols.append(pa.array([fill[field.name]] * len(t), field.type))
        else:
            cols.append(pa.nulls(len(t), field.type))
    return pa.table(cols, schema=schema)


def conform_schema(ds, schema: pa.Schema, fill: dict | None = None,
                   on_extra: str = "drop"):
    """Conform every batch of ``ds`` to ``schema`` (cast / fill /
    reorder; ``on_extra`` = "drop" | "raise"). Map-only."""
    if on_extra not in ("drop", "raise"):
        raise ValueError(f"on_extra must be drop|raise: {on_extra}")
    fill = dict(fill or {})
    unknown = set(fill) - set(schema.names)
    if unknown:
        raise ValueError(f"fill keys not in schema: {sorted(unknown)}")

    def fn(t: pa.Table) -> pa.Table:
        return _conform_table(t, schema, fill, on_extra)

    return ds.map_batches(fn, batch_format="pyarrow")


def union_by_name(datasets, fill: dict | None = None):
    """DuckDB ``UNION ALL BY NAME`` over Ray Datasets: unified schema =
    first-seen column order with permissively promoted types (int32 ∪
    int64 → int64, int ∪ float → float, …); every input conforms then
    unions. ``schema()`` on a non-read-rooted dataset may execute part
    of its plan — pass materialized or read-rooted datasets."""
    datasets = list(datasets)
    if len(datasets) < 2:
        raise ValueError("union_by_name needs >= 2 datasets")
    by_name: dict[str, list[pa.Field]] = {}
    order: list[str] = []
    for ds in datasets:
        s = ds.schema()
        arrow = pa.schema([(n, t) for n, t in zip(s.names, s.types)])
        for field in arrow:
            if field.name not in by_name:
                order.append(field.name)
            by_name.setdefault(field.name, []).append(field)
    target = pa.schema([
        pa.unify_schemas([pa.schema([f]) for f in by_name[name]],
                         promote_options="permissive").field(0)
        for name in order])
    out = [conform_schema(ds, target, fill=fill) for ds in datasets]
    result = out[0]
    for ds in out[1:]:
        result = result.union(ds)
    return result
