"""Entity canonicalization (Q3) + triple resolution (Q4).

Q3 — the "groupby-aggregate union-find merge" (BASELINE.json:6):
connected components of the bipartite entity-alias graph; canonical_id
= min entity_id per component. Two execution paths behind one API:

* ``canonicalize_distributed`` — iterated min-label propagation, the
  10^12-scale path: each round is
      labels ⋈ edges  →  groupby(alias).Min(label)  →  groupby(entity).Min
  repeated until a fixpoint (changed == 0), with a hard iteration cap
  (components via shared aliases are shallow; fixture generation
  asserts convergence <= CANON_MAX_HOPS). Shuffle key alternates
  entity_id / alias; a salted two-phase Min is unnecessary because Min
  is algebraic and Ray's groupby already combines per-block.
* ``canonicalize_local`` — driver-side union-find for provably small
  edge sets (< ``LOCAL_THRESHOLD`` edges). The alias table is the
  small broadcast side of the pipeline, so this is the default in the
  flagship; the distributed path is exercised by tests and kicks in
  automatically above the threshold.

Q4 — rewrite dedup'd triples through the canonical map, then re-merge
weights. The canonical map is broadcast (ray.put dict) when small —
no shuffle — with a join-based scale path (``resolve_triples_join``)
for maps too large to broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray import schema as S
from ner_ray.stages.dedup import merge_weights

LOCAL_THRESHOLD = 2_000_000  # edges; above this use the distributed path
MAX_ROUNDS = 12


def _unionfind(entities: list[str], aliases: list[str]) -> dict[str, str]:
    """Independent union-find (NOT the oracle's — conformance tests
    compare the two implementations)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    by_alias: dict[str, str] = {}
    for e, a in zip(entities, aliases):
        parent.setdefault(e, e)
        first = by_alias.setdefault(a, e)
        if first != e:
            ra, rb = find(first), find(e)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    return {e: find(e) for e in parent}


def canonicalize_local(edges_ds) -> "pa.Table":
    """edges_ds: Dataset[(entity_id, alias)] -> COMPONENTS table."""
    t = pa.concat_tables(
        [pa.Table.from_pandas(b, preserve_index=False) if isinstance(b, pd.DataFrame) else b
         for b in edges_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    ) if hasattr(edges_ds, "iter_batches") else edges_ds
    canon = _unionfind(t.column("entity_id").to_pylist(),
                       t.column("alias").to_pylist())
    items = sorted(canon.items())
    return pa.table(
        {"entity_id": [e for e, _ in items],
         "canonical_id": [c for _, c in items]},
        schema=S.COMPONENTS,
    )


def canonicalize_distributed(edges_ds, num_partitions: int = 16):
    """Iterated groupby-min label propagation; returns a Dataset with
    COMPONENTS columns. Each round: alias-side Min then entity-side
    Min; stops when no label changed (fixpoint) or MAX_ROUNDS.
    ``num_partitions`` is clamped to the cluster CPU budget — a join
    whose aggregators exceed available CPUs deadlocks the streaming
    executor (functions/joins.clamp_join_partitions)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from ner_ray.functions.joins import clamp_join_partitions

    num_partitions = clamp_join_partitions(num_partitions)

    edges = edges_ds.select_columns(["entity_id", "alias"]).materialize()
    labels = (
        edges.groupby("entity_id")
        .aggregate(Min("entity_id", alias_name="label"))
        .materialize()
    )
    converged = False
    for _round in range(MAX_ROUNDS):
        joined = edges.join(labels, join_type="inner",
                            num_partitions=num_partitions,
                            on=("entity_id",))
        alias_min = joined.groupby("alias").aggregate(
            Min("label", alias_name="alias_label"))
        back = edges.join(alias_min, join_type="inner",
                          num_partitions=num_partitions, on=("alias",))
        new_labels = back.groupby("entity_id").aggregate(
            Min("alias_label", alias_name="label")).materialize()
        # fixpoint check: count entities whose label shrank
        cmp = new_labels.join(
            labels.map_batches(
                lambda t: t.rename_columns(["entity_id", "old_label"]),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("entity_id",))
        changed = cmp.map_batches(
            lambda t: pa.table(
                {"c": [int((np.asarray(t.column("label")) !=
                            np.asarray(t.column("old_label"))).sum())]}),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        if not changed:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"canonicalize_distributed did not reach a fixpoint in "
            f"{MAX_ROUNDS} rounds (component deeper than expected) — "
            f"raise MAX_ROUNDS or inspect the alias graph")
    return labels.map_batches(
        lambda t: t.rename_columns(["entity_id", "canonical_id"]),
        batch_format="pyarrow",
    )


def canonicalize(edges_ds, force_distributed: bool = False):
    """Dispatch by edge count (documented partitioning assumption:
    alias-sharing components are shallow; propagation rounds are
    bounded by fixture-time assertion)."""
    edges_ds = edges_ds.materialize()  # count + consume = one execution
    n = edges_ds.count()
    if force_distributed or n > LOCAL_THRESHOLD:
        return canonicalize_distributed(edges_ds)
    import ray.data as rd

    return rd.from_arrow(canonicalize_local(edges_ds))


# ------------------------------------------------------------- resolve


class ResolveStage:
    """Broadcast canonical-map rewrite of subj/obj (no shuffle).

    Arrow dictionary-encode first: the Python dict lookups run only
    over the batch's UNIQUE keys, then a zero-copy LUT take scatters
    the rewritten strings back (the factorize-first rule — same
    pattern as CandidateStage in link.py)."""

    def __init__(self, canon_ref):
        import ray

        canon = canon_ref
        if not isinstance(canon, dict):
            canon = ray.get(canon_ref)
        self.canon = canon

    def _rewrite(self, col) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        lut = pa.array([self.canon.get(u, u) for u in uniq], pa.string())
        return lut.take(enc.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.set_column(
            batch.schema.get_field_index("subj"), "subj",
            self._rewrite(batch.column("subj")))
        return batch.set_column(
            batch.schema.get_field_index("obj"), "obj",
            self._rewrite(batch.column("obj")))


def resolve_triples(deduped_ds, canon_table: pa.Table):
    """Q4 broadcast path: rewrite keys, then re-merge weights."""
    import ray

    canon = dict(zip(canon_table.column("entity_id").to_pylist(),
                     canon_table.column("canonical_id").to_pylist()))
    ref = ray.put(canon)
    rewritten = deduped_ds.map_batches(
        ResolveStage, fn_constructor_kwargs={"canon_ref": ref},
        batch_format="pyarrow", concurrency=(1, 4),
    )
    return merge_weights(rewritten)


def resolve_then_dedup(raw_triples_ds, canon_table: pa.Table):
    """Fused fast path for the flagship: rewrite RAW triples through
    the broadcast canonical map FIRST, then dedup once — one all-to-all
    instead of two (dedup + re-merge). Identical result to
    resolve_triples(dedup_triples(raw)) because the rewrite is a
    per-row map and weight addition is associative; equality is
    asserted in tests."""
    import ray

    from ner_ray.stages.dedup import dedup_triples

    canon = dict(zip(canon_table.column("entity_id").to_pylist(),
                     canon_table.column("canonical_id").to_pylist()))
    ref = ray.put(canon)

    def rewrite(batch: pa.Table) -> pa.Table:
        # stateless task pool: ray.get on the broadcast ref is a
        # zero-copy object-store read, no actor spin-up needed for a
        # cheap map (the actor form, ResolveStage, remains for large
        # canon maps where per-task deserialization would matter)
        return ResolveStage(ray.get(ref))(batch)

    rewritten = raw_triples_ds.map_batches(rewrite, batch_format="pyarrow")
    return dedup_triples(rewritten)


def canonicalize_and_resolve(raw_triples_ds, alias_edges_ds,
                             force_distributed: bool = False):
    """The flagship's Q3+Q4 tail with BOTH dispatches applied:

    * small alias side (<= LOCAL_THRESHOLD edges): driver union-find
      canon + the fused ``resolve_then_dedup`` broadcast path — ONE
      all-to-all total (rewrite raw triples, dedup once).
    * large alias side: distributed label-propagation canon + dedup +
      join-based resolve (the canonical map is itself a Dataset too
      large to broadcast).

    Returns (canon, resolved) where canon is a pa.Table (small path)
    or Dataset (large path)."""
    edges = alias_edges_ds.materialize()  # count + consume = one execution
    n = edges.count()
    if not force_distributed and n <= LOCAL_THRESHOLD:
        canon_tbl = canonicalize_local(edges)
        return canon_tbl, resolve_then_dedup(raw_triples_ds, canon_tbl)
    from ner_ray.stages.dedup import dedup_triples

    canon_ds = canonicalize_distributed(edges)
    # checkpoint between the map/dedup phase and the join phase: the
    # dedup aggregate has already compacted the data, and keeping the
    # tagger/linker actor pools out of the two-JoinOperator DAG avoids
    # a scheduling deadlock when pool-min actors + join aggregators
    # exceed the CPU budget (observed at low CPU counts; the same
    # hazard exists on a saturated cluster)
    deduped = dedup_triples(raw_triples_ds).materialize()
    return canon_ds, resolve_triples_join(deduped, canon_ds)


def resolve_triples_join(deduped_ds, canon_ds, num_partitions: int = 16):
    """Q4 scale path: two hash joins (subj then obj) for canonical maps
    too large to broadcast; identical semantics to resolve_triples.
    Partition count clamped to the CPU budget (join-DAG hazard)."""
    from ner_ray.functions.joins import clamp_join_partitions

    num_partitions = clamp_join_partitions(num_partitions)
    c1 = canon_ds.map_batches(
        lambda t: t.rename_columns(["subj", "subj_canon"]),
        batch_format="pyarrow")
    j1 = deduped_ds.join(c1, join_type="left_outer",
                         num_partitions=num_partitions, on=("subj",))
    j1 = j1.map_batches(_apply_canon_factory("subj", "subj_canon"),
                        batch_format="pyarrow")
    c2 = canon_ds.map_batches(
        lambda t: t.rename_columns(["obj", "obj_canon"]),
        batch_format="pyarrow")
    j2 = j1.join(c2, join_type="left_outer",
                 num_partitions=num_partitions, on=("obj",))
    j2 = j2.map_batches(_apply_canon_factory("obj", "obj_canon"),
                        batch_format="pyarrow")
    return merge_weights(j2)


def _apply_canon_factory(col: str, canon_col: str):
    import pyarrow.compute as pc

    def apply(t: pa.Table) -> pa.Table:
        merged = pc.coalesce(t.column(canon_col), t.column(col))
        t = t.set_column(t.schema.get_field_index(col), col, merged)
        return t.drop_columns([canon_col])

    return apply
