"""Entity-link candidate generation + disambiguation (J1, A4).

Candidate generation is the alias-dictionary BROADCAST join: the alias
table is shipped once via ``ray.put`` (inside the ModelBundle) and the
per-batch lookup is a vectorized dict map over unique surfaces — no
shuffle (SURVEY.md §2.4 J1).

Disambiguation (A4): keep candidates whose ne_type matches the
mention's; argmax prior, ties -> lexicographically smallest entity_id.
Exact within a batch because a mention's candidates are generated
co-located.

Two surfaces:
* nested path (flagship): span rows with ``mentions`` list ->
  ``links`` list (NIL mentions dropped), span locality preserved.
* flat path: a mentions table -> candidates table -> links table
  (operator parity for queries()).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray.stages.tagger import MENTION_STRUCT
from ner_ray.stages.textops import map_to_strings
from ner_ray.state.model import ModelBundle

LINK_STRUCT = pa.struct(
    list(MENTION_STRUCT) + [
        pa.field("entity_id", pa.string()),
        pa.field("link_score", pa.float64()),
    ]
)


def _get(bundle):
    if isinstance(bundle, ModelBundle):
        return bundle
    import ray

    return ray.get(bundle)


class LinkerStage:
    """Span rows + mentions list -> + links list (actor or task pool)."""

    def __init__(self, bundle):
        b = _get(bundle)
        self.alias_types = b.alias_types
        self.best_entity = {a: e for a, (e, _p) in b.best_link.items()}
        self.best_prior = {a: p for a, (_e, p) in b.best_link.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("mentions")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        flat = col.flatten()
        n = len(flat)
        counts = np.diff(offsets)
        row_of = np.repeat(np.arange(len(batch)), counts)

        if n:
            surf = pd.Series(flat.field("norm_surface").to_pylist(),
                             dtype=object)
            ne = flat.field("ne_type").to_numpy(zero_copy_only=False)
            atype = map_to_strings(surf, self.alias_types, "")
            keep = atype == ne
            ent = map_to_strings(surf, self.best_entity, "")
            # prior via unique lut (C gather; dict lookups on uniques only)
            codes, uniq = pd.factorize(surf)
            lut = np.array([self.best_prior.get(u, 0.0) for u in uniq])
            pri = lut[codes]
        else:
            keep = np.zeros(0, dtype=bool)
            ent = np.array([], dtype=object)
            pri = np.array([], dtype=np.float64)

        kept_idx = np.flatnonzero(keep)
        kept = flat.take(pa.array(kept_idx, pa.int64())) if n else flat
        arrays = [kept.field(i) for i in range(kept.type.num_fields)]
        arrays.append(pa.array(ent[kept_idx], pa.string()))
        arrays.append(pa.array(pri[kept_idx], pa.float64()))
        struct = pa.StructArray.from_arrays(arrays, fields=list(LINK_STRUCT))

        new_counts = np.bincount(row_of[kept_idx], minlength=len(batch)) \
            if n else np.zeros(len(batch), dtype=np.int64)
        new_offsets = np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
        links = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()),
                                         struct)
        return batch.append_column("links", links)


# ------------------------------------------------- flat operator parity


class CandidateStage:
    """Flat mentions table -> candidates table (one row per mention x
    matching alias entity). The broadcast join J1 in isolation."""

    def __init__(self, bundle):
        b = _get(bundle)
        self.cands = b.candidates

    def __call__(self, batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        surf = pdf["norm_surface"].astype(object)
        codes, uniq = pd.factorize(surf)
        # dict lookups on UNIQUES only; everything per-mention below is
        # numpy gathers (factorize-first rule — no per-candidate loop)
        per_uniq = [self.cands.get(u) for u in uniq]
        u_ents = [np.asarray(h[0], dtype=object) if h else
                  np.array([], dtype=object) for h in per_uniq]
        u_pri = [np.asarray(h[1], dtype=np.float64) if h else
                 np.array([], dtype=np.float64) for h in per_uniq]
        u_type = np.array([h[2] if h else "" for h in per_uniq],
                          dtype=object)
        u_n = np.array([len(e) for e in u_ents], dtype=np.int64)
        flat_ents = np.concatenate(u_ents) if u_ents else \
            np.array([], dtype=object)
        flat_pri = np.concatenate(u_pri) if u_pri else \
            np.array([], dtype=np.float64)
        u_off = np.cumsum(u_n) - u_n

        type_ok = u_type[codes] == pdf["ne_type"].to_numpy()
        n_per = np.where(type_ok, u_n[codes], 0)
        rows = np.repeat(np.arange(len(pdf)), n_per)
        starts = u_off[codes][n_per > 0]
        lens = n_per[n_per > 0]
        total = int(lens.sum())
        idx = np.repeat(starts, lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens))
        out = pdf.iloc[rows].reset_index(drop=True)
        out["entity_id"] = flat_ents[idx]
        out["prior"] = flat_pri[idx]
        return pa.Table.from_pandas(out, preserve_index=False)


def disambiguate_batch(batch: pa.Table) -> pa.Table:
    """Candidates -> links: argmax prior per mention, ties -> smallest
    entity_id. PARTITIONING ASSUMPTION: one mention's candidates are
    co-located in the batch — true when applied with batch_size=None
    over CandidateStage output blocks (candidates are emitted
    contiguously per mention and blocks are never split). After a
    shuffle of candidates, apply via groupby(mention key).map_groups
    instead."""
    pdf = batch.to_pandas()
    if pdf.empty:
        out = pdf.rename(columns={"prior": "link_score"})
        return pa.Table.from_pandas(out, preserve_index=False)
    key = ["doc_id", "span_idx", "tok_begin", "tok_end"]
    pdf = pdf.sort_values(key + ["prior", "entity_id"],
                          ascending=[True] * len(key) + [False, True],
                          kind="stable")
    out = pdf.drop_duplicates(subset=key, keep="first").reset_index(drop=True)
    out = out.rename(columns={"prior": "link_score"})
    return pa.Table.from_pandas(out, preserve_index=False)
