"""Triple extraction from co-occurring linked mentions (operator Q2).

Frozen rule (reference_oracle.extract_triples): within one text span,
for every ordered pair of linked mentions (i before j) with
0 <= gap = j.tok_begin - i.tok_end <= TRIPLE_WINDOW:
    subj = entity_i, obj = entity_j,
    pred = f"{type_i}:{connective}:{type_j}".lower() where connective is
    the normalized token right after mention i (carried on the mention
    as ``conn_token``) or "adj" when the mentions are adjacent,
    score = round(link_score_i * link_score_j, 6).

Input: span rows with nested ``links`` list (span locality guaranteed
by nesting — batch boundaries can never split a span's mentions).
Output: flat triples rows. Pair enumeration is vectorized over the
pair distance d (mentions per span are few and sorted by tok_begin, so
gap is monotone in d and the window filter is exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray import schema as S
from ner_ray.constants import ADJACENT_CONNECTIVE, TRIPLE_WINDOW


def extract_triples_batch(batch: pa.Table) -> pa.Table:
    col = batch.column("links")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    flat = col.flatten()
    n = len(flat)
    counts = np.diff(offsets)
    row_of = np.repeat(np.arange(len(batch)), counts)
    if n == 0:
        return S.TRIPLES.empty_table()

    tok_begin = flat.field("tok_begin").to_numpy(zero_copy_only=False)
    tok_end = flat.field("tok_end").to_numpy(zero_copy_only=False)
    ne = flat.field("ne_type").to_numpy(zero_copy_only=False)
    ent = flat.field("entity_id").to_numpy(zero_copy_only=False)
    score = flat.field("link_score").to_numpy(zero_copy_only=False)
    surface = flat.field("surface").to_numpy(zero_copy_only=False)
    conn = flat.field("conn_token").to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    span_idx = batch.column("span_idx").to_numpy(zero_copy_only=False)

    pairs_i, pairs_j = [], []
    max_d = int(counts.max())
    for d in range(1, max_d):
        i = np.arange(n - d)
        j = i + d
        same = row_of[i] == row_of[j]
        gap = tok_begin[j] - tok_end[i]
        ok = same & (gap >= 0) & (gap <= TRIPLE_WINDOW)
        pairs_i.append(i[ok])
        pairs_j.append(j[ok])
    if not pairs_i:
        return S.TRIPLES.empty_table()
    pi = np.concatenate(pairs_i)
    pj = np.concatenate(pairs_j)
    if len(pi) == 0:
        return S.TRIPLES.empty_table()
    order = np.lexsort((pj, pi))  # deterministic output order
    pi, pj = pi[order], pj[order]

    gap = tok_begin[pj] - tok_end[pi]
    connective = np.where(gap >= 1, conn[pi], ADJACENT_CONNECTIVE)
    t_i = np.char.lower(ne[pi].astype(str))
    t_j = np.char.lower(ne[pj].astype(str))
    pred = np.char.add(
        np.char.add(np.char.add(t_i, ":"),
                    np.char.add(connective.astype(str), ":")),
        t_j,
    )
    return pa.table(
        {
            "subj": pa.array(ent[pi], pa.string()),
            "pred": pa.array(pred.astype(object), pa.string()),
            "obj": pa.array(ent[pj], pa.string()),
            "doc_id": pa.array(doc_ids[row_of[pi]], pa.string()),
            "span_idx": pa.array(span_idx[row_of[pi]].astype(np.int32),
                                 pa.int32()),
            "subj_surface": pa.array(surface[pi], pa.string()),
            "obj_surface": pa.array(surface[pj], pa.string()),
            "score": pa.array(np.round(score[pi] * score[pj], 6),
                              pa.float64()),
        },
        schema=S.TRIPLES,
    )
