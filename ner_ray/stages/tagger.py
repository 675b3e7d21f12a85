"""CRF tagger stage: the heart of the engine (actor pool).

Fuses tokenize -> normalize -> gazetteer longest-match -> Wapiti-style
template expansion -> batched Viterbi -> BIO decode (conlleval repair)
into ONE ``map_batches`` actor stage over zero-copy Arrow batches
(cf. Wapiti src/pattern.c + src/decoder.c, reconstructed —
SURVEY.md §2.2-2.3, operators M1-M4, A1, A3, Q1 fused).

Input : span rows (doc_id, span_idx, text, ...).
Output: same rows + ``mentions: list<struct>`` — span locality is kept
by NESTING, so downstream stages (link, triples) never depend on batch
boundaries. Flat mention tables are a thin explode stage.

Everything is numpy/pandas C kernels; Python loops run only over
sparse events (gazetteer matches, emitted mentions) and unique values.
The Viterbi trellis is vectorized across ALL sequences of the batch
(padded (B, T, 9) DP), not per sequence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray.constants import (
    LABELS,
    MAX_ALIAS_TOKENS,
    N_LABELS,
    NE_TYPES,
)
from ner_ray.stages.textops import (
    map_to_ids,
    normalize_series,
    shape_series,
    shifted_within_seq,
)
from ner_ray.state.model import GAZ_VALUES, ModelBundle

# label-index lookup tables for vectorized BIO decode
_LAB_TYPE = np.array(
    [-1] + [t for t in range(len(NE_TYPES)) for _ in (0, 1)], dtype=np.int64
)
_LAB_IS_B = np.array(
    [False] + [b == 0 for _ in NE_TYPES for b in (0, 1)], dtype=bool
)
_TYPE_NAMES = np.array(NE_TYPES, dtype=object)

MENTION_STRUCT = pa.struct(
    [
        ("tok_begin", pa.int32()),
        ("tok_end", pa.int32()),
        ("char_offset", pa.int32()),
        ("surface", pa.string()),
        ("norm_surface", pa.string()),
        ("conn_token", pa.string()),
        ("ne_type", pa.string()),
        ("score", pa.float64()),
    ]
)


def _get(bundle):
    """Accept a ModelBundle or an ObjectRef to one (broadcast)."""
    if isinstance(bundle, ModelBundle):
        return bundle
    import ray

    return ray.get(bundle)


class FeatureCache:
    """Per-actor memo of unique-token feature rows, persisted ACROSS
    batches — the payoff of the actor-pool design: after warmup, a
    batch's per-token string kernels reduce to factorize + gathers
    (token vocabularies are heavy-tailed; hit rates approach 100%).

    ``cross`` holds one id column per CROSS-TOKEN family (families the
    pattern set scores at non-zero offsets — just 'low' for the
    default pattern file)."""

    _INIT_CAP = 4096

    def __init__(self, b: ModelBundle, pats=None):
        self.b = b
        self.pats = pats
        self.map: dict[str, int] = {}
        self.size = 0
        cap = self._INIT_CAP
        self.static = np.zeros((cap, N_LABELS))
        # only families the MODEL actually scores get id columns —
        # pattern families absent from the model are OOV everywhere and
        # contribute nothing (matches the uncached path)
        self.cross: dict[str, np.ndarray] = {
            fam: np.zeros(cap, dtype=np.int64)
            for fam in _cross_families(pats.score_families
                                       if pats is not None
                                       else b.families)
            if fam in b.value_ids}
        self.norm = np.empty(cap, dtype=object)
        self.tok_len = np.zeros(cap, dtype=np.int64)
        self.is_first = np.zeros(cap, dtype=bool)
        self.first_tokens = {a.split(" ", 1)[0]
                             for m in b.alias_by_len.values() for a in m}

    def _ensure_capacity(self, need: int) -> None:
        cap = len(self.tok_len)
        if need <= cap:
            return
        new_cap = max(need, cap * 2)  # geometric growth: amortized O(1)
        grow = new_cap - cap
        self.static = np.vstack([self.static,
                                 np.zeros((grow, N_LABELS))])
        self.cross = {fam: np.concatenate([v, np.zeros(grow, dtype=np.int64)])
                      for fam, v in self.cross.items()}
        self.norm = np.concatenate([self.norm,
                                    np.empty(grow, dtype=object)])
        self.tok_len = np.concatenate([self.tok_len,
                                       np.zeros(grow, dtype=np.int64)])
        self.is_first = np.concatenate([self.is_first,
                                        np.zeros(grow, dtype=bool)])

    def lookup(self, uniques: np.ndarray) -> np.ndarray:
        new = [u for u in uniques if u not in self.map]
        if new:
            s = pd.Series(new, dtype=object)
            static, cross, u_norm = _unique_features(s, self.b, self.pats)
            base = self.size
            self._ensure_capacity(base + len(new))
            for i, u in enumerate(new):
                self.map[u] = base + i
            end = base + len(new)
            self.static[base:end] = static
            for fam, ids in cross.items():
                self.cross[fam][base:end] = ids
            self.norm[base:end] = u_norm
            self.tok_len[base:end] = s.str.len().to_numpy(dtype=np.int64)
            self.is_first[base:end] = np.fromiter(
                (x in self.first_tokens for x in u_norm), dtype=bool,
                count=len(u_norm))
            self.size = end
        return np.fromiter((self.map[u] for u in uniques), dtype=np.int64,
                           count=len(uniques))

    def cross_at(self, cidx: np.ndarray) -> dict[str, np.ndarray]:
        return {fam: v[cidx] for fam, v in self.cross.items()}


class TaggerActor:
    """Callable class => Ray actor pool; model loaded once per actor,
    unique-token feature rows cached across batches.

    ``patterns`` (optional) is a Wapiti-style pattern file TEXT or a
    parsed PatternSet (functions/patterns.py); None scores the
    bundle's compiled family layout — identical to the default pattern
    file (round-trip asserted in tests/test_patterns.py)."""

    def __init__(self, bundle, patterns=None):
        self.b = _get(bundle)
        if isinstance(patterns, str):
            from ner_ray.functions.patterns import parse_pattern_file

            patterns = parse_pattern_file(patterns)
        self.pats = patterns
        # gaz flag index (0..8) -> row in the gaz weight matrix
        gid = self.b.value_ids["gaz"]
        self._gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
        self._cache = FeatureCache(self.b, self.pats)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = tag_spans(batch.column("text"), self.b,
                             self._gaz_row, cache=self._cache,
                             pats=self.pats)
        return batch.append_column("mentions", mentions)


class PosteriorActor(TaggerActor):
    """A2: token-level decode + forward-backward confidence. Emits one
    row per token with the Viterbi tag and the marginal probability of
    that tag (the reference's --post scoring mode)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        prep = _prepare(batch.column("text"), self.b, self._gaz_row,
                        cache=self._cache, pats=self.pats)
        if prep is None:
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int32()),
                "tok_idx": pa.array([], pa.int32()),
                "token": pa.array([], pa.string()),
                "tag": pa.array([], pa.string()),
                "post": pa.array([], pa.float64()),
            })
        E, seq_id, pos, lens, flat_tokens = prep
        tags = _viterbi_batch(E, seq_id, pos, lens, self.b.trans,
                              self.b.start)
        post = _posteriors_batch(E, seq_id, pos, lens, self.b.trans,
                                 self.b.start)
        labels = np.array(LABELS, dtype=object)
        return pa.table({
            "doc_id": pa.array(
                batch.column("doc_id").to_numpy(zero_copy_only=False)[seq_id],
                pa.string()),
            "span_idx": pa.array(
                batch.column("span_idx").to_numpy(zero_copy_only=False)[seq_id]
                .astype(np.int32), pa.int32()),
            "tok_idx": pa.array(pos.astype(np.int32), pa.int32()),
            "token": pa.array(flat_tokens, pa.string()),
            "tag": pa.array(labels[tags], pa.string()),
            "post": pa.array(np.round(post[np.arange(len(tags)), tags], 6)),
        })


def _prepare(texts, b: ModelBundle, gaz_row: np.ndarray,
             cache: "FeatureCache | None" = None, pats=None):
    """Shared tokenize->features->emissions prep for decode/posterior."""
    nrows, lens, codes, uniques = _tokenize_arrow(texts)
    N = len(codes)
    if N == 0:
        return None
    seq_id = np.repeat(np.arange(nrows), lens)
    starts_flat = np.cumsum(lens) - lens
    pos = np.arange(N) - np.repeat(starts_flat, lens)
    if cache is not None:
        cidx = cache.lookup(uniques)
        static_u = cache.static[cidx]
        cross_u = cache.cross_at(cidx)
        u_norm = cache.norm[cidx]
        u_first = cache.is_first[cidx]
    else:
        uniq = pd.Series(uniques, dtype=object)
        static_u, cross_u, u_norm = _unique_features(uniq, b, pats)
        first_tokens = {a.split(" ", 1)[0] for m in b.alias_by_len.values()
                        for a in m}
        u_first = np.fromiter((x in first_tokens for x in u_norm),
                              dtype=bool, count=len(u_norm))
    gaz_flags = _gazetteer(u_norm, codes, u_first[codes], seq_id,
                           b.alias_by_len)
    E = _emissions(codes, static_u, cross_u, seq_id, gaz_flags, b,
                   gaz_row, pats)
    return E, seq_id, pos, lens, uniques[codes]


def _gazetteer(u_norm: np.ndarray, codes: np.ndarray,
               first_mask: np.ndarray, seq_id: np.ndarray,
               alias_by_len: dict[int, dict[str, str]]) -> np.ndarray:
    """Greedy longest-match left-to-right -> gaz flag index per token
    (index into GAZ_VALUES: 0 = none, odd = B-, even = I-).

    ``first_mask`` marks positions whose token can START an alias
    (computed on unique tokens), so multi-token gram construction runs
    only over those sparse candidates. Token strings are reached via
    codes->u_norm indirection (no full-stream materialization).
    """
    N = len(codes)
    cand_pos = np.flatnonzero(first_mask)
    cand_L = np.zeros(N, dtype=np.int8)
    cand_t = np.full(N, -1, dtype=np.int8)
    type_idx = {t: i for i, t in enumerate(NE_TYPES)}
    for L in range(MAX_ALIAS_TOKENS, 0, -1):
        amap = alias_by_len.get(L)
        if not amap:
            continue
        if L == 1:
            for i in cand_pos:
                t = amap.get(u_norm[codes[i]])
                if t is not None and cand_L[i] == 0:
                    cand_L[i] = 1
                    cand_t[i] = type_idx[t]
        else:
            valid = cand_pos[cand_pos + L - 1 < N]
            valid = valid[seq_id[valid] == seq_id[valid + L - 1]]
            for i in valid:  # sparse: alias-start candidates only
                if cand_L[i] != 0:
                    continue
                t = amap.get(" ".join(u_norm[codes[i:i + L]]))
                if t is not None:
                    cand_L[i] = L
                    cand_t[i] = type_idx[t]
    flags = np.zeros(N, dtype=np.int64)
    cur_seq, cur_end = -1, -1
    for i in np.flatnonzero(cand_L):  # sparse: matched positions only
        s = seq_id[i]
        if s != cur_seq:
            cur_seq, cur_end = s, -1
        if i < cur_end:
            continue  # covered by an earlier (longer) accepted match
        L, t = int(cand_L[i]), int(cand_t[i])
        flags[i] = 1 + 2 * t          # B-type index in GAZ_VALUES
        if L > 1:
            flags[i + 1 : i + L] = 2 + 2 * t  # I-type
        cur_end = i + L
    return flags


def _cross_families(fams: dict) -> list[str]:
    """Families the pattern set scores at non-zero offsets (these need
    per-unique id columns for the shifted gathers in _emissions)."""
    return [f for f, offs in fams.items()
            if f != "gaz" and any(o != 0 for o in offs)]


def _family_values(fam: str, uniq: pd.Series, u_norm: pd.Series,
                   pats) -> pd.Series:
    """Observation value per unique token for one feature family —
    the engine's derived pattern columns, plus %t regex-test families
    from a custom pattern file (value '1'/'0')."""
    if fam == "low":
        return u_norm
    if fam == "shape":
        return shape_series(uniq)
    if fam.startswith("pre") and fam[3:].isdigit():
        return u_norm.str[: int(fam[3:])]
    if fam.startswith("suf") and fam[3:].isdigit():
        return u_norm.str[-int(fam[3:]):]
    if pats is not None:
        for t in pats.tests:
            if t.template_id == fam:
                import re

                col = u_norm if t.column == "low" else \
                    _family_values(t.column, uniq, u_norm, None)
                pat = re.compile(t.regex)
                if t.extract:
                    # %m: matched substring (group 1 if the regex has
                    # groups, else whole match); no match -> "" (OOV)
                    grp_re = t.regex if pat.groups else f"({t.regex})"
                    return col.str.extract(grp_re, expand=True) \
                        .iloc[:, 0].fillna("")
                return col.str.contains(pat).map({True: "1", False: "0"})
    raise KeyError(f"unknown feature family {fam!r}")


def _unique_features(uniq: pd.Series, b: ModelBundle, pats=None):
    """Per UNIQUE surface form: (static emission row (U, N_LABELS),
    cross-token id columns, normalized string), driven by the pattern
    set (default: the bundle's compiled family layout == the frozen
    FEATURE_FAMILIES, i.e. the default pattern file). The static part
    sums every offset-0 family contribution in unique space — a batch
    has few thousand distinct tokens, so the expensive string kernels
    never touch the full token stream."""
    fams = pats.score_families if pats is not None else b.families
    u_norm = normalize_series(uniq)
    static = np.zeros((len(uniq), N_LABELS))
    cross: dict[str, np.ndarray] = {}
    for fam, offs in fams.items():
        if fam == "gaz":
            continue  # structural: longest-match flags, added in _emissions
        if fam not in b.value_ids:
            continue  # family absent from the model: every value is OOV
        ids = map_to_ids(_family_values(fam, uniq, u_norm, pats),
                         b.value_ids[fam])
        model_offs = b.families.get(fam, offs)
        if 0 in offs and 0 in model_offs:
            static += b.weights[fam][ids, model_offs.index(0)]
        if any(o != 0 for o in offs):
            cross[fam] = ids
    return static, cross, u_norm.to_numpy(dtype=object)


def _emissions(codes: np.ndarray, static_u: np.ndarray,
               cross_u: dict, seq_id: np.ndarray,
               gaz_flags: np.ndarray, b: ModelBundle,
               gaz_row: np.ndarray, pats=None) -> np.ndarray:
    """(N, N_LABELS) emissions: one static gather + one shifted gather
    per (cross-family, non-zero offset) — four low-offset gathers under
    the default pattern file — + the gaz gather."""
    fams = pats.score_families if pats is not None else b.families
    E = static_u[codes]
    for fam, ids_u in cross_u.items():
        W = b.weights.get(fam)
        if W is None:
            continue  # family absent from the model: all-OOV, scores 0
        model_offs = b.families.get(fam, ())
        ids_flat = ids_u[codes]
        for off in fams[fam]:
            if off == 0 or off not in model_offs:
                continue
            # feature "fam:off:value" fires at position t when the token
            # at t+off has that value => gather ids shifted by +off
            E += W[shifted_within_seq(ids_flat, seq_id, off),
                   model_offs.index(off)]
    if "gaz" in fams and "gaz" in b.weights:
        E += b.weights["gaz"][gaz_row[gaz_flags], 0]
    return E


def _logsumexp(x: np.ndarray, axis: int) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis,
                              keepdims=True))).squeeze(axis)


def _posteriors_batch(E: np.ndarray, seq_id: np.ndarray, pos: np.ndarray,
                      lens: np.ndarray, trans: np.ndarray,
                      start: np.ndarray) -> np.ndarray:
    """Forward-backward tag marginals P(y_t = y | x), vectorized across
    the batch's sequences (operator A2 — the reference's posterior
    scoring mode, cf. Wapiti src/decoder.c --post, reconstructed).
    Returns (N, N_LABELS) probabilities for the flat token stream."""
    B = len(lens)
    T = int(lens.max()) if B else 0
    if T == 0:
        return np.zeros((0, N_LABELS))
    Epad = np.zeros((B, T, N_LABELS))
    Epad[seq_id, pos] = E
    alpha = np.zeros((B, T, N_LABELS))
    beta = np.zeros((B, T, N_LABELS))
    alpha[:, 0] = start[None, :] + Epad[:, 0]
    for t in range(1, T):
        cand = alpha[:, t - 1][:, :, None] + trans[None, :, :]
        a = _logsumexp(cand, axis=1) + Epad[:, t]
        active = (t < lens)[:, None]
        alpha[:, t] = np.where(active, a, alpha[:, t - 1])
    # beta: 0 at each sequence's last position
    for t in range(T - 2, -1, -1):
        cand = (beta[:, t + 1] + Epad[:, t + 1])[:, None, :] + trans[None, :, :]
        b = _logsumexp(cand, axis=2)
        is_last = (t == lens - 1)[:, None]
        inside = (t < lens - 1)[:, None]
        beta[:, t] = np.where(inside, b, np.where(is_last, 0.0,
                                                  beta[:, t + 1]))
    log_post = alpha + beta
    last = np.maximum(lens - 1, 0)
    logZ = _logsumexp(alpha[np.arange(B), last], axis=1)
    log_post -= logZ[:, None, None]
    return np.exp(log_post[seq_id, pos])


def _viterbi_batch(E: np.ndarray, seq_id: np.ndarray, pos: np.ndarray,
                   lens: np.ndarray, trans: np.ndarray,
                   start: np.ndarray) -> np.ndarray:
    """Vectorized-over-sequences Viterbi. Returns flat tag ids.

    Ties break toward the lowest label index (np.argmax first hit),
    matching oracle.viterbi exactly.
    """
    B = len(lens)
    T = int(lens.max()) if B else 0
    if T == 0:
        return np.zeros(0, dtype=np.int64)
    Epad = np.zeros((B, T, N_LABELS))
    Epad[seq_id, pos] = E
    dp = start[None, :] + Epad[:, 0]
    back = np.zeros((B, T, N_LABELS), dtype=np.int8)
    for t in range(1, T):
        cand = dp[:, :, None] + trans[None, :, :]       # (B, prev, next)
        bp = cand.argmax(axis=1)                        # first max = lowest prev
        m = np.take_along_axis(cand, bp[:, None, :], axis=1)[:, 0, :]
        ndp = m + Epad[:, t]
        active = t < lens
        dp = np.where(active[:, None], ndp, dp)
        back[:, t] = bp
    ptr = dp.argmax(axis=1)
    tags = np.zeros((B, T), dtype=np.int64)
    rows = np.arange(B)
    for t in range(T - 1, -1, -1):
        write = t < lens
        tags[write, t] = ptr[write]
        if t > 0:
            nb = back[rows, t, ptr]
            ptr = np.where(t < lens, nb, ptr)
    return tags[seq_id, pos]


def _tokenize_arrow(texts) -> tuple:
    """texts (pd.Series | pa.Array | pa.ChunkedArray) -> (nrows, lens,
    codes, uniques): Arrow-native whitespace tokenization + dictionary
    encoding. pc.utf8_split_whitespace matches str.split() exactly
    (whitespace runs collapse, no empties); only the UNIQUE tokens
    ever become Python strings."""
    import pyarrow.compute as pc

    if isinstance(texts, pd.Series):
        arr = pa.array(texts.fillna(""), pa.string())
    else:
        arr = texts
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
    # str.split() semantics: interior whitespace runs collapse in the
    # Arrow kernel already; leading/trailing runs and empty inputs
    # produce '' placeholder tokens -> trim first, then drop the
    # placeholders ('' can never be a real token)
    trimmed = pc.utf8_trim_whitespace(arr)
    toks = pc.utf8_split_whitespace(trimmed)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    is_empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    lens = np.where(is_empty, 0, lens)
    flat = pc.list_flatten(toks)
    if is_empty.any():
        flat = flat.filter(pc.not_equal(flat, ""))
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    return len(arr), lens, codes, uniques


def tag_spans(texts, b: ModelBundle, gaz_row: np.ndarray,
              cache: "FeatureCache | None" = None,
              pats=None) -> pa.ListArray:
    """texts (one per span row) -> list<MENTION_STRUCT> per row."""
    nrows, lens, codes, uniques = _tokenize_arrow(texts)
    N = len(codes)
    empty = pa.ListArray.from_arrays(
        np.zeros(nrows + 1, dtype=np.int32), _mentions_struct([],
        [], [], [], [], [], [], []))
    if N == 0:
        return empty

    seq_id = np.repeat(np.arange(nrows), lens)
    starts_flat = np.cumsum(lens) - lens
    pos = np.arange(N) - np.repeat(starts_flat, lens)

    if cache is not None:
        # actor-persistent memo: string kernels only touch NEW tokens
        cidx = cache.lookup(uniques)
        static_u = cache.static[cidx]
        cross_u = cache.cross_at(cidx)
        u_norm = cache.norm[cidx]
        u_len = cache.tok_len[cidx]
        u_first = cache.is_first[cidx]
    else:
        uniq = pd.Series(uniques, dtype=object)
        static_u, cross_u, u_norm = _unique_features(uniq, b, pats)
        u_len = uniq.str.len().to_numpy(dtype=np.int64)
        first_tokens = {a.split(" ", 1)[0] for m in b.alias_by_len.values()
                        for a in m}
        u_first = np.fromiter((x in first_tokens for x in u_norm),
                              dtype=bool, count=len(u_norm))

    # char offsets under the frozen single-space-join convention
    tok_len = u_len[codes]
    adv = tok_len + 1
    cum = np.cumsum(adv) - adv
    coff = cum - np.repeat(cum[starts_flat[lens > 0]], lens[lens > 0])

    gaz_flags = _gazetteer(u_norm, codes, u_first[codes], seq_id,
                           b.alias_by_len)
    E = _emissions(codes, static_u, cross_u, seq_id, gaz_flags, b,
                   gaz_row, pats)
    # only sequences with tokens enter the trellis
    tags_flat = _viterbi_batch(E, seq_id, pos, lens, b.trans, b.start)

    # ---- vectorized BIO decode (conlleval repair) ----
    tt = _LAB_TYPE[tags_flat]
    ib = _LAB_IS_B[tags_flat]
    prev_tt = shifted_within_seq(tt, seq_id, -1, fill=-1)
    starts = (tt >= 0) & (ib | (prev_tt != tt))
    next_tt = shifted_within_seq(tt, seq_id, +1, fill=-1)
    next_start = shifted_within_seq(starts.astype(np.int64), seq_id, +1, fill=1)
    ends = (tt >= 0) & ((next_tt != tt) | (next_start == 1))
    si = np.flatnonzero(starts)
    ei = np.flatnonzero(ends)
    assert len(si) == len(ei)

    m_seq = seq_id[si]
    tok_begin = pos[si]
    tok_end = pos[ei] + 1
    char_off = coff[si]
    ne_type = _TYPE_NAMES[tt[si]]
    # surfaces = space-joined tokens, built VECTORIZED per mention
    # length (char-wise normalization distributes over spaces, so the
    # normalized surface is the join of normalized tokens). All
    # gathers go codes->uniques, so only mention-covered tokens ever
    # materialize as Python strings.
    surfaces = _join_ranges(uniques, codes, si, ei)
    norm_surf = _join_ranges(u_norm, codes, si, ei)
    # connective = norm token right after the mention (same sequence)
    nxt = ei + 1
    conn_ok = (nxt < N) & (seq_id[np.minimum(nxt, N - 1)] == m_seq)
    conn = np.where(conn_ok, u_norm[codes[np.minimum(nxt, N - 1)]], "")

    struct = _mentions_struct(tok_begin, tok_end, char_off, surfaces,
                              norm_surf, conn, ne_type,
                              np.ones(len(si)))
    counts = np.bincount(m_seq, minlength=nrows)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)


def _join_ranges(uniq_values: np.ndarray, codes: np.ndarray,
                 si: np.ndarray, ei: np.ndarray) -> np.ndarray:
    """Space-join uniq_values[codes[si[m]..ei[m]]] per mention m —
    vectorized per mention LENGTH (pandas str.cat over gathered
    columns). Gathers are int-indexed; only mention tokens touch
    Python strings."""
    m = len(si)
    out = np.empty(m, dtype=object)
    if m == 0:
        return out
    m_len = ei - si + 1
    for L in np.unique(m_len):
        sel = np.flatnonzero(m_len == L)
        base = si[sel]
        if L == 1:
            out[sel] = uniq_values[codes[base]]
        else:
            first = pd.Series(uniq_values[codes[base]], dtype=object)
            others = [pd.Series(uniq_values[codes[base + k]], dtype=object)
                      for k in range(1, int(L))]
            out[sel] = first.str.cat(others, sep=" ").to_numpy(dtype=object)
    return out


def _mentions_struct(tok_begin, tok_end, char_off, surfaces, norm_surf,
                     conn, ne_type, score) -> pa.StructArray:
    return pa.StructArray.from_arrays(
        [
            pa.array(np.asarray(tok_begin, dtype=np.int32), pa.int32()),
            pa.array(np.asarray(tok_end, dtype=np.int32), pa.int32()),
            pa.array(np.asarray(char_off, dtype=np.int32), pa.int32()),
            pa.array(np.asarray(surfaces, dtype=object), pa.string()),
            pa.array(np.asarray(norm_surf, dtype=object), pa.string()),
            pa.array(np.asarray(conn, dtype=object), pa.string()),
            pa.array(np.asarray(ne_type, dtype=object), pa.string()),
            pa.array(np.asarray(score, dtype=np.float64), pa.float64()),
        ],
        fields=list(MENTION_STRUCT),
    )
