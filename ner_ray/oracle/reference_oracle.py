"""Single-process reference oracle — the frozen semantics of the engine.

The reference checkout (/root/reference) is EMPTY in this sandbox
(SURVEY.md section 0), so this module IS the executable ground truth: a
deliberately simple, pure-Python(+numpy-for-Viterbi) implementation of
the reconstructed synalp/NER semantics — Wapiti-style feature templates
(cf. Wapiti src/pattern.c, reconstructed), Viterbi decode
(cf. Wapiti src/decoder.c, reconstructed), CoNLL BIO chunking with
conlleval-style repair, gazetteer longest match, alias linking, the
triple rule, and alias-sharing canonicalization.

The distributed Ray pipeline must reproduce this oracle's outputs with
P = R = 1.0 (spec requires >= 0.95, BASELINE.json:2). Nothing here uses
Ray; nothing in the Ray stages imports this module (shared constants
only, from ner_ray.constants).

Frozen rules (changing any of these redefines the "reference"):

* tokenize(text)   = text.split(); char offsets assume single-space
                     joining (cumsum of len+1) — the fixture generator
                     emits single-spaced text.
* norm(tok)        = tok.lower() with every digit replaced by '0'.
* shape(tok)       = chars mapped X/x/0/p, consecutive runs collapsed.
* gazetteer        = greedy longest-match left-to-right over normalized
                     tokens, alias length <= MAX_ALIAS_TOKENS.
* CRF score        = sum of (feature,label) weights over the template
                     families in constants.FEATURE_FAMILIES
                     + transition(prev,label) + start(label at t=0).
* Viterbi          = argmax path; ties broken toward the LOWEST label
                     index in constants.LABELS (numpy argmax order).
* BIO decode       = maximal B-X (I-X)* runs; an I-X with no valid
                     B-X/I-X predecessor is repaired to B-X
                     (conlleval semantics).
* linking          = normalized surface -> alias candidates, keep those
                     with ne_type == mention type; argmax prior, ties
                     -> lexicographically smallest entity_id; no
                     candidate -> NIL (dropped).
* triples          = per (doc_id, span_idx): linked mentions ordered by
                     tok_begin; for every pair i<j with
                     0 <= gap = j.tok_begin - i.tok_end <= TRIPLE_WINDOW:
                     subj=i.entity, obj=j.entity,
                     connective = norm token at position i.tok_end if
                     gap >= 1 else ADJACENT_CONNECTIVE,
                     pred = f"{type_i}:{connective}:{type_j}".lower(),
                     score = round(link_score_i * link_score_j, 6).
* dedup            = one row per (subj, pred, obj), weight = multiplicity.
* canonicalize     = connected components of the bipartite
                     entity-alias graph over the FULL alias table;
                     canonical_id = min entity_id in the component.
* adjacency        = resolved+deduped triples grouped by subj; edges
                     sorted by (weight desc, dst asc, pred asc).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from ner_ray.constants import (
    ADJACENT_CONNECTIVE,
    FEATURE_FAMILIES,
    LABEL_INDEX,
    LABELS,
    MAX_ALIAS_TOKENS,
    N_LABELS,
    PAD_VALUE,
    START_FEATURE,
    TRANS_PREFIX,
    TRIPLE_WINDOW,
)

_DIGITS = re.compile(r"\d")


# ---------------------------------------------------------------- text


def tokenize(text: str) -> list[str]:
    return text.split()


def char_offsets(tokens: list[str]) -> list[int]:
    """Offsets under the frozen single-space-joined convention."""
    out, pos = [], 0
    for t in tokens:
        out.append(pos)
        pos += len(t) + 1
    return out


def norm(tok: str) -> str:
    return _DIGITS.sub("0", tok.lower())


def shape(tok: str) -> str:
    out = []
    for ch in tok:
        c = "X" if ch.isupper() else "x" if ch.islower() else "0" if ch.isdigit() else "p"
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


# ------------------------------------------------------------ gazetteer


def gazetteer_flags(norm_tokens: list[str], alias_types: dict[str, str]) -> list[str]:
    """Greedy longest-match; returns per-token "" / "B-X" / "I-X"."""
    T = len(norm_tokens)
    flags = [""] * T
    i = 0
    while i < T:
        matched = False
        for L in range(min(MAX_ALIAS_TOKENS, T - i), 0, -1):
            key = " ".join(norm_tokens[i : i + L])
            t = alias_types.get(key)
            if t is not None:
                flags[i] = f"B-{t}"
                for k in range(i + 1, i + L):
                    flags[k] = f"I-{t}"
                i += L
                matched = True
                break
        if not matched:
            i += 1
    return flags


# ------------------------------------------------------------ CRF model


@dataclass
class OracleModel:
    """Sparse model: (feature string, label) -> weight, plus dense
    transition/start matrices. Loaded from the on-disk model table."""

    emission: dict[str, np.ndarray] = field(default_factory=dict)  # feature -> (N_LABELS,)
    trans: np.ndarray = field(default_factory=lambda: np.zeros((N_LABELS, N_LABELS)))
    start: np.ndarray = field(default_factory=lambda: np.zeros(N_LABELS))

    @classmethod
    def from_rows(cls, features, labels, weights) -> "OracleModel":
        m = cls()
        for f, l, w in zip(features, labels, weights):
            li = LABEL_INDEX[l]
            if f == START_FEATURE:
                m.start[li] = w
            elif f.startswith(TRANS_PREFIX):
                prev = LABEL_INDEX[f[len(TRANS_PREFIX):]]
                m.trans[prev, li] = w
            else:
                row = m.emission.get(f)
                if row is None:
                    row = np.zeros(N_LABELS)
                    m.emission[f] = row
                row[li] = w
        return m

    @classmethod
    def from_parquet(cls, path: str) -> "OracleModel":
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        return cls.from_rows(
            t.column("feature").to_pylist(),
            t.column("label").to_pylist(),
            t.column("weight").to_pylist(),
        )


def token_features(tokens: list[str], norm_tokens: list[str], gaz: list[str], t: int) -> list[str]:
    """Feature strings for position t per the frozen template families."""
    T = len(tokens)

    def at(arr: list[str], off: int) -> str:
        j = t + off
        return arr[j] if 0 <= j < T else PAD_VALUE

    feats = []
    for off in FEATURE_FAMILIES["low"]:
        feats.append(f"low:{off}:{at(norm_tokens, off)}")
    feats.append(f"shape:0:{shape(tokens[t])}")
    n = norm_tokens[t]
    for k in (1, 2, 3):
        feats.append(f"pre{k}:0:{n[:k]}")
        feats.append(f"suf{k}:0:{n[-k:]}")
    feats.append(f"gaz:0:{gaz[t]}")
    return feats


def emission_scores(tokens: list[str], norm_tokens: list[str], gaz: list[str], model: OracleModel) -> np.ndarray:
    T = len(tokens)
    E = np.zeros((T, N_LABELS))
    for t in range(T):
        for f in token_features(tokens, norm_tokens, gaz, t):
            row = model.emission.get(f)
            if row is not None:
                E[t] += row
    return E


def viterbi(E: np.ndarray, trans: np.ndarray, start: np.ndarray) -> list[int]:
    """argmax path; ties -> lowest label index (np.argmax first-hit)."""
    T = E.shape[0]
    if T == 0:
        return []
    dp = start + E[0]
    back = np.zeros((T, N_LABELS), dtype=np.int64)
    for t in range(1, T):
        cand = dp[:, None] + trans  # (prev, next)
        back[t] = np.argmax(cand, axis=0)
        dp = cand[back[t], np.arange(N_LABELS)] + E[t]
    path = [int(np.argmax(dp))]
    for t in range(T - 1, 0, -1):
        path.append(int(back[t, path[-1]]))
    return path[::-1]


def bio_decode(tag_ids: list[int]) -> list[tuple[int, int, str]]:
    """Maximal chunks [(tok_begin, tok_end_exclusive, type)] with
    conlleval-style repair: I-X starting a chunk acts as B-X."""
    chunks = []
    cur_type, cur_begin = None, 0
    for i, ti in enumerate(tag_ids):
        lab = LABELS[ti]
        if lab == "O":
            if cur_type is not None:
                chunks.append((cur_begin, i, cur_type))
                cur_type = None
            continue
        b, typ = lab.split("-", 1)
        if cur_type == typ and b == "I":
            continue  # extend current chunk
        if cur_type is not None:
            chunks.append((cur_begin, i, cur_type))
        cur_type, cur_begin = typ, i  # B-X, or repaired I-X
    if cur_type is not None:
        chunks.append((cur_begin, len(tag_ids), cur_type))
    return chunks


# -------------------------------------------------------------- linking


def build_alias_maps(alias_rows) -> tuple[dict[str, str], dict[str, list[tuple[str, float]]]]:
    """alias table rows (alias, entity_id, ne_type, prior) ->
    (alias -> ne_type, alias -> [(entity_id, prior), ...])."""
    alias_types: dict[str, str] = {}
    candidates: dict[str, list[tuple[str, float]]] = {}
    for alias, entity_id, ne_type, prior in alias_rows:
        prev = alias_types.setdefault(alias, ne_type)
        if prev != ne_type:
            raise ValueError(f"alias {alias!r} maps to multiple ne_types")
        candidates.setdefault(alias, []).append((entity_id, float(prior)))
    return alias_types, candidates


def link_mention(norm_surface: str, ne_type: str, alias_types: dict[str, str],
                 candidates: dict[str, list[tuple[str, float]]]):
    """-> (entity_id, link_score) or None (NIL)."""
    if alias_types.get(norm_surface) != ne_type:
        return None
    cands = candidates[norm_surface]
    # argmax prior; ties -> lexicographically smallest entity_id
    best = min(cands, key=lambda ep: (-ep[1], ep[0]))
    return best[0], best[1]


# -------------------------------------------------------------- triples


def extract_triples(linked, norm_tokens: list[str]):
    """linked: [(tok_begin, tok_end, ne_type, entity_id, link_score)]
    sorted by tok_begin, within ONE text span. -> triple dicts."""
    out = []
    linked = sorted(linked, key=lambda m: m[0])
    for i in range(len(linked)):
        bi, ei, ti, enti, si = linked[i]
        for j in range(i + 1, len(linked)):
            bj, ej, tj, entj, sj = linked[j]
            gap = bj - ei
            if gap < 0:
                continue
            if gap > TRIPLE_WINDOW:
                break
            conn = norm_tokens[ei] if gap >= 1 else ADJACENT_CONNECTIVE
            out.append(
                {
                    "subj": enti,
                    "pred": f"{ti}:{conn}:{tj}".lower(),
                    "obj": entj,
                    "score": round(si * sj, 6),
                }
            )
    return out


# ------------------------------------------------------- canonicalize


def components_from_alias(alias_rows) -> dict[str, str]:
    """Union-find over the bipartite entity-alias graph.
    -> entity_id -> canonical_id (min entity_id in component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as root => canonical = min of component
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    by_alias: dict[str, list[str]] = {}
    for alias, entity_id, _t, _p in alias_rows:
        parent.setdefault(entity_id, entity_id)
        by_alias.setdefault(alias, []).append(entity_id)
    for ents in by_alias.values():
        for e in ents[1:]:
            union(ents[0], e)
    return {e: find(e) for e in parent}


def component_diameter_hops(alias_rows) -> int:
    """Rounds of SYNCHRONOUS (Jacobi) bipartite min-label propagation
    needed to converge — each round reads the previous round's labels
    only, exactly matching the round-capped DuckDB canon oracle SQL
    (queries_kg._canon_sql). An in-place (Gauss-Seidel) sweep would
    under-count depending on alias iteration order and make the
    fixture-time assert unsound."""
    edges: dict[str, list[str]] = {}
    label = {}
    for alias, entity_id, _t, _p in alias_rows:
        edges.setdefault(alias, []).append(entity_id)
        label[entity_id] = entity_id
    rounds = 0
    while True:
        prev = dict(label)
        new_label = dict(prev)
        for ents in edges.values():
            m = min(prev[e] for e in ents)  # previous round only
            for e in ents:
                if new_label[e] > m:
                    new_label[e] = m
        if new_label == label:
            return rounds
        label = new_label
        rounds += 1


# --------------------------------------------------- full doc pipeline


@dataclass
class OracleOutputs:
    mentions: list[dict]
    links: list[dict]
    triples: list[dict]


def run_doc(doc_id: str, spans: list[dict], model: OracleModel,
            alias_types: dict[str, str],
            candidates: dict[str, list[tuple[str, float]]]) -> OracleOutputs:
    """Run the frozen pipeline over one interleaved document."""
    mentions, links, triples = [], [], []
    for span_idx, span in enumerate(spans):
        if span["kind"] != "text" or not span["text"]:
            continue
        tokens = tokenize(span["text"])
        if not tokens:
            continue
        norms = [norm(t) for t in tokens]
        offs = char_offsets(tokens)
        gaz = gazetteer_flags(norms, alias_types)
        E = emission_scores(tokens, norms, gaz, model)
        tags = viterbi(E, model.trans, model.start)
        linked_here = []
        for (b, e, typ) in bio_decode(tags):
            surface = " ".join(tokens[b:e])
            m = {
                "doc_id": doc_id, "span_idx": span_idx,
                "tok_begin": b, "tok_end": e,
                "char_offset": offs[b], "surface": surface,
                "ne_type": typ, "score": 1.0,
            }
            mentions.append(m)
            res = link_mention(" ".join(norms[b:e]), typ, alias_types, candidates)
            if res is not None:
                entity_id, prior = res
                links.append({**m, "entity_id": entity_id, "link_score": prior})
                linked_here.append((b, e, typ, entity_id, prior))
        for tr in extract_triples(linked_here, norms):
            triples.append({**tr, "doc_id": doc_id, "span_idx": span_idx})
    return OracleOutputs(mentions, links, triples)


def dedup_triples(triples: list[dict]) -> list[dict]:
    agg: dict[tuple[str, str, str], int] = {}
    for t in triples:
        k = (t["subj"], t["pred"], t["obj"])
        agg[k] = agg.get(k, 0) + 1
    return [
        {"subj": s, "pred": p, "obj": o, "weight": w}
        for (s, p, o), w in sorted(agg.items())
    ]


def resolve_triples(deduped: list[dict], canon: dict[str, str]) -> list[dict]:
    agg: dict[tuple[str, str, str], int] = {}
    for t in deduped:
        k = (canon.get(t["subj"], t["subj"]), t["pred"], canon.get(t["obj"], t["obj"]))
        agg[k] = agg.get(k, 0) + t["weight"]
    return [
        {"subj": s, "pred": p, "obj": o, "weight": w}
        for (s, p, o), w in sorted(agg.items())
    ]


def adjacency(resolved: list[dict]) -> list[dict]:
    by_src: dict[str, list[dict]] = {}
    for t in resolved:
        by_src.setdefault(t["subj"], []).append(t)
    out = []
    for src in sorted(by_src):
        edges = sorted(
            by_src[src], key=lambda t: (-t["weight"], t["obj"], t["pred"])
        )
        out.append(
            {
                "src": src,
                "degree": len(edges),
                "edges": [
                    {"dst": t["obj"], "pred": t["pred"], "weight": t["weight"]}
                    for t in edges
                ],
            }
        )
    return out


# -------------------------------------------------- posterior scoring


def _logsumexp_1d(v: np.ndarray) -> float:
    m = float(np.max(v))
    return m + float(np.log(np.sum(np.exp(v - m))))


def posterior_marginals(E: np.ndarray, trans: np.ndarray,
                        start: np.ndarray) -> np.ndarray:
    """Forward-backward tag marginals P(y_t = y | x) for ONE sequence
    (log space, plain per-position loops). This is the independent
    golden for the distributed batched kernel in
    stages/tagger._posteriors_batch (the --post scoring mode)."""
    T = E.shape[0]
    alpha = np.zeros((T, N_LABELS))
    beta = np.zeros((T, N_LABELS))
    alpha[0] = start + E[0]
    for t in range(1, T):
        for y in range(N_LABELS):
            alpha[t, y] = _logsumexp_1d(alpha[t - 1] + trans[:, y]) + E[t, y]
    for t in range(T - 2, -1, -1):
        for y in range(N_LABELS):
            beta[t, y] = _logsumexp_1d(beta[t + 1] + trans[y, :] + E[t + 1])
    log_z = _logsumexp_1d(alpha[T - 1])
    return np.exp(alpha + beta - log_z)


def run_doc_posteriors(doc_id: str, spans: list[dict], model: OracleModel,
                       alias_types: dict[str, str]) -> list[dict]:
    """One row per token: the Viterbi tag and its forward-backward
    marginal, rounded half-even at 6 dp (np.round scaling semantics —
    the output contract shared with stages/tagger.PosteriorActor)."""
    rows = []
    for span_idx, span in enumerate(spans):
        if span["kind"] != "text" or not span["text"]:
            continue
        tokens = tokenize(span["text"])
        if not tokens:
            continue
        norms = [norm(t) for t in tokens]
        gaz = gazetteer_flags(norms, alias_types)
        E = emission_scores(tokens, norms, gaz, model)
        tags = viterbi(E, model.trans, model.start)
        marg = posterior_marginals(E, model.trans, model.start)
        for t, (tok, y) in enumerate(zip(tokens, tags)):
            rows.append({
                "doc_id": doc_id, "span_idx": span_idx, "tok_idx": t,
                "token": tok, "tag": LABELS[y],
                "post": float(np.round(marg[t, y], 6)),
            })
    return rows
