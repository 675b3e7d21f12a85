"""Broadcast model state: CRF weights + alias dictionary, loaded once.

The sparse on-disk model (feature, label, weight — mirroring a Wapiti
model file, i.e. pattern set + sparse weights; cf. Wapiti src/model.c,
reconstructed per SURVEY.md §0) is compiled into dense per-family
weight matrices for vectorized scoring, then ``ray.put`` once on the
driver; every tagger/linker actor does ``ray.get`` in ``__init__``
(broadcast pattern — no per-batch reshipping, no shuffle join for the
small side).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq

from ner_ray.constants import (
    FEATURE_FAMILIES,
    LABEL_INDEX,
    MAX_ALIAS_TOKENS,
    N_LABELS,
    START_FEATURE,
    TRANS_PREFIX,
)

# Gazetteer flag vocabulary: index 0 = no flag ("")
GAZ_VALUES: list[str] = [""] + [
    f"{b}-{t}" for t in ("PER", "ORG", "LOC", "MISC") for b in ("B", "I")
]
GAZ_INDEX: dict[str, int] = {v: i for i, v in enumerate(GAZ_VALUES)}


@dataclass
class ModelBundle:
    """Dense, numpy-native compilation of model + alias dict.

    weights[family] : (n_values+1, n_offsets, N_LABELS) float64; row 0 is
                      the OOV/pad row (all zeros) so out-of-vocabulary and
                      out-of-sequence lookups contribute nothing — exactly
                      like an absent sparse feature.
    value_ids[family] : dict value -> row index (>=1)
    """

    weights: dict[str, np.ndarray]
    value_ids: dict[str, dict[str, int]]
    # feature-family layout this bundle was compiled with: family ->
    # ordered offset tuple (the offset AXIS of each weight matrix).
    # Defaults to the frozen constants.FEATURE_FAMILIES; a custom
    # pattern file (functions/patterns.py) supplies its own.
    families: dict[str, tuple[int, ...]]
    trans: np.ndarray        # (N_LABELS, N_LABELS)
    start: np.ndarray        # (N_LABELS,)
    # gazetteer: per n-gram length L -> dict "tok tok.." -> ne_type
    alias_by_len: dict[int, dict[str, str]]
    # linking: alias -> (entity_ids list, priors ndarray, ne_type)
    candidates: dict[str, tuple[list[str], np.ndarray, str]]
    # fused path: (alias) -> (best_entity, best_prior) given type match
    best_link: dict[str, tuple[str, float]]
    alias_types: dict[str, str]

    @classmethod
    def load(cls, model_path: str, alias_path: str,
             families: "dict[str, tuple[int, ...]] | None" = None
             ) -> "ModelBundle":
        mt = pq.read_table(model_path)
        return cls.from_rows(
            mt.column("feature").to_pylist(),
            mt.column("label").to_pylist(),
            mt.column("weight").to_pylist(),
            alias_path, families)

    @classmethod
    def from_rows(cls, feats, labels, ws, alias_path: str,
                  families: "dict[str, tuple[int, ...]] | None" = None
                  ) -> "ModelBundle":
        strict = families is None
        fams: dict[str, tuple[int, ...]] = dict(families or FEATURE_FAMILIES)
        trans = np.zeros((N_LABELS, N_LABELS))
        start = np.zeros(N_LABELS)
        # first pass: collect per-family value -> offset -> label weights.
        # With an EXPLICIT layout (pattern-file path), families present in
        # the file but absent from it are added with their observed
        # offsets so custom-trained models (e.g. %t regex-test families)
        # load without a schema; under the default layout an unknown
        # family is a corrupt model file and fails fast.
        parsed: list[tuple[str, int, str, int, float]] = []
        extra_offs: dict[str, set[int]] = {}
        for f, l, w in zip(feats, labels, ws):
            li = LABEL_INDEX[l]
            if f == START_FEATURE:
                start[li] = w
                continue
            if f.startswith(TRANS_PREFIX):
                trans[LABEL_INDEX[f[len(TRANS_PREFIX):]], li] = w
                continue
            fam, off_s, value = f.split(":", 2)
            off = int(off_s)
            parsed.append((fam, off, value, li, w))
            if fam not in fams:
                if strict:
                    raise ValueError(
                        f"unknown feature family {fam!r} in model file "
                        f"(expected one of {sorted(fams)}); pass "
                        f"families= to load a custom layout")
                extra_offs.setdefault(fam, set()).add(off)
        for fam, offs in extra_offs.items():
            fams[fam] = tuple(sorted(offs))
        offset_pos = {
            fam: {off: i for i, off in enumerate(offs)}
            for fam, offs in fams.items()
        }
        sparse: dict[str, dict[str, dict[tuple[int, int], float]]] = {
            fam: {} for fam in fams
        }
        for fam, off, value, li, w in parsed:
            pos = offset_pos[fam].get(off)
            if pos is None:
                raise ValueError(
                    f"model row {fam}:{off}:{value} uses offset {off} "
                    f"not declared in family {fam!r}'s layout "
                    f"{tuple(offset_pos[fam])} — the pattern block is "
                    f"narrower than the trained model")
            cell = sparse[fam].setdefault(value, {})
            cell[(pos, li)] = w

        weights: dict[str, np.ndarray] = {}
        value_ids: dict[str, dict[str, int]] = {}
        for fam, offs in fams.items():
            vals = sorted(sparse[fam])
            ids = {v: i + 1 for i, v in enumerate(vals)}
            W = np.zeros((len(vals) + 1, len(offs), N_LABELS))
            for v, cells in sparse[fam].items():
                for (oi, li), w in cells.items():
                    W[ids[v], oi, li] = w
            weights[fam] = W
            value_ids[fam] = ids

        at = pq.read_table(alias_path)
        aliases = at.column("alias").to_pylist()
        entities = at.column("entity_id").to_pylist()
        types = at.column("ne_type").to_pylist()
        priors = at.column("prior").to_pylist()

        alias_by_len: dict[int, dict[str, str]] = {
            L: {} for L in range(1, MAX_ALIAS_TOKENS + 1)
        }
        alias_types: dict[str, str] = {}
        cand_tmp: dict[str, list[tuple[str, float, str]]] = {}
        for a, e, t, p in zip(aliases, entities, types, priors):
            L = a.count(" ") + 1
            if L <= MAX_ALIAS_TOKENS:
                alias_by_len[L][a] = t
            # frozen semantics: an alias maps to exactly ONE ne_type
            # (the oracle's build_alias_maps enforces the same)
            prev = alias_types.setdefault(a, t)
            if prev != t:
                raise ValueError(f"alias {a!r} maps to multiple ne_types")
            cand_tmp.setdefault(a, []).append((e, float(p), t))

        candidates: dict[str, tuple[list[str], np.ndarray, str]] = {}
        best_link: dict[str, tuple[str, float]] = {}
        for a, lst in cand_tmp.items():
            ents = [e for e, _p, _t in lst]
            ps = np.array([p for _e, p, _t in lst])
            candidates[a] = (ents, ps, lst[0][2])
            # argmax prior; ties -> lexicographically smallest entity_id
            best = min(lst, key=lambda ept: (-ept[1], ept[0]))
            best_link[a] = (best[0], best[1])

        return cls(weights, value_ids, fams, trans, start, alias_by_len,
                   candidates, best_link, alias_types)


def put_bundle(model_path: str, alias_path: str, families=None):
    """Load + broadcast: returns an ObjectRef to pass to actor
    constructors via fn_constructor_kwargs (zero-copy to all workers)."""
    import ray

    return ray.put(ModelBundle.load(model_path, alias_path, families))


# ------------------------------------------------ text model format
#
# Wapiti dumps/loads a self-describing TEXT model: a header, the
# embedded pattern block, then the sparse feature weights (cf. Wapiti
# src/model.c mdl_save/mdl_load, reconstructed from public docs). Ours
# mirrors that shape (not byte-compatible): weights serialize with
# float.hex() so a round trip is bit-exact.

# v1 wrote feature/label values verbatim; v2 escapes \\ \t \n \r so
# %m-extracted values can't corrupt the tab/line framing. Export always
# writes v2; import accepts both and only un-escapes v2 (a v1 file with
# a literal backslash must round-trip unchanged).
_TEXT_MAGIC = "#ner_ray_model#2"
_TEXT_MAGIC_V1 = "#ner_ray_model#1"


def _esc(s: str) -> str:
    """Escape separators in feature/label values: a %m-extracted value
    can legally contain tab/newline, which would corrupt the
    line/tab-framed text format."""
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


def _unesc(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            out.append({"\\": "\\", "t": "\t", "n": "\n", "r": "\r"}
                       .get(nxt, "\\" + nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def export_model_text(model_table, pattern_text: str | None = None) -> str:
    """Sparse model table (+ optional embedded pattern file) -> text."""
    if pattern_text is None:
        from ner_ray.functions.patterns import default_pattern_text

        pattern_text = default_pattern_text()
    pat_lines = pattern_text.rstrip("\n").splitlines()
    feats = model_table.column("feature").to_pylist()
    labels = model_table.column("label").to_pylist()
    ws = model_table.column("weight").to_pylist()
    out = [_TEXT_MAGIC, f"#patterns#{len(pat_lines)}"]
    out += pat_lines
    out.append(f"#features#{len(feats)}")
    for f, l, w in zip(feats, labels, ws):
        out.append(f"{_esc(f)}\t{_esc(l)}\t{float(w).hex()}")
    return "\n".join(out) + "\n"


def import_model_text(text: str):
    """Inverse of export_model_text -> (model pa.Table, pattern_text).
    Validates section counts; weights parse bit-exactly via
    float.fromhex."""
    import pyarrow as pa

    from ner_ray import schema as S

    lines = text.rstrip("\n").split("\n")
    if not lines or lines[0] not in (_TEXT_MAGIC, _TEXT_MAGIC_V1):
        raise ValueError("not a ner_ray text model (bad magic)")
    unesc = _unesc if lines[0] == _TEXT_MAGIC else (lambda s: s)
    if len(lines) < 2 or not lines[1].startswith("#patterns#"):
        raise ValueError("missing #patterns# section")
    n_pat = int(lines[1].split("#")[-1])
    pat_lines = lines[2:2 + n_pat]
    if len(pat_lines) < n_pat or len(lines) <= 2 + n_pat:
        raise ValueError(
            f"pattern section truncated: expected {n_pat} pattern lines "
            f"plus a #features# header")
    fhdr = lines[2 + n_pat]
    if not fhdr.startswith("#features#"):
        raise ValueError("missing #features# section "
                         "(#patterns# count may be wrong)")
    n_feat = int(fhdr.split("#")[-1])
    rows = lines[3 + n_pat:3 + n_pat + n_feat]
    if len(rows) != n_feat:
        raise ValueError(
            f"feature section truncated: {len(rows)} != {n_feat}")
    feats, labels, ws = [], [], []
    for r in rows:
        f, l, w = r.split("\t")
        feats.append(unesc(f))
        labels.append(unesc(l))
        ws.append(float.fromhex(w))
    tbl = pa.table({"feature": feats, "label": labels, "weight": ws},
                   schema=S.CRF_MODEL)
    return tbl, "\n".join(pat_lines) + "\n"


def save_model_text(model_path: str, out_path: str,
                    pattern_text: str | None = None) -> None:
    """Parquet sparse model -> Wapiti-shaped text file on disk."""
    import pyarrow.parquet as pq_

    with open(out_path, "w") as fh:
        fh.write(export_model_text(pq_.read_table(model_path),
                                   pattern_text))


def load_model_text(path: str, alias_path: str) -> "ModelBundle":
    """Text model file -> ModelBundle (pattern block drives the family
    layout, so custom-offset models compile correctly)."""
    from ner_ray.functions.patterns import parse_pattern_file

    with open(path) as fh:
        tbl, pattern_text = import_model_text(fh.read())
    pats = parse_pattern_file(pattern_text)
    return ModelBundle.from_rows(
        tbl.column("feature").to_pylist(),
        tbl.column("label").to_pylist(),
        tbl.column("weight").to_pylist(),
        alias_path, families=pats.families)
