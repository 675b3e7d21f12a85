"""Deterministic fixture generation (seed 42, no wall-clock, no network).

Generates the pinned interleaved-docs input table (FIXTURES.md A1), the
alias broadcast table (A2), the frozen CRF model (A3), and — via the
single-process reference oracle — the golden mentions/links/triples/
components tables (A4). Everything a test or bench consumes comes from
here; nothing is hand-written.

Design notes
------------
* Filler vocabulary (50 words) is disjoint from every name-part token,
  and name-part token sets are disjoint across NE types, so an alias
  maps to exactly one ne_type (asserted).
* Entity popularity ~ Zipf(a=1.5) => a few head entities dominate,
  exercising the salted-key shuffle paths.
* Single-token aliases (last names, city names, org acronym parts) are
  naturally shared across entities => canonicalization components.
* The CRF model gives gazetteer-BIO features a +10 margin over small
  rng noise on lexical features, plus hard-forbidden transitions, so
  the Viterbi decode is exact and verifiable yet runs the full
  feature-template + trellis machinery.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ner_ray import schema as S
from ner_ray.constants import (
    CANON_MAX_HOPS,
    FORBIDDEN_WEIGHT,
    LABELS,
    NE_TYPES,
)
from ner_ray.oracle import reference_oracle as oracle

SEED = 42

VOCAB: list[str] = (
    "the fast key order sort table scan merge index query data block batch "
    "stream shuffle join filter map reduce cache disk node task actor graph "
    "edge vertex span token label model weight score link alias text media "
    "audio image frame byte row column value count group hash salt bucket "
    "window"
).split()
assert len(VOCAB) == 50

_FIRST = ["Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
          "Irene", "Jack", "Karen", "Leo", "Mona", "Nina", "Oscar", "Paul",
          "Quinn", "Rosa", "Sam", "Tina"]
_LAST = ["Anders", "Baker", "Chen", "Dubois", "Evans", "Fischer", "Garcia",
         "Hansen", "Ito", "Jones", "Kumar", "Lopez", "Muller", "Novak",
         "Olsen", "Park", "Qureshi", "Rossi", "Silva", "Tanaka"]
_PER_SUFFIX = ["Junior", "Senior", "Second", "Third", "Fourth", "Fifth"]

_ORG1 = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
         "Cyberdyne", "Tyrell", "Aperture", "Hooli", "Vandelay", "Wonka",
         "Duff", "Oscorp", "Virtucon", "Zorg", "Monarch", "Nakatomi",
         "Weyland", "Yutani", "Soylent", "Omni", "Gringotts", "Sterling",
         "Dunder", "Mifflin", "Prestige", "Vortex", "Nimbus", "Zenith"]
_ORG2 = ["Holdings", "Industries", "Logistics", "Dynamics", "Robotics",
         "Analytics", "Energy", "Capital", "Ventures", "Partners",
         "Networks", "Biotech", "Aerospace", "Mining", "Shipping",
         "Telecom", "Pharma", "Motors", "Foods", "Broadcast", "Software",
         "Consulting", "Trading", "Insurance", "Banking", "Retail",
         "Textiles", "Chemicals", "Plastics", "Forestry"]
_ORG_SUFFIX = ["Corp", "Incorporated", "Limited", "Trust", "Consortium",
               "Company", "International", "Collective"]

_LOC_QUAL = ["North", "South", "East", "West", "Upper", "Lower", "New",
             "Old", "Port", "Fort"]
_CITY = ["Paris", "London", "Berlin", "Madrid", "Tokyo", "Oslo", "Cairo",
         "Lima", "Delhi", "Seoul", "Quebec", "Dublin", "Vienna", "Prague",
         "Athens", "Boston", "Denver", "Austin", "Geneva", "Zurich",
         "Nairobi", "Bogota", "Havana", "Kyoto", "Lagos", "Manila",
         "Naples", "Osaka", "Perth", "Rabat"]
_DISTRICT = ["Heights", "Valley", "Harbor", "Ridge", "Falls", "Springs",
             "Gardens", "Meadows", "Crossing", "Junction", "Terrace",
             "Commons", "Landing", "Hollow", "Pines"]

_MISC_ADJ = ["Grand", "Royal", "Global", "Summer", "Winter", "Annual",
             "Pacific", "Atlantic", "Imperial", "Classic", "Golden",
             "Silver"]
_MISC_BASE = ["Olympics", "Summit", "Festival", "Expo", "Carnival",
              "Biennale", "Marathon", "Regatta", "Symposium", "Jubilee",
              "Congress", "Derby", "Gala", "Tournament", "Pageant"]
_MISC_ED = ["Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Omega", "Prime",
            "Nova", "Ultra", "Mega", "Micro", "Retro"]

_PARTS_BY_TYPE = {
    "PER": _FIRST + _LAST + _PER_SUFFIX,
    "ORG": _ORG1 + _ORG2 + _ORG_SUFFIX,
    "LOC": _LOC_QUAL + _CITY + _DISTRICT,
    "MISC": _MISC_ADJ + _MISC_BASE + _MISC_ED,
}

# docs, entities, derive golds
SIZES: dict[str, tuple[int, int, bool]] = {
    "tiny": (200, 500, True),
    "small": (5000, 500, True),
    "bench": (200_000, 2000, False),
}

FIXTURE_ROOT = os.environ.get("NER_RAY_FIXTURE_DIR", "/tmp/ner_ray_fixtures")


def _check_part_invariants() -> None:
    vocab = set(VOCAB)
    seen: dict[str, str] = {}
    for t, parts in _PARTS_BY_TYPE.items():
        for p in parts:
            n = p.lower()
            assert n not in vocab, f"name part {p} collides with vocab"
            assert seen.setdefault(n, t) == t, f"part {p} in two types"


def _gen_names(rng: np.random.Generator, ne_type: str, n: int) -> list[list[str]]:
    """n unique names (token lists, surface case) for one type."""
    combos: list[list[str]] = []
    if ne_type == "PER":
        for f in _FIRST:
            for l in _LAST:
                combos.append([f, l])
                for m in _FIRST:
                    if m != f:
                        combos.append([f, m, l])
    elif ne_type == "ORG":
        for a in _ORG1:
            for b in _ORG2:
                combos.append([a, b])
                for s in _ORG_SUFFIX:
                    combos.append([a, b, s])
    elif ne_type == "LOC":
        for q in _LOC_QUAL:
            for c in _CITY:
                combos.append([q, c])
                for d in _DISTRICT:
                    combos.append([q, c, d])
    else:  # MISC
        for a in _MISC_ADJ:
            for b in _MISC_BASE:
                combos.append([a, b])
                for e in _MISC_ED:
                    combos.append([a, b, e])
    assert len(combos) >= n, (ne_type, len(combos), n)
    idx = rng.choice(len(combos), size=n, replace=False)
    return [combos[i] for i in sorted(idx)]


def gen_alias_table(rng: np.random.Generator, n_entities: int) -> pa.Table:
    """FIXTURES.md A2: (alias, entity_id, ne_type, prior)."""
    _check_part_invariants()
    type_counts = {
        "PER": int(n_entities * 0.4),
        "ORG": int(n_entities * 0.3),
        "LOC": int(n_entities * 0.2),
    }
    type_counts["MISC"] = n_entities - sum(type_counts.values())

    rows: list[tuple[str, str, str]] = []  # (alias, entity_id, ne_type)
    k = 0
    for t in NE_TYPES:
        for name in _gen_names(rng, t, type_counts[t]):
            eid = f"E{k:06d}"
            k += 1
            nm = oracle.norm  # aliases are stored NORMALIZED
            norm_name = " ".join(nm(w) for w in name)
            aliases = {norm_name}
            if t == "PER":
                aliases.add(nm(name[-1]))              # last name (shared)
                if len(name) == 3:
                    aliases.add(f"{nm(name[0])} {nm(name[-1])}")
            elif t == "ORG":
                aliases.add(" ".join(nm(w) for w in name[:2]))
            elif t == "LOC":
                aliases.add(nm(name[1]))               # city (shared)
            else:
                aliases.add(nm(name[1]))               # base (shared)
            for a in sorted(aliases):
                rows.append((a, eid, t))

    # alias -> single ne_type is guaranteed by part disjointness.
    # Dirichlet priors per alias over its candidate entities.
    by_alias: dict[str, list[int]] = {}
    for i, (a, _e, _t) in enumerate(rows):
        by_alias.setdefault(a, []).append(i)
    priors = np.zeros(len(rows))
    for a in sorted(by_alias):
        idxs = by_alias[a]
        p = rng.dirichlet(np.ones(len(idxs)))
        for i, pi in zip(idxs, p):
            priors[i] = round(float(pi), 6)

    return pa.table(
        {
            "alias": [r[0] for r in rows],
            "entity_id": [r[1] for r in rows],
            "ne_type": [r[2] for r in rows],
            "prior": priors,
        },
        schema=S.ALIAS_DICT,
    )


def _entity_surfaces(alias_tbl: pa.Table) -> list[tuple[str, str, list[str]]]:
    """Per alias row: (entity_id, ne_type, alias tokens) for injection."""
    return [
        (e, t, a.split())
        for a, e, t in zip(
            alias_tbl.column("alias").to_pylist(),
            alias_tbl.column("entity_id").to_pylist(),
            alias_tbl.column("ne_type").to_pylist(),
        )
    ]


def _style(tokens: list[str], style: int) -> list[str]:
    if style == 0:
        return [t.capitalize() for t in tokens]   # Title Case
    if style == 1:
        return [t.upper() for t in tokens]        # ALL CAPS
    return list(tokens)                           # as stored (lowercase)


def gen_docs(rng: np.random.Generator, n_docs: int, alias_tbl: pa.Table) -> pa.Table:
    """FIXTURES.md A1: interleaved docs with Zipf(1.5) entity skew."""
    surfaces = _entity_surfaces(alias_tbl)
    # alias rows grouped by entity index for uniform alias choice
    by_entity: dict[int, list[int]] = {}
    for i, (e, _t, _toks) in enumerate(surfaces):
        by_entity.setdefault(int(e[1:]), []).append(i)
    n_entities = max(by_entity) + 1
    # Zipf popularity, rank order permuted so head entities span all
    # NE types (entity ids are grouped by type).
    ranks = np.arange(1, n_entities + 1, dtype=np.float64)
    zipf = 1.0 / ranks**1.5
    zipf /= zipf.sum()
    zipf = zipf[rng.permutation(n_entities)]

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    media_kinds = ["image", "audio"]
    for i in range(n_docs):
        doc_id = f"doc{i:010d}"
        n_spans = int(rng.integers(1, 9))
        spans: list[dict] = []
        offset = 0
        for si in range(n_spans):
            if rng.random() < 0.6:
                n_fill = int(rng.integers(5, 41))
                fill = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n_fill)]
                n_m = int(rng.integers(0, 5))
                if n_m:
                    ents = rng.choice(n_entities, size=n_m, p=zipf)
                    cuts = np.sort(rng.integers(0, n_fill + 1, n_m))
                    toks: list[str] = []
                    prev = 0
                    for ent, cut in zip(ents, cuts):
                        toks.extend(fill[prev:cut])
                        prev = cut
                        arows = by_entity[int(ent)]
                        arow = arows[int(rng.integers(0, len(arows)))]
                        toks.extend(
                            _style(surfaces[arow][2], int(rng.integers(0, 3)))
                        )
                    toks.extend(fill[prev:])
                else:
                    toks = fill
                text = " ".join(toks)
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": offset})
                offset += len(text) + 1
            else:
                spans.append({
                    "kind": media_kinds[int(rng.integers(0, 2))],
                    "text": "",
                    "media_ref": f"media://{doc_id}/{si}",
                    "offset": offset,
                })
                offset += 1
        doc_ids.append(doc_id)
        spans_col.append(spans)

    return pa.table({"doc_id": doc_ids, "spans": spans_col}, schema=S.DOCUMENTS)


def wav_params_for(media_ref: str) -> dict:
    """Deterministic WAV parameters for an audio media_ref (derived
    from the stable hash, NOT the fixture rng stream, so adding blobs
    does not perturb any previously generated table). Tests assert the
    real decoder recovers exactly these values from the bytes."""
    from ner_ray.util.hashing import hash_str

    h = hash_str(media_ref)
    return {
        "sample_rate": [8000, 16000, 22050, 44100][h % 4],
        "channels": 1 + ((h >> 2) % 2),
        "n_frames": 160 + ((h >> 3) % 1600),
        "freq_hz": 110.0 * (1 + ((h >> 13) % 8)),
        "amp": 1000 + ((h >> 17) % 20000),
    }


def wav_bytes_for(media_ref: str) -> bytes:
    """Render the deterministic sine-tone WAV payload for an audio ref
    (stdlib wave, 16-bit PCM)."""
    import io
    import wave

    p = wav_params_for(media_ref)
    t = np.arange(p["n_frames"] * p["channels"], dtype=np.float64)
    samples = (p["amp"] * np.sin(
        2.0 * np.pi * p["freq_hz"] * t / p["sample_rate"])).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(p["channels"])
        w.setsampwidth(2)
        w.setframerate(p["sample_rate"])
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def image_params_for(media_ref: str) -> dict:
    """Deterministic image parameters for an image media_ref (stable
    hash, same scheme as wav_params_for). Tests assert the real image
    parsers recover exactly these from the encoded bytes."""
    from ner_ray.util.hashing import hash_str

    h = hash_str(media_ref)
    fmt = ["png", "bmp", "pnm"][h % 3]
    if fmt == "png":
        channels = [1, 3, 4][(h >> 12) % 3]
    elif fmt == "bmp":
        channels = 3
    else:
        channels = [1, 3][(h >> 12) % 2]
    return {
        "format": fmt,
        "width": 4 + ((h >> 4) % 13),
        "height": 4 + ((h >> 8) % 13),
        "channels": channels,
    }


def image_pixels_for(media_ref: str) -> np.ndarray:
    """Deterministic pixel array for an image ref (hash-seeded noise)."""
    from ner_ray.util.hashing import hash_str

    p = image_params_for(media_ref)
    rng = np.random.default_rng(hash_str(media_ref) & 0xFFFFFFFF)
    shape = ((p["height"], p["width"]) if p["channels"] == 1
             else (p["height"], p["width"], p["channels"]))
    return rng.integers(0, 256, size=shape).astype(np.uint8)


def image_bytes_for(media_ref: str) -> bytes:
    """Render the deterministic REAL image payload for an image ref —
    PNG (filter_mode="cycle" so fixtures exercise all five PNG filters),
    24-bit BMP, or binary netpbm, per image_params_for."""
    from ner_ray.stages.imaging import encode_bmp, encode_png, encode_ppm

    p = image_params_for(media_ref)
    img = image_pixels_for(media_ref)
    if p["format"] == "png":
        return encode_png(img, filter_mode="cycle")
    if p["format"] == "bmp":
        return encode_bmp(img)
    return encode_ppm(img)


def gen_media_blobs(docs: pa.Table) -> pa.Table:
    """Media blob sidecar table: one row per non-text span. Audio refs
    carry REAL WAV bytes (decodable with stdlib wave); image refs carry
    REAL encoded PNG/BMP/netpbm bytes (decodable with the pure
    stdlib+numpy parsers in ner_ray.stages.imaging)."""
    refs: list[str] = []
    kinds: list[str] = []
    blobs: list[bytes] = []
    for spans in docs.column("spans").to_pylist():
        for sp in spans:
            if sp["kind"] == "text":
                continue
            ref = sp["media_ref"]
            if sp["kind"] == "audio":
                blob = wav_bytes_for(ref)
            else:
                blob = image_bytes_for(ref)
            refs.append(ref)
            kinds.append(sp["kind"])
            blobs.append(blob)
    return pa.table({"media_ref": refs, "kind": kinds,
                     "media_bytes": blobs}, schema=S.MEDIA_BLOBS)


def gen_model(rng: np.random.Generator, alias_tbl: pa.Table) -> pa.Table:
    """FIXTURES.md A3: sparse (feature, label, weight) CRF model.

    Gazetteer-BIO emissions dominate (+10 / +4 for O on no-flag) over
    small lexical noise (|w| <= 0.08 per feature, worst-case sum ~1.0),
    so decode == gazetteer longest-match while exercising the full
    template + trellis machinery. Invalid transitions/starts get
    FORBIDDEN_WEIGHT.
    """
    feats: list[str] = []
    labels: list[str] = []
    weights: list[float] = []

    def add(f: str, l: str, w: float) -> None:
        feats.append(f)
        labels.append(l)
        weights.append(round(float(w), 6))

    # gazetteer emissions
    for t in NE_TYPES:
        add(f"gaz:0:B-{t}", f"B-{t}", 10.0)
        add(f"gaz:0:I-{t}", f"I-{t}", 10.0)
    add("gaz:0:", "O", 4.0)

    # lexical noise: token identity at offsets -2..2, shapes, affixes
    all_tokens = sorted(
        set(VOCAB)
        | {w for a in alias_tbl.column("alias").to_pylist() for w in a.split()}
    )
    for v in all_tokens:
        for off in (-2, -1, 0, 1, 2):
            for l in LABELS:
                add(f"low:{off}:{v}", l, rng.uniform(-0.08, 0.08))
    shapes = set()
    for v in all_tokens:
        for styled in (v, v.capitalize(), v.upper()):
            shapes.add(oracle.shape(styled))
    for sh in sorted(shapes):
        for l in LABELS:
            add(f"shape:0:{sh}", l, rng.uniform(-0.08, 0.08))
    affixes = set()
    for v in all_tokens:
        for k in (1, 2, 3):
            affixes.add(("pre", k, v[:k]))
            affixes.add(("suf", k, v[-k:]))
    for fam, k, val in sorted(affixes):
        for l in LABELS:
            add(f"{fam}{k}:0:{val}", l, rng.uniform(-0.08, 0.08))

    # transitions + start
    for prev in LABELS:
        for nxt in LABELS:
            if nxt.startswith("I-") and prev[2:] != nxt[2:]:
                w = FORBIDDEN_WEIGHT
            else:
                w = rng.uniform(-0.05, 0.05)
            add(f"trans:{prev}", nxt, w)
    for l in LABELS:
        add("start", l, FORBIDDEN_WEIGHT if l.startswith("I-") else rng.uniform(-0.05, 0.05))

    return pa.table(
        {"feature": feats, "label": labels, "weight": weights},
        schema=S.CRF_MODEL,
    )


# ---------------------------------------------------------------- gold


MEDIA_GOLD = pa.schema([
    ("doc_id", pa.string()), ("span_idx", pa.int64()),
    ("media_ref", pa.string()), ("kind", pa.string()),
    ("width", pa.int64()), ("height", pa.int64()),
    ("n_bytes", pa.int64()), ("feature_sig", pa.string()),
    ("n_frames_sampled", pa.int64()), ("frames_sig", pa.string()),
    ("sample_rate", pa.int64()), ("channels", pa.int64()),
    ("n_frames", pa.int64()), ("duration_s", pa.float64()),
    ("peak", pa.int64()), ("img_format", pa.string()),
    ("img_width", pa.int64()), ("img_height", pa.int64()),
    ("img_channels", pa.int64()), ("mean_luma", pa.float64()),
])


def derive_media_gold(docs: pa.Table) -> pa.Table:
    """Golden for q_media, recomputed WITHOUT the pipeline stages:
    the fake-decoder / frame-sampler columns come from their
    documented hash contracts (plain scalar loops, not the stages'
    vectorized kernels), the audio columns from the WAV GENERATION
    parameters (16-bit PCM encode is lossless, so a correct decoder
    must recover exactly these), and the image columns from the
    generation parameters and pre-encode pixels (PNG/BMP/netpbm are
    lossless). Sentinels (-1 / '') stand in for the stage's typed
    nulls in the other kind's columns — the graded projection
    coalesces identically."""
    from ner_ray.util.hashing import hash_str

    rows = []
    for doc_id, spans in zip(docs.column("doc_id").to_pylist(),
                             docs.column("spans").to_pylist()):
        for si, sp in enumerate(spans):
            if sp["kind"] == "text":
                continue
            ref = sp["media_ref"]
            h = hash_str(ref)
            n_fr = 1 + h % 100
            n_s = min((n_fr + 9) // 10, 8)
            row = {
                "doc_id": doc_id, "span_idx": si, "media_ref": ref,
                "kind": sp["kind"],
                "width": 64 + h % 1024,
                "height": 64 + (h >> 10) % 1024,
                "n_bytes": (64 + h % 1024) * (64 + (h >> 10) % 1024) * 3,
                "feature_sig": "|".join(
                    str((h >> (8 * (d % 8))) & 0xFF) for d in range(8)),
                "n_frames_sampled": n_s,
                "frames_sig": "|".join(
                    f"{ref}#frame={i * 10}" for i in range(n_s)),
                "sample_rate": -1, "channels": -1, "n_frames": -1,
                "duration_s": -1.0, "peak": -1, "img_format": "",
                "img_width": -1, "img_height": -1, "img_channels": -1,
                "mean_luma": -1.0,
            }
            if sp["kind"] == "audio":
                p = wav_params_for(ref)
                t = np.arange(p["n_frames"] * p["channels"],
                              dtype=np.float64)
                samples = (p["amp"] * np.sin(
                    2.0 * np.pi * p["freq_hz"] * t
                    / p["sample_rate"])).astype("<i2")
                row.update(
                    sample_rate=p["sample_rate"], channels=p["channels"],
                    n_frames=p["n_frames"],
                    duration_s=p["n_frames"] / p["sample_rate"],
                    peak=int(np.abs(samples.astype(np.int32)).max()))
            else:
                p = image_params_for(ref)
                img = image_pixels_for(ref)
                if img.ndim == 2:
                    y = img.astype(np.float64)
                else:
                    y = img[:, :, :3].astype(np.float64) @ np.array(
                        [0.299, 0.587, 0.114])
                row.update(
                    img_format=p["format"], img_width=p["width"],
                    img_height=p["height"], img_channels=p["channels"],
                    mean_luma=float(y.mean()))
            rows.append(row)
    return pa.Table.from_pylist(rows, schema=MEDIA_GOLD)


def derive_gold(docs: pa.Table, alias_tbl: pa.Table, model_tbl: pa.Table) -> dict[str, pa.Table]:
    """Run the reference oracle over every doc -> golden tables."""
    model = oracle.OracleModel.from_rows(
        model_tbl.column("feature").to_pylist(),
        model_tbl.column("label").to_pylist(),
        model_tbl.column("weight").to_pylist(),
    )
    alias_rows = list(zip(
        alias_tbl.column("alias").to_pylist(),
        alias_tbl.column("entity_id").to_pylist(),
        alias_tbl.column("ne_type").to_pylist(),
        alias_tbl.column("prior").to_pylist(),
    ))
    alias_types, candidates = oracle.build_alias_maps(alias_rows)

    hops = oracle.component_diameter_hops(alias_rows)
    assert hops <= CANON_MAX_HOPS, f"component propagation needs {hops} hops"

    mentions: list[dict] = []
    links: list[dict] = []
    triples: list[dict] = []
    posteriors: list[dict] = []
    for doc_id, spans in zip(docs.column("doc_id").to_pylist(),
                             docs.column("spans").to_pylist()):
        out = oracle.run_doc(doc_id, spans, model, alias_types, candidates)
        mentions.extend(out.mentions)
        links.extend(out.links)
        triples.extend(out.triples)
        posteriors.extend(
            oracle.run_doc_posteriors(doc_id, spans, model, alias_types))

    canon = oracle.components_from_alias(alias_rows)
    deduped = oracle.dedup_triples(triples)
    resolved = oracle.resolve_triples(deduped, canon)
    adj = oracle.adjacency(resolved)

    def tbl(rows: list[dict], sch: pa.Schema) -> pa.Table:
        if not rows:
            return sch.empty_table()
        return pa.Table.from_pylist(rows, schema=sch)

    triple_rows = [
        {"subj": t["subj"], "pred": t["pred"], "obj": t["obj"],
         "doc_id": t["doc_id"], "span_idx": t["span_idx"],
         "subj_surface": "", "obj_surface": "", "score": t["score"]}
        for t in triples
    ]
    comp_rows = [
        {"entity_id": e, "canonical_id": c} for e, c in sorted(canon.items())
    ]
    return {
        "gold_media": derive_media_gold(docs),
        "gold_posteriors": tbl(posteriors, S.POSTERIORS),
        "gold_mentions": tbl(mentions, S.MENTIONS),
        "gold_links": tbl(links, S.LINKS),
        "gold_triples": tbl(triple_rows, S.TRIPLES),
        "gold_triples_dedup": tbl(deduped, S.TRIPLES_DEDUP),
        "gold_components": tbl(comp_rows, S.COMPONENTS),
        "gold_resolved": tbl(resolved, S.TRIPLES_DEDUP),
        "gold_adjacency": tbl(adj, S.ADJACENCY),
        "_meta": {"canon_hops": hops},
    }


# ------------------------------------------------------------ ensure


def _semantics_fingerprint() -> str:
    """Hash of the frozen-semantics sources + seed: a cached fixture is
    valid only if the code that defines the reference is unchanged."""
    import hashlib

    import ner_ray.constants as c
    import ner_ray.oracle.reference_oracle as o
    import ner_ray.oracle.train_oracle as t
    import ner_ray.stages.train as st

    h = hashlib.sha256()
    h.update(str(SEED).encode())
    # stages/train.py is fingerprinted because train_oracle shares its
    # scalar kernels (feature values, hash contract, export layout):
    # editing either side must invalidate gold_train_metrics.
    for mod in (c, o, t, st):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    with open(__file__, "rb") as f:
        h.update(f.read())
    return h.hexdigest()[:32]


def ensure_fixtures(size: str = "small", root: str | None = None) -> str:
    """Generate (once, cached) the fixture directory for `size`; return
    its path. Atomic and concurrency-safe: per-pid tmp dir, os.replace,
    a losing racer defers to the winner. The _COMPLETE marker carries a
    fingerprint of the frozen-semantics sources, so editing the oracle
    / constants / generator invalidates stale goldens automatically."""
    assert size in SIZES, size
    root = root or FIXTURE_ROOT
    out_dir = os.path.join(root, size)
    fp = _semantics_fingerprint()
    marker = os.path.join(out_dir, "_COMPLETE")

    def _valid() -> bool:
        try:
            with open(marker) as f:
                return f.read().strip() == fp
        except OSError:
            return False

    if _valid():
        return out_dir

    n_docs, n_entities, with_gold = SIZES[size]
    rng = np.random.default_rng(SEED)
    alias_tbl = gen_alias_table(rng, n_entities)
    model_tbl = gen_model(rng, alias_tbl)
    docs = gen_docs(rng, n_docs, alias_tbl)

    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    pq.write_table(docs, os.path.join(tmp_dir, "docs.parquet"))
    pq.write_table(alias_tbl, os.path.join(tmp_dir, "alias.parquet"))
    pq.write_table(model_tbl, os.path.join(tmp_dir, "model.parquet"))
    pq.write_table(gen_media_blobs(docs),
                   os.path.join(tmp_dir, "media_blobs.parquet"))

    meta: dict = {"size": size, "n_docs": n_docs, "n_entities": n_entities,
                  "seed": SEED}
    if with_gold:
        gold = derive_gold(docs, alias_tbl, model_tbl)
        meta.update(gold.pop("_meta"))
        if size == "tiny":
            # golden metrics for the value-matched q_train_eval: the
            # single-process oracle trainer replays the deterministic
            # distributed trainer exactly (oracle/train_oracle.py)
            from ner_ray.oracle.train_oracle import derive_train_golden

            gold["gold_train_metrics"] = derive_train_golden(
                docs, gold["gold_mentions"], alias_tbl)
        for name, table in gold.items():
            pq.write_table(table, os.path.join(tmp_dir, f"{name}.parquet"))
            meta[f"rows_{name}"] = table.num_rows
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(tmp_dir, "_COMPLETE"), "w") as f:
        f.write(fp + "\n")
    try:
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp_dir, out_dir)
    except OSError:
        # a concurrent generator won the race; defer to its (identical,
        # deterministic) output if it is complete and current
        if _valid():
            shutil.rmtree(tmp_dir, ignore_errors=True)
            return out_dir
        raise
    return out_dir


if __name__ == "__main__":
    import sys

    size = sys.argv[1] if len(sys.argv) > 1 else "small"
    print(ensure_fixtures(size))
