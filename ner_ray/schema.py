"""Declared Arrow schemas for every logical table (SURVEY.md section 1.2).

The reference is fixed-schema (a Wapiti pattern file implicitly declares
the observation-column arity); we declare ``pyarrow.Schema`` constants
per stage and validate against them in tests. Nested columns stay in
Arrow format through all hot stages (pandas mangles list<struct> into
object dtype).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# The pinned pipeline input (BASELINE.json:15 input_hint).
DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Flattened text spans (spans column carried through for the per-row
# span-sequence invariant).
TEXT_SPANS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("text", pa.string()),
        ("offset", pa.int32()),
    ]
)

TOKENS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("tok_idx", pa.int32()),
        ("token", pa.string()),
        ("norm", pa.string()),
        ("char_offset", pa.int32()),
    ]
)

MENTIONS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("tok_begin", pa.int32()),   # inclusive
        ("tok_end", pa.int32()),     # exclusive
        ("char_offset", pa.int32()),
        ("surface", pa.string()),
        ("ne_type", pa.string()),
        ("score", pa.float64()),
    ]
)

CANDIDATES = pa.schema(
    list(MENTIONS)
    + [("entity_id", pa.string()), ("prior", pa.float64())]
)

LINKS = pa.schema(
    list(MENTIONS)
    + [("entity_id", pa.string()), ("link_score", pa.float64())]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("subj_surface", pa.string()),
        ("obj_surface", pa.string()),
        ("score", pa.float64()),
    ]
)

TRIPLES_DEDUP = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.int64()),
    ]
)

COMPONENTS = pa.schema(
    [("entity_id", pa.string()), ("canonical_id", pa.string())]
)

EDGE_STRUCT = pa.struct(
    [("dst", pa.string()), ("pred", pa.string()), ("weight", pa.int64())]
)

ADJACENCY = pa.schema(
    [
        ("src", pa.string()),
        ("degree", pa.int64()),
        ("edges", pa.list_(EDGE_STRUCT)),
    ]
)

POSTERIORS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("tok_idx", pa.int32()),
        ("token", pa.string()),
        ("tag", pa.string()),
        ("post", pa.float64()),
    ]
)

ALIAS_DICT = pa.schema(
    [
        ("alias", pa.string()),
        ("entity_id", pa.string()),
        ("ne_type", pa.string()),
        ("prior", pa.float64()),
    ]
)

CRF_MODEL = pa.schema(
    [
        ("feature", pa.string()),
        ("label", pa.string()),
        ("weight", pa.float64()),
    ]
)

LINEAGE = pa.schema(
    [
        ("stage", pa.string()),
        ("partition_id", pa.int64()),
        ("input_fingerprint", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_s", pa.float64()),
        ("status", pa.string()),
    ]
)

# Media blob sidecar (media_ref -> payload bytes). Audio payloads are
# REAL WAV containers (decodable with stdlib `wave`); image payloads
# are opaque (no image codec exists in this environment).
MEDIA_BLOBS = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("media_bytes", pa.binary()),
    ]
)

# Real decode output for audio blobs; non-audio rows carry nulls.
AUDIO_STATS = pa.schema(
    [
        ("media_ref", pa.string()),
        ("sample_rate", pa.int32()),
        ("channels", pa.int32()),
        ("n_frames", pa.int64()),
        ("duration_s", pa.float64()),
        ("peak", pa.int32()),
    ]
)
