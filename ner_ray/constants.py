"""Frozen constants shared by the reference oracle and the Ray pipeline.

These pin the semantics reconstructed from synalp/NER's Wapiti-style
design (SURVEY.md sections 1-2; reference checkout empty, so the
in-repo oracle is ground truth). Changing anything here changes the
"reference" — do not touch without regenerating the golden fixtures.
"""

from __future__ import annotations

# Entity types and BIO label set (CoNLL-2003-style).
NE_TYPES: list[str] = ["PER", "ORG", "LOC", "MISC"]

LABELS: list[str] = ["O"] + [
    f"{b}-{t}" for t in NE_TYPES for b in ("B", "I")
]
# => ["O","B-PER","I-PER","B-ORG","I-ORG","B-LOC","I-LOC","B-MISC","I-MISC"]
LABEL_INDEX: dict[str, int] = {l: i for i, l in enumerate(LABELS)}
N_LABELS: int = len(LABELS)

# Gazetteer longest-match window (max alias length in tokens).
MAX_ALIAS_TOKENS: int = 4

# Triple extraction: max token gap between tok_end of the subject
# mention (exclusive) and tok_begin of the object mention.
TRIPLE_WINDOW: int = 8

# Connective token used for adjacent mentions (gap == 0).
ADJACENT_CONNECTIVE: str = "adj"

# Feature template families: (family, offsets). Offsets follow the
# Wapiti %x[row,col] convention: the observation at relative token
# offset `row`. Values out of sequence range use the PAD sentinel.
# NOTE: only the 'low' family is window-offset-parameterized; the
# oracle and tagger implement the single-offset families (shape,
# affixes, gaz) structurally — their (0,) entries here declare tensor
# shapes for model/trainer layouts, not a tunable window.
TOKEN_OFFSETS: tuple[int, ...] = (-2, -1, 0, 1, 2)
FEATURE_FAMILIES: dict[str, tuple[int, ...]] = {
    "low": TOKEN_OFFSETS,          # normalized token identity
    "shape": (0,),                 # collapsed word shape
    "pre1": (0,), "pre2": (0,), "pre3": (0,),
    "suf1": (0,), "suf2": (0,), "suf3": (0,),
    "gaz": (0,),                   # gazetteer BIO flag ("B-PER",... or "")
}
PAD_VALUE: str = "<pad>"

# Model feature-string encodings (the on-disk sparse model is
# (feature: string, label: string, weight: float64) rows, mirroring a
# Wapiti model file = pattern set + sparse weights).
TRANS_PREFIX: str = "trans:"   # feature f"trans:{prev_label}", label = next
START_FEATURE: str = "start"   # feature "start", label = first label

# Hard-constraint weight that forbids invalid transitions
# (I-X not following B-X/I-X) and invalid starts (I-X first).
FORBIDDEN_WEIGHT: float = -100.0

# Canonicalization: max bipartite hops asserted at fixture-generation
# time; the DuckDB oracle SQL propagates min labels this many rounds.
CANON_MAX_HOPS: int = 6
