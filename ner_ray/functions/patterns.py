"""Wapiti-style pattern-file DSL — the user extension surface for
feature templates (SURVEY.md §2.2 M4; cf. Wapiti src/pattern.c /
CRF++ template syntax, reconstructed from public documentation).

A pattern file is DATA that declares which features the tagger scores:

    # comment
    Ulow-2:%x[-2,low]       # unigram: family 'low' at token offset -2
    Ushape+0:%x[0,shape]
    Ut0:%t[0,low,"^[0-9]+$"]   # regex test -> boolean family "t0"
    B                       # bare B: label-bigram (transition matrix)

Supported observation columns (the engine's derived families) can be
named or given as numeric indices into ``PATTERN_COLUMNS``:
``%x[-1,0]`` == ``%x[-1,low]``.

``default_pattern_text()`` renders the frozen built-in family set
(ner_ray.constants.FEATURE_FAMILIES) as a pattern file; parsing it
back yields exactly those families — the round-trip that pins the
default tagger behavior to the DSL (tests/test_patterns.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ner_ray.constants import FEATURE_FAMILIES

# numeric col index -> family name (col 0 is the normalized token
# identity, matching the single-column CoNLL observation convention)
PATTERN_COLUMNS: tuple[str, ...] = (
    "low", "shape", "pre1", "pre2", "pre3", "suf1", "suf2", "suf3", "gaz")

_X_RE = re.compile(r"^%x\[(-?\d+),([A-Za-z0-9_]+)\]$")
_T_RE = re.compile(r'^%t\[(-?\d+),([A-Za-z0-9_]+),"(.*)"\]$')
_M_RE = re.compile(r'^%m\[(-?\d+),([A-Za-z0-9_]+),"(.*)"\]$')


@dataclass(frozen=True)
class RegexTest:
    """A ``%t[row,col,"re"]`` template (boolean feature, value "1"/"0")
    or — with ``extract=True`` — a ``%m[row,col,"re"]`` template whose
    value is the MATCHED SUBSTRING (first group if the regex has one,
    else the whole match; no match -> ""). Both live under the family
    named by the template id; scoring requires a model trained with
    matching ``<id>:<off>:<value>`` feature rows; absent families
    contribute nothing (OOV row)."""

    template_id: str
    offset: int
    column: str
    regex: str
    extract: bool = False


@dataclass
class PatternSet:
    """Parsed pattern file: %x families (merged offsets, sorted),
    %t regex tests, and whether a label-bigram (B) line is present."""

    families: dict[str, tuple[int, ...]] = field(default_factory=dict)
    tests: tuple[RegexTest, ...] = ()
    has_bigram: bool = False

    @property
    def score_families(self) -> dict[str, tuple[int, ...]]:
        """What the tagger scores: the %x families PLUS one family per
        %t regex test (family name = template id, at the test's
        offset). ``families`` stays pure-%x so render() round-trips."""
        merged: dict[str, tuple[int, ...]] = dict(self.families)
        for t in self.tests:
            offs = set(merged.get(t.template_id, ()))
            offs.add(t.offset)
            merged[t.template_id] = tuple(sorted(offs))
        return merged

    def render(self) -> str:
        """Inverse of parse_pattern_file (canonical ordering)."""
        lines = []
        for fam, offs in self.families.items():
            for off in offs:
                lines.append(f"U{fam}{off:+d}:%x[{off},{fam}]")
        for t in self.tests:
            tag = "%m" if t.extract else "%t"
            lines.append(
                f'U{t.template_id}:{tag}[{t.offset},{t.column},"{t.regex}"]')
        if self.has_bigram:
            lines.append("B")
        return "\n".join(lines) + "\n"


def _resolve_column(col: str) -> str:
    if col.isdigit() or (col.startswith("-") and col[1:].isdigit()):
        idx = int(col)
        if not 0 <= idx < len(PATTERN_COLUMNS):
            raise ValueError(f"pattern column index out of range: {col}")
        return PATTERN_COLUMNS[idx]
    if col not in PATTERN_COLUMNS:
        raise ValueError(
            f"unknown pattern column {col!r} (expected one of "
            f"{PATTERN_COLUMNS} or a numeric index)")
    return col


def parse_pattern_file(text: str) -> PatternSet:
    """Parse Wapiti-style U/B pattern lines (%x observations, %t regex
    tests, %m match extraction). Unsupported constructs (multi-%x
    concatenation, per-value bigram templates) and invalid inputs
    (bad columns, duplicate template ids, regexes that cannot score)
    raise with the offending line — everything that would otherwise
    crash an actor mid-pipeline fails HERE, at parse time."""
    families: dict[str, set[int]] = {}
    tests: list[RegexTest] = []
    has_bigram = False
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if line == "B":
            has_bigram = True
            continue
        kind = line[0].upper()
        if kind not in ("U", "B") or ":" not in line:
            raise ValueError(f"line {lineno}: unrecognized pattern "
                             f"line {raw!r}")
        tid, expr = line.split(":", 1)
        tid, expr = tid[1:].strip(), expr.strip()
        if kind == "B":
            raise ValueError(
                f"line {lineno}: only the bare-B label-bigram is "
                f"supported (bigram observation templates expand the "
                f"transition matrix per value — out of scope)")
        m = _X_RE.match(expr)
        if m:
            off, col = int(m.group(1)), _resolve_column(m.group(2))
            families.setdefault(col, set()).add(off)
            continue
        for pat, extract, prefix in ((_T_RE, False, "t"), (_M_RE, True, "m")):
            m = pat.match(expr)
            if m:
                compiled = re.compile(m.group(3))  # fail fast: bad regex
                if extract and not compiled.groups:
                    # scoring wraps a groupless %m regex as (re); fail
                    # here, not in the actor (e.g. leading inline flags)
                    try:
                        re.compile(f"({m.group(3)})")
                    except re.error as ex:
                        raise ValueError(
                            f"line {lineno}: %m regex cannot be group-"
                            f"wrapped for extraction: {ex}") from ex
                col = _resolve_column(m.group(2))
                if col == "gaz":
                    raise ValueError(
                        f"line {lineno}: %t/%m cannot test the gaz "
                        f"column (gazetteer flags are structural, not "
                        f"a token-derived value)")
                new = RegexTest(
                    template_id=tid if tid.startswith(prefix)
                    else f"{prefix}{tid}",
                    offset=int(m.group(1)),
                    column=col,
                    regex=m.group(3),
                    extract=extract)
                if any(t.template_id == new.template_id for t in tests):
                    raise ValueError(
                        f"line {lineno}: duplicate template id "
                        f"{new.template_id!r} (each %t/%m needs its own "
                        f"id — the id names the feature family)")
                tests.append(new)
                break
        else:
            raise ValueError(f"line {lineno}: unsupported template "
                             f"expression {expr!r}")
        continue
    return PatternSet(
        families={f: tuple(sorted(s)) for f, s in families.items()},
        tests=tuple(tests),
        has_bigram=has_bigram)


def default_pattern_text() -> str:
    """The frozen built-in feature set rendered as a pattern file."""
    return PatternSet(families=dict(FEATURE_FAMILIES),
                      has_bigram=True).render()


def default_pattern_set() -> PatternSet:
    ps = parse_pattern_file(default_pattern_text())
    assert ps.families == {f: tuple(sorted(o))
                           for f, o in FEATURE_FAMILIES.items()}, \
        "default pattern round-trip drifted from FEATURE_FAMILIES"
    return ps


def to_feature_templates(ps: PatternSet):
    """Bridge to the declarative extension surface: one
    pipelines.api.FeatureTemplate per %x family (regex tests have no
    template-object analogue; they stay on the PatternSet)."""
    from ner_ray.pipelines.api import FeatureTemplate

    return [FeatureTemplate(family=f, offsets=offs)
            for f, offs in ps.families.items()]


def from_feature_templates(templates, has_bigram: bool = True) -> PatternSet:
    """Inverse bridge: compile FeatureTemplate objects to a PatternSet
    usable by TaggerActor(patterns=...)."""
    return PatternSet(
        families={t.family: tuple(sorted(t.offsets)) for t in templates},
        has_bigram=has_bigram)
