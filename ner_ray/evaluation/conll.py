"""CoNLL-style evaluation harness (conlleval semantics).

Phrase-level exact-match scoring: a predicted chunk counts as TP only
if (doc_id, span_idx, tok_begin, tok_end, ne_type) all match a gold
chunk — the same rule conlleval applies to CoNLL-2003 output
(Tjong Kim Sang & De Meulder, 2003). Triples are scored as exact
(subj, pred, obj, doc_id, span_idx) matches. This is the harness the
driver's `python -m pytest -x -q` gate runs (BASELINE.json:6);
the pipeline must reach P/R >= 0.95 vs reference-derived output —
our engineering target is 1.0 vs the in-repo oracle.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field


@dataclass
class PRF:
    tp: int = 0
    fp: int = 0
    fn: int = 0

    @property
    def precision(self) -> float:
        # conlleval semantics: 0 when nothing was predicted
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    def as_dict(self) -> dict:
        return {
            "tp": self.tp, "fp": self.fp, "fn": self.fn,
            "precision": round(self.precision, 6),
            "recall": round(self.recall, 6),
            "f1": round(self.f1, 6),
        }


@dataclass
class Report:
    overall: PRF = field(default_factory=PRF)
    per_type: dict[str, PRF] = field(default_factory=dict)

    def as_dict(self) -> dict:
        return {
            "overall": self.overall.as_dict(),
            "per_type": {t: p.as_dict() for t, p in sorted(self.per_type.items())},
        }


def _score_multisets(pred: Counter, gold: Counter, type_of) -> Report:
    rep = Report()
    for key in set(pred) | set(gold):
        np_, ng = pred.get(key, 0), gold.get(key, 0)
        tp = min(np_, ng)
        fp = np_ - tp
        fn = ng - tp
        rep.overall.tp += tp
        rep.overall.fp += fp
        rep.overall.fn += fn
        t = type_of(key)
        bucket = rep.per_type.setdefault(t, PRF())
        bucket.tp += tp
        bucket.fp += fp
        bucket.fn += fn
    return rep


def evaluate_mentions(pred_rows, gold_rows) -> Report:
    """rows: iterables of dicts with doc_id/span_idx/tok_begin/tok_end/ne_type."""
    def key(r):
        return (r["doc_id"], r["span_idx"], r["tok_begin"], r["tok_end"], r["ne_type"])

    return _score_multisets(
        Counter(key(r) for r in pred_rows),
        Counter(key(r) for r in gold_rows),
        type_of=lambda k: k[4],
    )


def evaluate_triples(pred_rows, gold_rows) -> Report:
    """rows: iterables of dicts with subj/pred/obj/doc_id/span_idx."""
    def key(r):
        return (r["subj"], r["pred"], r["obj"], r["doc_id"], r["span_idx"])

    return _score_multisets(
        Counter(key(r) for r in pred_rows),
        Counter(key(r) for r in gold_rows),
        type_of=lambda k: k[1].split(":", 1)[0].upper(),
    )


def table_rows(table) -> list[dict]:
    """pyarrow.Table | pandas.DataFrame -> list of dicts."""
    if hasattr(table, "to_pylist"):
        return table.to_pylist()
    return table.to_dict("records")
