"""Single-process oracle for the DETERMINISTIC distributed trainer.

`train_perceptron(..., deterministic_buckets=B)` (stages/train.py) makes
iterative-parameter-mixing training layout- and parallelism-independent:
sequences are assigned to B hash buckets, each bucket trains
sequentially in ascending content-hash order, and the driver mixes
per-bucket deltas in ascending bucket order. This module replays that
EXACT computation in one process with no Ray involvement, so the fixture
generator can commit golden training metrics (gold_train_metrics.parquet)
and the driver gate can VALUE-match q_train_eval against them.

What is shared with stages/train.py (the frozen scalar contracts, same
pattern as q_media's generation-parameter goldens):

* the per-token feature kernels (`_family_value`, `_sequence_features`,
  `_gaz_flags_for`) — pure deterministic functions, identical by
  construction on both sides;
* the seed-stable sequence content hash (`seq_content_hash`) — the
  bucket/order contract itself;
* the `TrainWeights` container + `to_model_table` export layout and the
  `weights_checksum` metric definition.

What is INDEPENDENTLY re-implemented here (the distributed surface the
value match actually verifies):

* the vocabulary pass (sorted uniques per family — replicates the
  distributed `build_feature_space` reduce);
* bucket assignment, within-bucket ordering, and the per-bucket
  sequential decode-update loop (a scalar Viterbi + scalar additive
  updates, NOT the vectorized EpochTrainer kernels);
* delta mixing (sum in ascending bucket order, divide by the live
  bucket count), pad-row clamping, epoch averaging and early stop.

Bitwise equality holds because every perceptron update is an exact
float64 integer add and every order-dependent float reduction (emission
sums, delta mixing, epoch averaging) follows the same element order on
both sides; ties in Viterbi argmax break to the lowest label index in
both implementations. Sequences with equal content hash are either
byte-identical (order between them is immaterial) or a 64-bit collision
(~n^2 / 2^64, negligible at fixture scale and only reorders two
sequences within one bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.constants import FEATURE_FAMILIES, LABEL_INDEX, N_LABELS
from ner_ray.oracle.reference_oracle import norm as _norm
from ner_ray.stages.train import (
    TrainWeights,
    _clamp_pad_rows,
    _family_value,
    _gaz_flags_for,
    _sequence_features,
    seq_content_hash,
    weights_checksum,
)

# Hyperparameters of the graded q_train_eval entry — imported by BOTH
# the registry callable and the golden derivation so they cannot drift.
TRAIN_EVAL_EPOCHS = 3
TRAIN_EVAL_BUCKETS = 8


def training_sequences(docs: list[dict], gold_mentions: list[dict]):
    """(tokens, tags) training rows from annotated docs + gold mentions
    — the shared input construction for q_train_eval and its golden.
    One row per non-empty text span; tags are BIO over whitespace
    tokens."""
    by_span: dict[tuple, list] = {}
    for m in gold_mentions:
        by_span.setdefault((m["doc_id"], m["span_idx"]), []).append(m)
    rows = []
    for d in docs:
        for si, span in enumerate(d["spans"]):
            if span["kind"] != "text" or not span["text"]:
                continue
            toks = span["text"].split()
            tags = ["O"] * len(toks)
            for m in by_span.get((d["doc_id"], si), []):
                tags[m["tok_begin"]] = f"B-{m['ne_type']}"
                for t in range(m["tok_begin"] + 1, m["tok_end"]):
                    tags[t] = f"I-{m['ne_type']}"
            rows.append({"tokens": toks, "tags": tags})
    return rows


def train_metrics_table(weights: TrainWeights, history: list[dict]) -> pa.Table:
    """The graded one-row metrics projection — shared by q_train_eval
    and the golden so schema and rounding are identical by
    construction; the VALUES come from the two independent paths."""
    return pa.table({
        "epochs_run": pa.array([len(history)], pa.int64()),
        "first_epoch_errors": pa.array([history[0]["errors"]], pa.int64()),
        "last_epoch_errors": pa.array([history[-1]["errors"]], pa.int64()),
        "total_errors": pa.array([sum(h["errors"] for h in history)],
                                 pa.int64()),
        "n_sequences": pa.array([history[0]["sequences"]], pa.int64()),
        "model_rows": pa.array([weights.to_model_table().num_rows],
                               pa.int64()),
        "weight_checksum": pa.array([round(weights_checksum(weights), 6)],
                                    pa.float64()),
    })


def _vocabulary(rows: list[dict]) -> dict[str, dict[str, int]]:
    """Sorted-unique value ids per family — independent single-process
    replication of the distributed build_feature_space reduce."""
    uniq_tokens = sorted({t for r in rows for t in r["tokens"]})
    value_ids: dict[str, dict[str, int]] = {}
    for fam in FEATURE_FAMILIES:
        if fam == "gaz":
            continue
        vals = sorted({_family_value(fam, t, _norm(t)) for t in uniq_tokens})
        value_ids[fam] = {v: i + 1 for i, v in enumerate(vals)}
    value_ids["gaz"] = {v: i + 1 for i, v in enumerate(
        [""] + [f"{b}-{t}" for t in ("PER", "ORG", "LOC", "MISC")
                for b in ("B", "I")])}
    return value_ids


def _viterbi_scalar(E: np.ndarray, trans: np.ndarray,
                    start: np.ndarray) -> list[int]:
    """Plain-loop Viterbi; argmax ties break to the lowest label index
    (strict `>` == np.argmax first-occurrence), same float ops as the
    vectorized kernel so decode paths agree bitwise."""
    T = E.shape[0]
    dp = [start[l] + E[0, l] for l in range(N_LABELS)]
    back = [[0] * N_LABELS for _ in range(T)]
    for t in range(1, T):
        ndp = [0.0] * N_LABELS
        for n in range(N_LABELS):
            bp, bv = 0, dp[0] + trans[0, n]
            for p in range(1, N_LABELS):
                v = dp[p] + trans[p, n]
                if v > bv:
                    bv, bp = v, p
            back[t][n] = bp
            ndp[n] = bv + E[t, n]
        dp = ndp
    last, bv = 0, dp[0]
    for l in range(1, N_LABELS):
        if dp[l] > bv:
            bv, last = dp[l], l
    path = [last]
    for t in range(T - 1, 0, -1):
        path.append(back[t][path[-1]])
    return path[::-1]


def oracle_train(rows: list[dict], alias_types: dict[str, str],
                 epochs: int = TRAIN_EVAL_EPOCHS,
                 buckets: int = TRAIN_EVAL_BUCKETS):
    """Single-process replay of the deterministic distributed trainer.
    Returns (averaged TrainWeights, history) — bitwise equal to
    train_perceptron(..., deterministic_buckets=buckets) on the same
    rows (asserted by tests/test_train_deterministic.py)."""
    value_ids = _vocabulary(rows)
    fams = dict(FEATURE_FAMILIES)

    hs = seq_content_hash([r["tokens"] for r in rows],
                          [r["tags"] for r in rows])
    # Bucket membership includes empty-token rows (they form groups and
    # count toward the mixing divisor k on the Ray side, contributing
    # zero deltas) — only the training loop skips T == 0.
    feats = []
    for r in rows:
        toks = r["tokens"]
        gold = np.array([LABEL_INDEX[g] for g in r["tags"]], dtype=np.int64)
        ids = _sequence_features(toks, value_ids,
                                 _gaz_flags_for(toks, alias_types))
        feats.append((ids, gold))
    by_bucket: dict[int, list[int]] = {}
    for i, h in enumerate(hs):
        by_bucket.setdefault(int(h % np.uint64(buckets)), []).append(i)
    for b in by_bucket:
        by_bucket[b].sort(key=lambda i: int(hs[i]))

    w = TrainWeights.zeros(value_ids, fams)
    avg = TrainWeights.zeros(value_ids, fams)
    history: list[dict] = []
    for epoch in range(epochs):
        bucket_deltas = []
        n_err_tot = n_seq_tot = 0
        for b in sorted(by_bucket):
            local = w.copy()
            for ri in by_bucket[b]:
                ids, gold = feats[ri]
                T = len(gold)
                if T == 0:
                    continue
                n_seq_tot += 1
                E = np.zeros((T, N_LABELS))
                for fam in local.weights:       # frozen family order
                    Wf, M = local.weights[fam], ids[fam]
                    for oi in range(M.shape[1]):
                        for t in range(T):
                            E[t] += Wf[M[t, oi], oi]
                pred = np.array(_viterbi_scalar(E, local.trans, local.start),
                                dtype=np.int64)
                if np.array_equal(pred, gold):
                    continue
                n_err_tot += 1
                for d in np.flatnonzero(pred != gold):
                    for fam in local.weights:
                        M = ids[fam]
                        for oi in range(M.shape[1]):
                            local.weights[fam][M[d, oi], oi, gold[d]] += 1.0
                            local.weights[fam][M[d, oi], oi, pred[d]] -= 1.0
                local.start[gold[0]] += 1.0
                local.start[pred[0]] -= 1.0
                for i in range(T - 1):
                    local.trans[gold[i], gold[i + 1]] += 1.0
                    local.trans[pred[i], pred[i + 1]] -= 1.0
            bucket_deltas.append(local)
        k = max(len(bucket_deltas), 1)
        for fam in w.weights:
            delta = np.zeros_like(w.weights[fam])
            for local in bucket_deltas:
                delta += local.weights[fam] - w.weights[fam]
            w.weights[fam] += delta / k
        dt = np.zeros_like(w.trans)
        for local in bucket_deltas:
            dt += local.trans - w.trans
        w.trans += dt / k
        dstart = np.zeros_like(w.start)
        for local in bucket_deltas:
            dstart += local.start - w.start
        w.start += dstart / k
        _clamp_pad_rows(w)
        for fam in w.weights:
            avg.weights[fam] += w.weights[fam]
        avg.trans += w.trans
        avg.start += w.start
        history.append({"epoch": epoch, "errors": n_err_tot,
                        "sequences": n_seq_tot})
        if n_err_tot == 0:
            break
    n = len(history)
    for fam in avg.weights:
        avg.weights[fam] /= n
    avg.trans /= n
    avg.start /= n
    return avg, history


def derive_train_golden(docs_tbl: pa.Table, mentions_tbl: pa.Table,
                        alias_tbl: pa.Table) -> pa.Table:
    """gold_train_metrics for the fixture generator: train on the tiny
    fixture's gold sequences single-process and emit the graded metrics
    row. No Ray involvement anywhere on this path."""
    rows = training_sequences(docs_tbl.to_pylist(), mentions_tbl.to_pylist())
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    weights, history = oracle_train(rows, alias_types)
    return train_metrics_table(weights, history)
