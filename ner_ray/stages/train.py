"""Distributed CRF training (operator A5) — structured perceptron with
iterative parameter mixing.

The reference trains with thread-parallel gradient optimizers
(L-BFGS / SGD-L1; cf. Wapiti src/gradient.c + src/thread.c,
reconstructed — Lavergne, Cappe & Yvon, ACL 2010). The Ray-Data-native
analogue implemented here is the distributed AVERAGED STRUCTURED
PERCEPTRON with iterative parameter mixing (McDonald, Hall & Mann,
NAACL 2010): each epoch, every batch of sequences trains a local copy
of the weights sequentially (decode with Viterbi, additive update on
errors) inside ``map_batches``; the driver averages the per-batch
deltas (the "mixing" reduce) and re-broadcasts. The final averaged
weights EXPORT TO THE STANDARD MODEL TABLE, so a trained model runs
through the unmodified TaggerActor pipeline.

Feature space = the frozen template families
(constants.FEATURE_FAMILIES) + transitions + start by default, built by
a distributed vocabulary pass; every trainer also accepts a Wapiti-style
``patterns`` file (functions/patterns.py) whose %x/%t/%m families
replace the built-ins — serve the result with
TaggerActor(patterns=<same file>).

Scale notes: weight tensors are dense per family (|values| x offsets x
labels); at 10^12-doc scale the vocabulary pass pre-aggregates unique
values per block (small shuffle) and per-epoch deltas are one dense
tensor per batch — the classic mergeable-partial shape. Training data
volume, not model size, is the budget (same as the reference's BCD
regime).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray.constants import (
    FEATURE_FAMILIES,
    LABEL_INDEX,
    LABELS,
    MAX_ALIAS_TOKENS,
    N_LABELS,
)
from ner_ray.oracle.reference_oracle import norm as _norm
from ner_ray.oracle.reference_oracle import shape as _shape


# --------------------------------------------------------- feature space


import functools
import re as _re


@functools.lru_cache(maxsize=256)
def _compiled(regex: str):
    return _re.compile(regex)


def _family_value(fam: str, token: str, ntoken: str, tests=()) -> str:
    """Observation value for one family of one token — the engine's
    derived columns plus %t/%m regex families from a pattern file.
    Semantics match the tagger's pandas path exactly (_family_values
    in stages/tagger.py: .str.contains == re.search -> '1'/'0';
    .str.extract == re.search group 1 / whole match, no match -> '')."""
    if fam == "low":
        return ntoken
    if fam == "shape":
        return _shape(token)
    if fam.startswith("pre") and fam[3:].isdigit():
        return ntoken[: int(fam[3])]
    if fam.startswith("suf") and fam[3:].isdigit():
        return ntoken[-int(fam[3]):]
    for t in tests:
        if t.template_id == fam:
            col = _family_value(t.column, token, ntoken)
            m = _compiled(t.regex).search(col)
            if t.extract:
                if m is None:
                    return ""
                return m.group(1) if m.re.groups else m.group(0)
            return "1" if m else "0"
    raise KeyError(fam)


MAX_FEATURE_VALUES = 20_000_000  # dense-tensor guard (see build_feature_space)
_LEX_FAMILIES = ["low", "shape", "pre1", "pre2", "pre3",
                 "suf1", "suf2", "suf3"]


# Family names the trainers claim for themselves: "trans"/"start"/
# "block" collide with the g_/d_-prefixed reduce-payload columns
# (g_trans, g_start, g_block), "_transstart" is the BCD pseudo-block,
# and "gaz" is routed to the gazetteer branch in _sequence_features
# (a user template named gaz would silently never run its regex).
_RESERVED_FAMILY_NAMES = frozenset(
    {"trans", "start", "block", "_transstart", "gaz"})


def _plan_from_patterns(patterns):
    """(families dict, tests tuple) for a trainer's ``patterns`` arg:
    None -> the frozen built-in layout; str -> parsed pattern file;
    PatternSet -> its score_families (%x + %t/%m merged offsets)."""
    if patterns is None:
        return dict(FEATURE_FAMILIES), ()
    if isinstance(patterns, str):
        from ner_ray.functions.patterns import parse_pattern_file

        patterns = parse_pattern_file(patterns)
    bad = _RESERVED_FAMILY_NAMES.intersection(patterns.score_families)
    if bad:
        raise ValueError(
            f"pattern template id(s) {sorted(bad)} collide with reserved "
            f"trainer names {sorted(_RESERVED_FAMILY_NAMES)}; rename the "
            f"template (the U<id>: prefix in the pattern file)")
    return dict(patterns.score_families), tuple(patterns.tests)


def build_feature_space(seq_ds, alias_types: dict[str, str] | None = None,
                        families: dict | None = None, tests=()):
    """Distributed vocabulary pass: unique values per family.
    seq_ds rows: (tokens: list<string>, ...). Returns value_ids dicts.
    ``families``/``tests`` (from a pattern file) select which families
    get a vocabulary; default is the frozen built-in layout."""
    lex_fams = ([f for f in families if f != "gaz"]
                if families is not None else _LEX_FAMILIES)

    def uniques(batch: pa.Table) -> pa.Table:
        toks = batch.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pd.Series(toks.flatten().to_pylist(), dtype=object).unique()
        fams, vals = [], []
        for t in flat:
            n = _norm(t)
            for fam in lex_fams:
                fams.append(fam)
                vals.append(_family_value(fam, t, n, tests))
        out = pd.DataFrame({"fam": fams, "val": vals}).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    # distributed dedup BEFORE the collect: without it the driver
    # receives blocks x per-block-unique rows (cross-block duplicates
    # included) — one scalar groupby shuffle reduces that to the
    # global unique set, which the driver must hold anyway (the dense
    # weight tensors are vocabulary-sized). The cap guards the
    # downstream tensor allocation, not the shuffle: a web-scale token
    # vocabulary needs feature hashing, not a dense CRF layout.
    from ray.data.aggregate import Count

    deduped = seq_ds.map_batches(uniques, batch_format="pyarrow") \
        .groupby(["fam", "val"]).aggregate(Count()).materialize()
    n_vocab = deduped.count()
    if n_vocab > MAX_FEATURE_VALUES:
        raise ValueError(
            f"feature space has {n_vocab} (family, value) pairs "
            f"(cap {MAX_FEATURE_VALUES}): a dense weight tensor this "
            "wide cannot train on a driver — shrink the corpus, prune "
            "the pattern file, or hash features instead.")
    vocab = deduped.to_pandas()[["fam", "val"]]
    value_ids: dict[str, dict[str, int]] = {}
    for fam, g in vocab.groupby("fam"):
        value_ids[fam] = {v: i + 1 for i, v in enumerate(sorted(g["val"]))}
    value_ids["gaz"] = {v: i + 1 for i, v in enumerate(
        [""] + [f"{b}-{t}" for t in ("PER", "ORG", "LOC", "MISC")
                for b in ("B", "I")])}
    return value_ids


@dataclass
class TrainWeights:
    """Dense per-family weight tensors (same layout as ModelBundle).
    ``families`` is the fam -> offsets layout being trained (defaults
    to the frozen built-ins; a pattern file substitutes its own)."""

    value_ids: dict[str, dict[str, int]]
    weights: dict[str, np.ndarray]       # fam -> (n_vals+1, n_off, L)
    trans: np.ndarray                    # (L, L)
    start: np.ndarray                    # (L,)
    families: dict[str, tuple] | None = None

    @property
    def fams(self) -> dict[str, tuple]:
        return self.families if self.families is not None \
            else FEATURE_FAMILIES

    @classmethod
    def zeros(cls, value_ids, families=None) -> "TrainWeights":
        fams = families if families is not None else FEATURE_FAMILIES
        w = {
            fam: np.zeros((len(value_ids[fam]) + 1,
                           len(fams[fam]), N_LABELS))
            for fam in fams
        }
        return cls(value_ids, w, np.zeros((N_LABELS, N_LABELS)),
                   np.zeros(N_LABELS), families)

    def copy(self) -> "TrainWeights":
        return TrainWeights(
            self.value_ids, {f: w.copy() for f, w in self.weights.items()},
            self.trans.copy(), self.start.copy(), self.families)

    def to_model_table(self) -> pa.Table:
        """Export to the sparse (feature, label, weight) model format
        consumed by ModelBundle / the oracle."""
        feats, labels, ws = [], [], []
        for fam, offs in self.fams.items():
            inv = {i: v for v, i in self.value_ids[fam].items()}
            W = self.weights[fam]
            nz = np.argwhere(W != 0.0)
            for (vi, oi, li) in nz:
                if vi == 0:
                    continue  # OOV row never exported
                feats.append(f"{fam}:{offs[oi]}:{inv[int(vi)]}")
                labels.append(LABELS[int(li)])
                ws.append(float(W[vi, oi, li]))
        for p in range(N_LABELS):
            for n in range(N_LABELS):
                if self.trans[p, n] != 0.0:
                    feats.append(f"trans:{LABELS[p]}")
                    labels.append(LABELS[n])
                    ws.append(float(self.trans[p, n]))
        for li in range(N_LABELS):
            if self.start[li] != 0.0:
                feats.append("start")
                labels.append(LABELS[li])
                ws.append(float(self.start[li]))
        from ner_ray import schema as S

        return pa.table({"feature": feats, "label": labels,
                         "weight": ws}, schema=S.CRF_MODEL)


# ------------------------------------------------------------ training


def _sequence_features(tokens: list[str], value_ids,
                       gaz_flags: list[str], families=None,
                       tests=()) -> dict[str, np.ndarray]:
    """Per family: (T, n_offsets) id matrix for one sequence."""
    T = len(tokens)
    norms = [_norm(t) for t in tokens]
    ids: dict[str, np.ndarray] = {}
    fams = families if families is not None else FEATURE_FAMILIES
    for fam, offs in fams.items():
        vid = value_ids[fam]
        if fam == "gaz":
            base = np.array([vid.get(g, 0) for g in gaz_flags],
                            dtype=np.int64)
        else:
            base = np.array(
                [vid.get(_family_value(fam, t, n, tests), 0)
                 for t, n in zip(tokens, norms)], dtype=np.int64)
        M = np.zeros((T, len(offs)), dtype=np.int64)
        for oi, off in enumerate(offs):
            lo = max(0, -off)
            hi = min(T, T - off)
            M[lo:hi, oi] = base[lo + off: hi + off]
        ids[fam] = M
    return ids


def _viterbi(E, trans, start):
    T = E.shape[0]
    dp = start + E[0]
    back = np.zeros((T, N_LABELS), dtype=np.int64)
    for t in range(1, T):
        cand = dp[:, None] + trans
        back[t] = np.argmax(cand, axis=0)
        dp = cand[back[t], np.arange(N_LABELS)] + E[t]
    path = [int(np.argmax(dp))]
    for t in range(T - 1, 0, -1):
        path.append(int(back[t, path[-1]]))
    return path[::-1]


def _gaz_flags_for(tokens: list[str], alias_types: dict[str, str]):
    from ner_ray.oracle.reference_oracle import gazetteer_flags

    return gazetteer_flags([_norm(t) for t in tokens], alias_types)


def seq_content_hash(tokens_col: list[list[str]],
                     tags_col: list[list[str]]) -> np.ndarray:
    """Seed-stable uint64 content hash per (tokens, tags) sequence —
    the bucket-assignment / within-bucket-order contract shared by the
    deterministic trainer and its single-process oracle
    (ner_ray/oracle/train_oracle.py)."""
    from ner_ray.util.hashing import hash_columns

    return hash_columns(["\x1f".join(t) for t in tokens_col],
                        ["\x1f".join(t) for t in tags_col])


def weights_checksum(w: "TrainWeights") -> float:
    """Order-pinned L1 checksum over every trained tensor (the graded
    weight fingerprint of q_train_eval): np.sum per array (pairwise,
    deterministic for identical arrays), accumulated in the frozen
    family order then trans then start."""
    s = 0.0
    for fam in w.weights:
        s += float(np.abs(w.weights[fam]).sum())
    s += float(np.abs(w.trans).sum())
    s += float(np.abs(w.start).sum())
    return s


# ------------------------------------------------- featurize once


def featurize(seq_ds, value_ids, alias_types: dict[str, str],
              families=None, tests=(), buckets: int | None = None):
    """One-time distributed featurization: (tokens, tags) rows ->
    per-family id matrices (flattened) + gold label ids. Training
    epochs then consume pure integers — the string kernels (normalize,
    shape, affixes, gazetteer longest-match, pattern regex tests) run
    once per corpus, not once per epoch (the factorize-first rule).
    With ``buckets`` set, also emits the deterministic-trainer keys:
    ``_h`` (seed-stable sequence content hash) and ``_bkt`` (hash mod
    buckets) — layout-independent by construction."""
    fams = list(families if families is not None else FEATURE_FAMILIES)

    def fn(batch: pa.Table) -> pa.Table:
        toks_col = batch.column("tokens").to_pylist()
        tags_col = batch.column("tags").to_pylist()
        out: dict[str, list] = {"t_len": [], "gold": []}
        for fam in fams:
            out[f"f_{fam}"] = []
        for tokens, gold_tags in zip(toks_col, tags_col):
            gold = [LABEL_INDEX[g] for g in gold_tags]
            gaz = _gaz_flags_for(tokens, alias_types)
            ids = _sequence_features(tokens, value_ids, gaz,
                                     families, tests)
            out["t_len"].append(len(tokens))
            out["gold"].append(gold)
            for fam in fams:
                out[f"f_{fam}"].append(ids[fam].reshape(-1).tolist())
        cols = {"t_len": pa.array(out["t_len"], pa.int32()),
                "gold": pa.array(out["gold"], pa.list_(pa.int64()))}
        for fam in fams:
            cols[f"f_{fam}"] = pa.array(out[f"f_{fam}"],
                                        pa.list_(pa.int64()))
        if buckets is not None:
            hs = seq_content_hash(toks_col, tags_col)
            cols["_h"] = pa.array(hs, pa.uint64())
            cols["_bkt"] = pa.array(
                (hs % np.uint64(buckets)).astype(np.int64), pa.int64())
        return pa.table(cols)

    return seq_ds.map_batches(fn, batch_format="pyarrow").materialize()


def _rows_from_featurized(batch: pa.Table):
    """Yield (ids dict, gold ndarray) per featurized row. The family
    list is recovered from the batch's own ``f_<fam>`` columns, so any
    pattern-defined layout round-trips without extra plumbing."""
    fams = [c[2:] for c in batch.schema.names if c.startswith("f_")]
    t_len = batch.column("t_len").to_pylist()
    gold_col = batch.column("gold").to_pylist()
    fam_cols = {fam: batch.column(f"f_{fam}").to_pylist() for fam in fams}
    for i, T in enumerate(t_len):
        if T == 0:
            continue
        gold = np.asarray(gold_col[i], dtype=np.int64)
        ids = {
            fam: np.asarray(fam_cols[fam][i], dtype=np.int64)
                   .reshape(T, -1)
            for fam in fams
        }
        yield ids, gold


from ner_ray.stages.tagger import _logsumexp as _logsumexp_vec  # shared kernel


def _clamp_pad_rows(w: "TrainWeights") -> None:
    """Freeze row 0 (the pad/OOV row) at zero after every update so the
    trained objective equals the SERVABLE model exactly: inference
    (ModelBundle/oracle) scores out-of-range and unseen values as zero,
    and to_model_table never exports row 0 — without the clamp,
    training would learn sequence-boundary signal there that export
    silently drops."""
    for fam in w.weights:
        w.weights[fam][0] = 0.0


def _seq_emissions(ids: dict[str, np.ndarray], w: "TrainWeights",
                   T: int) -> np.ndarray:
    E = np.zeros((T, N_LABELS))
    for fam, M in ids.items():
        Wf = w.weights[fam]
        for oi in range(M.shape[1]):
            E += Wf[M[:, oi], oi]
    return E


def _forward(E: np.ndarray, w: "TrainWeights"):
    T = E.shape[0]
    alpha = np.zeros((T, N_LABELS))
    alpha[0] = w.start + E[0]
    for t in range(1, T):
        alpha[t] = _logsumexp_vec(alpha[t - 1][:, None] + w.trans, 0) + E[t]
    return alpha, _logsumexp_vec(alpha[-1], 0)


def _gold_score(E: np.ndarray, gold: np.ndarray, w: "TrainWeights"):
    T = len(gold)
    s = w.start[gold[0]] + E[np.arange(T), gold].sum()
    if T > 1:
        s += w.trans[gold[:-1], gold[1:]].sum()
    return s


def sequence_nll(ids: dict[str, np.ndarray], gold: np.ndarray,
                 w: "TrainWeights") -> float:
    """NLL only (forward pass, no beta/marginals) — the cheap
    evaluation for line-search trial steps."""
    E = _seq_emissions(ids, w, len(gold))
    _alpha, logZ = _forward(E, w)
    return float(logZ - _gold_score(E, gold, w))


def sequence_nll_gradient(ids: dict[str, np.ndarray], gold: np.ndarray,
                          w: "TrainWeights", out=None):
    """Negative log-likelihood and its gradient for ONE sequence —
    the reference's actual CRF objective (observed features minus
    model-expected features; cf. Wapiti src/gradient.c, reconstructed).

    With ``out=(acc_weights, acc_trans, acc_start)`` the gradient is
    scattered IN PLACE into the batch accumulators (O(T) touched
    entries — no per-sequence dense tensors); without it fresh arrays
    are returned (the finite-difference test path). These are
    d NLL / d w; descent direction is the caller's concern.
    """
    T = len(gold)
    E = _seq_emissions(ids, w, T)
    # forward / backward in log space
    alpha, logZ = _forward(E, w)
    beta = np.zeros((T, N_LABELS))
    for t in range(T - 2, -1, -1):
        beta[t] = _logsumexp_vec(w.trans + (E[t + 1] + beta[t + 1])[None, :],
                                 1)
    post = np.exp(alpha + beta - logZ)          # (T, L) unigram marginals

    nll = float(logZ - _gold_score(E, gold, w))

    if out is not None:
        gw, g_trans, g_start_arr = out
    else:
        gw = {fam: np.zeros_like(w.weights[fam]) for fam in ids}
        g_trans = np.zeros((N_LABELS, N_LABELS))
        g_start_arr = np.zeros(N_LABELS)
    for fam, M in ids.items():
        G = gw.get(fam)
        if G is None:
            continue  # block-restricted accumulators (BCD): skip
        for oi in range(M.shape[1]):
            cols = np.full(T, oi)
            np.add.at(G, (M[:, oi], cols), post)            # expected
            np.add.at(G, (M[:, oi], cols, gold), -1.0)      # observed
    g_start_arr += post[0]
    g_start_arr[gold[0]] -= 1.0
    for t in range(1, T):
        # pairwise marginals xi_t(i,j)
        xi = alpha[t - 1][:, None] + w.trans + (E[t] + beta[t])[None, :]
        g_trans += np.exp(xi - logZ)
    if T > 1:
        np.add.at(g_trans, (gold[:-1], gold[1:]), -1.0)
    return nll, gw, g_trans, g_start_arr


class SGDEpochTrainer:
    """map_batches worker for log-likelihood training: sums per-sequence
    NLL gradients over the batch (mergeable dense partials). Consumes
    PRE-FEATURIZED rows (pure integer matrices)."""

    def __init__(self, weights_ref):
        import ray

        self.w: TrainWeights = ray.get(weights_ref) \
            if not isinstance(weights_ref, TrainWeights) else weights_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        acc = {fam: np.zeros_like(self.w.weights[fam])
               for fam in self.w.weights}
        acc_t = np.zeros((N_LABELS, N_LABELS))
        acc_s = np.zeros(N_LABELS)
        nll_sum = 0.0
        n_seq = 0
        for ids, gold in _rows_from_featurized(batch):
            n_seq += 1
            nll, _gw, _gt, _gs = sequence_nll_gradient(
                ids, gold, self.w, out=(acc, acc_t, acc_s))
            nll_sum += nll
        payload = {f"g_{fam}": pa.array([acc[fam].tobytes()], pa.binary())
                   for fam in self.w.weights}
        payload["g_trans"] = pa.array([acc_t.tobytes()], pa.binary())
        payload["g_start"] = pa.array([acc_s.tobytes()], pa.binary())
        payload["nll"] = pa.array([nll_sum], pa.float64())
        payload["n_seq"] = pa.array([n_seq], pa.int64())
        return pa.table(payload)


def train_sgd(seq_ds, alias_types: dict[str, str], epochs: int = 10,
              lr: float = 0.5, l2: float = 1e-4, batch_size: int = 256,
              concurrency=(1, 8), patterns=None, lr_decay: float = 0.0):
    """Distributed CRF log-likelihood training: per-batch gradient
    partials inside map_batches, summed on the driver, one (full-batch)
    gradient step per epoch with L2 — the map/reduce form of the
    reference's thread-parallel gradient + optimizer loop.

    ``patterns`` (pattern-file text or a PatternSet) substitutes the
    frozen built-in feature layout with the file's %x/%t/%m families —
    serve the result through TaggerActor(patterns=<same patterns>).

    ``lr_decay`` > 0 anneals the step as lr/(1 + lr_decay*epoch)
    (Bottou's 1/t schedule): large early steps, stable late epochs.
    Default 0.0 keeps the constant-step behavior."""
    import ray

    families, tests = _plan_from_patterns(patterns)
    value_ids = build_feature_space(seq_ds, families=families, tests=tests)
    w = TrainWeights.zeros(value_ids, families)
    feat_ds = featurize(seq_ds, value_ids, alias_types, families, tests)
    history = []
    for epoch in range(epochs):
        step = lr / (1.0 + lr_decay * epoch)
        nll, g, _n = _grad_pass(feat_ds, w, batch_size, concurrency)
        for fam in w.weights:
            w.weights[fam] -= step * (g.weights[fam] + l2 * w.weights[fam])
        w.trans -= step * (g.trans + l2 * w.trans)
        w.start -= step * (g.start + l2 * w.start)
        _clamp_pad_rows(w)
        history.append({"epoch": epoch, "mean_nll": round(nll, 6),
                        "lr": round(step, 6)})
    return w, history


# ----------------------------------------------- L-BFGS (batch optimizer)


def _pack(w: "TrainWeights") -> np.ndarray:
    """Flatten all trainable tensors into one parameter vector
    (family order = the weights layout, then trans, then start)."""
    parts = [w.weights[fam].reshape(-1) for fam in w.weights]
    parts += [w.trans.reshape(-1), w.start]
    return np.concatenate(parts)


def _unpack(vec: np.ndarray, value_ids, families=None) -> "TrainWeights":
    w = TrainWeights.zeros(value_ids, families)
    pos = 0
    for fam in w.weights:
        n = w.weights[fam].size
        w.weights[fam] = vec[pos:pos + n].reshape(w.weights[fam].shape).copy()
        pos += n
    n = w.trans.size
    w.trans = vec[pos:pos + n].reshape(w.trans.shape).copy()
    pos += n
    w.start = vec[pos:pos + N_LABELS].copy()
    return w


def _grad_pass(feat_ds, w: "TrainWeights", batch_size: int,
               concurrency) -> tuple[float, "TrainWeights", int]:
    """ONE distributed gradient pass (per-batch partials inside
    map_batches, dense merge on the driver): returns (mean NLL,
    mean gradient WITHOUT regularization, n_sequences). The single
    reducer both train_sgd and the L-BFGS objective build on."""
    import ray

    w_ref = ray.put(w)
    parts = feat_ds.map_batches(
        SGDEpochTrainer,
        fn_constructor_kwargs={"weights_ref": w_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    ).to_pandas()
    n = max(int(parts["n_seq"].sum()), 1)
    g = TrainWeights.zeros(w.value_ids, w.families)
    for fam in w.weights:
        shape = w.weights[fam].shape
        acc = np.zeros(shape)
        for buf in parts[f"g_{fam}"]:
            acc += np.frombuffer(buf, dtype=np.float64).reshape(shape)
        g.weights[fam] = acc / n
    gt = np.zeros_like(w.trans)
    for buf in parts["g_trans"]:
        gt += np.frombuffer(buf, dtype=np.float64).reshape(w.trans.shape)
    g.trans = gt / n
    gs = np.zeros_like(w.start)
    for buf in parts["g_start"]:
        gs += np.frombuffer(buf, dtype=np.float64)
    g.start = gs / n
    return float(parts["nll"].sum()) / n, g, n


class NllWorker:
    """map_batches worker for NLL-ONLY evaluation (forward pass, no
    gradient, no dense partial shipping) — line-search trial steps."""

    def __init__(self, weights_ref):
        import ray

        self.w: TrainWeights = ray.get(weights_ref) \
            if not isinstance(weights_ref, TrainWeights) else weights_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        nll_sum, n_seq = 0.0, 0
        for ids, gold in _rows_from_featurized(batch):
            n_seq += 1
            nll_sum += sequence_nll(ids, gold, self.w)
        return pa.table({"nll": pa.array([nll_sum], pa.float64()),
                         "n_seq": pa.array([n_seq], pa.int64())})


def _objective_value(feat_ds, w: "TrainWeights", l2: float,
                     batch_size: int, concurrency) -> float:
    """Objective only — roughly half the cost of _objective (no beta
    pass, no marginal scatter, no dense gradient shipping)."""
    import ray

    w_ref = ray.put(w)
    parts = feat_ds.map_batches(
        NllWorker, fn_constructor_kwargs={"weights_ref": w_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    ).to_pandas()
    n = max(int(parts["n_seq"].sum()), 1)
    sq = sum(float((w.weights[fam] ** 2).sum()) for fam in w.weights)
    sq += float((w.trans ** 2).sum()) + float((w.start ** 2).sum())
    return float(parts["nll"].sum()) / n + 0.5 * l2 * sq


def _objective(feat_ds, w: "TrainWeights", l2: float, batch_size: int,
               concurrency) -> tuple[float, "TrainWeights"]:
    """mean-NLL + (l2/2)||w||^2 objective and its gradient. Pad/OOV
    rows are PROJECTED out of the gradient — they are frozen at zero so
    the trained objective equals the servable model exactly (see
    _clamp_pad_rows)."""
    mean_nll, g, _n = _grad_pass(feat_ds, w, batch_size, concurrency)
    sq = 0.0
    for fam in w.weights:
        g.weights[fam] += l2 * w.weights[fam]
        g.weights[fam][0] = 0.0
        sq += float((w.weights[fam] ** 2).sum())
    g.trans += l2 * w.trans
    g.start += l2 * w.start
    sq += float((w.trans ** 2).sum()) + float((w.start ** 2).sum())
    return mean_nll + 0.5 * l2 * sq, g


def train_lbfgs(seq_ds, alias_types: dict[str, str], iters: int = 25,
                m: int = 8, l2: float = 1e-4, batch_size: int = 256,
                concurrency=(1, 8), tol: float = 1e-5, patterns=None):
    """Distributed CRF training with L-BFGS — the reference's default
    optimizer family (cf. Wapiti src/lbfgs.c; Nocedal & Wright ch.7
    two-loop recursion, reconstructed; no scipy in this environment so
    the recursion + Armijo backtracking line search are implemented
    directly in numpy).

    Each objective/gradient evaluation is ONE streaming map_batches
    pass over the pre-featurized corpus (mergeable dense partials, the
    same SGDEpochTrainer workers train_sgd uses); the driver holds only
    the parameter vector and the m-pair curvature history. L2 only —
    L1/elastic-net needs the OWL-QN orthant projection, left as the
    documented extension.

    Returns (TrainWeights, history) where history[i]["mean_obj"] is the
    ACCEPTED objective value per iteration — monotone non-increasing by
    the Armijo condition (asserted in tests/test_train_lbfgs.py)."""
    families, tests = _plan_from_patterns(patterns)
    value_ids = build_feature_space(seq_ds, families=families, tests=tests)
    w = TrainWeights.zeros(value_ids, families)
    feat_ds = featurize(seq_ds, value_ids, alias_types, families, tests)

    x = _pack(w)
    f, g_struct = _objective(feat_ds, w, l2, batch_size, concurrency)
    g = _pack(g_struct)
    S: list[np.ndarray] = []
    Y: list[np.ndarray] = []
    rho: list[float] = []
    history = [{"iter": 0, "mean_obj": round(f, 6)}]
    for it in range(iters):
        # two-loop recursion: z ~= H^{-1} g
        q = g.copy()
        alphas = []
        for s, y, r in zip(reversed(S), reversed(Y), reversed(rho)):
            a = r * s.dot(q)
            alphas.append(a)
            q -= a * y
        if Y:
            gamma = S[-1].dot(Y[-1]) / Y[-1].dot(Y[-1])
        else:
            gamma = 1.0 / max(np.linalg.norm(g), 1.0)
        z = gamma * q
        for (s, y, r), a in zip(zip(S, Y, rho), reversed(alphas)):
            b = r * y.dot(z)
            z += (a - b) * s
        d = -z
        gTd = float(g.dot(d))
        if gTd > -1e-12:          # not a descent direction: steepest
            d = -g
            gTd = -float(g.dot(g))
        # Armijo backtracking: the FIRST trial (step=1, usually
        # accepted) evaluates the full gradient; further halvings
        # evaluate NLL only (half the cost), with one gradient pass on
        # the eventually-accepted point
        step, accepted, g_new_struct = 1.0, False, None
        for _ls in range(20):
            x_new = x + step * d
            w_new = _unpack(x_new, value_ids, families)
            if _ls == 0:
                f_new, g_new_struct = _objective(feat_ds, w_new, l2,
                                                 batch_size, concurrency)
            else:
                f_new = _objective_value(feat_ds, w_new, l2,
                                         batch_size, concurrency)
                g_new_struct = None
            if f_new <= f + 1e-4 * step * gTd:
                accepted = True
                break
            step *= 0.5
        if not accepted:
            break                  # line search exhausted: converged
        if g_new_struct is None:   # accepted on an NLL-only trial
            _f_chk, g_new_struct = _objective(feat_ds, w_new, l2,
                                              batch_size, concurrency)
        g_new = _pack(g_new_struct)
        s_vec, y_vec = x_new - x, g_new - g
        sy = float(s_vec.dot(y_vec))
        if sy > 1e-10:            # curvature condition
            S.append(s_vec)
            Y.append(y_vec)
            rho.append(1.0 / sy)
            if len(S) > m:
                S.pop(0)
                Y.pop(0)
                rho.pop(0)
        x, f, g = x_new, f_new, g_new
        history.append({"iter": it + 1, "mean_obj": round(f, 6)})
        if np.linalg.norm(g) < tol:
            break
    w_final = _unpack(x, value_ids, families)
    _clamp_pad_rows(w_final)      # no-op by construction; belt+braces
    return w_final, history


class BlockGradWorker:
    """map_batches worker for BLOCK-restricted gradients (BCD): the
    forward-backward still sees all weights (emissions need them), but
    only the active block's gradient is accumulated and shipped — the
    per-pass reduce payload is ONE family tensor, not the full model.
    ``block`` is a feature-family name or "_transstart"."""

    def __init__(self, weights_ref, block: str):
        import ray

        self.w: TrainWeights = ray.get(weights_ref) \
            if not isinstance(weights_ref, TrainWeights) else weights_ref
        self.block = block

    def __call__(self, batch: pa.Table) -> pa.Table:
        fam_acc = {} if self.block == "_transstart" else \
            {self.block: np.zeros_like(self.w.weights[self.block])}
        acc_t = np.zeros((N_LABELS, N_LABELS))
        acc_s = np.zeros(N_LABELS)
        nll_sum, n_seq = 0.0, 0
        for ids, gold in _rows_from_featurized(batch):
            n_seq += 1
            nll, _gw, _gt, _gs = sequence_nll_gradient(
                ids, gold, self.w, out=(fam_acc, acc_t, acc_s))
            nll_sum += nll
        payload: dict = {"nll": pa.array([nll_sum], pa.float64()),
                         "n_seq": pa.array([n_seq], pa.int64())}
        if self.block == "_transstart":
            payload["g_trans"] = pa.array([acc_t.tobytes()], pa.binary())
            payload["g_start"] = pa.array([acc_s.tobytes()], pa.binary())
        else:
            payload["g_block"] = pa.array(
                [fam_acc[self.block].tobytes()], pa.binary())
        return pa.table(payload)


def train_bcd(seq_ds, alias_types: dict[str, str], passes: int = 3,
              lr: float = 0.5, l2: float = 1e-4, batch_size: int = 256,
              concurrency=(1, 8), patterns=None):
    """Block coordinate descent — the reference's larger-than-RAM
    training regime (cf. Wapiti src/bcd.c; Lavergne, Cappe & Yvon,
    ACL 2010, reconstructed): each step updates ONE feature-family
    block with the others frozen, so the distributed reduce ships one
    family tensor per step instead of the whole model (the memory win
    that lets |model| exceed a worker's heap — only emissions need the
    full weights, and those arrive by zero-copy broadcast).

    One pass = one gradient step per block (families + the
    trans/start block), cycled in a fixed order. Returns
    (TrainWeights, history) with one mean-NLL entry per pass —
    monotone on the fixture (asserted in tests)."""
    import ray

    families, tests = _plan_from_patterns(patterns)
    value_ids = build_feature_space(seq_ds, families=families, tests=tests)
    w = TrainWeights.zeros(value_ids, families)
    feat_ds = featurize(seq_ds, value_ids, alias_types, families, tests)
    blocks = list(families) + ["_transstart"]
    history = []
    for p in range(passes):
        pass_nll = None
        for block in blocks:
            w_ref = ray.put(w)
            parts = feat_ds.map_batches(
                BlockGradWorker,
                fn_constructor_kwargs={"weights_ref": w_ref,
                                       "block": block},
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=concurrency, num_cpus=1,
            ).to_pandas()
            n = max(int(parts["n_seq"].sum()), 1)
            pass_nll = float(parts["nll"].sum()) / n
            if block == "_transstart":
                gt = np.zeros_like(w.trans)
                for buf in parts["g_trans"]:
                    gt += np.frombuffer(buf, np.float64) \
                        .reshape(w.trans.shape)
                w.trans -= lr * (gt / n + l2 * w.trans)
                gs = np.zeros(N_LABELS)
                for buf in parts["g_start"]:
                    gs += np.frombuffer(buf, np.float64)
                w.start -= lr * (gs / n + l2 * w.start)
            else:
                shape = w.weights[block].shape
                g = np.zeros(shape)
                for buf in parts["g_block"]:
                    g += np.frombuffer(buf, np.float64).reshape(shape)
                w.weights[block] -= lr * (g / n + l2 * w.weights[block])
                w.weights[block][0] = 0.0  # pad row stays frozen
        history.append({"pass": p, "mean_nll": round(pass_nll, 6)})
    _clamp_pad_rows(w)
    return w, history


def train_owlqn(seq_ds, alias_types: dict[str, str], iters: int = 25,
                m: int = 8, l1: float = 1e-4, l2: float = 0.0,
                batch_size: int = 256, concurrency=(1, 8),
                tol: float = 1e-5, patterns=None):
    """Elastic-net CRF training with OWL-QN (Andrew & Gao, ICML 2007 —
    the L1-capable L-BFGS variant; covers the reference's SGD-L1
    regime, cf. Wapiti src/sgdl1.c, with batch convergence):

    * pseudo-gradient replaces the gradient at non-differentiable 0s;
    * the search direction and each trial point are PROJECTED onto the
      current orthant, so coordinates cross zero only by stopping AT
      zero — this is what produces exact sparsity;
    * curvature pairs use the SMOOTH part's gradients only (L2 folded
      into the smooth objective; L1 handled by the projection).

    Every smooth evaluation is the same distributed pass train_lbfgs
    uses. Returns (TrainWeights, history) with history monotone in the
    composite objective."""
    families, tests = _plan_from_patterns(patterns)
    value_ids = build_feature_space(seq_ds, families=families, tests=tests)
    w = TrainWeights.zeros(value_ids, families)
    feat_ds = featurize(seq_ds, value_ids, alias_types, families, tests)

    def l1_of(v: np.ndarray) -> float:
        return float(l1 * np.abs(v).sum())

    def pseudo_grad(xv: np.ndarray, gv: np.ndarray) -> np.ndarray:
        pg = np.where(xv > 0, gv + l1, np.where(xv < 0, gv - l1, 0.0))
        at0 = xv == 0
        pg = np.where(at0 & (gv + l1 < 0), gv + l1, pg)
        pg = np.where(at0 & (gv - l1 > 0), gv - l1, pg)
        return pg

    x = _pack(w)
    f_s, g_struct = _objective(feat_ds, w, l2, batch_size, concurrency)
    g = _pack(g_struct)
    f = f_s + l1_of(x)
    S: list[np.ndarray] = []
    Y: list[np.ndarray] = []
    rho: list[float] = []
    history = [{"iter": 0, "mean_obj": round(f, 6)}]
    for it in range(iters):
        pg = pseudo_grad(x, g)
        if np.linalg.norm(pg) < tol:
            break
        q = pg.copy()
        alphas = []
        for s_v, y_v, r in zip(reversed(S), reversed(Y), reversed(rho)):
            a = r * s_v.dot(q)
            alphas.append(a)
            q -= a * y_v
        gamma = (S[-1].dot(Y[-1]) / Y[-1].dot(Y[-1])) if Y else \
            1.0 / max(np.linalg.norm(pg), 1.0)
        z = gamma * q
        for (s_v, y_v, r), a in zip(zip(S, Y, rho), reversed(alphas)):
            b = r * y_v.dot(z)
            z += (a - b) * s_v
        d = -z
        d[d * (-pg) <= 0] = 0.0      # align direction with -pseudo-grad
        if not d.any():
            d = -pg
        xi = np.where(x != 0, np.sign(x), np.sign(-pg))
        # first trial (usually accepted) evaluates the full gradient so
        # acceptance needs no second distributed pass (same trick as
        # train_lbfgs); later halvings are value-only
        step, accepted = (1.0 if Y else 1.0 / max(np.linalg.norm(pg), 1.0)), \
            False
        g_new_struct = None
        for _ls in range(20):
            x_new = x + step * d
            x_new[x_new * xi < 0] = 0.0   # orthant projection
            w_new = _unpack(x_new, value_ids, families)
            if _ls == 0:
                f_s_new, g_new_struct = _objective(feat_ds, w_new, l2,
                                                   batch_size, concurrency)
                f_new = f_s_new + l1_of(x_new)
            else:
                f_new = _objective_value(feat_ds, w_new, l2, batch_size,
                                         concurrency) + l1_of(x_new)
                g_new_struct = None
            # Armijo with the projected step's directional derivative
            if f_new <= f + 1e-4 * float(pg.dot(x_new - x)):
                accepted = True
                break
            step *= 0.5
        if not accepted:
            break
        if g_new_struct is None:   # accepted on a value-only trial
            _f_chk, g_new_struct = _objective(feat_ds, w_new, l2,
                                              batch_size, concurrency)
        g_new = _pack(g_new_struct)
        s_vec, y_vec = x_new - x, g_new - g   # smooth gradients only
        sy = float(s_vec.dot(y_vec))
        if sy > 1e-10:
            S.append(s_vec)
            Y.append(y_vec)
            rho.append(1.0 / sy)
            if len(S) > m:
                S.pop(0)
                Y.pop(0)
                rho.pop(0)
        x, f, g = x_new, f_new, g_new
        history.append({"iter": it + 1, "mean_obj": round(f, 6)})
    w_final = _unpack(x, value_ids, families)
    _clamp_pad_rows(w_final)
    return w_final, history


def train_rprop(seq_ds, alias_types: dict[str, str], iters: int = 15,
                l2: float = 1e-4, step0: float = 0.1,
                step_min: float = 1e-6, step_max: float = 5.0,
                eta_plus: float = 1.2, eta_minus: float = 0.5,
                batch_size: int = 256, concurrency=(1, 8),
                patterns=None):
    """Resilient propagation — the reference's fourth optimizer family
    (cf. Wapiti src/rprop.c, reconstructed; Riedmiller & Braun 1993,
    with the iRprop- modification of Igel & Huesken 2000). Full-batch
    sign-only updates with a per-weight adaptive step size:

    * same gradient sign as last iteration -> grow that weight's step
      (x eta_plus, capped at step_max);
    * flipped sign -> the previous step overshot: shrink the step
      (x eta_minus, floored at step_min) and SKIP the update this
      iteration (iRprop-: zero the gradient so the next comparison
      starts fresh);
    * update = -sign(g) * step, per weight — magnitudes never enter,
      which is what makes RProp robust to the wildly different
      per-feature gradient scales of a sparse CRF.

    Each iteration is ONE distributed gradient pass (the same
    map_batches partials every other trainer uses); the driver holds
    the parameter, step-size, and previous-sign vectors. Pad/OOV rows
    have their gradient projected to zero by _objective, so sign(0)=0
    keeps them frozen without special-casing. No line search, so the
    objective is not strictly monotone; tests assert net progress and
    a servable held-out F1 instead.

    Returns (TrainWeights, history) with one mean-objective entry per
    iteration."""
    families, tests = _plan_from_patterns(patterns)
    value_ids = build_feature_space(seq_ds, families=families, tests=tests)
    w = TrainWeights.zeros(value_ids, families)
    feat_ds = featurize(seq_ds, value_ids, alias_types, families, tests)

    x = _pack(w)
    f, g_struct = _objective(feat_ds, w, l2, batch_size, concurrency)
    g = _pack(g_struct)
    delta = np.full_like(x, step0)
    g_prev = np.zeros_like(x)
    history = [{"iter": 0, "mean_obj": round(f, 6)}]
    for it in range(iters):
        prod = g * g_prev
        delta = np.where(prod > 0.0,
                         np.minimum(delta * eta_plus, step_max),
                         np.where(prod < 0.0,
                                  np.maximum(delta * eta_minus, step_min),
                                  delta))
        g_eff = np.where(prod < 0.0, 0.0, g)
        x = x - np.sign(g_eff) * delta
        g_prev = g_eff
        w_it = _unpack(x, value_ids, families)
        f, g_struct = _objective(feat_ds, w_it, l2, batch_size,
                                 concurrency)
        g = _pack(g_struct)
        history.append({"iter": it + 1, "mean_obj": round(f, 6)})
    w_final = _unpack(x, value_ids, families)
    _clamp_pad_rows(w_final)
    return w_final, history


class EpochTrainer:
    """map_batches worker: sequential perceptron over the batch's
    sequences on a LOCAL weight copy; returns the dense delta."""

    def __init__(self, weights_ref):
        import ray

        self.base: TrainWeights = ray.get(weights_ref) \
            if not isinstance(weights_ref, TrainWeights) else weights_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self.base.copy()
        n_err = n_seq = 0
        for ids, gold in _rows_from_featurized(batch):
            n_seq += 1
            T = len(gold)
            E = np.zeros((T, N_LABELS))
            for fam, M in ids.items():
                Wf = w.weights[fam]
                for oi in range(M.shape[1]):
                    E += Wf[M[:, oi], oi]
            pred = np.array(_viterbi(E, w.trans, w.start), dtype=np.int64)
            if np.array_equal(pred, gold):
                continue
            n_err += 1
            diff = np.flatnonzero(pred != gold)
            for fam, M in ids.items():
                Wf = w.weights[fam]
                for oi in range(M.shape[1]):
                    np.add.at(Wf, (M[diff, oi], oi, gold[diff]), 1.0)
                    np.add.at(Wf, (M[diff, oi], oi, pred[diff]), -1.0)
            # transition/start updates over full paths
            w.start[gold[0]] += 1.0
            w.start[pred[0]] -= 1.0
            np.add.at(w.trans, (gold[:-1], gold[1:]), 1.0)
            np.add.at(w.trans, (pred[:-1], pred[1:]), -1.0)
        # delta = local - base (dense, mergeable)
        payload = {
            f"d_{fam}": pa.array([(w.weights[fam] -
                                   self.base.weights[fam]).tobytes()],
                                 pa.binary())
            for fam in self.base.weights
        }
        payload["d_trans"] = pa.array(
            [(w.trans - self.base.trans).tobytes()], pa.binary())
        payload["d_start"] = pa.array(
            [(w.start - self.base.start).tobytes()], pa.binary())
        payload["n_err"] = pa.array([n_err], pa.int64())
        payload["n_seq"] = pa.array([n_seq], pa.int64())
        return pa.table(payload)


def train_perceptron(seq_ds, alias_types: dict[str, str],
                     epochs: int = 5, batch_size: int = 256,
                     concurrency=(1, 8), patterns=None,
                     deterministic_buckets: int | None = None):
    """Iterative-parameter-mixing training loop. seq_ds rows:
    (tokens: list<string>, tags: list<string>). Returns the AVERAGED
    TrainWeights (average of post-epoch weights — the standard
    averaged-perceptron variance reduction at epoch granularity).

    Default mode mixes per-map_batches deltas: fast, but batch
    composition (and so the trained weights) depends on block layout.
    ``deterministic_buckets=B`` instead groups sequences into B
    seed-stable content-hash buckets and trains each bucket in
    ascending-hash order, mixing bucket deltas in ascending bucket
    order — the result is BITWISE independent of block layout, CPU
    count and retries, and is replayed exactly by the single-process
    oracle (ner_ray/oracle/train_oracle.py) that produces the
    gold_train_metrics fixture for the value-matched q_train_eval."""
    import ray

    families, tests = _plan_from_patterns(patterns)
    value_ids = build_feature_space(seq_ds, families=families, tests=tests)
    w = TrainWeights.zeros(value_ids, families)
    feat_ds = featurize(seq_ds, value_ids, alias_types, families, tests,
                        buckets=deterministic_buckets)
    avg = TrainWeights.zeros(value_ids, families)
    history = []
    for _epoch in range(epochs):
        w_ref = ray.put(w)
        if deterministic_buckets is not None:
            import pyarrow.compute as pc

            def run_bucket(g: pa.Table) -> pa.Table:
                g = g.take(pc.sort_indices(
                    g, sort_keys=[("_h", "ascending")]))
                out = EpochTrainer(w_ref)(g)
                return out.append_column("_bkt", pa.array(
                    [g.column("_bkt")[0].as_py()], pa.int64()))

            parts = feat_ds.groupby("_bkt").map_groups(
                run_bucket, batch_format="pyarrow").to_pandas()
            # mixing order must be layout-independent too
            parts = parts.sort_values("_bkt").reset_index(drop=True)
        else:
            parts = feat_ds.map_batches(
                EpochTrainer,
                fn_constructor_kwargs={"weights_ref": w_ref},
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=concurrency, num_cpus=1,
            ).to_pandas()
        k = max(len(parts), 1)
        n_err = int(parts["n_err"].sum()) if len(parts) else 0
        n_seq = int(parts["n_seq"].sum()) if len(parts) else 0
        for fam in w.weights:
            shape = w.weights[fam].shape
            delta = np.zeros(shape)
            for buf in parts[f"d_{fam}"]:
                delta += np.frombuffer(buf, dtype=np.float64).reshape(shape)
            w.weights[fam] += delta / k     # parameter mixing (uniform)
        dt = np.zeros_like(w.trans)
        for buf in parts["d_trans"]:
            dt += np.frombuffer(buf, dtype=np.float64).reshape(w.trans.shape)
        w.trans += dt / k
        dstart = np.zeros_like(w.start)
        for buf in parts["d_start"]:
            dstart += np.frombuffer(buf, dtype=np.float64)
        w.start += dstart / k
        _clamp_pad_rows(w)
        for fam in w.weights:
            avg.weights[fam] += w.weights[fam]
        avg.trans += w.trans
        avg.start += w.start
        history.append({"epoch": _epoch, "errors": n_err, "sequences": n_seq})
        if n_err == 0:
            break
    n = len(history)
    for fam in avg.weights:
        avg.weights[fam] /= n
    avg.trans /= n
    avg.start /= n
    return avg, history
