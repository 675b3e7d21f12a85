"""Trainable language identification — a fastText-shaped linear
classifier over hashed character n-grams (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification"; the same public recipe
behind fastText's lid.176 model). Upgrades the stopword-profile
heuristic (stages/textstats.py LangIdStage) whenever labeled text
exists: character n-grams capture orthography/morphology, so the model
separates languages that share function-word spellings and scales to
languages with no curated stopword list.

Ray-Data-first shape (mirrors stages/qualityclf.py):
* features: hashed char 1..n-grams over ``num_buckets`` dims —
  extraction is fully vectorized (one UTF-32 decode of the batch, one
  ``sliding_window_view`` per n, seed-stable ``combine_hashes`` over
  the window columns; doc boundaries masked, no per-row Python);
* training: multinomial (softmax) logistic regression via per-batch
  gradient PARTIALS — each batch ships one (K x num_buckets + K + 2)
  vector to the driver, mergeable and order-independent up to float
  addition; the driver runs Adam. Epochs stream the corpus; nothing
  corpus-sized materializes.
* scoring: ONE map-only pass with the (K, num_buckets) weight matrix
  broadcast via ``ray.put``.

No pretrained model ships in this environment; the operator's value is
that any labeled fixture (even the stopword profiles themselves used
as seed corpora) trains a usable classifier in-cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.util.hashing import combine_hashes, to_bucket

DEFAULT_BUCKETS = 8192


def _char_ngram_buckets(texts, num_buckets: int, n_lo: int = 1,
                        n_hi: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, bucket) of every char n-gram (n in [n_lo, n_hi]) in
    the batch, lowercased. One UTF-32 decode of the NUL-joined batch;
    windows crossing doc boundaries are masked out."""
    docs = pc.fill_null(pc.utf8_lower(texts), "")
    # NUL delimits docs in the flat stream; strip any embedded NULs
    docs = pc.replace_substring(docs, "\x00", "")
    nd = len(docs)
    if nd == 0:
        return (np.array([], dtype=np.int64),
                np.array([], dtype=np.int64))
    blob = "\x00".join(docs.to_pylist())
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    if len(cp) == 0:
        return (np.array([], dtype=np.int64),
                np.array([], dtype=np.int64))
    sep = cp == 0
    # row of each char position = #separators before it
    row_at = np.zeros(len(cp), dtype=np.int64)
    np.cumsum(sep[:-1], out=row_at[1:])
    rows_out, buckets_out = [], []
    for n in range(n_lo, n_hi + 1):
        if len(cp) < n:
            break
        win = np.lib.stride_tricks.sliding_window_view(cp, n)
        valid = ~np.logical_or.reduce([sep[i:len(cp) - n + 1 + i]
                                       for i in range(n)])
        if not valid.any():
            continue
        h = combine_hashes(*[win[valid, i].astype(np.uint64)
                             for i in range(n)])
        rows_out.append(row_at[:len(cp) - n + 1][valid])
        buckets_out.append(to_bucket(h, num_buckets))
    if not rows_out:
        return (np.array([], dtype=np.int64),
                np.array([], dtype=np.int64))
    return np.concatenate(rows_out), np.concatenate(buckets_out)


def _design(texts, num_buckets: int, n_lo: int, n_hi: int):
    """L1-normalized sparse design (rows, buckets, vals) of one batch
    (duplicate (row, bucket) pairs collapsed) — same normalization
    contract as qualityclf._batch_design."""
    row, b = _char_ngram_buckets(texts, num_buckets, n_lo, n_hi)
    if len(b) == 0:
        return row, b, np.zeros(0)
    key = row.astype(np.int64) * num_buckets + b
    uniq, cnt = np.unique(key, return_counts=True)
    rows = (uniq // num_buckets).astype(np.int64)
    buckets = (uniq % num_buckets).astype(np.int64)
    totals = np.bincount(rows, weights=cnt)
    return rows, buckets, cnt / totals[rows]


def _logits(rows, buckets, vals, W, b, n_rows):
    """(n_rows, K) dense logits from the sparse design."""
    K = W.shape[0]
    Z = np.tile(b, (n_rows, 1))
    for k in range(K):  # K = #languages, single digits — not a hot loop
        Z[:, k] += np.bincount(rows, weights=vals * W[k, buckets],
                               minlength=n_rows)
    return Z


def distinct_labels(ds, label_col: str) -> list[str]:
    """Sorted distinct labels via per-batch unique partials (the label
    universe is languages — driver-sized by nature)."""
    def partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column(label_col).combine_chunks())
        return pa.table({"l": u})

    seen: set[str] = set()
    for bt in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        seen.update(bt.column("l").to_pylist())
    return sorted(x for x in seen if x is not None)


def fit_langid(ds, text_col: str = "text", label_col: str = "lang",
               num_buckets: int = DEFAULT_BUCKETS, n_lo: int = 1,
               n_hi: int = 3, epochs: int = 30, lr: float = 0.5,
               l2: float = 1e-6, seed: int = 0) -> dict:
    """Distributed multinomial logistic regression over hashed char
    n-grams. Each epoch streams the labeled dataset once collecting
    per-batch (grad_W, grad_b, loss, count) partials; the driver runs
    Adam. Returns {"langs", "W", "b", "num_buckets", "n_lo", "n_hi",
    "loss_curve"}."""
    langs = distinct_labels(ds, label_col)
    if len(langs) < 2:
        raise ValueError(
            f"fit_langid needs >= 2 distinct labels, got {langs}")
    K = len(langs)
    rng = np.random.default_rng(seed)
    W = rng.normal(scale=1e-3, size=(K, num_buckets))
    bias = np.zeros(K)
    span = K * num_buckets
    m = np.zeros(span + K)
    v = np.zeros(span + K)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    losses = []
    lab_index = pd.Index(langs)

    def partials(W_now, b_now):
        def grad(t: pa.Table) -> pa.Table:
            y = lab_index.get_indexer(
                t.column(label_col).to_pylist())
            # get_indexer returns -1 for null/unseen labels; -1 would
            # silently index the LAST class in the loss/gradient
            # fancy-indexing below, training such rows as an arbitrary
            # language — drop them instead (they carry no supervision)
            ok = y >= 0
            if not ok.all():
                t = t.filter(pa.array(ok))
                y = y[ok]
            nr = len(t)
            rows, buckets, vals = _design(
                t.column(text_col), num_buckets, n_lo, n_hi)
            Z = _logits(rows, buckets, vals, W_now, b_now, nr)
            Z -= Z.max(axis=1, keepdims=True)
            P = np.exp(Z)
            P /= P.sum(axis=1, keepdims=True)
            loss = -float(np.log(np.maximum(
                P[np.arange(nr), y], 1e-300)).sum())
            err = P
            err[np.arange(nr), y] -= 1.0          # dL/dz
            gW = np.zeros((K, num_buckets))
            if len(buckets):
                for k in range(K):
                    gW[k] = np.bincount(
                        buckets, weights=vals * err[rows, k],
                        minlength=num_buckets)
            out = np.concatenate(
                [gW.ravel(), err.sum(axis=0), [loss, float(nr)]])
            return pa.table({"p": pa.array(out)})

        return [bb.column("p").to_numpy(zero_copy_only=False)
                for bb in ds.map_batches(grad, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")]

    width = span + K + 2
    for step in range(1, epochs + 1):
        tot = np.concatenate(partials(W, bias)) \
            .reshape(-1, width).sum(axis=0)
        cnt = max(tot[-1], 1.0)
        g = tot[:span + K] / cnt
        g[:span] += l2 * W.ravel()
        losses.append(tot[span + K] / cnt)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        mh = m / (1 - beta1 ** step)
        vh = v / (1 - beta2 ** step)
        upd = lr * mh / (np.sqrt(vh) + eps)
        W = W - upd[:span].reshape(K, num_buckets)
        bias = bias - upd[span:]
    return {"langs": langs, "W": W, "b": bias,
            "num_buckets": num_buckets, "n_lo": n_lo, "n_hi": n_hi,
            "loss_curve": losses}


def langid_scores(ds, model: dict, text_col: str = "text",
                  pred_col: str = "pred_lang",
                  prob_col: str = "lang_prob"):
    """Append (pred_lang, lang_prob) per doc. Map-only; the weight
    matrix broadcasts once via ``ray.put``. Ties break toward the
    lexicographically smaller language (argmax on the sorted label
    axis) — same determinism contract as the stopword LangIdStage."""
    import ray

    ref = ray.put((model["W"], model["b"],
                   np.array(model["langs"], dtype=object)))
    num_buckets = model["num_buckets"]
    n_lo, n_hi = model["n_lo"], model["n_hi"]

    def fn(t: pa.Table) -> pa.Table:
        W, b, langs = ray.get(ref)
        rows, buckets, vals = _design(
            t.column(text_col), num_buckets, n_lo, n_hi)
        Z = _logits(rows, buckets, vals, W, b, len(t))
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        best = P.argmax(axis=1)
        return t.append_column(
            pred_col, pa.array(langs[best], pa.string())) \
            .append_column(
                prob_col, pa.array(P[np.arange(len(t)), best]))

    return ds.map_batches(fn, batch_format="pyarrow")
