"""Distributed TF-IDF: corpus-wide document frequencies + per-doc
top-k term scoring — the classic relevance/keyword operator a KG or
search pipeline wants next to the text-stats suite.

Shape at 10^11 docs:
* pass 1 (df): tokens never shuffle raw — each batch pre-aggregates
  its per-doc DISTINCT tokens to (token, n_docs) partials, then ONE
  ``groupby(token).sum`` merges (one scalar row per distinct token per
  block, same bound as every partial+final agg here);
* vocabulary policy: ``min_df`` floors rare noise; above ``max_vocab``
  the top-by-df survive and the drop is LOGGED (no silent caps).
  ``tfidf_topk_terms`` collects the vocabulary to the driver for the
  idf broadcast, so its default cap is FINITE (``"auto"`` ->
  ``DEFAULT_MAX_VOCAB``): web-scale distinct-token counts run to
  billions and an unbounded default is a driver OOM. Pass
  ``max_vocab=None`` to opt in to unbounded explicitly;
* pass 2 (score): the (token -> idf) map broadcasts ONCE via
  ``ray.put`` and scoring is map-only — factorize the batch's tokens,
  look up idf on the uniques, bincount tf per doc, emit each doc's
  top-k. The corpus text crosses the wire zero times.

Tokenization = lower + split on a single space with empties dropped —
pinned so a DuckDB oracle (string_split + unnest) reproduces scores
exactly. idf = ln(N / df) (no smoothing — pinned for the oracle);
score = tf * idf; ties rank by token ascending (deterministic).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_LOG = logging.getLogger(__name__)

# default driver-side vocabulary bound for the idf broadcast: 5M
# (token, idf) entries is ~100 MB — comfortably driver/worker-sized,
# while real web corpora exceed it by orders of magnitude
DEFAULT_MAX_VOCAB = 5_000_000


def _doc_distinct_tokens(t: pa.Table, text_col: str):
    """(row_idx, token) for each DISTINCT token per doc, vectorized."""
    toks = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten().to_pandas()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(len(t)), counts)
    keep = flat.to_numpy(dtype=object) != ""
    df = pd.DataFrame({"r": row[keep], "tok": flat[keep]})
    return df.drop_duplicates()


def document_frequencies(docs_ds, text_col: str = "text",
                         min_df: int = 1, max_vocab: int | None = None):
    """(token, df) Dataset — df = number of docs containing the token.
    Per-batch pre-aggregation means the shuffle carries one scalar row
    per distinct token per block."""
    def partial(t: pa.Table) -> pa.Table:
        d = _doc_distinct_tokens(t, text_col)
        g = d.groupby("tok", sort=False).size()
        return pa.table({"token": pa.array(g.index),
                         "df": pa.array(g.to_numpy().astype(np.int64))})

    out = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("df").rename_columns({"sum(df)": "df"})
    if min_df > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("df"),
                                                pa.scalar(min_df))),
            batch_format="pyarrow")
    if max_vocab is not None:
        n = out.count()
        if n > max_vocab:
            _LOG.warning(
                "tfidf vocabulary capped: %d tokens -> top %d by df "
                "(%d dropped)", n, max_vocab, n - max_vocab)
            out = out.sort(["df", "token"], descending=[True, False]) \
                .limit(max_vocab)
    return out


def tfidf_topk_terms(docs_ds, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 5,
                     min_df: int = 1,
                     max_vocab: int | str | None = "auto",
                     materialize: bool = True):
    """Per-doc top-k TF-IDF terms: (id, term, tf, score, rank). The
    idf table broadcasts once (``ray.put``); scoring is map-only.
    ``max_vocab`` bounds the driver-collected vocabulary; the default
    ``"auto"`` resolves to ``DEFAULT_MAX_VOCAB`` (over-cap tokens are
    dropped lowest-df-first and LOGGED) — ``None`` is the explicit
    unbounded opt-in for corpora whose vocabulary is known to fit.
    ``materialize=True`` pins the input (it feeds the df pass AND the
    scoring pass); False is the re-read mode."""
    import ray

    if max_vocab == "auto":
        max_vocab = DEFAULT_MAX_VOCAB
    if materialize:
        docs_ds = docs_ds.materialize()
    n_docs = docs_ds.count()
    df_tbl = document_frequencies(docs_ds, text_col, min_df, max_vocab) \
        .take_all()
    vocab = pd.Series({r["token"]: np.log(n_docs / r["df"])
                       for r in df_tbl})
    vocab_ref = ray.put((np.array(vocab.index, dtype=object),
                         vocab.to_numpy()))

    def score(t: pa.Table) -> pa.Table:
        toks, idfs = ray.get(vocab_ref)
        # tf needs ALL occurrences, not distinct: raw (row, token) pairs
        lists = pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        lists = lists.combine_chunks() \
            if isinstance(lists, pa.ChunkedArray) else lists
        flat = lists.flatten().to_pandas()
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(len(t)), counts)
        keep = flat.to_numpy(dtype=object) != ""
        pairs = pd.DataFrame({"r": row[keep], "tok": flat[keep]})
        tf = pairs.groupby(["r", "tok"], sort=False).size().reset_index(
            name="tf")
        # idf lookup on the (far fewer) unique tokens of this batch
        order = pd.Index(toks)
        pos = order.get_indexer(tf["tok"])
        known = pos >= 0
        tf = tf[known]
        scores = tf["tf"].to_numpy() * idfs[pos[known]]
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out = pd.DataFrame({
            id_col: ids[tf["r"].to_numpy()],
            "term": tf["tok"].to_numpy(),
            "tf": tf["tf"].to_numpy().astype(np.int64),
            "score": scores,
        })
        # per-doc top-k, ties by term ascending (deterministic)
        out = out.sort_values([id_col, "score", "term"],
                              ascending=[True, False, True],
                              kind="stable")
        out["rank"] = out.groupby(id_col, sort=False).cumcount() + 1
        out = out[out["rank"] <= k]
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs_ds.map_batches(score, batch_format="pyarrow")
