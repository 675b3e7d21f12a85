"""Text-analysis operators for large-scale training-data pipelines:
language ID (stopword-profile heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), document fingerprinting
(rolling hash). All vectorized map_batches stages over the
``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.util.hashing import hash_column

# tiny per-language stopword profiles (public-knowledge function words)
STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "en"},
    "zh": {"de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "bu"},
}

BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count — exact str_split(' ') semantics so the
    DuckDB oracle pins it."""
    n = pc.list_value_length(pc.split_pattern(batch.column(text_col), " "))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pc.cast(n, pa.int64()),
    })


class BpeishTokenCounter:
    """Regex 'BPE-ish' token count (letters / digits / single
    punctuation), compiled once per actor."""

    def __init__(self):
        import re

        self.pat = re.compile(BPE_ISH)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(self.pat)  # compiled once per actor
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "n_bpeish": n.astype("int64")})


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality metrics with exact SQL equivalents (length, word count,
    mean word length, distinct-word ratio)."""
    text = batch.column("text")
    words = pc.split_pattern(text, " ")
    n_words = pc.cast(pc.list_value_length(words), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    no_space = pc.utf8_length(pc.replace_substring(text, " ", ""))
    nw = n_words.to_numpy(zero_copy_only=False).astype(np.float64)
    # raw IEEE division (engine-identical, no rounding-boundary risk)
    mean_wlen = no_space.to_numpy(zero_copy_only=False) / np.maximum(nw, 1.0)
    # distinct-word ratio: vectorized explode + nunique
    pdf = pd.DataFrame({
        "i": np.repeat(np.arange(len(batch)),
                       pc.list_value_length(words).to_numpy(zero_copy_only=False)),
        "w": words.combine_chunks().flatten().to_pandas()
        if isinstance(words, pa.ChunkedArray) else words.flatten().to_pandas(),
    })
    uniq = pdf.groupby("i")["w"].nunique()
    uniq_full = np.zeros(len(batch), dtype=np.float64)
    uniq_full[uniq.index.to_numpy()] = uniq.to_numpy()
    uniq_ratio = uniq_full / np.maximum(nw, 1.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars_computed": n_chars,
        "n_words": n_words,
        "mean_word_len": pa.array(mean_wlen, pa.float64()),
        "uniq_ratio": pa.array(uniq_ratio, pa.float64()),
    })


class LangIdStage:
    """Stopword-profile language ID (n-gram-free heuristic): score per
    language = fraction of tokens in that language's stopword set;
    pred_lang = argmax, ties -> lexicographic. Deterministic.

    The trainable upgrade is ``stages/langid.py`` (hashed char-n-gram
    multinomial logistic, fastText-shaped): use it whenever labeled
    text exists or a language has no stopword profile; this heuristic
    stays as the zero-training fallback and the q_doc_signals
    contract."""

    def __init__(self):
        self.langs = sorted(STOPWORDS)
        self.sets = [STOPWORDS[l] for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(batch.column("text")), " ")
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.combine_chunks().flatten().to_pandas() \
            if isinstance(words, pa.ChunkedArray) else words.flatten().to_pandas()
        row = np.repeat(np.arange(len(batch)), counts)
        scores = np.zeros((len(batch), len(self.langs)))
        for li, sw in enumerate(self.sets):
            hits = flat.isin(sw).to_numpy()
            scores[:, li] = np.bincount(row, weights=hits,
                                        minlength=len(batch))
        denom = np.maximum(counts, 1)
        scores /= denom[:, None]
        best = scores.argmax(axis=1)  # first max = lexicographic lang
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(np.array(self.langs, dtype=object)[best],
                                  pa.string()),
            "lang_score": pa.array(np.round(scores[np.arange(len(batch)),
                                                   best], 6), pa.float64()),
        })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Stable 64-bit document fingerprint (content hash of text)."""
    h = hash_column(batch.column("text"))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array([f"{x:016x}" for x in h], pa.string()),
    })


def winnow_fingerprint_batch(batch: pa.Table, k: int = 3,
                             w: int = 4) -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the rolling-hash selection scheme): hash every
    k-word shingle, slide a window of ``w`` consecutive shingle hashes
    within each doc, keep the window minimum. Any shared run of at
    least w+k-1 words between two docs is GUARANTEED to share a
    fingerprint — the local-dedup/plagiarism primitive.

    Emits one row per selected fingerprint (doc_id, fp) — the shape a
    fingerprint-dedup joins or groupbys on; docs too short for a full
    window contribute their shingle-set minima (or nothing when they
    have no shingles). Fully vectorized: sliding_window_view over the
    flat hash stream, windows crossing doc boundaries masked out."""
    texts = batch.column("text").to_pandas()
    ids = batch.column("doc_id")
    from ner_ray.stages.neardup import _shingle_hashes

    row, h = _shingle_hashes(texts, k)
    out_row = np.array([], dtype=np.int64)
    out_fp = np.array([], dtype=np.uint64)
    if len(h):
        if len(h) >= w:
            sw = np.lib.stride_tricks.sliding_window_view(h, w)
            starts = np.arange(len(sw))
            inside = row[starts] == row[starts + w - 1]
            out_row = row[starts][inside]
            out_fp = sw.min(axis=1)[inside]
        # short docs (fewer than w shingles) keep their global min
        counts = np.bincount(row, minlength=len(texts))
        short = np.flatnonzero((counts > 0) & (counts < w))
        if len(short):
            df = pd.DataFrame({"row": row, "h": h})
            m = df[df["row"].isin(short)].groupby("row")["h"].min()
            out_row = np.concatenate([out_row, m.index.to_numpy()])
            out_fp = np.concatenate([out_fp, m.to_numpy()])
    dedup = pd.DataFrame({"i": out_row, "fp": out_fp}).drop_duplicates()
    id_np = ids.to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(id_np[dedup["i"].to_numpy()]
                           if len(dedup) else id_np[:0]),
        "fp": pa.array(dedup["fp"].to_numpy().view(np.int64)
                       if len(dedup) else
                       np.array([], dtype=np.int64)),
    })


def winnow_dup_candidates(docs_ds, k: int = 3, w: int = 4,
                          min_shared: int = 2):
    """Fingerprint-based near-dup candidates: docs sharing at least
    ``min_shared`` winnowing fingerprints. Shuffles only (fp, doc_id)
    rows — the same banded-candidate shape as MinHash-LSH, but with
    the winnowing guarantee on long shared runs. Buckets over
    MAX_BUCKET_PAIR_MEMBERS emit star edges with a logged overflow
    (hot-bucket cap); the shuffle groups by a coarse hash bucket of
    the fingerprint — near-singleton fp groups otherwise pay ~1 ms of
    map_groups overhead each (see neardup.lsh_candidate_pairs)."""
    from ner_ray.stages.neardup import (
        MAX_BUCKET_PAIR_MEMBERS,
        _bucketed_pair_emitter,
        _pair_stage_buckets,
        to_bucket_cols,
    )

    nb = _pair_stage_buckets(docs_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bk", pa.array(
            to_bucket_cols(t, ["fp"], nb)))

    rows = docs_ds.map_batches(
        lambda t: add_bucket(winnow_fingerprint_batch(t, k, w)),
        batch_format="pyarrow")
    pairs = rows.groupby("_bk").map_groups(
        _bucketed_pair_emitter(["fp"], "all", MAX_BUCKET_PAIR_MEMBERS),
        batch_format="pandas")
    from ray.data.aggregate import Count

    counted = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_shared"))
    # expression filter: vectorized Arrow compute, not a per-row lambda
    return counted.filter(expr=f"n_shared >= {int(min_shared)}")


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     need_top2: bool = True,
                     need_dup5: bool = True) -> pa.Table:
    """Gopher-shaped repetition signals (Rae et al. 2021, arXiv:
    2112.11446 §A1.1 — the rule SHAPE; token-count fractions are this
    repo's own definition so the DuckDB oracle can pin them exactly):

    * ``top2gram_frac``  — occurrences of the single most frequent word
      2-gram / total 2-gram positions (``n_words - 1``); a high value
      means one phrase dominates (boilerplate, keyword stuffing).
    * ``dup5gram_frac`` — (total − distinct) word 5-gram positions /
      total 5-gram positions; a high value means long stretches repeat.

    Both are ratios of small integer counts → raw IEEE division is
    engine-identical. Vectorized across the batch: one explode of the
    word stream, n-gram strings built by elementwise concat, one pandas
    groupby per n."""
    text = batch.column(text_col)
    words = pc.split_pattern(text, " ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    flat = (words.combine_chunks() if isinstance(words, pa.ChunkedArray)
            else words).flatten().to_pandas().to_numpy(dtype=object)
    row = np.repeat(np.arange(len(batch)), counts)

    def gram_rows(n: int):
        """(row_idx, gram_string) for every n-gram start position that
        stays inside one doc."""
        if len(flat) < n:
            return (np.array([], dtype=np.int64),
                    np.array([], dtype=object))
        m = len(flat) - n + 1
        ok = row[:m] == row[n - 1:]
        g = flat[:m].copy()
        for off in range(1, n):
            g = g + " "
            g = g + flat[off:off + m]
        return row[:m][ok], g[ok]

    def per_doc(n: int, need_top: bool, need_dup: bool):
        """Only the requested reduction(s) run — callers that cap just
        one signal (QualityFilterStage) skip the other's full-stream
        groupby."""
        r, g = gram_rows(n)
        tot = np.maximum(counts - (n - 1), 0).astype(np.float64)
        top = np.zeros(len(batch), dtype=np.float64)
        dst = np.zeros(len(batch), dtype=np.float64)
        if len(r):
            sizes = pd.DataFrame({"i": r, "g": g}) \
                .groupby(["i", "g"], sort=False).size()
            per_i = sizes.groupby(level=0)
            if need_top:
                mx = per_i.max()
                top[mx.index.to_numpy()] = mx.to_numpy()
            if need_dup:
                nu = per_i.size()
                dst[nu.index.to_numpy()] = nu.to_numpy()
        denom = np.maximum(tot, 1.0)
        return top / denom, (tot - dst) / denom

    cols = {"doc_id": batch.column("doc_id")}
    if need_top2:
        top2, _ = per_doc(2, True, False)
        cols["top2gram_frac"] = pa.array(top2, pa.float64())
    if need_dup5:
        _, dup5 = per_doc(5, False, True)
        cols["dup5gram_frac"] = pa.array(dup5, pa.float64())
    return pa.table(cols)


# PII patterns (RE2 syntax — shared by pyarrow and DuckDB): email,
# international-ish phone numbers, dotted-quad IPv4. Public-knowledge
# regex shapes; conservative on purpose (curation flags, not a legal
# scrubber). Phone is two alternatives: spaces/dots/parens are only
# accepted after an explicit "+" country code, and the bare form
# requires hyphen separators with a >=3-digit final group — otherwise
# ordinary grouped numerics ("1 200 000"), ISO dates (2026-08-17) and
# dotted quads are rewritten as phones (RE2 has no lookahead, so the
# disambiguation must live in the shape itself).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": (r"\+[0-9][0-9()\-. ]{6,}[0-9]"
              r"|\(?[0-9]{3,4}\)?-[0-9]{2,4}-[0-9]{3,6}"),
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc PII hit counts (email / phone / IPv4), one Arrow RE2
    kernel per pattern — no Python row loop."""
    text = batch.column(text_col)
    cols = {"doc_id": batch.column("doc_id")}
    for name, pat in PII_PATTERNS.items():
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64())
    return pa.table(cols)


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace PII matches with typed placeholders (``[EMAIL]`` etc.),
    preserving every other column. Email runs first so its local part
    can't be half-eaten by the phone pattern."""
    text = batch.column(text_col)
    for name in ("email", "phone", "ipv4"):
        text = pc.replace_substring_regex(
            text, PII_PATTERNS[name], f"[{name.upper()}]")
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, text)


class TextStatsStage:
    """Fused per-doc text statistics — whitespace token count, BPE-ish
    token count, digit-normalized text, quality metrics and repetition
    signals in ONE pass over the batch (regex compiled once per actor).
    Each component is also available standalone above; fusing them
    means the documents table is read and decoded once instead of six
    times."""

    def __init__(self):
        import re

        self.pat = re.compile(BPE_ISH)

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        rep = repetition_batch(batch)
        n_bpeish = batch.column("text").to_pandas().str.count(self.pat)
        norm = pc.replace_substring_regex(
            pc.utf8_lower(batch.column("text")), r"[0-9]", "0")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": q.column("n_words"),  # whitespace split semantics
            "n_bpeish": pa.array(n_bpeish.to_numpy(dtype=np.int64),
                                 pa.int64()),
            "norm_text": norm,
            "n_chars_computed": q.column("n_chars_computed"),
            "mean_word_len": q.column("mean_word_len"),
            "uniq_ratio": q.column("uniq_ratio"),
            "top2gram_frac": rep.column("top2gram_frac"),
            "dup5gram_frac": rep.column("dup5gram_frac"),
        })


class DocSignalsStage(LangIdStage):
    """Fused language-ID + content fingerprint, one pass per batch.

    The fingerprint uses the PORTABLE text hash (FNV-1a over code
    points + splitmix64, hashing.portable_text_hash): a content
    fingerprint is part of a corpus's auditable contract, so it must
    be recomputable outside this engine — the DuckDB oracle does,
    which is what value-matches q_doc_signals."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, _h = self.with_fingerprint(batch)
        return out

    def with_fingerprint(self, batch: pa.Table):
        """(output table, raw uint64 text hashes) — subclasses that
        need the text hash again (q_doc_signals' row_hash) reuse it
        instead of folding every document twice."""
        from ner_ray.util.hashing import portable_text_hash

        out = super().__call__(batch)
        h = portable_text_hash(batch.column("text"))
        return out.append_column(
            "fingerprint",
            pa.array([f"{x:016x}" for x in h], pa.string())), h
