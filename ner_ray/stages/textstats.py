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
    pred_lang = argmax, ties -> lexicographic. Deterministic."""

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


class TextStatsStage:
    """Fused per-doc text statistics — whitespace token count, BPE-ish
    token count, digit-normalized text, and quality metrics in ONE pass
    over the batch (regex compiled once per actor). Each component is
    also available standalone above; fusing them means the documents
    table is read and decoded once instead of four times."""

    def __init__(self):
        import re

        self.pat = re.compile(BPE_ISH)

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
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
        })


class DocSignalsStage(LangIdStage):
    """Fused language-ID + content fingerprint (the two engine-specific
    per-doc signals with no SQL oracle), one pass per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        h = hash_column(batch.column("text"))
        return out.append_column(
            "fingerprint", pa.array([f"{x:016x}" for x in h], pa.string()))
