"""Cross-document repeated-substring removal: drop every k-token
window that occurs in >= ``min_docs`` distinct documents (the
distributed, hashed approximation of the suffix-array substring dedup
in Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better" — their ExactSubstr removes 50-token repeats).

Why it exists: document-level dedup (exact / MinHash) keeps documents
that EMBED a viral passage (boilerplate licences, navigation chrome,
chain letters) inside otherwise-unique text. Substring-level removal
is the standard next step for LLM training corpora.

Scale design
------------
- Pass 1 (count): each batch emits per-doc-DISTINCT positional k-gram
  hashes pre-aggregated to (hash, n_docs) partials; a groupby(hash)
  Sum keeps only hashes reaching ``min_docs``. Shuffle payload is
  (int64, int64) scalar pairs; the surviving dup-hash set is the
  collection of *repeated* grams only — orders of magnitude smaller
  than the corpus.
- Pass 2 (trim): dup hashes broadcast once via ``ray.put`` (sorted
  array, searchsorted membership); the corpus streams through ONE
  map-only pass that rebuilds each text from uncovered tokens —
  vectorized diff-array window union, no per-token Python. Above
  ``max_broadcast_hashes`` the broadcast would not fit workers; the
  operator raises with guidance to shard by corpus partition (the
  same contract as decontam's bucketed fallback threshold) rather
  than silently degrade.
- Hash-for-string substitution: 64-bit stable hashes stand in for
  gram identity (the exact_dedup contract). Collision semantics are
  OVER-TRIM ONLY: equal gram strings always hash equal, so every
  genuinely repeated window is found (under-trim is impossible); a
  collision between two DISTINCT grams can only inflate a doc count
  or alias a unique gram to a repeated one — both remove extra
  windows, never keep a duplicated one. Expected false-trim rate: with
  G distinct k-grams corpus-wide, expected colliding pairs ~= G^2 /
  2^65 (birthday bound), each trimming at most 2k extra tokens per
  affected doc. At G = 10^12 (a ~100-TB corpus) that is ~2.7e4
  colliding pairs -> a falsely-trimmed token fraction on the order of
  1e-8 — far below the noise floor of the dedup itself. This is the
  documented gap vs Lee et al.'s suffix-array ExactSubstr, which is
  collision-free but needs a global suffix array.
  ``hash_mod`` (test-only) truncates the hash space to make collisions
  common so the over-trim-only contract is provable in tests.

Tokens are whitespace tokens (``str.split()``), matching the shingle
kernel in neardup/decontam; removal spans never cross document
boundaries by construction (a valid k-gram window fits inside its
document).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray.util.hashing import hash_column

DEFAULT_K = 20
MAX_BROADCAST_HASHES = 50_000_000  # ~400 MB of int64 — object-store safe


def _positional_ngram_hashes(texts: pd.Series, k: int,
                             hash_mod: int | None = None):
    """(row_idx, token_pos, uint64 hash) for every k-token window.

    Same tokenization + shift-concat construction as
    neardup._shingle_hashes, but keeps the window's start position so
    callers can map hashes back to token spans."""
    words = texts.str.split()
    counts = words.str.len().fillna(0).to_numpy(dtype=np.int64)
    flat = words.explode(ignore_index=True).dropna().reset_index(drop=True)
    n = len(flat)
    row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    if n == 0:
        return (np.array([], dtype=np.int64),) * 2, np.array(
            [], dtype=np.uint64), counts, flat, row
    parts = [flat]
    valid = np.ones(n, dtype=bool)
    for j in range(1, k):
        parts.append(flat.shift(-j))
        v = np.zeros(n, dtype=bool)
        v[:-j] = row[:-j] == row[j:]
        valid &= v
    sh = parts[0].str.cat(parts[1:], sep=" ") if k > 1 else flat
    keep = valid & sh.notna().to_numpy()
    h = hash_column(sh[keep])
    if hash_mod is not None:  # collision injection (tests only)
        h = h % np.uint64(hash_mod)
    return (row[keep], pos[keep]), h, counts, flat, row


def duplicated_ngram_hashes(docs_ds, k: int = DEFAULT_K,
                            min_docs: int = 2, text_col: str = "text",
                            hash_mod: int | None = None):
    """Dataset -> Dataset[(h: int64, n_docs: int64)] of k-gram hashes
    occurring in >= min_docs distinct documents."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pandas()
        (row, _pos), h, *_ = _positional_ngram_hashes(texts, k, hash_mod)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # distinct per doc first: "n docs containing", not "n occurrences"
        pair = np.unique(np.stack([row.astype(np.uint64), h], axis=1),
                         axis=0)
        uh, cnt = np.unique(pair[:, 1], return_counts=True)
        return pa.table({"h": pa.array(uh.view(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n", alias_name="n_docs"))
    return counts.filter(expr=f"n_docs >= {int(min_docs)}")


def remove_repeated_spans(docs_ds, k: int = DEFAULT_K, min_docs: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_broadcast_hashes: int = MAX_BROADCAST_HASHES,
                          hash_mod: int | None = None):
    """Rewrite ``text_col`` with every globally-repeated k-token
    window removed (union of covering windows); adds
    ``removed_tokens`` (int64) per doc. Two passes over the corpus:
    one counting shuffle of scalar pairs, one broadcast map."""
    import ray

    dup = duplicated_ngram_hashes(docs_ds, k=k, min_docs=min_docs,
                                  text_col=text_col,
                                  hash_mod=hash_mod).materialize()
    n_dup = dup.count()
    if n_dup > max_broadcast_hashes:
        raise ValueError(
            f"remove_repeated_spans: {n_dup} duplicated {k}-gram hashes "
            f"exceed max_broadcast_hashes={max_broadcast_hashes}; shard "
            "the run by corpus partition (hashes are reusable across "
            "shards) or raise the cap if workers have the memory")
    parts = [b.column("h").to_numpy(zero_copy_only=False)
             for b in dup.iter_batches(batch_format="pyarrow",
                                       batch_size=None)]
    dup_sorted = np.sort(np.concatenate(parts).view(np.uint64)) \
        if parts else np.array([], dtype=np.uint64)
    ref = ray.put(dup_sorted)

    class _Trim:
        def __init__(self):
            self.dup = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pandas()
            (row, pos), h, counts, flat, tok_row = \
                _positional_ngram_hashes(texts, k, hash_mod)
            n_tok = len(flat)
            if n_tok == 0 or len(self.dup) == 0:
                out = t.set_column(
                    t.schema.get_field_index(text_col), text_col,
                    t.column(text_col))
                return out.append_column(
                    "removed_tokens",
                    pa.array(np.zeros(len(t), np.int64)))
            idx = np.searchsorted(self.dup, h)
            idx[idx == len(self.dup)] = 0
            flagged = self.dup[idx] == h
            starts = np.cumsum(counts) - counts
            g = starts[row[flagged]] + pos[flagged]  # global window starts
            diff = np.zeros(n_tok + 1, dtype=np.int64)
            np.add.at(diff, g, 1)
            np.add.at(diff, g + k, -1)  # windows never cross doc bounds
            covered = np.cumsum(diff[:n_tok]) > 0
            kept_row = tok_row[~covered]
            kept = flat[~covered]
            joined = pd.Series(kept.to_numpy(dtype=object)) \
                .groupby(kept_row).agg(" ".join)
            new_texts = pd.Series([""] * len(texts), dtype=object)
            new_texts.iloc[joined.index] = joined.to_numpy()
            removed = np.bincount(tok_row[covered],
                                  minlength=len(texts)).astype(np.int64)
            out = t.set_column(
                t.schema.get_field_index(text_col), text_col,
                pa.array(new_texts, pa.string()))
            return out.append_column("removed_tokens", pa.array(removed))

    return docs_ds.map_batches(_Trim, batch_format="pyarrow",
                               concurrency=(1, 8), num_cpus=1)
