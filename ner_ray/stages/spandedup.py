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
- ``exact=True`` closes that gap without a suffix array: a third pass
  re-scans the corpus, ships the TEXT of candidate windows only (the
  rare repeated fraction) into one groupby(gram) count, and the trim
  pass then matches confirmed gram STRINGS — zero false trims by
  construction, window semantics identical. The gram-string broadcast
  is byte-capped (raises with shard guidance); hashed mode remains the
  default for corpora whose dup-gram text exceeds the budget.

Tokens are whitespace tokens (``str.split()``), matching the shingle
kernel in neardup/decontam; removal spans never cross document
boundaries by construction (a valid k-gram window fits inside its
document).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.util.hashing import hash_column

DEFAULT_K = 20
MAX_BROADCAST_HASHES = 50_000_000  # ~400 MB of int64 — object-store safe


def _positional_ngram_hashes(texts: pd.Series, k: int,
                             hash_mod: int | None = None,
                             with_grams: bool = False,
                             with_hashes: bool = True):
    """(row_idx, token_pos, uint64 hash) for every k-token window.

    Same tokenization + shift-concat construction as
    neardup._shingle_hashes, but keeps the window's start position so
    callers can map hashes back to token spans. ``with_grams=True``
    additionally returns the window STRINGS (exact-mode verification
    needs them); None otherwise. ``with_hashes=False`` skips the hash
    fold (the exact trim pass matches strings only) and returns a
    zeros placeholder of the right length."""
    words = texts.str.split()
    counts = words.str.len().fillna(0).to_numpy(dtype=np.int64)
    flat = words.explode(ignore_index=True).dropna().reset_index(drop=True)
    n = len(flat)
    row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    if n == 0:
        empty_grams = pd.Series([], dtype=object) if with_grams else None
        return (np.array([], dtype=np.int64),) * 2, np.array(
            [], dtype=np.uint64), counts, flat, row, empty_grams
    parts = [flat]
    valid = np.ones(n, dtype=bool)
    for j in range(1, k):
        parts.append(flat.shift(-j))
        v = np.zeros(n, dtype=bool)
        v[:-j] = row[:-j] == row[j:]
        valid &= v
    sh = parts[0].str.cat(parts[1:], sep=" ") if k > 1 else flat
    keep = valid & sh.notna().to_numpy()
    if with_hashes:
        h = hash_column(sh[keep])
        if hash_mod is not None:  # collision injection (tests only)
            h = h % np.uint64(hash_mod)
    else:
        h = np.zeros(int(keep.sum()), dtype=np.uint64)
    grams = sh[keep].reset_index(drop=True) if with_grams else None
    return (row[keep], pos[keep]), h, counts, flat, row, grams


def duplicated_ngram_hashes(docs_ds, k: int = DEFAULT_K,
                            min_docs: int = 2, text_col: str = "text",
                            hash_mod: int | None = None):
    """Dataset -> Dataset[(h: int64, n_docs: int64)] of k-gram hashes
    occurring in >= min_docs distinct documents."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pandas()
        (row, _pos), h, *_ = _positional_ngram_hashes(
            texts, k, hash_mod)
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


def confirmed_dup_grams(docs_ds, cand_ref, k: int, min_docs: int,
                        text_col: str, hash_mod: int | None = None):
    """Exact-mode verification pass: (gram, n_docs) for every k-gram
    whose hash is in the broadcast candidate set AND which truly
    occurs in >= min_docs docs by STRING identity. Only candidate
    windows (the already-rare repeated fraction) ship their text into
    the shuffle; every occurrence of one gram shares one hash, so
    candidate-flagging is uniform per gram and the counts are exact."""
    import ray
    from ray.data.aggregate import Sum

    class _Partial:
        def __init__(self):
            self.cand = ray.get(cand_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table({"gram": pa.array([], pa.string()),
                              "n": pa.array([], pa.int64())})
            if len(self.cand) == 0:   # before any tokenization work
                return empty
            texts = t.column(text_col).to_pandas()
            (row, _pos), h, _counts, _flat, _tok_row, grams = \
                _positional_ngram_hashes(texts, k, hash_mod,
                                         with_grams=True)
            if len(h) == 0:
                return empty
            idx = np.searchsorted(self.cand, h)
            idx[idx == len(self.cand)] = 0
            flagged = self.cand[idx] == h
            d = pd.DataFrame({"r": row[flagged],
                              "gram": grams[flagged]}).drop_duplicates()
            g = d.groupby("gram", sort=False).size()
            # explicit string type: an all-unflagged batch's empty
            # index would otherwise infer pa.null() and mix schemas
            return pa.table({"gram": pa.array(g.index, pa.string()),
                             "n": pa.array(g.to_numpy().astype(np.int64))})

    from ner_ray.util.pools import auto_pool

    # full re-tokenize pass over every document — size the pool from
    # the CPU budget (a fixed cap was the measured curate-chain
    # bottleneck for exactly this per-doc-heavy stage shape)
    return docs_ds.map_batches(_Partial, batch_format="pyarrow",
                               concurrency=auto_pool(), num_cpus=1) \
        .groupby("gram").aggregate(Sum("n", alias_name="n_docs")) \
        .filter(expr=f"n_docs >= {int(min_docs)}")


def remove_repeated_spans(docs_ds, k: int = DEFAULT_K, min_docs: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_broadcast_hashes: int = MAX_BROADCAST_HASHES,
                          hash_mod: int | None = None,
                          exact: bool = False,
                          max_broadcast_bytes: int = 1 << 29):
    """Rewrite ``text_col`` with every globally-repeated k-token
    window removed (union of covering windows); adds
    ``removed_tokens`` (int64) per doc. Two passes over the corpus:
    one counting shuffle of scalar pairs, one broadcast map.

    ``exact=True`` adds a verification pass that confirms each
    candidate hash by its gram STRING (per-doc-distinct string counts
    >= min_docs), then trims by string membership — COLLISION-FREE
    (Lee et al.'s ExactSubstr semantics at window granularity, no
    over-trim even under adversarial hash collisions) at the cost of
    (a) one extra corpus pass shuffling only candidate-window text and
    (b) a gram-STRING broadcast bounded by ``max_broadcast_bytes``
    (default 512 MB; the operator RAISES over the cap with the same
    shard-by-partition guidance as the hash path). Hashed mode remains
    the scale default: its false-trim rate is ~G²/2^65 (module
    docstring), while exact mode suits corpora whose confirmed
    dup-gram set fits the broadcast budget."""
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

    conf_ref = None
    if exact and len(dup_sorted):   # no candidates -> identity trim
        conf = confirmed_dup_grams(docs_ds, ref, k, min_docs, text_col,
                                   hash_mod).materialize()
        # enforce the byte cap DISTRIBUTIVELY, before any gram string
        # reaches the driver — the guard must not itself OOM
        total_bytes = 4 * int(conf.map_batches(
            lambda t: pa.table({"b": pa.array(
                [int(pc.sum(pc.utf8_length(t.column("gram"))).as_py()
                     or 0)], pa.int64())}),
            batch_format="pyarrow").sum("b") or 0)  # UCS4 bound
        if total_bytes > max_broadcast_bytes:
            raise ValueError(
                f"remove_repeated_spans(exact=True): confirmed dup-gram "
                f"strings need ~{total_bytes} bytes > max_broadcast_bytes="
                f"{max_broadcast_bytes}; shard the run by corpus "
                "partition or fall back to the hashed mode (false-trim "
                "rate documented in the module docstring)")
        gparts = [b.column("gram").to_pandas()
                  for b in conf.iter_batches(batch_format="pyarrow",
                                             batch_size=None)]
        grams_all = pd.concat(gparts, ignore_index=True) if gparts \
            else pd.Series([], dtype=object)
        conf_ref = ray.put(pd.Index(grams_all))

    class _Trim:
        def __init__(self):
            self.dup = ray.get(ref)
            self.conf = ray.get(conf_ref) if conf_ref is not None else None

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pandas()
            exact_mode = self.conf is not None
            # exact mode matches strings, so the per-window hash fold
            # would be dead work on the hot trim pass — skip it
            (row, pos), h, counts, flat, tok_row, grams = \
                _positional_ngram_hashes(texts, k, hash_mod,
                                         with_grams=exact_mode,
                                         with_hashes=not exact_mode)
            n_tok = len(flat)
            if n_tok == 0 or len(self.dup) == 0:
                out = t.set_column(
                    t.schema.get_field_index(text_col), text_col,
                    t.column(text_col))
                return out.append_column(
                    "removed_tokens",
                    pa.array(np.zeros(len(t), np.int64)))
            if self.conf is not None:
                # exact string membership: zero collisions possible
                flagged = self.conf.get_indexer(grams) >= 0
            else:
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

    # per-doc-heavy (full re-tokenize + window union per doc): size the
    # pool from the CPU budget like the verify pass — a fixed cap here
    # serializes the whole-corpus trim pass on a big cluster
    from ner_ray.util.pools import auto_pool

    return docs_ds.map_batches(_Trim, batch_format="pyarrow",
                               concurrency=auto_pool(), num_cpus=1)
