"""Distributed BPE tokenizer learning + encoding (Sennrich, Haddow &
Birch, ACL 2016 — the public byte-pair-encoding recipe every open LLM
tokenizer descends from). Closes the loop on the corpus token-budget
operators: instead of whitespace tokens, budgets/packing/chunking can
run on a vocabulary LEARNED from the corpus itself.

Scale shape (the standard decomposition):
* word counting is the distributed part — per-batch (word, count)
  group-bys shuffle only scalar pairs, one groupby(word).sum reduces,
  and the learner consumes the TOP ``max_words`` frequency table
  (weighted-coverage cap, dropped mass LOGGED — at web scale the
  distinct-word tail is unbounded but its count mass is negligible);
* the merge loop itself is inherently sequential (merge i+1 depends on
  i) and runs on the driver over the word-count table — vocab-sized,
  never corpus-sized — with incremental pair-count maintenance;
* encoding is map-only: the merge ranks broadcast once via ``ray.put``;
  each batch factorizes to UNIQUE words, encodes each unique once
  (per-actor memo cache across batches), and gathers — the per-word
  greedy merge loop is bounded by word length, never corpus length.

Determinism: merge ties break on (count desc, pair lexicographic), so
the learned vocabulary is a pure function of the corpus bag of words —
identical on any cluster size / layout / retry.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

END = "</w>"  # end-of-word marker (Sennrich's convention)


def word_counts(ds, text_col: str = "text", max_words: int = 5_000_000,
                lowercase: bool = False) -> pd.DataFrame:
    """Corpus word-frequency table (top ``max_words`` by count, ties by
    word), as a driver DataFrame [word, n]. Only (word, count) scalar
    pairs shuffle; the cap's dropped count mass is logged."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        if lowercase:
            txt = pc.utf8_lower(txt)
        s = pc.fill_null(txt, "").to_pandas()
        flat = s.str.split().explode().dropna()
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = flat.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(), pa.string()),
                         "n": pa.array(vc.to_numpy(dtype=np.int64))})

    # materialize the REDUCED table (vocab-sized, never corpus-sized):
    # it is consumed twice (top-K + total-mass log)
    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n")) \
        .materialize()
    head = counts.sort(["n", "word"], descending=[True, False]) \
        .limit(max_words).to_pandas()
    total = counts.sum("n") or 0
    kept = int(head["n"].sum())
    if kept < total:
        logger.warning(
            "word_counts: max_words=%d kept %d/%d token mass (%.4f); "
            "raise max_words if the tail matters", max_words, kept,
            total, kept / max(total, 1))
    return head


def learn_bpe(ds=None, vocab_size: int = 1000, text_col: str = "text",
              max_words: int = 5_000_000, lowercase: bool = False,
              counts: pd.DataFrame | None = None) -> dict:
    """Learn BPE merges until the symbol vocabulary reaches
    ``vocab_size`` (or no pair repeats). Pass ``counts`` (a [word, n]
    frame, e.g. persisted from a previous run) to skip the counting
    pass. Returns {"merges": [(a, b), ...], "vocab": sorted symbols}.

    Driver-side loop with incremental pair-count maintenance: each
    merge touches only the words containing the merged pair (indexed),
    and the argmax comes from a lazy max-heap (stale entries verified
    against the live count on pop), so the loop is
    O(merges x affected-words x log pairs), not O(merges x all-pairs).
    """
    import heapq
    if counts is None:
        if ds is None:
            raise ValueError("learn_bpe needs ds or counts")
        counts = word_counts(ds, text_col=text_col, max_words=max_words,
                             lowercase=lowercase)
    words = [tuple(w) + (END,) for w in counts["word"].tolist()]
    freqs = counts["n"].to_numpy(dtype=np.int64).tolist()

    # pair -> total count; pair -> set of word indexes containing it
    pair_counts: dict = {}
    pair_words: dict = {}
    for i, (syms, f) in enumerate(zip(words, freqs)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(i)

    vocab = set(s for w in words for s in w)
    merges: list[tuple[str, str]] = []
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    while len(vocab) < vocab_size and heap:
        negc, (a, b) = heapq.heappop(heap)
        live = pair_counts.get((a, b))
        if live is None or -negc != live:   # stale heap entry
            if live is not None:
                heapq.heappush(heap, (-live, (a, b)))
            continue
        cnt = live
        if cnt < 2:
            break
        merges.append((a, b))
        new_sym = a + b
        vocab.add(new_sym)
        for i in list(pair_words.get((a, b), ())):
            syms, f = words[i], freqs[i]
            # remove old pair contributions of this word
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del pair_words[p]
            # apply the merge left-to-right
            out, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == a
                        and syms[j + 1] == b):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = tuple(out)
            words[i] = syms
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(i)
                # push so brand-new pairs are reachable; stale
                # duplicates are verified (and discarded) on pop
                heapq.heappush(heap, (-pair_counts[p], p))
    return {"merges": merges, "vocab": sorted(vocab),
            "lowercase": lowercase}


def _encode_word(word: str, ranks: dict) -> tuple[str, ...]:
    """Greedy lowest-rank merge loop for ONE word (bounded by word
    length; callers memoize per unique word)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


class BpeEncoder:
    """Actor-pool encode stage: merge ranks built once per actor in
    ``__init__`` (from the broadcast model ref); the per-unique-word
    memo cache persists across batches but is CAPPED — the distinct-
    word tail is unbounded at web scale (the reason word_counts caps),
    so past ``max_cache`` entries new words encode uncached (the Zipf
    head is admitted early and keeps its hits)."""

    def __init__(self, model_ref, text_col: str = "text",
                 out_col: str = "bpe_tokens",
                 lowercase: bool | None = None,
                 max_cache: int = 1_000_000):
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.ranks = {pair: i for i, pair in enumerate(model["merges"])}
        self.text_col, self.out_col = text_col, out_col
        # default to the case handling the model was TRAINED with —
        # a mismatch silently shatters words to near-character level
        self.lowercase = (model.get("lowercase", False)
                          if lowercase is None else lowercase)
        self.cache: dict = {}
        self.max_cache = max_cache

    def _tokens_for(self, word: str) -> tuple[str, ...]:
        got = self.cache.get(word)
        if got is None:
            got = _encode_word(word, self.ranks)
            if len(self.cache) < self.max_cache:
                self.cache[word] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        txt = t.column(self.text_col)
        if self.lowercase:
            txt = pc.utf8_lower(txt)
        s = pc.fill_null(txt, "").to_pandas()
        words = s.str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        flat = words.explode().dropna()
        if len(flat):
            codes, uniq = pd.factorize(flat)
            uniq_toks = [self._tokens_for(w) for w in uniq]
            per_word = [uniq_toks[c] for c in codes]
        else:
            per_word = []
        # regroup word token-tuples into one flat list per row
        row_tokens, pos = [], 0
        for n in lens:
            toks: list = []
            for k in range(n):
                toks.extend(per_word[pos + k])
            row_tokens.append(toks)
            pos += n
        return t.append_column(
            self.out_col, pa.array(row_tokens, pa.list_(pa.string())))


def bpe_encode(ds, model: dict, text_col: str = "text",
               out_col: str = "bpe_tokens",
               lowercase: bool | None = None, concurrency=None):
    """Append a list<string> BPE-token column. The model broadcasts
    once; encoding is a stateful actor-pool map (cache in __init__).
    ``concurrency`` defaults to a CPU-budget-sized pool."""
    import ray

    if concurrency is None:
        from ner_ray.util.pools import auto_pool

        concurrency = auto_pool()
    ref = ray.put(model)
    return ds.map_batches(
        BpeEncoder, fn_constructor_kwargs={
            "model_ref": ref, "text_col": text_col, "out_col": out_col,
            "lowercase": lowercase},
        batch_format="pyarrow", concurrency=concurrency)


def bpe_token_count(ds, model: dict, text_col: str = "text",
                    count_col: str = "bpe_len", **kw):
    """Token-count-only variant (the packing / budget input): same
    encode path, emits just the per-doc BPE token count."""
    enc = bpe_encode(ds, model, text_col=text_col, out_col="_bpe", **kw)

    def shrink(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(t.column("_bpe"))
        return t.drop_columns(["_bpe"]).append_column(
            count_col, pc.cast(n, pa.int64()))

    return enc.map_batches(shrink, batch_format="pyarrow")
