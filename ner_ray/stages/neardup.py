"""Near-duplicate detection suite (training-data pipeline operators):

* exact dedup        — content hash -> two-phase groupby (D3 pattern)
* MinHash + LSH      — shingle -> minhash signature -> banded buckets
                       -> candidate pairs -> exact-Jaccard verify
* SimHash            — 64-bit simhash -> 4x16-bit band buckets ->
                       Hamming-verify candidates
* n-gram Jaccard     — vectorized set-overlap verification
* near_dedup_docs    — pairs -> connected components -> keep min-id
                       representative -> anti-filter (corpus REMOVAL,
                       size-dispatched broadcast/bucketed anti)

Candidate generation shuffles only (band_hash, doc_id) pairs or
partial aggregates, never raw documents; the verify stage joins the
(small) candidate set back to the docs table, so only candidate rows'
texts ever move. Signatures use the seed-stable hash (never Python
hash()), so runs are reproducible across processes.
"""

from __future__ import annotations

import logging
import math
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.util.hashing import (
    hash_column,
    hash_columns,
    portable_text_hash,
    to_bucket,
)

_LOG = logging.getLogger(__name__)


def to_bucket_cols(t: pa.Table, cols: list[str], n_buckets: int) -> np.ndarray:
    """Hash bucket of a column tuple (coarse shuffle key)."""
    return to_bucket(hash_columns(*[t.column(c) for c in cols]), n_buckets)

N_HASHES = 64
N_BANDS = 16          # 16 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = np.uint64((1 << 61) - 1)

# shuffle-group payload target for auto-sized bucket counts: each
# groupby(bucket) group should hold ~this much data so one worker's
# heap bounds the group regardless of corpus size
TARGET_GROUP_BYTES = 128 << 20


def _cheap_size_bytes(ds) -> int | None:
    """ds.size_bytes() ONLY when it costs metadata, not execution:
    materialized datasets and bare read roots. Lazy transformed chains
    return None (callers fall back to the floor) rather than silently
    executing the upstream once just to size buckets."""
    try:
        if ds._plan.has_computed_output():
            return ds.size_bytes()
        dag = ds._logical_plan.dag
        if not dag.input_dependencies and dag.name.startswith("Read"):
            return ds.size_bytes()
    except Exception:
        pass
    return None


def _auto_buckets(ds, target_bytes: int = TARGET_GROUP_BYTES,
                  lo: int = 16, hi: int = 1 << 16) -> int:
    """Bucket count sized from the dataset's bytes so each hash-bucket
    group carries ~``target_bytes`` of payload — a constant default
    (the old 64) makes every group hold corpus/64 bytes, which at
    100 TB is ~1.5 TB on one worker. The size probe is metadata-only
    (materialized / read-rooted inputs — the shapes every in-repo
    caller passes); a lazy transformed chain gets the floor — pass an
    explicit num_buckets there."""
    size = _cheap_size_bytes(ds)
    if not size:
        return lo
    return int(min(hi, max(lo, math.ceil(size / target_bytes))))


def _rng_coeffs(seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=N_HASHES, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=N_HASHES, dtype=np.uint64)
    return a, b


_A, _B = _rng_coeffs()


def _shingle_hashes(texts: pd.Series, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k-word shingles -> stable uint64 hashes. Returns (row_idx, hash)."""
    words = texts.str.split()
    counts = words.str.len().fillna(0).to_numpy(dtype=np.int64)
    flat = words.explode(ignore_index=True).dropna().reset_index(drop=True)
    n = len(flat)
    row = np.repeat(np.arange(len(texts)), counts)
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.uint64)
    parts = [flat]
    valid = np.ones(n, dtype=bool)
    for j in range(1, k):
        parts.append(flat.shift(-j))
        v = np.zeros(n, dtype=bool)
        v[:-j] = row[:-j] == row[j:]
        valid &= v
    sh = parts[0].str.cat(parts[1:], sep=" ")
    keep = valid & sh.notna().to_numpy()
    # portable hash (code-point FNV + splitmix): shingle/minhash/simhash
    # decisions become engine-recomputable (the DuckDB oracle replays
    # them bit-exactly — q_neardup_pairs), and it benches FASTER than
    # the pandas SipHash kernel on short strings. Note: a PERSISTED
    # minhash index (incdedup) built before this hash is invalid.
    # Repeated shingles are hashed once (factorize -> uniques -> gather).
    codes, uniq = pd.factorize(sh[keep], sort=False)
    return row[keep], portable_text_hash(pd.Series(uniq))[codes]


def minhash_signatures(texts: pd.Series, k: int = 3) -> np.ndarray:
    """(n_docs, N_HASHES) uint64 minhash signature matrix."""
    row, h = _shingle_hashes(texts, k)
    sig = np.full((len(texts), N_HASHES), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    if len(h) == 0:
        return sig
    # row is nondecreasing by construction (np.repeat(arange) filtered
    # order-preservingly), so per-doc minima come from minimum.reduceat
    # over segment starts — far cheaper than unbuffered np.minimum.at
    starts = np.concatenate(
        [[0], np.nonzero(np.diff(row))[0] + 1]).astype(np.int64)
    seg_rows = row[starts]
    # h_i(x) = (a_i * x + b_i) mod M  (multiply-shift family)
    for i in range(N_HASHES):
        hv = (h * _A[i] + _B[i]) % _MERSENNE
        sig[seg_rows, i] = np.minimum.reduceat(hv, starts)
    return sig


def minhash_band_rows(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Explode each doc into N_BANDS (band_id, band_hash) rows — the
    shuffle payload for LSH bucketing."""
    texts = batch.column(text_col).to_pandas()
    sig = minhash_signatures(texts)
    n = len(texts)
    # docs with zero shingles all share the all-sentinel signature ->
    # one degenerate O(m^2) bucket; drop them before banding
    has_shingles = sig[:, 0] != np.iinfo(np.uint64).max
    band_hash = np.empty((n, N_BANDS), dtype=np.uint64)
    for bnd in range(N_BANDS):
        seg = sig[:, bnd * ROWS_PER_BAND:(bnd + 1) * ROWS_PER_BAND]
        acc = np.full(n, 0x9E3779B97F4A7C15, dtype=np.uint64)
        for c in range(ROWS_PER_BAND):
            acc = (acc ^ seg[:, c]) * np.uint64(0x100000001B3)
        band_hash[:, bnd] = acc
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    keep = np.repeat(has_shingles, N_BANDS)
    return pa.table({
        "band_id": pa.array(
            np.tile(np.arange(N_BANDS, dtype=np.int32), n)[keep]),
        # int64 view: native Arrow shuffle key (see exact_dedup note)
        "band_hash": pa.array(band_hash.reshape(-1).view(np.int64)[keep]),
        "doc_id": pa.array(np.repeat(ids, N_BANDS)[keep]),
    })


# pair-listing buckets larger than this emit star edges + a warning
# instead of all-pairs (no-silent-caps: the overflow is logged with the
# exact pair count forgone)
MAX_BUCKET_PAIR_MEMBERS = 10_000


def _make_bucket_pairs(pair_mode: str = "all",
                       max_bucket_size: int | None = None):
    """Candidate-pair emitter for one LSH bucket.

    ``pair_mode="all"``: triu all-pairs — O(m^2), complete pair
    LISTING, but a viral near-dup family (a boilerplate page
    templated 10M times survives exact dedup) makes one bucket emit
    5e13 pairs on one worker. Buckets over ``max_bucket_size`` fall
    back to star edges with a logged overflow so the listing use-case
    degrades loudly, never silently and never quadratically.

    ``pair_mode="star"``: (min_id, other) edges only — O(m), the
    REMOVAL-sufficient spanning set: connected components need any
    spanning subgraph of each bucket, and every emitted edge still
    passes the exact verify stage downstream. Recall caveat (documented
    at near_dedup_docs): a bucket member pair (b, c) that is similar
    while the bucket min a is similar to neither loses its edge — that
    requires b and c to share a full signature band with a dissimilar
    smaller doc yet share none of their own, which the verify tests
    bound on fixtures.
    """
    if pair_mode not in ("all", "star"):
        raise ValueError(f"pair_mode must be 'all' or 'star': {pair_mode!r}")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        m = len(ids)
        if m < 2:
            # empty frame MUST keep the id dtype: a bare [] would be
            # float64 and force schema unification against int64 groups
            return pd.DataFrame({"doc_a": ids[:0], "doc_b": ids[:0]})
        star = pair_mode == "star"
        if not star and max_bucket_size is not None and m > max_bucket_size:
            _LOG.warning(
                "LSH bucket overflow: %d members > cap %d; emitting %d "
                "star edges instead of %d all-pairs (pair listing is "
                "incomplete for this bucket; removal via connected "
                "components is unaffected)",
                m, max_bucket_size, m - 1, m * (m - 1) // 2)
            star = True
        if star:
            return pd.DataFrame({"doc_a": np.repeat(ids[0], m - 1),
                                 "doc_b": ids[1:]})
        i, j = np.triu_indices(m, k=1)
        return pd.DataFrame({"doc_a": ids[i], "doc_b": ids[j]})

    return fn


def _distinct_pairs(pairs_ds, a_col: str, b_col: str, aggs=()):
    """Distinct (a, b) pairs via ONE fused int64 hash key instead of a
    multi-key groupby — Ray 2.49's multi-key sort-aggregate is ~25x
    slower (337 s vs 13 s on 3.2M pair rows at 32 CPUs, measured).
    Hash equality stands in for pair identity, the same contract
    exact_dedup already uses for text identity (64-bit stable hash;
    collision odds ~2^-64 per pair-pair). A collision would put two
    DISTINCT pairs in one group, where a bare Min-carry could emit a
    row mixing fields of both (a fabricated pair); carrying Min AND
    Max per id column and dropping groups where they disagree turns
    that into a dropped candidate — an epsilon recall loss, never a
    wrong answer. ``aggs`` are extra ray.data aggregates per pair.

    Map-side combiner: with no extra ``aggs``, each batch pre-dedups
    on the fused key before the shuffle (one surviving row per key per
    batch — a whole valid row, so the collision contract above is
    unchanged), cutting shuffle volume by the within-batch duplication
    factor (10x on the bench's edge projection). With ``aggs`` the raw
    rows must reach the aggregate, so the combiner is skipped."""
    from ray.data.aggregate import Max, Min

    def keyed(t: pa.Table) -> pa.Table:
        k = hash_columns(t.column(a_col), t.column(b_col)).view(np.int64)
        t = t.append_column("_k", pa.array(k))
        if not aggs and len(t):
            _, first = np.unique(k, return_index=True)
            if len(first) < len(t):
                t = t.take(pa.array(np.sort(first)))
        return t

    out_cols = [a_col, b_col] + [a.name for a in aggs]

    def drop_collisions(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(pc.equal(t.column(a_col), t.column("_amax")),
                       pc.equal(t.column(b_col), t.column("_bmax")))
        return t.filter(mask).select(out_cols)

    return pairs_ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby("_k").aggregate(
            Min(a_col, alias_name=a_col), Min(b_col, alias_name=b_col),
            Max(a_col, alias_name="_amax"), Max(b_col, alias_name="_bmax"),
            *aggs) \
        .map_batches(drop_collisions, batch_format="pyarrow")


def _ragged_arange(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated [start, start+count) ranges, fully vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.array([], dtype=np.int64)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
            + np.repeat(starts, counts))


def _pair_indices(sizes: np.ndarray, all_mask: np.ndarray):
    """(a_idx, b_idx) pair index arrays into the flattened, sorted
    element order of consecutive groups with the given ``sizes``:
    triu all-pairs for groups flagged in ``all_mask``, star edges
    (group-min to each other member) otherwise. Vectorized across ALL
    groups — no per-group Python call (the per-singleton-group
    map_groups overhead dominated the old path: ~1 ms/group x 1e5
    near-singleton band buckets)."""
    sizes = np.asarray(sizes, dtype=np.int64)
    offsets = np.cumsum(sizes) - sizes
    out_a, out_b = [], []
    sm = (~all_mask) & (sizes >= 2)
    if sm.any():
        s, o = sizes[sm], offsets[sm]
        out_a.append(np.repeat(o, s - 1))
        out_b.append(_ragged_arange(o + 1, s - 1))
    am = all_mask & (sizes >= 2)
    if am.any():
        s, o = sizes[am], offsets[am]
        elem = _ragged_arange(o, s)                   # global elem idx
        per_elem = np.repeat(o + s - 1, s) - elem     # pairs per elem
        out_a.append(np.repeat(elem, per_elem))
        out_b.append(_ragged_arange(elem + 1, per_elem))
    if not out_a:
        return (np.array([], dtype=np.int64),) * 2
    return np.concatenate(out_a), np.concatenate(out_b)


def _group_sizes(*key_arrays) -> tuple[np.ndarray, np.ndarray]:
    """(sizes, group_start_flags) of consecutive runs over pre-sorted
    parallel key arrays."""
    n = len(key_arrays[0])
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=bool)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in key_arrays:
        new[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    return sizes, new


def _bucketed_pair_emitter(key_cols: list[str], pair_mode: str,
                           max_bucket_size: int | None,
                           with_hamming: int | None = None):
    """map_groups fn over a COARSE hash bucket of band keys: finds the
    per-(key) groups with one vectorized boundary pass and emits their
    candidate pairs via _pair_indices — thousands of bands per Python
    call instead of one call per band. Semantics identical to
    _make_bucket_pairs (the per-group reference kept for tests).
    ``with_hamming``: also compute per-pair Hamming distance over a
    ``simhash`` column and keep pairs <= the given bound."""
    if pair_mode not in ("all", "star"):
        raise ValueError(f"pair_mode must be 'all' or 'star': {pair_mode!r}")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        cols = [*key_cols, "doc_id"]
        d = g.drop_duplicates(cols).sort_values(cols, kind="stable")
        keys = [d[c].to_numpy() for c in key_cols]
        sizes, _ = _group_sizes(*keys)
        if pair_mode == "star":
            all_mask = np.zeros(len(sizes), dtype=bool)
        elif max_bucket_size is None:
            all_mask = np.ones(len(sizes), dtype=bool)
        else:
            all_mask = sizes <= max_bucket_size
            over = sizes[~all_mask]
            if len(over):
                _LOG.warning(
                    "LSH bucket overflow: %d bucket(s) over cap %d "
                    "(sizes %s); emitting %d star edges instead of %d "
                    "all-pairs (pair listing incomplete there; removal "
                    "via connected components unaffected)",
                    len(over), max_bucket_size, over[:5].tolist(),
                    int((over - 1).sum()),
                    int((over * (over - 1) // 2).sum()))
        a_idx, b_idx = _pair_indices(sizes, all_mask)
        docs = d["doc_id"].to_numpy()
        out = pd.DataFrame({"doc_a": docs[a_idx], "doc_b": docs[b_idx]})
        if with_hamming is not None:
            sig = d["simhash"].to_numpy().astype(np.uint64)
            x = sig[a_idx] ^ sig[b_idx]
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            out["hamming"] = ham
            out = out[out["hamming"] <= with_hamming]
        return out

    return fn


# coarse pair-stage buckets: enough groups for full-cluster
# parallelism without per-band map_groups overhead
PAIR_STAGE_MIN_BUCKETS = 64


def _pair_stage_buckets(docs_ds) -> int:
    return max(PAIR_STAGE_MIN_BUCKETS, _auto_buckets(docs_ds))


def lsh_candidate_pairs(docs_ds, text_col: str = "text",
                        pair_mode: str = "all",
                        max_bucket_size: int | None =
                        MAX_BUCKET_PAIR_MEMBERS,
                        num_buckets: int | None = None):
    """docs -> candidate near-dup pairs via banded minhash buckets.
    ``pair_mode``/``max_bucket_size``: see _make_bucket_pairs — "star"
    is the O(m)-per-bucket spanning set for corpus REMOVAL; "all" is
    the complete pair listing, capped (with a logged overflow) so one
    viral dup family cannot emit O(m^2) pairs on one worker. The
    shuffle groups by a COARSE hash bucket of the band key (not the
    band key itself): band buckets are near-singletons, and one
    map_groups call per band costs ~1 ms of pandas overhead each —
    bucketing lets one call emit pairs for thousands of bands
    vectorized (10x on a 5k-doc corpus, measured)."""
    if num_buckets is None:
        num_buckets = _pair_stage_buckets(docs_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = to_bucket_cols(t, ["band_id", "band_hash"], num_buckets)
        return t.append_column("_bk", pa.array(b))

    bands = docs_ds.map_batches(
        lambda t: add_bucket(minhash_band_rows(t, text_col)),
        batch_format="pyarrow")
    pairs = bands.groupby("_bk").map_groups(
        _bucketed_pair_emitter(["band_id", "band_hash"], pair_mode,
                               max_bucket_size),
        batch_format="pandas")
    # distinct pairs (same pair can fire in many bands)
    from ray.data.aggregate import Count

    return _distinct_pairs(pairs, "doc_a", "doc_b",
                           aggs=(Count(alias_name="n_bands"),))


def verify_jaccard(pairs_df: pd.DataFrame, texts_by_id: dict,
                   k: int = 3, threshold: float = 0.7) -> pd.DataFrame:
    """Exact shingle-Jaccard for candidate pairs (vectorized set ops
    via explode+merge). texts_by_id is the broadcast doc->text map
    restricted to candidate docs (small by construction)."""
    if pairs_df.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    ids = sorted(set(pairs_df["doc_a"]) | set(pairs_df["doc_b"]))
    texts = pd.Series([texts_by_id[i] for i in ids], dtype=object)
    row, h = _shingle_hashes(texts, k)
    sets = pd.DataFrame({"row": row, "h": h}).drop_duplicates()
    sizes = sets.groupby("row")["h"].size()
    id_to_row = {d: i for i, d in enumerate(ids)}
    ra = pairs_df["doc_a"].map(id_to_row).to_numpy()
    rb = pairs_df["doc_b"].map(id_to_row).to_numpy()
    a_sets = sets.rename(columns={"row": "ra"})
    b_sets = sets.rename(columns={"row": "rb"})
    pair_df = pd.DataFrame({"pair": np.arange(len(ra)), "ra": ra, "rb": rb})
    inter = (
        pair_df.merge(a_sets, on="ra")
        .merge(b_sets, on=["rb", "h"])
        .groupby("pair")["h"].size()
    )
    na = sizes.reindex(ra).fillna(0).to_numpy()
    nb = sizes.reindex(rb).fillna(0).to_numpy()
    inter_full = np.zeros(len(ra))
    inter_full[inter.index.to_numpy()] = inter.to_numpy()
    union = na + nb - inter_full
    jac = np.where(union > 0, inter_full / np.maximum(union, 1), 0.0)
    out = pairs_df.copy()
    out["jaccard"] = np.round(jac, 6)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def pairwise_jaccard_batch(df: pd.DataFrame, k: int = 3,
                           text_a: str = "text_a",
                           text_b: str = "text_b") -> pd.DataFrame:
    """Vectorized per-row shingle Jaccard between two text columns.
    Each row is one candidate pair; no cross-row state, so this is a
    pure batch kernel (safe inside map_batches at any scale)."""
    n = len(df)
    if n == 0:
        return pd.DataFrame({"doc_a": df.get("doc_a", pd.Series([])),
                             "doc_b": df.get("doc_b", pd.Series([])),
                             "jaccard": pd.Series([], dtype="float64")})
    ra, ha = _shingle_hashes(df[text_a].reset_index(drop=True), k)
    rb, hb = _shingle_hashes(df[text_b].reset_index(drop=True), k)
    sa = pd.DataFrame({"row": ra, "h": ha}).drop_duplicates()
    sb = pd.DataFrame({"row": rb, "h": hb}).drop_duplicates()
    na = sa.groupby("row").size().reindex(range(n), fill_value=0).to_numpy()
    nb = sb.groupby("row").size().reindex(range(n), fill_value=0).to_numpy()
    inter = sa.merge(sb, on=["row", "h"]).groupby("row").size() \
        .reindex(range(n), fill_value=0).to_numpy()
    union = (na + nb - inter).astype(np.float64)
    jac = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
    return pd.DataFrame({"doc_a": df["doc_a"].to_numpy(),
                         "doc_b": df["doc_b"].to_numpy(),
                         "jaccard": np.round(jac, 6)})


MAX_DRIVER_VERIFY_PAIRS = 100_000


def minhash_near_dups(docs_ds, text_col: str = "text", k: int = 3,
                      threshold: float = 0.7,
                      num_partitions: int | None = None,
                      max_driver_verify_pairs: int = MAX_DRIVER_VERIFY_PAIRS,
                      pair_mode: str = "all",
                      max_bucket_size: int | None =
                      MAX_BUCKET_PAIR_MEMBERS):
    """Full MinHash-LSH near-dup pipeline with a verify-size dispatch
    (SURVEY.md §2.7 D4; same shape as canon.canonicalize):

    * candidate count <= ``max_driver_verify_pairs``: the docs scan
      stays DISTRIBUTED (broadcast key-set semi-filter, no shuffle) and
      only the candidate docs' texts — bounded by 2x the threshold —
      reach the driver for the vectorized Jaccard. Two fixed shuffle
      rounds cheaper than the join path; driver memory bounded by the
      threshold, never by corpus size.
    * larger: candidate pairs stay a Dataset and hash-join back to the
      docs table twice (doc_a then doc_b); exact shingle-Jaccard runs
      vectorized inside map_batches — nothing driver-side, candidate
      volume and doc count both unbounded."""
    cand = lsh_candidate_pairs(docs_ds, text_col, pair_mode=pair_mode,
                               max_bucket_size=max_bucket_size) \
        .select_columns(["doc_a", "doc_b"]).materialize()
    if cand.count() <= max_driver_verify_pairs:
        import ray
        import ray.data as rd

        pairs_df = cand.to_pandas()
        if pairs_df.empty:
            return rd.from_pandas(pd.DataFrame(
                {"doc_a": pd.Series([], dtype=object),
                 "doc_b": pd.Series([], dtype=object),
                 "jaccard": pd.Series([], dtype=float)}))
        need = pd.unique(pd.concat([pairs_df["doc_a"], pairs_df["doc_b"]]))
        keys_ref = ray.put(pa.array(sorted(need)))

        def pick(t: pa.Table) -> pa.Table:
            # stateless task pool: broadcast key set via object store,
            # no actor spin-up for a one-shot filter
            return t.filter(pc.is_in(t.column("doc_id"),
                                     value_set=ray.get(keys_ref)))

        picked = docs_ds.select_columns(["doc_id", text_col]) \
            .map_batches(pick, batch_format="pyarrow").to_pandas()
        texts = dict(zip(picked["doc_id"], picked[text_col]))
        verified = verify_jaccard(pairs_df, texts, k, threshold)
        return rd.from_pandas(verified) if len(verified) else \
            rd.from_pandas(pd.DataFrame(
                {"doc_a": pd.Series([], dtype=object),
                 "doc_b": pd.Series([], dtype=object),
                 "jaccard": pd.Series([], dtype=float)}))
    docs = docs_ds.select_columns(["doc_id", text_col])
    if num_partitions is None:
        # this join shuffles the docs TEXT payload: size partitions
        # from corpus bytes (~TARGET_GROUP_BYTES each) instead of a
        # constant — a fixed 8 makes each aggregator hold corpus/8
        # bytes at scale. Capped at the CPU budget: a Dataset.join
        # whose aggregators exceed available CPUs deadlocks the
        # streaming executor (functions/joins.clamp_join_partitions).
        from ner_ray.functions.joins import clamp_join_partitions

        num_partitions = clamp_join_partitions(
            max(8, _auto_buckets(docs_ds)))
    side_a = docs.map_batches(
        lambda t: t.rename_columns(["doc_a", "text_a"]),
        batch_format="pyarrow")
    side_b = docs.map_batches(
        lambda t: t.rename_columns(["doc_b", "text_b"]),
        batch_format="pyarrow")
    j = cand.join(side_a, join_type="inner",
                  num_partitions=num_partitions, on=("doc_a",))
    j = j.join(side_b, join_type="inner",
               num_partitions=num_partitions, on=("doc_b",))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out = pairwise_jaccard_batch(df, k)
        return out[out["jaccard"] >= threshold]

    return j.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------- simhash


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over word hashes (sign-sum of bit vectors)."""
    texts = batch.column(text_col).to_pandas()
    words = texts.str.split()
    counts = words.str.len().fillna(0).to_numpy(dtype=np.int64)
    flat = words.explode(ignore_index=True).dropna().reset_index(drop=True)
    row = np.repeat(np.arange(len(texts)), counts)
    acc = np.zeros((len(texts), 64), dtype=np.int64)
    if len(flat):
        # words repeat heavily (zipf): hash uniques once, expand the
        # ±1 bit matrix by gather
        codes, uniq = pd.factorize(flat, sort=False)
        h = portable_text_hash(pd.Series(uniq))  # engine-recomputable
        bits_u = ((h[:, None] >> np.arange(64, dtype=np.uint64)) &
                  np.uint64(1)).astype(np.int32) * 2 - 1
        bits = bits_u[codes]
        # per-doc sign-sums via cumsum differences over the sorted row
        # segments (np.add.at / reduceat over n_words x 64 were the
        # batch's hot spot; cumsum is one vectorized pass)
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(row))[0] + 1]).astype(np.int64)
        csum = np.cumsum(bits, axis=0, dtype=np.int64)
        ends = np.concatenate([starts[1:], [len(bits)]])
        tot = csum[ends - 1]
        tot[1:] -= csum[starts[1:] - 1]
        acc[row[starts]] = tot
    sim = (acc > 0).astype(np.uint64)
    sh = np.zeros(len(texts), dtype=np.uint64)
    for bit in range(64):
        sh |= sim[:, bit] << np.uint64(bit)
    return batch.append_column("simhash", pa.array(sh))


def _simhash_tables(max_hamming: int):
    """Block layout + table key schedule for EXACT Hamming<=k candidate
    generation with a wide (~32-bit) bucket keyspace.

    Generalizes the multi-table trick of Manku, Jain & Das Sarma,
    "Detecting Near-Duplicates for Web Crawling" (WWW 2007): split the
    64-bit simhash into 2k blocks; any <=k bit errors touch at most k
    blocks, leaving >=k clean ones, so keying one table on each
    distinct k-subset of blocks guarantees an exact key match in at
    least one table. Table count C(2k, k) (k=3 -> 20 tables), key
    width k * 64/(2k) = 32 bits — vs the old fixed 4x16-bit scheme
    whose 65,536-key band space fills with random non-dups at >=1e9
    docs (expected bucket ~N/65k -> O(m^2) verify blowup no parameter
    could fix). At 32-bit keys the expected random bucket is N/4e9.

    Hamming-ball probing was the alternative (enumerate key neighbors,
    as similarity.py's LSH index does for Hamming-1); the clean-subset
    schedule achieves the same guarantee with exact keys and fewer
    emitted rows (20/doc vs ~66/doc for ball-radius-1 over 2 blocks).

    Returns (tables, widths, offsets): tables = list of block-index
    tuples, widths/offsets = per-block bit geometry.
    """
    k = max(int(max_hamming), 0)
    if k == 0:      # exact signature equality: one full-width table
        return [(0,)], [64], [0]
    n_blocks = 2 * k
    base, extra = divmod(64, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    offsets = [0] * n_blocks
    for i in range(1, n_blocks):
        offsets[i] = offsets[i - 1] + widths[i - 1]
    tables = list(combinations(range(n_blocks), k))
    return tables, widths, offsets


def simhash_near_dups(docs_ds, max_hamming: int = 3,
                      pair_mode: str = "all",
                      max_bucket_size: int | None =
                      MAX_BUCKET_PAIR_MEMBERS,
                      num_buckets: int | None = None):
    """Hamming<=k near-dups via permuted clean-block-subset tables
    (_simhash_tables): candidate generation is EXACT (every pair within
    Hamming k shares a full table key by pigeonhole) and the bucket
    keyspace is ~2^32 per table, so buckets stay dup-only even at
    1e9+ docs. Verified by exact Hamming inside each bucket.
    ``pair_mode``/``max_bucket_size``: see _make_bucket_pairs. The
    shuffle groups by a coarse hash bucket of (table, key) — see
    lsh_candidate_pairs for why (near-singleton band groups make
    per-group map_groups calls the bottleneck)."""
    tables, widths, offsets = _simhash_tables(max_hamming)
    n_tables = len(tables)
    if num_buckets is None:
        num_buckets = _pair_stage_buckets(docs_ds)

    def bands(t: pa.Table) -> pa.Table:
        sh = t.column("simhash").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        # drop empty texts (simhash 0) — they'd form one degenerate
        # O(m^2) bucket in every band (Arrow kernels, no row loop)
        import pyarrow.compute as pc

        nonempty = pc.fill_null(
            pc.not_equal(pc.utf8_trim_whitespace(t.column("text")), ""),
            False).to_numpy(zero_copy_only=False).astype(bool)
        sh, ids = sh[nonempty], ids[nonempty]
        n = len(sh)
        sh_u = sh.astype(np.uint64)
        blocks = [(sh_u >> np.uint64(offsets[b]))
                  & np.uint64((1 << widths[b]) - 1)
                  for b in range(len(widths))]
        out_key = np.empty(n_tables * n, dtype=np.uint64)
        for ti, tbl in enumerate(tables):
            key = np.zeros(n, dtype=np.uint64)
            shift = 0
            for b in tbl:
                key |= blocks[b] << np.uint64(shift)
                shift += widths[b]
            out_key[ti::n_tables] = key
        out = pa.table({
            "band_id": pa.array(np.tile(
                np.arange(n_tables, dtype=np.int32), n)),
            # <=32-bit keys in an int64 column: native Arrow shuffle
            "band_key": pa.array(out_key.astype(np.int64)),
            "doc_id": pa.array(np.repeat(ids, n_tables)),
            "simhash": pa.array(np.repeat(sh, n_tables).view(np.int64)),
        })
        return out.append_column("_bk", pa.array(
            to_bucket_cols(out, ["band_id", "band_key"], num_buckets)))

    with_sig = docs_ds.map_batches(simhash_batch, batch_format="pyarrow")
    band_rows = with_sig.map_batches(bands, batch_format="pyarrow")

    pairs = band_rows.groupby("_bk").map_groups(
        _bucketed_pair_emitter(["band_id", "band_key"], pair_mode,
                               max_bucket_size,
                               with_hamming=max_hamming),
        batch_format="pandas")
    from ray.data.aggregate import Min

    return _distinct_pairs(pairs, "doc_a", "doc_b",
                           aggs=(Min("hamming", alias_name="hamming"),))


# ------------------------------------------------------- exact dedup


MAX_BROADCAST_DROPS = 2_000_000  # drop ids; above this, bucketed anti


def near_dedup_docs(docs_ds, method: str = "minhash",
                    text_col: str = "text", id_col: str = "doc_id",
                    pairs_ds=None, a_col: str = "doc_a",
                    b_col: str = "doc_b",
                    max_broadcast_drops: int = MAX_BROADCAST_DROPS,
                    num_buckets: int | None = None,
                    materialize: bool = True, **detector_kwargs):
    """Corpus-level near-duplicate REMOVAL — the operator a training-
    data pipeline actually wants on top of pair listing: detect pairs,
    cluster them into connected components, keep ONE representative per
    cluster (the min id — numeric order for integral id columns,
    lexicographic otherwise; deterministic either way), drop the rest.

    * ``method``: "minhash" | "simhash" | "embedding" (dispatches to
      the corresponding pair detector with ``detector_kwargs``), or
      pass precomputed ``pairs_ds`` with ``a_col``/``b_col`` key
      columns (e.g. winnow_dup_candidates output) and any method.
    * components reuse ``canon.canonicalize``'s size dispatch (driver
      union-find under 2M edges, distributed groupby-min label
      propagation above). Near-dup clusters can chain, so the
      propagation round bound applies: a pathological chain deeper
      than canon.MAX_ROUNDS raises rather than silently under-merging.
    * the final anti-filter dispatches by drop count: at or below
      ``max_broadcast_drops`` the drop-id set broadcasts and the corpus
      streams through an is_in filter (NO shuffle of the corpus);
      above, the corpus and drop keys are hash-bucketed and anti-
      filtered per bucket in map_groups — one corpus shuffle, exact,
      and safe for list<>-typed payload columns that Dataset.join's
      Acero backend rejects.

    * ``materialize=False`` is the RE-READ mode for corpora near
      cluster memory: the corpus is NOT pinned in the object store —
      each consumer (detector pass, key-type probe, anti filter)
      re-executes the upstream lineage instead (same pattern as
      ivf.py's materialize=False). Recompute cost traded for zero
      pinned footprint; outputs identical either way.
    * the text detectors run in ``pair_mode="star"`` by default here
      (override via detector_kwargs): components only need a spanning
      edge set per bucket, so a 10M-member viral-dup bucket emits 10M
      star edges instead of 5e13 all-pairs. Every star edge still
      passes the exact verify stage. Recall caveat (vs pair_mode=
      "all"): within one bucket, a similar pair (b, c) whose bucket
      min a is similar to NEITHER loses its edge unless b and c also
      share a bucket of their own — they almost always do, since
      similar docs share their own signature bands; equality of the
      survivor set is asserted on fixtures in tests.

    Returns the surviving docs Dataset with all input columns.
    Idempotent: re-running on the output finds no pairs."""
    from ner_ray.stages.canon import canonicalize

    # the corpus is consumed by several passes (detector, key-type
    # probe, anti filter) — pin it once rather than re-executing the
    # upstream lineage per consumer (materialize=False: re-read mode)
    if materialize:
        docs_ds = docs_ds.materialize()
    if num_buckets is None:
        num_buckets = _auto_buckets(docs_ds)
    key_type = None
    for b in docs_ds.limit(1).iter_batches(batch_format="pyarrow"):
        key_type = b.schema.field(id_col).type

    if pairs_ds is None:
        if method in ("minhash", "simhash"):
            # the text detectors read canonical (doc_id, text) columns;
            # rename a custom layout into that view (ids in the emitted
            # pairs are the original values either way)
            det_in = docs_ds.select_columns([id_col, text_col])
            if (id_col, text_col) != ("doc_id", "text"):
                det_in = det_in.map_batches(
                    lambda t: t.rename_columns(["doc_id", "text"]),
                    batch_format="pyarrow")
            detector_kwargs.setdefault("pair_mode", "star")
            if method == "minhash":
                pairs_ds = minhash_near_dups(det_in, **detector_kwargs)
            else:
                pairs_ds = simhash_near_dups(det_in, **detector_kwargs)
        elif method == "embedding":
            from ner_ray.stages.similarity import cosine_dup_pairs

            pairs_ds = cosine_dup_pairs(docs_ds, id_col=id_col,
                                        **detector_kwargs)
            a_col, b_col = "vec_a", "vec_b"
        else:
            raise ValueError(f"unknown near-dedup method: {method!r}")

    def pair_edges(t: pa.Table) -> pa.Table:
        # one edge row per pair endpoint, alias = the pair itself:
        # components over "appears in a pair together"
        a = t.column(a_col).cast(pa.string())
        b = t.column(b_col).cast(pa.string())
        key = pc.binary_join_element_wise(a, b, "\x1f")
        return pa.table({
            "entity_id": pa.concat_arrays([a.combine_chunks(),
                                           b.combine_chunks()]),
            "alias": pa.concat_arrays([key.combine_chunks()] * 2),
        })

    edges = pairs_ds.map_batches(pair_edges,
                                 batch_format="pyarrow").materialize()
    if edges.count() == 0:      # no dups at all (e.g. a re-run)
        return docs_ds
    comp = canonicalize(edges)

    if key_type is not None and pa.types.is_integer(key_type):
        # canonicalize's internal min is lexicographic on the
        # stringified ids ("10" < "2"); recompute the representative
        # numerically so integral corpora keep the true min id (and
        # agree with exact_dedup_docs' numeric min)
        from ray.data.aggregate import Min

        typed = comp.map_batches(
            lambda t: pa.table({
                "eid": t.column("entity_id").cast(key_type),
                "comp": t.column("canonical_id")}),
            batch_format="pyarrow")
        reps = typed.groupby("comp").aggregate(
            Min("eid", alias_name="rep"))
        from ner_ray.functions.joins import clamp_join_partitions

        joined = typed.join(reps, join_type="inner",
                            num_partitions=clamp_join_partitions(8),
                            on=("comp",))
        drops = joined.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("eid"),
                                            t.column("rep")))
            .select(["eid"]),
            batch_format="pyarrow")
        drop_col = "eid"
    else:
        def non_canonical(t: pa.Table) -> pa.Table:
            keep = pc.not_equal(t.column("entity_id"),
                                t.column("canonical_id"))
            return t.filter(keep).select(["entity_id"])

        drops = comp.map_batches(non_canonical, batch_format="pyarrow")
        drop_col = "entity_id"
    return anti_filter_docs(docs_ds, drops, drop_col=drop_col,
                            id_col=id_col,
                            max_broadcast_drops=max_broadcast_drops,
                            num_buckets=num_buckets)


def anti_filter_docs(docs_ds, drops_ds, drop_col: str = "entity_id",
                     id_col: str = "doc_id",
                     max_broadcast_drops: int = MAX_BROADCAST_DROPS,
                     num_buckets: int | None = None, anti: bool = True):
    """Remove (``anti=True``) or keep (``anti=False`` — a semi filter)
    the rows whose ``id_col`` appears in ``drops_ds`` (``drop_col``),
    size-dispatched:

    * key count at or below ``max_broadcast_drops``: the key set
      broadcasts once and the corpus streams through an is_in filter —
      NO shuffle of the corpus;
    * above: corpus and filter keys are hash-bucketed and filtered
      per bucket in map_groups — one corpus shuffle, exact, and safe
      for list<>-typed payload columns Dataset.join's Acero backend
      rejects (the payload rides through groupby untouched).
      ``num_buckets=None`` auto-sizes from the corpus bytes
      (~TARGET_GROUP_BYTES of payload per bucket group).

    Filter keys may be strings even when the corpus id is integral (the
    component step stringifies); they are cast back to the corpus key
    type before filtering."""
    from ner_ray.util.hashing import to_bucket

    drops = drops_ds.materialize()
    n_drops = drops.count()
    if n_drops == 0:
        if anti:
            return docs_ds
        return docs_ds.limit(0)
    if num_buckets is None:
        num_buckets = _auto_buckets(docs_ds)
    # ONE schema probe covers both paths (key type + full layout)
    key_type, names, types = None, [], []
    for b in docs_ds.limit(1).iter_batches(batch_format="pyarrow"):
        key_type = b.schema.field(id_col).type
        names, types = list(b.schema.names), list(b.schema.types)

    if n_drops <= max_broadcast_drops:
        from ner_ray.functions.joins import semi_join

        ids = pa.concat_arrays(
            [b.column(drop_col).combine_chunks()
             for b in drops.iter_batches(batch_format="pyarrow")])
        if key_type is not None and ids.type != key_type:
            ids = ids.cast(key_type)
        return semi_join(docs_ds, ids.to_pylist(), on=id_col, anti=anti)

    def tag_docs(t: pa.Table) -> pa.Table:
        b = to_bucket(hash_column(t.column(id_col)), num_buckets)
        t = t.append_column("_bucket", pa.array(b))
        return t.append_column("_is_drop",
                               pa.array(np.zeros(len(t), np.int8)))

    def tag_drops(t: pa.Table) -> pa.Table:
        key = t.column(drop_col)
        if key_type is not None and key.type != key_type:
            key = key.cast(key_type)
        cols = {n: (key if n == id_col else pa.nulls(len(t), ty))
                for n, ty in zip(names, types)}
        out = pa.table(cols)
        b = to_bucket(hash_column(key), num_buckets)
        out = out.append_column("_bucket", pa.array(b))
        return out.append_column("_is_drop",
                                 pa.array(np.ones(len(t), np.int8)))

    both = docs_ds.map_batches(tag_docs, batch_format="pyarrow").union(
        drops.map_batches(tag_drops, batch_format="pyarrow"))

    def anti_bucket(g: pa.Table) -> pa.Table:
        is_drop = pc.equal(g.column("_is_drop"), pa.scalar(1, pa.int8()))
        drop_ids = g.filter(is_drop).column(id_col)
        doc_rows = g.filter(pc.invert(is_drop))
        mask = pc.is_in(doc_rows.column(id_col),
                        value_set=drop_ids.combine_chunks())
        if anti:
            mask = pc.invert(mask)
        return doc_rows.filter(mask).drop_columns(["_bucket", "_is_drop"])

    return both.groupby("_bucket").map_groups(anti_bucket,
                                              batch_format="pyarrow")


def exact_dedup_docs(docs_ds, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_broadcast_drops: int = MAX_BROADCAST_DROPS,
                     num_buckets: int | None = None,
                     materialize: bool = True,
                     scope_cols: tuple[str, ...] = ()):
    """Exact-duplicate REMOVAL keeping the min-id row per distinct
    text (the survivor-set counterpart of ``exact_dedup``, which
    returns the keyed summary). Only (content-hash, id) scalar pairs
    shuffle — never texts; per hash-bucket the non-min ids are found
    with a vectorized groupby-transform, then anti-filtered out of the
    corpus via the shared size dispatch. ``num_buckets=None``
    auto-sizes from corpus bytes; ``materialize=False`` is the re-read
    mode (corpus not pinned; the pair and anti passes re-execute the
    upstream — see near_dedup_docs). ``scope_cols`` narrows duplicate
    identity to (scope, text) — e.g. ``("domain",)`` for the C4 move
    of deduplicating within URL/domain scope only, so the same
    boilerplate on two domains keeps one copy per domain."""
    from ner_ray.util.hashing import to_bucket

    if materialize:  # consumed by pair + anti passes
        docs_ds = docs_ds.materialize()
    if num_buckets is None:
        num_buckets = _auto_buckets(docs_ds)

    def pairs(t: pa.Table) -> pa.Table:
        cols = [t.column(c) for c in (*scope_cols, text_col)]
        h = hash_columns(*cols) if len(cols) > 1 else hash_column(cols[0])
        return pa.table({"h": pa.array(h.view(np.int64)),
                         id_col: t.column(id_col),
                         "_b": pa.array(to_bucket(h, num_buckets))})

    def drop_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("h")[id_col].transform("min")
        return g.loc[g[id_col] != m, [id_col]]

    drops = docs_ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("_b").map_groups(drop_bucket, batch_format="pandas")
    return anti_filter_docs(docs_ds, drops, drop_col=id_col,
                            id_col=id_col,
                            max_broadcast_drops=max_broadcast_drops,
                            num_buckets=num_buckets)


def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """One row per distinct text: (doc_id = min id, n_dups). Two-phase:
    per-batch combine on the content hash, then a final groupby over
    partials — raw texts never shuffle."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        # int64 VIEW of the uint64 hash: bit-identical distinctness, but
        # Arrow/pandas shuffle machinery handles int64 natively (uint64
        # values above 2^63 otherwise fall back to a pickled-object
        # extension column in the groupby)
        h = hash_column(t.column(text_col)).view(np.int64)
        tt = pa.table({"h": pa.array(h), id_col: t.column(id_col)})
        g = tt.group_by("h").aggregate([(id_col, "min"), ([], "count_all")])
        return g.rename_columns(["h", id_col, "n_dups"])

    partials = docs_ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("h").aggregate(
        Min(id_col, alias_name=id_col), Sum("n_dups", alias_name="n_dups"))
    return out.select_columns([id_col, "n_dups"])


def _para_loser_mask(df: pd.DataFrame, id_c: str, idx_c: str):
    """(stable-sorted frame, loser mask) for paragraph keep-first: sort
    by (para, id, idx); every LATER occurrence of a non-empty paragraph
    is a loser. The ONE survivor rule shared by dedup_paragraphs' map-
    side combiner and its global keep_first stage — the combiner's
    exactness requires identical ordering, so both must call this."""
    s = df.sort_values(["para", id_c, idx_c], kind="stable")
    dup = s["para"].duplicated().to_numpy() & (s["para"].to_numpy() != "")
    return s, dup


def dedup_paragraphs(docs_ds, text_col: str = "text",
                     id_col: str = "doc_id", sep: str = "\n",
                     num_buckets: int | None = None,
                     drop_empty: bool = True):
    """Paragraph-granular exact dedup across the WHOLE corpus (the C4
    move: web corpora repeat boilerplate paragraphs across millions of
    pages, so dedup below document granularity): split each doc on
    ``sep``, keep only the globally FIRST occurrence of every distinct
    paragraph (order: ``(doc_id, para_idx)`` — deterministic on any
    layout), reassemble each doc from its surviving paragraphs in
    original order.

    Returns ``(id_col, text_col)`` rows; docs whose every paragraph was
    removed (or that reassemble to the empty string, with
    ``drop_empty``) disappear. Payload columns re-attach with one
    ``hash_join`` on ``id_col`` if needed — not done here so the two
    corpus shuffles below stay paragraph-text-only.

    EMPTY paragraphs (consecutive separators — blank lines) are
    STRUCTURE, not content: they are exempt from dedup (every doc keeps
    its own blank-line layout) and their bucket key is salted per
    (doc, position) so the corpus's blank lines — easily the most
    frequent "paragraph" on the web — never pile into one hash bucket
    and create a straggler group.

    Distribution: the paragraph stream shuffles exactly twice — once
    grouped by paragraph-hash bucket to pick winners (winner choice
    compares the actual STRINGS inside each 64-bit-hash group, so hash
    collisions cannot merge distinct paragraphs), once grouped by doc
    to reassemble. Idempotent.

    ``num_buckets=None`` auto-sizes from the corpus bytes so each
    keep-first group carries ~TARGET_GROUP_BYTES of paragraph text
    regardless of corpus size (a fixed default would concentrate
    corpus/N bytes of text per group); outputs are bucket-count
    INDEPENDENT (each paragraph's winner is a global property). The
    size probe is metadata-only for read-rooted/materialized inputs;
    pass an explicit count for lazy transformed chains to stay
    one-pass."""
    from ner_ray.util.hashing import to_bucket

    if num_buckets is None:
        num_buckets = _auto_buckets(docs_ds)

    def explode(t: pa.Table) -> pa.Table:
        paras = pc.split_pattern(t.column(text_col), sep)
        counts = pc.list_value_length(paras).to_numpy(zero_copy_only=False)
        flat = (paras.combine_chunks()
                if isinstance(paras, pa.ChunkedArray) else paras).flatten()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(len(t)), counts)
        idx = (np.arange(int(counts.sum()))
               - np.repeat(np.cumsum(counts) - counts, counts))
        h = hash_column(flat)
        bucket = to_bucket(h, num_buckets)
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        if empty.any():
            # dedup-exempt rows: spread across buckets by position
            bucket = np.where(
                empty, (rep + idx).astype(bucket.dtype) % num_buckets,
                bucket)
        tb = pa.table({
            id_col: pa.array(ids[rep]),
            "para_idx": pa.array(idx.astype(np.int64)),
            "para": flat,
            "_b": pa.array(bucket),
        })
        # map-side combiner: within this batch, only the first
        # (doc_id, para_idx) occurrence of each distinct non-empty
        # paragraph can be the GLOBAL first — every other in-batch
        # occurrence is a certain loser and never enters the shuffle.
        # A hot boilerplate paragraph (the operator's own use case)
        # then ships at most one row per block into its hash bucket,
        # bounding the keep-first group by block count instead of
        # occurrence count. Shares keep_first's exact survivor rule
        # (string compare — hash collisions cannot merge paragraphs
        # here either); applying it twice is idempotent.
        df = pd.DataFrame({"para": flat.to_pandas(),
                           "id": ids[rep], "idx": idx})
        s, dup = _para_loser_mask(df, "id", "idx")
        if dup.any():
            keep = np.ones(len(df), dtype=bool)
            keep[s.index.to_numpy()[dup]] = False
            tb = tb.filter(pa.array(keep))
        return tb

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        s, dup = _para_loser_mask(g, id_col, "para_idx")
        out = s.loc[~dup, [id_col, "para_idx", "para"]].copy()
        # reassembly bucket rides along so the doc-side shuffle groups
        # by a bounded bucket, not one map_groups call per doc
        out["_b2"] = to_bucket(hash_column(out[id_col]), num_buckets)
        return out

    def reassemble_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL docs in the bucket (a per-doc
        # map_groups call costs ~1 ms of pandas overhead — 1e6 docs
        # would pay 1000 s in pure group dispatch)
        s = g.sort_values([id_col, "para_idx"], kind="stable")
        agg = s.groupby(id_col, sort=False)["para"] \
            .agg(sep.join).reset_index()
        agg.columns = [id_col, text_col]
        return agg

    kept = docs_ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("_b").map_groups(keep_first, batch_format="pandas")
    out = kept.groupby("_b2").map_groups(reassemble_bucket,
                                         batch_format="pandas")
    if drop_empty:
        out = out.map_batches(
            lambda t: t.filter(pc.not_equal(t.column(text_col), "")),
            batch_format="pyarrow")
    return out
