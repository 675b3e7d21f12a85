"""Join / lookup operators (SURVEY.md §2.4, J1-J5).

Strategy table (ray_guide.md §"Joins and lookups"):
* small side       -> broadcast (ray.put once, Arrow searchsorted +
                      take per batch; nested-column-safe) — NO shuffle
* large × large    -> ``Dataset.join`` (hash-partitioned; verified in
                      Ray 2.49) with ``bucketed_hash_join`` as the
                      portable explicit-partitioned fallback
* semi / anti      -> broadcast key set filter (or Dataset.join types)
* as-of            -> global: broadcast sorted keys + searchsorted;
                      keyed: sort within key buckets + pd.merge_asof
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(ds, small_df, left_on: str, right_on: str,
                   how: str = "inner"):
    """Map-side join against a broadcast dimension table (J1).

    ``small_df`` (pandas or ``pa.Table``) is sorted by key and shipped
    to the object store ONCE; each batch resolves its match ranges via
    ``searchsorted`` and expands with Arrow ``take`` — fully
    Arrow-native, so nested payload columns (``list<struct>`` spans
    etc.) on EITHER side survive untouched (a pandas merge would
    mangle them, and Acero's hash join rejects nested non-key fields
    outright). Supports 1:N small-side multiplicity; ``how`` is
    ``inner`` or ``left`` (unmatched left rows keep null small-side
    columns). Non-key column names must be disjoint across sides; the
    right key column is kept (both key columns appear) unless it has
    the same name as the left key. Batch-row order is preserved;
    within a key, small-side rows keep their input order."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, got {how!r}")
    small = (pa.Table.from_pandas(small_df, preserve_index=False)
             if isinstance(small_df, pd.DataFrame)
             else small_df.combine_chunks())
    # null small-side keys can never match (SQL join semantics) and
    # break argsort on object dtype — drop them before sorting
    small = small.filter(pc.is_valid(small.column(right_on)))
    skeys = small.column(right_on).to_numpy(zero_copy_only=False)
    order = np.argsort(skeys, kind="stable")
    small = small.take(pa.array(order))
    skeys = skeys[order]
    if skeys.dtype == object:
        skeys = skeys.astype("U")
    right_cols = [c for c in small.column_names
                  if c != right_on or right_on != left_on]
    ref = ray.put((small.select(right_cols), skeys))

    class _Join:
        def __init__(self):
            self.small, self.skeys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            n = len(t)
            key_col = t.column(left_on)
            nulls = pc.is_null(key_col).to_numpy(zero_copy_only=False)
            bk = key_col.to_numpy(zero_copy_only=False)
            lo = np.zeros(n, np.int64)
            cnt = np.zeros(n, np.int64)
            valid = ~nulls
            if valid.any():
                bkv = bk[valid]
                if self.skeys.dtype.kind == "U":
                    bkv = bkv.astype("U")
                left = np.searchsorted(self.skeys, bkv, "left")
                right = np.searchsorted(self.skeys, bkv, "right")
                lo[valid] = left
                cnt[valid] = right - left
            out_cnt = np.maximum(cnt, 1) if how == "left" else cnt
            total = int(out_cnt.sum())
            bidx = np.repeat(np.arange(n), out_cnt)
            within = (np.arange(total)
                      - np.repeat(np.cumsum(out_cnt) - out_cnt, out_cnt))
            sidx = lo[bidx] + within
            matched = cnt[bidx] > 0
            sidx_pa = pa.array(np.where(matched, sidx, 0), pa.int64(),
                               mask=~matched)  # null idx -> null row
            out = t.take(pa.array(bidx))
            for name in self.small.column_names:
                if name in out.column_names:
                    raise ValueError(
                        f"broadcast_join: non-key column {name!r} "
                        "exists on both sides — rename one")
                out = out.append_column(
                    name, self.small.column(name).take(sidx_pa))
            return out

    return ds.map_batches(_Join, batch_format="pyarrow",
                          concurrency=(1, 4), num_cpus=1)


def clamp_join_partitions(n: int) -> int:
    """Cap a Dataset.join partition count at the cluster CPU budget:
    a join whose hash-shuffle aggregators exceed available CPUs can
    backpressure the streaming executor to a standstill (observed:
    num_partitions=16 on a 4-CPU session hangs; 4 completes). Keeps
    the requested count on big clusters, floors at 2."""
    import ray

    try:
        avail = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return n
    return max(2, min(n, avail)) if avail else n


def hash_join(left, right, left_on: str, right_on: str,
              join_type: str = "inner", num_partitions: int = 8):
    """Large×large hash join via Dataset.join (J2)."""
    return left.join(right, join_type=join_type,
                     num_partitions=clamp_join_partitions(num_partitions),
                     on=(left_on,), right_on=(right_on,))


def grouped_join(left, right, left_on: str, right_on: str,
                 left_cols: list[str], right_cols: list[str],
                 types: dict[str, pa.DataType],
                 num_buckets: int = 32, how: str = "inner"):
    """Bucket-partitioned join with NO Dataset.join operator: tag
    side, bucket by key hash, union, groupby(bucket), one
    ``pyarrow.Table.join`` per group. Composes freely in one streaming
    DAG (a groupby is just a shuffle) — multiple Dataset.join
    operators in one DAG can deadlock the streaming executor when
    their aggregators exceed the CPU budget (SCALE.md join-DAG
    hazard). Explicit ``left_cols`` / ``right_cols`` make the group
    callable immune to the union's null-padded schema promotion;
    ``types`` (column -> Arrow type) reconstructs a typed empty side
    when a bucket group received rows from only one side (schema() on
    a lazy chain would force an early shuffle — static types are
    free). Non-key output columns must be disjoint across sides;
    Arrow types are preserved end to end (no pandas NaN coercion)."""
    from ner_ray.util.hashing import hash_column, to_bucket

    def tag(side: int, key: str, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            b = to_bucket(hash_column(t.column(key)), num_buckets)
            t = t.append_column("_bkt", pa.array(b))
            return t.append_column(
                "_side", pa.array(np.full(len(t), side, np.int8)))

        return fn

    both = left.map_batches(tag(0, left_on, left_cols),
                            batch_format="pyarrow") \
        .union(right.map_batches(tag(1, right_on, right_cols),
                                 batch_format="pyarrow"))

    def side_table(g: pa.Table, mask, cols: list[str]) -> pa.Table:
        if all(c in g.column_names for c in cols):
            return g.filter(mask).select(cols)
        # this side sent no rows to the group: typed empty table
        return pa.schema(
            [(c, g.schema.field(c).type if c in g.column_names
              else types[c]) for c in cols]).empty_table()

    def join_group(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g.column("_side"), 0)
        lg = side_table(g, lmask, left_cols)
        rg = side_table(g, pc.invert(lmask), right_cols)
        return lg.join(rg, keys=[left_on], right_keys=[right_on],
                       join_type=how)

    return both.groupby("_bkt").map_groups(join_group,
                                           batch_format="pyarrow")


def bucketed_hash_join(left, right, left_on: str, right_on: str,
                       num_buckets: int = 8):
    """Portable explicit-partitioned hash join (the fallback pattern
    for engines without Dataset.join): ``grouped_join`` with column
    lists and types taken from the input schemas (metadata-only on
    the read-rooted / materialized datasets this entry point serves —
    pass explicit lists via ``grouped_join`` for lazy chains).
    Inner join only; non-key column names must be disjoint."""
    ls, rs = left.schema(), right.schema()
    left_cols = list(ls.names)
    right_cols = list(rs.names)
    types = {n: t for n, t in zip(ls.names, ls.types)}
    types.update({n: t for n, t in zip(rs.names, rs.types)})
    return grouped_join(left, right, left_on, right_on, left_cols,
                        right_cols, types, num_buckets=num_buckets)


def semi_join(ds, keys, on: str, anti: bool = False):
    """Broadcast key-set semi/anti join (J3/J4). ``keys`` is an
    iterable of key values (the small side)."""
    import ray
    import pyarrow.compute as pc

    key_ref = ray.put(pa.array(sorted(set(keys))))

    class _Semi:
        def __init__(self):
            self.keys = ray.get(key_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(on), value_set=self.keys)
            if anti:
                mask = pc.invert(mask)
            return batch.filter(mask)

    return ds.map_batches(_Semi, batch_format="pyarrow", concurrency=(1, 4),
                          num_cpus=1)


class BloomFilter:
    """Simple seed-stable Bloom filter (numpy bit array, k derived
    hashes). Mergeable; serializes as bytes for broadcast."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, values) -> np.ndarray:
        from ner_ray.util.hashing import hash_column

        h = hash_column(values)
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # Kirsch-Mitzenmacher
        pos = np.empty((self.k, len(h)), dtype=np.int64)
        for i in range(self.k):
            pos[i] = ((h + np.uint64(i) * h2) %
                      np.uint64(self.n_bits)).astype(np.int64)
        return pos

    def add(self, values) -> None:
        pos = self._positions(values).reshape(-1)
        np.bitwise_or.at(self.bits, pos >> 3,
                         (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, values) -> np.ndarray:
        pos = self._positions(values)
        hit = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.k):
            p = pos[i]
            hit &= (self.bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return hit


def bloom_semi_join(ds, keys, on: str, anti: bool = False,
                    exact: bool = True, n_bits: int = 1 << 20):
    """Semi/anti join via a broadcast Bloom filter prefilter.

    With exact=True (default) survivors are re-checked against the
    exact key set, so results equal semi_join (the Bloom pass just
    cheapens the common-miss case). At 100 TB scale with a key set too
    large to broadcast exactly, exact=False accepts the documented
    false-positive rate (~(1-e^{-kn/m})^k) instead of a shuffle."""
    import ray
    import pyarrow.compute as pc

    key_list = sorted(set(keys))
    bf = BloomFilter(n_bits=n_bits)
    bf.add(pd.Series(key_list))
    bf_ref = ray.put(bf)
    exact_ref = ray.put(pa.array(key_list)) if exact else None

    class _Bloom:
        def __init__(self):
            self.bf = ray.get(bf_ref)
            self.exact = ray.get(exact_ref) if exact_ref is not None else None

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch.column(on)
            maybe = self.bf.might_contain(
                pd.Series(col.to_pandas()))
            if anti:
                # definite misses are definitely NOT in the set
                keep_now = batch.filter(pa.array(~maybe))
                rest = batch.filter(pa.array(maybe))
                if self.exact is not None and len(rest):
                    m = pc.is_in(rest.column(on), value_set=self.exact)
                    rest = rest.filter(pc.invert(m))
                    return pa.concat_tables([keep_now, rest])
                return keep_now
            out = batch.filter(pa.array(maybe))
            if self.exact is not None and len(out):
                m = pc.is_in(out.column(on), value_set=self.exact)
                out = out.filter(m)
            return out

    return ds.map_batches(_Bloom, batch_format="pyarrow",
                          concurrency=(1, 4), num_cpus=1)


def asof_join_global(ds, ts_col: str, right_values, out_col: str):
    """Global (keyless) as-of: each row gets the greatest right value
    <= its ts (broadcast sorted array + np.searchsorted; rows with no
    match are dropped — ASOF inner semantics)."""
    import ray

    vals = np.sort(np.unique(np.asarray(right_values)))
    ref = ray.put(vals)

    class _Asof:
        def __init__(self):
            self.vals = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.vals, ts, side="right") - 1
            keep = idx >= 0
            matched = self.vals[np.maximum(idx, 0)]
            batch = batch.append_column(
                out_col, pa.array(matched, pa.timestamp("us")))
            return batch.filter(pa.array(keep))

    return ds.map_batches(_Asof, batch_format="pyarrow", concurrency=(1, 4),
                          num_cpus=1)


def range_join(ds, intervals: pd.DataFrame, ts_col: str,
               start_col: str = "start", end_col: str = "end"):
    """Range (interval) join: each left row matches every interval with
    start <= ts <= end (inclusive). The interval table is the SMALL
    broadcast side (ray.put once); matching is fully vectorized:

    intervals sort by start; a row's candidates are the intervals whose
    start lies in [ts - max_len, ts] (max_len = longest interval,
    computed at broadcast time), located with two searchsorted calls
    and expanded with the offset-gather trick — no per-row loop, no
    shuffle. Candidates are then filtered on end >= ts. Cost is
    O(rows x avg overlap density), exact for arbitrary overlapping
    intervals; the documented assumption is only that the interval
    TABLE fits a broadcast (for a large interval side, co-partition
    both sides by a time-bucket key and apply this per group)."""
    import ray

    iv = intervals.sort_values(start_col, kind="stable") \
        .reset_index(drop=True)

    def _signed(a: np.ndarray) -> np.ndarray:
        # unsigned ints would wrap on `ts - max_len` (lo > hi =>
        # negative counts); widen to int64 for the search arithmetic
        return a.astype(np.int64) if a.dtype.kind == "u" else a

    starts = _signed(iv[start_col].to_numpy())
    ends = _signed(iv[end_col].to_numpy())
    if (ends < starts).any():
        raise ValueError("interval end < start")
    max_len = (ends - starts).max() if len(iv) else 0
    ref = ray.put((iv, starts, ends, max_len, _signed))

    class _Range:
        def __init__(self):
            (self.iv, self.starts, self.ends, self.max_len,
             self._signed) = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n = len(batch)
            dup = set(batch.columns) & set(self.iv.columns)
            if dup:
                raise ValueError(
                    f"range_join column collision {sorted(dup)}: rename "
                    f"the interval columns before joining")
            empty = pd.concat(
                [batch.iloc[:0].reset_index(drop=True),
                 self.iv.iloc[:0].reset_index(drop=True)], axis=1)
            if n == 0 or not len(self.starts):
                return empty
            ts = self._signed(batch[ts_col].to_numpy())
            lo = np.searchsorted(self.starts, ts - self.max_len, "left")
            hi = np.searchsorted(self.starts, ts, "right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total == 0:
                return empty
            rows = np.repeat(np.arange(n), cnt)
            iidx = np.repeat(lo, cnt) + (
                np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt))
            keep = self.ends[iidx] >= ts[rows]
            rows, iidx = rows[keep], iidx[keep]
            out = batch.iloc[rows].reset_index(drop=True)
            return pd.concat(
                [out, self.iv.iloc[iidx].reset_index(drop=True)], axis=1)

    return ds.map_batches(_Range, batch_format="pandas",
                          concurrency=(1, 4), num_cpus=1)


def range_join_keyed(ds, intervals: pd.DataFrame, key: str, ts_col: str,
                     start_col: str = "start", end_col: str = "end"):
    """Keyed range join: a left row matches intervals with the SAME
    ``key`` value and start <= ts <= end. Same broadcast + two-
    searchsorted + offset-gather core as range_join, applied per key:
    intervals sort by (key, start) once at broadcast time and each
    batch matches against only its keys' slices, so one key's giant
    interval set never inflates another key's candidate window (the
    global max_len pathology). The interval table remains the small
    broadcast side; for interval tables beyond broadcast, hash both
    sides by key first and apply this inside map_groups."""
    import ray

    iv = intervals.sort_values([key, start_col],
                               kind="stable").reset_index(drop=True)

    def _signed(a: np.ndarray) -> np.ndarray:
        return a.astype(np.int64) if a.dtype.kind == "u" else a

    starts = _signed(iv[start_col].to_numpy())
    ends = _signed(iv[end_col].to_numpy())
    if (ends < starts).any():
        raise ValueError("interval end < start")
    # per-key slices + per-key max interval length
    slices: dict = {}
    for k, g in iv.groupby(key, sort=False):
        lo, hi = int(g.index[0]), int(g.index[-1]) + 1
        s, e = starts[lo:hi], ends[lo:hi]
        slices[k] = (lo, hi, int((e - s).max()) if hi > lo else 0)
    ref = ray.put((iv, starts, ends, slices))

    class _KeyedRange:
        def __init__(self):
            self.iv, self.starts, self.ends, self.slices = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            dup = (set(batch.columns) & set(self.iv.columns)) - {key}
            if dup:
                raise ValueError(
                    f"range_join_keyed column collision {sorted(dup)}: "
                    f"rename the interval columns before joining")
            ivcols = [c for c in self.iv.columns if c != key]
            empty = pd.concat(
                [batch.iloc[:0].reset_index(drop=True),
                 self.iv[ivcols].iloc[:0].reset_index(drop=True)], axis=1)
            if len(batch) == 0 or not self.slices:
                return empty
            row_parts, idx_parts = [], []
            keys = batch[key].to_numpy()
            ts_all = _signed(batch[ts_col].to_numpy())
            # group batch rows by key (few distinct keys per batch);
            # within each key the match is fully vectorized
            order = np.argsort(keys, kind="stable")
            bounds = np.flatnonzero(
                np.r_[True, keys[order][1:] != keys[order][:-1]])
            for gi, glo in enumerate(bounds):
                ghi = bounds[gi + 1] if gi + 1 < len(bounds) else len(order)
                rows_k = order[glo:ghi]
                sl = self.slices.get(keys[rows_k[0]])
                if sl is None:
                    continue
                lo0, hi0, max_len = sl
                s = self.starts[lo0:hi0]
                ts = ts_all[rows_k]
                lo = np.searchsorted(s, ts - max_len, "left")
                hi = np.searchsorted(s, ts, "right")
                cnt = hi - lo
                total = int(cnt.sum())
                if total == 0:
                    continue
                rr = np.repeat(rows_k, cnt)
                ii = lo0 + np.repeat(lo, cnt) + (
                    np.arange(total)
                    - np.repeat(np.cumsum(cnt) - cnt, cnt))
                keep = self.ends[ii] >= ts_all[rr]
                row_parts.append(rr[keep])
                idx_parts.append(ii[keep])
            if not row_parts:
                return empty
            rows = np.concatenate(row_parts)
            iidx = np.concatenate(idx_parts)
            out = batch.iloc[rows].reset_index(drop=True)
            return pd.concat(
                [out, self.iv[ivcols].iloc[iidx].reset_index(drop=True)],
                axis=1)

    return ds.map_batches(_KeyedRange, batch_format="pandas",
                          concurrency=(1, 4), num_cpus=1)


def asof_join_keyed(left, right, key: str, left_ts: str, right_ts: str,
                    direction: str = "backward"):
    """Keyed as-of join (J5): co-locate by key via groupby, sort within
    the group, pd.merge_asof. Partitioning assumption: one key's rows
    fit in a group task (true for dimension-keyed event streams)."""
    # harmonize schemas so union() is legal: missing columns become
    # TYPED nulls (a bare np.nan would turn the other side's timestamp
    # column into float64 and break merge_asof on mixed groups)
    import pyarrow as pa

    lschema, rschema = left.schema(), right.schema()
    fields: dict[str, pa.DataType] = {}
    for sch in (lschema, rschema):
        for name, typ in zip(sch.names, sch.types):
            fields.setdefault(name, typ)
    all_cols = list(fields) + ["_side"]

    def tag_side(side, own_cols):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            arrays, names = [], []
            for c in all_cols[:-1]:
                if c in own_cols:
                    arrays.append(t.column(c))
                else:
                    arrays.append(pa.nulls(n, fields[c]))
                names.append(c)
            arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
            names.append("_side")
            return pa.table(dict(zip(names, arrays)))

        return fn

    l = left.map_batches(tag_side(0, set(lschema.names)),
                         batch_format="pyarrow")
    r = right.map_batches(tag_side(1, set(rschema.names)),
                          batch_format="pyarrow")
    both = l.union(r)

    lcols = list(lschema.names)
    # right side contributes only its own columns (plus its ts key);
    # shared names like the group key stay left-owned
    rcols = [c for c in rschema.names
             if c not in set(lcols) or c == right_ts]

    extra = [c for c in rcols if c not in set(lcols)]

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols]
        rg = g[g["_side"] == 1][rcols]
        if lg.empty:
            return pd.concat([lg.iloc[:0], rg[extra].iloc[:0]], axis=1)
        if rg.empty:
            # LEFT semantics: keep left rows with typed-null right cols
            out = lg.copy()
            for c in extra:
                out[c] = pd.Series(
                    pd.NaT if pa.types.is_timestamp(fields[c]) else np.nan,
                    index=out.index)
            return out
        out = pd.merge_asof(lg.sort_values(left_ts),
                            rg.sort_values(right_ts),
                            left_on=left_ts, right_on=right_ts,
                            direction=direction)
        return out

    return both.groupby(key).map_groups(merge_group, batch_format="pandas")
