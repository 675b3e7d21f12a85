"""Z-order (Morton) clustered parquet writes: multi-column data
locality so file/row-group min-max pruning works for predicates on ANY
of the clustered columns — a plain sort only prunes its leading
column. The standard lakehouse layout trick (public literature:
Morton 1966; widely documented in Delta/Iceberg OPTIMIZE ZORDER).

Plan (all distributed, one sort):
1. per-column rank spaces from DDSketch quantile boundaries
   (2^bits_per_col buckets; one streaming pass per column, histogram
   counts only — no sample collection);
2. map-only: rank = searchsorted(boundaries, x), z = bit-interleave of
   the ranks (vectorized bit loop, <= 16 iterations);
3. ``ds.sort("z")`` (Ray range shuffle) -> ``write_parquet`` — output
   files follow z ranges, so each file covers a small HYPER-RECTANGLE
   of the clustered columns instead of a full-width slab.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.functions.aggregates import approx_quantile


def _boundaries(ds, col: str, bits: int) -> np.ndarray:
    """2^bits - 1 interior quantile boundaries (approx, DDSketch)."""
    n = (1 << bits) - 1
    qs = [(i + 1) / (n + 1) for i in range(n)]
    return np.array(approx_quantile(ds, col, qs, alpha=0.005),
                    dtype=np.float64)


def _interleave(ranks: list[np.ndarray], bits: int) -> np.ndarray:
    """Morton-interleave k rank arrays of `bits` bits each."""
    k = len(ranks)
    z = np.zeros(len(ranks[0]), dtype=np.uint64)
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = (r >> np.uint64(i)) & np.uint64(1)
            z |= bit << np.uint64(i * k + (k - 1 - j))
    return z


def zorder_write(ds, out_dir: str, cols: list[str],
                 bits_per_col: int = 8, materialize: bool = True,
                 **write_kwargs) -> None:
    """Cluster ``ds`` by the Z-order of ``cols`` (numeric) and write
    parquet to ``out_dir``. ``bits_per_col`` trades rank resolution
    against boundary-table size (default 8 -> 255 boundaries/col).
    ``materialize=True`` pins the input (it feeds one quantile pass
    per column plus the final sort); False re-reads."""
    if materialize:
        ds = ds.materialize()
    bounds = [_boundaries(ds, c, bits_per_col) for c in cols]

    def add_z(t: pa.Table) -> pa.Table:
        ranks = []
        for c, b in zip(cols, bounds):
            x = t.column(c).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ranks.append(np.searchsorted(b, x).astype(np.uint64))
        z = _interleave(ranks, bits_per_col)
        return t.append_column("_z", pa.array(z.view(np.int64)))

    ds.map_batches(add_z, batch_format="pyarrow").sort("_z") \
        .map_batches(lambda t: t.drop_columns(["_z"]),
                     batch_format="pyarrow") \
        .write_parquet(out_dir, **write_kwargs)


def pruning_stats(out_dir: str, cols: list[str]) -> dict:
    """How prunable is a written layout? For each file, the fraction
    of each column's GLOBAL range its min-max footprint covers; the
    expected fraction of files a uniformly-placed equality predicate
    touches is the mean footprint. Returns per-column mean footprints
    ({col: fraction}) plus file count — the layout-quality metric the
    zorder tests assert on."""
    import pyarrow.dataset as pads

    from ner_ray.util.fsio import list_data_files

    fs, _, paths = list_data_files(out_dir)
    per_file: list[dict] = []
    for p in paths:
        frag = pads.dataset(p, filesystem=fs)
        t = frag.to_table(columns=cols)
        row = {}
        for c in cols:
            x = t.column(c).to_numpy(zero_copy_only=False)
            row[c] = (float(np.min(x)), float(np.max(x)))
        per_file.append(row)
    out = {"n_files": len(paths)}
    for c in cols:
        lo = min(r[c][0] for r in per_file)
        hi = max(r[c][1] for r in per_file)
        width = (hi - lo) or 1.0
        out[c] = float(np.mean([(r[c][1] - r[c][0]) / width
                                for r in per_file]))
    return out
