"""Incremental deduplication against a persisted fingerprint index.

The 100-TB ingest loop this serves: yesterday's corpus is already
deduplicated and its FINGERPRINTS live in a partitioned parquet index;
today's increment must be deduplicated (a) within itself and (b)
against everything already kept — WITHOUT rescanning yesterday's text.
The index stores scalar fingerprints only (~tens of bytes/doc vs ~1 KB
of text), so increment-vs-corpus matching moves O(index keys), never
the corpus:

* ``index/docs``  — one row per kept doc: (doc_id, content_hash,
  sig[binary], bucket) — exact-hash matching + signature lookup.
* ``index/bands`` — N_BANDS rows per kept doc: (band_key, doc_id,
  bucket) — the LSH candidate probe surface.

Both tables are hash-bucket partitioned (``partition_cols=["bucket"]``)
so a failed build resumes per-partition and appends land as new files
inside existing partition dirs (``write_parquet`` names files
uniquely). All matching goes through ``anti_filter_docs``'s size
dispatch: a small increment broadcasts its key set once and the index
STREAMS through an ``is_in`` filter (no shuffle of the index); a huge
increment falls back to the bucketed path automatically.

Semantics note (documented difference from ``near_dedup_docs``):
increment-vs-index near-dup verification uses the ESTIMATED Jaccard
from stored minhash signatures (fraction of agreeing minhash lanes —
Broder 1997's unbiased estimator, stderr ~ sqrt(J(1-J)/64) at the
64-lane default), not the exact n-gram Jaccard that
``near_dedup_docs`` recomputes from both texts — the index
deliberately does not store text. Within-increment dedup
(``self_dedup=True``) still uses the exact-verify path via
``near_dedup_docs``, unchanged.
"""

from __future__ import annotations

import json
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.stages.neardup import (
    N_BANDS,
    N_HASHES,
    _distinct_pairs,
    anti_filter_docs,
    exact_dedup_docs,
    minhash_band_rows,
    minhash_signatures,
    near_dedup_docs,
)
from ner_ray.util.fsio import resolve_fs
from ner_ray.util.hashing import hash_column, hash_columns, to_bucket

_LOG = logging.getLogger(__name__)

# v2: minhash shingle hashing switched to the portable text hash
# (ner_ray/util/hashing.py) — v1 indexes hold signatures/band keys from
# the old kernel, so probing them with the new hash would silently miss
# every near-duplicate; the format bump makes _config_fp reject them.
INDEX_FORMAT = 2
MANIFEST = "_INDEX_MANIFEST.json"
DOCS_DIR = "docs"
BANDS_DIR = "bands"


def _config_fp(method: str, text_col: str, id_col: str,
               n_buckets: int, k: int) -> str:
    from ner_ray.state.lineage import fingerprint

    return fingerprint("dedup_index", str(INDEX_FORMAT), method, text_col,
                       id_col, str(n_buckets), str(k), str(N_HASHES),
                       str(N_BANDS))


def _doc_rows(text_col: str, id_col: str, n_buckets: int, with_sig: bool):
    """Per-doc fingerprint rows: content hash (+ minhash signature as a
    64x8-byte binary blob — binary survives Acero joins, list<> does
    not)."""

    def fn(t: pa.Table) -> pa.Table:
        h = hash_column(t.column(text_col))
        cols = {
            "doc_id": t.column(id_col),
            "content_hash": pa.array(h.view(np.int64)),
        }
        if with_sig:
            texts = t.column(text_col).to_pandas()
            sig = minhash_signatures(texts)  # (n, N_HASHES) uint64
            cols["sig"] = pa.array(
                [row.tobytes() for row in sig], type=pa.binary())
        cols["bucket"] = pa.array(to_bucket(h, n_buckets))
        return pa.table(cols)

    return fn


def _band_key_rows(text_col: str, id_col: str, n_buckets: int,
                   out_id: str = "doc_id"):
    """(band_key, doc_id, bucket) rows — (band_id, band_hash) fused
    into ONE int64 key (Ray multi-key groupby penalty; see
    neardup._distinct_pairs)."""

    def fn(t: pa.Table) -> pa.Table:
        b = minhash_band_rows(t, text_col=text_col, id_col=id_col)
        key = hash_columns(b.column("band_id"), b.column("band_hash"))
        return pa.table({
            "band_key": pa.array(key.view(np.int64)),
            out_id: b.column("doc_id"),
            "bucket": pa.array(to_bucket(key, n_buckets)),
        })

    return fn


def _read_manifest(index_dir: str, filesystem=None) -> dict:
    from pyarrow import fs as pafs

    fs, root = resolve_fs(index_dir, filesystem)
    marker = f"{root.rstrip('/')}/{MANIFEST}"
    if fs.get_file_info(marker).type != pafs.FileType.File:
        raise FileNotFoundError(f"no dedup index manifest at {marker}")
    with fs.open_input_stream(marker) as f:
        m = json.loads(f.read().decode())
    if m.get("format") != INDEX_FORMAT:
        raise ValueError(
            f"dedup index at {root} has format {m.get('format')}; this "
            f"code expects {INDEX_FORMAT}. Signatures/band keys from an "
            "older kernel would silently miss every near-duplicate — "
            "rebuild with build_dedup_index().")
    return m


def _write_manifest(index_dir: str, manifest: dict, filesystem=None):
    fs, root = resolve_fs(index_dir, filesystem)
    marker = f"{root.rstrip('/')}/{MANIFEST}"
    with fs.open_output_stream(marker) as f:
        f.write(json.dumps(manifest).encode())


def _write_fingerprints(docs_ds, index_dir: str, m: dict):
    """The two fingerprint passes (per-doc rows, band rows). Two
    separate streaming writes — the row counts differ (1 vs N_BANDS
    per doc), so they cannot share one sink."""
    import ray.data as rd  # noqa: F401  (docs_ds is already a Dataset)

    with_sig = m["method"] == "minhash"
    docs_ds.map_batches(
        _doc_rows(m["text_col"], m["id_col"], m["n_buckets"], with_sig),
        batch_format="pyarrow",
    ).write_parquet(f"{index_dir.rstrip('/')}/{DOCS_DIR}",
                    partition_cols=["bucket"])
    if with_sig:
        docs_ds.map_batches(
            _band_key_rows(m["text_col"], m["id_col"], m["n_buckets"]),
            batch_format="pyarrow",
        ).write_parquet(f"{index_dir.rstrip('/')}/{BANDS_DIR}",
                        partition_cols=["bucket"])


def _index_count(index_dir: str) -> int:
    import ray.data as rd

    return rd.read_parquet(f"{index_dir.rstrip('/')}/{DOCS_DIR}",
                           columns=["content_hash"]).count()


def build_dedup_index(docs_ds, index_dir: str, *,
                      method: str = "minhash", text_col: str = "text",
                      id_col: str = "doc_id", n_buckets: int = 64,
                      k: int = 3, filesystem=None) -> dict:
    """Build the fingerprint index for an ALREADY-DEDUPLICATED corpus
    (run exact_dedup_docs / near_dedup_docs first — the index records
    what was kept). Clears any prior index at ``index_dir`` (stale
    config or crashed-run debris would silently mix otherwise).
    Returns the manifest."""
    from pyarrow import fs as pafs

    if method not in ("exact", "minhash"):
        raise ValueError(f"method must be 'exact' or 'minhash': {method!r}")
    fs, root = resolve_fs(index_dir, filesystem)
    if fs.get_file_info(root).type == pafs.FileType.Directory:
        fs.delete_dir_contents(root)
    m = {"format": INDEX_FORMAT, "method": method, "text_col": text_col,
         "id_col": id_col, "n_buckets": int(n_buckets), "k": int(k),
         "fingerprint": _config_fp(method, text_col, id_col, n_buckets, k)}
    _write_fingerprints(docs_ds, index_dir, m)
    m["n_docs"] = _index_count(index_dir)
    m["generations"] = [{"n_docs": m["n_docs"]}]
    _write_manifest(index_dir, m, filesystem)
    return m


def append_to_index(docs_ds, index_dir: str, filesystem=None) -> dict:
    """Append fingerprints of newly-kept docs (a later generation).
    ``write_parquet`` adds uniquely-named files inside the existing
    ``bucket=`` partition dirs, so appends never rewrite prior
    generations. Returns the updated manifest."""
    m = _read_manifest(index_dir, filesystem)
    _write_fingerprints(docs_ds, index_dir, m)
    total = _index_count(index_dir)
    m["generations"].append({"n_docs": total - m["n_docs"]})
    m["n_docs"] = total
    _write_manifest(index_dir, m, filesystem)
    return m


def _id_type(index_dir: str) -> pa.DataType:
    """Arrow type of doc_id from index parquet metadata (no data read)."""
    import pyarrow.dataset as pads

    from ner_ray.util.fsio import list_data_files

    fs, _, paths = list_data_files(f"{index_dir.rstrip('/')}/{DOCS_DIR}")
    if not paths:
        raise FileNotFoundError(f"empty dedup index at {index_dir}")
    return pads.dataset(paths[0], filesystem=fs).schema.field("doc_id").type


def _sig_est(new_sig: pa.Array, old_sig: pa.Array) -> np.ndarray:
    """Estimated Jaccard per row: fraction of agreeing minhash lanes."""
    a = np.frombuffer(b"".join(new_sig.to_pylist()), dtype=np.uint64)
    b = np.frombuffer(b"".join(old_sig.to_pylist()), dtype=np.uint64)
    n = len(a) // N_HASHES
    return (a.reshape(n, N_HASHES) == b.reshape(n, N_HASHES)).mean(axis=1)


def dedup_against_index(new_ds, index_dir: str, *,
                        threshold: float = 0.7,
                        self_dedup: bool = True,
                        append: bool = False,
                        materialize: bool = True,
                        filesystem=None):
    """Deduplicate an increment against the persisted index: exact
    content-hash matches always drop; with a minhash index, LSH band
    probes + signature-estimate verify (>= ``threshold``) drop near
    dups of already-kept docs. ``self_dedup`` first removes
    within-increment duplicates with the exact-verify operators
    (survivor = min id, as everywhere else). ``append=True`` records
    the survivors' fingerprints as a new index generation, so the loop
    ``survivors = dedup_against_index(batch, idx, append=True)`` is the
    whole steady-state ingest pipeline. Returns the survivors Dataset
    (materialized — it feeds both the caller and the append pass)."""
    import ray.data as rd

    m = _read_manifest(index_dir, filesystem)
    text_col, id_col = m["text_col"], m["id_col"]
    root = index_dir.rstrip("/")

    if self_dedup:
        # the exact pass stays even under minhash: LSH banding skips
        # zero-shingle (short) docs, so identical short docs would
        # otherwise survive the near-dup self-dedup
        new_ds = exact_dedup_docs(new_ds, text_col=text_col, id_col=id_col,
                                  materialize=materialize)
        if m["method"] == "minhash":
            new_ds = near_dedup_docs(new_ds, method="minhash",
                                     text_col=text_col, id_col=id_col,
                                     threshold=threshold,
                                     materialize=materialize)
    if materialize:
        new_ds = new_ds.materialize()

    def with_hash(t: pa.Table) -> pa.Table:
        h = hash_column(t.column(text_col)).view(np.int64)
        return t.append_column("_ih_hash", pa.array(h))

    new_hashed = new_ds.map_batches(with_hash, batch_format="pyarrow")

    # --- exact leg: stream the index through the increment's hash set
    index_hashes = rd.read_parquet(f"{root}/{DOCS_DIR}",
                                   columns=["content_hash"])
    matched_hashes = anti_filter_docs(
        index_hashes, new_hashed.select_columns(["_ih_hash"]),
        drop_col="_ih_hash", id_col="content_hash", anti=False)
    survivors = anti_filter_docs(
        new_hashed, matched_hashes, drop_col="content_hash",
        id_col="_ih_hash", anti=True).drop_columns(["_ih_hash"])

    if m["method"] == "minhash":
        if materialize:
            survivors = survivors.materialize()
        drops = _near_dup_drops(survivors, root, m, threshold)
        survivors = anti_filter_docs(survivors, drops, drop_col="new_id",
                                     id_col=id_col, anti=True)

    survivors = survivors.materialize()
    if append:
        append_to_index(survivors, index_dir, filesystem)
    return survivors


def _near_dup_drops(new_ds, root: str, m: dict, threshold: float):
    """Increment doc_ids that near-duplicate an indexed doc: LSH band
    probe -> distinct candidate pairs -> signature-estimate verify.
    Everything is size-dispatched or bucket-grouped; the index streams,
    only matched rows shuffle."""
    import ray.data as rd

    from ner_ray.functions.joins import grouped_join

    text_col, id_col, n_buckets = m["text_col"], m["id_col"], m["n_buckets"]
    id_type = _id_type(root)

    new_bands = new_ds.map_batches(
        _band_key_rows(text_col, id_col, n_buckets, out_id="new_id"),
        batch_format="pyarrow").drop_columns(["bucket"]).materialize()

    # index band rows sharing a band key with the increment (index
    # streams; increment band-key set broadcasts when small)
    index_bands = rd.read_parquet(f"{root}/{BANDS_DIR}",
                                  columns=["band_key", "doc_id"])
    matched = anti_filter_docs(
        index_bands, new_bands.select_columns(["band_key"]),
        drop_col="band_key", id_col="band_key", anti=False).rename_columns(
            {"doc_id": "old_id"})

    joined = grouped_join(
        new_bands, matched, "band_key", "band_key",
        ["band_key", "new_id"], ["band_key", "old_id"],
        types={"band_key": pa.int64(), "new_id": id_type,
               "old_id": id_type})
    candidates = _distinct_pairs(joined, "new_id", "old_id").materialize()
    n_cand = candidates.count()
    if n_cand == 0:
        return rd.from_arrow(pa.table({"new_id": pa.array([], id_type)}))
    _LOG.info("incremental dedup: %d candidate pairs to verify", n_cand)

    # signature fetch, both sides size-dispatched semi-filters
    new_sigs = anti_filter_docs(
        new_ds, candidates.select_columns(["new_id"]), drop_col="new_id",
        id_col=id_col, anti=False).map_batches(
            _doc_rows(text_col, id_col, n_buckets, with_sig=True),
            batch_format="pyarrow").select_columns(["doc_id", "sig"]) \
        .rename_columns({"doc_id": "new_id", "sig": "_new_sig"})
    old_sigs = anti_filter_docs(
        rd.read_parquet(f"{root}/{DOCS_DIR}", columns=["doc_id", "sig"]),
        candidates.select_columns(["old_id"]), drop_col="old_id",
        id_col="doc_id", anti=False).rename_columns(
            {"doc_id": "old_id", "sig": "_old_sig"})

    types = {"new_id": id_type, "old_id": id_type,
             "_new_sig": pa.binary(), "_old_sig": pa.binary()}
    with_new = grouped_join(candidates, new_sigs, "new_id", "new_id",
                            ["new_id", "old_id"], ["new_id", "_new_sig"],
                            types=types)
    with_both = grouped_join(with_new, old_sigs, "old_id", "old_id",
                             ["new_id", "old_id", "_new_sig"],
                             ["old_id", "_old_sig"], types=types)

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"new_id": pa.array([], id_type)})
        est = _sig_est(t.column("_new_sig").combine_chunks(),
                       t.column("_old_sig").combine_chunks())
        keep = pa.array(est >= threshold)
        return t.filter(keep).select(["new_id"])

    return with_both.map_batches(verify, batch_format="pyarrow")
