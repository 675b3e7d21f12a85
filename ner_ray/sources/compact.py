"""Sorted-merge small-file compaction for partitioned parquet layouts.

Every resumable job here writes one file per partition/bucket/shard per
run; after months of incremental ingests (stages/incdedup.py appends a
generation per day) a 100-TB layout degrades into millions of KB-sized
files — and at that point LISTING dominates reading (one metadata RPC
per file on an object store) and every downstream `read_parquet` pays
a task per tiny fragment. Compaction merges each partition directory's
small-file tail into ~target-size files, leaving already-large files
and the directory structure (the resume/consume unit) untouched.

Design (metadata-planned, shuffle-free):
- The plan is computed from filesystem metadata only (`pyarrow.fs`
  listing sizes) — no data moves to decide anything. Files >=
  ``small_fraction * target_bytes`` are never rewritten.
- Small files pack first-fit in sorted-name order into groups of
  <= target_bytes; each group becomes ONE worker task that reads its
  inputs, optionally sorts (``sort_by`` keeps range-clustered layouts
  like sources/zorder.py prunable after compaction), and writes ONE
  output file inside the same partition directory. Groups touch
  disjoint files, so tasks are embarrassingly parallel.
- Raw ``@ray.remote`` tasks, deliberately: "merge exactly these files
  into exactly one file" is file-level I/O the Dataset API cannot
  express (read_parquet -> write_parquet re-plans block splits and
  loses the file<->group identity the crash protocol needs). This is
  the documented last-resort locus, not a per-record transform.

Crash safety (the reason naive replanning is wrong): a group is
committed by RENAMING its temp output into place and only then
deleting its inputs. A crash between rename and deletes would leave
rows present twice, and re-PLANNING from the new listing could regroup
those inputs with other files — duplicating them in a fresh output. So
every run first settles the previous run's plan manifest
(`_COMPACT_PLAN.json`): groups whose output exists get their surviving
inputs deleted; groups whose output is missing are left intact; stray
temps are removed. Only then is a new plan computed and executed. Each
group also verifies rows_out == sum(metadata rows_in) before deleting
anything.
"""

from __future__ import annotations

import json
import posixpath

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs

from ner_ray.util.hashing import hash_str

PLAN_NAME = "_COMPACT_PLAN.json"
TMP_SUFFIX = ".inprogress"


def _resolve_fs(root, filesystem):
    if filesystem is not None:
        return filesystem, root.rstrip("/")
    fs, path = pafs.FileSystem.from_uri(root) if "://" in root else (
        pafs.LocalFileSystem(), root)
    return fs, path.rstrip("/")


def plan_compaction(root: str, target_bytes: int = 128 * 2**20,
                    small_fraction: float = 0.5,
                    filesystem=None) -> list[dict]:
    """Group each directory's small parquet files into merge groups.

    Returns [{"dir", "files", "bytes", "out"}] — ``files`` are base
    names sorted lexically, ``out`` is a deterministic name derived
    from the member list (stable across retries, unique per group
    composition). Single-file groups are dropped: rewriting one small
    file buys nothing.
    """
    fs, root = _resolve_fs(root, filesystem)
    small_cut = int(target_bytes * small_fraction)
    by_dir: dict[str, list] = {}
    for info in fs.get_file_info(pafs.FileSelector(root, recursive=True)):
        if info.type != pafs.FileType.File:
            continue
        if not info.path.endswith(".parquet") or TMP_SUFFIX in info.path:
            continue
        if info.size >= small_cut:
            continue
        by_dir.setdefault(posixpath.dirname(info.path), []).append(
            (posixpath.basename(info.path), info.size))
    groups = []
    for d in sorted(by_dir):
        acc: list[tuple[str, int]] = []
        acc_bytes = 0
        members = sorted(by_dir[d]) + [(None, None)]  # sentinel flushes
        for name, size in members:
            if name is None or (acc and acc_bytes + size > target_bytes):
                if len(acc) > 1:
                    names = [n for n, _ in acc]
                    out = "compact-%016x.parquet" % (
                        hash_str("|".join(names)) & (2**64 - 1))
                    groups.append({"dir": d, "files": names,
                                   "bytes": acc_bytes, "out": out})
                acc, acc_bytes = [], 0
            if name is not None:
                acc.append((name, size))
                acc_bytes += size
    return groups


def _settle_previous(fs, root: str) -> int:
    """Finish or roll back the previous run's groups; returns the
    number of groups that had to be settled forward (output already
    renamed into place but inputs not yet deleted)."""
    plan_path = posixpath.join(root, PLAN_NAME)
    settled = 0
    if fs.get_file_info(plan_path).type == pafs.FileType.File:
        with fs.open_input_stream(plan_path) as f:
            prev = json.loads(f.read().decode())
        for g in prev["groups"]:
            out = posixpath.join(g["dir"], g["out"])
            if fs.get_file_info(out).type == pafs.FileType.File:
                forward = False
                for name in g["files"]:
                    p = posixpath.join(g["dir"], name)
                    if fs.get_file_info(p).type == pafs.FileType.File:
                        fs.delete_file(p)
                        forward = True
                settled += int(forward)
        fs.delete_file(plan_path)
    # stray temps from a crash mid-write are dead weight either way
    for info in fs.get_file_info(pafs.FileSelector(root, recursive=True)):
        if info.type == pafs.FileType.File and \
                info.path.endswith(TMP_SUFFIX):
            fs.delete_file(info.path)
    return settled


def _compact_group(group: dict, sort_by, filesystem) -> dict:
    """Worker body: read group inputs, merge (+sort), write ONE file,
    rename into place, verify counts, delete inputs."""
    fs = filesystem or pafs.LocalFileSystem()
    paths = [posixpath.join(group["dir"], n) for n in group["files"]]
    rows_in = 0
    tables = []
    for p in paths:
        with fs.open_input_file(p) as f:
            pf = pq.ParquetFile(f)
            rows_in += pf.metadata.num_rows
            tables.append(pf.read())
    merged = pa.concat_tables(tables, promote_options="default")
    if sort_by:
        merged = merged.sort_by([(c, "ascending") for c in sort_by])
    out = posixpath.join(group["dir"], group["out"])
    tmp = out + TMP_SUFFIX
    with fs.open_output_stream(tmp) as f:
        pq.write_table(merged, f)
    if merged.num_rows != rows_in:
        fs.delete_file(tmp)
        raise RuntimeError(
            f"compaction row mismatch in {group['dir']}: "
            f"{rows_in} in vs {merged.num_rows} merged")
    fs.move(tmp, out)  # commit point
    for p in paths:
        fs.delete_file(p)
    return {"dir": group["dir"], "files_in": len(paths),
            "rows": rows_in, "bytes_in": group["bytes"]}


def compact_dir(root: str, target_bytes: int = 128 * 2**20,
                small_fraction: float = 0.5,
                sort_by: tuple[str, ...] = (),
                filesystem=None) -> dict:
    """Compact every partition directory under ``root``; returns
    {"groups", "files_merged", "rows", "settled_forward"}. Safe to
    rerun after a crash at any point; a no-op when nothing is small."""
    import ray

    fs, root = _resolve_fs(root, filesystem)
    settled = _settle_previous(fs, root)
    groups = plan_compaction(root, target_bytes=target_bytes,
                             small_fraction=small_fraction, filesystem=fs)
    stats = {"groups": len(groups), "files_merged": 0, "rows": 0,
             "settled_forward": settled}
    if not groups:
        return stats
    plan_path = posixpath.join(root, PLAN_NAME)
    with fs.open_output_stream(plan_path) as f:
        f.write(json.dumps({"groups": groups}).encode())

    worker = ray.remote(num_cpus=1)(_compact_group)
    ship_fs = filesystem  # None -> workers build a LocalFileSystem
    results = ray.get([worker.remote(g, tuple(sort_by), ship_fs)
                       for g in groups])
    for r in results:
        stats["files_merged"] += r["files_in"]
        stats["rows"] += r["rows"]
    fs.delete_file(plan_path)
    return stats
