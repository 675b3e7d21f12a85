"""Per-stage checkpointing with lineage records (SURVEY.md §3.3, S8).

"Resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule): every checkpointed stage writes its output
as a partitioned Parquet directory under

    <ckpt_root>/<stage>/<fingerprint>/

where ``fingerprint`` = stable hash of (stage name, config, upstream
fingerprints). Writes are atomic (tmp dir -> os.replace) and finished
stages carry a ``_MANIFEST.json``; a rerun with identical lineage
inputs SKIPS the stage and streams the checkpoint back instead of
recomputing. Lineage rows (stage, partition_id, input_fingerprint,
rows, wall_s, status) append to ``lineage.jsonl`` — the audit trail of
what was computed vs reused.

Fingerprints chain: fp(stage) = H(name | config | fp(upstreams)), so a
changed input or config invalidates exactly the affected suffix of the
pipeline. Granularity: compute is resumed per stage; the partitioned
output layout (one file per block / one dir per partition column
value) is what lets downstream consumers and reruns skip finished
work without re-reading everything.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from ner_ray.util.hashing import hash_str


def fingerprint(*parts: str) -> str:
    return f"{hash_str('|'.join(str(p) for p in parts)) & 0xFFFFFFFFFFFFFFFF:016x}"


def input_fingerprint(path: str, filesystem=None) -> str:
    """Fingerprint of an input file/dir: paths + sizes + mtimes-ns.
    Goes through pyarrow.fs so an s3://... input fingerprints the same
    way a local one does (mtime_ns may be None on object stores; the
    path+size pair still changes with any rewrite there)."""
    from pyarrow import fs as pafs

    from ner_ray.util.fsio import resolve_fs

    fs, root = resolve_fs(path, filesystem)
    info = fs.get_file_info(root)
    entries = []
    if info.type == pafs.FileType.Directory:
        for e in sorted(fs.get_file_info(
                pafs.FileSelector(root, recursive=True)),
                key=lambda e: e.path):
            if e.type == pafs.FileType.File:
                entries.append(f"{e.path}:{e.size}:{e.mtime_ns}")
    elif info.type == pafs.FileType.File:
        entries.append(f"{root}:{info.size}:{info.mtime_ns}")
    else:
        raise FileNotFoundError(path)
    return fingerprint(*entries)


def _partition_rows(out_dir: str, filesystem=None) -> list[tuple[str, int]]:
    """Sorted (fs-relative path, num_rows) for every data parquet file
    under ``out_dir`` — the single partition-enumeration rule shared by
    run_stage manifests and log_partitioned_output (sidecars skipped
    identically in both)."""
    import pyarrow.parquet as pq

    from ner_ray.util.fsio import list_data_files

    fs, root, paths = list_data_files(out_dir, filesystem)
    out = []
    for p in paths:
        with fs.open_input_file(p) as f:
            n = pq.read_metadata(f).num_rows
        out.append((p[len(root):].lstrip("/"), int(n)))
    return out


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._log_path = os.path.join(root, "lineage.jsonl")

    # ------------------------------------------------------- lineage

    def _log(self, rows: list[dict]) -> None:
        with open(self._log_path, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def lineage(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def log_partitioned_output(self, stage: str, fp: str, out_dir: str,
                               wall_s: float = 0.0,
                               status: str = "computed",
                               filesystem=None) -> list[dict]:
        """Append per-partition lineage rows for an output directory
        written OUTSIDE run_stage (e.g. the ANN index builders, which
        own their partition layout + sidecar files). One row per
        parquet data file; sidecars (underscore-prefixed) are skipped.
        ``out_dir`` may be an object-store URI (the lineage log itself
        stays on the local checkpoint root)."""
        rows = [{
            "stage": stage, "partition_id": pid,
            "input_fingerprint": fp, "rows_in": -1,
            "rows_out": n, "wall_s": round(wall_s, 4),
            "status": status,
        } for pid, (_, n) in enumerate(
            _partition_rows(out_dir, filesystem))]
        self._log(rows)
        return rows

    # -------------------------------------------------------- stages

    def stage_dir(self, name: str, fp: str) -> str:
        return os.path.join(self.root, name, fp)

    def is_complete(self, name: str, fp: str) -> bool:
        return os.path.exists(
            os.path.join(self.stage_dir(name, fp), "_MANIFEST.json"))

    def run_stage(self, name: str, fp: str, compute,
                  partition_cols: list[str] | None = None):
        """compute: () -> Dataset. Returns a Dataset streaming from the
        checkpoint (computed now, or reused from a previous run)."""
        import ray.data as rd

        out_dir = self.stage_dir(name, fp)
        if self.is_complete(name, fp):
            manifest = json.load(open(os.path.join(out_dir,
                                                   "_MANIFEST.json")))
            self._log([{
                "stage": name, "partition_id": int(p["partition_id"]),
                "input_fingerprint": fp, "rows_in": -1,
                "rows_out": int(p["rows"]), "wall_s": 0.0,
                "status": "skipped",
            } for p in manifest["partitions"]])
            return rd.read_parquet(out_dir)

        t0 = time.time()
        ds = compute()
        tmp = out_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        if partition_cols:
            ds.write_parquet(tmp, partition_cols=partition_cols)
        else:
            ds.write_parquet(tmp)
        wall = time.time() - t0

        partitions = [
            {"partition_id": pid, "file": rel, "rows": rows}
            for pid, (rel, rows) in enumerate(_partition_rows(tmp))
        ]
        manifest = {
            "stage": name, "fingerprint": fp, "wall_s": round(wall, 3),
            "partitions": partitions,
            "total_rows": sum(p["rows"] for p in partitions),
        }
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
        self._log([{
            "stage": name, "partition_id": p["partition_id"],
            "input_fingerprint": fp, "rows_in": -1,
            "rows_out": p["rows"],
            "wall_s": round(wall / max(len(partitions), 1), 4),
            "status": "computed",
        } for p in partitions])
        return rd.read_parquet(out_dir)
