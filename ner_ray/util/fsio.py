"""Filesystem resolution shared by the index/lineage paths: the same
code must list and stat local checkpoint dirs and object-store
prefixes (S3/GCS) on a real cluster, so everything goes through
pyarrow.fs instead of os.listdir/os.stat."""

from __future__ import annotations

import os

import pyarrow as pa


def resolve_fs(path: str, filesystem=None):
    """(filesystem, fs-native path) for a local path or an object-store
    URI (s3://..., gs://...). An explicit handle wins — the path is
    then taken as already fs-native."""
    from pyarrow import fs as pafs

    if filesystem is not None:
        return filesystem, path
    try:
        return pafs.FileSystem.from_uri(path)
    except (pa.ArrowInvalid, ValueError):
        # bare relative path: from_uri needs a scheme or absolute path
        return pafs.LocalFileSystem(), os.path.abspath(path)


def list_data_files(out_dir: str, filesystem=None):
    """Sorted fs-native paths of data parquet files under ``out_dir``
    (recursive); sidecars (underscore/dot-prefixed basenames) are
    skipped. Returns (fs, root, paths)."""
    from pyarrow import fs as pafs

    fs, root = resolve_fs(out_dir, filesystem)
    entries = fs.get_file_info(pafs.FileSelector(root, recursive=True))
    paths = []
    for e in sorted(entries, key=lambda e: e.path):
        base = e.path.rsplit("/", 1)[-1]
        if (e.type == pafs.FileType.File and base.endswith(".parquet")
                and not base.startswith(("_", "."))):
            paths.append(e.path)
    return fs, root, paths
