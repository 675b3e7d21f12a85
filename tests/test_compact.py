"""Compaction: content preservation, large-file exemption, partition
layout preservation, idempotence, crash settlement, sort_by."""

import json
import posixpath
import shutil

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ner_ray.sources.compact import (
    PLAN_NAME,
    _compact_group,
    compact_dir,
    plan_compaction,
)

TARGET = 8 * 1024  # bytes; test files are KB-sized


def _write(path, ids, pad=40):
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "text": ["x" * pad + str(i) for i in ids]})
    pq.write_table(t, path)


def _layout(tmp_path):
    """Two partition dirs, each: 6 small files + 1 big one."""
    nxt = 0
    for b in (0, 1):
        d = tmp_path / f"bucket={b}"
        d.mkdir()
        for i in range(6):
            _write(str(d / f"part-{i:04d}.parquet"),
                   list(range(nxt, nxt + 8)))
            nxt += 8
        _write(str(d / "big-0000.parquet"),
               list(range(nxt, nxt + 500)))  # ~5 KB >= 0.5*TARGET
        nxt += 500
    return str(tmp_path)


def _read_all(root):
    return pads.dataset(root, format="parquet").to_table() \
        .sort_by("id").to_pydict()


def _files(root):
    import pathlib
    return sorted(str(p.relative_to(root))
                  for p in pathlib.Path(root).rglob("*.parquet"))


def test_compact_preserves_content(ray_session, tmp_path):
    root = _layout(tmp_path)
    before = _read_all(root)
    files_before = _files(root)
    stats = compact_dir(root, target_bytes=TARGET)
    assert stats["groups"] >= 2 and stats["files_merged"] >= 8
    assert _read_all(root) == before
    files_after = _files(root)
    assert len(files_after) < len(files_before)
    # big files untouched, partition dirs preserved
    assert [f for f in files_after if "big-" in f] == \
        [f for f in files_before if "big-" in f]
    assert {posixpath.dirname(f) for f in files_after} == \
        {posixpath.dirname(f) for f in files_before}


def test_idempotent_rerun(ray_session, tmp_path):
    root = _layout(tmp_path)
    compact_dir(root, target_bytes=TARGET)
    files = _files(root)
    stats = compact_dir(root, target_bytes=TARGET)
    assert stats["groups"] == 0 and stats["files_merged"] == 0
    assert _files(root) == files


def test_sort_by_orders_merged_files(ray_session, tmp_path):
    root = _layout(tmp_path)
    # reverse ids inside each small file so merging unsorted shows
    for b in (0, 1):
        d = tmp_path / f"bucket={b}"
        for f in d.glob("part-*.parquet"):
            t = pq.read_table(str(f))
            pq.write_table(t.sort_by([("id", "descending")]), str(f))
    compact_dir(root, target_bytes=TARGET, sort_by=("id",))
    for b in (0, 1):
        for f in (tmp_path / f"bucket={b}").glob("compact-*.parquet"):
            ids = pq.read_table(str(f)).column("id").to_pylist()
            assert ids == sorted(ids)


def test_crash_between_rename_and_delete_settles_forward(
        ray_session, tmp_path):
    """Simulate the dangerous window: a group's output is renamed into
    place but its inputs were not deleted before the crash. The rerun
    must delete those inputs (not re-merge them into another group)."""
    root = _layout(tmp_path)
    before = _read_all(root)
    groups = plan_compaction(root, target_bytes=TARGET)
    assert len(groups) >= 2
    victim = groups[0]
    # manifest as a real run would have written it
    with open(posixpath.join(root, PLAN_NAME), "w") as f:
        json.dump({"groups": groups}, f)
    # emulate rename-then-crash: output exists AND inputs survive
    saved = {}
    for name in victim["files"]:
        p = posixpath.join(victim["dir"], name)
        saved[p] = p + ".bak"
        shutil.copy(p, saved[p])
    _compact_group(victim, (), None)  # writes out, deletes inputs
    for p, bak in saved.items():
        shutil.move(bak, p)  # resurrect inputs = the crash window
    stats = compact_dir(root, target_bytes=TARGET)
    assert stats["settled_forward"] == 1
    assert _read_all(root) == before  # no duplicated rows


def test_plan_skips_singletons_and_temps(tmp_path):
    d = tmp_path / "bucket=0"
    d.mkdir()
    _write(str(d / "only.parquet"), list(range(5)))
    (d / "junk.parquet.inprogress").write_bytes(b"partial")
    assert plan_compaction(str(tmp_path), target_bytes=TARGET) == []
