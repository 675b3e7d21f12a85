"""Deterministic training-shard export: seed-stable global shuffle +
fixed shard count + per-shard manifests, resumable shard-by-shard.

The last step of every training-data pipeline is "shuffle the corpus
and write N shards". ``Dataset.random_shuffle`` is layout- and
retry-dependent (a re-run or a different cluster size produces a
different shard assignment — poison for reproducible training and for
resuming a half-finished export). Here both the shard assignment and
the within-shard order are pure functions of ``(id, seed)``:

    shard(id)    = stable_hash(id, seed) % num_shards
    order-key(id) = stable_hash(id, seed + 1)

so any cluster size, any block layout, any retry produces
byte-identical shards — the same determinism contract as
stages/sampling.py (and the hash is the repo's seed-stable one, never
Python ``hash()``).

Scale design: one map pass tags (shard, order key); ONE
groupby(shard) shuffle; each shard group sorts itself (vectorized
take) and writes its own parquet file + a ``_shard_K.json`` sidecar
(rows + order-independent content fingerprint). Resume: a rerun
broadcasts the completed-shard set, filters those docs out BEFORE the
shuffle (they never move), and writes only missing shards; sidecars
make partial output trustworthy (fingerprint mismatch -> rewrite).
The final ``_MANIFEST.json`` stamps the export complete.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ner_ray.util.hashing import combine_hashes, hash_column, hash_str


def _shard_and_key(ids, num_shards: int, seed: int):
    h = hash_column(ids)
    s1 = np.full(len(h), np.uint64(hash_str(f"shard-seed:{seed}")),
                 dtype=np.uint64)
    s2 = np.full(len(h), np.uint64(hash_str(f"shard-order:{seed}")),
                 dtype=np.uint64)
    shard = (combine_hashes(h, s1) % np.uint64(num_shards)).astype(np.int64)
    key = combine_hashes(h, s2).view(np.int64)
    return shard, key


def assign_shards(ds, num_shards: int, seed: int = 42,
                  id_col: str = "doc_id"):
    """Adds ``shard`` (int64 in [0, num_shards)) and ``_order``
    (int64 seed-stable shuffle key) columns; pure map."""

    def tag(t: pa.Table) -> pa.Table:
        shard, key = _shard_and_key(t.column(id_col), num_shards, seed)
        return t.append_column("shard", pa.array(shard)) \
            .append_column("_order", pa.array(key))

    return ds.map_batches(tag, batch_format="pyarrow")


def _sidecar(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"_shard_{shard:05d}.json")


def _content_fp(ids) -> str:
    """Order-independent content fingerprint: sum of id hashes."""
    return f"{int(np.sum(hash_column(ids), dtype=np.uint64)):016x}"


def completed_shards(out_dir: str, num_shards: int) -> set[int]:
    done = set()
    for s in range(num_shards):
        if os.path.exists(_sidecar(out_dir, s)):
            done.add(s)
    return done


def export_shards(ds, out_dir: str, num_shards: int | None = None,
                  seed: int = 42, id_col: str = "doc_id") -> dict:
    """Write ``num_shards`` deterministic shard files under
    ``out_dir`` (shard-NNNNN.parquet + _shard_NNNNN.json sidecars +
    _MANIFEST.json). Returns the manifest. Rerunning after a kill
    skips finished shards (their rows are filtered out BEFORE the
    shuffle); rerunning a finished export writes nothing.

    ``num_shards=None`` auto-sizes from input bytes (~TARGET_GROUP_
    BYTES of payload per shard): one shard is one map_groups task
    holding the whole shard in memory before its single-file write, so
    a constant count makes each task hold corpus/N bytes — OOM at
    scale. The auto-size needs a materialized / read-rooted input for
    its metadata probe (lazy chains get the floor of 16 — pass an
    explicit count there). The chosen count is PINNED to
    ``_NUM_SHARDS.json`` before any shard writes, and reruns reuse the
    pin: shard membership depends on the count, so a resume must never
    re-derive it from a (layout-dependent) size estimate. An explicit
    ``num_shards`` conflicting with an existing pin raises."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        # the manifest is written atomically LAST: its existence stamps
        # the export complete (key out_dir by input fingerprint — the
        # CheckpointManager.stage_dir pattern — to invalidate on change)
        return json.load(open(manifest_path))
    pin_path = os.path.join(out_dir, "_NUM_SHARDS.json")
    pinned = (json.load(open(pin_path))["num_shards"]
              if os.path.exists(pin_path) else None)
    if num_shards is None:
        if pinned is not None:
            num_shards = pinned
        else:
            if any(n.startswith("_shard_") and n.endswith(".json")
                   for n in os.listdir(out_dir)):
                # pre-pin-era partial export: the original count is
                # unrecoverable, and auto-deriving a NEW one would
                # resume six-of-N sidecars under a different membership
                # (verified: duplicated rows, no error). Refuse.
                raise ValueError(
                    f"{out_dir} holds shard sidecars but no "
                    "_NUM_SHARDS.json pin (an export started before "
                    "the pin protocol): pass the original num_shards "
                    "explicitly to resume it, or start a fresh "
                    "out_dir.")
            from ner_ray.stages.neardup import _auto_buckets

            num_shards = _auto_buckets(ds)
    elif pinned is not None and pinned != num_shards:
        raise ValueError(
            f"export at {out_dir} was started with num_shards={pinned} "
            f"but this run requests {num_shards}: shard membership "
            "depends on the count, so resuming would corrupt the "
            "export. Reuse the pinned count or start a fresh out_dir.")
    if pinned is None:
        # O_EXCL claim, not check-then-replace: two concurrent
        # exporters could both derive (different) auto counts — the
        # loser must adopt the winner's pin or abort, never write
        # shards under its own membership
        try:
            fd = os.open(pin_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump({"num_shards": int(num_shards)}, f)
        except FileExistsError:
            won = json.load(open(pin_path))["num_shards"]
            if won != num_shards:
                raise ValueError(
                    f"lost the pin race at {out_dir}: a concurrent "
                    f"export pinned num_shards={won} (this run derived "
                    f"{num_shards}). Re-run to resume under the pinned "
                    "count.") from None
    done = completed_shards(out_dir, num_shards)

    tagged = assign_shards(ds, num_shards, seed=seed, id_col=id_col)
    if done:
        done_ref = ray.put(pa.array(sorted(done), pa.int64()))

        def drop_done(t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(t.column("shard"),
                                      value_set=ray.get(done_ref)))
            return t.filter(mask)

        tagged = tagged.map_batches(drop_done, batch_format="pyarrow")

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g.column("shard")[0].as_py())
        idx = pc.sort_indices(g, sort_keys=[("_order", "ascending"),
                                            (id_col, "ascending")])
        g = g.take(idx).drop_columns(["shard", "_order"])
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(g, tmp)
        os.replace(tmp, path)
        side = {"shard": shard, "rows": len(g),
                "content_fp": _content_fp(g.column(id_col)),
                "file": os.path.basename(path)}
        stmp = _sidecar(out_dir, shard) + f".tmp.{os.getpid()}"
        with open(stmp, "w") as f:
            json.dump(side, f)
        os.replace(stmp, _sidecar(out_dir, shard))
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "rows": pa.array([len(g)], pa.int64())})

    written = tagged.groupby("shard").map_groups(
        write_shard, batch_format="pyarrow").to_pandas()

    shards = []
    for s in range(num_shards):
        sc = _sidecar(out_dir, s)
        shards.append(json.load(open(sc)) if os.path.exists(sc)
                      else {"shard": s, "rows": 0, "content_fp": "0" * 16,
                            "file": None})
    manifest = {
        "num_shards": num_shards, "seed": seed, "id_col": id_col,
        "total_rows": int(sum(x["rows"] for x in shards)),
        "written_this_run": int(written["rows"].sum()) if len(written)
        else 0,
        "shards": shards,
    }
    mtmp = manifest_path + f".tmp.{os.getpid()}"
    with open(mtmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(mtmp, manifest_path)
    return manifest
