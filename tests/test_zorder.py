"""zorder_write: every clustered column's per-file footprint shrinks
vs a single-column sort (which only prunes its leading column), and
the rows survive the reshuffle intact."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def xy(ray_session):
    rng = np.random.default_rng(17)
    n = 40_000
    return pa.table({"x": rng.uniform(0, 1000, n),
                     "y": rng.uniform(0, 1000, n),
                     "payload": np.arange(n, dtype=np.int64)})


def test_zorder_prunes_both_columns(ray_session, xy, tmp_path):
    import ray.data as rd

    from ner_ray.sources.zorder import pruning_stats, zorder_write

    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    ds = rd.from_arrow(xy).repartition(16)
    zorder_write(ds, zdir, ["x", "y"])
    # baseline: plain sort by x only
    ds.sort("x").write_parquet(sdir)

    z = pruning_stats(zdir, ["x", "y"])
    s = pruning_stats(sdir, ["x", "y"])
    assert z["n_files"] > 1 and s["n_files"] > 1
    # plain x-sort: x footprint tiny, y footprint ~the full range
    assert s["y"] > 0.9
    # z-order: BOTH columns' footprints shrink well below full width
    assert z["x"] < 0.5 and z["y"] < 0.5, (z, s)


def test_zorder_preserves_rows(ray_session, xy, tmp_path):
    import ray.data as rd

    from ner_ray.sources.zorder import zorder_write

    out = str(tmp_path / "z2")
    zorder_write(rd.from_arrow(xy).repartition(8), out, ["x", "y"])
    back = rd.read_parquet(out)
    assert back.count() == xy.num_rows
    got = sorted(b for batch in back.iter_batches(batch_format="pyarrow")
                 for b in batch.column("payload").to_pylist())
    assert got == list(range(xy.num_rows))
