"""Skew-safe session windows (functions/windows.py session_windows):

* value-equality with a single-process brute-force scan across random
  multi-key data, at several slab widths (including slabs small enough
  to force heavy boundary merging);
* a continuous hot key whose one session spans MANY slabs chain-merges
  back into a single session (the planted-hot-key case: per-(key,slab)
  task rows stay bounded by the slab width, never the key's history);
* slab < gap is rejected (boundary merging would be inexact).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ner_ray.functions.windows import session_windows

GAP = 3600.0


def _brute(df, gap_s=GAP):
    gap = np.timedelta64(int(gap_s * 1e6), "us")
    rows = []
    for k, g in df.groupby("user_id"):
        ts = np.sort(g["ts"].to_numpy())
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            m = sid == s
            rows.append({"user_id": k, "session_start": ts[m].min(),
                         "session_end": ts[m].max(),
                         "n_events": int(m.sum())})
    return pd.DataFrame(rows).sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)


def _collect(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return t.to_pandas().sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)


def _events(n=3000, keys=25, seed=2):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, 30 * 86_400, n) * np.timedelta64(
        1_000_000, "us")
    return pd.DataFrame({"user_id": rng.integers(0, keys, n), "ts": ts})


@pytest.mark.parametrize("slab_s", [None, 4 * GAP, GAP])
def test_matches_brute_force(ray_session, slab_s):
    import ray.data as rd

    df = _events()
    got = _collect(session_windows(
        rd.from_pandas(df).repartition(7), "user_id", "ts", GAP,
        slab_seconds=slab_s))
    want = _brute(df)
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events"]],
        want, check_dtype=False)


def test_hot_key_chain_merge(ray_session):
    import ray.data as rd

    # one hot user with a CONTINUOUS 50-hour event stream (events every
    # 30 min << gap) -> exactly one session, though with slab = gap it
    # spans 50 slabs; plus a sparse user whose every event is isolated
    base = np.datetime64("2024-03-01", "us")
    hot_ts = base + np.arange(100) * np.timedelta64(1800_000_000, "us")
    sparse_ts = base + np.arange(10) * np.timedelta64(
        int(2 * GAP * 1e6) + 1, "us")
    df = pd.DataFrame({
        "user_id": ["hot"] * 100 + ["sparse"] * 10,
        "ts": np.concatenate([hot_ts, sparse_ts]),
    })
    got = _collect(session_windows(
        rd.from_pandas(df).repartition(5), "user_id", "ts", GAP,
        slab_seconds=GAP))
    hot = got[got.user_id == "hot"]
    assert len(hot) == 1
    assert hot.iloc[0]["n_events"] == 100
    assert hot.iloc[0]["session_start"] == hot_ts[0]
    assert hot.iloc[0]["session_end"] == hot_ts[-1]
    assert len(got[got.user_id == "sparse"]) == 10
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events"]],
        _brute(df), check_dtype=False)


def test_slab_validation(ray_session):
    import ray.data as rd

    df = _events(50)
    with pytest.raises(ValueError, match="slab_seconds"):
        session_windows(rd.from_pandas(df), "user_id", "ts", GAP,
                        slab_seconds=GAP / 2)


def test_timestamp_us_unit_aware():
    # regression: an int64 cast of a timestamp yields its NATIVE unit,
    # so a ns column slabbed by a µs divisor put every slab edge ~1000x
    # off — flagging every local session as boundary and rebuilding the
    # unbounded per-key merge group. _timestamp_us must normalize every
    # Arrow unit (incl. pre-epoch values, where truncation-toward-zero
    # would misalign edges).
    from ner_ray.functions.windows import _timestamp_us

    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20 in µs
    for unit, factor in (("s", 10**-6), ("ms", 10**-3), ("us", 1)):
        col = pa.chunked_array([pa.array(
            [int(base_us * factor), 0, int(-86_400_000_000 * factor)],
            pa.timestamp(unit))])
        np.testing.assert_array_equal(
            _timestamp_us(col), [base_us, 0, -86_400_000_000])
    ns = pa.chunked_array([pa.array(
        [base_us * 1000 + 999, 999, -999], pa.timestamp("ns"))])
    # ns floors toward -inf: -999 ns lies in the µs [-1000, 0) -> -1
    np.testing.assert_array_equal(
        _timestamp_us(ns), [base_us, 0, -1])


def test_ns_timestamps_slab_boundedly(ray_session):
    import ray.data as rd

    # ns-typed column (the pandas default): results must match brute
    # force AND the slab decomposition must actually engage — with the
    # unit bug every event landed in mega-slabs, all sessions became
    # boundary sessions, and the hot key's history re-unified.
    df = _events(800, keys=5)
    df["ts"] = df["ts"].astype("datetime64[ns]")
    got = _collect(session_windows(
        rd.from_pandas(df).repartition(5), "user_id", "ts", GAP,
        slab_seconds=4 * GAP))
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events"]],
        _brute(df), check_dtype=False)
