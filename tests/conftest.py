"""Shared pytest fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

import signal

import pytest

# Ray 2.49 occasionally wedges its streaming executor on this sandbox
# (observed twice: a ReadParquet task futex-parked; a Sort op's
# boundary sampling blocking the scheduling loop) — the test then
# waits forever on get_output_blocking. The slowest healthy test is
# ~4 min at 4 CPUs on the fast reference host; at 14 min we raise in
# the main thread so the test FAILS with a stack instead of hanging
# the suite (pytest.ini's faulthandler_timeout=900 stays as the
# dump-only backstop). The limit scales with the host's measured
# per-core speed — BASELINE.md records ~6.5x swings between windows,
# and a healthy slow-window test must not trip the wedge guard.
# SIGALRM interrupts the main thread's condition wait; the wedged
# executor thread may poison later tests in the same session, but a
# loud cascade still beats a silent hang.


def _stall_limit_s() -> int:
    import time

    import numpy as np

    a = np.random.default_rng(0).random(2_000_000)
    (a * a).sum()  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        float((a * a).sum())
    solo = time.perf_counter() - t0
    ref = 0.005  # this kernel on the fast reference host
    return int(min(3600, 840 * max(1.0, solo / ref)))


_STALL_LIMIT_S = _stall_limit_s()


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    def _alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded {_STALL_LIMIT_S}s — "
            "Ray-internal stall guard (see conftest.py)")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(_STALL_LIMIT_S)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_dir() -> str:
    from ner_ray.fixtures.gen import ensure_fixtures

    return ensure_fixtures("tiny")


@pytest.fixture(scope="session")
def small_dir() -> str:
    from ner_ray.fixtures.gen import ensure_fixtures

    return ensure_fixtures("small")
