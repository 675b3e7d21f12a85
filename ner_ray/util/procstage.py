"""Per-worker-process stage instances for task-based map_batches.

An actor-pool stage pays a fresh process fork + module import + state
build EVERY time its pool spins up — once per stage per pipeline run
(measured ~3-5 s per pool on this sandbox, the dominant fixed cost of
multi-stage chains like curate_pretrain whose per-batch work is light).
Plain task-based ``map_batches`` instead runs on the session's warm,
REUSED worker processes: imports are paid once per worker for the whole
session, and the streaming executor scales tasks freely.

``stage_fn`` keeps the ergonomic stage-class shape (state in
``__init__``, work in ``__call__``) while shipping as a task function:
the instance is built once per (class, kwargs) per worker process and
cached in a module global. Use it for stages whose state is CHEAP to
build and safe to share within a process (compiled regexes, stopword
profiles, tag tables). Stages holding heavy broadcast state (CRF
models, eval-hash sets) should stay actor pools — their spin-up is
amortized by real per-batch work, and ``fn_constructor_kwargs`` keeps
the ray.put ref plumbing explicit.
"""

from __future__ import annotations

_CACHE: dict = {}


class _StageFn:
    """Callable object (NOT a class — Ray Data would treat a class as
    an actor stage) that lazily builds ``cls(**kwargs)`` once per
    worker process. Plain-picklable: state is just (cls, kwargs
    tuple), so it survives std pickle as well as cloudpickle."""

    __slots__ = ("cls", "kwargs")

    def __init__(self, cls, kwargs: tuple):
        self.cls, self.kwargs = cls, kwargs

    def __reduce__(self):
        return (_StageFn, (self.cls, self.kwargs))

    def __call__(self, batch):
        key = (self.cls, self.kwargs)
        inst = _CACHE.get(key)
        if inst is None:
            inst = _CACHE.setdefault(key, self.cls(**dict(self.kwargs)))
        return inst(batch)


def stage_fn(cls, /, **kwargs):
    """A picklable batch function that lazily builds ``cls(**kwargs)``
    once per worker process (kwargs must be hashable)."""
    return _StageFn(cls, tuple(sorted(kwargs.items())))
