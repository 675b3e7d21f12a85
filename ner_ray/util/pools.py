"""Actor-pool sizing from the live CPU budget.

A hard-coded ``concurrency=(1, 4)`` caps a per-doc-heavy stage (HTML
parse, BPE encode, the fused quality filter) at 4 actors on a 32-core
node — measured as the dominant scaling loss in the curate chain
(8-vs-32 efficiency 0.62 before, see BASELINE.md). Pools here scale
their MAX with the cluster while keeping min=1, leaving the streaming
executor free to autoscale down; ``frac`` reserves headroom for the
task operators (reads, combiners, shuffles) that share the budget —
the flagship's measured sweet spot is pools <= ~3/4 of CPUs.
"""

from __future__ import annotations


def auto_pool(frac: float = 0.75, floor: int = 2,
              cap: int | None = None) -> tuple[int, int]:
    """(1, max_actors) with max = clamp(frac * cluster CPUs)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    hi = max(floor, int(cpus * frac)) if cpus else max(floor, 4)
    if cap is not None:
        hi = min(hi, cap)
    return (1, hi)
