"""Actor-pool sizing: clamp fixed pools so task operators never starve.

A Ray Data actor-pool stage with a FIXED pool of >= all cluster CPUs can
deadlock a small session: the pool's actors reserve every CPU slot before
the upstream read/map task produces any input, so the stage waits on input
forever while the input waits on a CPU (observed: a 4-actor fixed pool at
``ray.init(num_cpus=4)`` hangs indefinitely on any input). Every library
helper that builds an actor pool routes its requested size through
:func:`clamp_pool`, which caps a FIXED size (and an autoscaling minimum)
at ``cluster_CPUs - reserve`` so at least ``reserve`` CPU slots stay free
for task operators. On any cluster big enough for the caller's request the
value passes through unchanged.
"""

from __future__ import annotations

__all__ = ["clamp_pool"]


def _cluster_cpus(default: int = 8) -> int:
    import ray

    if not ray.is_initialized():
        # pool built before auto-init: assume a small session; the clamp
        # re-derives nothing at execution time, so callers constructing
        # pipelines pre-init get the conservative default.
        return default
    return int(ray.cluster_resources().get("CPU", default))


def clamp_pool(
    concurrency: int | tuple[int, int] | None,
    *,
    num_cpus: float = 1.0,
    reserve: int = 2,
) -> int | tuple[int, int]:
    """Clamp an actor-pool ``concurrency`` request to the current cluster.

    - ``None``: the library default — a FIXED pool of ``CPUs - reserve``
      (measured fastest for fused text stages; see BASELINE.md), floor 1.
    - ``int`` (fixed pool): capped at ``(CPUs - reserve) / num_cpus`` so the
      pool can never reserve every CPU slot (deadlock on small sessions).
    - ``(min, max)`` (autoscaling): only ``min`` is capped — a too-large
      ``max`` cannot deadlock, the executor simply never scales that far.
    """
    total = _cluster_cpus()
    cap = max(1, int((total - reserve) / max(num_cpus, 1e-9)))
    if concurrency is None:
        return max(1, min(max(2, total - reserve), cap))
    if isinstance(concurrency, tuple):
        lo, hi = concurrency
        lo = max(1, min(int(lo), cap))
        return (lo, max(int(hi), lo))
    return max(1, min(int(concurrency), cap))
