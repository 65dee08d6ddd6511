"""Small shared helpers for stage sizing."""

from __future__ import annotations


def pool(concurrency: int | tuple[int, int] | None = None) -> tuple[int, int]:
    """Normalize a concurrency spec into an autoscaling actor-pool range.

    Always ``(1, N)``: pools start at one actor and grow only when CPUs
    are actually free, so chained actor-pool stages can never reserve
    every CPU and starve the read/shuffle tasks (the deadlock the Ray
    guide's 'a pool that reserves every CPU starves the other stages'
    warning describes — we hit it with fixed-size pools on a 4-CPU
    session)."""
    if isinstance(concurrency, tuple):
        return concurrency
    if concurrency is None:
        import ray

        n = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    else:
        n = int(concurrency)
    return (1, max(1, n))
