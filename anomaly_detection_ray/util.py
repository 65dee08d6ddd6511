"""Small shared helpers for stage sizing."""

from __future__ import annotations


def pool(concurrency: int | tuple[int, int] | None = None) -> tuple[int, int]:
    """Normalize a concurrency spec into an autoscaling actor-pool range.

    ``(max(1, N//4), N)``: the floor gives big pools a running start —
    Ray's autoscaler ramps from the floor only as CPUs free up, and a
    floor of 1 left a 30-actor scoring pool at ~25% utilization for the
    first half of an HC run. N//4 keeps ≥3/4 of the CPUs free for the
    upstream read/shuffle tasks, so chained actor-pool stages still can't
    reserve every CPU and starve the other stages (the deadlock the Ray
    guide warns about — we hit it with FIXED pools on a 4-CPU session;
    at 4 CPUs the floor is 1, same as before)."""
    if isinstance(concurrency, tuple):
        return concurrency
    if concurrency is None:
        import ray

        n = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    else:
        n = int(concurrency)
    n = max(1, n)
    return (max(1, n // 4), n)
