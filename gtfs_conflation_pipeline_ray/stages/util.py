"""Shared stage utilities."""

from __future__ import annotations

import ray


def pool_size(requested: int | None = None, reserve: int = 2, cap: int = 16) -> int:
    """Actor-pool size that never starves the task operators feeding it.

    An actor pool reserving every cluster CPU deadlocks the streaming
    executor (read/write tasks get no slots). Leave ``reserve`` CPUs for the
    task operators; cap to keep per-actor state duplication bounded.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    auto = max(1, min(cap, cpus - reserve))
    if requested is None:
        return auto
    return max(1, min(requested, auto))
