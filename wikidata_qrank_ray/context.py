"""Execution-context helpers."""

from __future__ import annotations

import ray


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so the pool can never reserve every CPU of
    the session: a pool that holds all slots starves the upstream read /
    downstream reduce stages and the streaming pipeline deadlocks (observed
    with concurrency=4 on a 4-CPU test session). Always leaves >= 2 CPUs."""
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", requested + 2))
    else:
        cpus = requested + 2
    return max(1, min(requested, cpus - 2))
