"""Small shared helpers for Ray Data stages."""

from __future__ import annotations

import os


def auto_concurrency(lo: int = 2, hi: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool size for ``map_batches(Cls, concurrency=...)``.

    Returns ``(lo, hi)`` where ``hi`` defaults to the cluster CPU count
    (or ``os.cpu_count()`` before ``ray.init``), so cheap broadcast-
    lookup stages start small but can scale to the node instead of being
    pinned at a hardcoded pool of 2.
    """
    if hi is None:
        hi = 0
        try:
            import ray

            if ray.is_initialized():
                hi = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            pass
        if hi <= 0:
            hi = os.cpu_count() or 4
    return (min(lo, hi), max(lo, hi))
