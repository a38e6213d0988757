"""Small execution helpers shared by stages."""

from __future__ import annotations


def auto_concurrency(cap: int = 64, floor: int = 1) -> tuple[int, int]:
    """Actor-pool sizing that follows the cluster: (floor, min(cap, CPUs)).

    Stages that default to a fixed pool (e.g. (2, 8)) silently serialize
    on bigger machines — the single biggest scaling-efficiency leak on a
    32-core node is a CPU-bound pool capped at 8 actors.  ``cap`` bounds
    actor count for stages whose per-actor state is heavy."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover - defensive
        cpus = 8
    return (floor, max(2, min(cap, cpus)))
