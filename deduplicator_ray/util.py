"""Small execution helpers shared by stages."""

from __future__ import annotations


def auto_concurrency(cap: int = 64, floor: int | None = None) -> tuple[int, int]:
    """Actor-pool sizing that follows the cluster.

    Stages that default to a fixed pool (e.g. (2, 8)) silently serialize
    on bigger machines — the single biggest scaling-efficiency leak on a
    32-core node is a CPU-bound pool capped at 8 actors.  ``cap`` bounds
    actor count for stages whose per-actor state is heavy.

    The floor stays at 1: a pipeline can hold several actor-pool stages
    at once, and a fixed-size pool (floor == max) can deadlock the
    streaming executor when the pools' minimum CPU demand exceeds the
    cluster (observed with two pools on a 4-CPU test cluster)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover - defensive
        cpus = 8
    hi = max(2, min(cap, cpus))
    return (floor if floor is not None else 1, hi)


def auto_partitions(minimum: int = 8) -> int:
    """Hash-join/shuffle partition count that follows the cluster."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover - defensive
        cpus = 8
    return max(minimum, cpus)


def isin_sorted(sorted_vals, keys):
    """Membership mask of ``keys`` in a SORTED array — the broadcast
    semi/anti-join primitive every ray.put-ed id-set filter needs
    (used by clean_pipeline drop/semi filters, the neardup exact-mode
    semi, mix_pipeline keep-filter, embed short-list gathers and the
    lsh attach prefilters).  One shared implementation so the
    searchsorted edge cases (empty id set, empty batch, key beyond the
    max) are handled once: returns a bool array aligned with ``keys``;
    all-False when either side is empty."""
    import numpy as np

    keys = np.asarray(keys)
    if len(sorted_vals) == 0 or len(keys) == 0:
        return np.zeros(len(keys), dtype=bool)
    pos = np.minimum(np.searchsorted(sorted_vals, keys),
                     len(sorted_vals) - 1)
    return sorted_vals[pos] == keys


def typed_to_pandas(ds, columns: dict[str, str]):
    """``Dataset.to_pandas()`` that survives Ray 2.49's empty-stream
    schema drop: an all-empty result comes back column-less, so an
    empty frame is rebuilt with the declared column -> dtype map (use
    ``object`` for strings).  Non-empty results pass through untouched."""
    import pandas as pd

    df = ds.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in columns.items()})
    return df
