"""Ordered-sequence analytics over event streams.

``funnel_counts``: classic K-step funnel — how many users performed
step 1, then step 2 STRICTLY AFTER their first step-1 event, then step 3
strictly after that, and so on (each step anchored at the EARLIEST
qualifying time, the standard greedy funnel semantics — greedy earliest
anchoring is optimal for "did the user complete the sequence": taking
the minimal qualifying time at every step dominates any other choice).

Distribution: one hash-bucket shuffle on user id (the partitioning
assumption: a user's full timeline fits one bucket — same contract as
sessionization), a vectorized pandas kernel per bucket (sort + per-step
groupby-min joins, never per-user Python), and a steps-sized partial
count per bucket summed on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deduplicator_ray.stages.exact import hash_bucket
from deduplicator_ray.util import auto_partitions


def funnel_counts(events, steps: tuple[str, ...], *,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  num_partitions: int | None = None) -> pd.DataFrame:
    """-> DataFrame (step BIGINT 1-based, event_type, n_users BIGINT).

    ``n_users`` at step k = users with events e_1 < e_2 < ... < e_k in
    strict time order where e_i has type steps[i-1].
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    P = num_partitions or auto_partitions()
    step_set = list(dict.fromkeys(steps))  # prune the scan to funnel types

    def prune(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(b[type_col], value_set=pa.array(step_set))
        t = b.filter(m)
        return pa.table({user_col: t[user_col], ts_col: t[ts_col],
                         type_col: t[type_col]})

    pruned = events.map_batches(prune, batch_format="pyarrow",
                                zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        counts = []
        anchor = None  # Series: user -> anchor ts of previous step
        for k, st in enumerate(steps):
            sub = df.loc[df[type_col] == st, [user_col, ts_col]]
            if k > 0:
                sub = sub.join(anchor.rename("_prev"), on=user_col,
                               how="inner")
                sub = sub[sub[ts_col] > sub["_prev"]]
            anchor = sub.groupby(user_col)[ts_col].min()
            counts.append(len(anchor))
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": list(steps),
            "n_users": np.asarray(counts, dtype=np.int64),
        })

    parts = (hash_bucket(pruned, user_col, P)
             .groupby("_part")
             .map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    out = parts.groupby(["step", "event_type"], as_index=False).agg(
        n_users=("n_users", "sum"))
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("step", ignore_index=True)


def retention_cohorts(events, *, user_col: str = "user_id",
                      ts_col: str = "ts",
                      num_partitions: int | None = None) -> pd.DataFrame:
    """Weekly retention matrix: (cohort, offset, n_users).

    cohort = epoch-week index of the user's FIRST event
    (``(first_epoch_s // 86400) // 7`` — pure integer arithmetic, no
    calendar/timezone semantics to drift between engines); offset =
    event's epoch-week minus cohort; n_users = distinct users of that
    cohort active at that offset.

    One hash-bucket shuffle on user id (a user's full timeline in one
    bucket, as funnel/sessionize assume), per-bucket vectorized kernel,
    exact distinct counts because a user never spans buckets.
    """
    P = num_partitions or auto_partitions()

    def project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ep = pc.divide(pc.cast(b[ts_col].cast(pa.timestamp("us")),
                               pa.int64()), 1_000_000)
        return pa.table({user_col: b[user_col], "_ep": ep})

    pruned = events.map_batches(project, batch_format="pyarrow",
                                zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ep = df["_ep"].to_numpy(np.int64)
        wk = (ep // 86400) // 7
        u = df[user_col].to_numpy()
        first = pd.Series(wk).groupby(u).transform("min").to_numpy(np.int64)
        g = pd.DataFrame({
            "cohort": first, "offset": wk - first, user_col: u,
        }).drop_duplicates()
        out = g.groupby(["cohort", "offset"], as_index=False).agg(
            n_users=(user_col, "nunique"))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    parts = (hash_bucket(pruned, user_col, P)
             .groupby("_part")
             .map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    out = parts.groupby(["cohort", "offset"], as_index=False).agg(
        n_users=("n_users", "sum"))
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort", "offset"], ignore_index=True)


def window_active_users(events, *, window_s: int = 3600, hop_s: int = 900,
                        user_col: str = "user_id", ts_col: str = "ts",
                        num_partitions: int | None = None):
    """Exact active users + event counts per hopping window -> Dataset
    (window_epoch BIGINT, n_events BIGINT, n_users BIGINT).

    Each event lands in window_s/hop_s overlapping windows (vectorized
    np.repeat explode, same shape as the hopping-count query); the
    within-batch partial reduces to one (window, user) row per batch
    carrying that pair's event count, so the ONE window-key shuffle is
    bounded by distinct (window, user) pairs per batch and the per-bucket
    distinct is exact (a window's whole user universe shares a bucket).
    """
    import pyarrow.compute as pc

    P = num_partitions or auto_partitions()
    k = window_s // hop_s

    def partial(b: pa.Table) -> pd.DataFrame:
        epoch = pc.divide(
            pc.cast(b[ts_col].cast(pa.timestamp("us")), pa.int64()),
            1_000_000)
        tse = epoch.to_numpy(zero_copy_only=False)
        uid = b[user_col].to_numpy(zero_copy_only=False)
        base = tse // hop_s
        offs = np.arange(k, dtype=np.int64)
        win = ((np.repeat(base, k) - np.tile(offs, len(tse))) * hop_s
               ).astype(np.int64)
        df = pd.DataFrame({"w": win, "u": np.repeat(uid, k)})
        g = df.groupby(["w", "u"], as_index=False).size().rename(
            columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    pruned = events.map_batches(partial, batch_format="pyarrow",
                                batch_size=65536)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["w", "u"], as_index=False).agg(n=("n", "sum"))
        out = g.groupby("w", sort=False).agg(
            n_events=("n", "sum"), n_users=("u", "size")).reset_index()
        out = out.rename(columns={"w": "window_epoch"})
        return out.astype({"window_epoch": "int64", "n_events": "int64",
                           "n_users": "int64"})

    return (hash_bucket(pruned, "w", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))
