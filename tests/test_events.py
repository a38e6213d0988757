"""Funnel analytics (stages/events.py): strict-order semantics and
oracle parity for the registered query.
"""

from __future__ import annotations

import pandas as pd
import pytest


def _ev(user, ts_s, typ):
    return {"user_id": user, "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=ts_s),
            "event_type": typ}


def test_funnel_strict_order(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.events import funnel_counts

    rows = [
        # u1 completes in order
        _ev(1, 10, "view"), _ev(1, 20, "click"), _ev(1, 30, "purchase"),
        # u2 clicks BEFORE viewing, never clicks after -> stops at view
        _ev(2, 15, "click"), _ev(2, 20, "view"), _ev(2, 25, "purchase"),
        # u3 views only
        _ev(3, 5, "view"),
        # u4 purchase first then the rest in order -> completes (greedy
        # anchors at first view=40, click=50, purchase must be > 50: none
        _ev(4, 35, "purchase"), _ev(4, 40, "view"), _ev(4, 50, "click"),
        # u5: same-timestamp click as view -> strict > excludes it
        _ev(5, 60, "view"), _ev(5, 60, "click"),
        # noise type
        _ev(1, 1, "error"),
    ]
    out = funnel_counts(rd.from_pandas(pd.DataFrame(rows)),
                        ("view", "click", "purchase"), num_partitions=4)
    by = out.set_index("step")["n_users"]
    assert by[1] == 5          # u1..u5 all view
    assert by[2] == 2          # u1 (20>10), u4 (50>40); u2 no click after 20
    assert by[3] == 1          # only u1 purchases after their click
    assert list(out["event_type"]) == ["view", "click", "purchase"]


def test_funnel_repeated_step_type(ray_session):
    """view -> view funnel: second view must be strictly later."""
    import ray.data as rd

    from deduplicator_ray.stages.events import funnel_counts

    rows = [
        _ev(1, 10, "view"), _ev(1, 11, "view"),
        _ev(2, 10, "view"),
    ]
    out = funnel_counts(rd.from_pandas(pd.DataFrame(rows)),
                        ("view", "view"), num_partitions=2)
    by = out.set_index("step")["n_users"]
    assert by[1] == 2 and by[2] == 1


def test_retention_cohorts_crafted(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.events import retention_cohorts

    day = 86400
    users = [1, 1, 1, 2, 2, 3, 3]
    # u1: first in epoch-week 0, active weeks 0 and 2; u2: week 0 only
    # (two events -> still 1 user); u3: first week 1, active weeks 1, 2
    days = [1, 15, 16, 2, 3, 8, 14]
    df = pd.DataFrame({
        "user_id": users,
        "ts": pd.to_datetime([d * day for d in days], unit="s"),
    })
    out = retention_cohorts(rd.from_pandas(df), num_partitions=3)
    got = {(r.cohort, r.offset): r.n_users for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}


def test_retention_oracle_parity(ray_session, sf_dir):
    import duckdb

    from deduplicator_ray.pipelines.queries_rel import registry_rel

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from read_parquet('{sf_dir}/events.parquet')"
    )
    fn, sql = registry_rel()["retention_cohorts"]
    got = fn(sf_dir)
    want = con.execute(sql).df().sort_values(
        ["cohort", "offset"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con.close()


def test_funnel_oracle_parity(ray_session, sf_dir):
    import duckdb

    from deduplicator_ray.pipelines.queries_rel import registry_rel

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from read_parquet('{sf_dir}/events.parquet')"
    )
    fn, sql = registry_rel()["funnel_counts"]
    got = fn(sf_dir)
    want = con.execute(sql).df().sort_values("step", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con.close()


def test_window_active_users_exact_distinct(ray_session):
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.events import window_active_users

    # window 10 s, hop 5 s -> each event in 2 windows
    ts = pd.to_datetime([0, 3, 7, 12], unit="s")
    pdf = pd.DataFrame({"user_id": [1, 1, 2, 1], "ts": ts})
    got = (window_active_users(rd.from_pandas(pdf).repartition(3),
                               window_s=10, hop_s=5, num_partitions=2)
           .to_pandas().set_index("window_epoch").sort_index())
    # windows: ev@0 -> {-5, 0}; ev@3 -> {-5, 0}; ev@7 -> {0, 5}; ev@12 -> {5, 10}
    assert got.loc[-5].tolist() == [2, 1]   # two events, one user
    assert got.loc[0].tolist() == [3, 2]    # users {1, 2}
    assert got.loc[5].tolist() == [2, 2]
    assert got.loc[10].tolist() == [1, 1]
