"""timeline_dedup run-compression, scope decide rules, host_reach BFS."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from deduplicator_ray.stages.scope import scope_annotate, scope_filter, scope_sql_exprs
from deduplicator_ray.stages.timeline import timeline_dedup


def _caps_table():
    # url A: digests a a b b a  -> 3 stored versions (revert = new run)
    # url B: single capture
    # url C: two captures, ts TIE broken by digest ('x' < 'y')
    rows = [
        ("A", 10, "a"), ("A", 20, "a"), ("A", 30, "b"),
        ("A", 40, "b"), ("A", 50, "a"),
        ("B", 10, "q"),
        ("C", 10, "y"), ("C", 10, "x"),
    ]
    return pd.DataFrame(rows, columns=["url_canonical", "ts_epoch", "digest"])


def _brute_timeline(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for url, g in df.sort_values(["url_canonical", "ts_epoch", "digest"]).groupby(
            "url_canonical"):
        prev, run = None, None
        for _, r in g.iterrows():
            if prev is None or r["digest"] != prev:
                if run is not None:
                    out.append(run)
                run = [url, r["ts_epoch"], r["digest"], 0]
            else:
                run[3] += 1
            prev = r["digest"]
        out.append(run)
    return pd.DataFrame(out, columns=["url_canonical", "ts_epoch", "digest",
                                      "n_skipped"])


def test_timeline_dedup_runs_and_ties(ray_session):
    import ray.data as rd

    pdf = _caps_table()
    got = (timeline_dedup(rd.from_pandas(pdf), num_partitions=3)
           .to_pandas()
           .sort_values(["url_canonical", "ts_epoch", "digest"],
                        ignore_index=True))
    want = _brute_timeline(pdf).sort_values(
        ["url_canonical", "ts_epoch", "digest"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got.astype({"ts_epoch": "int64", "n_skipped": "int64"}), want.astype(
            {"ts_epoch": "int64", "n_skipped": "int64"}))
    # A stores 3 versions (a-run, b-run, reverted a-run)
    assert (got["url_canonical"] == "A").sum() == 3
    a = got[got["url_canonical"] == "A"].sort_values("ts_epoch")
    assert a["n_skipped"].tolist() == [1, 1, 0]
    # C's ts tie: digest-ordered ('x' first), digests differ -> two runs
    c = got[got["url_canonical"] == "C"]
    assert c["digest"].tolist() == ["x", "y"]
    assert c["n_skipped"].tolist() == [0, 0]


RULES = [
    ("accept", "prefix", "good."),
    ("reject", "regex", "/private"),
    ("accept", "prefix", "good.example/private/ok"),
]


def _brute_scope(url: str) -> tuple[bool, int]:
    import re

    decided = -1
    for i, (_a, kind, pat) in enumerate(RULES):
        hit = url.startswith(pat) if kind == "prefix" else bool(
            re.search(pat, url))
        if hit:
            decided = i
    accepted = decided >= 0 and RULES[decided][0] == "accept"
    return accepted, decided


def test_scope_last_match_wins(ray_session):
    import ray.data as rd

    urls = [
        "good.example/a",              # rule 0 accept
        "good.example/private/x",      # rule 1 rejects after rule 0
        "good.example/private/ok/y",   # rule 2 re-accepts
        "other.example/private/x",     # rule 1 reject (never accepted)
        "other.example/ok",            # no rule: default reject
    ]
    pdf = pd.DataFrame({"url_canonical": urls, "k": range(len(urls))})
    got = (scope_annotate(rd.from_pandas(pdf), RULES, keep_cols=("k",))
           .to_pandas().sort_values("k", ignore_index=True))
    want = [_brute_scope(u) for u in urls]
    assert got["accepted"].tolist() == [w[0] for w in want]
    assert got["decided_by"].tolist() == [w[1] for w in want]

    kept = (scope_filter(rd.from_pandas(pdf), RULES, keep_cols=("k",))
            .to_pandas())
    assert sorted(kept["k"]) == [0, 2]


def test_scope_sql_mirror_agrees():
    import duckdb

    urls = ["good.example/a", "good.example/private/x",
            "good.example/private/ok/y", "other.example/private/x",
            "other.example/ok", "good."]
    accepted, decided = scope_sql_exprs(RULES, "u")
    rows = duckdb.sql(
        f"SELECT {accepted} AS a, {decided} AS d FROM (SELECT unnest("
        f"{urls!r}) AS u)").fetchall()
    want = [_brute_scope(u) for u in urls]
    assert [(bool(a), d) for a, d in rows] == want


def test_scope_rejects_bad_rules():
    with pytest.raises(ValueError):
        scope_sql_exprs([("allow", "prefix", "x")], "u")
    with pytest.raises(ValueError):
        scope_sql_exprs([("accept", "glob", "x")], "u")


def test_host_reach_toy(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.graph import host_reach

    # s -> a (w3), s -> b (w2), s -> c (w1): top_m=2 keeps a,b only.
    # a -> d, b -> e, e -> f; island g unreachable.
    edges = pd.DataFrame(
        [("s", "a", 3), ("s", "b", 2), ("s", "c", 1),
         ("a", "d", 1), ("b", "e", 1), ("e", "f", 1), ("g", "g", 5)],
        columns=["src_host", "dst_host", "n_links"])
    got = host_reach(rd.from_pandas(edges), ["s"], max_hops=3, top_m=2)
    want = {"s": 0, "a": 1, "b": 1, "d": 2, "e": 2, "f": 3}
    assert dict(zip(got["host"], got["hops"])) == want
    assert got["hops"].dtype == np.int64

    # max_hops truncates; seed absent from the graph still reports 0
    got2 = host_reach(rd.from_pandas(edges), ["s", "zz"], max_hops=1,
                      top_m=2)
    assert dict(zip(got2["host"], got2["hops"])) == {
        "s": 0, "zz": 0, "a": 1, "b": 1}


def test_capture_burst_two_pointer(ray_session):
    """Site a: 3 captures inside one 60 s window + a straggler; site b:
    evenly spread, never 2 in a window; identical-ts duplicates count."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.timeline import capture_burst

    caps = pd.DataFrame({
        "url_canonical": ["a.example/p"] * 5 + ["b.example/q"] * 3,
        "ts_epoch": [1000, 1000, 1030, 1059, 1300,   # 4 in [1000,1060)
                     2000, 2100, 2200],
    })
    out = (capture_burst(rd.from_pandas(caps), window=60, num_partitions=3)
           .to_pandas().set_index("site"))
    assert out.loc["a.example", "max_burst"] == 4
    assert out.loc["a.example", "n_captures"] == 5
    assert out.loc["b.example", "max_burst"] == 1
    # window is half-open: ts 1059 is in, a ts at exactly 1060 would not be
    caps2 = pd.DataFrame({
        "url_canonical": ["c.example/r"] * 2, "ts_epoch": [1000, 1060]})
    out2 = (capture_burst(rd.from_pandas(caps2), window=60)
            .to_pandas().set_index("site"))
    assert out2.loc["c.example", "max_burst"] == 1


def test_keep_n_versions_rank_and_cut(ray_session):
    """Newest-N retention: ranks are newest-first 1-based, the cut drops
    older captures, ties on ts break by digest, pages with < N captures
    keep everything."""
    import ray.data as rd

    from deduplicator_ray.stages.timeline import keep_n_versions

    pdf = pd.DataFrame({
        "url_canonical": ["p"] * 4 + ["q"] * 2 + ["r"],
        "ts_epoch": [10, 20, 30, 30, 5, 6, 1],
        "digest": ["d1", "d2", "d3", "d0", "e1", "e2", "f1"],
    })
    got = (keep_n_versions(rd.from_pandas(pdf), 2)
           .to_pandas().sort_values(["url_canonical", "version_rank"],
                                    ignore_index=True))
    p = got[got["url_canonical"] == "p"]
    # ts=30 tie -> digest asc: d0 ranks 1, d3 ranks 2; 10/20 dropped
    assert p[["ts_epoch", "digest", "version_rank"]].values.tolist() == [
        [30, "d0", 1], [30, "d3", 2]]
    q = got[got["url_canonical"] == "q"]
    assert q[["ts_epoch", "version_rank"]].values.tolist() == [[6, 1], [5, 2]]
    r = got[got["url_canonical"] == "r"]
    assert r[["ts_epoch", "version_rank"]].values.tolist() == [[1, 1]]


def test_revisit_schedule_rules(ray_session):
    """Volatile page -> mean change interval; stable page -> max;
    single capture -> max; clamps apply at both ends."""
    import ray.data as rd

    from deduplicator_ray.stages.timeline import (_REVISIT_MAX_S,
                                                  _REVISIT_MIN_S,
                                                  revisit_schedule)

    day = 86400
    pdf = pd.DataFrame({
        "url_canonical": (["vol"] * 4) + (["stable"] * 3) + ["once"]
                          + (["fast"] * 3),
        "ts_epoch": [0, day, 2 * day, 3 * day,
                     0, day, 2 * day,
                     50,
                     0, 60, 120],
        "digest": ["a", "b", "c", "d",
                   "s", "s", "s",
                   "x",
                   "p", "q", "r"],
    })
    got = (revisit_schedule(rd.from_pandas(pdf)).to_pandas()
           .set_index("url_canonical"))
    v = got.loc["vol"]
    assert v["n_captures"] == 4 and v["n_changes"] == 3
    assert v["suggested_interval_s"] == day          # span 3d / 3 changes
    s = got.loc["stable"]
    assert s["n_changes"] == 0
    assert s["suggested_interval_s"] == _REVISIT_MAX_S
    assert got.loc["once", "suggested_interval_s"] == _REVISIT_MAX_S
    f = got.loc["fast"]                              # 120s span / 2 changes
    assert f["suggested_interval_s"] == _REVISIT_MIN_S   # clamped up
