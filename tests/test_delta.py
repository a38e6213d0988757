"""Snapshot-delta operators: crawl_delta, content_provenance,
host_dedup_savings (stages/delta.py)."""

from __future__ import annotations

import pandas as pd

from deduplicator_ray.stages.delta import (
    content_provenance,
    crawl_delta,
    host_dedup_savings,
)


def _caps(rows):
    df = pd.DataFrame(
        rows, columns=["url", "url_canonical", "crawl", "ts_epoch", "digest", "text"]
    )
    return df


def test_crawl_delta_statuses(ray_session):
    import ray.data as rd

    pdf = _caps([
        # unchanged: latest digests equal (history latest is d2 at ts=20)
        ("http://h/a", "a", "history", 10, "d1", "x"),
        ("http://h/a", "a", "history", 20, "d2", "y"),
        ("http://h/a", "a", "current", 30, "d2", "y"),
        # changed
        ("http://h/b", "b", "history", 10, "d1", "x"),
        ("http://h/b", "b", "current", 30, "d9", "z"),
        # gone
        ("http://h/c", "c", "history", 10, "d1", "x"),
        # new
        ("http://h/d", "d", "current", 30, "d7", "w"),
        # ts TIE on the history side: latest = digest-desc winner ('dB')
        ("http://h/e", "e", "history", 10, "dA", "p"),
        ("http://h/e", "e", "history", 10, "dB", "q"),
        ("http://h/e", "e", "current", 30, "dA", "p"),
    ])
    got = (crawl_delta(rd.from_pandas(pdf), num_partitions=3)
           .to_pandas().set_index("url_canonical").sort_index())
    assert got.loc["a", "status"] == "unchanged"
    assert got.loc["b", "status"] == "changed"
    assert got.loc["c", "status"] == "gone"
    assert got.loc["c", "cur_digest"] == ""
    assert got.loc["c", "cur_epoch"] == -1
    assert got.loc["d", "status"] == "new"
    assert got.loc["d", "hist_epoch"] == -1
    assert got.loc["e", "hist_digest"] == "dB"
    assert got.loc["e", "status"] == "changed"
    assert got["hist_epoch"].dtype == "int64"


def test_crawl_delta_partial_combine_is_idempotent(ray_session):
    """Splitting the same page across many blocks must not change the
    elected latest capture (the within-batch partial keeps the same
    (ts, digest)-max rule the bucket reduce applies)."""
    import ray.data as rd

    rows = [("http://h/p", "p", "current", ts, f"d{ts % 3}", "t")
            for ts in range(100)]
    rows += [("http://h/p", "p", "history", 5, "dh", "t")]
    pdf = _caps(rows)
    one = crawl_delta(rd.from_pandas(pdf), num_partitions=2).to_pandas()
    many = crawl_delta(
        rd.from_pandas(pdf).repartition(20), num_partitions=2).to_pandas()
    assert one.equals(many.reset_index(drop=True)) or (
        one.sort_values("url_canonical").reset_index(drop=True).equals(
            many.sort_values("url_canonical").reset_index(drop=True)))
    assert one.loc[0, "cur_epoch"] == 99
    assert one.loc[0, "cur_digest"] == "d0"  # 99 % 3


def test_content_provenance_origin_and_spread(ray_session):
    import ray.data as rd

    pdf = _caps([
        # digest D on 3 hosts; earliest ts=5 on host b.example
        ("http://b.example/1", "b1", "current", 5, "D", "t"),
        ("http://a.example/1", "a1", "current", 10, "D", "t"),
        ("http://c.example/1", "c1", "current", 20, "D", "t"),
        ("http://a.example/2", "a2", "current", 30, "D", "t"),
        # digest E on one host only -> filtered by min_hosts=2
        ("http://a.example/3", "a3", "current", 10, "E", "u"),
        # digest F: ts tie at 7 -> host-asc tiebreak picks a.example
        ("http://z.example/4", "z4", "current", 7, "F", "v"),
        ("http://a.example/4", "a4", "current", 7, "F", "v"),
    ])
    got = (content_provenance(rd.from_pandas(pdf), num_partitions=3)
           .to_pandas().set_index("digest").sort_index())
    assert list(got.index) == ["D", "F"]
    assert got.loc["D", "origin_host"] == "b.example"
    assert got.loc["D", "origin_epoch"] == 5
    assert got.loc["D", "n_hosts"] == 3
    assert got.loc["D", "n_captures"] == 4
    assert got.loc["F", "origin_host"] == "a.example"


def test_host_dedup_savings_exact_chars(ray_session):
    import ray.data as rd

    pdf = _caps([
        # host h1: digest X twice (4 chars), digest Y once (2 chars)
        ("http://h1/1", "u1", "current", 1, "X", "aaaa"),
        ("http://h1/2", "u2", "current", 2, "X", "aaaa"),
        ("http://h1/3", "u3", "current", 3, "Y", "bb"),
        # host h2: one capture
        ("http://h2/1", "u4", "current", 4, "X", "aaaa"),
    ])
    got = (host_dedup_savings(rd.from_pandas(pdf).repartition(4),
                              num_partitions=2)
           .to_pandas().set_index("host").sort_index())
    assert got.loc["h1", "n_captures"] == 3
    assert got.loc["h1", "n_unique"] == 2
    assert got.loc["h1", "n_dup"] == 1
    assert got.loc["h1", "chars_total"] == 10
    assert got.loc["h1", "chars_stored"] == 6
    assert got.loc["h1", "chars_saved"] == 4
    assert got.loc["h2", "n_dup"] == 0
    assert got.loc["h2", "chars_saved"] == 0


def test_capture_gaps_median_and_sites(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.timeline import capture_gaps

    pdf = pd.DataFrame({
        "url_canonical": [
            # site s1, page a: ts 0,10,40 -> gaps 10,30
            "s1.example/a", "s1.example/a", "s1.example/a",
            # site s1, page b: ts 0,5 -> gap 5  => s1 gaps {5,10,30},
            # discrete median = 10 (ceil(3/2)-1 = index 1)
            "s1.example/b", "s1.example/b",
            # site s2, page c: ts 0,2,4,10 -> gaps {2,2,6}; even-ish check
            # with a duplicate value; median = 2
            "s2.example/c", "s2.example/c", "s2.example/c", "s2.example/c",
            # site s3: single capture -> no gaps, no row
            "s3.example/d",
        ],
        "ts_epoch": [0, 10, 40, 0, 5, 0, 2, 4, 10, 0],
    })
    got = (capture_gaps(rd.from_pandas(pdf).repartition(3), num_partitions=2)
           .to_pandas().set_index("site").sort_index())
    assert list(got.index) == ["s1.example", "s2.example"]
    assert got.loc["s1.example", "n_gaps"] == 3
    assert got.loc["s1.example", "min_gap"] == 5
    assert got.loc["s1.example", "p50_gap"] == 10
    assert got.loc["s1.example", "max_gap"] == 30
    assert got.loc["s2.example", "n_gaps"] == 3
    assert got.loc["s2.example", "p50_gap"] == 2
    # even count: 4 gaps -> element ceil(4/2)-1 = index 1 of sorted
    pdf2 = pd.DataFrame({
        "url_canonical": ["s.example/x"] * 5,
        "ts_epoch": [0, 1, 3, 7, 20],  # gaps 1,2,4,13 -> p50 = 2
    })
    got2 = capture_gaps(rd.from_pandas(pdf2), num_partitions=2).to_pandas()
    assert got2.loc[0, "p50_gap"] == 2


def test_site_change_rate_arithmetic(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.timeline import site_change_rate

    pdf = pd.DataFrame({
        # site s1, page a: digests a,a,b -> 2 versions / 3 captures
        #          page b: single capture -> 1 version / 1 capture
        # site revisits = 4-2 = 2; changed = 3-2 = 1 -> 500000 ppm
        # site s2, page c: digests x,x -> 1 version / 2 captures
        # revisits = 1, changed = 0 -> 0 ppm
        "url_canonical": ["s1.example/a"] * 3 + ["s1.example/b",
                                                 "s2.example/c", "s2.example/c"],
        "ts_epoch": [0, 10, 20, 5, 0, 9],
        "digest": ["a", "a", "b", "q", "x", "x"],
    })
    got = (site_change_rate(rd.from_pandas(pdf).repartition(3),
                            num_partitions=2)
           .to_pandas().set_index("site").sort_index())
    assert got.loc["s1.example", "n_pages"] == 2
    assert got.loc["s1.example", "n_versions"] == 3
    assert got.loc["s1.example", "n_captures"] == 4
    assert got.loc["s1.example", "change_ppm"] == 500_000
    assert got.loc["s2.example", "change_ppm"] == 0
    assert got.loc["s2.example", "n_versions"] == 1


def test_query_param_stats_session_id_signal(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.urlmine import query_param_stats

    pdf = pd.DataFrame({"url": [
        # session id: distinct value per use
        "http://s.example/p?phpsessid=a1&page=1",
        "http://s.example/q?phpsessid=b2&page=1",
        "http://s.example/r?phpsessid=c3&page=2",
        # constant tag
        "http://s.example/x?utm=camp",
        "http://s.example/y?utm=camp",
        # no query string -> contributes nothing
        "http://s.example/z",
        # trailing '?' -> one ('', '') param row (format edge, kept)
        "http://t.example/w?",
        # key without '=' and repeated '=' in the value
        "http://t.example/v?flag&k=a=b",
    ]})
    got = (query_param_stats(rd.from_pandas(pdf).repartition(3),
                             num_partitions=2)
           .to_pandas().set_index(["site", "param"]).sort_index())
    s = got.loc[("s.example", "phpsessid")]
    assert s["n_uses"] == 3 and s["n_values"] == 3  # session-id signature
    p = got.loc[("s.example", "page")]
    assert p["n_uses"] == 3 and p["n_values"] == 2
    u = got.loc[("s.example", "utm")]
    assert u["n_uses"] == 2 and u["n_values"] == 1  # constant tag
    assert got.loc[("t.example", "")].tolist() == [1, 1]
    assert got.loc[("t.example", "flag")].tolist() == [1, 1]
    assert got.loc[("t.example", "k")].tolist() == [1, 1]
    assert ("s.example", "z") not in got.index


def test_alias_census_counts(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.urlmine import alias_census

    pdf = pd.DataFrame({
        "url": [
            # page s.example/p: 3 raw aliases (www, scheme, session id)
            "https://www.s.example/p",
            "http://s.example/p",
            "https://s.example/p?phpsessid=x",
            # page s.example/q: single raw form, captured twice
            "https://s.example/q",
            "https://s.example/q",
            # other site, one page one url
            "https://t.example/a",
        ],
    })
    from deduplicator_ray.functions.canonical import canonicalize_arrow
    import pyarrow as pa
    pdf["url_canonical"] = canonicalize_arrow(
        pa.array(pdf["url"], type=pa.string())).to_numpy(zero_copy_only=False)
    got = (alias_census(rd.from_pandas(pdf).repartition(3), num_partitions=2)
           .to_pandas().set_index("site").sort_index())
    assert got.loc["s.example", "n_pages"] == 2
    assert got.loc["s.example", "n_aliased_pages"] == 1
    assert got.loc["s.example", "n_raw_urls"] == 4
    assert got.loc["s.example", "n_alias_urls"] == 2
    assert got.loc["t.example"].tolist() == [1, 0, 1, 0]


def test_site_delta_census_rollup(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.delta import site_delta_census

    pdf = _caps([
        ("http://s/a", "s.example/a", "history", 10, "d1", "x"),
        ("http://s/a", "s.example/a", "current", 30, "d1", "x"),   # unchanged
        ("http://s/b", "s.example/b", "history", 10, "d1", "x"),
        ("http://s/b", "s.example/b", "current", 30, "d2", "y"),   # changed
        ("http://s/c", "s.example/c", "history", 10, "d1", "x"),   # gone
        ("http://t/d", "t.example/d", "current", 30, "d3", "z"),   # new
    ])
    got = (site_delta_census(rd.from_pandas(pdf).repartition(3),
                             num_partitions=2)
           .set_index("site").sort_index())
    assert got.loc["s.example"].tolist() == [0, 1, 1, 1]  # new gone changed unchanged
    assert got.loc["t.example"].tolist() == [1, 0, 0, 0]


def test_compression_stats_signal(ray_session):
    import ray.data as rd
    import zlib

    from deduplicator_ray.stages.textstats import compression_stats

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["abc " * 500,                # highly repetitive
                 "the quick brown fox jumps over the lazy dog " * 2,
                 ""],
    })
    got = (compression_stats(rd.from_pandas(pdf).repartition(2))
           .to_pandas().set_index("doc_id").sort_index())
    # repetitive text compresses far better than prose
    assert got.loc[0, "ratio_ppm"] < got.loc[1, "ratio_ppm"]
    assert got.loc[0, "n_gzip"] == len(zlib.compress(("abc " * 500).encode(), 6))
    assert got.loc[2, "n_chars"] == 0 and got.loc[2, "ratio_ppm"] == 0
    assert got["n_gzip"].dtype == "int64"


def test_url_features_edges(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.urlmine import url_features

    pdf = pd.DataFrame({"url": [
        "https://h.example/a/b/c?x=1&y=2",
        "https://h.example",          # no path, no query
        "https://h.example/",         # root path -> depth 0
        "http://h/p?",                # trailing '?' -> 0 params
        "http://h/p?a&&b=2",          # empty fragment ignored
    ]})
    got = (url_features(rd.from_pandas(pdf).repartition(2))
           .to_pandas().set_index("url"))
    assert got.loc["https://h.example/a/b/c?x=1&y=2"].tolist()[1:] == [3, 2]
    assert got.loc["https://h.example"].tolist()[1:] == [0, 0]
    assert got.loc["https://h.example/"].tolist()[1:] == [0, 0]
    assert got.loc["http://h/p?"].tolist()[1:] == [1, 0]
    assert got.loc["http://h/p?a&&b=2"].tolist()[1:] == [1, 2]


def test_page_lifespans_merge(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.timeline import page_lifespans

    pdf = pd.DataFrame({
        "url_canonical": ["a"] * 4 + ["b"],
        "ts_epoch": [30, 10, 20, 40, 7],
    })
    got = (page_lifespans(rd.from_pandas(pdf).repartition(3),
                          num_partitions=2)
           .to_pandas().set_index("url_canonical").sort_index())
    assert got.loc["a"].tolist() == [10, 40, 4, 30]
    assert got.loc["b"].tolist() == [7, 7, 1, 0]


def test_delta_family_random_agreement(ray_session):
    """Seeded random corpora: crawl_delta statuses partition the page
    set; capture_gaps stays inside [min,max]; page_lifespans counts sum
    to the corpus size; site_delta_census matches a brute-force rollup."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.stages.delta import crawl_delta, site_delta_census
    from deduplicator_ray.stages.timeline import capture_gaps, page_lifespans

    rng = np.random.default_rng(11)
    n = 3000
    pages = [f"s{rng.integers(0, 7)}.example/p/{rng.integers(0, 300)}"
             for _ in range(n)]
    pdf = pd.DataFrame({
        "url_canonical": pages,
        "crawl": np.where(rng.random(n) < 0.5, "history", "current"),
        "ts_epoch": rng.integers(0, 100_000, n),
        "digest": [f"d{rng.integers(0, 40)}" for _ in range(n)],
    })
    ds = rd.from_pandas(pdf).repartition(7)

    delta = crawl_delta(ds, num_partitions=3).to_pandas()
    n_pages = pdf["url_canonical"].nunique()
    assert len(delta) == n_pages
    assert delta["url_canonical"].is_unique
    assert set(delta["status"]) <= {"new", "gone", "changed", "unchanged"}
    # brute-force status check on 20 random pages
    for u in pd.Series(pages).drop_duplicates().sample(20, random_state=5):
        sub = pdf[pdf["url_canonical"] == u]
        h = sub[sub["crawl"] == "history"].sort_values(["ts_epoch", "digest"])
        c = sub[sub["crawl"] == "current"].sort_values(["ts_epoch", "digest"])
        if h.empty:
            want = "new"
        elif c.empty:
            want = "gone"
        else:
            want = ("unchanged" if h["digest"].iloc[-1] == c["digest"].iloc[-1]
                    else "changed")
        assert delta.set_index("url_canonical").loc[u, "status"] == want, u

    census = site_delta_census(delta=rd.from_pandas(delta))
    assert census[["n_new", "n_gone", "n_changed", "n_unchanged"]
                  ].to_numpy().sum() == n_pages

    gaps = capture_gaps(ds, num_partitions=3).to_pandas()
    assert (gaps["min_gap"] <= gaps["p50_gap"]).all()
    assert (gaps["p50_gap"] <= gaps["max_gap"]).all()
    assert (gaps["min_gap"] >= 0).all()

    spans = page_lifespans(ds, num_partitions=3).to_pandas()
    assert int(spans["n_captures"].sum()) == n
    assert (spans["lifespan_s"] ==
            spans["last_epoch"] - spans["first_epoch"]).all()


def test_trap_patterns_calendar_fanout(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.urlmine import trap_patterns

    pdf = pd.DataFrame({"url": (
        # calendar trap: many distinct urls, one digit-collapsed pattern
        [f"http://trap.example/cal/20{y:02d}/{m:02d}/" for y in range(3)
         for m in (1, 7)]
        # legit template: re-captured often but only 2 distinct urls
        + ["http://ok.example/page/1"] * 4 + ["http://ok.example/page/2"]
        # digits in HOST must not collapse (www2 is a distinct site)
        + ["http://www2.ok.example/page/1"]
        # no path
        + ["http://bare.example"] * 2
    )})
    got = (trap_patterns(rd.from_pandas(pdf).repartition(3), min_fanout=3,
                         num_partitions=2)
           .to_pandas().set_index("pattern").sort_index())
    assert list(got.index) == ["trap.example/cal/N/N/"]
    row = got.iloc[0]
    assert row["site"] == "trap.example"
    assert row["n_urls"] == 6 and row["n_captures"] == 6
    # fanout 2 < 3: the legit template stayed out even with 5 captures
    low = trap_patterns(rd.from_pandas(pdf), min_fanout=2).to_pandas()
    ok = low.set_index("pattern").loc["ok.example/page/N"]
    assert ok["n_urls"] == 2 and ok["n_captures"] == 5
    assert "www2.ok.example/page/N" not in low.set_index("pattern").index


def test_site_dup_stats_counts(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.urlmine import site_dup_stats

    pdf = pd.DataFrame({
        "url": ["http://a.example/1", "http://a.example/1",  # re-capture
                "http://a.example/2",                         # same content as /1
                "http://b.example/x"],
        "digest": ["d1", "d1", "d1", "d2"],
    })
    got = (site_dup_stats(rd.from_pandas(pdf).repartition(2),
                          num_partitions=2)
           .to_pandas().set_index("site").sort_index())
    a = got.loc["a.example"]
    assert a.tolist() == [3, 2, 1, 2]  # captures, urls, digests, dup
    b = got.loc["b.example"]
    assert b.tolist() == [1, 1, 1, 0]


def test_mirror_sites_shared_digests_and_cap(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.urlmine import mirror_sites

    rows = []
    # m1/m2 mirror each other: 3 shared digests
    for i in range(3):
        rows += [("http://m1.example/p%d" % i, f"d{i}"),
                 ("http://m2.example/p%d" % i, f"d{i}")]
    # m1/other share only 1 digest -> below min_shared=2
    rows += [("http://other.example/q", "d0")]
    # hub digest on >cap sites must not generate pairs
    for s in range(6):
        rows += [(f"http://h{s}.example/empty", "hub")]
    pdf = pd.DataFrame(rows, columns=["url", "digest"])
    got = (mirror_sites(rd.from_pandas(pdf).repartition(3), min_shared=2,
                        max_sites_per_digest=4, num_partitions=2)
           .to_pandas().set_index(["site_a", "site_b"]).sort_index())
    assert list(got.index) == [("m1.example", "m2.example")]
    assert got["n_shared"].iloc[0] == 3
    # with the cap lifted the hub fans out into C(6,2)=15 pairs + m1/m2
    lifted = mirror_sites(rd.from_pandas(pdf), min_shared=1,
                          max_sites_per_digest=64).to_pandas()
    assert len(lifted) == 15 + 1 + 2  # hub pairs, m1-m2, m1/m2-other (d0)
