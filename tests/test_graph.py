"""Link-graph operators (stages/graph.py + pipelines/queries_graph.py):
extraction-kernel edge cases, driver-vs-bucketed PageRank equality, and
oracle parity for the three registered queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def _to_pandas(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


# ------------------------------------------------------------ extraction


def test_extract_links_edge_cases(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.graph import extract_links

    rows = pa.table({
        "url": [
            "https://www.a.example/p/1",
            "https://www.b.example/x",
            "https://www.c.example/y",
            "https://www.d.example/z",
        ],
        "html": pa.array([
            b'<a href="https://www.b.example/t">one</a>'
            b'<a href="https://www.c.example/u">two</a>',
            b"<p>no links at all</p>",
            b'<a href="https://www.a.example/v">back</a>',
            b'truncated <a href="https://www.nope.example/w',  # no closing quote
        ], type=pa.binary()),
    })
    out = extract_links(rd.from_arrow(rows), with_anchor=True).to_pandas()
    out = out.sort_values("dst_url", ignore_index=True)
    assert list(out["src_host"]) == ["www.c.example", "www.a.example", "www.a.example"]
    assert list(out["dst_host"]) == ["www.a.example", "www.b.example", "www.c.example"]
    assert list(out["anchor"]) == ["back", "one", "two"]


def test_linked_pages_match_planted_structure(ray_session, sf_dir):
    """The html generator and the arithmetic formula agree doc by doc."""
    from deduplicator_ray.sources.corpus import N_HOSTS, linked_pages_dataset
    from deduplicator_ray.stages.graph import extract_links

    pages = linked_pages_dataset(sf_dir)
    n = pages.count()
    links = extract_links(pages, with_anchor=True).to_pandas()
    # recompute expected targets from doc ids
    ids = np.arange(n, dtype=np.int64)
    exp = []
    for j in range(4):
        t = (ids * 7 + 11 * (j + 1) + 3) % n
        keep = (1 + (ids % 4)) > j
        exp.extend(
            (f"www.site{i % N_HOSTS}.example",
             f"https://www.site{ti % N_HOSTS}.example/p/{ti}", f"go {ti}")
            for i, ti in zip(ids[keep], t[keep])
        )
    got = set(zip(links["src_host"], links["dst_url"], links["anchor"]))
    assert got == set(exp)
    assert len(links) == len(exp)  # multiplicities too (all distinct here)


# ------------------------------------------------------------- pagerank


def _toy_edges():
    return pd.DataFrame({
        "src_host": ["a", "a", "b", "c", "c", "d"],
        "dst_host": ["b", "c", "c", "a", "d", "a"],
        "n_links": [3, 1, 2, 5, 1, 1],
    })


def test_pagerank_paths_agree(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.graph import pagerank

    edges = rd.from_pandas(_toy_edges())
    drv = pagerank(edges, iters=4).to_pandas().sort_values("host", ignore_index=True)
    dist = pagerank(
        rd.from_pandas(_toy_edges()), iters=4, max_driver_edges=0,
        num_partitions=4,
    ).to_pandas().sort_values("host", ignore_index=True)
    pd.testing.assert_frame_equal(drv, dist)
    # mass sanity: every rank positive, teleport floor respected
    assert (drv["rank"] >= ((100 - 85) * 10 ** 9) // 100).all()


def test_pagerank_dangling_mass_dropped(ray_session):
    """A dst-only host gets teleport + inflow but contributes nothing."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import pagerank

    edges = rd.from_pandas(pd.DataFrame({
        "src_host": ["a"], "dst_host": ["sink"], "n_links": [1]}))
    out = pagerank(edges, iters=2).to_pandas().set_index("host")["rank"]
    scale, base = 10 ** 9, (15 * 10 ** 9) // 100
    # iter1: sink gets base + 85% of a's full rank; a gets base only
    a1 = base
    sink1 = base + (85 * scale) // 100
    a2 = base
    sink2 = base + (85 * a1) // 100
    assert out["a"] == a2 and out["sink"] == sink2


# --------------------------------------------------------- oracle parity


def test_mirror_hosts_toy(ray_session):
    """Two sources with proportional outlink vectors -> cosine 1."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import mirror_hosts

    edges = rd.from_pandas(pd.DataFrame({
        "src_host": ["m1", "m1", "m2", "m2", "x"],
        "dst_host": ["t1", "t2", "t1", "t2", "t1"],
        "n_links": [2, 4, 1, 2, 7],
    }))
    out = mirror_hosts(edges, threshold=0.999).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["host_a"], out.iloc[0]["host_b"]) == ("m1", "m2")
    assert out.iloc[0]["cosine"] == pytest.approx(1.0)


def test_mirror_hosts_fanin_cap(ray_session):
    """A hub destination above max_fanin generates no pairs."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import mirror_hosts

    edges = rd.from_pandas(pd.DataFrame({
        "src_host": ["a", "b", "c"],
        "dst_host": ["hub", "hub", "hub"],
        "n_links": [1, 1, 1],
    }))
    out = mirror_hosts(edges, threshold=0.0, max_fanin=2).to_pandas()
    assert len(out) == 0


def test_co_occurrence_pairs_semantics(ray_session):
    """Distinct-first, fan-in cap, min_shared filter."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import co_occurrence_pairs

    df = pd.DataFrame({
        "k": ["d1", "d1", "d1", "d2", "d2", "d3", "d3", "d3", "hub", "hub",
              "hub", "hub"],
        "i": ["h1", "h2", "h2", "h1", "h2", "h1", "h3", "h3", "h1", "h2",
              "h3", "h4"],
    })
    out = co_occurrence_pairs(rd.from_pandas(df), key_col="k", item_col="i",
                              max_fanin=3, min_shared=2,
                              num_partitions=4).to_pandas()
    # duplicates collapse: d1 -> (h1,h2); d2 -> (h1,h2); d3 -> (h1,h3);
    # hub has 4 distinct items > max_fanin -> excluded entirely
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["item_a"], r["item_b"], r["n_shared"]) == ("h1", "h2", 2)


@pytest.mark.parametrize(
    "name", ["link_graph", "pagerank_hosts", "anchor_stats", "mirror_hosts",
             "html_extract_text", "content_mirrors", "cocitation_hosts",
             "hits_hosts", "host_triangles", "kcore_hosts",
             "coupled_hosts", "host_reciprocity", "degree_census",
             "trustrank_hosts", "host_components", "wat_link_graph",
             "orphan_pages", "crawl_budget", "host_assortativity",
             "lpa_communities"])
def test_graph_oracle_parity(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_graph import registry_graph

    fn, sql = registry_graph()[name]
    got = _norm(_to_pandas(fn(sf_dir)))
    want = _norm(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_frontier_gap_anti_join(ray_session):
    """Gap counts: link instances + distinct targets per src host, with
    canonical-url matching (www/scheme aliases of captured pages are NOT
    gaps) and multiplicity preserved across split blocks."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.graph import frontier_gap

    links = pd.DataFrame({
        "src_host": ["a", "a", "a", "a", "b", "b"],
        "dst_url": [
            "https://www.x.example/p/1",   # captured (alias form)
            "https://x.example/p/2",       # NOT captured
            "https://x.example/p/2",       # same gap target again
            "https://y.example/q",         # NOT captured
            "http://x.example/p/1",        # captured (other alias)
            "https://y.example/q",         # gap for b too
        ],
    })
    captured = pd.DataFrame({"url": ["https://x.example/p/1"]})
    got = (frontier_gap(rd.from_pandas(links).repartition(3),
                        rd.from_pandas(captured), num_partitions=2)
           .set_index("src_host").sort_index())
    assert got.loc["a", "n_gap_links"] == 3      # p/2 twice + y/q
    assert got.loc["a", "n_gap_targets"] == 2    # p/2, y/q
    assert got.loc["b", "n_gap_links"] == 1
    assert got.loc["b", "n_gap_targets"] == 1
    # all links captured -> empty result with the full schema
    all_cap = frontier_gap(
        rd.from_pandas(links.iloc[[0]]), rd.from_pandas(captured),
        num_partitions=2)
    assert len(all_cap) == 0
    assert list(all_cap.columns) == ["src_host", "n_gap_links", "n_gap_targets"]


def test_hits_paths_agree_and_hand_check(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.graph import hits

    edges = rd.from_pandas(_toy_edges())
    drv = hits(edges, iters=3).to_pandas().sort_values("host", ignore_index=True)
    dist = hits(
        rd.from_pandas(_toy_edges()), iters=3, max_driver_edges=0,
        num_partitions=4,
    ).to_pandas().sort_values("host", ignore_index=True)
    pd.testing.assert_frame_equal(drv, dist)
    # max-normalization: at least one hub and one auth sit exactly at scale
    assert drv["hub"].max() == 10 ** 5 and drv["auth"].max() == 10 ** 5
    assert list(drv.columns) == ["host", "hub", "auth"]


def test_hits_star_graph_exact(ray_session):
    """Pure star u1,u2,u3 -> v: v is the unit authority with zero hub
    score; spokes are unit hubs with zero authority; weights scale hubs
    proportionally under integer max-norm."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import hits

    edges = pd.DataFrame({
        "src_host": ["u1", "u2", "u3"],
        "dst_host": ["v", "v", "v"],
        "n_links": [4, 2, 1],
    })
    out = (hits(rd.from_pandas(edges), iters=2, scale=100)
           .to_pandas().set_index("host"))
    assert out.loc["v", "auth"] == 100 and out.loc["v", "hub"] == 0
    # hub(u) proportional to weight: 4:2:1 -> 100, 50, 25
    assert out.loc["u1", "hub"] == 100
    assert out.loc["u2", "hub"] == 50
    assert out.loc["u3", "hub"] == 25
    assert (out.loc[["u1", "u2", "u3"], "auth"] == 0).all()


def test_triangles_paths_agree_and_hand_check(ray_session):
    """K4 minus one edge = 2 triangles; per-host counts by membership.
    Edge direction/multiplicity must not matter."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import triangles

    # a-b, a-c, a-d, b-c, c-d (missing b-d): triangles abc, acd
    edges = pd.DataFrame({
        "src_host": ["a", "c", "a", "b", "d", "d", "a"],
        "dst_host": ["b", "a", "c", "c", "c", "a", "b"],  # a-b twice, rev c-a
        "n_links": [1, 4, 2, 1, 1, 3, 9],
    })
    want = {"a": 2, "b": 1, "c": 2, "d": 1}
    drv = (triangles(rd.from_pandas(edges))
           .to_pandas().set_index("host")["n_triangles"].to_dict())
    dist = (triangles(rd.from_pandas(edges), max_driver_edges=0,
                      num_partitions=4)
            .to_pandas().set_index("host")["n_triangles"].to_dict())
    assert drv == want and dist == want


def test_triangles_no_triangle_graph(ray_session):
    """A path graph has zero triangles -> empty result, stable schema;
    self-loops are ignored."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import triangles

    edges = pd.DataFrame({
        "src_host": ["a", "b", "c", "a"],
        "dst_host": ["b", "c", "d", "a"],
        "n_links": [1, 1, 1, 5],
    })
    out = triangles(rd.from_pandas(edges)).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["host", "n_triangles"]


def test_kcore_paths_agree_and_cascade(ray_session):
    """Triangle abc + pendant chain c-d-e at k=2: d,e peel in cascade
    (d only drops below 2 after e goes), leaving the triangle with
    in-core degree 2 everywhere."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import kcore

    edges = pd.DataFrame({
        "src_host": ["a", "b", "c", "c", "d"],
        "dst_host": ["b", "c", "a", "d", "e"],
        "n_links": [1, 1, 1, 1, 1],
    })
    drv = (kcore(rd.from_pandas(edges), k=2, rounds=4)
           .to_pandas().sort_values("host", ignore_index=True))
    dist = (kcore(rd.from_pandas(edges), k=2, rounds=4, max_driver_edges=0,
                  num_partitions=4)
            .to_pandas().sort_values("host", ignore_index=True))
    pd.testing.assert_frame_equal(drv, dist)
    assert drv["host"].tolist() == ["a", "b", "c"]
    assert (drv["core_degree"] == 2).all()


def test_reciprocity_semantics(ray_session):
    """a<->b mutual, a->c one-way, multiplicities and self-loops
    ignored: a: 1/2 recip, b: 1/1, c: no out-edges -> absent."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import reciprocity

    edges = pd.DataFrame({
        "src_host": ["a", "a", "b", "a", "c"],
        "dst_host": ["b", "c", "a", "b", "c"],  # a->b twice; c->c self-loop
        "n_links": [1, 1, 1, 1, 1],
    })
    out = (reciprocity(rd.from_pandas(edges), num_partitions=4)
           .to_pandas().set_index("host"))
    assert out.loc["a", "n_out"] == 2 and out.loc["a", "n_recip"] == 1
    assert out.loc["a", "recip_ppm"] == 500_000
    assert out.loc["b", "n_out"] == 1 and out.loc["b", "recip_ppm"] == 1_000_000
    assert "c" not in out.index


def test_degree_census_buckets(ray_session):
    """Exact power-of-two boundaries: out-degrees 1,2,3,4 land in
    buckets 0,1,1,2 — float log2 would misplace the boundaries."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import degree_census

    rows = []
    for i, deg in enumerate([1, 2, 3, 4]):
        rows += [{"src_host": f"s{i}", "dst_host": f"t{j}", "n_links": 1}
                 for j in range(deg)]
    out = (degree_census(rd.from_pandas(pd.DataFrame(rows)),
                         num_partitions=4).to_pandas())
    o = out[out["direction"] == "out"].set_index("log2_bucket")["n_hosts"]
    assert o.to_dict() == {0: 1, 1: 2, 2: 1}
    # in-degrees: t0=4, t1=3, t2=2, t3=1 -> same bucket shape
    i = out[out["direction"] == "in"].set_index("log2_bucket")["n_hosts"]
    assert i.to_dict() == {0: 1, 1: 2, 2: 1}


def test_reciprocity_all_self_loop_batch(ray_session):
    """A batch that is entirely self-loops must produce a typed empty
    partial, not a null-schema crash (pyarrow min_element_wise has no
    null,null kernel)."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import reciprocity

    edges = pd.DataFrame({
        "src_host": ["a", "b", "c"],
        "dst_host": ["a", "b", "c"],
        "n_links": [1, 1, 1],
    })
    out = reciprocity(rd.from_pandas(edges), num_partitions=2).to_pandas()
    assert len(out) == 0


def test_kcore_stranded_survivor_zero_degree(ray_session):
    """Star x-y1,y2 at k=2, rounds=1: x survives the single round (deg
    2) while both spokes peel, leaving x with in-core degree 0 — the
    fixed-round semantics the SQL oracle's COALESCE mirrors."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import kcore

    edges = pd.DataFrame({
        "src_host": ["x", "x"], "dst_host": ["y1", "y2"],
        "n_links": [1, 1],
    })
    for kw in ({}, {"max_driver_edges": 0, "num_partitions": 2}):
        out = kcore(rd.from_pandas(edges), k=2, rounds=1, **kw).to_pandas()
        assert out["host"].tolist() == ["x"]
        assert out["core_degree"].tolist() == [0]


def test_trustrank_unreachable_scores_zero(ray_session):
    """seed -> a -> b chain plus an isolated spam pair: trust reaches
    a and b, the spam cluster (unreachable from the seed) scores 0 in
    both execution paths."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import pagerank

    edges = pd.DataFrame({
        "src_host": ["seed", "a", "spam1", "spam2"],
        "dst_host": ["a", "b", "spam2", "spam1"],
        "n_links": [1, 1, 5, 5],
    })
    drv = (pagerank(rd.from_pandas(edges), iters=3, seeds=["seed"])
           .to_pandas().set_index("host")["rank"])
    dist = (pagerank(rd.from_pandas(edges), iters=3, seeds=["seed"],
                     max_driver_edges=0, num_partitions=2)
            .to_pandas().set_index("host")["rank"])
    pd.testing.assert_series_equal(drv, dist)
    assert drv["spam1"] == 0 and drv["spam2"] == 0
    assert drv["seed"] > 0 and drv["a"] > 0 and drv["b"] > 0
    # unknown seed hosts are ignored, not added to the graph
    with_ghost = (pagerank(rd.from_pandas(edges), iters=3,
                           seeds=["seed", "nosuch.example"])
                  .to_pandas().set_index("host")["rank"])
    pd.testing.assert_series_equal(drv, with_ghost)


def test_host_components_multi_component(ray_session):
    """Two separate neighborhoods + direction/multiplicity noise: labels
    are each component's lexicographic min host."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import host_components

    edges = pd.DataFrame({
        "src_host": ["b", "c", "a", "z", "y", "z"],
        "dst_host": ["a", "b", "b", "y", "x", "z"],  # z-z self-loop
        "n_links": [2, 1, 1, 1, 1, 9],
    })
    out = (host_components(rd.from_pandas(edges), num_partitions=3)
           .to_pandas().set_index("host")["component"].to_dict())
    assert out == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "x"}


def test_hits_overflow_guard(ray_session):
    """A scale violating the 2^63/scale^2 weight bound raises instead
    of returning wrapped scores."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import hits

    edges = pd.DataFrame({"src_host": ["a"], "dst_host": ["b"],
                          "n_links": [1]})
    with pytest.raises(OverflowError, match="smaller scale"):
        hits(rd.from_pandas(edges), iters=1, scale=2 ** 33)


def test_graph_report_cli(ray_session, tmp_path):
    """graph_report end to end over an html corpus: headline stats match
    the oracle-verified operators; a rerun resumes the edge checkpoint;
    the WAT path computes the same report shape with no html."""
    import json

    import ray.data as rd

    from deduplicator_ray.pipelines.graph_report import build_parser, run
    from deduplicator_ray.sources.corpus import linked_pages_dataset
    from deduplicator_ray.sources.wat import write_wat

    pages = tmp_path / "pages"
    linked_pages_dataset("/root/testdata/sf0.001").write_parquet(str(pages))
    args = build_parser().parse_args([
        "--corpus", str(pages), "--out", str(tmp_path / "out"),
        "--top-k", "3"])
    rep = run(args)
    g = rep["graph"]
    # cross-checked against the oracle-verified queries on this corpus
    assert g["n_hosts"] == 40 and g["total_triangles"] == 100
    assert g["n_components"] == 1 and g["largest_component_hosts"] == 40
    assert len(rep["top_pagerank"]) == 3
    assert json.load(open(tmp_path / "out" / "REPORT.json"))["graph"] == g
    rep2 = run(args)
    assert rep2["stages"]["edges"]["resumed"] is True
    assert rep2["graph"] == g

    write_wat(str(tmp_path / "g.warc.wat.gz"), [
        {"url": "https://a.example/1", "date": "2024-01-01T00:00:00Z",
         "links": ["https://b.example/x", "https://c.example/y"]},
        {"url": "https://b.example/2", "date": "2024-01-01T00:00:00Z",
         "links": ["https://a.example/1"]},
    ])
    rep3 = run(build_parser().parse_args([
        "--corpus", str(tmp_path / "g.warc.wat.gz"),
        "--corpus-format", "wat", "--out", str(tmp_path / "out2")]))
    assert rep3["graph"]["n_hosts"] == 3
    assert rep3["graph"]["reciprocity_ppm"] == 666_666
    # undirected star a-b, a-c: perfectly disassortative
    assert rep3["graph"]["assortativity_micro"] == -1_000_000


def test_orphan_pages_anti_join(ray_session):
    """Captured pages minus link targets, canonical-keyed: alias forms
    of a linked page are NOT orphans; all-linked sites emit n_orphans=0
    rows (rates stay computable)."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import orphan_pages

    links = pd.DataFrame({"dst_url": [
        "https://www.x.example/p/1",      # links to the alias form
        "https://y.example/q/1",
    ]})
    captured = pd.DataFrame({"url": [
        "http://x.example/p/1",           # alias of the linked page
        "https://x.example/p/2",          # orphan
        "https://y.example/q/1",
        "https://y.example/q/2",          # orphan
        "https://y.example/q/2",          # duplicate capture, one page
    ]})
    got = (orphan_pages(rd.from_pandas(links).repartition(2),
                        rd.from_pandas(captured).repartition(2),
                        num_partitions=3)
           .set_index("site").sort_index())
    assert got.loc["x.example", "n_pages"] == 2
    assert got.loc["x.example", "n_orphans"] == 1
    assert got.loc["y.example", "n_pages"] == 2
    assert got.loc["y.example", "n_orphans"] == 1


def test_graph_report_degenerate_corpora(ray_session, tmp_path):
    """Zero-link corpus -> empty report, no crash; relative/mailto
    targets ('' pseudo-host) never enter the graph."""
    import ray.data as rd

    from deduplicator_ray.pipelines.graph_report import build_parser, run

    rd.from_pandas(pd.DataFrame({
        "url": ["https://a.example/1"], "html": [b"<p>nothing</p>"],
    })).write_parquet(str(tmp_path / "empty"))
    rep = run(build_parser().parse_args([
        "--corpus", str(tmp_path / "empty"),
        "--out", str(tmp_path / "o1")]))
    assert rep["graph"]["n_hosts"] == 0 and rep["top_pagerank"] == []

    rd.from_pandas(pd.DataFrame({
        "url": ["https://a.example/1", "https://b.example/2"],
        "html": [b'<a href="/rel">x</a><a href="https://b.example/2">y</a>',
                 b'<a href="mailto:x@y">m</a>'
                 b'<a href="https://a.example/1">z</a>'],
    })).write_parquet(str(tmp_path / "rel"))
    rep2 = run(build_parser().parse_args([
        "--corpus", str(tmp_path / "rel"), "--out", str(tmp_path / "o2")]))
    g = rep2["graph"]
    assert g["n_hosts"] == 2  # '' pseudo-host excluded
    assert g["reciprocity_ppm"] == 1_000_000  # a <-> b fully mutual


def test_crawl_budget_apportionment(ray_session, sf_dir, duck):
    """Hamilton apportionment invariants on the oracle-matched output:
    budgets sum exactly to the total, every host gets its floor quota,
    bonuses only +1, monotone with rank."""
    from deduplicator_ray.pipelines.queries_graph import (
        _BUDGET_TOTAL,
        registry_graph,
    )

    fn, sql = registry_graph()["crawl_budget"]
    got = _to_pandas(fn(sf_dir))
    assert int(got["budget"].sum()) == _BUDGET_TOTAL
    tot = int(got["rank"].sum())
    fl = (_BUDGET_TOTAL * got["rank"]) // tot
    assert ((got["budget"] - fl).isin((0, 1))).all()
    # equal ranks must never differ by more than the +-1 bonus
    g = got.groupby("rank")["budget"]
    assert ((g.max() - g.min()) <= 1).all()


def test_assortativity_known_graphs(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.graph import assortativity

    def run(pairs):
        df = pd.DataFrame(pairs, columns=["src_host", "dst_host"])
        return (assortativity(rd.from_pandas(df).repartition(2),
                              num_partitions=4)
                .to_pandas().iloc[0].to_dict())

    # star K1,3 is perfectly disassortative
    star = run([("hub", "a"), ("hub", "b"), ("hub", "c")])
    assert star == {"n_edges": 3, "assort_micro": -1_000_000}
    # path a-b-c: r = -1 as well (both edges touch the middle)
    path = run([("a", "b"), ("b", "c")])
    assert path == {"n_edges": 2, "assort_micro": -1_000_000}
    # triangle is regular -> den == 0 -> 0 by contract; self-loops and
    # duplicate/reversed edges collapse
    tri = run([("a", "b"), ("b", "c"), ("c", "a"), ("b", "a"),
               ("a", "a"), ("a", "b")])
    assert tri == {"n_edges": 3, "assort_micro": 0}


def test_assortativity_matches_pearson(ray_session):
    import math

    import numpy as np
    import ray.data as rd

    from deduplicator_ray.stages.graph import assortativity

    rng = np.random.default_rng(5)
    hosts = [f"h{i}" for i in range(12)]
    pairs = {tuple(sorted(rng.choice(hosts, size=2, replace=False)))
             for _ in range(30)}
    df = pd.DataFrame(sorted(pairs), columns=["src_host", "dst_host"])
    got = (assortativity(rd.from_pandas(df).repartition(3),
                         num_partitions=4)
           .to_pandas().iloc[0].to_dict())
    # numpy Pearson over the stub lists
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in pairs:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    r = np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1]
    assert got["n_edges"] == len(pairs)
    assert abs(got["assort_micro"] - r * 1_000_000) <= 2  # rounding only


def test_assortativity_empty_inputs(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.graph import assortativity

    # self-loops only -> empty undirected edge set -> documented zero row
    df = pd.DataFrame({"src_host": ["a", "b"], "dst_host": ["a", "b"]})
    out = assortativity(rd.from_pandas(df), num_partitions=4).to_pandas()
    assert out.iloc[0].to_dict() == {"n_edges": 0, "assort_micro": 0}
    empty = pd.DataFrame({"src_host": pd.Series([], dtype=object),
                          "dst_host": pd.Series([], dtype=object)})
    out2 = assortativity(rd.from_pandas(empty),
                         num_partitions=4).to_pandas()
    assert out2.iloc[0].to_dict() == {"n_edges": 0, "assort_micro": 0}


def test_lpa_two_cliques_and_paths_agree(ray_session):
    """Two 3-cliques joined by one weak bridge: LPA assigns each clique
    its lexicographically-smallest member as community; the driver and
    distributed paths agree row-for-row."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import lpa_communities

    cl1 = ["a1", "a2", "a3"]
    cl2 = ["b1", "b2", "b3"]
    rows = []
    for grp in (cl1, cl2):
        for u in grp:
            for v in grp:
                if u != v:
                    rows.append({"src_host": u, "dst_host": v, "n_links": 5})
    rows.append({"src_host": "a3", "dst_host": "b1", "n_links": 1})
    edges = rd.from_pandas(pd.DataFrame(rows))

    out = lpa_communities(edges, rounds=4).to_pandas()
    got = dict(zip(out["host"], out["community"]))
    assert all(got[h] == "a1" for h in cl1)
    assert all(got[h] == "b1" for h in cl2)

    dist = lpa_communities(edges, rounds=4, max_driver_edges=0,
                           num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("host", ignore_index=True),
        dist.sort_values("host", ignore_index=True))


def test_lpa_tie_breaks_to_smallest_label(ray_session):
    """A node pulled equally by two labels adopts the smaller one."""
    import ray.data as rd

    from deduplicator_ray.stages.graph import lpa_communities

    edges = rd.from_pandas(pd.DataFrame([
        {"src_host": "x", "dst_host": "m", "n_links": 2},
        {"src_host": "x", "dst_host": "z", "n_links": 2},
    ]))
    out = lpa_communities(edges, rounds=1).to_pandas()
    got = dict(zip(out["host"], out["community"]))
    assert got["x"] == "m"  # tie between m and z -> lexicographic min
