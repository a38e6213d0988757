"""LINK-GRAPH REPORT pipeline + CLI — the web-graph composition:

    python -m deduplicator_ray.pipelines.graph_report \
        --corpus /path/pages [--corpus-format parquet|wat|...] \
        --out /tmp/graph_out [--top-k 10] [--force]

Over one corpus it builds the host graph ONCE (checkpointed under
--out, state/checkpoint.py — a rerun skips it) and rolls the engine's
graph analytics into REPORT.json:

    edges      (src_host, dst_host, n_links) — from html href extraction
               (stages/graph.extract_links) when the corpus carries an
               ``html`` column, or directly from WAT outlink rows
               (``dst_url`` column, sources/wat.py) with no html parsing

    report     integer PageRank + HITS top-k hosts, exact triangle
               counts (total + top hosts), fixed-round k-core size,
               connected components (count + largest), per-host
               reciprocity rollup, log2 in/out degree histogram

Everything after the edge build is host-bounded by the engine's design
contract (score vectors in one process' memory), so the report stage is
cheap no matter the corpus size; the edge build is the only stage that
scales with data and it is the one that checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os

import pyarrow as pa

from deduplicator_ray.state.checkpoint import (
    StageCheckpoint,
    input_fingerprint,
    run_stage,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="web link-graph report")
    p.add_argument("--corpus", required=True,
                   help="pages table (url, html) or WAT outlink rows")
    p.add_argument("--corpus-format", default="parquet")
    p.add_argument("--out", required=True)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--pagerank-iters", type=int, default=5)
    p.add_argument("--kcore-k", type=int, default=2)
    p.add_argument("--force", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus when this CLI owns the session")
    return p


def _links_of(ds):
    """Corpus -> (src_host, dst_host) link rows: html extraction when
    the corpus carries html; WAT-style (url, dst_url) host mapping
    otherwise."""
    from deduplicator_ray.stages.graph import _host_of, extract_links

    names = set(ds.schema().names)
    if "html" in names:
        links = extract_links(ds)
    elif "dst_url" in names:
        def hosts(b: pa.Table) -> pa.Table:
            return pa.table({
                "src_host": _host_of(b["url"].combine_chunks()),
                "dst_host": _host_of(b["dst_url"].combine_chunks()),
            })

        links = ds.map_batches(hosts, batch_format="pyarrow",
                               zero_copy_batch=True)
    else:
        raise ValueError(
            "graph_report needs an 'html' column (page corpus) or a "
            f"'dst_url' column (WAT outlinks); got {sorted(names)}")

    def drop_hostless(b: pa.Table) -> pa.Table:
        # relative / mailto / non-http targets host-extract to '' — on a
        # real corpus that pseudo-host would absorb edges from nearly
        # every page and top every ranking, so it never enters the graph
        import pyarrow.compute as pc

        keep = pc.and_(pc.not_equal(b["src_host"], ""),
                       pc.not_equal(b["dst_host"], ""))
        return b.filter(keep)

    return links.map_batches(drop_hostless, batch_format="pyarrow",
                             zero_copy_batch=True)


def _topk(df, score_col: str, k: int) -> list[dict]:
    top = df.sort_values([score_col, "host"],
                         ascending=[False, True]).head(k)
    return [{"host": r.host, score_col: int(getattr(r, score_col))}
            for r in top.itertuples()]


def run(args) -> dict:
    from deduplicator_ray.sources import get_source
    from deduplicator_ray.stages.graph import (
        assortativity,
        degree_census,
        edge_aggregate,
        hits,
        host_components,
        kcore,
        pagerank,
        reciprocity,
        triangles,
    )

    out = args.out
    os.makedirs(out, exist_ok=True)
    fp = input_fingerprint(args.corpus)
    # corpus-format is part of the edge checkpoint's identity: the same
    # file reinterpreted under a corrected format must NOT resume
    cfg_hash = f"graph:v1:{args.corpus_format}"

    corpus = get_source(args.corpus_format)(args.corpus)

    ck = StageCheckpoint(out, "edges", config_hash=cfg_hash,
                         input_fingerprint=fp)
    edges, m, resumed = run_stage(
        ck, lambda: edge_aggregate(_links_of(corpus)), force=args.force)
    edges = edges.materialize()  # consumed by every analytic below

    report: dict = {
        "corpus": args.corpus,
        "stages": {"edges": {"rows": m["total_rows"], "resumed": resumed}},
    }

    if m["total_rows"] == 0:
        # a link-free corpus yields an empty (possibly schema-less)
        # edge checkpoint — emit the empty report instead of feeding the
        # analytics a column-less dataset
        report["graph"] = {
            "n_hosts": 0, "n_edges": 0, "n_links": 0, "n_components": 0,
            "largest_component_hosts": 0, "total_triangles": 0,
            "kcore_hosts": 0, "reciprocity_ppm": 0,
            "assortativity_micro": 0,
        }
        for k in ("top_pagerank", "top_hubs", "top_authorities",
                  "top_triangle_hosts"):
            report[k] = []
        report["degree_histogram"] = {"out": {}, "in": {}}
        with open(os.path.join(out, "REPORT.json"), "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        return report

    pr = pagerank(edges, iters=args.pagerank_iters).to_pandas()
    ha = hits(edges).to_pandas()
    tri = triangles(edges).to_pandas()
    core = kcore(edges, k=args.kcore_k).to_pandas()
    comp = host_components(edges).to_pandas()
    rec = reciprocity(edges).to_pandas()
    deg = degree_census(edges).to_pandas()
    asr = assortativity(edges).to_pandas()

    n_links = int(edges.map_batches(
        lambda b: pa.table({"n": pa.array(
            [int(pa.compute.sum(b["n_links"]).as_py() or 0)],
            type=pa.int64())}),
        batch_format="pyarrow").to_pandas()["n"].sum())

    comp_sizes = comp.groupby("component")["host"].count()
    report["graph"] = {
        "n_hosts": int(len(pr)),
        "n_edges": int(edges.count()),
        "n_links": n_links,
        "n_components": int(len(comp_sizes)),
        "largest_component_hosts": (int(comp_sizes.max())
                                    if len(comp_sizes) else 0),
        "total_triangles": int(tri["n_triangles"].sum()) // 3,
        "kcore_hosts": int(len(core)),
        "reciprocity_ppm": (
            int(rec["n_recip"].sum() * 1_000_000 // max(
                int(rec["n_out"].sum()), 1)) if len(rec) else 0),
        "assortativity_micro": int(asr["assort_micro"].iloc[0]),
    }
    report["top_pagerank"] = _topk(pr, "rank", args.top_k)
    report["top_hubs"] = _topk(ha, "hub", args.top_k)
    report["top_authorities"] = _topk(ha, "auth", args.top_k)
    report["top_triangle_hosts"] = _topk(tri, "n_triangles", args.top_k)
    report["degree_histogram"] = {
        d: {int(r.log2_bucket): int(r.n_hosts)
            for r in deg[deg["direction"] == d].itertuples()}
        for d in ("out", "in")
    }

    with open(os.path.join(out, "REPORT.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    return report


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    import ray

    if not ray.is_initialized():  # the driver may own the session
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    return run(args)


if __name__ == "__main__":
    rep = main()
    print(json.dumps({"graph": rep["graph"]}))
