"""ARCHIVE HEALTH REPORT pipeline + CLI — the snapshot-delta composition:

    python -m deduplicator_ray.pipelines.archive_report \
        --corpus /path/captures [--corpus-format parquet] \
        --out /tmp/archive_out [--history-crawl history] [--force]

Over one captures corpus (url, warc_ts|ts_epoch[, digest][, text]
[, crawl]) it derives, each as a resumable checkpoint under --out
(state/checkpoint.py — a rerun skips completed stages):

    timeline   stored content versions per page (stages/timeline.timeline_dedup)
    gaps       per-site recrawl-gap statistics (stages/timeline.capture_gaps)
    change     per-site content change rate (stages/timeline.site_change_rate)
    savings    per-host storage savings (stages/delta.host_dedup_savings;
               skipped without a text column)
    delta      per-page new/gone/changed/unchanged between the history
               and current snapshots (stages/delta.crawl_delta; skipped
               without a crawl column), plus a per-site churn rollup
    aliases    per-site raw-url alias census (stages/urlmine.alias_census
               — the canonicalization payoff)

REPORT.json rolls the products up: captures vs stored versions (the
archive's storage-compression headline — the batch analog of the
reference's duplicate-amount report, DeDuplicator.java:226-233), page
counts by delta status, total chars saved, and the top changing sites.

Missing columns are derived in ONE map-only normalize pass: url_canonical
via the M5 canonicalizer, ts_epoch from warc_ts, digest as md5(text)
when absent (the digest the whole engine keys on).
"""

from __future__ import annotations

import argparse
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.state.checkpoint import (
    StageCheckpoint,
    input_fingerprint,
    run_stage,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="web-archive health report")
    p.add_argument("--corpus", required=True,
                   help="captures table: (url, warc_ts|ts_epoch[, digest]"
                        "[, text][, crawl])")
    p.add_argument("--corpus-format", default="parquet")
    p.add_argument("--out", required=True)
    p.add_argument("--history-crawl", default="history",
                   help="crawl-column value naming the older snapshot")
    p.add_argument("--top-sites", type=int, default=10)
    p.add_argument("--force", action="store_true",
                   help="rebuild every stage even if checkpointed")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only when this process owns ray.init")
    return p


def normalize_captures(ds):
    """Derive url_canonical / ts_epoch / digest when absent (map-only)."""
    from deduplicator_ray.functions.canonical import canonicalize_arrow
    from deduplicator_ray.functions.digesting import md5_hex_many

    names = set(ds.schema().names)
    have_digest = "digest" in names
    have_text = "text" in names

    def norm(b: pa.Table) -> pa.Table:
        cols = {n: b[n] for n in b.column_names}
        if "ts_epoch" not in cols:
            cols["ts_epoch"] = pc.divide(
                pc.cast(b["warc_ts"].cast(pa.timestamp("us")), pa.int64()),
                1_000_000)
        if "url_canonical" not in cols:
            cols["url_canonical"] = canonicalize_arrow(
                b["url"].combine_chunks().cast(pa.string()))
        if not have_digest:
            cols["digest"] = pa.array(
                md5_hex_many(pc.fill_null(b["text"], "").to_pylist()),
                type=pa.string())
        return pa.table(cols)

    if not have_digest and not have_text:
        raise ValueError("corpus needs a digest or a text column")
    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def _alias_stage(caps):
    from deduplicator_ray.stages.urlmine import alias_census

    return alias_census(caps)


def run(args) -> dict:
    import pandas as pd

    from deduplicator_ray.sources import get_source
    from deduplicator_ray.stages.delta import crawl_delta, host_dedup_savings
    from deduplicator_ray.stages.timeline import (
        capture_gaps,
        site_change_rate,
        timeline_dedup,
    )

    out = args.out
    os.makedirs(out, exist_ok=True)
    fp = input_fingerprint(args.corpus)
    cfg_hash = f"v1:{args.history_crawl}"

    caps = normalize_captures(get_source(args.corpus_format)(args.corpus))
    names = set(caps.schema().names)
    report: dict = {"corpus": args.corpus, "stages": {}}

    def stage(name, build):
        ck = StageCheckpoint(out, name, config_hash=cfg_hash,
                             input_fingerprint=fp)
        ds, m, skipped = run_stage(ck, build, force=args.force)
        report["stages"][name] = {"rows": m["total_rows"],
                                  "resumed": skipped}
        return ds

    tl = stage("timeline", lambda: timeline_dedup(caps))
    gaps = stage("gaps", lambda: capture_gaps(caps))
    change = stage("change", lambda: site_change_rate(caps))

    # headline: captures vs stored versions (tiny driver-side aggregate
    # over the 3-int timeline columns, not the corpus)
    tstats = tl.map_batches(
        lambda b: pa.table({
            "versions": pa.array([b.num_rows], type=pa.int64()),
            "skipped": pa.array([pc.sum(b["n_skipped"]).as_py() or 0],
                                type=pa.int64()),
        }), batch_format="pyarrow").to_pandas().sum()
    n_versions = int(tstats["versions"])
    n_captures = n_versions + int(tstats["skipped"])
    report["storage"] = {
        "captures": n_captures,
        "stored_versions": n_versions,
        "unchanged_revisits": n_captures - n_versions,
        "duplicate_ppm": ((n_captures - n_versions) * 1_000_000
                          // max(n_captures, 1)),
    }

    if "text" in names:
        sav = stage("savings", lambda: host_dedup_savings(caps))
        tot = sav.map_batches(
            lambda b: pa.table({
                "saved": pa.array([pc.sum(b["chars_saved"]).as_py() or 0],
                                  type=pa.int64()),
                "total": pa.array([pc.sum(b["chars_total"]).as_py() or 0],
                                  type=pa.int64()),
            }), batch_format="pyarrow").to_pandas().sum()
        report["storage"]["chars_total"] = int(tot["total"])
        report["storage"]["chars_saved"] = int(tot["saved"])

    if "crawl" in names:
        from deduplicator_ray.stages.delta import site_delta_census

        delta = stage("delta", lambda: crawl_delta(
            caps, history=args.history_crawl))
        census = (delta.map_batches(
            lambda df: df.groupby("status", as_index=False).agg(
                n=("status", "size")), batch_format="pandas")
            .to_pandas().groupby("status")["n"].sum())
        report["delta"] = {k: int(v) for k, v in census.items()}
        # per-site movement rolled up from the checkpointed delta (no
        # recompute); biggest movers by churn = new+gone+changed
        sites = site_delta_census(delta=delta)
        sites["churn"] = (sites["n_new"] + sites["n_gone"]
                          + sites["n_changed"])
        top = sites.sort_values(["churn", "site"],
                                ascending=[False, True]).head(args.top_sites)
        report["top_churn_sites"] = [
            {"site": r.site, "n_new": int(r.n_new), "n_gone": int(r.n_gone),
             "n_changed": int(r.n_changed), "n_unchanged": int(r.n_unchanged)}
            for r in top.itertuples()]

    aliases = stage("aliases", lambda: _alias_stage(caps))
    al = aliases.to_pandas()
    report["aliases"] = {
        "n_raw_urls": int(al["n_raw_urls"].sum()) if len(al) else 0,
        "n_pages": int(al["n_pages"].sum()) if len(al) else 0,
        "n_alias_urls": int(al["n_alias_urls"].sum()) if len(al) else 0,
    }

    top = (change.to_pandas()
           .sort_values(["change_ppm", "site"], ascending=[False, True])
           .head(args.top_sites))
    report["top_changing_sites"] = [
        {"site": r.site, "change_ppm": int(r.change_ppm),
         "n_pages": int(r.n_pages)} for r in top.itertuples()]
    med = gaps.to_pandas()
    report["recrawl"] = {
        "sites_with_gaps": int(len(med)),
        "median_of_site_median_gaps": (
            int(med["p50_gap"].median()) if len(med) else None),
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
    r = main()
    print(json.dumps(r, indent=2, sort_keys=True))
