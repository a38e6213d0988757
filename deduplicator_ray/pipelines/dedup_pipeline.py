"""End-to-end dedup pipeline + CLI (the ``ray job submit`` entry point).

    python -m deduplicator_ray.pipelines.dedup_pipeline \
        --corpus /path/corpus_parquet [--history /path/index_parquet] \
        --out /tmp/dedup_out [--strategy DIGEST_ANY] [--near-dup] \
        [--digest-mode sha1_html] [--force] [--num-cpus N]

Stages (each a resumable checkpoint under --out, see state/checkpoint.py):

    normalize   corpus -> +text +digest +url_canonical +content_bytes
    index       history index table (passed through, or built from the
                corpus when --build-index)
    matches     exact-match annotations (J1-J4) + REPORT.json/REPORT.txt
    edges       MinHash/LSH verified near-dup edges      (--near-dup)
    clusters    connected-component assignments          (--near-dup)

A rerun with the same config + inputs skips completed stages; changing
config or inputs invalidates exactly the affected stages (config hash +
input fingerprint are part of each manifest).
"""

from __future__ import annotations

import argparse
import json
import os

from deduplicator_ray.config import MinHashConfig, PipelineConfig, SearchStrategy
from deduplicator_ray.state.checkpoint import StageCheckpoint, input_fingerprint, run_stage


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Ray-Data-native web dedup pipeline")
    p.add_argument("--corpus", required=True, help="corpus file/dir (see --corpus-format)")
    p.add_argument("--corpus-format", default="parquet",
                   help="registered source reading --corpus: parquet (url, warc_ts, "
                        "html, text, lang), warc (dir/file of .warc[.gz]), crawl_log "
                        "(Heritrix crawl.log), arc/wet/wat/cdx/jsonl/csv, mixed "
                        "(ARC+WARC+WET in one dir) — sources.register_source adds more")
    p.add_argument("--include-etag", action="store_true",
                   help="carry the ETag column into the index (reference -e flag)")
    p.add_argument("--history", default=None, help="parquet index table (url, url_canonical, digest, date, ...)")
    p.add_argument("--append-index", default=None, metavar="PATH",
                   help="with --build-index: existing index parquet to merge "
                        "the new rows into (CREATE_OR_APPEND, "
                        "IndexBuilder.java:96-100)")
    p.add_argument("--append-prefer", default="newest",
                   choices=["newest", "incoming"],
                   help="append conflict rule: order-independent "
                        "keep-latest (newest) or Lucene updateDocument "
                        "last-write-wins (incoming)")
    p.add_argument("--build-index", action="store_true",
                   help="build the index from the corpus instead of matching against --history")
    p.add_argument("--out", required=True, help="output/checkpoint root")
    p.add_argument("--strategy", default="DIGEST_ANY", choices=[s.value for s in SearchStrategy])
    p.add_argument("--digest-mode", default="auto",
                   choices=["auto", "sha1_html", "md5_text"],
                   help="auto: sha1 over html bytes when the corpus has an "
                        "html column, else md5 over text")
    p.add_argument("--config", default=None,
                   help="properties file layered UNDER the flags (reference "
                        "deduplicator.properties precedence: defaults < file "
                        "< explicit flags; keys per IndexingLauncher.java:35-43)")
    p.add_argument("--mime-filter", default="^text/.*",
                   help="mime regex filter (reference -m; blacklist unless --whitelist)")
    p.add_argument("--whitelist", action="store_true",
                   help="make --mime-filter a whitelist (reference -w)")
    p.add_argument("--no-index-url", dest="index_url", action="store_false",
                   help="index digests only, no URL field (reference -u)")
    p.add_argument("--no-canonical", dest="include_canonical", action="store_false",
                   help="skip canonical-URL indexing/matching (reference -s)")
    p.add_argument("--canonicalizer", default="default",
                   help="url_canonical key function: 'default' (M5 rules), "
                        "'surt' (CDX-style SURT keys), or a name added via "
                        "functions.canonical.register_canonicalizer; must "
                        "match between index build and match runs")
    p.add_argument("--index-digest-scheme", dest="use_digest_scheme", action="store_true",
                   help="keep 'sha1:' style prefixes in indexed/queried digests "
                        "(reference deduplicator.indexdigestscheme)")
    p.set_defaults(index_url=True, include_canonical=True, use_digest_scheme=False)
    p.add_argument("--stats-file", default=None,
                   help="ingest-time table-statistics JSON ({'hot_digests': "
                        "[...]}) — skips the per-job hub-key sampling pass; "
                        "a '_stats.json' sidecar inside a parquet --corpus "
                        "dir is picked up automatically (performance-only: "
                        "salting never changes the output)")
    p.add_argument("--export-cdx", action="store_true",
                   help="with --build-index: also export the index as "
                        "sorted CDX shards + manifest under <out>/index_cdx "
                        "(SURT urlkeys, sources/cdx.py)")
    p.add_argument("--cdx-shards", type=int, default=16)
    p.add_argument("--write-revisits", action="store_true",
                   help="with --history: write detected duplicates as WARC "
                        "revisit records under <out>/revisits.warc.gz")
    p.add_argument("--within-batch", action="store_true")
    p.add_argument("--near-dup", action="store_true", help="run MinHash/LSH clustering")
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--rows-per-band", type=int, default=4)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--force", action="store_true", help="ignore existing checkpoints")
    p.add_argument("--num-cpus", type=int, default=None, help="only when this process owns ray.init")
    return p


def resolve_table_stats(corpus: str | None, stats_file: str | None):
    """Ingest-time hub statistics for ``PipelineConfig.hot_keys``: the
    explicit ``--stats-file``, else the conventional ``_stats.json``
    sidecar a parquet ingest writes next to the corpus (underscore prefix
    = ignored by parquet directory readers).  Returns None (per-job
    sampling detection) when neither exists.  Performance-only either
    way: salting never changes the match output (pytest-pinned)."""
    path = stats_file
    if path is None and corpus and os.path.isdir(corpus):
        cand = os.path.join(corpus, "_stats.json")
        path = cand if os.path.exists(cand) else None
    if not path:
        return None
    with open(path) as f:
        return tuple(sorted(json.load(f).get("hot_digests", [])))


def run(args) -> dict:
    import ray.data as rd

    from deduplicator_ray.pipelines.neardup import cluster_near_duplicates, ensure_doc_key
    from deduplicator_ray.stages.exact import (
        index_info,
        match_shuffle,
        render_report,
        report_aggregates,
    )
    from deduplicator_ray.stages.exact import build_index as build_index_stage
    from deduplicator_ray.stages.normalize import normalize

    from deduplicator_ray.sources import get_source
    from deduplicator_ray.stages.normalize import skip_counters

    # reference coupling rule (IndexingLauncher.java:123-125): canonical
    # indexing requires the URL field
    if not args.index_url:
        args.include_canonical = False
    cfg = PipelineConfig(
        hot_keys=resolve_table_stats(args.corpus, getattr(args, "stats_file", None)),
        strategy=SearchStrategy(args.strategy),
        within_batch=args.within_batch,
        include_etag=args.include_etag,
        mime_filter=args.mime_filter,
        mime_whitelist=args.whitelist,
        index_url=args.index_url,
        include_canonical=args.include_canonical,
        canonicalizer=args.canonicalizer,
        use_digest_scheme=args.use_digest_scheme,
        minhash=MinHashConfig(
            bands=args.bands,
            rows_per_band=args.rows_per_band,
            num_perms=args.bands * args.rows_per_band,
            jaccard_threshold=args.jaccard,
        ),
    )
    corpus_format = getattr(args, "corpus_format", "parquet")
    read_corpus = get_source(corpus_format)
    if args.digest_mode == "auto":
        if corpus_format == "parquet":
            import pyarrow.dataset as pads

            names = pads.dataset(args.corpus).schema.names
        else:
            names = read_corpus(args.corpus).schema().names
        if "html" in names:
            args.digest_mode = "sha1_html"
        elif "digest" in names:
            args.digest_mode = "md5_text"  # unused: rows carry their digest
        else:
            args.digest_mode = "md5_text"
    chash = cfg.config_hash() + ":" + args.digest_mode + ":" + corpus_format
    fp_corpus = input_fingerprint(args.corpus)
    out = args.out
    os.makedirs(out, exist_ok=True)
    results: dict = {"config_hash": chash}

    # -- normalize ----------------------------------------------------------
    side = "index" if args.build_index else "crawl"
    ck_norm = StageCheckpoint(out, "normalize", config_hash=chash, input_fingerprint=fp_corpus)
    norm_ds, m_norm, _ = run_stage(
        ck_norm,
        lambda: ensure_doc_key(
            normalize(read_corpus(args.corpus), cfg, digest_mode=args.digest_mode,
                      side=side)
        ),
        force=args.force,
    )
    results["normalize"] = m_norm
    # A3 run counters (IndexBuilder.java:131-133,174-178 parity) — cached
    # beside the normalize checkpoint so a resumed run doesn't pay a
    # second full corpus pass just to re-sum a handful of ints
    counters_path = os.path.join(out, "normalize", "_counters.json")
    counters_key = {"config_hash": chash, "input_fingerprint": fp_corpus}
    counters = None
    if not args.force and os.path.exists(counters_path):
        with open(counters_path) as f:
            cached = json.load(f)
        if cached.get("key") == counters_key:
            counters = cached["counters"]
    if counters is None:
        counters = skip_counters(read_corpus(args.corpus), cfg, side=side)
        os.makedirs(os.path.dirname(counters_path), exist_ok=True)
        with open(counters_path, "w") as f:
            json.dump({"key": counters_key, "counters": counters}, f)
    results["counters"] = counters

    # -- index --------------------------------------------------------------
    if args.build_index:
        append_path = getattr(args, "append_index", None)
        fp_idx = fp_corpus if not append_path else (
            fp_corpus + ":" + input_fingerprint(append_path)
            + ":" + args.append_prefer)
        ck_idx = StageCheckpoint(out, "index", config_hash=chash, input_fingerprint=fp_idx)

        def build_idx():
            built = build_index_stage(norm_ds, cfg)
            if append_path:
                from deduplicator_ray.stages.exact import merge_index

                return merge_index(rd.read_parquet(append_path), built, cfg,
                                   prefer=args.append_prefer)
            return built

        index_ds, m_idx, _ = run_stage(ck_idx, build_idx, force=args.force)
        results["index"] = m_idx
        if args.export_cdx:
            # archive-interchange form of the index: sorted CDX shards
            # keyed by SURT (sources/cdx.py), manifest beside the parquet
            import pyarrow as pa_

            from deduplicator_ray.functions.surt import surt_arrow
            from deduplicator_ray.sources.cdx import export_cdx

            def to_cdx_rows(b: pa_.Table) -> pa_.Table:
                cols = {
                    "urlkey": surt_arrow(b["url"].combine_chunks()),
                    "warc_ts": b["date"].cast(pa_.timestamp("us")),
                    "url": b["url"],
                    "digest": b["digest"],
                }
                return pa_.table(cols)

            results["cdx_export"] = export_cdx(
                index_ds.map_batches(to_cdx_rows, batch_format="pyarrow",
                                     zero_copy_batch=True),
                os.path.join(out, "index_cdx"),
                num_shards=args.cdx_shards)
    elif args.history:
        index_ds = rd.read_parquet(args.history)
    else:
        index_ds = None

    # -- exact matches + report --------------------------------------------
    if index_ds is not None and not args.build_index:
        fp_all = fp_corpus + ":" + input_fingerprint(args.history)
        ck_m = StageCheckpoint(out, "matches", config_hash=chash, input_fingerprint=fp_all)

        def build_matches():
            cur = norm_ds.drop_columns([c for c in ["html", "text"] if c in norm_ds.schema().names])
            return match_shuffle(cur, index_ds, cfg, id_cols=("doc_key",))

        matches_ds, m_m, _ = run_stage(ck_m, build_matches, force=args.force)
        results["matches"] = m_m
        agg = report_aggregates(matches_ds)
        agg["counters"] = results["counters"]  # A3: skipped / unresolved
        # lookup-timing + index-info report parity (DeDuplicator.java:
        # 235-243): match-stage wall time amortized per handled record,
        # and the Index.getInfo() block
        if agg["handled"] and m_m.get("wall_s"):
            agg["lookup"] = {
                "avg_ms": round(m_m["wall_s"] * 1000.0 / agg["handled"], 4),
                "wall_s": m_m["wall_s"],
            }
        agg["index_info"] = index_info(
            index_ds, cfg, records=results.get("index", {}).get("total_rows")
        )
        results["report"] = agg
        with open(os.path.join(out, "REPORT.json"), "w") as f:
            json.dump(agg, f, indent=1)
        with open(os.path.join(out, "REPORT.txt"), "w") as f:
            f.write(render_report(agg) + "\n")
        if args.write_revisits:
            # the reference's crawl-time product: duplicates become WARC
            # revisit records referencing their originals
            from deduplicator_ray.sources.warc import write_revisit_warc

            rpath, n_rev = write_revisit_warc(
                matches_ds, os.path.join(out, "revisits.warc.gz"))
            results["revisits"] = {"path": rpath, "records": n_rev}

    # -- near-dup clustering -------------------------------------------------
    if args.near_dup:
        ck_e = StageCheckpoint(out, "edges", config_hash=chash, input_fingerprint=fp_corpus)

        def build_edges():
            keyed = norm_ds.select_columns(["doc_key", "text"])
            edges, _ = cluster_near_duplicates(keyed, cfg.minhash, distributed_cc=False)
            return edges

        edges_ds, m_e, _ = run_stage(ck_e, build_edges, force=args.force)
        results["edges"] = m_e

        ck_c = StageCheckpoint(out, "clusters", config_hash=chash, input_fingerprint=fp_corpus)

        def build_clusters():
            from deduplicator_ray.stages.cc import connected_components_driver

            return rd.from_arrow(connected_components_driver(edges_ds))

        clusters_ds, m_c, _ = run_stage(ck_c, build_clusters, force=args.force)
        results["clusters"] = m_c

    with open(os.path.join(out, "RESULTS.json"), "w") as f:
        json.dump(results, f, indent=1, default=str)
    return results


def main(argv=None) -> int:
    import sys

    argv = list(sys.argv[1:]) if argv is None else list(argv)
    parser = build_parser()
    # properties-then-flags precedence (IndexingLauncher.java:95-125):
    # pre-scan for --config, fold the file's values in as parser DEFAULTS,
    # then parse the full argv so explicit flags override the file
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    pre_args, _ = pre.parse_known_args(argv)
    if pre_args.config:
        from deduplicator_ray.config_file import file_defaults

        dests, unknown = file_defaults(pre_args.config)
        for key in unknown:
            print(f"[config] ignoring unknown property {key}", file=sys.stderr)
        parser.set_defaults(**dests)
    args = parser.parse_args(argv)
    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    try:
        results = run(args)
    finally:
        ray.shutdown()
    print(json.dumps({k: v for k, v in results.items() if k in ("report", "config_hash")}, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
