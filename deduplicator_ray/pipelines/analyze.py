"""ANALYZE: compute ingest-time table statistics for a corpus.

    python -m deduplicator_ray.pipelines.analyze \
        --corpus /path/corpus [--corpus-format parquet] \
        [--column digest] [--out /path/stats.json]

Writes the hub-key statistics JSON that ``dedup_pipeline --stats-file``
(or the ``_stats.json`` sidecar convention) consumes, so per-job skew
detection never rescans the table.  Mirrors a warehouse ANALYZE: run
once at ingest, reuse across every job over the corpus.  Stats are
performance-only — salting never changes match output (pytest-pinned) —
so stale stats are safe.

Default --out is ``<corpus>/_stats.json`` when the corpus is a writable
directory (the sidecar every later run auto-discovers), else stats.json
in the working directory.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="compute ingest-time hub-key table statistics")
    p.add_argument("--corpus", required=True)
    p.add_argument("--corpus-format", default="parquet")
    p.add_argument("--column", default="digest",
                   help="key column to profile for hub values")
    p.add_argument("--sample-rows", type=int, default=None,
                   help="bound the scan (default: PipelineConfig default; 0 = full scan)")
    p.add_argument("--keep-digest-scheme", action="store_true",
                   help="profile digests WITH their 'sha1:' style prefixes "
                        "(matches pipelines run with --index-digest-scheme; "
                        "default strips, matching the pipeline default)")
    p.add_argument("--out", default=None, help="stats JSON path")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only when this process owns ray.init")
    return p


def run(args) -> dict:
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.sources import get_source
    from deduplicator_ray.stages.exact import find_hot_keys

    cfg = PipelineConfig()
    ds = get_source(args.corpus_format)(args.corpus)
    if args.column not in ds.schema().names:
        if args.column in ("digest", "url_canonical"):
            # raw corpus: derive the key the match pipeline will hash on,
            # with dedup_pipeline's digest-mode auto rule (html -> sha1)
            from deduplicator_ray.stages.normalize import normalize

            mode = "sha1_html" if "html" in ds.schema().names else "md5_text"
            ds = normalize(ds, cfg, digest_mode=mode, side="crawl")
        else:
            raise SystemExit(
                f"column '{args.column}' not in corpus schema {ds.schema().names}"
            )
    sample = cfg.hot_key_sample_rows if args.sample_rows is None else args.sample_rows
    # match-time detection strips 'sha1:' style prefixes unless the
    # pipeline runs with use_digest_scheme — stats must hash the SAME key
    # bytes or the salted shuffle never recognizes its hot keys
    strip = args.column == "digest" and not args.keep_digest_scheme
    hot = find_hot_keys(
        ds, args.column,
        num_buckets=cfg.shuffle_buckets,
        min_count=cfg.hot_key_min_count,
        strip_digest_scheme=strip,
        sample_rows=sample,
    )
    out = args.out
    if out is None:
        if os.path.isdir(args.corpus) and os.access(args.corpus, os.W_OK):
            out = os.path.join(args.corpus, "_stats.json")
        else:
            out = "stats.json"
    stats = {"column": args.column, "hot_digests": sorted(hot),
             "sample_rows": sample, "digest_scheme_stripped": strip}
    with open(out, "w") as f:
        json.dump(stats, f)
    return {"out": out, **stats}


def main(argv=None) -> int:
    import sys

    args = build_parser().parse_args(argv if argv is not None else sys.argv[1:])
    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    try:
        res = run(args)
    finally:
        ray.shutdown()
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
