"""Reproduce the BASELINE.md round-4 scale drills: the cleaning funnel
and the exact matcher at 10x the scaling corpus, through a deliberately
small object store so plasma spill actually runs.

    python tools/scale_drill.py prepare [captures|neardup]  # write drill corpora
    python tools/scale_drill.py clean  [ncpu] [out_dir]
    python tools/scale_drill.py exact  [ncpu]
    python tools/scale_drill.py exact_nodes [ncpu] # + raylet/pack telemetry
    python tools/scale_drill.py shufflebytes [ncpu]  # packed-vs-unpacked bytes
    python tools/scale_drill.py hash   <out_dir>   # sha256 of a funnel output

Set GRAFT_RAY_ADDRESS=auto to JOIN a started cluster (1- vs 2-raylet
drills, cluster/raylet2_exact.sh) and GRAFT_DIGEST_PACK=0 to disable
the packed-digest shuffle for A/Bs.

Every invocation owns its Ray session (fresh process per parallelism
level, like bench.py --scaling).  The store is capped at 8 GiB via
``object_store_memory`` — the raylet's "Spilled N MiB" log lines are the
spill evidence; outputs at different ncpu must hash identically.
Corpora live under $GRAFT_BENCH_CACHE (default /tmp/graft_bench_cache),
derived deterministically from $GRAFT_SF_DIR (default sf0.1) — no
external data.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEAT = int(os.environ.get("GRAFT_DRILL_REPEAT", "2560"))
STORE = int(os.environ.get("GRAFT_DRILL_STORE_GB", "8")) * 1024**3


def _bench():
    os.environ["GRAFT_BENCH_REPEAT"] = str(REPEAT)
    import bench

    return bench


def _init(ncpu: int):
    """Own a local session, or JOIN a started cluster when
    ``GRAFT_RAY_ADDRESS`` is set (e.g. ``auto`` after ``ray start
    --head`` [+ a second ``ray start --address=...`` raylet] — the
    two-raylet drill, where shuffle bytes cross the object-transfer
    path instead of staying inside one plasma store)."""
    import ray

    addr = os.environ.get("GRAFT_RAY_ADDRESS")
    if not ray.is_initialized():
        if addr:
            ray.init(address=addr, include_dashboard=False,
                     logging_level="ERROR")
        else:
            ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                     logging_level="ERROR", object_store_memory=STORE)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_prepare(only: str | None = None) -> None:
    """Write the drill corpora; ``only="captures"`` skips the neardup
    cache (the 100x exact drill needs only captures — at r25600 the
    neardup corpus would be ~40 GB of unused parquet)."""
    bench = _bench()
    _init(16)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    if only not in (None, "captures", "neardup"):
        raise SystemExit(f"unknown prepare target {only!r}")
    if only != "captures" and not bench._cache_ready("neardup"):
        docs = rd.read_parquet(f"{bench.SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])
        docs.map_batches(bench._neardup_expand, batch_format="pyarrow",
                         batch_size=128
                         ).repartition(128).write_parquet(
            bench._cache_dir("neardup"))
        bench._mark_done("neardup")
    if only != "neardup" and not bench._cache_ready("captures"):
        from deduplicator_ray.sources.corpus import captures_dataset

        caps = captures_dataset(bench.SF_DIR, repeat=REPEAT)

        def strip(b: pa.Table) -> pa.Table:
            b = b.append_column("content_bytes",
                                pc.cast(pc.utf8_length(b["text"]), "int64"))
            return b.drop_columns(["text", "lang"]).replace_schema_metadata(None)

        stripped = caps.map_batches(strip, batch_format="pyarrow",
                                    zero_copy_batch=True)
        if REPEAT <= 2560:
            stripped = stripped.repartition(256)
        # beyond r2560 the repartition's all-to-all would materialize the
        # whole ~47 GB corpus through the capped store (≈40 GB of disk
        # spill — measured to FILL this box's disk at r25600); the
        # streaming write needs no exchange and the expansion's block
        # sizing already yields ~150 well-sized files
        stripped.write_parquet(bench._cache_dir("captures"))
        bench._captures_stats()
        bench._mark_done("captures")
    print(json.dumps({"prepared": bench._cache_dir("")}))


def cmd_clean(ncpu: int, out: str) -> None:
    bench = _bench()
    _init(ncpu)
    from deduplicator_ray.pipelines.clean_pipeline import build_parser, run

    t0 = time.time()
    rep = run(build_parser().parse_args([
        "--corpus", bench._cache_dir("neardup"), "--out", out,
        "--min-words", "40", "--extra-stopwords", "a",
    ]))
    print(json.dumps({"ncpu": ncpu, "clean_sec": round(time.time() - t0, 1),
                      "input_docs": rep["input_docs"],
                      "output_docs": rep["output_docs"]}))


def cmd_exact(ncpu: int, *, telemetry: bool = False) -> None:
    """The exact-match drill; ``telemetry=True`` (the ``exact_nodes``
    command) adds raylet-count / pack / loadavg fields so 1- vs
    2-raylet runs are self-evidencing — ONE recipe for both, so the
    topologies can never silently measure different pipelines."""
    bench = _bench()
    ray = _init(ncpu)
    nodes = [n for n in ray.nodes() if n.get("Alive")]
    import ray.data as rd

    from deduplicator_ray.config import PipelineConfig, SearchStrategy
    from deduplicator_ray.stages.exact import (match_shuffle_tagged,
                                               report_aggregates)

    cache = bench._cache_dir("captures")
    hot = tuple(json.load(open(cache + "/_stats.json"))["hot_digests"])
    t0 = time.time()
    caps = rd.read_parquet(
        cache,
        columns=["doc_id", "rep", "url", "url_canonical", "digest",
                 "warc_ts", "crawl", "content_bytes"],
        override_num_blocks=4 * ncpu)
    cfg = PipelineConfig(strategy=SearchStrategy.DIGEST_URL_PREFERRED,
                         hot_keys=hot)
    agg = report_aggregates(
        match_shuffle_tagged(caps, cfg, id_cols=("doc_id", "rep")))
    dt = time.time() - t0
    out = {"ncpu": ncpu, "sec": round(dt, 1), "handled": agg["handled"],
           "duplicates": agg["duplicates"],
           "caps_per_sec": round(agg["handled"] / dt)}
    if telemetry:
        out.update({
            "n_raylets": len(nodes),
            "pack": os.environ.get("GRAFT_DIGEST_PACK", "1") != "0",
            "loadavg": round(os.getloadavg()[0], 1),
        })
    print(json.dumps(out))


def cmd_shufflebytes(ncpu: int) -> None:
    """Measure the bytes ENTERING the exact-match all-to-all (the
    conformed + bucketed + optionally packed dataset match_shuffle_tagged
    hands to groupby) with the digest pack on vs off — the denominator
    for the 2-raylet A/B.  Uses a small repeat (bytes/row is
    repeat-invariant)."""
    bench = _bench()
    _init(ncpu)
    import ray.data as rd

    from deduplicator_ray.config import PipelineConfig, SearchStrategy
    from deduplicator_ray.stages.exact import (_match_hot_keys,
                                               _pack_digests,
                                               conform_tagged,
                                               hash_bucket_salted)

    cache = bench._cache_dir("captures")
    hotk = tuple(json.load(open(cache + "/_stats.json"))["hot_digests"])
    caps = rd.read_parquet(
        cache,
        columns=["doc_id", "rep", "url", "url_canonical", "digest",
                 "warc_ts", "crawl", "content_bytes"],
        override_num_blocks=4 * ncpu)
    cfg = PipelineConfig(strategy=SearchStrategy.DIGEST_URL_PREFERRED,
                         hot_keys=hotk)
    strip = not cfg.use_digest_scheme
    both = conform_tagged(caps, history_col="crawl", history_value="history",
                          id_cols=("doc_id", "rep"),
                          strip_digest_scheme=strip, remap_revisits=True)
    hot = _match_hot_keys(caps, cfg, strip, skip_col="crawl",
                          skip_value="history")
    both = hash_bucket_salted(both, "digest", cfg.shuffle_buckets, hot,
                              cfg.salt_buckets)
    out = {"repeat": REPEAT}
    for pack in ("1", "0"):
        os.environ["GRAFT_DIGEST_PACK"] = pack
        m = _pack_digests(both).materialize()
        key = "packed" if pack == "1" else "unpacked"
        out[key + "_bytes"] = int(m.size_bytes())
        out[key + "_bytes_per_row"] = round(m.size_bytes() / m.count(), 1)
        out["rows"] = int(m.count())
    out["byte_cut_pct"] = round(
        100 * (1 - out["packed_bytes"] / out["unpacked_bytes"]), 1)
    print(json.dumps(out))


def cmd_hash(out: str) -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{out}/shuffled/data/*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files]
                   ).sort_values("doc_key", ignore_index=True)
    h = hashlib.sha256()
    h.update(df["doc_key"].to_numpy("int64").tobytes())
    h.update(df["position"].to_numpy("int64").tobytes())
    h.update("\x00".join(df["text"].tolist()).encode())
    print(json.dumps({"rows": len(df), "sha256": h.hexdigest()}))


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "prepare"
    if cmd == "prepare":
        cmd_prepare(sys.argv[2] if len(sys.argv) > 2 else None)
    elif cmd == "clean":
        cmd_clean(int(sys.argv[2]) if len(sys.argv) > 2 else 16,
                  sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_drill_clean")
    elif cmd == "exact":
        cmd_exact(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif cmd == "exact_nodes":
        cmd_exact(int(sys.argv[2]) if len(sys.argv) > 2 else 16,
                  telemetry=True)
    elif cmd == "shufflebytes":
        cmd_shufflebytes(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif cmd == "hash":
        cmd_hash(sys.argv[2])
    else:
        raise SystemExit(f"unknown drill {cmd!r}")
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
