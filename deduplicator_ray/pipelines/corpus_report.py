"""CORPUS CARD pipeline + CLI — the training-data release summary:

    python -m deduplicator_ray.pipelines.corpus_report \
        --docs /path/documents.parquet [--docs-format parquet] \
        --out /tmp/card_out [--top-n 20] [--force]

Over one documents-style table (doc_id, text[, lang][, source]) it
derives, each as a resumable checkpoint under --out
(state/checkpoint.py — a rerun skips completed stages):

    stats        per-doc token/char counters (stages/textstats.token_counts
                 + Arrow char counts), rolled up to corpus totals and a
                 per-lang census when a lang column exists
    dedup        exact-duplicate volume on the raw text AND on the
                 CCNet-normalized key (functions/textnorm.py) in ONE
                 corpus pass — the normalization payoff is the delta
    gopher       Gopher-rule pass/fail counts by first failing rule
                 (stages/textstats.gopher_filter)
    boilerplate  the top frequent 10-word chunks
                 (stages/sentdedup.boilerplate_report)

Per-lang length quantiles are computed directly (the stage reduces to a
bounded histogram of per-block partials — cheaper to redo than to
checkpoint); the four stages above checkpoint and skip on rerun.

REPORT.json rolls the products up into the card a dataset release
ships: doc/token/char totals, language mix, duplicate ppm (raw and
normalized-key), quality-filter funnel, length distribution, and the
boilerplate the cleaner would strip.  Every number is a driver-side
reduction of tiny per-block partials — the corpus is scanned a bounded
number of times and never materialized.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.state.checkpoint import (
    StageCheckpoint,
    input_fingerprint,
    run_stage,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="training-corpus card report")
    p.add_argument("--docs", required=True,
                   help="documents table: (doc_id, text[, lang][, source])")
    p.add_argument("--docs-format", default="parquet")
    p.add_argument("--out", required=True)
    p.add_argument("--top-n", type=int, default=20,
                   help="boilerplate chunks to report")
    p.add_argument("--boilerplate-min-count", type=int, default=3)
    p.add_argument("--force", action="store_true",
                   help="rebuild every stage even if checkpointed")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only when this process owns ray.init")
    return p


def _dup_counts_build(ds):
    """ONE corpus pass emitting BOTH key families (raw and
    CCNet-normalized text hashes) -> per-bucket partial Dataset
    (n, n_distinct_raw, n_distinct_norm).  The shuffle ships 32-byte
    hash rows, never text, bucketed on the NORMALIZED hash:
    normalization is many-to-one, so equal raw texts always share a
    normalized text and land in one bucket — both distinct counts are
    exact per bucket and sum to the global values."""
    from deduplicator_ray.functions.textnorm import normalize_text_arrow
    from deduplicator_ray.stages.exact import hash_bucket

    def keys(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b["text"], "")
        tn = normalize_text_arrow(t.combine_chunks()
                                  if isinstance(t, pa.ChunkedArray) else t)

        def pair(arr, k1, k2):
            s = pd.Series(np.asarray(arr, dtype=object))
            return (pd.util.hash_pandas_object(s, index=False,
                                               hash_key=k1).to_numpy(),
                    pd.util.hash_pandas_object(s, index=False,
                                               hash_key=k2).to_numpy())

        h1, h2 = pair(t, "corpuscard_key01", "corpuscard_key02")
        g1, g2 = pair(tn, "corpuscard_key03", "corpuscard_key04")
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                         "g1": pa.array(g1), "g2": pa.array(g2)})

    # bucket on the NORMALIZED hash: normalization is a many-to-one map,
    # so rows sharing a raw text also share the normalized text — both
    # distinct counts are exact within a g1-bucket
    hashed = hash_bucket(ds.map_batches(keys, batch_format="pyarrow",
                                        zero_copy_batch=True), "g1", 32)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": [int(len(g))],
            "n_distinct_raw": [int(g.drop_duplicates(["h1", "h2"]).shape[0])],
            "n_distinct_norm": [int(g.drop_duplicates(["g1", "g2"]).shape[0])],
        })

    return (hashed.groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def run(args) -> dict:
    from deduplicator_ray.sources import get_source
    from deduplicator_ray.stages.freq import length_quantiles
    from deduplicator_ray.stages.sentdedup import boilerplate_report
    from deduplicator_ray.stages.textstats import gopher_filter, token_counts

    out = args.out
    os.makedirs(out, exist_ok=True)
    fp = input_fingerprint(args.docs)
    cfg_hash = f"v1:{args.top_n}:{args.boilerplate_min_count}"

    docs = get_source(args.docs_format)(args.docs)
    names = set(docs.schema().names)
    have_lang = "lang" in names
    report: dict = {"corpus": args.docs, "stages": {}}

    def stage(name, build):
        ck = StageCheckpoint(out, name, config_hash=cfg_hash,
                             input_fingerprint=fp)
        ds, m, skipped = run_stage(ck, build, force=args.force)
        report["stages"][name] = {"rows": m["total_rows"], "resumed": skipped}
        return ds

    # -- stats: per-block partial sums, tiny driver reduction -------------
    def stats_build():
        counted = token_counts(docs)

        def partial(b: pa.Table) -> pa.Table:
            # null lang keys as "?" — dropping it from the groupby would
            # silently undercount the corpus totals
            lang = (pc.fill_null(b["lang"], "?").to_pandas() if have_lang
                    else pd.Series(["?"] * b.num_rows))
            df = pd.DataFrame({
                "lang": lang,
                "ws": b["n_ws_tokens"].to_pandas(),
                "bpe": b["n_bpe_tokens"].to_pandas(),
                "chars": pc.cast(pc.utf8_length(pc.fill_null(b["text"], "")),
                                 pa.int64()).to_pandas(),
            })
            g = df.groupby("lang", as_index=False).agg(
                n_docs=("ws", "size"), ws_tokens=("ws", "sum"),
                bpe_tokens=("bpe", "sum"), chars=("chars", "sum"))
            for c in g.columns[1:]:
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return counted.map_batches(partial, batch_format="pyarrow",
                                   batch_size=4096)

    lang_stats = (stage("stats", stats_build).to_pandas()
                  .groupby("lang", as_index=False).sum())
    report["totals"] = {
        "n_docs": int(lang_stats["n_docs"].sum()),
        "ws_tokens": int(lang_stats["ws_tokens"].sum()),
        "bpe_tokens": int(lang_stats["bpe_tokens"].sum()),
        "chars": int(lang_stats["chars"].sum()),
    }
    if have_lang:
        report["languages"] = [
            {"lang": r.lang, "n_docs": int(r.n_docs),
             "ws_tokens": int(r.ws_tokens)}
            for r in lang_stats.sort_values(
                ["n_docs", "lang"], ascending=[False, True]).itertuples()]

    # -- dedup: raw vs normalized-key duplicate volume, ONE checkpointed
    # corpus pass emitting both key families ------------------------------
    tot = (stage("dedup", lambda: _dup_counts_build(docs))
           .to_pandas().sum())
    n, nd_raw, nd_norm = (int(tot["n"]), int(tot["n_distinct_raw"]),
                          int(tot["n_distinct_norm"]))
    report["dedup"] = {
        "n_docs": n,
        "distinct_texts": nd_raw,
        "duplicate_ppm": (n - nd_raw) * 1_000_000 // max(n, 1),
        "distinct_normalized": nd_norm,
        "normalized_duplicate_ppm": (n - nd_norm) * 1_000_000 // max(n, 1),
    }

    # -- gopher funnel ----------------------------------------------------
    def gopher_build():
        flt = gopher_filter(docs, output="project")

        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "reason": pc.fill_null(b["fail_reason"], "kept").to_pandas(),
            })
            g = df.groupby("reason", as_index=False).size()
            g["size"] = g["size"].astype("int64")
            return pa.Table.from_pandas(g.rename(columns={"size": "n"}),
                                        preserve_index=False)

        return flt.map_batches(partial, batch_format="pyarrow",
                               batch_size=4096)

    funnel = (stage("gopher", gopher_build).to_pandas()
              .groupby("reason")["n"].sum())
    report["gopher"] = {k: int(v) for k, v in sorted(funnel.items())}

    # -- length quantiles (driver-small product: computed directly — the
    # stage itself reduces to a histogram of tiny per-block partials) ----
    def chars(b: pa.Table) -> pa.Table:
        lang = (pc.fill_null(b["lang"], "?") if have_lang
                else pa.array(["?"] * b.num_rows, type=pa.string()))
        return pa.table({
            "lang": lang,
            "n_chars": pc.cast(pc.utf8_length(pc.fill_null(b["text"], "")),
                               pa.int64()),
        })

    q = length_quantiles(
        docs.map_batches(chars, batch_format="pyarrow", zero_copy_batch=True))
    if not isinstance(q, pd.DataFrame):
        q = q.to_pandas()
    report["length_quantiles"] = [
        {k: (int(v) if not isinstance(v, str) else v)
         for k, v in row.items()} for row in q.to_dict("records")]

    # -- boilerplate ------------------------------------------------------
    bp = stage("boilerplate", lambda: boilerplate_report(
        docs, min_count=args.boilerplate_min_count,
        top_n=args.top_n)).to_pandas()
    report["boilerplate"] = [
        {"chunk": r.chunk, "n_occ": int(r.n_occ), "n_docs": int(r.n_docs)}
        for r in bp.itertuples()]

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
