"""End-to-end training-corpus CLEANING pipeline + CLI — the LLM-data
composition the dedup engine exists for:

    python -m deduplicator_ray.pipelines.clean_pipeline \
        --corpus /path/docs_parquet --out /tmp/clean_out \
        [--min-words 50] [--span-ngram 8] [--jaccard 0.8] [--seed 0] \
        [--no-filter] [--no-neardup] [--no-span] [--force]

Stages (each a resumable checkpoint under --out, see state/checkpoint.py;
a rerun with the same config + input skips completed stages):

    filtered    Gopher-rule quality filter (stages/textstats.gopher_filter,
                annotate mode) — drops failing docs, keeps a reason census
    survivors   near-duplicate removal: MinHash -> LSH -> CC clusters
                (pipelines/neardup.cluster_near_duplicates), keep ONE
                representative per cluster (the min doc_key)
    semantic    OPTIONAL embedding-space dedup (--semantic-dedup
                semdedup|d4 with --embeddings): SemDeDup within-cluster
                cosine dedup (stages/embed.semdedup_keep), or D4 which
                additionally prunes prototypical survivors
                (stages/embed.d4_keep); judges only docs still in the
                funnel, so an earlier-removed near-dup can never act as
                a cluster's kept representative
    spandedup   ExactSubstr-style duplicated-span removal inside the
                survivors (stages/sentdedup.span_dedup)
    shuffled    deterministic global training shuffle: every doc gets a
                seeded exact permutation position
                (stages/shuffle.deterministic_shuffle); the stage output
                IS the cleaned corpus (doc_key, text, position), written
                as partitioned parquet

REPORT.json records the per-stage funnel (docs in/out, drop reasons,
near-dup clusters collapsed, span words removed) — the cleaning analog
of the exact pipeline's dedup report.

Scale shape: every stage is the already-audited distributed operator —
the only driver-side materializations are the near-dup assignment table
(clustered docs only) and the 6-row reason census; duplicate-id removal
broadcasts the id set up to --max-broadcast and falls back to a
co-partitioned anti-join beyond it, so document text never rides a
shuffle outside the span-dedup rebuild's own co-partition fallback.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa

from deduplicator_ray.config import MinHashConfig
from deduplicator_ray.state.checkpoint import (
    StageCheckpoint,
    input_fingerprint,
    run_stage,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Ray-Data-native corpus cleaning")
    p.add_argument("--corpus", required=True,
                   help="docs table: (doc_id|url+warc_ts, text)")
    p.add_argument("--corpus-format", default="parquet",
                   help="registered source reading --corpus; must yield a "
                        "text column (parquet, jsonl — warc/crawl_log "
                        "corpora carry no extracted text: run "
                        "dedup_pipeline's normalize first)")
    p.add_argument("--out", required=True, help="output/checkpoint root")
    p.add_argument("--min-words", type=int, default=50)
    p.add_argument("--max-words", type=int, default=100_000)
    p.add_argument("--min-stop", type=int, default=2)
    p.add_argument("--extra-stopwords", default="",
                   help="comma-separated corpus-specific additions to the "
                        "Gopher stoplist (e.g. 'a' for the synthetic corpus)")
    p.add_argument("--span-ngram", type=int, default=8)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--rows-per-band", type=int, default=4)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-broadcast", type=int, default=2_000_000)
    p.add_argument("--no-filter", dest="do_filter", action="store_false")
    p.add_argument("--no-neardup", dest="do_neardup", action="store_false")
    p.add_argument("--no-span", dest="do_span", action="store_false")
    p.add_argument("--semantic-dedup", choices=("off", "semdedup", "d4"),
                   default="off",
                   help="optional embedding-space dedup stage between "
                        "near-dup and span removal: 'semdedup' drops "
                        "within-cluster cosine duplicates (Abbas 2023), "
                        "'d4' additionally prunes the most prototypical "
                        "survivors (Tirumala 2023); needs --embeddings")
    p.add_argument("--embeddings", default=None,
                   help="parquet table (vec_id, embedding) keyed by the "
                        "corpus doc_key; docs without a vector pass "
                        "through unjudged")
    p.add_argument("--sem-k", type=int, default=8,
                   help="k-means blocking clusters for semantic dedup")
    p.add_argument("--sem-threshold", type=float, default=0.9)
    p.add_argument("--sem-prune-frac", type=float, default=0.25,
                   help="d4 only: prototypical fraction pruned per cluster")
    p.set_defaults(do_filter=True, do_neardup=True, do_span=True)
    p.add_argument("--force", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only when this process owns ray.init")
    return p


def drop_ids(ds, ids, *, key_col: str = "doc_key",
             max_broadcast: int = 2_000_000, num_buckets: int = 64):
    """Anti-join: remove rows whose ``key_col`` is in ``ids``.

    ``ids`` is a numpy int64 array OR a single-int64-column Dataset (the
    producer stays distributed; only a ≤``max_broadcast`` id list ever
    lands on the driver).  Small id sets (the common case — near-dup
    non-representatives are a corpus-dependent minority) broadcast once
    via ``ray.put`` and every task filters map-side; beyond
    ``max_broadcast`` the ids co-partition with the data on the key (one
    shuffle of the data, tags only for the id side)."""
    import ray

    if not isinstance(ids, np.ndarray):
        id_mat = ids.materialize()
        n_ids = id_mat.count()  # metadata-only on a materialized dataset
        col = id_mat.schema().names[0]
        if n_ids > max_broadcast:
            id_side = id_mat
            if col != key_col:
                id_side = id_side.map_batches(
                    lambda b: b.rename_columns([key_col]),
                    batch_format="pyarrow", zero_copy_batch=True)
            return _drop_ids_shuffle(ds, id_side, key_col, num_buckets)
        ids = np.concatenate(
            [b[col].to_numpy().astype(np.int64) for b in
             id_mat.iter_batches(batch_format="pyarrow")]
            or [np.empty(0, np.int64)])

    ids = np.sort(np.asarray(ids, dtype=np.int64))
    if len(ids) <= max_broadcast:
        ref = ray.put(ids)

        def f(b: pa.Table) -> pa.Table:
            from deduplicator_ray.util import isin_sorted

            k = b[key_col].to_numpy().astype(np.int64)
            drop = ray.get(ref)
            if not len(drop) or not len(k):
                return b
            return b.filter(pa.array(~isin_sorted(drop, k)))

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    import ray.data as rd

    id_ds = rd.from_arrow(pa.table({key_col: pa.array(ids)}))
    return _drop_ids_shuffle(ds, id_ds, key_col, num_buckets)


def _drop_ids_shuffle(ds, id_ds, key_col: str, num_buckets: int):
    """Hash-partitioned anti-join for beyond-broadcast id sets."""
    from deduplicator_ray.stages.exact import hash_bucket

    def tag(src: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_src", pa.array(np.full(b.num_rows, src, dtype=np.int8))
            )
        return f

    both = ds.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        id_ds.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    both = hash_bucket(both, key_col, num_buckets)

    def anti(g: pa.Table) -> pa.Table:
        # Arrow-native reduce: the union null-pads the id rows' doc
        # columns, and a pandas map_groups would promote int64 doc
        # columns to float64 through those NaNs — Arrow keeps the types
        from deduplicator_ray.util import isin_sorted

        src = g["_src"].to_numpy(zero_copy_only=False)
        keys = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        drop = np.unique(keys[src == 1])
        hit = isin_sorted(drop, keys)
        out = g.filter(pa.array((src == 0) & ~hit))
        return out.drop_columns(["_src", "_part"])

    return both.groupby("_part").map_groups(anti, batch_format="pyarrow")


def _reason_census(flt_ds) -> dict:
    """6-distinct-value histogram via per-block partial counts."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        vc = b["fail_reason"].to_pandas().value_counts(dropna=True)
        return pa.table({
            "reason": pa.array(vc.index.to_numpy(object), type=pa.string()),
            "c": pa.array(vc.to_numpy(np.int64)),
        })

    pdf = flt_ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if "reason" not in pdf.columns:
        return {}
    out = pdf.groupby("reason")["c"].sum().sort_index()
    return {str(k): int(v) for k, v in out.items()}


def run(args) -> dict:
    import ray.data as rd

    from deduplicator_ray.pipelines.neardup import (
        cluster_near_duplicates,
        ensure_doc_key,
    )
    from deduplicator_ray.stages.sentdedup import span_dedup
    from deduplicator_ray.stages.shuffle import deterministic_shuffle
    from deduplicator_ray.stages.textstats import gopher_filter

    mh = MinHashConfig(bands=args.bands, rows_per_band=args.rows_per_band,
                       num_perms=args.bands * args.rows_per_band,
                       jaccard_threshold=args.jaccard)
    # CHAINED per-stage config hashes: each stage's hash covers its own
    # knobs plus everything upstream, so changing a late knob (e.g.
    # --seed) invalidates ONLY that stage — a reshuffle of an
    # already-cleaned corpus resumes past filter/neardup/span instead of
    # recomputing them (at 100 TB that is the difference between minutes
    # and days)
    stops = ",".join(sorted(w for w in args.extra_stopwords.split(",") if w))
    fmt = getattr(args, "corpus_format", "parquet")
    h_filter = "|".join(str(x) for x in (
        # the format marker appears only when non-default so checkpoints
        # written before the knob existed stay valid (checkpoints written
        # by the brief intermediate revision that always embedded the
        # marker take a one-time recompute)
        "clean2-filter", *((fmt,) if fmt != "parquet" else ()),
        args.do_filter, args.min_words, args.max_words,
        args.min_stop, stops,
    ))
    h_neardup = "|".join(str(x) for x in (
        h_filter, "neardup", args.do_neardup, args.bands,
        args.rows_per_band, args.jaccard,
    ))
    sem = getattr(args, "semantic_dedup", "off")
    if sem != "off":
        if not args.embeddings:
            raise ValueError("--semantic-dedup needs --embeddings")
        # embeddings-input fingerprint folds into the hash so a new
        # vector table invalidates this stage (and everything after)
        h_sem = "|".join(str(x) for x in (
            h_neardup, "semantic", sem, args.sem_k, args.sem_threshold,
            *((args.sem_prune_frac,) if sem == "d4" else ()),
            input_fingerprint(args.embeddings),
        ))
    else:
        # no marker when off: checkpoints written before the knob
        # existed stay valid
        h_sem = h_neardup
    h_span = "|".join(str(x) for x in (
        h_sem, "span", args.do_span, args.span_ngram,
    ))
    h_shuffle = "|".join(str(x) for x in (h_span, "shuffle", args.seed))
    fp = input_fingerprint(args.corpus)
    out = args.out
    os.makedirs(out, exist_ok=True)
    report: dict = {
        "config_hash": h_shuffle,
        # keys a consumer can rely on regardless of resume/skip paths
        "drop_reasons": {},
        "neardup_clustered": None,
        "neardup_removed": 0,
        "semantic_judged": None,
        "semantic_removed": 0,
        "span_words_removed": 0,
        "span_docs_dropped": 0,
    }

    def sidecar(stage: str, chash: str, compute):
        """Stage-stats persistence keyed like the checkpoint itself: a
        resumed run reads the value instead of re-scanning the corpus; a
        stale key (config/input changed) recomputes."""
        path = os.path.join(out, stage, "_stats.json")
        key = {"config_hash": chash, "input_fingerprint": fp}
        if os.path.exists(path):
            with open(path) as f:
                c = json.load(f)
            if c.get("key") == key:
                return c["value"], True
        v = compute()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"key": key, "value": v}, f)
        return v, False

    if fmt == "parquet":
        # prune at the read: only key-bearing columns + text leave storage
        import pyarrow.dataset as pads

        names = pads.dataset(args.corpus).schema.names
        want = [c for c in ("doc_key", "doc_id", "id", "url", "warc_ts",
                            "text") if c in names]
        raw = rd.read_parquet(args.corpus, columns=want)
        # metadata-fast count on the untransformed read (ensure_doc_key
        # would force a full corpus pass just to count inputs)
        report["input_docs"] = raw.count()
    else:
        from deduplicator_ray.sources import get_source

        raw = get_source(fmt)(args.corpus)
        names = raw.schema().names
        # no row-count metadata for non-parquet: defer the count to the
        # filter-stage manifest (it writes every input row annotated)
        # instead of paying a dedicated full parse pass
        report["input_docs"] = None
    if "text" not in names:
        raise ValueError(
            f"--corpus-format {fmt}: source yields no 'text' column "
            f"(schema: {names}); the clean pipeline needs extracted text — "
            "for warc/crawl_log corpora run dedup_pipeline's normalize "
            "stage first and feed its parquet output here"
        )
    base = ensure_doc_key(raw).select_columns(["doc_key", "text"])

    # -- stage 1: quality filter ---------------------------------------
    if args.do_filter:
        ck = StageCheckpoint(out, "filtered", config_hash=h_filter,
                             input_fingerprint=fp)

        from deduplicator_ray.stages.textstats import GOPHER_STOPWORDS

        stoplist = GOPHER_STOPWORDS | frozenset(
            w for w in args.extra_stopwords.split(",") if w
        )

        def build_filtered():
            flt = gopher_filter(base, id_col="doc_key",
                                min_words=args.min_words,
                                max_words=args.max_words,
                                min_stop=args.min_stop,
                                stopwords=stoplist,
                                output="annotate")
            return flt

        flt_ds, m, skipped = run_stage(ck, build_filtered, force=args.force)
        if report["input_docs"] is None:  # non-parquet: the annotated
            report["input_docs"] = m["total_rows"]  # checkpoint IS the count
        report["drop_reasons"], _ = sidecar(
            "filtered", h_filter, lambda: _reason_census(flt_ds)
        )

        def keep_only(b: pa.Table) -> pa.Table:
            kept = b.filter(b["keep"].combine_chunks())
            return kept.select(["doc_key", "text"])

        docs = flt_ds.map_batches(keep_only, batch_format="pyarrow",
                                  zero_copy_batch=True)
        # keep the survivor count cheap: census already counted the drops
        report["after_filter"] = report["input_docs"] - sum(
            report["drop_reasons"].values()
        )
    else:
        docs = base
        if report["input_docs"] is None:  # non-parquet, no filter stage to
            report["input_docs"] = base.count()  # piggyback on: pay one pass
        report["after_filter"] = report["input_docs"]

    # -- stage 2: near-dup keep-one --------------------------------------
    if args.do_neardup:
        ck = StageCheckpoint(out, "survivors", config_hash=h_neardup,
                             input_fingerprint=fp)
        nd_stats: dict = {}

        def build_survivors():
            _edges, asg = cluster_near_duplicates(docs, mh)
            import pandas as pd

            pdf = asg if isinstance(asg, pd.DataFrame) else asg.to_pandas()
            dup_ids = pdf.loc[
                pdf["doc_key"] != pdf["cluster_id"], "doc_key"
            ].to_numpy(np.int64)
            nd_stats["clustered"] = int(len(pdf))
            nd_stats["removed"] = int(len(dup_ids))
            return drop_ids(docs, dup_ids, max_broadcast=args.max_broadcast)

        docs, m, skipped = run_stage(ck, build_survivors, force=args.force)
        report["after_neardup"] = m["total_rows"]
        if nd_stats:  # fresh build: persist the stats beside the stage
            stats, _ = sidecar("survivors", h_neardup, lambda: nd_stats)
        else:  # resumed: read them back (or derive what is derivable)
            stats, from_cache = sidecar(
                "survivors", h_neardup,
                lambda: {"clustered": None,
                         "removed": report["after_filter"] - m["total_rows"]},
            )
        report["neardup_clustered"] = stats["clustered"]
        report["neardup_removed"] = stats["removed"]
    else:
        report["after_neardup"] = report["after_filter"]

    # -- stage 2.5 (optional): semantic (embedding-space) dedup ----------
    if sem != "off":
        ck = StageCheckpoint(out, "semantic", config_hash=h_sem,
                             input_fingerprint=fp)
        sem_stats: dict = {}

        def build_semantic():
            import ray

            from deduplicator_ray.stages.embed import d4_keep, semdedup_keep

            emb = rd.read_parquet(args.embeddings,
                                  columns=["vec_id", "embedding"])
            # semi-filter the vector table to the SURVIVING doc_keys, so
            # the funnel judges only docs still in the corpus (a removed
            # near-dup must not act as a cluster's kept representative):
            # broadcast the id set up to the cap, hash-join beyond it
            n_docs = report["after_neardup"]
            if n_docs <= args.max_broadcast:
                ids = np.sort(docs.select_columns(["doc_key"])
                              .to_pandas()["doc_key"].to_numpy(np.int64))
                ref = ray.put(ids)

                def semi(b: pa.Table) -> pa.Table:
                    from deduplicator_ray.util import isin_sorted

                    want = ray.get(ref)
                    v = b["vec_id"].to_numpy().astype(np.int64)
                    return b.filter(pa.array(isin_sorted(want, v)))

                emb = emb.map_batches(semi, batch_format="pyarrow",
                                      zero_copy_batch=True)
            else:
                # beyond-cap SEMI-join without Acero: pyarrow joins
                # reject list-typed non-key columns ("list<float> is not
                # supported in join non-key field"), so the vector rides
                # a hash-bucket co-partition as ordinary DATA and each
                # bucket keeps the rows whose vec_id appears on the
                # (id-only) key side — the same shuffle shape as
                # _drop_ids_shuffle with the polarity flipped.  This
                # path was latent until the r256 semantic drill forced
                # it (two stacked bugs: Ray's Schema wrapper has no
                # .field, and the old hash_join could never carry the
                # embedding column at all).
                from deduplicator_ray.stages.exact import hash_bucket

                def tag_sem(src: int):
                    def f(b: pa.Table) -> pa.Table:
                        return b.append_column(
                            "_src",
                            pa.array(np.full(b.num_rows, src, dtype=np.int8)))
                    return f

                keys = docs.select_columns(["doc_key"]).map_batches(
                    lambda b: pa.table({"vec_id": b["doc_key"]}),
                    batch_format="pyarrow", zero_copy_batch=True)
                both = emb.map_batches(
                    tag_sem(0), batch_format="pyarrow", zero_copy_batch=True
                ).union(keys.map_batches(
                    tag_sem(1), batch_format="pyarrow", zero_copy_batch=True))
                both = hash_bucket(both, "vec_id", 64)

                def semi_reduce(g: pa.Table) -> pa.Table:
                    from deduplicator_ray.util import isin_sorted

                    src = g["_src"].to_numpy(zero_copy_only=False)
                    ids = g["vec_id"].to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    want = np.unique(ids[src == 1])
                    hit = isin_sorted(want, ids)
                    out = g.filter(pa.array((src == 0) & hit))
                    return out.drop_columns(["_src", "_part"])

                emb = both.groupby("_part").map_groups(
                    semi_reduce, batch_format="pyarrow")

            if sem == "semdedup":
                judged = semdedup_keep(emb, k=args.sem_k,
                                       threshold=args.sem_threshold)
                flag, drop_when = "is_duplicate", True
            else:
                judged = d4_keep(emb, k=args.sem_k,
                                 threshold=args.sem_threshold,
                                 prune_frac=args.sem_prune_frac)
                flag, drop_when = "keep", False
            # filter to the dropped ids DISTRIBUTED — the full judged
            # table never lands on the driver; drop_ids collects the
            # (minority) drop list only when it fits max_broadcast and
            # hash-joins otherwise
            proj = judged.select_columns(["vec_id", flag]).materialize()
            sem_stats["judged"] = int(proj.count())

            def only_dropped(b: pa.Table) -> pa.Table:
                m = b[flag]
                if not drop_when:
                    import pyarrow.compute as pc
                    m = pc.invert(m)
                return b.filter(m).select(["vec_id"])

            dropped = proj.map_batches(only_dropped, batch_format="pyarrow",
                                       zero_copy_batch=True).materialize()
            sem_stats["removed"] = int(dropped.count())
            return drop_ids(docs, dropped,
                            max_broadcast=args.max_broadcast)

        docs, m, _ = run_stage(ck, build_semantic, force=args.force)
        report["after_semantic"] = m["total_rows"]
        if sem_stats:
            stats, _ = sidecar("semantic", h_sem, lambda: sem_stats)
        else:  # resumed
            stats, _ = sidecar(
                "semantic", h_sem,
                lambda: {"judged": None,
                         "removed": report["after_neardup"] - m["total_rows"]},
            )
        report["semantic_judged"] = stats["judged"]
        report["semantic_removed"] = stats["removed"]
    else:
        report["after_semantic"] = report["after_neardup"]

    # -- stage 3: duplicated-span removal --------------------------------
    if args.do_span:
        ck = StageCheckpoint(out, "spandedup", config_hash=h_span,
                             input_fingerprint=fp)

        def build_span():
            sd = span_dedup(docs, ngram=args.span_ngram,
                            max_broadcast=args.max_broadcast,
                            id_col="doc_key")

            def rename(b: pa.Table) -> pa.Table:
                t = pa.table({
                    "doc_key": b["doc_id"],
                    "text": b["text_dedup"],
                    "removed_words": b["removed_words"],
                })
                # a doc whose EVERY word sat in duplicated spans rebuilds
                # to "" — drop it from the training corpus (an untouched,
                # originally-empty doc has removed_words == 0 and stays)
                import pyarrow.compute as pc

                keep = pc.or_(pc.equal(t["removed_words"], 0),
                              pc.not_equal(t["text"], ""))
                return t.filter(keep)

            return sd.map_batches(rename, batch_format="pyarrow",
                                  zero_copy_batch=True)

        docs, m, _ = run_stage(ck, build_span, force=args.force)

        def span_stats():
            sums = docs.map_batches(
                lambda b: pa.table({"s": pa.array(
                    [b["removed_words"].to_numpy().sum()], type=pa.int64()
                )}),
                batch_format="pyarrow", zero_copy_batch=True,
            ).to_pandas()
            return {
                "words_removed": int(sums["s"].sum()) if "s" in sums.columns else 0,
                "docs_dropped": report["after_semantic"] - m["total_rows"],
            }

        stats, _ = sidecar("spandedup", h_span, span_stats)
        report["span_words_removed"] = stats["words_removed"]
        report["span_docs_dropped"] = stats["docs_dropped"]
        report["after_span"] = m["total_rows"]
        docs = docs.select_columns(["doc_key", "text"])
    else:
        report["after_span"] = report["after_semantic"]

    # -- stage 4: deterministic shuffle + final output --------------------
    ck = StageCheckpoint(out, "shuffled", config_hash=h_shuffle,
                         input_fingerprint=fp)

    def build_shuffled():
        import ray

        pos = deterministic_shuffle(docs, seed=args.seed, id_col="doc_key")
        pos = pos.map_batches(
            lambda b: pa.table({"doc_key": b["doc_id"],
                                "position": b["position"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # the position table is 16 B/doc — broadcast-attach up to the cap
        # (one corpus pass, no join); beyond it, co-partition join fallback
        if report["after_span"] == 0:
            # an all-filtered corpus must still produce a (typed, empty)
            # output — to_pandas() on an empty stream drops the schema
            import ray.data as rd

            return rd.from_arrow(pa.table({
                "doc_key": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "position": pa.array([], pa.int64()),
            }))
        pos_pdf = None
        if report["after_span"] <= args.max_broadcast:
            pos_pdf = pos.to_pandas().sort_values("doc_key")
        if pos_pdf is not None:
            ids_ref = ray.put(pos_pdf["doc_key"].to_numpy(np.int64))
            pos_ref = ray.put(pos_pdf["position"].to_numpy(np.int64))

            def attach(b: pa.Table) -> pa.Table:
                k = b["doc_key"].to_numpy().astype(np.int64)
                ids, p = ray.get(ids_ref), ray.get(pos_ref)
                idx = np.searchsorted(ids, k)
                return pa.table({
                    "doc_key": pa.array(k),
                    "text": b["text"],
                    "position": pa.array(p[idx]),
                })

            return docs.map_batches(attach, batch_format="pyarrow",
                                    zero_copy_batch=True)

        from deduplicator_ray.stages.joins import hash_join
        from deduplicator_ray.util import auto_partitions

        return hash_join(
            docs, pos, on=("doc_key",), num_partitions=auto_partitions(),
            out_schema={"doc_key": pa.int64(), "text": pa.string(),
                        "position": pa.int64()},
        )

    final_ds, m, _ = run_stage(ck, build_shuffled, force=args.force)
    report["output_docs"] = m["total_rows"]
    report["output_dir"] = os.path.join(out, "shuffled", "data")

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
