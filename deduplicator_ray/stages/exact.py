"""Exact dedup: the reference's four lookup strategies (J1-J4), the index
build upsert (A4), and the statistics report (A1/A2) — SURVEY.md §2.4-2.5.

The reference's Lucene left-lookup-join (LuceneIndexSearcher.java:214-310)
becomes, in Ray Data, either:

- **shuffle mode** (default, both sides large): tag history and current
  rows, union them, hash-bucket on ``digest`` (every strategy key starts
  with it), and run ONE vectorized reduce per bucket — sort +
  drop_duplicates builds the per-key best-history tables, pandas merges
  elect the match for every current row.  Never per-key Python: the
  bucket count is fixed (``cfg.shuffle_buckets``), so reduce overhead is
  O(buckets), not O(distinct digests).  This is the architecture the
  north_rule prescribes ("digest-match and url+digest-match strategies
  as groupby-aggregate shuffles").

- **broadcast mode** (history ≪ current): pre-reduce history to its
  per-key best rows, ``ray.put`` that table once, and resolve matches
  inside ``map_batches`` on the current stream with pandas merges — no
  shuffle of the big side at all.  Mirrors the reference's shape (small
  shared index, streamed crawl), and doubles as the skew-proof path for
  hub digests: the big current side is never grouped.

Match preference for DIGEST_URL_PREFERRED is made total and deterministic
(exact url > canonical url > any, then earliest date, then lexicographic
url, then record id) — the reference only best-efforts this via Lucene
SHOULD scoring (SearchStrategy.java:17-22).  Tier classification is
post-hoc from the chosen match, independent of strategy, exactly like
DeDuplicator.java:194-205.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.config import PipelineConfig, SearchStrategy
from deduplicator_ray.schema import (
    MATCH_TIER_CANONICAL,
    MATCH_TIER_DIGEST,
    MATCH_TIER_EXACT_URL,
    MATCH_TIER_NONE,
)

# Columns both sides are conformed to before the union/groupby.
_UNION_COLS = [
    "digest",
    "url",
    "url_canonical",
    "ts",
    "record_id",
    "content_bytes",
    "src",  # 0 = history, 1 = current
]


def strategy_key(strategy: SearchStrategy) -> list[str]:
    """Shuffle key per strategy (J1-J4)."""
    if strategy == SearchStrategy.URL_EXACT:
        return ["digest", "url"]
    if strategy == SearchStrategy.URL_CANONICAL:
        return ["digest", "url_canonical"]
    return ["digest"]  # DIGEST_URL_PREFERRED / DIGEST_ANY


def verify_strategy(history_schema: pa.Schema, cfg: PipelineConfig) -> None:
    """Schema assertion mirroring LuceneIndexSearcher.verifyStrategy
    (:158-170) + inspectIndex (:131-151): DIGEST must exist; URL_* need
    their column indexed."""
    names = set(history_schema.names)
    if "digest" not in names:
        raise ValueError("history index has no 'digest' column (DIGEST must always be indexed)")
    need = {
        SearchStrategy.URL_EXACT: "url",
        SearchStrategy.URL_CANONICAL: "url_canonical",
    }.get(cfg.strategy)
    if need and need not in names:
        raise ValueError(f"strategy {cfg.strategy.value} needs history column '{need}'")


def _conform(ds, *, src: int, id_cols: tuple[str, ...], ts_col: str,
             strip_digest_scheme: bool = False, rid_col: str | None = None,
             remap_revisits: bool = False):
    """Project either side to the union schema; id passthrough columns are
    nulled on the history side.  ``strip_digest_scheme`` applies the
    last-colon strip (M6) on the match key, mirroring the searcher's
    digest-vs-digestWithScheme choice (LuceneIndexSearcher.java:217-220)
    — without it, an index built with 'sha1:' prefixes silently never
    matches a current crawl without them.

    ``remap_revisits`` applies the M7 revisit remap (IndexBuilder.java:
    174-178) on a RAW history side before projection: unresolved revisits
    are dropped, resolved ones take their original's url + timestamp —
    exactly what ``build_index.pre_reduce`` does, so the fused
    single-shuffle matcher equals the two-stage build_index -> match
    pipeline on revisit-bearing (WARC / crawl.log) corpora too."""

    def f(batch: pa.Table) -> pa.Table:
        return _conform_table(batch, src=src, id_cols=id_cols, ts_col=ts_col,
                              strip_digest_scheme=strip_digest_scheme,
                              rid_col=rid_col, remap_revisits=remap_revisits)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _conform_table(batch: pa.Table, *, src: int, id_cols: tuple[str, ...],
                   ts_col: str, strip_digest_scheme: bool = False,
                   rid_col: str | None = None,
                   remap_revisits: bool = False) -> pa.Table:
    """Table-level conform kernel shared by ``_conform`` (one side per
    dataset) and ``conform_tagged`` (both sides in one pass)."""
    names = set(batch.column_names)
    if remap_revisits and "is_revisit" in names:
        rev = pc.fill_null(pc.cast(batch["is_revisit"], pa.bool_()), False)
        if {"original_url", "original_ts"} <= names:
            resolved = pc.and_(
                pc.is_valid(batch["original_url"]), pc.is_valid(batch["original_ts"])
            )
        else:
            resolved = pa.array(np.zeros(batch.num_rows, dtype=bool))
        batch = batch.filter(pc.or_(pc.invert(rev), resolved))
        if batch.num_rows and {"original_url", "original_ts"} <= names:
            rev = pc.fill_null(pc.cast(batch["is_revisit"], pa.bool_()), False)
            batch = batch.set_column(
                batch.column_names.index("url"), "url",
                pc.if_else(rev, batch["original_url"], batch["url"]),
            )
            if ts_col in names:
                batch = batch.set_column(
                    batch.column_names.index(ts_col), ts_col,
                    pc.if_else(
                        rev,
                        batch["original_ts"].cast(batch[ts_col].type),
                        batch[ts_col],
                    ),
                )
    n = batch.num_rows
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    if strip_digest_scheme:
        from deduplicator_ray.functions.digesting import strip_scheme_arrow

        cols["digest"] = strip_scheme_arrow(batch["digest"])
    else:
        cols["digest"] = batch["digest"]
    cols["url"] = batch["url"] if "url" in names else pa.nulls(n, pa.string())
    cols["url_canonical"] = (
        batch["url_canonical"] if "url_canonical" in names else pa.nulls(n, pa.string())
    )
    cols["ts"] = batch[ts_col].cast(pa.timestamp("us")) if ts_col in names else pa.nulls(n, pa.timestamp("us"))
    rid = rid_col or ("original_record_id" if src == 0 else "record_id")
    cols["record_id"] = batch[rid] if rid in names else pa.nulls(n, pa.string())
    cols["content_bytes"] = (
        batch["content_bytes"].cast(pa.int64()) if "content_bytes" in names else pa.nulls(n, pa.int64())
    )
    cols["src"] = pa.array(np.full(n, src, dtype=np.int8))
    for c in id_cols:
        cols[c] = batch[c] if src == 1 and c in names else pa.nulls(n, pa.int64())
    return pa.table(cols)


def conform_tagged(ds, *, history_col: str, history_value,
                   id_cols: tuple[str, ...] = (), ts_col: str = "warc_ts",
                   strip_digest_scheme: bool = False,
                   remap_revisits: bool = False):
    """Single-pass conform for a corpus whose rows carry their own side
    tag (e.g. a ``crawl`` column with 'history'/'current'): each batch is
    split by the tag and both halves are conformed in ONE scan.  The
    two-dataset path (``_conform`` x2 + union) reads and filters the
    source twice; on a pre-written corpus this halves the read work
    feeding the match shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        # null tags are NOT history (fill_null, or Arrow's filter would
        # drop null-masked rows from BOTH halves and the record would
        # silently vanish from the match output)
        mask = pc.fill_null(pc.equal(batch[history_col], history_value), False)
        hist = _conform_table(
            batch.filter(mask), src=0, id_cols=id_cols, ts_col=ts_col,
            strip_digest_scheme=strip_digest_scheme, rid_col="record_id",
            remap_revisits=remap_revisits,
        )
        cur = _conform_table(
            batch.filter(pc.invert(mask)), src=1, id_cols=id_cols,
            ts_col=ts_col, strip_digest_scheme=strip_digest_scheme,
        )
        return pa.concat_tables([hist, cur], promote_options="default")

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def match_shuffle_tagged(tagged, cfg: PipelineConfig | None = None, *,
                         history_col: str = "crawl", history_value="history",
                         id_cols: tuple[str, ...] = ()):
    """Fused matcher over a SELF-TAGGED corpus: one read, one conform
    pass, one digest shuffle.  Semantically identical to
    ``match_shuffle(current, history, history_is_raw=True)`` where the
    sides are ``tagged`` filtered by ``history_col`` (pytest-pinned);
    use it when both crawls live in one table — the separate-dataset
    path scans the source once per side."""
    cfg = cfg or PipelineConfig()
    verify_strategy(tagged.schema(), cfg)
    strip = not cfg.use_digest_scheme
    both = conform_tagged(
        tagged, history_col=history_col, history_value=history_value,
        id_cols=id_cols, strip_digest_scheme=strip,
        remap_revisits=True,
    )
    hot = _match_hot_keys(tagged, cfg, strip,
                          skip_col=history_col, skip_value=history_value)
    both = hash_bucket_salted(both, "digest", cfg.shuffle_buckets,
                              hot, cfg.salt_buckets)
    both = _pack_digests(both)
    return _unpack_digests(both.groupby("_part").map_groups(
        lambda g: _resolve_partition(g, cfg, True), batch_format="pandas"
    ))


def find_hot_keys(ds, col: str, *, num_buckets: int, min_count: int = 5_000,
                  strip_digest_scheme: bool = False,
                  skip_col: str | None = None, skip_value=None,
                  sample_rows: int = 1_000_000) -> frozenset:
    """Approximate hub-key detection: per-block value_counts partials
    (top 64 per block) combined on the driver.  A key is hot when its
    sampled count reaches BOTH ``min_count`` (small-corpus floor) and a
    bucket's average share of the sampled rows (count * num_buckets >=
    sampled rows) — i.e. the key alone would fill a whole reduce bucket.
    Approximation is safe — salting is a performance measure, never a
    correctness one.

    ``sample_rows`` bounds the scan to a prefix of that many rows,
    making detection O(1) in corpus size (a hub key is by definition a
    large fraction of rows, so a million-row prefix sees it).  Caveat: a
    hub concentrated entirely OUTSIDE the prefix (input sorted by the
    key) is missed — that only costs speed, never correctness; pass 0
    for a full scan.

    ``skip_col``/``skip_value`` drop rows (e.g. the history side of a
    tagged corpus) before counting: salting targets CURRENT-side hubs —
    replicating a history-hot key would grow the shuffle instead of
    splitting a straggler."""
    cols = [col] + ([skip_col] if skip_col else [])
    # project BEFORE limit: the projection then pushes down into the
    # parquet read, so the bounded sample never pulls payload columns
    # (measured 1.6x on an 8-column corpus with a wide content column)
    ds = ds.select_columns(cols)
    if sample_rows:
        ds = ds.limit(sample_rows)

    def partial(b: pa.Table) -> pa.Table:
        rows = b.num_rows
        if skip_col is not None:
            b = b.filter(pc.invert(pc.equal(b[skip_col], skip_value)))
        s = b[col].to_pandas()
        if strip_digest_scheme:
            from deduplicator_ray.functions.digesting import strip_scheme_series

            s = strip_scheme_series(s)
        vc = s.value_counts()
        vc = vc[vc >= 8].head(64)  # below this a key cannot plausibly be hot
        # one dedicated null-key counter row per block carries the block's
        # sampled-row count exactly (keys never sum into it and blocks
        # with equal sizes never collapse)
        return pa.table({
            "k": pa.array(list(vc.index.astype(str)) + [None], type=pa.string()),
            "n": pa.array(list(vc.to_numpy().astype("int64")) + [0], type=pa.int64()),
            "rows": pa.array([0] * len(vc) + [rows], type=pa.int64()),
        })

    t = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if t.empty:
        return frozenset()
    n_s = int(t["rows"].sum())
    agg = t.dropna(subset=["k"]).groupby("k")["n"].sum()
    bar = max(min_count, n_s // max(1, num_buckets))
    return frozenset(agg[agg >= bar].index)


def hash_bucket_salted(ds, col: str, num_buckets: int, hot_keys: frozenset,
                       salt: int, *, part_col: str = "_part",
                       coalesce_rows: int | None = 65536):
    """Hash-bucket with hub-key salting over a CONFORMED union stream
    (``src`` column present: 0 = history, 1 = current).

    Non-hot keys bucket as ``hash_bucket`` does.  For a hot key with base
    bucket b: current rows scatter over buckets (b+j) % P for a
    deterministic within-block j in [0, salt); history rows are
    REPLICATED into all ``salt`` buckets.  Every salted bucket therefore
    holds the full history for the key, so each current row resolves
    exactly as in the unsalted shuffle and appears exactly once in the
    output — the straggler reduce simply becomes ``salt`` parallel ones.

    Cost model at scale: the extra shuffle volume is salt x (history rows
    of hot keys) — hub keys are almost always payload-light duplicates
    (empty docs, error pages) whose per-key history collapses to a few
    best rows, so replication is cheap relative to splitting a
    multi-hundred-thousand-row reduce."""
    if not hot_keys:
        return hash_bucket(ds, col, num_buckets, part_col=part_col,
                           coalesce_rows=coalesce_rows)
    S = max(1, min(salt, num_buckets))

    def f(b: pa.Table) -> pa.Table:
        s = b[col].to_pandas()
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        part = (h % np.uint64(num_buckets)).astype(np.int64)
        hot = s.isin(hot_keys).to_numpy()
        if not hot.any():
            return b.append_column(part_col, pa.array(part.astype(np.int32)))
        src = b["src"].to_pandas().to_numpy()
        cur_hot = hot & (src == 1)
        # deterministic within-block salt: row position mod S
        j = np.arange(len(s), dtype=np.int64) % S
        part[cur_hot] = (part[cur_hot] + j[cur_hot]) % num_buckets
        b = b.append_column(part_col, pa.array(part.astype(np.int32)))
        hist_hot = hot & (src == 0)
        if not hist_hot.any():
            return b
        out = [b]
        idx = np.flatnonzero(hist_hot)
        hist_tbl = b.take(pa.array(idx))
        base = part[idx]
        for jj in range(1, S):
            rep = hist_tbl.set_column(
                hist_tbl.column_names.index(part_col), part_col,
                pa.array(((base + jj) % num_buckets).astype(np.int32)),
            )
            out.append(rep)
        return pa.concat_tables(out, promote_options="default")

    return _arrow_blocks(ds, coalesce_rows).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=coalesce_rows
    )


def _pack_digests(ds):
    """Shuffle-byte cut: pack the 32-hex digest column to tagged 17-byte
    binary (functions/digesting.py) just before the all-to-all — the map
    fuses into the bucketing task, so the sort moves 21 instead of 36
    bytes per digest.  Value-level injective, so bucket membership and
    within-bucket equality are untouched; the reduce resolves on the
    packed bytes (pandas merges/drop_duplicates hash bytes exactly like
    strings) and ``_unpack_digests`` restores the original strings in a
    buffer-level Arrow map fused onto the reduce output.

    ``GRAFT_DIGEST_PACK=0`` (read driver-side at plan time) skips the
    pack — the A/B knob for measuring the byte cut where transfer
    actually costs (a multi-raylet shuffle); ``_unpack_digests`` is
    type-driven, so the unpack stage degrades to a per-batch no-op."""
    import os

    if os.environ.get("GRAFT_DIGEST_PACK", "1") == "0":
        return ds

    def f(b: pa.Table) -> pa.Table:
        from deduplicator_ray.functions.digesting import pack_digest_array

        i = b.column_names.index("digest")
        return b.set_column(i, "digest", pack_digest_array(b["digest"]))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _unpack_digests(ds):
    """Inverse of ``_pack_digests`` on the match output (no-op when the
    column is already strings)."""

    def f(b: pa.Table) -> pa.Table:
        from deduplicator_ray.functions.digesting import unpack_digest_array

        i = b.column_names.index("digest")
        return b.set_column(i, "digest", unpack_digest_array(b["digest"]))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _upsert_sort(df: pd.DataFrame) -> tuple[list[str], list[bool]]:
    """Keep-latest election order: newest first (warc_ts desc), then url,
    then record_id ascending — fully deterministic under (ts, url) ties
    regardless of block arrival order.  Only columns actually present
    participate (a documents-style corpus has no url or warc_ts at all);
    returns (keys, ascending) so the flags stay aligned with the keys."""
    spec = [("warc_ts", False), ("url", True), ("record_id", True)]
    present = [(k, asc) for k, asc in spec if k in df.columns]
    return [k for k, _ in present], [asc for _, asc in present]


def _pick_best(hist: pd.DataFrame) -> pd.DataFrame:
    """Sort history deterministically: earliest date, then url, record id."""
    return hist.sort_values(["ts", "url", "record_id"], na_position="last", kind="mergesort")


def hash_bucket(ds, col: str, num_buckets: int, *, part_col: str = "_part",
                coalesce_rows: int | None = 65536):
    """Append a deterministic hash-bucket column for ``col``.

    This is the engine's explicit partitioning primitive: a groupby on
    ``part_col`` shuffles into exactly ``num_buckets`` groups, and the
    reduce runs ONCE per bucket as a vectorized pandas call — never once
    per key (per-key Python is the scalability cliff).  The hash is
    pandas' siphash with a fixed key, stable across processes/nodes.

    ``coalesce_rows`` bundles small upstream blocks into ~that many rows
    per task, so the sort-shuffle behind the downstream groupby sees FEW
    LARGE blocks.  Ray 2.49's sort creates O(blocks_in x partitions)
    intermediate objects; feeding it 128+ tiny blocks costs seconds of
    driver-side metadata handling regardless of data volume (measured
    2.8x on the exact-match phase).  Pass ``None`` to preserve upstream
    block boundaries."""

    def f(b: pa.Table) -> pa.Table:
        s = b[col].to_pandas()
        part = (pd.util.hash_pandas_object(s, index=False).to_numpy() % num_buckets).astype(
            np.int32
        )
        return b.append_column(part_col, pa.array(part))

    return _arrow_blocks(ds, coalesce_rows).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True, batch_size=coalesce_rows
    )


def _arrow_blocks(ds, coalesce_rows):
    """Normalize block TYPE to Arrow ahead of a coalescing map_batches.
    Ray 2.49's batcher asserts when a ``batch_size``-ed batch spans mixed
    pandas/Arrow blocks (delegating_block_builder.py) — e.g. a union of a
    pandas ``map_groups`` output with an Arrow read.  The per-block
    identity pass (no batch_size) converts each block individually and
    fuses with the downstream coalescing pass into one task, so it costs
    no extra scheduling round and is zero-copy for already-Arrow blocks."""
    if coalesce_rows is None:
        return ds
    return ds.map_batches(lambda b: b, batch_format="pyarrow", zero_copy_batch=True)


def _best_tables(hist_sorted: pd.DataFrame):
    """History (already ``_pick_best``-sorted) -> the three renamed
    lookup tables ``resolve_with_best_tables`` consumes: per-digest,
    per-(digest,url), per-(digest,url_canonical) best rows."""
    d = hist_sorted.drop_duplicates("digest")[["digest", "url", "ts", "record_id"]].rename(
        columns={"url": "url_m", "ts": "ts_m", "record_id": "rid_m"}
    )
    u = hist_sorted.drop_duplicates(["digest", "url"])[
        ["digest", "url", "ts", "record_id"]
    ].rename(columns={"ts": "ts_e", "record_id": "rid_e"})
    c = hist_sorted.drop_duplicates(["digest", "url_canonical"])[
        ["digest", "url_canonical", "url", "ts", "record_id"]
    ].rename(columns={"url": "url_c", "ts": "ts_c", "record_id": "rid_c"})
    return d, u, c


def _resolve_partition(g: pd.DataFrame, cfg: PipelineConfig,
                       history_is_raw: bool = False) -> pd.DataFrame:
    """One hash bucket (many strategy-key groups) -> one output row per
    current row, fully vectorized (sort + drop_duplicates + merges)."""
    g = g.drop(columns=["_part"])
    cur = g[g["src"] == 1].reset_index(drop=True)
    if cur.empty:
        return _empty_out(g, cfg)
    hist = g[g["src"] == 0]
    if history_is_raw and not hist.empty:
        # fused keep-latest upsert (A4) inside the match bucket: every
        # history row of a digest lives in this bucket, so the index
        # build's distinct-on-(url,digest)-newest-wins reduces locally —
        # one shuffle for index build + match instead of two
        key = ["url", "digest"] if cfg.index_url else ["digest"]
        # record_id last: on an exact (ts, url) tie the election must not
        # depend on block arrival order (fused and two-stage paths, and
        # repeated runs, have to elect the same original)
        hist = hist.sort_values(
            ["ts", "url", "record_id"], ascending=[False, True, True], kind="mergesort"
        )
        hist = hist.drop_duplicates(key, keep="first")

    if cfg.within_batch:
        # intra-batch extension (§2.9): elect one original per key over
        # hist ∪ cur; every other current row is a duplicate of it.
        key = strategy_key(cfg.strategy)
        allr = pd.concat([hist, cur], ignore_index=True).sort_values(
            ["ts", "src", "url", "record_id"], na_position="last", kind="mergesort"
        )
        o = allr.drop_duplicates(key, keep="first")
        orig = pd.DataFrame({k: o[k].values for k in key})
        orig["o_ts"] = o["ts"].values
        orig["o_src"] = o["src"].values
        orig["o_url"] = o["url"].values
        orig["o_rid"] = o["record_id"].values
        m = cur.merge(orig, on=key, how="left")
        # record_id (the final sort tiebreak) is part of the equality, so
        # exactly the ELECTED row is the original — two current rows tying
        # on (ts, url) must not both claim originality
        is_orig = (
            (m["ts"].values == m["o_ts"].values)
            & (m["url"].values == m["o_url"].values)
            & (m["record_id"].values == m["o_rid"].values)
            & (m["o_src"].values == 1)
        )
        out = cur.copy()
        out["is_duplicate"] = ~is_orig
        out["refers_to_url"] = np.where(is_orig, None, m["o_url"].values)
        out["refers_to_date"] = pd.Series(
            np.where(is_orig, np.datetime64("NaT"), m["o_ts"].values), index=out.index
        )
        out["refers_to_record_id"] = np.where(is_orig, None, m["o_rid"].values)
        return _finish(out, cfg)

    # snapshot semantics: strategy predicates via the same vectorized
    # merge resolver the broadcast matcher uses, on bucket-local tables
    if hist.empty:
        out = cur.copy()
        out["is_duplicate"] = False
        out["refers_to_url"] = None
        out["refers_to_date"] = pd.NaT
        out["refers_to_record_id"] = None
        return _finish(out, cfg)
    d, u, c = _best_tables(_pick_best(hist))
    return resolve_with_best_tables(cur, d, u, c, cfg)


def _finish(out: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """Post-hoc tier classification (DeDuplicator.java:194-205)."""
    dup = out["is_duplicate"].to_numpy(dtype=bool)
    same_url = out["refers_to_url"].values == out["url"].values
    # canonical comparison needs the match's canonical form; recompute it
    # with the vectorized Arrow kernel chain (null-safe: non-duplicates
    # carry a null refers_to_url and compare unequal).  Duplicates refer
    # to FEW originals, so canonicalize only the distinct refer urls and
    # scatter — on a hub-digest bucket this cuts the regex chain from
    # O(rows) to O(distinct originals)
    from deduplicator_ray.functions.canonical import get_canonicalizer

    arrow_canon = get_canonicalizer(cfg.canonicalizer)[1]
    codes, uniques = pd.factorize(out["refers_to_url"], use_na_sentinel=True)
    if len(uniques) == 0:
        ref_canon = np.full(len(out), None, dtype=object)
    else:
        canon_u = arrow_canon(
            pa.array(uniques, type=pa.string())
        ).to_numpy(zero_copy_only=False)
        ref_canon = np.where(codes >= 0, canon_u[np.clip(codes, 0, None)], None)
    same_can = (ref_canon == out["url_canonical"].values) & cfg.include_canonical
    tier = np.where(
        ~dup,
        MATCH_TIER_NONE,
        np.where(same_url, MATCH_TIER_EXACT_URL, np.where(same_can, MATCH_TIER_CANONICAL, MATCH_TIER_DIGEST)),
    )
    out["match_tier"] = tier
    return out.drop(columns=["src"])


def _empty_out(g: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    out = g.iloc[0:0].copy()
    out["is_duplicate"] = pd.Series([], dtype=bool)
    out["refers_to_url"] = pd.Series([], dtype=object)
    out["refers_to_date"] = pd.Series([], dtype="datetime64[us]")
    out["refers_to_record_id"] = pd.Series([], dtype=object)
    out["match_tier"] = pd.Series([], dtype=object)
    return out.drop(columns=["src"])


def match_shuffle(current, history, cfg: PipelineConfig | None = None, *,
                  id_cols: tuple[str, ...] = (), history_is_raw: bool = False):
    """Shuffle-mode matcher: union(history, current) -> hash-bucket on
    digest -> one vectorized per-bucket reduce. One output row per
    current row.

    Partitioning: every strategy key starts with ``digest``, so bucketing
    on digest co-locates history and current for all four strategies; the
    shuffle moves ``cfg.shuffle_buckets`` int-keyed groups (cheap sort),
    and each bucket resolves ALL its keys with sort/drop_duplicates/merge
    — no per-key Python.  Hub digests only grow a bucket linearly; the
    broadcast matcher exists for adversarial skew.

    ``history_is_raw=True`` fuses the A4 keep-latest index build into the
    match reduce: ``history`` is the raw normalized history crawl (not a
    pre-built index), and each bucket first reduces it to the per-key
    newest rows — ONE shuffle does index build + match.  The M7 revisit
    remap runs inside ``_conform`` on the raw history side, so
    revisit-bearing (WARC / crawl.log) corpora take this path too and
    match the two-stage ``build_index`` -> match pipeline exactly
    (pytest-pinned in tests/test_exact.py).
    """
    cfg = cfg or PipelineConfig()
    verify_strategy(history.schema(), cfg)
    strip = not cfg.use_digest_scheme
    h = _conform(history, src=0, id_cols=id_cols,
                 ts_col="warc_ts" if history_is_raw else "date",
                 rid_col="record_id" if history_is_raw else None,
                 strip_digest_scheme=strip,
                 remap_revisits=history_is_raw)
    c = _conform(current, src=1, id_cols=id_cols, ts_col="warc_ts", strip_digest_scheme=strip)
    hot = _match_hot_keys(current, cfg, strip)
    both = hash_bucket_salted(h.union(c), "digest", cfg.shuffle_buckets,
                              hot, cfg.salt_buckets)
    both = _pack_digests(both)
    return _unpack_digests(both.groupby("_part").map_groups(
        lambda g: _resolve_partition(g, cfg, history_is_raw), batch_format="pandas"
    ))


def _match_hot_keys(current, cfg: PipelineConfig, strip: bool,
                    skip_col: str | None = None, skip_value=None) -> frozenset:
    """Hub-digest set for the match shuffle (empty when salting is off or
    the semantics forbid it: within_batch elects originals AMONG current
    rows of a key, so splitting them would change the election).

    ``cfg.hot_keys`` short-circuits detection with ingest-time table
    statistics: at warehouse scale hub keys are a property of the CORPUS
    (the empty document, boilerplate error pages), computed once when the
    corpus is written and reused by every job over it — the per-job
    sampling pass is the fallback for stats-less inputs.  Salting is
    purely a performance measure, so stale stats can only cost speed."""
    if cfg.within_batch or cfg.salt_buckets <= 1 or cfg.hot_key_min_count <= 0:
        # hot_key_min_count <= 0 is the explicit salting OFF switch and
        # must beat an auto-discovered stats sidecar
        return frozenset()
    if cfg.hot_keys is not None:
        return frozenset(cfg.hot_keys)
    return find_hot_keys(current, "digest", num_buckets=cfg.shuffle_buckets,
                         min_count=cfg.hot_key_min_count,
                         strip_digest_scheme=strip,
                         skip_col=skip_col, skip_value=skip_value,
                         sample_rows=cfg.hot_key_sample_rows)


def _history_best_tables(history, cfg: PipelineConfig, max_rows: int = 5_000_000):
    """Pre-reduce history to the minimal lookup tables (driver-side; the
    guard keeps this mode honest — beyond it, use match_shuffle)."""
    cols = [c for c in ["digest", "url", "url_canonical", "date", "original_record_id"] if c in history.schema().names]
    pdf = history.select_columns(cols).to_pandas()
    if len(pdf) > max_rows:
        raise ValueError(f"history too large to broadcast ({len(pdf)} rows > {max_rows}); use match_shuffle")
    pdf = pdf.rename(columns={"date": "ts", "original_record_id": "record_id"})
    if not cfg.use_digest_scheme:
        from deduplicator_ray.functions.digesting import strip_scheme_series

        pdf["digest"] = strip_scheme_series(pdf["digest"])
    for c in ["url", "url_canonical", "ts", "record_id"]:
        if c not in pdf.columns:
            pdf[c] = None
    pdf = _pick_best(pdf)
    by_digest = pdf.drop_duplicates("digest")
    by_url = pdf.drop_duplicates(["digest", "url"])
    by_can = pdf.drop_duplicates(["digest", "url_canonical"])
    return by_digest, by_url, by_can


class _BroadcastMatcher:
    """Actor-pool stage: holds the broadcast history lookup tables
    (fetched once per actor from the object store, mirroring the
    reference's once-per-JVM index open, LuceneIndexSearcher.java:109-129)."""

    def __init__(self, tables_ref, cfg: PipelineConfig):
        import ray

        by_digest, by_url, by_can = ray.get(tables_ref)
        # pre-rename once per actor so batch merges are collision-free
        self.d = by_digest.rename(
            columns={"url": "url_m", "ts": "ts_m", "record_id": "rid_m"}
        )[["digest", "url_m", "ts_m", "rid_m"]]
        self.u = by_url.rename(columns={"ts": "ts_e", "record_id": "rid_e"})[
            ["digest", "url", "ts_e", "rid_e"]
        ]
        self.c = by_can.rename(
            columns={"url": "url_c", "ts": "ts_c", "record_id": "rid_c"}
        )[["digest", "url_canonical", "url_c", "ts_c", "rid_c"]]
        self.cfg = cfg

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.cfg.use_digest_scheme:
            from deduplicator_ray.functions.digesting import strip_scheme_series

            batch = batch.assign(digest=strip_scheme_series(batch["digest"]))
        return resolve_with_best_tables(batch, self.d, self.u, self.c, self.cfg)


def resolve_with_best_tables(batch: pd.DataFrame, d: pd.DataFrame, u: pd.DataFrame,
                             c: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """Resolve matches for a current-batch against pre-renamed best-row
    lookup tables (d: digest -> url_m/ts_m/rid_m; u: (digest,url) ->
    ts_e/rid_e; c: (digest,url_canonical) -> url_c/ts_c/rid_c).  Shared
    by the broadcast matcher and the actor-index matcher."""
    from types import SimpleNamespace

    self = SimpleNamespace(d=d, u=u, c=c)  # keep the table aliases terse below
    out = batch.rename(columns={"warc_ts": "ts"})
    out["src"] = 1
    s = cfg.strategy
    if True:  # branch block kept at method indentation
        if s == SearchStrategy.URL_EXACT:
            m = out.merge(self.u, on=["digest", "url"], how="left")
            hit = m["ts_e"].notna()
            ref_url, ref_ts, ref_rid = m["url"], m["ts_e"], m["rid_e"]
        elif s == SearchStrategy.URL_CANONICAL:
            m = out.merge(self.c, on=["digest", "url_canonical"], how="left")
            hit = m["ts_c"].notna()
            ref_url, ref_ts, ref_rid = m["url_c"], m["ts_c"], m["rid_c"]
        else:
            m = out.merge(self.d, on="digest", how="left")
            hit = m["ts_m"].notna()
            ref_url, ref_ts, ref_rid = m["url_m"], m["ts_m"], m["rid_m"]
            if s == SearchStrategy.DIGEST_URL_PREFERRED:
                eu = out.merge(self.u, on=["digest", "url"], how="left")
                ec = out.merge(self.c, on=["digest", "url_canonical"], how="left")
                has_e = eu["ts_e"].notna().values
                has_c = ec["ts_c"].notna().values & cfg.include_canonical
                ref_url = pd.Series(
                    np.where(has_e, out["url"].values, np.where(has_c, ec["url_c"].values, ref_url.values)),
                    index=out.index,
                )
                ref_ts = pd.Series(
                    np.where(has_e, eu["ts_e"].values, np.where(has_c, ec["ts_c"].values, ref_ts.values)),
                    index=out.index,
                )
                ref_rid = pd.Series(
                    np.where(has_e, eu["rid_e"].values, np.where(has_c, ec["rid_c"].values, ref_rid.values)),
                    index=out.index,
                )
        out["is_duplicate"] = hit.values
        out["refers_to_url"] = pd.Series(np.where(hit.values, ref_url.values, None), index=out.index)
        out["refers_to_date"] = pd.Series(np.where(hit.values, ref_ts.values, np.datetime64("NaT")), index=out.index)
        out["refers_to_record_id"] = pd.Series(np.where(hit.values, ref_rid.values, None), index=out.index)
        return _finish(out, cfg)


def match_broadcast(current, history, cfg: PipelineConfig | None = None, *,
                    concurrency: int | tuple[int, int] | None = None):
    """Broadcast-mode matcher: no shuffle of the current stream at all."""
    import ray

    from deduplicator_ray.util import auto_concurrency

    cfg = cfg or PipelineConfig()
    concurrency = concurrency or auto_concurrency()
    verify_strategy(history.schema(), cfg)
    tables_ref = ray.put(_history_best_tables(history, cfg))
    return current.map_batches(
        _BroadcastMatcher,
        fn_constructor_args=(tables_ref, cfg),
        batch_format="pandas",
        batch_size=cfg.batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# A4 — index build (keep-latest upsert -> INDEX_TABLE)
# ---------------------------------------------------------------------------


def build_index(ds, cfg: PipelineConfig | None = None):
    """Normalized corpus -> dedup index table (IndexBuilder.writeToIndex,
    IndexBuilder.java:124-241).

    Distinct on (url, digest) when ``index_url`` (the reference deletes
    then re-adds, keeping the newest — :227-236, manual.md:149-150), else
    distinct on digest alone.  Order-independence: "newest" is decided by
    (warc_ts desc, url) inside the group, not by input order (the
    reference leans on its sorted WARC file list, WarcIterator.java:59).

    Scale: a vectorized per-batch pre-reduce drops within-batch losers
    before the shuffle, so shuffle volume is bounded by per-batch distinct
    keys, not rows.
    """
    cfg = cfg or PipelineConfig()
    key = ["url", "digest"] if cfg.index_url else ["digest"]
    # only what the final projection reads may enter the shuffle — payload
    # columns (text/html) riding the index build would multiply shuffle
    # volume ~10x for nothing (SURVEY.md §7.4 rule)
    _PROJ_COLS = ["url", "url_canonical", "digest", "warc_ts", "etag", "record_id"]

    def pre_reduce(b: pd.DataFrame) -> pd.DataFrame:
        # M7 revisit remap when the columns exist; a corpus carrying
        # is_revisit WITHOUT resolved originals (no original_url/_ts
        # columns) treats every revisit as unresolved and drops it —
        # same rule as _conform_table and skip_counters
        if "is_revisit" in b.columns:
            rev = b["is_revisit"].fillna(False).astype(bool)
            if {"original_url", "original_ts"} <= set(b.columns):
                resolved = rev & b["original_url"].notna() & b["original_ts"].notna()
            else:
                resolved = pd.Series(False, index=b.index)
            b = b[~rev | resolved].copy()
            if {"original_url", "original_ts"} <= set(b.columns):
                rev = b["is_revisit"].fillna(False).astype(bool)
                b.loc[rev, "url"] = b.loc[rev, "original_url"]
                b.loc[rev, "warc_ts"] = b.loc[rev, "original_ts"]
        b = b[[c for c in _PROJ_COLS if c in b.columns]]
        keys, asc = _upsert_sort(b)
        if keys:
            b = b.sort_values(keys, ascending=asc, kind="mergesort")
        return b.drop_duplicates([c for c in key if c in b.columns] or ["digest"],
                                 keep="first")

    def final_reduce(g: pd.DataFrame) -> pd.DataFrame:
        # one call per hash bucket: winner per key via a single stable
        # sort + drop_duplicates over the whole bucket
        g = g.drop(columns=["_part"])
        keys, asc = _upsert_sort(g)
        if keys:
            g = g.sort_values(keys, ascending=asc, kind="mergesort")
        return g.drop_duplicates([c for c in key if c in g.columns] or ["digest"],
                                 keep="first")

    def project(b: pd.DataFrame) -> pa.Table:
        n = len(b)

        def col(name: str, present: bool):
            return pa.array(b[name] if present else [None] * n, type=pa.string())

        date = (
            pa.array(b["warc_ts"]).cast(pa.timestamp("us"))
            if "warc_ts" in b.columns
            else pa.nulls(n, pa.timestamp("us"))
        )
        return pa.table(
            {
                "url": col("url", "url" in b.columns),
                "url_canonical": col("url_canonical", "url_canonical" in b.columns),
                "digest": col("digest", True),
                "date": date,
                "etag": col("etag", "etag" in b.columns and cfg.include_etag),
                "original_record_id": col("record_id", "record_id" in b.columns),
            }
        )

    ds = ds.map_batches(pre_reduce, batch_format="pandas", batch_size=cfg.batch_size)
    ds = hash_bucket(ds, "digest", cfg.shuffle_buckets)
    ds = ds.groupby("_part").map_groups(final_reduce, batch_format="pandas")
    return ds.map_batches(project, batch_format="pandas", batch_size=cfg.batch_size)


def merge_index(existing, incoming, cfg: PipelineConfig | None = None, *,
                prefer: str = "newest"):
    """CREATE_OR_APPEND: merge a newly built index into an existing index
    table, re-applying the one-row-per-key upsert
    (IndexBuilder.java:96-100 open mode; :227-236 delete-then-add /
    updateDocument upsert).

    Both inputs are index TABLES (build_index output schema: url,
    url_canonical, digest, date, etag, original_record_id).  Key is
    (url, digest) when ``cfg.index_url`` else digest alone — the same
    rule as build_index.

    ``prefer``:
    - ``"newest"`` (default): order-independent keep-latest by
      (date desc, url, original_record_id, incoming-first on full tie).
      Makes append associative: merge(build(A), build(B)) ==
      build(A ∪ B) under the index projection — the property the
      driver's ``index_append`` oracle pins.
    - ``"incoming"``: Lucene ``updateDocument`` fidelity — an incoming
      row always replaces an existing row with the same key regardless
      of timestamps (last-write-wins), the reference's literal behavior
      when the indexer re-runs over an older crawl log.

    One payload-free shuffle on digest; the per-bucket reduce is a
    single vectorized sort + drop_duplicates, like build_index's.
    """
    if prefer not in ("newest", "incoming"):
        raise ValueError(f"prefer must be 'newest' or 'incoming', got {prefer!r}")
    cfg = cfg or PipelineConfig()
    key = ["url", "digest"] if cfg.index_url else ["digest"]

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_side", pa.array(np.full(b.num_rows, side, dtype=np.int8)))
        return f

    both = existing.map_batches(tag(0), batch_format="pyarrow",
                                zero_copy_batch=True).union(
        incoming.map_batches(tag(1), batch_format="pyarrow",
                             zero_copy_batch=True))
    both = hash_bucket(both, "digest", cfg.shuffle_buckets)

    spec = ([("date", False), ("url", True), ("original_record_id", True),
             ("_side", False)] if prefer == "newest"
            else [("_side", False), ("date", False), ("url", True),
                  ("original_record_id", True)])

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        present = [(k, asc) for k, asc in spec if k in g.columns]
        g = g.sort_values([k for k, _ in present],
                          ascending=[asc for _, asc in present],
                          na_position="last", kind="mergesort")
        g = g.drop_duplicates([c for c in key if c in g.columns] or ["digest"],
                              keep="first")
        return g.drop(columns=["_side"])

    return both.groupby("_part").map_groups(reduce, batch_format="pandas")


# ---------------------------------------------------------------------------
# A1/A2 — report aggregates
# ---------------------------------------------------------------------------


def report_aggregates(matches) -> dict:
    """Matches Dataset -> the reference's report counters
    (DeDuplicator.report, :207-247): handled, duplicates, byte totals, and
    per-tier hits/bytes. Partial+final aggregation is Ray-native; only the
    tiny per-tier table reaches the driver."""
    def partial(b: pa.Table) -> pa.Table:
        # per-block combiner: <= #tiers rows leave each block, so the
        # "shuffle" is a driver-side concat of tiny partials
        df = pd.DataFrame(
            {
                "match_tier": b["match_tier"].to_pandas(),
                "content_bytes": b["content_bytes"].to_pandas(),
            }
        )
        g = (
            df.groupby("match_tier", observed=True)["content_bytes"]
            # hits counts ROWS (size), not non-null values: the reference's
            # 'Total handled' counter counts every record regardless of
            # whether a content size is known (DeDuplicator.java:148-155)
            .agg(hits="size", bytes=lambda s: s.fillna(0).sum())
            .reset_index()
        )
        return pa.table(
            {
                "match_tier": pa.array(g["match_tier"], pa.string()),
                "hits": pa.array(g["hits"].astype("int64")),
                "bytes": pa.array(g["bytes"].astype("int64")),
            }
        )

    per_tier = (
        matches.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("match_tier", as_index=False)
        .agg(hits=("hits", "sum"), bytes=("bytes", "sum"))
    )
    if per_tier.empty:
        return {
            "handled": 0,
            "duplicates": 0,
            "total_bytes": 0,
            "duplicate_bytes": 0,
            "by_tier": {},
        }
    handled = int(per_tier["hits"].sum())
    total_bytes = int(per_tier["bytes"].fillna(0).sum())
    dup_mask = per_tier["match_tier"] != MATCH_TIER_NONE
    duplicates = int(per_tier.loc[dup_mask, "hits"].sum())
    dup_bytes = int(per_tier.loc[dup_mask, "bytes"].fillna(0).sum())
    tiers = {
        r["match_tier"]: {"hits": int(r["hits"]), "bytes": int(r["bytes"] or 0)}
        for _, r in per_tier.iterrows()
    }
    return {
        "handled": handled,
        "duplicates": duplicates,
        "total_bytes": total_bytes,
        "duplicate_bytes": dup_bytes,
        "by_tier": tiers,
    }


def render_report(agg: dict) -> str:
    """Text report with the reference's line items (DeDuplicator.java:207-247)."""
    from deduplicator_ray.functions.timestamps import format_bytes, get_percentage

    t = agg["by_tier"]
    lines = [
        "Processor: deduplicator_ray.stages.exact",
        f"  Function:          Abort processing of duplicate records",
        f"  Total handled:     {agg['handled']}",
        f"  Duplicates found:  {agg['duplicates']} {get_percentage(agg['duplicates'], agg['handled'])}",
        f"  Bytes total:       {agg['total_bytes']} ({format_bytes(agg['total_bytes'])})",
        f"  Bytes duplicate:   {agg['duplicate_bytes']} ({format_bytes(agg['duplicate_bytes'])})",
        "  Duplicates by tier:",
        f"    Exact URL:       {t.get(MATCH_TIER_EXACT_URL, {}).get('hits', 0)}",
        f"    Canonical URL:   {t.get(MATCH_TIER_CANONICAL, {}).get('hits', 0)}",
        f"    Digest only:     {t.get(MATCH_TIER_DIGEST, {}).get('hits', 0)}",
    ]
    # lookup-timing parity (DeDuplicator.java:235-239).  The reference's
    # number is single-threaded per-record lookup latency; the batch-engine
    # analog is match-stage wall time amortized per handled record (all
    # workers in parallel), which is the figure an operator actually
    # budgets with.  "Last" is the reference's most-recent-lookup probe —
    # reported only when a caller measured a per-batch figure to report.
    lk = agg.get("lookup") or {}
    if agg["handled"] > 0 and "avg_ms" in lk:
        lines.append(f"  Average lookup time: {lk['avg_ms']:.3f} ms")
        if "last_ms" in lk:
            lines.append(f"  Last lookup time:    {lk['last_ms']:.3f} ms")
    info = agg.get("index_info")
    if info:
        lines += ["", "Index:", render_index_info(info)]
    return "\n".join(lines)


def index_info(index, cfg: PipelineConfig, *, records: int | None = None) -> dict:
    """``Index.getInfo()`` parity (LuceneIndexSearcher.java:312-339): what
    the index holds and how it will be searched.  ``index`` is either the
    index Dataset/table or a ``ShardedDigestIndex`` (actor mode, which
    also surfaces bloom-filter stats); pass ``records`` to skip the
    count when the caller already knows it (e.g. a checkpoint manifest)."""
    info: dict = {
        "searcher": f"{__name__}.match",
        "url_indexed": bool(cfg.index_url),
        "digest_indexed": True,
        "canonical_available": bool(cfg.include_canonical),
        "search_strategy": cfg.strategy.value,
        "digest_includes_scheme": bool(cfg.use_digest_scheme),
    }
    shards = getattr(index, "shards", None)
    if shards is not None:  # ShardedDigestIndex
        stats = index.stats()
        info["records"] = sum(s["rows"] for s in stats)
        info["distinct_digests"] = sum(s["digests"] for s in stats)
        import ray as _ray

        bloom = _ray.get(index.bloom_ref)
        info["bloom_bits"] = int(bloom.m)
    elif records is not None:
        info["records"] = int(records)
    elif index is not None:
        info["records"] = int(
            index.count() if hasattr(index, "count") else index.num_rows
        )
    return info


def render_index_info(info: dict) -> str:
    """Text block mirroring LuceneIndexSearcher.getInfo()'s line items."""
    lines = [
        info.get("searcher", f"{__name__}.match"),
        f" URL indexed: {str(info['url_indexed']).lower()}",
        f" Digest indexed: {str(info['digest_indexed']).lower()}",
        f" Canonical URL available: {str(info['canonical_available']).lower()}",
        f" Search strategy: {info['search_strategy']}",
        f" Digest in index includes hashing algorithm: {str(info['digest_includes_scheme']).lower()}",
    ]
    if "records" in info:
        lines.append(f" Records in index: {info['records']}")
    if "distinct_digests" in info:
        lines.append(f" Distinct digests: {info['distinct_digests']}")
    if "bloom_bits" in info:
        lines.append(f" BloomFilter size: {info['bloom_bits']}")
    if "bloom_hits" in info:
        lines.append(f" BloomFilter hits: {info['bloom_hits']}")
    return "\n".join(lines)
