"""Per-URL capture-timeline compression (web-archive storage dedup).

The reference's whole purpose is to skip storing a capture whose content
is unchanged since the previous visit (DeDuplicator.java decides
duplicate-vs-novel per fetch; the revisit records in sources/warc.py are
the stored form of that decision).  ``timeline_dedup`` expresses the
batch analog: given ALL captures of a corpus, keep exactly one capture
per run of consecutive identical digests on each page's timeline — the
set of versions an archive actually needs to store — and report how many
unchanged revisits each stored version absorbed.

Page identity is the CANONICAL url (operator M5), so session-id /
www-prefix aliases of one page share a timeline, exactly like the
reference's URL_CANONICAL strategy groups them at match time.

Distribution: a map-only column prune, then ONE hash-bucket shuffle on
the canonical url (a page's timeline is tiny — bounded by its capture
count — so buckets stay balanced even for hub pages), then a vectorized
run-length kernel per bucket.  Digest/url strings ride the shuffle once;
text never does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deduplicator_ray.stages.exact import hash_bucket
from deduplicator_ray.util import auto_partitions


def _prune_url_ts_digest(caps, url_col: str, ts_col: str, digest_col: str):
    """Shared column prune for the per-page timeline kernels: (url, ts
    cast int64, digest), map-only — the only columns any timeline
    shuffle ships."""
    def prune(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            url_col: b[url_col],
            ts_col: pc.cast(b[ts_col], pa.int64()),
            digest_col: b[digest_col],
        })

    return caps.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True)



def timeline_dedup(caps, *, url_col: str = "url_canonical",
                   ts_col: str = "ts_epoch", digest_col: str = "digest",
                   num_partitions: int | None = None):
    """-> Dataset (url_canonical, ts_epoch BIGINT, digest, n_skipped BIGINT).

    One output row per (page, content-version run): the FIRST capture of
    each run of consecutive identical digests in the page's ts order;
    ``n_skipped`` = unchanged revisits compressed into that row.  A page
    whose content flips A -> B -> A stores three versions (runs are
    consecutive, not global-distinct — matching archive semantics where
    reverting content is a new version).

    Ordering contract: ``ts_col`` ties within one page are broken by
    digest (deterministic, engine-independent).
    """
    P = num_partitions or auto_partitions()

    pruned = _prune_url_ts_digest(caps, url_col, ts_col, digest_col)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col, digest_col], kind="mergesort",
                            ignore_index=True)
        u = df[url_col].to_numpy()
        d = df[digest_col].to_numpy()
        change = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            change[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        runs = np.cumsum(change) - 1
        run_len = np.bincount(runs)
        kept = df.loc[change, [url_col, ts_col, digest_col]].copy()
        kept["n_skipped"] = (run_len - 1).astype("int64")
        return kept

    return (hash_bucket(pruned, url_col, P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def capture_gaps(caps, *, url_col: str = "url_canonical",
                 ts_col: str = "ts_epoch",
                 num_partitions: int | None = None):
    """Per-site inter-capture gap statistics -> Dataset
    (site, n_gaps BIGINT, min_gap BIGINT, p50_gap BIGINT, max_gap BIGINT).

    For every page (canonical url) the gaps between consecutive captures
    are the page's observed revisit intervals; aggregated per SITE (the
    canonical url's host part — scheme and www-prefix already stripped by
    M5) they are the input an archive uses to tune recrawl frequency
    against the duplicate rates the reference reports.

    ``p50_gap`` is the exact discrete median — element ceil(n/2)-1
    (0-based) of the site's sorted gaps — matching DuckDB
    ``quantile_disc(gap, 0.5)`` (same convention as freq.length_quantiles).
    Pages with a single capture contribute no gaps; a site with no gaps
    emits no row.

    Distribution: map-only prune to (site, url, ts int64), ONE
    hash-bucket shuffle on site (a site's pages must be co-located for
    the exact per-site quantile; bucket size is bounded by captures per
    site — for a pathological mega-host, pre-splitting by url and
    approximating the median is the documented scale escape hatch), then
    a fully vectorized diff + group-offset kernel per bucket.
    """
    P = num_partitions or auto_partitions()

    def prune(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = b[url_col].combine_chunks()
        m = pc.extract_regex(u, r"^(?P<h>[^/]+)")
        site = pc.fill_null(pc.struct_field(m, "h"), "")
        return pa.table({
            "site": site,
            "u": u,
            "ts": pc.cast(b[ts_col], pa.int64()),
        })

    pruned = caps.map_batches(prune, batch_format="pyarrow",
                              zero_copy_batch=True)

    _EMPTY = pd.DataFrame({
        "site": pd.Series([], dtype=object),
        "n_gaps": pd.Series([], dtype="int64"),
        "min_gap": pd.Series([], dtype="int64"),
        "p50_gap": pd.Series([], dtype="int64"),
        "max_gap": pd.Series([], dtype="int64"),
    })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY
        df = df.sort_values(["u", "ts"], kind="mergesort", ignore_index=True)
        u = df["u"].to_numpy()
        ts = df["ts"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gaps = np.zeros(len(df), dtype=np.int64)
        gaps[1:] = ts[1:] - ts[:-1]
        g = pd.DataFrame({"site": df["site"].to_numpy()[same],
                          "gap": gaps[same]})
        if g.empty:
            return _EMPTY
        g = g.sort_values(["site", "gap"], kind="mergesort",
                          ignore_index=True)
        sites, starts, counts = np.unique(
            g["site"].to_numpy(), return_index=True, return_counts=True)
        gv = g["gap"].to_numpy()
        # discrete median: element ceil(n/2)-1 of the sorted gaps
        p50 = gv[starts + (counts + 1) // 2 - 1]
        return pd.DataFrame({
            "site": sites,
            "n_gaps": counts.astype("int64"),
            "min_gap": gv[starts],
            "p50_gap": p50,
            "max_gap": gv[starts + counts - 1],
        })

    return (hash_bucket(pruned, "site", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def site_change_rate(caps, *, url_col: str = "url_canonical",
                     ts_col: str = "ts_epoch", digest_col: str = "digest",
                     num_partitions: int | None = None):
    """Which sites actually change -> Dataset (site, n_pages BIGINT,
    n_versions BIGINT, n_captures BIGINT, change_ppm BIGINT).

    Built on ``timeline_dedup``: a page's stored versions beyond its
    first are its CHANGED revisits; captures beyond the first are all
    revisits.  ``change_ppm`` = changed revisits per million revisits
    (floor), 0 for a site with no revisits — the signal an archive pairs
    with ``capture_gaps`` to tune per-site recrawl frequency.

    Distribution: timeline_dedup's one url-key shuffle, then a per-batch
    (site, url) partial and ONE site-key shuffle of 4-int rows.
    """
    P = num_partitions or auto_partitions()
    runs = timeline_dedup(caps, url_col=url_col, ts_col=ts_col,
                          digest_col=digest_col, num_partitions=P)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(url_col, as_index=False, sort=False).agg(
            v=("n_skipped", "size"), c=("n_skipped", "sum"))
        g["c"] = (g["c"] + g["v"]).astype("int64")
        g["v"] = g["v"].astype("int64")
        g["site"] = (g[url_col].str.extract(r"^([^/]+)", expand=False)
                     .fillna(""))
        return g

    parts = runs.map_batches(partial, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        per_url = df.groupby(["site", url_col], as_index=False,
                             sort=False).agg(v=("v", "sum"), c=("c", "sum"))
        agg = per_url.groupby("site", sort=False).agg(
            n_pages=(url_col, "size"), n_versions=("v", "sum"),
            n_captures=("c", "sum")).reset_index()
        revisits = agg["n_captures"] - agg["n_pages"]
        changed = agg["n_versions"] - agg["n_pages"]
        agg["change_ppm"] = np.where(
            revisits > 0, (changed * 1_000_000) // np.maximum(revisits, 1), 0)
        cols = ["site", "n_pages", "n_versions", "n_captures", "change_ppm"]
        return agg[cols].astype({c: "int64" for c in cols[1:]})

    return (hash_bucket(parts, "site", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def page_lifespans(caps, *, url_col: str = "url_canonical",
                   ts_col: str = "ts_epoch",
                   num_partitions: int | None = None):
    """Per-page liveness -> Dataset (url_canonical, first_epoch BIGINT,
    last_epoch BIGINT, n_captures BIGINT, lifespan_s BIGINT).

    The observation window an archive has for each page — the
    denominator for capture_gaps / site_change_rate rates.  Textbook
    mergeable aggregate: within-batch partial (min, max, count) per
    page, ONE page-key shuffle of 4-int rows, per-bucket re-merge.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        df = pd.DataFrame({
            "u": b[url_col].to_pandas(),
            "ts": pc.cast(b[ts_col], pa.int64()).to_pandas(),
        })
        g = df.groupby("u", as_index=False).agg(
            first=("ts", "min"), last=("ts", "max"), n=("ts", "size"))
        g["n"] = g["n"].astype("int64")
        return g

    pruned = caps.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", as_index=False).agg(
            first=("first", "min"), last=("last", "max"), n=("n", "sum"))
        out = pd.DataFrame({
            "url_canonical": g["u"],
            "first_epoch": g["first"].astype("int64"),
            "last_epoch": g["last"].astype("int64"),
            "n_captures": g["n"].astype("int64"),
        })
        out["lifespan_s"] = out["last_epoch"] - out["first_epoch"]
        return out

    return (hash_bucket(pruned, "u", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def capture_burst(caps, *, window: int = 60, url_col: str = "url_canonical",
                  ts_col: str = "ts_epoch",
                  num_partitions: int | None = None):
    """Per-site crawl-burst detection -> Dataset (site, n_captures
    BIGINT, max_burst BIGINT): the maximum number of captures of one
    site inside any ``window``-second interval [t, t+window) — the
    politeness-audit metric (did the crawler hammer a host?) dual to
    ``capture_gaps``'s revisit-interval view.

    Exact, not approximate: per site, captures sorted by ts, then the
    classic two-pointer count cnt[i] = #captures with ts in
    [ts_i, ts_i + window) evaluated vectorized as
    searchsorted(ts, ts + window, 'left') - arange; the max over i is
    the burst.  ONE site-key shuffle; the same mega-host escape hatch
    as capture_gaps applies.
    """
    P = num_partitions or auto_partitions()

    def prune(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = b[url_col].combine_chunks()
        m = pc.extract_regex(u, r"^(?P<h>[^/]+)")
        site = pc.fill_null(pc.struct_field(m, "h"), "")
        return pa.table({
            "site": site,
            "ts": pc.cast(b[ts_col], pa.int64()),
        })

    pruned = caps.map_batches(prune, batch_format="pyarrow",
                              zero_copy_batch=True)

    _EMPTY = pd.DataFrame({
        "site": pd.Series([], dtype=object),
        "n_captures": pd.Series([], dtype="int64"),
        "max_burst": pd.Series([], dtype="int64"),
    })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY
        df = df.sort_values(["site", "ts"], kind="mergesort",
                            ignore_index=True)
        ts = df["ts"].to_numpy(dtype=np.int64)
        sites, starts, counts = np.unique(
            df["site"].to_numpy(), return_index=True, return_counts=True)
        # one searchsorted across the whole bucket: ts is only sorted
        # WITHIN each site's slice, so shift each site onto its own
        # disjoint range (stride > bucket ts-span + window) — the
        # shifted array is globally sorted and no window can cross a
        # site boundary
        stride = (int(ts.max()) - int(ts.min())) + window + 1 if len(ts) else 1
        site_id = np.repeat(np.arange(len(sites), dtype=np.int64), counts)
        shifted = ts + site_id * np.int64(stride)
        upper = np.searchsorted(shifted, shifted + np.int64(window),
                                side="left")
        cnt = upper - np.arange(len(ts), dtype=np.int64)
        burst = np.maximum.reduceat(cnt, starts)
        return pd.DataFrame({
            "site": sites,
            "n_captures": counts.astype("int64"),
            "max_burst": burst.astype("int64"),
        })

    return (hash_bucket(pruned, "site", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def keep_n_versions(caps, n: int, *, url_col: str = "url_canonical",
                    ts_col: str = "ts_epoch", digest_col: str = "digest",
                    num_partitions: int | None = None):
    """Archive RETENTION policy: keep the N most recent captures per
    page -> Dataset (url_canonical, ts_epoch BIGINT, digest,
    version_rank BIGINT; rank 1 = newest).  The storage-budget
    counterpart of ``timeline_dedup`` (which keeps one capture per
    content run): heritage policies cap stored versions per URL
    regardless of content churn.

    Same distribution contract as timeline_dedup: column prune, ONE
    hash-bucket shuffle on the canonical url (per-page timelines are
    tiny, buckets stay balanced), vectorized rank kernel per bucket.
    Ordering contract: newest-first by ``ts_col``, ties broken by digest
    then stable order — deterministic and SQL-mirrorable
    (row_number() OVER (ORDER BY ts DESC, digest)).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    P = num_partitions or auto_partitions()

    pruned = _prune_url_ts_digest(caps, url_col, ts_col, digest_col)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col, digest_col],
                            ascending=[True, False, True],
                            kind="mergesort", ignore_index=True)
        u = df[url_col].to_numpy()
        starts = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            starts[1:] = u[1:] != u[:-1]
        start_idx = np.flatnonzero(starts)
        rank = np.arange(len(df), dtype=np.int64) - np.repeat(
            start_idx, np.diff(np.append(start_idx, len(df))))
        kept = df.loc[rank < n].copy()
        kept["version_rank"] = (rank[rank < n] + 1).astype("int64")
        return kept

    return (hash_bucket(pruned, url_col, P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


_REVISIT_MIN_S = 3600
_REVISIT_MAX_S = 2_592_000  # 30 days


def revisit_schedule(caps, *, url_col: str = "url_canonical",
                     ts_col: str = "ts_epoch", digest_col: str = "digest",
                     min_interval_s: int = _REVISIT_MIN_S,
                     max_interval_s: int = _REVISIT_MAX_S,
                     num_partitions: int | None = None):
    """Adaptive revisit scheduling (the batch analog of Heritrix's
    adaptive-revisit frontier, which widens/narrows a page's fetch
    interval as content proves stable/volatile): per page ->
    (url_canonical, n_captures, n_changes, span_s, suggested_interval_s)
    where n_changes counts digest transitions on the ts-ordered
    timeline and the suggestion is the observed mean change interval
    span_s // n_changes, clamped to [min, max]; a page never seen to
    change gets the max interval.  All-integer rules, identical in SQL.

    Same distribution contract as timeline_dedup: ONE url-keyed
    hash-bucket shuffle, vectorized per-bucket kernel; ties on ts break
    by digest (deterministic both engines)."""
    P = num_partitions or auto_partitions()

    pruned = _prune_url_ts_digest(caps, url_col, ts_col, digest_col)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col, digest_col], kind="mergesort",
                            ignore_index=True)
        u = df[url_col].to_numpy()
        t = df[ts_col].to_numpy(np.int64)
        d = df[digest_col].to_numpy()
        same_page = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same_page[1:] = u[1:] == u[:-1]
        change = same_page & (np.concatenate(([True], d[1:] != d[:-1])))
        starts = np.flatnonzero(~same_page)
        lens = np.diff(np.append(starts, len(df)))
        n_caps = lens.astype(np.int64)
        n_changes = np.add.reduceat(change.astype(np.int64), starts) \
            if len(df) else np.zeros(0, np.int64)
        span = t[starts + lens - 1] - t[starts]
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_iv = np.where(n_changes > 0,
                               span // np.maximum(n_changes, 1),
                               max_interval_s)
        suggested = np.clip(mean_iv, min_interval_s, max_interval_s)
        return pd.DataFrame({
            url_col: u[starts],
            "n_captures": n_caps,
            "n_changes": n_changes,
            "span_s": span.astype("int64"),
            "suggested_interval_s": suggested.astype("int64"),
        })

    return (hash_bucket(pruned, url_col, P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))
