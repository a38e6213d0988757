"""Snapshot-delta operators over a captures corpus.

The reference compares one crawl against an index of earlier crawls one
record at a time (DeDuplicator.java's duplicate/novel decision).  These
operators are the corpus-level products an archive team derives from the
same data:

- ``crawl_delta``      — per page (canonical url, operator M5): what
  changed between the history snapshot and the current snapshot —
  ``new`` / ``gone`` / ``changed`` / ``unchanged``.
- ``content_provenance`` — per content digest seen on >= 2 hosts: which
  host published it first (the "origin") and how widely it spread —
  the corpus-level view of the reference's DIGEST_ANY cross-host match.
- ``host_dedup_savings`` — per host: captures vs distinct contents and
  the exact bytes an archive saves by storing each digest once — the
  per-host breakdown of the reference's duplicate-amount report lines
  (DeDuplicator.java:226-233).
- ``site_delta_census`` — the per-site rollup of ``crawl_delta``
  (new/gone/changed/unchanged counts; accepts a precomputed delta).

Scale notes (100 TB): every operator prunes to key columns in a map-only
pass, pre-reduces WITHIN each batch (so hub pages / hub digests / hub
hosts contribute at most one row per batch to the shuffle), then runs
ONE hash-bucket shuffle keyed on the entity (page url / digest / host).
Text never rides a shuffle; only digests, hosts and int64s move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.stages.exact import hash_bucket
from deduplicator_ray.stages.graph import HOST_PAT
from deduplicator_ray.util import auto_partitions


def _host_series(url: pa.ChunkedArray) -> pd.Series:
    m = pc.extract_regex(url, HOST_PAT)
    return pc.fill_null(pc.struct_field(m, "host"), "").to_pandas()


# ---------------------------------------------------------------------------
# crawl_delta
# ---------------------------------------------------------------------------


def crawl_delta(caps, *, url_col: str = "url_canonical",
                ts_col: str = "ts_epoch", digest_col: str = "digest",
                crawl_col: str = "crawl", history: str = "history",
                num_partitions: int | None = None):
    """-> Dataset (url_canonical, status, hist_digest, cur_digest,
    hist_epoch BIGINT, cur_epoch BIGINT).

    Each side of a page's timeline is reduced to its LATEST capture
    (ties on ts broken by digest descending — deterministic and
    engine-independent); the two latest captures are then compared:

    - ``new``       — page captured only in the current crawl;
    - ``gone``      — page captured only in the history crawl;
    - ``changed``   — both sides present, latest digests differ;
    - ``unchanged`` — both sides present, latest digests equal.

    Missing sides surface as ``''`` digest and ``-1`` epoch (not NULL) so
    the output stays non-nullable — archive reports diff these files.

    Within-batch partial: each batch keeps at most one row per
    (page, side), so a hub page re-captured millions of times adds one
    row per block to the shuffle, not millions.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "u": b[url_col].to_pandas(),
            "side": pc.equal(b[crawl_col], history).to_pandas(),
            "ts": b[ts_col].cast(pa.int64()).to_pandas(),
            "d": b[digest_col].to_pandas(),
        })
        # keep the (ts, digest)-max row per (page, side) — idempotent, so
        # the per-bucket reduce below re-applies the same rule globally
        df = df.sort_values(["u", "side", "ts", "d"], kind="mergesort")
        return df.drop_duplicates(["u", "side"], keep="last")

    pruned = caps.map_batches(partial, batch_format="pyarrow", batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "side", "ts", "d"], kind="mergesort")
        df = df.drop_duplicates(["u", "side"], keep="last")
        h = df[df["side"]].set_index("u")
        c = df[~df["side"]].set_index("u")
        m = h[["ts", "d"]].join(c[["ts", "d"]], how="outer",
                                lsuffix="_h", rsuffix="_c")
        hist_d = m["d_h"].fillna("")
        cur_d = m["d_c"].fillna("")
        status = np.where(
            m["d_h"].isna(), "new",
            np.where(m["d_c"].isna(), "gone",
                     np.where(hist_d == cur_d, "unchanged", "changed")))
        return pd.DataFrame({
            "url_canonical": m.index.to_numpy(),
            "status": status,
            "hist_digest": hist_d.to_numpy(),
            "cur_digest": cur_d.to_numpy(),
            "hist_epoch": m["ts_h"].fillna(-1).astype("int64").to_numpy(),
            "cur_epoch": m["ts_c"].fillna(-1).astype("int64").to_numpy(),
        })

    return (hash_bucket(pruned, "u", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# content_provenance
# ---------------------------------------------------------------------------


def content_provenance(caps, *, url_col: str = "url",
                       ts_col: str = "ts_epoch", digest_col: str = "digest",
                       min_hosts: int = 2,
                       num_partitions: int | None = None):
    """-> Dataset (digest, origin_host, origin_epoch BIGINT,
    n_hosts BIGINT, n_captures BIGINT) for digests on >= ``min_hosts``
    distinct hosts.

    The origin is the (ts, host)-minimal capture of the digest (ties on
    ts broken by host ascending).  Within-batch partial reduces to one
    row per (digest, host) carrying that pair's min ts and capture
    count, so the shuffle is bounded by distinct (digest, host) pairs
    per batch — a hub digest (e.g. the empty page) stays cheap.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "digest": b[digest_col].to_pandas(),
            "host": _host_series(b[url_col].combine_chunks()),
            "ts": b[ts_col].cast(pa.int64()).to_pandas(),
        })
        g = df.groupby(["digest", "host"], as_index=False, sort=False).agg(
            ts=("ts", "min"), n=("ts", "size"))
        g["n"] = g["n"].astype("int64")
        return g

    pruned = caps.map_batches(partial, batch_format="pyarrow", batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["digest", "host"], as_index=False, sort=False).agg(
            ts=("ts", "min"), n=("n", "sum"))
        g = g.sort_values(["digest", "ts", "host"], kind="mergesort")
        agg = g.groupby("digest", sort=False).agg(
            origin_host=("host", "first"), origin_epoch=("ts", "first"),
            n_hosts=("host", "size"), n_captures=("n", "sum"))
        agg = agg[agg["n_hosts"] >= min_hosts].reset_index()
        agg["origin_epoch"] = agg["origin_epoch"].astype("int64")
        agg["n_hosts"] = agg["n_hosts"].astype("int64")
        agg["n_captures"] = agg["n_captures"].astype("int64")
        return agg

    return (hash_bucket(pruned, "digest", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# host_dedup_savings
# ---------------------------------------------------------------------------


def host_dedup_savings(caps, *, url_col: str = "url",
                       digest_col: str = "digest", text_col: str = "text",
                       chars_col: str | None = None,
                       num_partitions: int | None = None):
    """-> Dataset (host, n_captures BIGINT, n_unique BIGINT,
    n_dup BIGINT, chars_total BIGINT, chars_stored BIGINT,
    chars_saved BIGINT).

    Per url host: captures vs distinct content digests, total content
    chars fetched vs chars an archive stores keeping one copy per
    digest (identical digest => identical text, so one length per
    digest).  This is the reference's "duplicate amount" report
    (DeDuplicator.java:226-233) broken down by host.

    Within-batch partial reduces to one row per (host, digest) with a
    count and the content length; text itself never leaves the map
    stage.  Pass ``chars_col`` naming a precomputed int length column
    (e.g. record-header content_bytes) to skip the text scan entirely.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        chars = (pc.cast(b[chars_col], pa.int64()) if chars_col
                 else pc.cast(pc.utf8_length(b[text_col]), pa.int64()))
        df = pd.DataFrame({
            "host": _host_series(b[url_col].combine_chunks()),
            "digest": b[digest_col].to_pandas(),
            "chars": chars.to_pandas(),
        })
        g = df.groupby(["host", "digest"], as_index=False, sort=False).agg(
            n=("chars", "size"), chars=("chars", "first"))
        g["n"] = g["n"].astype("int64")
        return g

    pruned = caps.map_batches(partial, batch_format="pyarrow", batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["host", "digest"], as_index=False, sort=False).agg(
            n=("n", "sum"), chars=("chars", "first"))
        g["tot"] = g["chars"] * g["n"]
        agg = g.groupby("host", sort=False).agg(
            n_captures=("n", "sum"), n_unique=("digest", "size"),
            chars_total=("tot", "sum"), chars_stored=("chars", "sum"),
        ).reset_index()
        agg["n_dup"] = agg["n_captures"] - agg["n_unique"]
        agg["chars_saved"] = agg["chars_total"] - agg["chars_stored"]
        cols = ["host", "n_captures", "n_unique", "n_dup",
                "chars_total", "chars_stored", "chars_saved"]
        return agg[cols].astype({c: "int64" for c in cols[1:]})

    return (hash_bucket(pruned, "host", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def site_delta_census(caps=None, *, delta=None,
                      num_partitions: int | None = None, **delta_kwargs):
    """Per-site rollup of ``crawl_delta`` -> Dataset (site,
    n_new BIGINT, n_gone BIGINT, n_changed BIGINT, n_unchanged BIGINT):
    how each site moved between the two snapshots.  Statuses x sites is
    tiny, so the rollup is per-batch partials + one driver-side merge
    (the host_stats shape); the heavy lifting is crawl_delta's one
    page-key shuffle.  Pass ``delta`` (a crawl_delta output Dataset,
    e.g. a loaded checkpoint) to roll up without recomputing the delta.
    """
    import pandas as pd

    if delta is None:
        delta = crawl_delta(caps, num_partitions=num_partitions,
                            **delta_kwargs)
    statuses = ["new", "gone", "changed", "unchanged"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["site"] = (df["url_canonical"].str.extract(r"^([^/]+)",
                                                      expand=False)
                      .fillna(""))
        g = (df.groupby(["site", "status"], as_index=False, sort=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    parts = delta.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"site": pd.Series([], dtype=object),
                             **{f"n_{s}": pd.Series([], dtype="int64")
                                for s in statuses}})
    pv = (parts.groupby(["site", "status"])["n"].sum().unstack(fill_value=0)
          .reindex(columns=statuses, fill_value=0))
    pv.columns = [f"n_{c}" for c in pv.columns]
    return pv.reset_index().astype({f"n_{s}": "int64" for s in statuses})
