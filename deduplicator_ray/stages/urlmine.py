"""URL structure mining over a captures corpus.

``query_param_stats`` surfaces, per site, every query-parameter key with
its use count and exact distinct-value count — the discovery tool behind
the M5 canonicalization rule list (functions/canonical.py): a parameter
whose distinct-value count tracks its use count one-to-one (phpsessid,
jsessionid, sid...) is a session id polluting page identity, exactly the
keys the reference's canonicalizer strips
(deduplicator-heritrix/.../Canonicalizer cite in canonical.py).

Scale shape: map-only Arrow extraction (regex + split kernels + one
list-offset flatten, no per-row Python), within-batch partial reduce to
distinct (site, key, value) rows with counts, ONE hash-bucket shuffle on
(site, key).  The RAW url is mined (canonicalization would strip the
very parameters this op exists to find).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.stages.exact import hash_bucket
from deduplicator_ray.stages.graph import HOST_PAT
from deduplicator_ray.util import auto_partitions


def query_param_stats(caps, *, url_col: str = "url",
                      num_partitions: int | None = None):
    """-> Dataset (site, param, n_uses BIGINT, n_values BIGINT).

    One output row per (url host, query-parameter key): ``n_uses`` =
    capture urls carrying the key, ``n_values`` = exact distinct values
    it took.  ``n_values == n_uses`` (at volume) flags a session id;
    ``n_values == 1`` flags a constant tracking tag.
    """
    P = num_partitions or auto_partitions()

    def extract(b: pa.Table) -> pd.DataFrame:
        u = b[url_col].combine_chunks().cast(pa.string())
        hm = pc.extract_regex(u, HOST_PAT)
        site = pc.fill_null(pc.struct_field(hm, "host"), "")
        qm = pc.extract_regex(u, r"\?(?P<q>.*)$")
        q = pc.struct_field(qm, "q")
        keep = pc.is_valid(q)
        site = site.filter(keep)
        frags = pc.split_pattern(q.filter(keep), "&")
        if isinstance(frags, pa.ChunkedArray):
            frags = frags.combine_chunks()
        # flatten: repeat each url's site over its fragment count
        off = frags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(frags)), np.diff(off))
        kv = frags.values
        km = pc.extract_regex(kv, r"^(?P<k>[^=]*)(?:=(?P<v>.*))?$")
        df = pd.DataFrame({
            "site": site.take(pa.array(parent)).to_pandas(),
            "param": pc.fill_null(pc.struct_field(km, "k"), "").to_pandas(),
            "value": pc.fill_null(pc.struct_field(km, "v"), "").to_pandas(),
        })
        g = df.groupby(["site", "param", "value"], as_index=False,
                       sort=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    pruned = caps.map_batches(extract, batch_format="pyarrow",
                              batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["site", "param", "value"], as_index=False,
                       sort=False).agg(n=("n", "sum"))
        out = g.groupby(["site", "param"], sort=False).agg(
            n_uses=("n", "sum"), n_values=("value", "size")).reset_index()
        return out.astype({"n_uses": "int64", "n_values": "int64"})

    return (hash_bucket(pruned, "site", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def alias_census(caps, *, url_col: str = "url",
                 canon_col: str = "url_canonical",
                 num_partitions: int | None = None):
    """Per-site canonicalization payoff -> Dataset (site, n_pages BIGINT,
    n_aliased_pages BIGINT, n_raw_urls BIGINT, n_alias_urls BIGINT).

    A page (canonical url) with more than one distinct raw url is
    ALIASED — session ids, www variants, scheme variants all collapse
    onto it (operator M5).  Per site: pages, aliased pages, distinct raw
    urls, and surplus raw urls (n_raw - n_pages) — the duplicate fetches
    a crawler saves by canonicalizing, the same accounting the
    reference's URL_CANONICAL strategy exploits at match time.

    Shape: within-batch distinct (canonical, raw) partial, ONE site-key
    shuffle (a site's pages co-locate; distinct counts exact per bucket).
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "c": b[canon_col].to_pandas(),
            "r": b[url_col].to_pandas(),
        }).drop_duplicates()
        m = pc.extract_regex(pa.array(df["c"], type=pa.string()),
                             r"^(?P<h>[^/]+)")
        # .to_numpy(): df's index has drop_duplicates holes, and assigning
        # a RangeIndex Series would align-scramble rows
        df["site"] = (pc.fill_null(pc.struct_field(m, "h"), "")
                      .to_numpy(zero_copy_only=False))
        return df

    pruned = caps.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["c", "r"])
        per_page = df.groupby(["site", "c"], sort=False).size()
        g = per_page.groupby("site")
        out = pd.DataFrame({
            "n_pages": g.size(),
            "n_aliased_pages": g.apply(lambda s: int((s > 1).sum())),
            "n_raw_urls": g.sum(),
        }).reset_index()
        out["n_alias_urls"] = out["n_raw_urls"] - out["n_pages"]
        cols = ["site", "n_pages", "n_aliased_pages", "n_raw_urls",
                "n_alias_urls"]
        return out[cols].astype({c: "int64" for c in cols[1:]})

    return (hash_bucket(pruned, "site", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def url_features(ds, *, url_col: str = "url"):
    """Map-only URL structure features -> one row per input row:
    (url, url_len BIGINT, depth BIGINT, n_params BIGINT).

    ``depth`` = non-empty '/'-separated path segments after the host;
    ``n_params`` = non-empty '&'-separated fragments after the first
    '?'.  The per-url covariates quality filters pair with text signals
    (deep calendar-like paths and long parameter lists correlate with
    crawler traps).  Zero shuffle; Arrow split kernels + one
    reduceat per batch.
    """
    def kern(b: pa.Table) -> pa.Table:
        u = b[url_col].combine_chunks().cast(pa.string())
        stripped = pc.replace_substring_regex(u, r"^https?://", "")
        pm = pc.extract_regex(stripped, r"(?P<p>/[^?]*)")
        path = pc.fill_null(pc.struct_field(pm, "p"), "")
        qm = pc.extract_regex(u, r"\?(?P<q>.*)$")
        query = pc.fill_null(pc.struct_field(qm, "q"), "")

        def nonempty_counts(col, sep):
            lst = pc.split_pattern(col, sep)
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
            off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            ne = pc.not_equal(lst.values, "").to_numpy(zero_copy_only=False)
            out = np.add.reduceat(
                np.append(ne.astype(np.int64), 0), off[:-1]
            ) if len(off) > 1 else np.zeros(0, np.int64)
            out[np.diff(off) == 0] = 0
            return out

        return pa.table({
            "url": u,
            "url_len": pc.cast(pc.utf8_length(u), pa.int64()),
            "depth": pa.array(nonempty_counts(path, "/")),
            "n_params": pa.array(nonempty_counts(query, "&")),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def trap_patterns(caps, *, url_col: str = "url", min_fanout: int = 3,
                  num_partitions: int | None = None):
    """Crawler-trap URL-pattern detection -> Dataset (site, pattern,
    n_urls BIGINT, n_captures BIGINT).

    The pattern is the url's host plus its path/query with every digit
    run collapsed to ``N`` — calendars (/2024/01/02/), paginated
    facets (?page=9741), and numeric session paths all collapse onto
    one pattern whose distinct-url fanout (``n_urls``) explodes while a
    legitimate template stays narrow.  Patterns with fanout >=
    ``min_fanout`` are reported with their capture volume — the
    scope-rule discovery pass a crawl operator runs before adding
    excludes (the reference's scope filters consume exactly such
    rules).  Hosts are NOT digit-collapsed (www2 vs www matters for
    scoping and site identity).

    Shape: map-only Arrow regex extraction + within-batch partial
    distinct (pattern, url) counts, ONE hash-bucket shuffle on pattern
    (a pattern's urls co-locate, so the distinct-url count is exact),
    vectorized per-bucket reduce.  The HAVING-style fanout filter runs
    in the reduce, so only trap rows leave the bucket.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        u = b[url_col].combine_chunks().cast(pa.string())
        hm = pc.extract_regex(u, HOST_PAT)
        site = pc.fill_null(pc.struct_field(hm, "host"), "")
        pm = pc.extract_regex(u, r"^https?://[^/]+(?P<p>/.*)$")
        path = pc.fill_null(pc.struct_field(pm, "p"), "")
        pat = pc.binary_join_element_wise(
            site, pc.replace_substring_regex(path, r"[0-9]+", "N"), "")
        df = pd.DataFrame({
            "site": site.to_pandas(),
            "pattern": pat.to_pandas(),
            "url": u.to_pandas(),
        })
        g = df.groupby(["site", "pattern", "url"], as_index=False,
                       sort=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    pruned = caps.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["site", "pattern", "url"], as_index=False,
                       sort=False).agg(n=("n", "sum"))
        out = g.groupby(["site", "pattern"], sort=False).agg(
            n_urls=("url", "size"), n_captures=("n", "sum")).reset_index()
        out = out[out["n_urls"] >= min_fanout]
        return out.astype({"n_urls": "int64", "n_captures": "int64"})

    return (hash_bucket(pruned, "pattern", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def site_dup_stats(caps, *, url_col: str = "url", digest_col: str = "digest",
                   num_partitions: int | None = None):
    """Per-site duplication scorecard -> Dataset (site, n_captures BIGINT,
    n_urls BIGINT, n_digests BIGINT, dup_captures BIGINT).

    ``dup_captures`` = captures beyond the first per distinct content
    digest within the site — the redundant-fetch volume the exact-dedup
    index (stages/exact.py) eliminates, per site.  The archive-ops
    companion to the global dup_report (A1): which sites pay for dedup.

    Shape: within-batch partial distinct (site, digest, url) with
    counts, ONE site-key shuffle (a site's rows co-locate, so both
    distinct counts are exact per bucket).
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        u = b[url_col].combine_chunks().cast(pa.string())
        hm = pc.extract_regex(u, HOST_PAT)
        df = pd.DataFrame({
            "site": pc.fill_null(pc.struct_field(hm, "host"), "").to_pandas(),
            "digest": b[digest_col].to_pandas(),
            "url": u.to_pandas(),
        })
        g = df.groupby(["site", "digest", "url"], as_index=False,
                       sort=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    pruned = caps.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["site", "digest", "url"], as_index=False,
                       sort=False).agg(n=("n", "sum"))
        out = g.groupby("site", sort=False).agg(
            n_captures=("n", "sum"),
            n_urls=("url", "nunique"),
            n_digests=("digest", "nunique")).reset_index()
        out["dup_captures"] = out["n_captures"] - out["n_digests"]
        cols = ["n_captures", "n_urls", "n_digests", "dup_captures"]
        return out.astype({c: "int64" for c in cols})

    return (hash_bucket(pruned, "site", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def mirror_sites(caps, *, url_col: str = "url", digest_col: str = "digest",
                 min_shared: int = 2, max_sites_per_digest: int = 64,
                 num_partitions: int | None = None):
    """Mirror-host detection -> Dataset (site_a, site_b, n_shared BIGINT):
    pairs of distinct sites sharing >= ``min_shared`` distinct content
    digests (site_a < site_b).  A high shared-digest count between two
    hosts is the mirror/CDN-alias signature — the site-level analog of
    the DIGEST_ANY match tier (content equal, url different).

    Hub-content guard: a digest served by more than
    ``max_sites_per_digest`` sites (empty pages, error boilerplate) is
    EXCLUDED before pair generation — it signals boilerplate, not
    mirroring, and its site-pair fanout is quadratic.  The SQL oracle
    applies the same cap, so the cut is part of the contract, not a
    silent approximation.

    Shape: within-batch distinct (digest, site), ONE digest-key shuffle
    with vectorized within-bucket pair expansion (the lsh.py
    offset-arithmetic idiom — no per-key Python), then a second tiny
    shuffle summing per-pair partials across digest buckets.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pd.DataFrame:
        u = b[url_col].combine_chunks().cast(pa.string())
        hm = pc.extract_regex(u, HOST_PAT)
        df = pd.DataFrame({
            "digest": b[digest_col].to_pandas(),
            "site": pc.fill_null(pc.struct_field(hm, "host"), "").to_pandas(),
        })
        return df.drop_duplicates(ignore_index=True)

    pruned = caps.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["digest", "site"]).sort_values(
            ["digest", "site"], kind="mergesort")
        dig = g["digest"].to_numpy()
        site = g["site"].to_numpy()
        n = len(dig)
        if n == 0:
            return pd.DataFrame({"site_a": pd.Series(dtype="object"),
                                 "site_b": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = dig[1:] != dig[:-1]
        gid = np.cumsum(new) - 1
        start = np.flatnonzero(new)
        counts = np.diff(np.append(start, n))
        n_g = counts[gid]
        pos = np.arange(n) - start[gid]
        keep = n_g <= max_sites_per_digest
        reps = np.where(keep & (n_g > 1), n_g - 1 - pos, 0)
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"site_a": pd.Series(dtype="object"),
                                 "site_b": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        a_idx = np.repeat(np.arange(n), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        b_off = np.arange(total) - np.repeat(cum[:-1], reps) + 1
        b_idx = a_idx + b_off
        # sites ascend within a digest group, so site_a < site_b holds
        out = pd.DataFrame({"site_a": site[a_idx], "site_b": site[b_idx]})
        g2 = out.groupby(["site_a", "site_b"], as_index=False,
                         sort=False).size().rename(columns={"size": "n"})
        g2["n"] = g2["n"].astype("int64")
        return g2

    bucketed = hash_bucket(pruned, "digest", P)
    pair_partials = bucketed.groupby("_part").map_groups(
        lambda g: gen_pairs(g.drop(columns=["_part"])),
        batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["site_a", "site_b"], as_index=False,
                         sort=False).agg(n_shared=("n", "sum"))
        out = out[out["n_shared"] >= min_shared]
        return out.astype({"n_shared": "int64"})

    return (hash_bucket(pair_partials, "site_a", max(1, P // 4))
            .groupby("_part")
            .map_groups(lambda g: final(g.drop(columns=["_part"])),
                        batch_format="pandas"))
