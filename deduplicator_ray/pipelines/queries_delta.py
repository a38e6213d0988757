"""Driver queries + DuckDB oracles for the round-3 operator families:

- snapshot delta (stages/delta.py): crawl_delta, content_provenance,
  host_dedup_savings, site_delta_census;
- capture timelines (stages/timeline.py): capture_gaps, site_change_rate;
- URL mining (stages/urlmine.py): query_param_stats, alias_census;
- CDX/SURT (sources/cdx.py, functions/surt.py): cdx_roundtrip;
- text/corpus signals: stopword_candidates (grouped_heavy_hitters),
  doc_novelty, source_overlap, compression_stats (golden pin);
- events/embeddings: window_active_users, knn_graph.

Same conventions as pipelines/queries.py: epoch-second BIGINTs across
the boundary, identical column names both sides, missing values encoded
(''/-1) rather than NULL so outputs stay non-nullable.
"""

from __future__ import annotations

import pyarrow as pa

from deduplicator_ray.functions.canonical import canonical_sql_expr
from deduplicator_ray.pipelines.golden_sql import GOLDEN_SQL as _GOLDEN
from deduplicator_ray.sources.corpus import CAPTURES_CTE, captures_dataset
from deduplicator_ray.stages.delta import (
    content_provenance,
    crawl_delta,
    host_dedup_savings,
)
from deduplicator_ray.stages.graph import HOST_PAT


def q_crawl_delta(sf_dir: str):
    return crawl_delta(captures_dataset(sf_dir))


def _sql_crawl_delta() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
caps AS (
  SELECT {canon} AS u, md5(text) AS d, ts_epoch, crawl FROM captures
),
h AS (
  SELECT u, d, ts_epoch FROM (
    SELECT u, d, ts_epoch,
           row_number() OVER (PARTITION BY u ORDER BY ts_epoch DESC, d DESC) AS rn
    FROM caps WHERE crawl = 'history') WHERE rn = 1
),
c AS (
  SELECT u, d, ts_epoch FROM (
    SELECT u, d, ts_epoch,
           row_number() OVER (PARTITION BY u ORDER BY ts_epoch DESC, d DESC) AS rn
    FROM caps WHERE crawl = 'current') WHERE rn = 1
)
SELECT COALESCE(h.u, c.u) AS url_canonical,
       CASE WHEN h.u IS NULL THEN 'new'
            WHEN c.u IS NULL THEN 'gone'
            WHEN h.d = c.d THEN 'unchanged'
            ELSE 'changed' END AS status,
       COALESCE(h.d, '') AS hist_digest,
       COALESCE(c.d, '') AS cur_digest,
       COALESCE(h.ts_epoch, -1) AS hist_epoch,
       COALESCE(c.ts_epoch, -1) AS cur_epoch
FROM h FULL OUTER JOIN c ON h.u = c.u
"""


def q_content_provenance(sf_dir: str):
    return content_provenance(captures_dataset(sf_dir))


def _sql_content_provenance() -> str:
    return f"""
WITH {CAPTURES_CTE},
caps AS (
  SELECT md5(text) AS digest,
         regexp_extract(url, '{HOST_PAT}', 1) AS host,
         ts_epoch
  FROM captures
),
origin AS (
  SELECT digest, host AS origin_host, ts_epoch AS origin_epoch FROM (
    SELECT digest, host, ts_epoch,
           row_number() OVER (PARTITION BY digest ORDER BY ts_epoch ASC, host ASC) AS rn
    FROM caps) WHERE rn = 1
),
spread AS (
  SELECT digest, count(DISTINCT host) AS n_hosts, count(*) AS n_captures
  FROM caps GROUP BY digest HAVING count(DISTINCT host) >= 2
)
SELECT s.digest, o.origin_host, o.origin_epoch,
       CAST(s.n_hosts AS BIGINT) AS n_hosts,
       CAST(s.n_captures AS BIGINT) AS n_captures
FROM spread s JOIN origin o ON s.digest = o.digest
"""


def q_host_dedup_savings(sf_dir: str):
    return host_dedup_savings(captures_dataset(sf_dir))


def _sql_host_dedup_savings() -> str:
    return f"""
WITH {CAPTURES_CTE},
caps AS (
  SELECT regexp_extract(url, '{HOST_PAT}', 1) AS host,
         md5(text) AS digest,
         CAST(length(text) AS BIGINT) AS chars
  FROM captures
),
per_pair AS (
  SELECT host, digest, count(*) AS n, min(chars) AS chars
  FROM caps GROUP BY host, digest
)
SELECT host,
       CAST(sum(n) AS BIGINT) AS n_captures,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(n) - count(*) AS BIGINT) AS n_dup,
       CAST(sum(n * chars) AS BIGINT) AS chars_total,
       CAST(sum(chars) AS BIGINT) AS chars_stored,
       CAST(sum(n * chars) - sum(chars) AS BIGINT) AS chars_saved
FROM per_pair GROUP BY host
"""


def q_capture_gaps(sf_dir: str):
    from deduplicator_ray.stages.timeline import capture_gaps

    return capture_gaps(captures_dataset(sf_dir))


def _sql_capture_gaps() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
caps AS (
  SELECT {canon} AS u, ts_epoch FROM captures
),
gaps AS (
  SELECT regexp_extract(u, '^(?P<h>[^/]+)', 1) AS site,
         ts_epoch - lag(ts_epoch) OVER (PARTITION BY u ORDER BY ts_epoch) AS gap
  FROM caps
)
SELECT site,
       count(*) AS n_gaps,
       min(gap) AS min_gap,
       quantile_disc(gap, 0.5) AS p50_gap,
       max(gap) AS max_gap
FROM gaps WHERE gap IS NOT NULL GROUP BY site
"""


def q_domain_rollup(sf_dir: str):
    """Registrable-domain rollup of the capture stream — the Common
    Crawl "domain graph" aggregation level: per last-two-label domain,
    distinct hosts, distinct canonical pages, total captures.  Toy
    public-suffix rule (last two dot-labels) applied identically on
    both engines; within-batch (domain, host, url) distinct partials
    bound the ONE domain-key shuffle."""
    import pyarrow.compute as pc

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        u = b["url_canonical"].combine_chunks()
        m = pc.extract_regex(u, r"^(?P<h>[^/]+)")
        host = pc.fill_null(pc.struct_field(m, "h"), "")
        d = pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$")
        dom = pc.fill_null(pc.struct_field(d, "d"), "")
        df = pa.table({"domain": dom, "host": host, "u": u}).to_pandas()
        g = (df.groupby(["domain", "host", "u"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df):
        import pandas as pd

        d = df[["domain", "host", "u", "n"]]
        g = (d.groupby(["domain", "host", "u"], as_index=False)
             .agg(n=("n", "sum")))
        out = g.groupby("domain", as_index=False).agg(
            n_hosts=("host", "nunique"), n_pages=("u", "nunique"),
            n_captures=("n", "sum"))
        for c in ("n_hosts", "n_pages", "n_captures"):
            out[c] = out[c].astype("int64")
        return out

    return (hash_bucket(
        caps.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True), "domain",
        auto_partitions())
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas"))


def _sql_domain_rollup() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
caps AS (SELECT {canon} AS u FROM captures),
h AS (
  SELECT u, regexp_extract(u, '^(?P<h>[^/]+)', 1) AS host FROM caps
),
d AS (
  SELECT u, host, regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
  FROM h
)
SELECT domain,
       count(DISTINCT host)::BIGINT AS n_hosts,
       count(DISTINCT u)::BIGINT AS n_pages,
       count(*)::BIGINT AS n_captures
FROM d GROUP BY domain
"""


_BURST_WINDOW = 60


def q_capture_burst(sf_dir: str):
    """Per-site crawl-burst audit (stages/timeline.py:capture_burst):
    max captures of a site inside any 60-second window — the politeness
    dual of capture_gaps."""
    from deduplicator_ray.stages.timeline import capture_burst

    return capture_burst(captures_dataset(sf_dir), window=_BURST_WINDOW)


def _sql_capture_burst() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
caps AS (
  SELECT {canon} AS u, ts_epoch FROM captures
),
s AS (
  SELECT regexp_extract(u, '^(?P<h>[^/]+)', 1) AS site, ts_epoch AS ts
  FROM caps
),
sd AS (SELECT site, ts, count(*)::BIGINT AS dup FROM s GROUP BY 1, 2),
cnts AS (
  SELECT a.site, a.ts, sum(b.dup)::BIGINT AS cnt
  FROM sd a JOIN sd b
    ON b.site = a.site AND b.ts >= a.ts AND b.ts < a.ts + {_BURST_WINDOW}
  GROUP BY 1, 2)
SELECT n.site, n.n_captures, m.max_burst FROM
  (SELECT site, count(*)::BIGINT AS n_captures FROM s GROUP BY 1) n
  JOIN (SELECT site, max(cnt)::BIGINT AS max_burst FROM cnts GROUP BY 1) m
  USING (site)
"""


def q_site_change_rate(sf_dir: str):
    from deduplicator_ray.stages.timeline import site_change_rate

    return site_change_rate(captures_dataset(sf_dir))


def _sql_site_change_rate() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT {canon} AS url_canonical, ts_epoch, md5(text) AS digest
      FROM captures),
seq AS (SELECT url_canonical, ts_epoch, digest,
               lag(digest) OVER (PARTITION BY url_canonical
                                 ORDER BY ts_epoch, digest) AS prev
        FROM c),
grp AS (SELECT url_canonical,
               sum(CASE WHEN prev IS NULL OR prev <> digest
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY url_canonical
                       ORDER BY ts_epoch, digest
                       ROWS UNBOUNDED PRECEDING) AS g
        FROM seq),
per_url AS (
  SELECT url_canonical,
         count(DISTINCT g) AS n_versions,
         count(*) AS n_captures
  FROM grp GROUP BY url_canonical
)
SELECT regexp_extract(url_canonical, '^(?P<h>[^/]+)', 1) AS site,
       count(*) AS n_pages,
       CAST(sum(n_versions) AS BIGINT) AS n_versions,
       CAST(sum(n_captures) AS BIGINT) AS n_captures,
       CAST(CASE WHEN sum(n_captures) > count(*)
                 THEN ((sum(n_versions) - count(*)) * 1000000)
                      // (sum(n_captures) - count(*))
                 ELSE 0 END AS BIGINT) AS change_ppm
FROM per_url GROUP BY site
"""


_CDX_N_DOCS = 200
_CDX_EPOCH0 = 1_700_000_000


def q_cdx_roundtrip(sf_dir: str):
    """Synthesize a deterministic CDX-11 index from the documents table
    (SURT urlkeys via functions/surt.py, 404s with '-' mime/digest to
    exercise null handling), write it sorted, read it back through the
    CDX source and emit the parsed rows.  The oracle recomputes every
    row from ``documents`` incl. the urlkey via the SURT SQL mirror."""
    import hashlib as _hl
    import os as _os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from deduplicator_ray.functions.digesting import md5_hex_many
    from deduplicator_ray.functions.surt import surt_arrow
    from deduplicator_ray.sources.cdx import read_cdx, write_cdx

    docs = (pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas())
    docs = docs[docs["doc_id"] < _CDX_N_DOCS].sort_values("doc_id")
    ids = docs["doc_id"].astype("int64")
    url = ("https://www.site" + (ids % 20).astype(str)
           + ".example/d/" + ids.astype(str))
    is_404 = (ids % 7 == 0) & (ids > 0)
    rec = pd.DataFrame({
        "urlkey": surt_arrow(pa.array(url, type=pa.string())).to_pandas(),
        "ts_epoch": _CDX_EPOCH0 + ids,
        "url": url,
        "mime": pd.Series("text/html", index=docs.index).where(~is_404, None),
        "status": pd.Series(200, index=docs.index).where(~is_404, 404),
        "digest": pd.Series(md5_hex_many(docs["text"].tolist()),
                            index=docs.index).where(~is_404, None),
        "length": docs["text"].str.len().astype("int64"),
        "offset": ids * 1000,
        "filename": "part-" + (ids % 4).astype(str) + ".warc.gz",
    })
    out_dir = "/tmp/graft_cdx"
    _os.makedirs(out_dir, exist_ok=True)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = write_cdx(f"{out_dir}/roundtrip_{tag}.cdx", rec)

    ds = read_cdx(path)

    def project(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["warc_ts"].cast(pa.timestamp("us")),
                                  pa.int64()), 1_000_000)
        return pa.table({
            "urlkey": b["urlkey"],
            "ts_epoch": epoch,
            "url": b["url"],
            "mime": b["mime"],
            "status": b["status"],
            "digest": b["digest"],
            "length": b["length"],
            "offset": b["offset"],
            "filename": b["filename"],
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def _sql_cdx_roundtrip() -> str:
    from deduplicator_ray.functions.surt import surt_sql_expr

    url = ("'https://www.site' || (doc_id % 20) || '.example/d/' || doc_id")
    return f"""
SELECT {surt_sql_expr(url)} AS urlkey,
       CAST({_CDX_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       {url} AS url,
       CASE WHEN doc_id % 7 = 0 AND doc_id > 0 THEN NULL
            ELSE 'text/html' END AS mime,
       CAST(CASE WHEN doc_id % 7 = 0 AND doc_id > 0 THEN 404
                 ELSE 200 END AS BIGINT) AS status,
       CASE WHEN doc_id % 7 = 0 AND doc_id > 0 THEN NULL
            ELSE md5(text) END AS digest,
       CAST(length(text) AS BIGINT) AS length,
       CAST(doc_id * 1000 AS BIGINT) AS offset,
       'part-' || (doc_id % 4) || '.warc.gz' AS filename
FROM documents WHERE doc_id < {_CDX_N_DOCS}
"""


def q_trap_patterns(sf_dir: str):
    """Crawler-trap URL-pattern fanout (stages/urlmine.trap_patterns):
    digit-collapsed url patterns with >= 3 distinct raw urls."""
    from deduplicator_ray.stages.urlmine import trap_patterns

    return trap_patterns(captures_dataset(sf_dir), min_fanout=3)


def _sql_trap_patterns() -> str:
    return f"""
WITH {CAPTURES_CTE},
e AS (
  SELECT url,
         regexp_extract(url, '{HOST_PAT}', 1) AS site,
         regexp_extract(url, '^https?://[^/]+(/.*)$', 1) AS path
  FROM captures
)
SELECT site,
       site || regexp_replace(path, '[0-9]+', 'N', 'g') AS pattern,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(count(*) AS BIGINT) AS n_captures
FROM e GROUP BY site, pattern
HAVING count(DISTINCT url) >= 3
"""


def q_site_dup_stats(sf_dir: str):
    """Per-site duplication scorecard (stages/urlmine.site_dup_stats):
    capture / distinct-url / distinct-digest counts and the redundant
    fetches exact dedup saves, per site."""
    from deduplicator_ray.stages.urlmine import site_dup_stats

    return site_dup_stats(captures_dataset(sf_dir))


def _sql_site_dup_stats() -> str:
    return f"""
WITH {CAPTURES_CTE},
e AS (
  SELECT regexp_extract(url, '{HOST_PAT}', 1) AS site, url,
         md5(text) AS digest
  FROM captures
)
SELECT site, CAST(count(*) AS BIGINT) AS n_captures,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT digest) AS BIGINT) AS n_digests,
       CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS dup_captures
FROM e GROUP BY site
"""


_MIRROR_MIN_SHARED = 2
_MIRROR_MAX_SITES = 64


def q_mirror_sites(sf_dir: str):
    """Mirror-host detection (stages/urlmine.mirror_sites): site pairs
    sharing >= 2 distinct content digests (the planted mirror.example
    shows up against every mirrored origin site)."""
    from deduplicator_ray.stages.urlmine import mirror_sites

    return mirror_sites(captures_dataset(sf_dir),
                        min_shared=_MIRROR_MIN_SHARED,
                        max_sites_per_digest=_MIRROR_MAX_SITES)


def _sql_mirror_sites() -> str:
    return f"""
WITH {CAPTURES_CTE},
e AS (
  SELECT DISTINCT regexp_extract(url, '{HOST_PAT}', 1) AS site,
         md5(text) AS digest
  FROM captures
),
d AS (
  SELECT digest FROM e GROUP BY digest
  HAVING count(*) <= {_MIRROR_MAX_SITES}
),
f AS (SELECT e.site, e.digest FROM e JOIN d USING (digest))
SELECT a.site AS site_a, b.site AS site_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM f a JOIN f b ON a.digest = b.digest AND a.site < b.site
GROUP BY site_a, site_b
HAVING count(*) >= {_MIRROR_MIN_SHARED}
"""


_HOST_SPLIT_FRACTIONS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
_HOST_SPLIT_SEED = 47


def q_host_split(sf_dir: str):
    """Domain-level train/val/test assignment
    (stages/shuffle.split_assign_grouped): every url of one host lands
    in ONE split — the split hygiene that stops near-duplicate pages of
    a site from straddling train and test.  Returns (site, split,
    n_urls): the distinct-url aggregate first (one site shuffle), then
    the pure-function split on the tiny per-site table."""
    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.stages.graph import HOST_PAT as _HP
    from deduplicator_ray.stages.shuffle import split_assign_grouped

    import pandas as pd
    import pyarrow.compute as _pc

    caps = captures_dataset(sf_dir)

    def partial(b):
        u = b["url"].combine_chunks().cast("string")
        hm = _pc.extract_regex(u, _HP)
        return pd.DataFrame({
            "site": _pc.fill_null(_pc.struct_field(hm, "host"), "").to_pandas(),
            "url": u.to_pandas(),
        }).drop_duplicates(ignore_index=True)

    pruned = caps.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)

    def per_bucket(df):
        df = df.drop_duplicates(["site", "url"])
        out = df.groupby("site", sort=False).agg(
            n_urls=("url", "size")).reset_index()
        return out.astype({"n_urls": "int64"})

    agg = (hash_bucket(pruned, "site", 8)
           .groupby("_part")
           .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                       batch_format="pandas"))
    return split_assign_grouped(agg, _HOST_SPLIT_FRACTIONS,
                                seed=_HOST_SPLIT_SEED, group_col="site",
                                keep_cols=("n_urls",))


def _sql_host_split() -> str:
    from deduplicator_ray.stages.shuffle import group_split_sql_expr

    expr = group_split_sql_expr(_HOST_SPLIT_FRACTIONS, _HOST_SPLIT_SEED,
                                "site")
    return f"""
WITH {CAPTURES_CTE},
e AS (
  SELECT DISTINCT regexp_extract(url, '{HOST_PAT}', 1) AS site, url
  FROM captures
),
a AS (SELECT site, CAST(count(*) AS BIGINT) AS n_urls FROM e GROUP BY site)
SELECT site, {expr} AS split, n_urls FROM a
"""


def q_query_param_stats(sf_dir: str):
    from deduplicator_ray.stages.urlmine import query_param_stats

    return query_param_stats(captures_dataset(sf_dir))


def _sql_query_param_stats() -> str:
    return f"""
WITH {CAPTURES_CTE},
qq AS (
  SELECT regexp_extract(url, '{HOST_PAT}', 1) AS site,
         regexp_extract(url, '\\?(.*)$', 1) AS q
  FROM captures WHERE strpos(url, '?') > 0
),
kv AS (SELECT site, unnest(string_split(q, '&')) AS f FROM qq),
pv AS (
  SELECT site,
         CASE WHEN strpos(f, '=') > 0
              THEN substr(f, 1, strpos(f, '=') - 1) ELSE f END AS param,
         CASE WHEN strpos(f, '=') > 0
              THEN substr(f, strpos(f, '=') + 1) ELSE '' END AS value
  FROM kv
)
SELECT site, param,
       count(*) AS n_uses,
       count(DISTINCT value) AS n_values
FROM pv GROUP BY site, param
"""


_STOPWORD_PPM = 2000


def q_stopword_candidates(sf_dir: str):
    """Per-language exact heavy words (stages/freq.grouped_heavy_hitters):
    every word at >= {ppm} ppm of its language's token count — the
    stopword-list discovery pass, sketch-bounded shuffle."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import grouped_heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    return grouped_heavy_hitters(ds, group_col="lang",
                                 min_ppm=_STOPWORD_PPM)


def _sql_stopword_candidates() -> str:
    return f"""
WITH w AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
),
tot AS (SELECT lang, count(*) AS n FROM w GROUP BY lang)
SELECT w.lang, w.word, count(*) AS n
FROM w JOIN tot USING (lang)
GROUP BY w.lang, w.word, tot.n
HAVING count(*) * 1000000 >= tot.n * {_STOPWORD_PPM}
"""


_NOVELTY_N = 8


def q_doc_novelty(sf_dir: str):
    """Per-doc first-seen gram counts (stages/sentdedup.doc_novelty):
    of each doc's distinct {n}-word grams, how many it owns (min doc_id
    corpus-wide) — the novelty/memorization ordering signal."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import doc_novelty

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return doc_novelty(ds, ngram=_NOVELTY_N)


def _sql_doc_novelty() -> str:
    n = _NOVELTY_N
    return f"""
WITH l AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, array_to_string(w[p:p + {n} - 1], ' ') AS gram
  FROM l, unnest(range(1, len(w) - {n} + 2)) AS t(p)
),
dg AS (SELECT DISTINCT doc_id, gram FROM g),
own AS (SELECT gram, min(doc_id) AS owner FROM dg GROUP BY gram)
SELECT d.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN o.owner = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel
FROM dg d JOIN own o ON d.gram = o.gram
GROUP BY d.doc_id
"""


_WAU_WINDOW_S, _WAU_HOP_S = 3600, 900


def q_window_active_users(sf_dir: str):
    """Exact distinct active users per hopping window
    (stages/events.window_active_users): window 1 h, hop 15 min."""
    import ray.data as rd

    from deduplicator_ray.stages.events import window_active_users

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return window_active_users(ds, window_s=_WAU_WINDOW_S,
                               hop_s=_WAU_HOP_S)


def _sql_window_active_users() -> str:
    k = _WAU_WINDOW_S // _WAU_HOP_S
    return f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) // 1000 AS tse FROM events
),
w AS (
  SELECT user_id, ((tse // {_WAU_HOP_S}) - k.k) * {_WAU_HOP_S} AS window_epoch
  FROM e CROSS JOIN (SELECT unnest(range({k})) AS k) k
)
SELECT window_epoch,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM w GROUP BY window_epoch
"""


def q_alias_census(sf_dir: str):
    """Per-site canonicalization payoff (stages/urlmine.alias_census):
    distinct raw urls collapsing onto each canonical page."""
    from deduplicator_ray.stages.urlmine import alias_census

    return alias_census(captures_dataset(sf_dir))


def _sql_alias_census() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
x AS (SELECT DISTINCT {canon} AS c, url AS r FROM captures),
pp AS (
  SELECT regexp_extract(c, '^(?P<h>[^/]+)', 1) AS site, c,
         count(*) AS nr
  FROM x GROUP BY site, c
)
SELECT site,
       count(*) AS n_pages,
       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_aliased_pages,
       CAST(sum(nr) AS BIGINT) AS n_raw_urls,
       CAST(sum(nr) - count(*) AS BIGINT) AS n_alias_urls
FROM pp GROUP BY site
"""


def q_site_delta_census(sf_dir: str):
    """Per-site snapshot-delta rollup (stages/delta.site_delta_census)."""
    from deduplicator_ray.stages.delta import site_delta_census

    return site_delta_census(captures_dataset(sf_dir))


def _sql_site_delta_census() -> str:
    # reuse the page-level delta, roll up by the canonical site
    inner = _sql_crawl_delta().strip()
    return f"""
WITH delta AS ({inner})
SELECT regexp_extract(url_canonical, '^(?P<h>[^/]+)', 1) AS site,
       CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN status = 'gone' THEN 1 ELSE 0 END) AS BIGINT) AS n_gone,
       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
FROM delta GROUP BY site
"""


_OVL_N = 8


def q_source_overlap(sf_dir: str):
    """Pairwise cross-source shared-gram matrix
    (stages/sentdedup.source_overlap_matrix)."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import source_overlap_matrix

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    return source_overlap_matrix(ds, ngram=_OVL_N)


def _sql_source_overlap() -> str:
    n = _OVL_N
    return f"""
WITH l AS (
  SELECT source, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT source, array_to_string(w[p:p + {n} - 1], ' ') AS gram
  FROM l, unnest(range(1, len(w) - {n} + 2)) AS t(p)
),
dg AS (SELECT DISTINCT source, gram FROM g)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared
FROM dg a JOIN dg b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""


_KNN_K = 5


def q_knn_graph(sf_dir: str):
    """Exact k-NN graph over the embeddings table: each vector's top-{k}
    cosine neighbors EXCLUDING itself (the SemDeDup/cluster input).
    Broadcast exact path at this scale (corpus IS the query matrix,
    ray.put once, per-block local top-k prune); the IVF / banded-LSH
    stages are the documented scale path."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from deduplicator_ray.stages.embed import cosine_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qtbl = (pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).sort_by("vec_id"))
    q = np.stack(qtbl["embedding"].to_pylist()).astype(np.float64)
    # k+1 then drop the self row and re-rank (self is in the top k+1
    # unless k+1 EXACT duplicates of a vector all have smaller ids —
    # impossible in this corpus; a general caller would dedup first)
    out = cosine_topk(ds, q, k=_KNN_K + 1).to_pandas()
    out = out[out["query_id"] != out["vec_id"]]
    out = out.sort_values(["query_id", "rank"], ignore_index=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out = out[out["rank"] <= _KNN_K]
    return out[["query_id", "vec_id", "rank"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"})


def _sql_knn_graph() -> str:
    return f"""
WITH p AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         list_cosine_similarity(a.embedding, b.embedding) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)
SELECT query_id, vec_id, rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM p
) WHERE rank <= {_KNN_K}
"""


def q_compression_stats(sf_dir: str):
    """Per-doc gzip-compressibility quality signal
    (stages/textstats.compression_stats) — golden-pinned (zlib output is
    deterministic but not SQL-expressible)."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import compression_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return compression_stats(ds)


def q_url_features(sf_dir: str):
    """Per-capture URL structure features (stages/urlmine.url_features)."""
    from deduplicator_ray.stages.urlmine import url_features

    return url_features(captures_dataset(sf_dir))


def _sql_url_features() -> str:
    stripped = "regexp_replace(url, '^https?://', '')"
    path = f"regexp_extract({stripped}, '(/[^?]*)', 1)"
    query = "CASE WHEN strpos(url, '?') > 0 THEN regexp_extract(url, '\\?(.*)$', 1) ELSE '' END"
    return f"""
WITH {CAPTURES_CTE}
SELECT url,
       CAST(length(url) AS BIGINT) AS url_len,
       CAST(len(list_filter(string_split({path}, '/'),
                            x -> x <> '')) AS BIGINT) AS depth,
       CAST(len(list_filter(string_split({query}, '&'),
                            x -> x <> '')) AS BIGINT) AS n_params
FROM captures
"""


def q_distinct_urls_hll(sf_dir: str):
    """Shuffle-free HLL distinct-url estimate over the captures corpus
    (stages/freq.distinct_count_hll) — golden-pinned (deterministic
    registers; pytest gates the estimate against the exact count)."""
    import pandas as pd

    from deduplicator_ray.stages.freq import distinct_count_hll

    r = distinct_count_hll(captures_dataset(sf_dir), "url", p=12)
    return pd.DataFrame({"estimate": [r["estimate"]],
                         "registers": [r["registers"]]}).astype("int64")


def q_digest_freq_cms(sf_dir: str):
    """Count-Min frequency estimates over the captures digest column
    (stages/freq.count_min_sketch) for three probe keys: the planted
    hub digest (md5 of the empty page), doc 0's content digest, and an
    absent key.  Zero-shuffle sketch, golden-pinned (deterministic;
    pytest gates the overestimate-only property and merge linearity)."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from deduplicator_ray.stages.freq import cms_query, count_min_sketch

    sk = count_min_sketch(captures_dataset(sf_dir), "digest",
                          width=16384, depth=4)
    doc0 = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    t0 = doc0.loc[doc0["doc_id"] == 0, "text"].iloc[0]
    keys = [hashlib.md5(b"").hexdigest(),
            hashlib.md5(t0.encode()).hexdigest(),
            "0" * 32]
    est = cms_query(sk, keys)
    return pd.DataFrame({
        "probe": ["hub_empty", "doc0", "absent"],
        "estimate": est.astype("int64"),
    })


def q_hll_md5_registers(sf_dir: str):
    """HyperLogLog register table with EVERY register independently
    recomputed in SQL: the ``hash_fn="md5"`` variant of the HLL partial
    (stages/freq.hll_merged_registers — same slot/rho/merge code as the
    production `distinct_urls_hll`, only the row hash swapped to
    DuckDB's ``md5_number_lower``) over the captures url column at
    p=12.  Emits the nonzero (slot, reg) rows; the oracle rebuilds each
    register from the raw urls — slot = top 12 hash bits, rho = 1-based
    position of the first 1 bit among the remaining 52
    (53 - bit_length, sentinel 53 when they are all zero), merged by
    slot-wise MAX.  This graduates the HLL register construction (hash
    split, rho rule, max-merge) to a real recomputation; the estimate
    formula on top stays pytest-gated against the exact count."""
    import numpy as np
    import pandas as pd

    from deduplicator_ray.stages.freq import hll_merged_registers

    regs = hll_merged_registers(captures_dataset(sf_dir), "url", p=12,
                                hash_fn="md5")
    nz = np.flatnonzero(regs)
    return pd.DataFrame({"slot": nz.astype("int64"),
                         "reg": regs[nz].astype("int64")})


def _sql_hll_md5_registers() -> str:
    return f"""
WITH {CAPTURES_CTE},
hh AS (SELECT md5_number_lower(url) AS h FROM captures),
rr AS (SELECT CAST(h >> 52 AS BIGINT) AS slot,
              h & ((CAST(1 AS UBIGINT) << 52) - 1) AS rest
       FROM hh)
SELECT slot,
       CAST(MAX(CASE WHEN rest = 0 THEN 53
                     ELSE 53 - length(bin(rest)) END) AS BIGINT) AS reg
FROM rr GROUP BY slot
"""


def q_cms_md5_freq(sf_dir: str):
    """Count-Min sketch with the WHOLE estimate path independently
    recomputed in SQL: the ``hash_fn="md5"`` variant of the CMS
    (stages/freq.count_min_sketch — same partial/merge/min-query code
    as the production `digest_freq_cms`, row hash swapped to
    ``md5_number_lower('<depth>|' || value)``) over the captures digest
    column at width=4096 x depth=4, point-queried for EVERY distinct
    digest.  The oracle rebuilds all occupied cells from the raw
    captures and takes the same min-over-depths — so the bucket
    arithmetic, the merge-by-sum and the never-underestimates query are
    value-checked against a from-scratch recomputation (the estimates
    include real collisions at width 4096)."""
    import pandas as pd

    from deduplicator_ray.stages.freq import cms_query, count_min_sketch

    caps = captures_dataset(sf_dir)
    sk = count_min_sketch(caps, "digest", width=4096, depth=4,
                          hash_fn="md5")
    keys = sorted(caps.select_columns(["digest"]).unique("digest"))
    est = cms_query(sk, keys, hash_fn="md5")
    return pd.DataFrame({"digest": keys, "est": est.astype("int64")})


def _sql_cms_md5_freq() -> str:
    return f"""
WITH {CAPTURES_CTE},
dd AS (SELECT md5(text) AS digest FROM captures),
dep AS (SELECT unnest([0, 1, 2, 3]) AS d),
cells AS (
  SELECT dep.d AS row,
         CAST(md5_number_lower(dep.d || '|' || dd.digest) % 4096
              AS BIGINT) AS slot,
         COUNT(*) AS c
  FROM dd CROSS JOIN dep
  GROUP BY 1, 2
)
SELECT k.digest, CAST(MIN(c.c) AS BIGINT) AS est
FROM (SELECT DISTINCT digest FROM dd) k
CROSS JOIN dep
JOIN cells c
  ON c.row = dep.d
 AND c.slot = CAST(md5_number_lower(dep.d || '|' || k.digest) % 4096
                   AS BIGINT)
GROUP BY k.digest
"""


def q_page_lifespans(sf_dir: str):
    from deduplicator_ray.stages.timeline import page_lifespans

    return page_lifespans(captures_dataset(sf_dir))


def _sql_page_lifespans() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE}
SELECT {canon} AS url_canonical,
       min(ts_epoch) AS first_epoch,
       max(ts_epoch) AS last_epoch,
       count(*) AS n_captures,
       max(ts_epoch) - min(ts_epoch) AS lifespan_s
FROM captures GROUP BY 1
"""


_LHQ_QS = (50, 90, 99)


def q_length_quantiles_log(sf_dir: str):
    """Log2-histogram quantile brackets over doc lengths
    (stages/freq.log_histogram_quantiles) — the unbounded-domain
    quantile sketch, recomputed exactly by the oracle via an integer
    powers-of-two bucket join."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import log_histogram_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return log_histogram_quantiles(ds, "n_chars", qs=_LHQ_QS)


def _sql_length_quantiles_log() -> str:
    qs = ", ".join(str(q) for q in _LHQ_QS)
    return f"""
WITH vals AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents),
n AS (SELECT count(*) AS n FROM vals),
-- doc lengths < 2^40 by far; BIGINT left-shift overflows at 63
buckets AS (SELECT unnest(range(0, 41)) AS b),
vb AS (
  SELECT v, (SELECT min(b) FROM buckets WHERE v < (1::BIGINT << b)) AS bkt
  FROM vals
),
counts AS (SELECT bkt, count(*) AS c FROM vb GROUP BY bkt),
cum AS (SELECT bkt, sum(c) OVER (ORDER BY bkt) AS cum FROM counts),
qq AS (SELECT unnest([{qs}]) AS q),
ranks AS (SELECT q, ((q * n.n + 99) // 100) - 1 AS rank FROM qq, n),
pick AS (
  SELECT r.q, min(c.bkt) AS bkt
  FROM ranks r JOIN cum c ON c.cum >= r.rank + 1
  GROUP BY r.q
)
SELECT CAST(q AS BIGINT) AS q,
       CAST(CASE WHEN bkt = 0 THEN 0
                 ELSE (1::BIGINT << (bkt - 1)) END AS BIGINT) AS lo,
       CAST(CASE WHEN bkt = 0 THEN 0
                 ELSE (1::BIGINT << bkt) - 1 END AS BIGINT) AS hi
FROM pick
"""


def q_site_lang_mix(sf_dir: str):
    """Per-site language census over captures (partial-combine + one
    tiny driver merge — the host_stats shape): the language-drift signal
    archives track per site."""
    import pandas as pd
    import pyarrow as pa

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        m = pc.extract_regex(b["url"], "^https?://(?P<host>[^/]+)")
        df = pd.DataFrame({
            "site": pc.fill_null(pc.struct_field(m, "host"), "").to_pandas(),
            "lang": b["lang"].to_pandas(),
        })
        g = df.groupby(["site", "lang"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    parts = caps.map_batches(partial, batch_format="pyarrow",
                             batch_size=8192).to_pandas()
    out = parts.groupby(["site", "lang"], as_index=False).agg(n=("n", "sum"))
    return out.astype({"n": "int64"})


def _sql_site_lang_mix() -> str:
    return f"""
WITH {CAPTURES_CTE}
SELECT regexp_extract(url, '^https?://(?P<host>[^/]+)', 1) AS site, lang, count(*) AS n
FROM captures GROUP BY 1, 2
"""


_PPS_WREF, _PPS_SEED = 2000, 7


def q_corpus_sample_pps(sf_dir: str):
    """Token-weighted (probability-proportional-to-size) sample of the
    documents table (stages/shuffle.pps_sample): keep probability
    min(1, n_chars/{w}); HUGEINT bit-parity oracle."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import pps_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    return pps_sample(ds, weight_col="n_chars", w_ref=_PPS_WREF,
                      seed=_PPS_SEED)


def _sql_corpus_sample_pps() -> str:
    from deduplicator_ray.stages.shuffle import pps_sql_predicate

    return f"""
SELECT doc_id, n_chars FROM documents
WHERE {pps_sql_predicate("n_chars", _PPS_WREF, _PPS_SEED)}
"""


def registry_delta():
    """name -> (callable(sf_dir), oracle_sql)."""
    return {
        "crawl_delta": (q_crawl_delta, _sql_crawl_delta()),
        "content_provenance": (q_content_provenance, _sql_content_provenance()),
        "host_dedup_savings": (q_host_dedup_savings, _sql_host_dedup_savings()),
        "capture_gaps": (q_capture_gaps, _sql_capture_gaps()),
        "capture_burst": (q_capture_burst, _sql_capture_burst()),
        "domain_rollup": (q_domain_rollup, _sql_domain_rollup()),
        "domain_blocklist": (q_domain_blocklist, _sql_domain_blocklist()),
        "dup_rate_by_depth": (q_dup_rate_by_depth,
                              _sql_dup_rate_by_depth()),
        "site_change_rate": (q_site_change_rate, _sql_site_change_rate()),
        "cdx_roundtrip": (q_cdx_roundtrip, _sql_cdx_roundtrip()),
        "query_param_stats": (q_query_param_stats, _sql_query_param_stats()),
        "trap_patterns": (q_trap_patterns, _sql_trap_patterns()),
        "site_dup_stats": (q_site_dup_stats, _sql_site_dup_stats()),
        "mirror_sites": (q_mirror_sites, _sql_mirror_sites()),
        "host_split": (q_host_split, _sql_host_split()),
        "stopword_candidates": (q_stopword_candidates, _sql_stopword_candidates()),
        "doc_novelty": (q_doc_novelty, _sql_doc_novelty()),
        "window_active_users": (q_window_active_users, _sql_window_active_users()),
        "alias_census": (q_alias_census, _sql_alias_census()),
        "site_delta_census": (q_site_delta_census, _sql_site_delta_census()),
        "source_overlap": (q_source_overlap, _sql_source_overlap()),
        "knn_graph": (q_knn_graph, _sql_knn_graph()),
        "compression_stats": (q_compression_stats,
                              _GOLDEN.get("compression_stats")),
        "url_features": (q_url_features, _sql_url_features()),
        "hll_md5_registers": (q_hll_md5_registers, _sql_hll_md5_registers()),
        "cms_md5_freq": (q_cms_md5_freq, _sql_cms_md5_freq()),
        "distinct_urls_hll": (q_distinct_urls_hll,
                              _GOLDEN.get("distinct_urls_hll")),
        "digest_freq_cms": (q_digest_freq_cms,
                            _GOLDEN.get("digest_freq_cms")),
        "page_lifespans": (q_page_lifespans, _sql_page_lifespans()),
        "length_quantiles_log": (q_length_quantiles_log,
                                 _sql_length_quantiles_log()),
        "site_lang_mix": (q_site_lang_mix, _sql_site_lang_mix()),
        "corpus_sample_pps": (q_corpus_sample_pps, _sql_corpus_sample_pps()),
    }


_BLOCK_MIN_CAPS, _BLOCK_DUP_NUM, _BLOCK_DUP_DEN = 20, 1, 2
_BLOCK_PARAM_NUM, _BLOCK_PARAM_DEN = 4, 5


def q_domain_blocklist(sf_dir: str):
    """Registrable-domain BLOCKLIST candidates — the decision rollup a
    crawl operator reviews before excluding a domain: per domain,
    captures / distinct pages / duplicated-content captures (captures
    minus distinct digests) / query-param captures, and an integer-rule
    ``blocked`` flag: >= 20 captures AND (dup share >= 1/2 OR
    query-param share >= 4/5).  Thresholds are the classic
    spam/trap/mirror screens; the param screen reads the RAW url
    (canonicalization strips exactly the session params it targets —
    the hub 'empty page' digest family trips the dup rule by
    construction).

    Same distribution contract as domain_rollup: within-batch distinct
    partials, ONE domain-keyed shuffle, vectorized per-bucket rollup;
    integer rules evaluate identically in DuckDB."""
    import pyarrow.compute as pc

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        u = b["url_canonical"].combine_chunks()
        m = pc.extract_regex(u, r"^(?P<h>[^/]+)")
        host = pc.fill_null(pc.struct_field(m, "h"), "")
        d = pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$")
        dom = pc.fill_null(pc.struct_field(d, "d"), "")
        # param screen reads the RAW url: canonicalization strips exactly
        # the session params the rule exists to catch
        has_q = pc.cast(pc.greater(pc.count_substring(b["url"], "?"), 0),
                        pa.int64())
        df = pa.table({"domain": dom, "u": u, "digest": b["digest"],
                       "q": has_q}).to_pandas()
        g = (df.groupby(["domain", "u", "digest"], as_index=False)
             .agg(n=("q", "size"), n_param=("q", "sum")))
        g["n"] = g["n"].astype("int64")
        g["n_param"] = g["n_param"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df):
        import pandas as pd

        g = (df.groupby(["domain", "u", "digest"], as_index=False)
             .agg(n=("n", "sum"), n_param=("n_param", "sum")))
        out = g.groupby("domain", as_index=False).agg(
            n_captures=("n", "sum"), n_pages=("u", "nunique"),
            n_digests=("digest", "nunique"), n_param=("n_param", "sum"))
        nc = out["n_captures"]
        out["n_dup"] = nc - out["n_digests"]
        blocked = (nc >= _BLOCK_MIN_CAPS) & (
            (_BLOCK_DUP_DEN * out["n_dup"] >= _BLOCK_DUP_NUM * nc)
            | (_BLOCK_PARAM_DEN * out["n_param"] >= _BLOCK_PARAM_NUM * nc))
        out["blocked"] = blocked.astype("int64")
        out = out.drop(columns=["n_digests"])
        for c in ("n_captures", "n_pages", "n_dup", "n_param", "blocked"):
            out[c] = out[c].astype("int64")
        return out[["domain", "n_captures", "n_pages", "n_dup",
                    "n_param", "blocked"]]

    return (hash_bucket(
        caps.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True), "domain",
        auto_partitions())
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas"))


def q_dup_rate_by_depth(sf_dir: str):
    """Duplicate rate per URL PATH DEPTH — the structural dual of
    dup_rate_by_length: is the duplicated mass shallow (mirrors, hub
    pages) or deep (calendar/session traps)?  A capture is a duplicate
    iff it is not its digest's first capture (order: ts, then canonical
    url — deterministic both engines).  ONE digest-key shuffle electing
    first-per-digest, collapsing to <= depths partial rows per bucket;
    tiny driver merge."""
    import pandas as pd
    import pyarrow.compute as pc

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    caps = captures_dataset(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "dg": b["digest"],
            "ts": pc.cast(b["ts_epoch"], pa.int64()),
            "u": b["url_canonical"],
            "depth": pc.cast(
                pc.count_substring(b["url_canonical"], "/"), pa.int64()),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["dg", "ts", "u"], kind="mergesort",
                            ignore_index=True)
        first = ~df["dg"].duplicated()
        g = (pd.DataFrame({"depth": df["depth"],
                           "d": (~first).astype("int64")})
             .groupby("depth", as_index=False)
             .agg(n_captures=("d", "size"), n_dups=("d", "sum")))
        return g

    parts = (hash_bucket(
        caps.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True), "dg", auto_partitions())
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    out = parts.groupby("depth", as_index=False).sum()
    for c in ("n_captures", "n_dups"):
        out[c] = out[c].astype("int64")
    return out


def _sql_dup_rate_by_depth() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT {canon} AS u, ts_epoch, md5(text) AS dg FROM captures),
r AS (SELECT u, dg,
             length(u) - length(replace(u, '/', '')) AS depth,
             row_number() OVER (PARTITION BY dg ORDER BY ts_epoch, u)
               AS rn
      FROM c)
SELECT depth::BIGINT AS depth,
       count(*)::BIGINT AS n_captures,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dups
FROM r GROUP BY depth
"""


def _sql_domain_blocklist() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
caps AS (SELECT {canon} AS u, url AS raw_url, md5(text) AS digest
         FROM captures),
d AS (
  SELECT u, digest,
         regexp_extract(regexp_extract(u, '^(?P<h>[^/]+)', 1),
                        '([^.]+\\.[^.]+)$', 1) AS domain,
         CASE WHEN contains(raw_url, '?') THEN 1 ELSE 0 END AS q
  FROM caps
),
agg AS (
  SELECT domain,
         count(*)::BIGINT AS n_captures,
         count(DISTINCT u)::BIGINT AS n_pages,
         (count(*) - count(DISTINCT digest))::BIGINT AS n_dup,
         sum(q)::BIGINT AS n_param
  FROM d GROUP BY domain
)
SELECT domain, n_captures, n_pages, n_dup, n_param,
       CASE WHEN n_captures >= {_BLOCK_MIN_CAPS} AND (
                 {_BLOCK_DUP_DEN} * n_dup >= {_BLOCK_DUP_NUM} * n_captures
              OR {_BLOCK_PARAM_DEN} * n_param
                 >= {_BLOCK_PARAM_NUM} * n_captures)
            THEN 1 ELSE 0 END::BIGINT AS blocked
FROM agg
"""
