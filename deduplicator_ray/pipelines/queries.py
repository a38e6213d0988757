"""Driver-facing query registry.

Every entry is one operator/pipeline from SURVEY.md §2 (or a north-star
extension), expressed as a Ray Data pipeline over the sf tables, paired —
where SQL can express it — with an ANSI-SQL oracle DuckDB runs on the same
parquet views.  Column names are kept identical on both sides (the
driver's compare hashes values under sorted column names).

Conventions:
- timestamps cross the boundary as epoch-second BIGINTs (``*_epoch``) to
  dodge timestamp-representation drift between Arrow and DuckDB;
- byte/char counts are integers; no floats in oracle-checked outputs
  except where both sides compute the identical IEEE expression;
- the captures corpus (sources/corpus.py) carries the planted duplicate
  structure; its SQL mirror is CAPTURES_CTE.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.config import PipelineConfig, SearchStrategy
from deduplicator_ray.functions.canonical import canonical_sql_expr
from deduplicator_ray.sources.corpus import CAPTURES_CTE, EPOCH0, captures_dataset
from deduplicator_ray.stages.exact import build_index, match_shuffle

# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _split_captures(sf_dir: str):
    """captures -> (history_index_ds, current_ds) via the real engine
    stages (Ray-native end to end)."""
    caps = captures_dataset(sf_dir)

    def hist_part(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["crawl"], "history"))
        return t

    def cur_part(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["crawl"], "current"))
        return t.append_column("content_bytes", pc.cast(pc.utf8_length(t["text"]), pa.int64()))

    hist = caps.map_batches(hist_part, batch_format="pyarrow", zero_copy_batch=True)
    cur = caps.map_batches(cur_part, batch_format="pyarrow", zero_copy_batch=True)
    index = build_index(hist, PipelineConfig())
    return index, cur


def _matches_to_output(matches):
    """Project match output to the oracle-comparable column set."""

    def f(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        ref_epoch = pc.divide(
            pc.cast(b["refers_to_date"].cast(pa.timestamp("us")), pa.int64()), 1_000_000
        )
        # id/count columns pass through the union as nullable (the history
        # side nulls them) and come back float64 — restore exact int64
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "rep": pc.cast(b["rep"], pa.int64()),
                "url": b["url"],
                "digest": b["digest"],
                "ts_epoch": epoch,
                "is_duplicate": b["is_duplicate"],
                "match_tier": b["match_tier"],
                "refers_to_url": b["refers_to_url"],
                "refers_to_epoch": ref_epoch,
                "content_chars": pc.cast(b["content_bytes"], pa.int64()),
            }
        )

    return matches.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _exact_match_query(sf_dir: str, strategy: SearchStrategy):
    index, cur = _split_captures(sf_dir)
    cfg = PipelineConfig(strategy=strategy)
    m = match_shuffle(cur, index, cfg, id_cols=("doc_id", "rep"))
    return _matches_to_output(m)


def _exact_match_fused(sf_dir: str):
    """Single-shuffle variant: raw history + keep-latest upsert fused
    into the match reduce (history_is_raw=True).  Must equal the
    two-stage build_index -> match pipeline value-for-value — the oracle
    is the SAME SQL as exact_match_digest_any."""
    caps = captures_dataset(sf_dir)

    def hist_part(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["crawl"], "history"))

    def cur_part(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["crawl"], "current"))
        return t.append_column("content_bytes", pc.cast(pc.utf8_length(t["text"]), pa.int64()))

    hist = caps.map_batches(hist_part, batch_format="pyarrow", zero_copy_batch=True)
    cur = caps.map_batches(cur_part, batch_format="pyarrow", zero_copy_batch=True)
    cfg = PipelineConfig(strategy=SearchStrategy.DIGEST_ANY)
    m = match_shuffle(cur, hist, cfg, id_cols=("doc_id", "rep"), history_is_raw=True)
    return _matches_to_output(m)


# SQL building blocks -------------------------------------------------------

_IDX_SQL = """
idx AS (
  SELECT url, md5(text) AS digest, max(ts_epoch) AS ts_epoch
  FROM captures WHERE crawl = 'history'
  GROUP BY url, md5(text)
),
cur AS (SELECT * FROM captures WHERE crawl = 'current')
"""

_CANON_U = canonical_sql_expr("s.url")
_CANON_C = canonical_sql_expr("c.url")

_TIER_SQL = f"""
  CASE WHEN s.url IS NULL THEN 'none'
       WHEN s.url = c.url THEN 'exact_url'
       WHEN {_CANON_U} = {_CANON_C} THEN 'canonical_url'
       ELSE 'digest' END
"""

_OUT_SQL = f"""
SELECT c.doc_id, c.rep, c.url, md5(c.text) AS digest, c.ts_epoch,
       s.url IS NOT NULL AS is_duplicate,
       {_TIER_SQL} AS match_tier,
       s.url AS refers_to_url,
       s.ts_epoch AS refers_to_epoch,
       length(c.text) AS content_chars
FROM cur c LEFT JOIN sel s ON s.digest = md5(c.text)
"""


def _sql_digest_any() -> str:
    return f"""
WITH {CAPTURES_CTE}, {_IDX_SQL},
sel AS (
  SELECT digest, url, ts_epoch,
         row_number() OVER (PARTITION BY digest ORDER BY ts_epoch, url) AS rn
  FROM idx
  QUALIFY rn = 1
)
{_OUT_SQL}
"""


def _sql_url_exact() -> str:
    return f"""
WITH {CAPTURES_CTE}, {_IDX_SQL},
sel0 AS (
  SELECT digest, url, ts_epoch,
         row_number() OVER (PARTITION BY digest, url ORDER BY ts_epoch) AS rn
  FROM idx
  QUALIFY rn = 1
),
sel AS (SELECT * FROM sel0)
SELECT c.doc_id, c.rep, c.url, md5(c.text) AS digest, c.ts_epoch,
       s.url IS NOT NULL AS is_duplicate,
       {_TIER_SQL} AS match_tier,
       s.url AS refers_to_url,
       s.ts_epoch AS refers_to_epoch,
       length(c.text) AS content_chars
FROM cur c LEFT JOIN sel s ON s.digest = md5(c.text) AND s.url = c.url
"""


def _sql_url_canonical() -> str:
    canon_idx = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE}, {_IDX_SQL},
selc AS (
  SELECT digest, url, ts_epoch, {canon_idx} AS url_canonical,
         row_number() OVER (PARTITION BY digest, {canon_idx} ORDER BY ts_epoch, url) AS rn
  FROM idx
  QUALIFY rn = 1
)
SELECT c.doc_id, c.rep, c.url, md5(c.text) AS digest, c.ts_epoch,
       s.url IS NOT NULL AS is_duplicate,
       CASE WHEN s.url IS NULL THEN 'none'
            WHEN s.url = c.url THEN 'exact_url'
            WHEN s.url_canonical = {canonical_sql_expr('c.url')} THEN 'canonical_url'
            ELSE 'digest' END AS match_tier,
       s.url AS refers_to_url,
       s.ts_epoch AS refers_to_epoch,
       length(c.text) AS content_chars
FROM cur c LEFT JOIN selc s
  ON s.digest = md5(c.text) AND s.url_canonical = {canonical_sql_expr('c.url')}
"""


def _sql_digest_url_preferred() -> str:
    canon_idx = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE}, {_IDX_SQL},
bexact AS (
  SELECT digest, url, ts_epoch,
         row_number() OVER (PARTITION BY digest, url ORDER BY ts_epoch) AS rn
  FROM idx QUALIFY rn = 1
),
bcanon AS (
  SELECT digest, url, ts_epoch, {canon_idx} AS url_canonical,
         row_number() OVER (PARTITION BY digest, {canon_idx} ORDER BY ts_epoch, url) AS rn
  FROM idx QUALIFY rn = 1
),
bany AS (
  SELECT digest, url, ts_epoch,
         row_number() OVER (PARTITION BY digest ORDER BY ts_epoch, url) AS rn
  FROM idx QUALIFY rn = 1
)
SELECT c.doc_id, c.rep, c.url, md5(c.text) AS digest, c.ts_epoch,
       coalesce(e.url, n.url, a.url) IS NOT NULL AS is_duplicate,
       CASE WHEN coalesce(e.url, n.url, a.url) IS NULL THEN 'none'
            WHEN coalesce(e.url, n.url, a.url) = c.url THEN 'exact_url'
            WHEN {canonical_sql_expr('coalesce(e.url, n.url, a.url)')} = {canonical_sql_expr('c.url')}
              THEN 'canonical_url'
            ELSE 'digest' END AS match_tier,
       coalesce(e.url, n.url, a.url) AS refers_to_url,
       coalesce(e.ts_epoch, n.ts_epoch, a.ts_epoch) AS refers_to_epoch,
       length(c.text) AS content_chars
FROM cur c
LEFT JOIN bexact e ON e.digest = md5(c.text) AND e.url = c.url
LEFT JOIN bcanon n ON n.digest = md5(c.text) AND n.url_canonical = {canonical_sql_expr('c.url')}
LEFT JOIN bany   a ON a.digest = md5(c.text)
"""


# ---------------------------------------------------------------------------
# individual queries
# ---------------------------------------------------------------------------


def q_index_build(sf_dir: str):
    """A4: keep-latest dedup index over the history crawl."""
    index, _ = _split_captures(sf_dir)

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b["url"],
                "url_canonical": b["url_canonical"],
                "digest": b["digest"],
                "date_epoch": pc.divide(pc.cast(b["date"], pa.int64()), 1_000_000),
            }
        )

    return index.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_index_build() -> str:
    return f"""
WITH {CAPTURES_CTE}
SELECT url, {canonical_sql_expr('url')} AS url_canonical, md5(text) AS digest,
       max(ts_epoch) AS date_epoch
FROM captures WHERE crawl = 'history'
GROUP BY url, {canonical_sql_expr('url')}, md5(text)
"""


def q_index_append(sf_dir: str):
    """CREATE_OR_APPEND (stages/exact.merge_index): build the index over
    the even-doc half of the history crawl, append the odd-doc half, and
    return the merged index.  With prefer='newest' the merge is
    associative, so the oracle is the ONE-SHOT full-history index SQL —
    the strongest possible pin on append semantics."""
    from deduplicator_ray.stages.exact import merge_index

    caps = captures_dataset(sf_dir)

    def half(par: int):
        def f(b: pa.Table) -> pa.Table:
            keep = pc.and_(pc.equal(b["crawl"], "history"),
                           pc.equal(pc.bit_wise_and(b["doc_id"], 1), par))
            return b.filter(keep)
        return f

    cfg = PipelineConfig()
    first = build_index(
        caps.map_batches(half(0), batch_format="pyarrow", zero_copy_batch=True),
        cfg)
    second = build_index(
        caps.map_batches(half(1), batch_format="pyarrow", zero_copy_batch=True),
        cfg)
    merged = merge_index(first, second, cfg, prefer="newest")

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b["url"],
                "url_canonical": b["url_canonical"],
                "digest": b["digest"],
                "date_epoch": pc.divide(pc.cast(b["date"], pa.int64()), 1_000_000),
            }
        )

    return merged.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_dup_report(sf_dir: str):
    """A1/A2: per-tier duplicate counts + char totals (DIGEST_ANY)."""
    from ray.data.aggregate import Count, Sum

    m = _exact_match_query(sf_dir, SearchStrategy.DIGEST_ANY)
    return m.groupby("match_tier").aggregate(
        Count(alias_name="hits"), Sum("content_chars", alias_name="chars")
    )


def _sql_dup_report() -> str:
    return f"""
WITH m AS ({_sql_digest_any()})
SELECT match_tier, count(*) AS hits, sum(content_chars)::BIGINT AS chars
FROM m GROUP BY match_tier
"""


def q_canonical_urls(sf_dir: str):
    """M5: url canonicalization over all captures."""
    caps = captures_dataset(sf_dir)

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b["doc_id"], "rep": b["rep"], "url": b["url"], "url_canonical": b["url_canonical"]}
        )

    return caps.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_canonical_urls() -> str:
    return f"""
WITH {CAPTURES_CTE}
SELECT doc_id, rep, url, {canonical_sql_expr('url')} AS url_canonical FROM captures
"""


def q_lang_counts(sf_dir: str):
    """Low-cardinality count: per-block partial combine (<= #langs rows
    leave each block) + driver-side final sum over the tiny partials —
    NO shuffle at all (Ray's native sort-based aggregate measured ~50x
    slower than this at scale; see BASELINE.md notes)."""
    import pandas as pd

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("lang", as_index=False).size().rename(columns={"size": "n_docs"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    out = parts.groupby("lang", as_index=False)["n_docs"].sum()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


def q_doc_stats_by_source(sf_dir: str):
    """Low-cardinality stats: per-block partial (count/sum/min/max per
    source) + driver-side final combine of the tiny partials."""
    import pandas as pd

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"),
            sum_chars=("n_chars", "sum"),
            min_chars=("n_chars", "min"),
            max_chars=("n_chars", "max"),
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        sum_chars=("sum_chars", "sum"),
        min_chars=("min_chars", "min"),
        max_chars=("max_chars", "max"),
    )
    for c in ["n_docs", "sum_chars", "min_chars", "max_chars"]:
        out[c] = out[c].astype("int64")
    return out


def q_top_longest(sf_dir: str):
    """Top-10 by n_chars WITHOUT a global sort: per-block local top-10
    (the only rows that can appear in the answer) + driver merge of
    10 x n_blocks candidates — same shape as cosine_topk's prune."""
    import pandas as pd

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(10)

    parts = ds.map_batches(local_topk, batch_format="pandas", batch_size=65536).to_pandas()
    return (
        parts.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windows per user over the events stream.

    High-cardinality aggregate ((user, window) keys grow with the data):
    per-batch partial combine shrinks the shuffle to distinct keys per
    batch, then ONE hash-bucket shuffle on user_id + a vectorized
    per-bucket final reduce — the repo's hash_bucket pattern instead of
    Ray's sort-based Aggregate."""
    import pandas as pd

    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    def partial(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch, 3600), 3600)
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_pandas(),
                "window_epoch": win.to_pandas(),
                "event_id": b["event_id"].to_pandas(),
            }
        )
        g = df.groupby(["user_id", "window_epoch"], as_index=False).agg(
            n_events=("event_id", "size"),
            first_event=("event_id", "min"),
            last_event=("event_id", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536, zero_copy_batch=True)
    ds = hash_bucket(ds, "user_id", 32)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        out = g.groupby(["user_id", "window_epoch"], as_index=False).agg(
            n_events=("n_events", "sum"),
            first_event=("first_event", "min"),
            last_event=("last_event", "max"),
        )
        return out.astype("int64")

    return ds.groupby("_part").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# capture-timeline compression + crawl-scope rules
# ---------------------------------------------------------------------------


def q_timeline_dedup(sf_dir: str):
    """Web-archive storage dedup: one stored version per run of identical
    digests on each canonical url's capture timeline, with the count of
    unchanged revisits it absorbs (stages/timeline.py)."""
    from deduplicator_ray.stages.timeline import timeline_dedup

    return timeline_dedup(captures_dataset(sf_dir))


def _sql_timeline_dedup() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT {canon} AS url_canonical, ts_epoch, md5(text) AS digest
      FROM captures),
seq AS (SELECT url_canonical, ts_epoch, digest,
               lag(digest) OVER (PARTITION BY url_canonical
                                 ORDER BY ts_epoch, digest) AS prev
        FROM c),
grp AS (SELECT url_canonical, ts_epoch, digest,
               sum(CASE WHEN prev IS NULL OR prev <> digest
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY url_canonical
                       ORDER BY ts_epoch, digest
                       ROWS UNBOUNDED PRECEDING) AS g
        FROM seq)
SELECT url_canonical, min(ts_epoch)::BIGINT AS ts_epoch,
       min(digest) AS digest, (count(*) - 1)::BIGINT AS n_skipped
FROM grp GROUP BY url_canonical, g
"""


# Ordered decide rules (last match wins, default reject): accept the
# site1* host family and the mirror host, carve out empty pages, then
# re-admit site3's /p/ pages.  Exercises every decided_by outcome
# (-1, each rule index) and both rule kinds on the sf corpora.
_SCOPE_RULES = [
    ("accept", "prefix", "site1"),
    ("accept", "prefix", "mirror.example/"),
    ("reject", "regex", "/empty"),
    ("accept", "prefix", "site3.example/p/"),
]


def q_scope_filter(sf_dir: str):
    """Heritrix-style DecideRuleSequence over the captures corpus
    (stages/scope.py): map-only, every capture annotated with the
    accept/reject decision and the decisive rule index."""
    from deduplicator_ray.stages.scope import scope_annotate

    return scope_annotate(captures_dataset(sf_dir), _SCOPE_RULES,
                          keep_cols=("doc_id", "rep"))


def _sql_scope_filter() -> str:
    from deduplicator_ray.stages.scope import scope_sql_exprs

    accepted, decided = scope_sql_exprs(_SCOPE_RULES, "url_canonical")
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT doc_id, rep, {canon} AS url_canonical FROM captures)
SELECT doc_id, rep, url_canonical,
       {accepted} AS accepted, CAST({decided} AS BIGINT) AS decided_by
FROM c
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


_RETAIN_N = 2


def q_keep_n_versions(sf_dir: str):
    """Archive retention policy: keep the 2 most recent captures per
    canonical url (stages/timeline.keep_n_versions) with a 1-based
    newest-first version rank — the storage-budget counterpart of
    timeline_dedup's content-run compression."""
    from deduplicator_ray.stages.timeline import keep_n_versions

    return keep_n_versions(captures_dataset(sf_dir), _RETAIN_N)


def _sql_keep_n_versions() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT {canon} AS url_canonical, ts_epoch, md5(text) AS digest
      FROM captures),
r AS (SELECT url_canonical, ts_epoch, digest,
             row_number() OVER (PARTITION BY url_canonical
                                ORDER BY ts_epoch DESC, digest)
               AS version_rank
      FROM c)
SELECT url_canonical, ts_epoch::BIGINT AS ts_epoch, digest,
       version_rank::BIGINT AS version_rank
FROM r WHERE version_rank <= {_RETAIN_N}
"""


_RETAIN_CURVE_MAX = 8


def q_retention_curve(sf_dir: str):
    """Retention-policy tuning curve: for each cap N in 1..8, the
    captures a keep-newest-N policy would drop and the pages it would
    touch — the storage-vs-history trade-off read an archive operator
    takes before fixing N (companion of ``keep_n_versions``; shape of
    ``jaccard_curve``).

    Distribution: within-batch per-url partial counts, ONE url-keyed
    hash-bucket shuffle to exact per-page capture counts, then a
    count-histogram fold (<= max timeline length rows) on the driver —
    the curve is pure arithmetic over that tiny histogram."""
    import numpy as np
    import pandas as pd

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pa.table({"u": b["url_canonical"]}).to_pandas()
        return df.groupby("u", as_index=False).size().rename(
            columns={"size": "n"})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", as_index=False)["n"].sum()
        h = g.groupby("n", as_index=False).size().rename(
            columns={"size": "n_pages"})
        return h

    hist = (hash_bucket(
        caps.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True), "u", auto_partitions())
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas().groupby("n", as_index=False)["n_pages"].sum())
    c = hist["n"].to_numpy(np.int64)
    p = hist["n_pages"].to_numpy(np.int64)
    total = int((c * p).sum())
    rows = []
    for N in range(1, _RETAIN_CURVE_MAX + 1):
        over = c > N
        dropped = int(((c[over] - N) * p[over]).sum())
        rows.append((N, total - dropped, dropped, int(p[over].sum())))
    return pd.DataFrame(rows, columns=["cap_n", "n_kept", "n_dropped",
                                       "pages_affected"]).astype("int64")


def _sql_retention_curve() -> str:
    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
pc_ AS (SELECT {canon} AS u, count(*)::BIGINT AS c
        FROM captures GROUP BY 1),
ns AS (SELECT unnest(range(1, {_RETAIN_CURVE_MAX + 1})) AS cap_n)
SELECT ns.cap_n::BIGINT AS cap_n,
       sum(least(pc_.c, ns.cap_n))::BIGINT AS n_kept,
       sum(greatest(pc_.c - ns.cap_n, 0))::BIGINT AS n_dropped,
       sum(CASE WHEN pc_.c > ns.cap_n THEN 1 ELSE 0 END)::BIGINT
         AS pages_affected
FROM ns CROSS JOIN pc_ GROUP BY 1
"""


def q_revisit_schedule(sf_dir: str):
    """Adaptive revisit scheduling per page (stages/timeline.
    revisit_schedule; the batch analog of Heritrix's adaptive-revisit
    frontier): digest-transition count + observed mean change interval
    -> clamped suggested fetch interval — the crawl-planning read the
    reference's duplicate/novel decisions feed in production."""
    from deduplicator_ray.stages.timeline import revisit_schedule

    return revisit_schedule(captures_dataset(sf_dir))


def _sql_revisit_schedule() -> str:
    from deduplicator_ray.stages.timeline import (_REVISIT_MAX_S,
                                                  _REVISIT_MIN_S)

    canon = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT {canon} AS url_canonical, ts_epoch, md5(text) AS digest
      FROM captures),
seq AS (SELECT url_canonical, ts_epoch, digest,
               lag(digest) OVER (PARTITION BY url_canonical
                                 ORDER BY ts_epoch, digest) AS prev
        FROM c),
agg AS (SELECT url_canonical,
               count(*)::BIGINT AS n_captures,
               sum(CASE WHEN prev IS NOT NULL AND prev <> digest
                        THEN 1 ELSE 0 END)::BIGINT AS n_changes,
               (max(ts_epoch) - min(ts_epoch))::BIGINT AS span_s
        FROM seq GROUP BY 1)
SELECT url_canonical, n_captures, n_changes, span_s,
       CASE WHEN n_changes = 0 THEN {_REVISIT_MAX_S}
            ELSE least({_REVISIT_MAX_S},
                       greatest({_REVISIT_MIN_S}, span_s // n_changes))
       END::BIGINT AS suggested_interval_s
FROM agg
"""


def registry():
    """name -> (callable(sf_dir) -> Dataset, oracle_sql | None)."""
    from deduplicator_ray.pipelines.queries_delta import registry_delta
    from deduplicator_ray.pipelines.queries_ext import registry_ext
    from deduplicator_ray.pipelines.queries_graph import registry_graph
    from deduplicator_ray.pipelines.queries_rel import registry_rel
    from deduplicator_ray.pipelines.queries_curate import registry_curate
    from deduplicator_ray.pipelines.queries_sim import registry_sim

    base = {
        "exact_match_digest_any": (
            lambda sf: _exact_match_query(sf, SearchStrategy.DIGEST_ANY),
            _sql_digest_any(),
        ),
        "exact_match_url_exact": (
            lambda sf: _exact_match_query(sf, SearchStrategy.URL_EXACT),
            _sql_url_exact(),
        ),
        "exact_match_url_canonical": (
            lambda sf: _exact_match_query(sf, SearchStrategy.URL_CANONICAL),
            _sql_url_canonical(),
        ),
        "exact_match_digest_url_preferred": (
            lambda sf: _exact_match_query(sf, SearchStrategy.DIGEST_URL_PREFERRED),
            _sql_digest_url_preferred(),
        ),
        "exact_match_fused": (_exact_match_fused, _sql_digest_any()),
        "index_build": (q_index_build, _sql_index_build()),
        "index_append": (q_index_append, _sql_index_build()),
        "dup_report": (q_dup_report, _sql_dup_report()),
        "canonical_urls": (q_canonical_urls, _sql_canonical_urls()),
        "timeline_dedup": (q_timeline_dedup, _sql_timeline_dedup()),
        "keep_n_versions": (q_keep_n_versions, _sql_keep_n_versions()),
        "retention_curve": (q_retention_curve, _sql_retention_curve()),
        "revisit_schedule": (q_revisit_schedule, _sql_revisit_schedule()),
        "scope_filter": (q_scope_filter, _sql_scope_filter()),
        "lang_counts": (
            q_lang_counts,
            "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        ),
        "doc_stats_by_source": (
            q_doc_stats_by_source,
            "SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars, "
            "min(n_chars) AS min_chars, max(n_chars) AS max_chars "
            "FROM documents GROUP BY source",
        ),
        "top_longest": (
            q_top_longest,
            "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10",
        ),
        "events_window": (
            q_events_window,
            "SELECT user_id, ((epoch_ms(ts) // 1000) // 3600) * 3600 AS window_epoch, "
            "count(*) AS n_events, min(event_id) AS first_event, max(event_id) AS last_event "
            "FROM events GROUP BY 1, 2",
        ),
    }
    base.update(registry_ext())
    base.update(registry_rel())
    base.update(registry_graph())
    base.update(registry_delta())
    base.update(registry_sim())
    base.update(registry_curate())
    return base
