"""Link-graph queries over the planted linked-pages corpus.

Ray side: real html bytes are generated per document
(sources/corpus.py:linked_pages_dataset) and the anchors are PARSED back
out with Arrow string kernels (stages/graph.py:extract_links).  Oracle
side: LINKED_PAGES_CTE recomputes the planted link structure
arithmetically — so the comparison genuinely verifies the extraction
kernel against ground truth, not parser-vs-parser.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from deduplicator_ray.sources.corpus import LINKED_PAGES_CTE, N_HOSTS
from deduplicator_ray.stages.graph import (
    HOST_PAT,
    assortativity,
    edge_aggregate,
    extract_links,
    mirror_hosts,
    pagerank,
)


def _links(sf_dir: str, *, with_anchor: bool = False):
    from deduplicator_ray.sources.corpus import linked_pages_dataset

    return extract_links(linked_pages_dataset(sf_dir),
                         with_anchor=with_anchor)


_UND_CTE = """
und AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS u,
         greatest(src_host, dst_host) AS v
  FROM links WHERE src_host <> dst_host)"""


def q_link_graph(sf_dir: str):
    """Host-level edge list with multiplicities: parse every href out of
    the html corpus, RE2 host extraction both ends, partial-combine +
    one hash-bucket shuffle (stages/graph.py:edge_aggregate)."""
    edges = edge_aggregate(_links(sf_dir))
    return edges.select_columns(["src_host", "dst_host", "n_links"])


_SQL_LINK_GRAPH = f"""
WITH {LINKED_PAGES_CTE}
SELECT src_host, dst_host, count(*)::BIGINT AS n_links
FROM links GROUP BY 1, 2
"""


_PR_ITERS, _PR_DAMP, _PR_SCALE = 5, 85, 10 ** 9


def q_pagerank_hosts(sf_dir: str):
    """Integer fixed-point PageRank over the host graph
    (stages/graph.py:pagerank): {iters} iterations, damping 0.85, rank
    mass in 1e-9 units — bit-exact vs the unrolled-CTE oracle because
    every operation is int64 with floor division (float PR sums are
    order-dependent and can't be value-compared across engines)."""
    edges = edge_aggregate(_links(sf_dir))
    return pagerank(edges, iters=_PR_ITERS, damping_pct=_PR_DAMP,
                    scale=_PR_SCALE)


def _sql_pagerank(r0_expr: str | None = None,
                  base_expr: str | None = None) -> str:
    """The {_PR_ITERS} integer PageRank rounds written out as chained
    CTEs (the same unrolled-iteration idiom as the kmeans oracle).
    TrustRank is the same recursion with seed-concentrated r0/teleport
    vectors — pass ``r0_expr`` (over r0's ``host``) and ``base_expr``
    (over the iteration's ``n.host``) to express it as that delta."""
    base = ((100 - _PR_DAMP) * _PR_SCALE) // 100
    r0_expr = r0_expr or f"CAST({_PR_SCALE} AS BIGINT)"
    base_expr = base_expr or str(base)
    sql = f"""
WITH {LINKED_PAGES_CTE},
eagg AS (SELECT src_host, dst_host, count(*)::BIGINT AS w
         FROM links GROUP BY 1, 2),
nodes AS (SELECT DISTINCT host FROM
          (SELECT src_host AS host FROM eagg
           UNION ALL SELECT dst_host FROM eagg)),
outd AS (SELECT src_host, sum(w)::BIGINT AS od FROM eagg GROUP BY 1),
r0 AS (SELECT host, {r0_expr} AS r FROM nodes)"""
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        sql += f""",
s{i} AS (SELECT e.dst_host AS host,
                sum((r.r // o.od) * e.w)::BIGINT AS s
         FROM eagg e
         JOIN {prev} r ON e.src_host = r.host
         JOIN outd o ON e.src_host = o.src_host
         GROUP BY 1),
r{i} AS (SELECT n.host,
                ({base_expr} + ({_PR_DAMP} * COALESCE(s.s, 0)) // 100)::BIGINT AS r
         FROM nodes n LEFT JOIN s{i} s ON n.host = s.host)"""
        prev = f"r{i}"
    sql += f"""
SELECT host, r AS rank FROM {prev}"""
    return sql


_TRUST_SEEDS = ["www.site0.example", "www.site7.example"]


def q_trustrank_hosts(sf_dir: str):
    """Integer TrustRank (Gyongyi et al. 2004): PageRank with teleport
    and initial mass restricted to a trusted seed set
    (stages/graph.py:pagerank seeds=...) — trust flows outward along
    links; hosts unreachable from the seeds score 0."""
    edges = edge_aggregate(_links(sf_dir))
    return pagerank(edges, iters=_PR_ITERS, damping_pct=_PR_DAMP,
                    scale=_PR_SCALE, seeds=_TRUST_SEEDS)


def _sql_trustrank() -> str:
    """The pagerank oracle with seed-concentrated r0/base vectors."""
    base = ((100 - _PR_DAMP) * _PR_SCALE) // 100
    seeds = ", ".join(f"'{s}'" for s in _TRUST_SEEDS)
    return _sql_pagerank(
        r0_expr=(f"CASE WHEN host IN ({seeds}) "
                 f"THEN CAST({_PR_SCALE} AS BIGINT) "
                 f"ELSE CAST(0 AS BIGINT) END"),
        base_expr=f"CASE WHEN n.host IN ({seeds}) THEN {base} ELSE 0 END")


_BUDGET_TOTAL = 10_000


def q_crawl_budget(sf_dir: str):
    """Crawl-budget apportionment: split {B} fetch slots across hosts
    proportionally to integer PageRank via Hamilton's largest-remainder
    method (floor quotas, remainders ranked desc with host-asc
    tie-break) — the crawl-scheduling action host authority exists for
    (OPIC, Abiteboul et al. 2003, motivates rank-proportional budgets).
    Integer-exact end to end: sum(budget) == {B} always."""
    import numpy as np

    edges = edge_aggregate(_links(sf_dir))
    pr = pagerank(edges, iters=_PR_ITERS, damping_pct=_PR_DAMP,
                  scale=_PR_SCALE).to_pandas()
    # rank table is n_hosts-bounded by the pagerank contract; the
    # apportionment is a driver-side integer pass over it
    rank = pr["rank"].to_numpy(dtype=np.int64)
    tot = int(rank.sum())
    fl = (int(_BUDGET_TOTAL) * rank) // tot
    rem = (int(_BUDGET_TOTAL) * rank) % tot
    left = int(_BUDGET_TOTAL) - int(fl.sum())
    order = np.lexsort((pr["host"].to_numpy(dtype=object), -rem))
    bonus = np.zeros(len(pr), dtype=np.int64)
    bonus[order[:left]] = 1
    out = pr.assign(budget=(fl + bonus).astype("int64"))
    return pa.Table.from_pandas(out[["host", "rank", "budget"]],
                                preserve_index=False)


def _sql_crawl_budget() -> str:
    B = _BUDGET_TOTAL
    return f"""
WITH pr AS ({_sql_pagerank()}),
t AS (SELECT sum(rank)::BIGINT AS tot FROM pr),
q AS (SELECT host, rank,
             ({B} * rank) // t.tot AS fl,
             ({B} * rank) % t.tot AS rem
      FROM pr, t),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host ASC) AS rn
      FROM q),
s AS (SELECT sum(fl)::BIGINT AS fsum FROM q)
SELECT r.host, r.rank,
       (r.fl + CASE WHEN r.rn <= {B} - s.fsum THEN 1 ELSE 0 END)::BIGINT
         AS budget
FROM r, s
"""


def q_anchor_stats(sf_dir: str):
    """Inbound-link profile per destination host: total inlinks,
    distinct landing pages, distinct anchor texts — anchors parsed from
    the html (the `">text</a>` slice kernel), aggregated with the same
    partial + hash-bucket shape as edge_aggregate."""
    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    links = _links(sf_dir, with_anchor=True)

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table({
            "dst_host": b["dst_host"], "dst_url": b["dst_url"],
            "anchor": b["anchor"],
        }).to_pandas()
        g = (df.groupby(["dst_host", "dst_url", "anchor"], as_index=False)
               .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = links.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst_host", as_index=False).agg(
            n_inlinks=("n", "sum"),
            n_pages=("dst_url", "nunique"),
            n_anchors=("anchor", "nunique"),
        )
        for c in ("n_inlinks", "n_pages", "n_anchors"):
            g[c] = g[c].astype("int64")
        return g

    # dst_host is the bucket key, so each host's (url, anchor) universe
    # lands in ONE bucket and nunique is exact.
    return (hash_bucket(parts, "dst_host", auto_partitions())
            .groupby("_part").map_groups(final, batch_format="pandas"))


_SQL_ANCHOR_STATS = f"""
WITH {LINKED_PAGES_CTE}
SELECT dst_host,
       count(*)::BIGINT AS n_inlinks,
       count(DISTINCT dst_url)::BIGINT AS n_pages,
       count(DISTINCT anchor)::BIGINT AS n_anchors
FROM links GROUP BY 1
"""


_MIRROR_TAU, _MIRROR_FANIN = 0.85, 10_000


def q_mirror_hosts(sf_dir: str):
    """Mirror/alias detection: host pairs whose integer outlink-count
    vectors have cosine >= {tau} (stages/graph.py:mirror_hosts — pair
    generation per shared destination + one hash-bucket dot-sum, exact
    int64 dots/norms, the identical float normalization expression on
    both sides)."""
    edges = edge_aggregate(_links(sf_dir))
    return mirror_hosts(edges, threshold=_MIRROR_TAU,
                        max_fanin=_MIRROR_FANIN)


_SQL_MIRROR_HOSTS = f"""
WITH {LINKED_PAGES_CTE},
eagg AS (SELECT src_host, dst_host, count(*)::BIGINT AS w
         FROM links GROUP BY 1, 2),
q AS (SELECT src_host, sum(w * w)::BIGINT AS q FROM eagg GROUP BY 1),
fan AS (SELECT dst_host FROM eagg GROUP BY 1
        HAVING count(*) <= {_MIRROR_FANIN}),
dots AS (SELECT e1.src_host AS host_a, e2.src_host AS host_b,
                sum(e1.w * e2.w)::BIGINT AS dot
         FROM eagg e1
         JOIN eagg e2 ON e1.dst_host = e2.dst_host
                     AND e1.src_host < e2.src_host
         JOIN fan f ON e1.dst_host = f.dst_host
         GROUP BY 1, 2)
SELECT d.host_a, d.host_b,
       d.dot / (sqrt(qa.q) * sqrt(qb.q)) AS cosine
FROM dots d JOIN q qa ON d.host_a = qa.src_host
            JOIN q qb ON d.host_b = qb.src_host
WHERE d.dot / (sqrt(qa.q) * sqrt(qb.q)) >= {_MIRROR_TAU}
"""


def q_html_extract_text(sf_dir: str):
    """The north-star per-row invariant surfaced through the driver
    gate: functions/textextract.py:extract_text over real html bytes,
    value-checked against an arithmetic reconstruction of each page's
    visible text (title + paragraph + anchors in document order).  Any
    drift in tag stripping, entity handling, or whitespace collapse
    shows up as a hash mismatch."""
    from deduplicator_ray.functions.textextract import extract_text_many
    from deduplicator_ray.sources.corpus import linked_pages_dataset

    pages = linked_pages_dataset(sf_dir)

    def kern(b: pa.Table) -> pa.Table:
        texts = extract_text_many(b["html"].to_pylist())
        return pa.table({
            "doc_id": b["doc_id"],
            "text": pa.array(texts, type=pa.string()),
        })

    return pages.map_batches(kern, batch_format="pyarrow",
                             zero_copy_batch=True)


_SQL_HTML_EXTRACT = f"""
WITH {LINKED_PAGES_CTE}
SELECT p.doc_id,
       'p' || p.doc_id || ' page ' || p.doc_id || ' '
         || string_agg('go ' || l.dst_doc, ' ' ORDER BY l.j) AS text
FROM pages p JOIN linkdst l USING (doc_id)
GROUP BY p.doc_id
"""


_CM_FANIN, _CM_MIN_SHARED = 10, 2


def q_content_mirrors(sf_dir: str):
    """Content-mirror detection over the captures corpus: host pairs
    serving >= {min_shared} identical content digests
    (stages/graph.py:co_occurrence_pairs with key=digest, item=host).
    max_fanin={fanin} excludes hub digests (the soft-404/empty page
    every host serves) from pairing — contract, not approximation."""
    import pyarrow.compute as pc

    from deduplicator_ray.sources.corpus import captures_dataset
    from deduplicator_ray.stages.graph import co_occurrence_pairs

    caps = captures_dataset(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], HOST_PAT)
        return pa.table({
            "digest": b["digest"],
            "host": pc.fill_null(pc.struct_field(m, "host"), ""),
        })

    ch = caps.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
    return co_occurrence_pairs(ch, key_col="digest", item_col="host",
                               max_fanin=_CM_FANIN,
                               min_shared=_CM_MIN_SHARED)


def _sql_content_mirrors() -> str:
    from deduplicator_ray.sources.corpus import CAPTURES_CTE

    return f"""
WITH {CAPTURES_CTE},
ci AS (SELECT DISTINCT md5(text) AS k,
              regexp_extract(url, '{HOST_PAT}', 1) AS i FROM captures),
fan AS (SELECT k FROM ci GROUP BY 1 HAVING count(*) <= {_CM_FANIN})
SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n_shared
FROM ci a JOIN ci b ON a.k = b.k AND a.i < b.i
JOIN fan f ON a.k = f.k
GROUP BY 1, 2 HAVING count(*) >= {_CM_MIN_SHARED}
"""


def q_cocitation_hosts(sf_dir: str):
    """Co-citation: destination-host pairs linked from >= 2 of the same
    pages (co_occurrence_pairs with key=source page, item=dst host)."""
    from deduplicator_ray.stages.graph import co_occurrence_pairs

    links = _links(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"page": b["src_host"], "dst": b["dst_host"]})

    # key = the source PAGE would be doc-level; at host level the
    # src_host key gives "hosts co-linked by the same source host"
    return co_occurrence_pairs(
        links.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True),
        key_col="page", item_col="dst", min_shared=2)


_SQL_COCITATION = f"""
WITH {LINKED_PAGES_CTE},
ci AS (SELECT DISTINCT src_host AS k, dst_host AS i FROM links)
SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n_shared
FROM ci a JOIN ci b ON a.k = b.k AND a.i < b.i
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_coupled_hosts(sf_dir: str):
    """Bibliographic coupling (Kessler 1963) — the dual of co-citation:
    source-host pairs whose outlink sets share >= 2 destination hosts
    (co_occurrence_pairs with key=dst host, item=src host)."""
    from deduplicator_ray.stages.graph import co_occurrence_pairs

    links = _links(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["dst_host"], "src": b["src_host"]})

    return co_occurrence_pairs(
        links.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True),
        key_col="dst", item_col="src", min_shared=2,
        max_fanin=_COUPLING_FANIN)


# the dst key of coupling is in-degree-skewed (a hub destination is
# linked by everyone), so the engine's max_fanin exclusion MUST be
# mirrored here — without it the oracle pairs the hub's whole
# in-neighborhood while the engine skips it
_COUPLING_FANIN = 10_000

_SQL_COUPLING = f"""
WITH {LINKED_PAGES_CTE},
ci AS MATERIALIZED (SELECT DISTINCT dst_host AS k, src_host AS i FROM links),
ck AS (SELECT k FROM ci GROUP BY k HAVING count(*) <= {_COUPLING_FANIN})
SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n_shared
FROM ci a JOIN ci b ON a.k = b.k AND a.i < b.i
WHERE a.k IN (SELECT k FROM ck)
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_host_reciprocity(sf_dir: str):
    """Per-host link reciprocity in integer ppm
    (stages/graph.py:reciprocity): how much of each host's distinct
    out-neighborhood links back."""
    from deduplicator_ray.stages.graph import reciprocity

    return reciprocity(_links(sf_dir))


_SQL_RECIPROCITY = f"""
WITH {LINKED_PAGES_CTE},
de AS MATERIALIZED (
  SELECT DISTINCT src_host AS s, dst_host AS d FROM links
  WHERE src_host <> dst_host)
SELECT e.s AS host,
       count(*)::BIGINT AS n_out,
       count(r.s)::BIGINT AS n_recip,
       ((count(r.s) * 1000000) // count(*))::BIGINT AS recip_ppm
FROM de e LEFT JOIN de r ON r.s = e.d AND r.d = e.s
GROUP BY e.s
"""


def q_degree_census(sf_dir: str):
    """Log2-bucketed in/out degree histogram of the host graph
    (stages/graph.py:degree_census) — the power-law shape check; exact
    integer buckets on both engines (bit_length vs length(bin()))."""
    from deduplicator_ray.stages.graph import degree_census

    return degree_census(_links(sf_dir))


_SQL_DEGREE_CENSUS = f"""
WITH {LINKED_PAGES_CTE},
de AS MATERIALIZED (
  SELECT DISTINCT src_host AS s, dst_host AS d FROM links
  WHERE src_host <> dst_host),
dg AS (
  SELECT 'out' AS direction, s AS host, count(*)::BIGINT AS deg
  FROM de GROUP BY 2
  UNION ALL
  SELECT 'in', d, count(*)::BIGINT FROM de GROUP BY 2)
SELECT direction, CAST(length(bin(deg)) - 1 AS BIGINT) AS log2_bucket,
       count(*)::BIGINT AS n_hosts
FROM dg GROUP BY 1, 2
"""


def q_wat_link_graph(sf_dir: str):
    """The link graph built from a WAT metadata file instead of html
    parsing (sources/wat.py): synthesize a deterministic WAT carrying
    the SAME planted outlinks as the html corpus, read it back through
    the WAT source, host-extract both ends, edge_aggregate — the oracle
    is the identical arithmetic CTE as ``link_graph``, so the two
    sources are proven interchangeable edge-for-edge."""
    import datetime as _dt
    import hashlib as _hl
    import os as _os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from deduplicator_ray.sources.wat import read_wat, write_wat
    from deduplicator_ray.stages.graph import _host_of

    ids = (pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
           ["doc_id"].to_pylist())
    n = len(ids)
    records = []
    for i in sorted(ids):
        links = []
        for j in range(1 + (i % 4)):
            t = (i * 7 + 11 * (j + 1) + 3) % n
            links.append(f"https://www.site{t % N_HOSTS}.example/p/{t}")
        iso = _dt.datetime.fromtimestamp(
            1_700_000_000 + i, _dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        records.append({
            "url": f"https://www.site{i % N_HOSTS}.example/p/{i}",
            "date": iso, "links": links})
    # a skipped record type + a malformed envelope prove the filters
    records.append({"type": "request", "url": "https://www.site0.example/x",
                    "date": "2023-11-14T22:13:20Z", "links": ["https://y/"]})
    records.append({"url": "https://www.site0.example/bad",
                    "date": "2023-11-14T22:13:20Z",
                    "raw_body": b"{not json"})
    out_dir = "/tmp/graft_wat"
    _os.makedirs(out_dir, exist_ok=True)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = write_wat(f"{out_dir}/roundtrip_{tag}.warc.wat.gz", records)

    def hosts(b: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": _host_of(b["url"].combine_chunks()),
            "dst_host": _host_of(b["dst_url"].combine_chunks()),
        })

    links = read_wat(path).map_batches(hosts, batch_format="pyarrow",
                                       zero_copy_batch=True)
    return edge_aggregate(links).select_columns(
        ["src_host", "dst_host", "n_links"])


def q_orphan_pages(sf_dir: str):
    """Per-site orphan census (stages/graph.py:orphan_pages) —
    frontier_gap's dual: captured pages nothing links to (canonical-url
    keyed), the archive's discoverability blind spots."""
    from deduplicator_ray.sources.corpus import linked_pages_dataset
    from deduplicator_ray.stages.graph import orphan_pages

    captured = linked_pages_dataset(sf_dir).select_columns(["url"])
    return orphan_pages(_links(sf_dir), captured)


def _sql_orphan_pages() -> str:
    from deduplicator_ray.functions.canonical import canonical_sql_expr

    c_dst = canonical_sql_expr("dst_url")
    c_url = canonical_sql_expr("url")
    return f"""
WITH {LINKED_PAGES_CTE},
lk AS (SELECT DISTINCT {c_dst} AS k FROM links),
cap AS (SELECT DISTINCT {c_url} AS k FROM pages),
x AS (
  SELECT regexp_extract(k, '^([^/]+)', 1) AS site,
         CASE WHEN k IN (SELECT k FROM lk) THEN 0 ELSE 1 END AS orph
  FROM cap)
SELECT site, count(*)::BIGINT AS n_pages, sum(orph)::BIGINT AS n_orphans
FROM x GROUP BY site
"""


def q_host_components(sf_dir: str):
    """Connected components of the undirected host graph
    (stages/graph.py:host_components): per-host assignment labeled by
    the component's lexicographically smallest host — reuses the
    engine's union-find / hash-min CC machinery over sorted host
    indices."""
    from deduplicator_ray.stages.graph import host_components

    return host_components(_links(sf_dir))


_SQL_HOST_COMPONENTS = f"""
WITH RECURSIVE {LINKED_PAGES_CTE},
{_UND_CTE},
sym AS (SELECT u AS a, v AS b FROM und UNION SELECT v, u FROM und),
reach(node, r) AS (
  SELECT a, b FROM sym
  UNION
  SELECT rr.node, e.b FROM reach rr JOIN sym e ON rr.r = e.a
)
SELECT node AS host, least(node, min(r)) AS component
FROM reach GROUP BY node
"""


_REACH_SEEDS = ["www.site0.example"]
_REACH_HOPS, _REACH_M = 4, 2


def q_host_reach(sf_dir: str):
    """Crawl-frontier BFS: minimum link hops from the seed host over the
    top-2-outlinks host graph (stages/graph.py:host_reach) — extraction
    and edge aggregation distributed, BFS over the host-level pruned
    graph (<= m x hosts rows by construction)."""
    from deduplicator_ray.stages.graph import host_reach

    edges = edge_aggregate(_links(sf_dir))
    return host_reach(edges, _REACH_SEEDS, max_hops=_REACH_HOPS,
                      top_m=_REACH_M)


def _sql_host_reach() -> str:
    """BFS unrolled hop-by-hop (the chained-CTE idiom the pagerank /
    kmeans oracles use): r_k = hosts first reached at hop k."""
    seed_rows = " UNION ALL ".join(
        f"SELECT '{s}' AS host" for s in _REACH_SEEDS)
    sql = f"""
WITH {LINKED_PAGES_CTE},
eagg AS (SELECT src_host, dst_host, count(*)::BIGINT AS w
         FROM links GROUP BY 1, 2),
topm AS (SELECT src_host, dst_host FROM (
           SELECT src_host, dst_host,
                  row_number() OVER (PARTITION BY src_host
                                     ORDER BY w DESC, dst_host) AS rn
           FROM eagg) WHERE rn <= {_REACH_M}),
f0 AS ({seed_rows})"""
    prev, seen = "f0", ["f0"]
    for h in range(1, _REACH_HOPS + 1):
        exclude = " UNION ALL ".join(f"SELECT host FROM {s}" for s in seen)
        sql += f""",
r{h} AS (SELECT DISTINCT t.dst_host AS host
         FROM topm t JOIN {prev} p ON t.src_host = p.host
         WHERE t.dst_host NOT IN ({exclude}))"""
        prev = f"r{h}"
        seen.append(prev)
    union = " UNION ALL ".join(
        f"SELECT host, {k} AS hops FROM {s}" for k, s in enumerate(seen))
    sql += f"""
SELECT host, CAST(hops AS BIGINT) AS hops FROM ({union})"""
    return sql


def q_frontier_gap(sf_dir: str):
    """Crawl-completeness anti-join (stages/graph.py:frontier_gap): the
    crawl 'captured' waves 0 and 1 (doc_id % 3 != 2); every outlink to a
    wave-2 page is an uncaptured frontier target."""
    import pyarrow.compute as pc

    from deduplicator_ray.sources.corpus import linked_pages_dataset
    from deduplicator_ray.stages.graph import frontier_gap

    pages = linked_pages_dataset(sf_dir)
    def captured_wave(b: pa.Table) -> pa.Table:
        # doc_id % 3 != 2 (pc.divide truncates on int64; ids non-negative)
        mod3 = pc.subtract(b["doc_id"],
                           pc.multiply(pc.divide(b["doc_id"], 3), 3))
        return b.filter(pc.not_equal(mod3, 2)).select(["url"])

    captured = pages.map_batches(captured_wave, batch_format="pyarrow",
                                 zero_copy_batch=True)
    links = extract_links(pages)
    return frontier_gap(links, captured)


def _sql_frontier_gap() -> str:
    from deduplicator_ray.functions.canonical import canonical_sql_expr

    return f"""
WITH {LINKED_PAGES_CTE},
cap AS (
  SELECT DISTINCT {canonical_sql_expr("url")} AS k
  FROM pages WHERE doc_id % 3 <> 2
),
lk AS (
  SELECT src_host, {canonical_sql_expr("dst_url")} AS k FROM links
)
SELECT src_host,
       count(*) AS n_gap_links,
       count(DISTINCT k) AS n_gap_targets
FROM lk WHERE k NOT IN (SELECT k FROM cap)
GROUP BY src_host
"""


_HITS_ITERS, _HITS_SCALE = 5, 10 ** 5


def q_hits_hosts(sf_dir: str):
    """Integer fixed-point HITS hubs/authorities over the host graph
    (stages/graph.py:hits): {iters} iterations, max-normalized in 1e-5
    units — bit-exact vs the unrolled-CTE oracle because every update is
    int64 multiply-add + floor division (the pagerank idiom; Kleinberg
    1999, "Authoritative sources in a hyperlinked environment")."""
    from deduplicator_ray.stages.graph import hits

    edges = edge_aggregate(_links(sf_dir))
    return hits(edges, iters=_HITS_ITERS, scale=_HITS_SCALE)


def _sql_hits() -> str:
    """The {_HITS_ITERS} HITS rounds unrolled as chained CTEs: each round
    is two weighted spreads (hub->auth along edges, auth->hub against
    them), each followed by an integer max-rescale.  Every iteration CTE
    is MATERIALIZED: each references its predecessor twice (value join +
    scalar max subquery), so default CTE inlining would expand the plan
    ~2^(2*iters)-fold and never finish."""
    S = _HITS_SCALE
    sql = f"""
WITH {LINKED_PAGES_CTE},
eagg AS MATERIALIZED (SELECT src_host, dst_host, count(*)::BIGINT AS w
         FROM links GROUP BY 1, 2),
nodes AS MATERIALIZED (SELECT DISTINCT host FROM
          (SELECT src_host AS host FROM eagg
           UNION ALL SELECT dst_host FROM eagg)),
h0 AS MATERIALIZED (SELECT host, CAST({S} AS BIGINT) AS v FROM nodes)"""
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        sql += f""",
ar{i} AS MATERIALIZED (SELECT e.dst_host AS host, sum(h.v * e.w)::BIGINT AS s
          FROM eagg e JOIN {prev_h} h ON e.src_host = h.host GROUP BY 1),
a{i} AS MATERIALIZED (SELECT n.host,
                ((COALESCE(r.s, 0) * {S})
                 // greatest((SELECT max(s) FROM ar{i}), 1))::BIGINT AS v
         FROM nodes n LEFT JOIN ar{i} r ON n.host = r.host),
hr{i} AS MATERIALIZED (SELECT e.src_host AS host, sum(a.v * e.w)::BIGINT AS s
          FROM eagg e JOIN a{i} a ON e.dst_host = a.host GROUP BY 1),
h{i} AS MATERIALIZED (SELECT n.host,
                ((COALESCE(r.s, 0) * {S})
                 // greatest((SELECT max(s) FROM hr{i}), 1))::BIGINT AS v
         FROM nodes n LEFT JOIN hr{i} r ON n.host = r.host)"""
        prev_h = f"h{i}"
    sql += f"""
SELECT n.host, h.v AS hub, a.v AS auth
FROM nodes n
JOIN h{_HITS_ITERS} h ON n.host = h.host
JOIN a{_HITS_ITERS} a ON n.host = a.host"""
    return sql


def q_host_triangles(sf_dir: str):
    """Per-host triangle participation counts on the undirected host
    graph (stages/graph.py:triangles) — exact, via degree-oriented
    wedge join (compact-forward; Latapy 2008), the local-clustering
    numerator for link-farm detection."""
    from deduplicator_ray.stages.graph import triangles

    # raw link rows, not edge_aggregate: triangles ignores weights and
    # compresses via _undirected_edges' own per-batch distinct, so the
    # count-aggregation shuffle would be pure waste
    return triangles(_links(sf_dir))


_SQL_TRIANGLES = f"""
WITH {LINKED_PAGES_CTE},
{_UND_CTE},
tri AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT host, count(*)::BIGINT AS n_triangles FROM (
  SELECT a AS host FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri) t(host)
GROUP BY host
"""


_KCORE_K, _KCORE_ROUNDS = 6, 6


def q_kcore_hosts(sf_dir: str):
    """Fixed-round k-core peeling (stages/graph.py:kcore): survivors of
    {rounds} degree-≥-k peels on the undirected host graph with their
    in-core degree — the dense-core / link-farm neighborhood."""
    from deduplicator_ray.stages.graph import kcore

    # raw link rows (see q_host_triangles): weights are irrelevant here
    return kcore(_links(sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _sql_kcore() -> str:
    """The peeling rounds unrolled as MATERIALIZED CTEs (each round's
    alive set is referenced by the next round's degree count twice)."""
    k = _KCORE_K
    sql = f"""
WITH {LINKED_PAGES_CTE},
{_UND_CTE},
a0 AS MATERIALIZED (SELECT DISTINCT host FROM
     (SELECT u AS host FROM und UNION ALL SELECT v FROM und))"""
    prev = "a0"
    for i in range(1, _KCORE_ROUNDS + 1):
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT host, count(*)::BIGINT AS deg FROM (
    SELECT e.u AS host FROM und e
    WHERE e.u IN (SELECT host FROM {prev})
      AND e.v IN (SELECT host FROM {prev})
    UNION ALL
    SELECT e.v FROM und e
    WHERE e.u IN (SELECT host FROM {prev})
      AND e.v IN (SELECT host FROM {prev})) t(host)
  GROUP BY host),
a{i} AS MATERIALIZED (
  SELECT a.host FROM {prev} a JOIN d{i} d ON a.host = d.host
  WHERE d.deg >= {k})"""
        prev = f"a{i}"
    # LEFT JOIN + COALESCE: a survivor whose whole neighborhood peeled
    # in the last round has in-core degree 0 but is still a survivor
    # under fixed-round semantics — the Ray paths emit it, so must we
    sql += f"""
SELECT a.host, COALESCE(d.deg, 0)::BIGINT AS core_degree
FROM {prev} a LEFT JOIN (
  SELECT host, count(*)::BIGINT AS deg FROM (
    SELECT e.u AS host FROM und e
    WHERE e.u IN (SELECT host FROM {prev})
      AND e.v IN (SELECT host FROM {prev})
    UNION ALL
    SELECT e.v FROM und e
    WHERE e.u IN (SELECT host FROM {prev})
      AND e.v IN (SELECT host FROM {prev})) t(host)
  GROUP BY host) d ON a.host = d.host"""
    return sql



def q_host_assortativity(sf_dir: str):
    """Degree assortativity of the undirected host graph
    (stages/graph.py:assortativity — Newman 2002): exact integer stub
    sums, one float division, micro output."""
    return assortativity(_links(sf_dir))


_SQL_ASSORTATIVITY = f"""
WITH {LINKED_PAGES_CTE},
{_UND_CTE},
deg AS MATERIALIZED (
  SELECT h, count(*)::BIGINT AS deg FROM (
    SELECT u AS h FROM und UNION ALL SELECT v FROM und) GROUP BY h
),
j AS (SELECT du.deg AS j, dv.deg AS k
      FROM und JOIN deg du ON und.u = du.h JOIN deg dv ON und.v = dv.h),
s AS (SELECT count(*)::HUGEINT AS m, sum(j + k)::HUGEINT AS sx,
             sum(j*j + k*k)::HUGEINT AS sjj, sum(j*k)::HUGEINT AS sjk
      FROM j)
SELECT CAST(m AS BIGINT) AS n_edges,
       CAST(CASE WHEN m = 0 OR 2*m*sjj - sx*sx = 0 THEN 0
            ELSE floor(CAST(4*m*sjk - sx*sx AS DOUBLE)
                       / CAST(2*m*sjj - sx*sx AS DOUBLE)
                       * 1000000 + 0.5)
            END AS BIGINT) AS assort_micro
FROM s
"""


_LPA_ROUNDS = 4


def q_lpa_communities(sf_dir: str):
    """Deterministic synchronous label-propagation communities over the
    undirected weighted host graph (stages/graph.py:lpa_communities):
    {rounds} simultaneous rounds, ties to the smallest label, labels =
    host names."""
    from deduplicator_ray.stages.graph import lpa_communities

    edges = edge_aggregate(_links(sf_dir))
    return lpa_communities(edges, rounds=_LPA_ROUNDS)


def _sql_lpa() -> str:
    """The {_LPA_ROUNDS} LPA rounds unrolled as MATERIALIZED chained
    CTEs (the hits/pagerank idiom): each round joins the undirected
    edge list to the previous labels, sums vote weights, and picks the
    per-node winner by (count DESC, label ASC)."""
    sql = f"""
WITH {LINKED_PAGES_CTE},
eagg AS MATERIALIZED (
  SELECT src_host, dst_host, count(*)::BIGINT AS w
  FROM links WHERE src_host <> dst_host GROUP BY 1, 2),
undl AS MATERIALIZED (
  SELECT a, b, sum(w)::BIGINT AS w FROM (
    SELECT src_host AS a, dst_host AS b, w FROM eagg
    UNION ALL
    SELECT dst_host AS a, src_host AS b, w FROM eagg)
  GROUP BY 1, 2),
l0 AS MATERIALIZED (SELECT DISTINCT a AS host, a AS lbl FROM undl)"""
    for i in range(1, _LPA_ROUNDS + 1):
        sql += f""",
v{i} AS MATERIALIZED (
  SELECT e.a AS host, l.lbl, sum(e.w)::BIGINT AS c
  FROM undl e JOIN l{i - 1} l ON e.b = l.host GROUP BY 1, 2),
l{i} AS MATERIALIZED (
  SELECT host, lbl FROM (
    SELECT host, lbl,
           row_number() OVER (PARTITION BY host
                              ORDER BY c DESC, lbl) AS rn
    FROM v{i}) WHERE rn = 1)"""
    sql += f"""
SELECT host, lbl AS community FROM l{_LPA_ROUNDS}"""
    return sql


def registry_graph():
    """name -> (callable(sf_dir), oracle_sql)."""
    return {
        "host_triangles": (q_host_triangles, _SQL_TRIANGLES),
        "coupled_hosts": (q_coupled_hosts, _SQL_COUPLING),
        "host_reciprocity": (q_host_reciprocity, _SQL_RECIPROCITY),
        "degree_census": (q_degree_census, _SQL_DEGREE_CENSUS),
        "trustrank_hosts": (q_trustrank_hosts, _sql_trustrank()),
        "host_components": (q_host_components, _SQL_HOST_COMPONENTS),
        "wat_link_graph": (q_wat_link_graph, _SQL_LINK_GRAPH),
        "orphan_pages": (q_orphan_pages, _sql_orphan_pages()),
        "crawl_budget": (q_crawl_budget, _sql_crawl_budget()),
        "host_assortativity": (q_host_assortativity, _SQL_ASSORTATIVITY),
        "kcore_hosts": (q_kcore_hosts, _sql_kcore()),
        "hits_hosts": (q_hits_hosts, _sql_hits()),
        "html_extract_text": (q_html_extract_text, _SQL_HTML_EXTRACT),
        "content_mirrors": (q_content_mirrors, _sql_content_mirrors()),
        "cocitation_hosts": (q_cocitation_hosts, _SQL_COCITATION),
        "link_graph": (q_link_graph, _SQL_LINK_GRAPH),
        "pagerank_hosts": (q_pagerank_hosts, _sql_pagerank()),
        "anchor_stats": (q_anchor_stats, _SQL_ANCHOR_STATS),
        "mirror_hosts": (q_mirror_hosts, _SQL_MIRROR_HOSTS),
        "host_reach": (q_host_reach, _sql_host_reach()),
        "lpa_communities": (q_lpa_communities, _sql_lpa()),
        "frontier_gap": (q_frontier_gap, _sql_frontier_gap()),
    }
