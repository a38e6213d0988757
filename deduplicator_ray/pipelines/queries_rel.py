"""Relational / windowed operators over the TPC-H-ish tables — range
join, grouped top-k, host stats, and a TPC-H-Q1-style aggregate — each as
a hash-bucket-partitioned Ray pipeline with a value-exact SQL oracle.

These close the "custom operators Ray Data lacks" list (range join,
windowed/grouped rank) alongside sessionization and the as-of join in
queries_ext.py, using the same two building blocks everywhere:
per-batch partial combine (shrink before any shuffle) and ONE
hash-bucket shuffle + vectorized per-bucket reduce (never per-key
Python).  All oracle-compared aggregates are integers — no float drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# R1: range join — events within [o_orderdate, o_orderdate + 7d) per order
# ---------------------------------------------------------------------------

_RANGE_WINDOW_S = 7 * 24 * 3600


def q_orders_range_join(sf_dir: str):
    """For every order: how many of the customer's events fall in the
    7 days from the order date.

    Partitioning: both sides hash-bucket on the customer key, so each
    bucket holds every event a bucket's orders can match; the per-bucket
    kernel sorts the events ONCE on a (user, ts) composite key and
    answers all orders via two vectorized ``searchsorted`` calls —
    O((E+O) log E) per bucket, no per-order Python, no row explosion."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ev_conform(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        n = b.num_rows
        return pa.table(
            {"key": b["user_id"], "tse": epoch,
             "o_orderkey": pa.nulls(n, pa.int64()),
             "side": pa.array(np.ones(n, dtype=np.int8))}
        )

    def od_conform(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["o_orderdate"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        n = b.num_rows
        return pa.table(
            {"key": b["o_custkey"], "tse": epoch,
             "o_orderkey": b["o_orderkey"],
             "side": pa.array(np.zeros(n, dtype=np.int8))}
        )

    both = ev.map_batches(ev_conform, batch_format="pyarrow", zero_copy_batch=True).union(
        od.map_batches(od_conform, batch_format="pyarrow", zero_copy_batch=True)
    )
    both = hash_bucket(both, "key", 32)

    # composite (user, ts) key: ts_epoch < 2^34 and user_id * 2^34 stays
    # far inside int64, so one sorted array answers per-user time ranges
    _SHIFT = np.int64(1) << np.int64(34)

    def ranged(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        ev_g = g[g["side"] == 1]
        od_g = g[g["side"] == 0]
        if od_g.empty:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                                 "o_custkey": pd.Series([], dtype="int64"),
                                 "order_epoch": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64")})
        ekeys = np.sort(
            ev_g["key"].to_numpy(np.int64) * _SHIFT + ev_g["tse"].to_numpy(np.int64)
        )
        ouid = od_g["key"].to_numpy(np.int64)
        otse = od_g["tse"].to_numpy(np.int64)
        lo = np.searchsorted(ekeys, ouid * _SHIFT + otse, side="left")
        hi = np.searchsorted(ekeys, ouid * _SHIFT + otse + _RANGE_WINDOW_S, side="left")
        return pd.DataFrame(
            {"o_orderkey": od_g["o_orderkey"].to_numpy(np.int64),
             "o_custkey": ouid, "order_epoch": otse,
             "n_events": (hi - lo).astype(np.int64)}
        )

    return both.groupby("_part").map_groups(ranged, batch_format="pandas")


_SQL_ORDERS_RANGE_JOIN = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) // 1000 AS tse FROM events
),
o AS (
  SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) // 1000 AS order_epoch
  FROM orders
)
SELECT o.o_orderkey, o.o_custkey, o.order_epoch,
       CAST(count(e.tse) AS BIGINT) AS n_events
FROM o LEFT JOIN e
  ON e.user_id = o.o_custkey
 AND e.tse >= o.order_epoch AND e.tse < o.order_epoch + {_RANGE_WINDOW_S}
GROUP BY o.o_orderkey, o.o_custkey, o.order_epoch
"""

# ---------------------------------------------------------------------------
# R2: grouped top-k (window rank) — top 3 longest docs per source
# ---------------------------------------------------------------------------

_GROUP_TOPK = 3


def q_grouped_topk(sf_dir: str):
    """row_number()-style rank: the top 3 docs by (n_chars desc, doc_id)
    within each source.  Per-batch partial top-3 per group (only
    3 x #groups rows leave any block), tiny driver-side final merge."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return b.groupby("source", sort=False).head(_GROUP_TOPK)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    parts = parts.sort_values(["n_chars", "doc_id"], ascending=[False, True])
    out = parts.groupby("source", sort=False).head(_GROUP_TOPK).copy()
    out["rk"] = out.groupby("source").cumcount() + 1
    return out.sort_values(["source", "rk"], ignore_index=True)[
        ["source", "doc_id", "n_chars", "rk"]
    ].astype({"rk": "int64"})


_SQL_GROUPED_TOPK = f"""
SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= {_GROUP_TOPK}
"""

# ---------------------------------------------------------------------------
# R3: host stats — RE2 host extraction over the captures corpus
# ---------------------------------------------------------------------------

# named group: pyarrow's extract_regex requires one; RE2/DuckDB treat it
# as capture group 1, so the SAME pattern string feeds both sides
_HOST_PAT = r"^https?://(?P<host>[^/]+)"


def q_host_stats(sf_dir: str):
    """Capture counts per url host (crawl-frequency profile): RE2 host
    extraction (same pattern string both sides), per-batch partial
    combine, tiny driver-side final sum."""
    from deduplicator_ray.sources.corpus import captures_dataset

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], _HOST_PAT)
        # non-matching urls: DuckDB's regexp_extract yields '' and GROUP BY
        # keeps them — mirror that instead of dropping the null group
        host = pc.fill_null(pc.struct_field(m, "host"), "")
        hist = pc.equal(b["crawl"], "history")
        df = pd.DataFrame({"host": host.to_pandas(), "is_hist": hist.to_pandas()})
        g = df.groupby("host", as_index=False).agg(
            n_captures=("is_hist", "size"), n_history=("is_hist", "sum")
        )
        g["n_history"] = g["n_history"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = caps.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("host", as_index=False).agg(
        n_captures=("n_captures", "sum"), n_history=("n_history", "sum")
    )
    out["n_current"] = (out["n_captures"] - out["n_history"]).astype("int64")
    return out.astype({"n_captures": "int64", "n_history": "int64"})


def _sql_host_stats() -> str:
    from deduplicator_ray.sources.corpus import CAPTURES_CTE

    return f"""
WITH {CAPTURES_CTE}
SELECT regexp_extract(url, '{_HOST_PAT}', 1) AS host,
       count(*) AS n_captures,
       CAST(sum(CASE WHEN crawl = 'history' THEN 1 ELSE 0 END) AS BIGINT) AS n_history,
       CAST(sum(CASE WHEN crawl = 'current' THEN 1 ELSE 0 END) AS BIGINT) AS n_current
FROM captures GROUP BY 1
"""

# ---------------------------------------------------------------------------
# R4: TPC-H-Q1-style pricing summary (integer-exact)
# ---------------------------------------------------------------------------


def q_lineitem_agg(sf_dir: str):
    """Pricing summary per (returnflag, linestatus): row counts plus
    integer-exact quantity / price-cents sums.  Per-batch partial
    combine -> <= #flag-status pairs rows per block -> driver final sum
    (the aggregate cardinality is tiny and data-independent)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"].to_pandas(),
                "l_linestatus": b["l_linestatus"].to_pandas(),
                # half-AWAY-from-zero rounding to mirror DuckDB's round()
                # (pandas .round() is banker's half-even; a value landing
                # exactly on .5 would diverge from the oracle).  TPC-H
                # quantities/prices are non-negative, so floor(x+0.5) is
                # exactly half-away-from-zero here.
                "qty": np.floor(b["l_quantity"].to_pandas() + 0.5).astype("int64"),
                "cents": np.floor(b["l_extendedprice"].to_pandas() * 100 + 0.5).astype("int64"),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n_rows=("qty", "size"), sum_qty=("qty", "sum"), sum_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536,
                           zero_copy_batch=True).to_pandas()
    out = parts.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        n_rows=("n_rows", "sum"), sum_qty=("sum_qty", "sum"), sum_cents=("sum_cents", "sum")
    )
    for c in ["n_rows", "sum_qty", "sum_cents"]:
        out[c] = out[c].astype("int64")
    return out


_SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# R5: hopping-window aggregate (overlapping windows — streaming op Ray
# Data has no native form for)
# ---------------------------------------------------------------------------

_HOP_S = 900          # 15-min hop
_HOP_WINDOW_S = 3600  # 1-h window -> every event lands in exactly 4 windows


def q_events_hopping(sf_dir: str):
    """Per-user hopping-window event counts (window 1 h, hop 15 min).

    The explode is vectorized (np.repeat over the batch, window/hop
    windows per event — a constant factor, not a join), then the same
    partial-combine + hash-bucket final reduce as the tumbling-window
    query.  Partitioning assumption: all of one user's rows share a
    bucket."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket

    k = _HOP_WINDOW_S // _HOP_S  # windows per event

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    def explode_and_combine(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        tse = epoch.to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        base = tse // _HOP_S
        offs = np.arange(k, dtype=np.int64)
        win = ((np.repeat(base, k) - np.tile(offs, len(tse))) * _HOP_S).astype(np.int64)
        df = pd.DataFrame(
            {"user_id": np.repeat(uid, k), "window_epoch": win}
        )
        g = df.groupby(["user_id", "window_epoch"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n_events"}), preserve_index=False
        )

    ds = ds.map_batches(explode_and_combine, batch_format="pyarrow", batch_size=65536,
                        zero_copy_batch=True)
    ds = hash_bucket(ds, "user_id", 32)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        out = g.groupby(["user_id", "window_epoch"], as_index=False)["n_events"].sum()
        return out.astype("int64")

    return ds.groupby("_part").map_groups(final, batch_format="pandas")


_SQL_EVENTS_HOPPING = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) // 1000 AS tse FROM events
),
x AS (
  SELECT user_id, ((tse // {_HOP_S}) - k.k) * {_HOP_S} AS window_epoch
  FROM e CROSS JOIN (SELECT unnest(range({_HOP_WINDOW_S // _HOP_S})) AS k) k
)
SELECT user_id, window_epoch, count(*) AS n_events
FROM x GROUP BY user_id, window_epoch
"""

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# R6: K-step funnel over the events stream (ordered-sequence analytics)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel_counts(sf_dir: str):
    """Greedy-earliest K-step funnel (stages/events.py:funnel_counts):
    users reaching each step strictly after their anchor time for the
    previous step; one hash-bucket shuffle on user_id, vectorized
    per-bucket kernel."""
    import ray.data as rd

    from deduplicator_ray.stages.events import funnel_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_counts(ev, _FUNNEL_STEPS)


def _sql_funnel() -> str:
    """Chained min-ts CTEs — step k anchors at the earliest qualifying
    event strictly after the step k-1 anchor (same greedy semantics)."""
    sql = """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = '{0}' GROUP BY 1)""".format(_FUNNEL_STEPS[0])
    for k in range(1, len(_FUNNEL_STEPS)):
        sql += """,
s{n} AS (SELECT e.user_id, min(e.ts) AS t
         FROM events e JOIN s{p} ON e.user_id = s{p}.user_id
                              AND e.ts > s{p}.t
         WHERE e.event_type = '{st}' GROUP BY 1)""".format(
            n=k + 1, p=k, st=_FUNNEL_STEPS[k])
    selects = [
        "SELECT {k} AS step, '{st}' AS event_type, "
        "count(*)::BIGINT AS n_users FROM s{k}".format(k=k + 1, st=st)
        for k, st in enumerate(_FUNNEL_STEPS)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(selects)



_SQL_RETENTION = """
WITH ev AS (SELECT user_id, epoch(ts)::BIGINT AS ep FROM events),
wk AS (SELECT user_id, (ep // 86400) // 7 AS wk FROM ev),
firsts AS (SELECT user_id, min(wk) AS cohort FROM wk GROUP BY 1),
act AS (SELECT DISTINCT f.cohort, w.wk - f.cohort AS "offset", w.user_id
        FROM wk w JOIN firsts f USING (user_id))
SELECT cohort, "offset", count(*)::BIGINT AS n_users
FROM act GROUP BY 1, 2
"""


def q_retention_cohorts(sf_dir: str):
    """Weekly retention matrix (stages/events.py:retention_cohorts):
    integer epoch-week cohorts, one user-id shuffle, exact distincts."""
    import ray.data as rd

    from deduplicator_ray.stages.events import retention_cohorts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return retention_cohorts(ev)



def q_host_gini(sf_dir: str):
    """Crawl-concentration census, one row: exact Gini coefficient of the
    captures-per-host distribution (n_hosts, n_captures, gini_micro) —
    the "is the crawler rathole-ing on a few hubs?" inequality read a
    crawl operator takes next to host_stats / crawl_budget.

    Exact integer Gini from GROUPED counts, no global sort: with host
    counts reduced to a frequency-of-frequencies spectrum (count value x,
    hosts-with-x), the rank-sum term of the classic formula
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) has a closed form per
    spectrum row (ranks of a tie group are a contiguous run, and equal
    values make the ordering inside the run irrelevant).  Shape: per-batch
    partial host counts -> ONE host-key shuffle -> per-bucket
    freq-of-frequencies partials -> a tiny spectrum merges on the driver,
    where Python big-ints evaluate the formula overflow-free (the SQL
    mirror uses HUGEINT).  Rounding: floor(G*1e6 + 0.5) via
    (2*num*1e6 + den) // (2*den).
    """
    from deduplicator_ray.sources.corpus import captures_dataset
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], _HOST_PAT)
        host = pc.fill_null(pc.struct_field(m, "host"), "")
        g = (pd.DataFrame({"host": host.to_pandas()})
             .groupby("host", as_index=False).size())
        return pa.table({"host": pa.array(g["host"], type=pa.string()),
                         "n": pa.array(g["size"].to_numpy(np.int64))})

    def spectrum(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "host" not in df.columns:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        per = df.groupby("host", sort=False)["n"].sum()
        x, c = np.unique(per.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"x": x, "c": c.astype("int64")})

    spec = (hash_bucket(
        caps.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True), "host", 64)
        .groupby("_part")
        .map_groups(lambda g: spectrum(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    if spec.empty or "x" not in spec.columns:
        # zero groups: Ray's to_pandas drops the schema entirely
        spec = pd.DataFrame({"x": pd.Series([], dtype="int64"),
                             "c": pd.Series([], dtype="int64")})
    spec = (spec.groupby("x", as_index=False)["c"].sum()
            .sort_values("x").reset_index(drop=True))
    n, s, gini = gini_micro_from_spectrum(spec["x"].tolist(),
                                          spec["c"].tolist())
    return pa.table({"n_hosts": pa.array([n], type=pa.int64()),
                     "n_captures": pa.array([s], type=pa.int64()),
                     "gini_micro": pa.array([gini], type=pa.int64())})


def gini_micro_from_spectrum(xs, cs) -> tuple[int, int, int]:
    """(n, total, gini_micro) from a frequency-of-frequencies spectrum
    (value x -> multiplicity c, xs ascending): closed-form rank sum per
    tie group — ranks of a tie group are the contiguous run
    C_{k-1}+1 .. C_k and equal values make in-run order irrelevant.
    Python big-ints: overflow-free at any scale."""
    n = int(sum(cs))
    if n == 0:
        return 0, 0, 0
    s = s1 = 0
    cprev = 0
    for x, c in zip(xs, cs):
        ck = cprev + c
        s1 += x * (ck * (ck + 1) - cprev * (cprev + 1)) // 2
        s += x * c
        cprev = ck
    num = 2 * s1 - (n + 1) * s
    den = n * s
    return n, s, (2 * num * 1_000_000 + den) // (2 * den)


def _sql_host_gini() -> str:
    from deduplicator_ray.sources.corpus import CAPTURES_CTE

    return f"""
WITH {CAPTURES_CTE},
hc AS (SELECT regexp_extract(url, '{_HOST_PAT}', 1) AS host,
              count(*)::BIGINT AS x
       FROM captures GROUP BY 1),
r AS (SELECT x, row_number() OVER (ORDER BY x, host) AS i FROM hc),
s AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
             sum(CAST(i AS HUGEINT) * x)::HUGEINT AS s1
      FROM r)
SELECT CAST(n AS BIGINT) AS n_hosts, CAST(sx AS BIGINT) AS n_captures,
       CAST((2 * (2*s1 - (n+1)*sx) * 1000000 + (n*sx)) // (2 * (n*sx))
            AS BIGINT) AS gini_micro
FROM s
"""



_REV_TOP_K = 25


def q_order_revenue_topk(sf_dir: str):
    """TPC-H-Q3-flavored three-table chain: top {k} orders by discounted
    revenue with their customer — customer ⋈ orders ⋈ per-order lineitem
    revenue.  Revenue is integer-exact "cent-percent" units:
    round(extendedprice*100) * round((1-discount)*100) summed per order
    (TPC-H discounts are hundredths, so both factors are exact ints and
    the oracle mirrors the same floor(x+0.5) rounding).

    Shape: lineitem collapses to per-block partial order revenues
    (combiner) -> ONE orderkey reduce; two hash-shuffle joins attach
    order/customer columns (both sides pruned at the read); a local
    top-k per block then caps what reaches the driver at k rows/block.
    Ties break on ascending o_orderkey."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.util import auto_partitions

    P = auto_partitions()
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def rev_partial(b: pa.Table) -> pa.Table:
        # pandas astype("int64") raises on NaN (a NULL price/discount),
        # matching q_lineitem_agg — numpy's astype would silently emit
        # INT64_MIN garbage instead
        cents = np.floor(b["l_extendedprice"].to_pandas() * 100 + 0.5
                         ).astype("int64").to_numpy()
        pct = np.floor((1.0 - b["l_discount"].to_pandas()) * 100 + 0.5
                       ).astype("int64").to_numpy()
        df = pd.DataFrame({"o_orderkey":
                           b["l_orderkey"].to_numpy().astype(np.int64),
                           "rev": cents * pct})
        return pa.Table.from_pandas(
            df.groupby("o_orderkey", as_index=False)["rev"].sum(),
            preserve_index=False)

    rev = (hash_bucket(
        li.map_batches(rev_partial, batch_format="pyarrow",
                       zero_copy_batch=True), "o_orderkey", P)
        .groupby("_part")
        .map_groups(lambda g: (g.drop(columns=["_part"])
                               .groupby("o_orderkey", as_index=False)
                               ["rev"].sum()),
                    batch_format="pandas")
        # barrier: the sort-shuffle must finish before the hash-join
        # aggregator actors reserve their slots, or the two all-to-all
        # operators deadlock each other on a small cpu budget
        .materialize())

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def o_side(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(b["o_orderdate"], pa.date32()), pa.int32())
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "epoch_day": pc.cast(day, pa.int64())})

    j1 = hash_join(rev, orders.map_batches(o_side, batch_format="pyarrow",
                                           zero_copy_batch=True),
                   on=("o_orderkey",), num_partitions=P,
                   out_schema={"o_orderkey": pa.int64(),
                               "rev": pa.int64(),
                               "o_custkey": pa.int64(),
                               "epoch_day": pa.int64()})
    # barrier between the two hash joins: both joins' shuffle
    # aggregator actors in ONE streaming topology deadlock each other
    # on a small cpu budget (observed at 8 cpus with real block counts)
    j1 = j1.materialize()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])

    def c_side(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["c_custkey"],
                         "c_name": b["c_name"]})

    j2 = hash_join(j1, cust.map_batches(c_side, batch_format="pyarrow",
                                        zero_copy_batch=True),
                   on=("o_custkey",), num_partitions=P,
                   out_schema={"o_orderkey": pa.int64(),
                               "rev": pa.int64(),
                               "epoch_day": pa.int64(),
                               "c_name": pa.string()})

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["rev", "o_orderkey"],
                           ascending=[False, True], kind="mergesort")
            .head(_REV_TOP_K), preserve_index=False)

    out = (j2.map_batches(local_topk, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    if out.empty:
        return pa.table({"o_orderkey": pa.array([], type=pa.int64()),
                         "c_name": pa.array([], type=pa.string()),
                         "epoch_day": pa.array([], type=pa.int64()),
                         "revenue_cp": pa.array([], type=pa.int64())})
    out = (out.sort_values(["rev", "o_orderkey"],
                           ascending=[False, True], kind="mergesort")
           .head(_REV_TOP_K).reset_index(drop=True))
    return pa.table({
        "o_orderkey": pa.array(out["o_orderkey"].to_numpy(np.int64)),
        "c_name": pa.array(out["c_name"], type=pa.string()),
        "epoch_day": pa.array(out["epoch_day"].to_numpy(np.int64)),
        "revenue_cp": pa.array(out["rev"].to_numpy(np.int64)),
    })


_SQL_ORDER_REVENUE_TOPK = f"""
WITH rev AS (
  SELECT l_orderkey AS o_orderkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)
            )::BIGINT AS revenue_cp
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey, c.c_name,
       CAST(epoch(CAST(o.o_orderdate AS DATE)) // 86400 AS BIGINT)
         AS epoch_day,
       rev.revenue_cp
FROM rev JOIN orders o USING (o_orderkey)
         JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY rev.revenue_cp DESC, o.o_orderkey LIMIT {_REV_TOP_K}
"""



def q_supplier_balance_by_region(sf_dir: str):
    """Supplier account-balance rollup per region (region ⋈ nation ⋈
    supplier) — the canonical BROADCAST-small-side join shape: the
    nation -> region map is driver-tiny, so it rides ray.put into a
    map-only pass over supplier (ZERO shuffle; contrast with
    order_revenue_topk's shuffle joins, whose both sides scale).
    Balances in integer cents with the oracle's half-away rounding."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    r_of = dict(zip(reg["r_regionkey"].to_pylist(),
                    reg["r_name"].to_pylist()))
    region_of_nation = {int(n): r_of[int(r)] for n, r in zip(
        nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist())}
    map_ref = ray.put(region_of_nation)

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_nationkey", "s_acctbal"])

    def partial(b: pa.Table, *, _m=map_ref) -> pa.Table:
        m = ray.get(_m) if isinstance(_m, ray.ObjectRef) else _m
        region = b["s_nationkey"].to_pandas().map(m)
        cents = np.floor(b["s_acctbal"].to_pandas() * 100 + 0.5
                         ).astype("int64")
        g = (pd.DataFrame({"region": region, "cents": cents})
             .groupby("region", as_index=False)
             .agg(n_suppliers=("cents", "size"),
                  balance_cents=("cents", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = sup.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    if parts.empty:
        return pa.table({"region": pa.array([], type=pa.string()),
                         "n_suppliers": pa.array([], type=pa.int64()),
                         "balance_cents": pa.array([], type=pa.int64())})
    g = parts.groupby("region", as_index=False).agg(
        n_suppliers=("n_suppliers", "sum"),
        balance_cents=("balance_cents", "sum"))
    g["n_suppliers"] = g["n_suppliers"].astype("int64")
    g["balance_cents"] = g["balance_cents"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


_SQL_SUPPLIER_BALANCE_BY_REGION = """
SELECT r.r_name AS region, count(*)::BIGINT AS n_suppliers,
       sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT))::BIGINT
         AS balance_cents
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""


def q_brand_stats(sf_dir: str):
    """Part-catalog rollup per brand: part count, retail-price cents
    sum, min/max size — per-batch partial combine (<= |brands| rows per
    block), tiny driver merge; the last input table (part) exercised."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_brand", "p_retailprice", "p_size"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.floor(b["p_retailprice"].to_pandas() * 100 + 0.5
                         ).astype("int64")
        g = (pd.DataFrame({"p_brand": b["p_brand"].to_pandas(),
                           "cents": cents,
                           "size": b["p_size"].to_pandas()})
             .groupby("p_brand", as_index=False)
             .agg(n_parts=("cents", "size"),
                  price_cents=("cents", "sum"),
                  min_size=("size", "min"), max_size=("size", "max")))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if parts.empty:
        return pa.table({"p_brand": pa.array([], type=pa.string()),
                         "n_parts": pa.array([], type=pa.int64()),
                         "price_cents": pa.array([], type=pa.int64()),
                         "min_size": pa.array([], type=pa.int64()),
                         "max_size": pa.array([], type=pa.int64())})
    g = parts.groupby("p_brand", as_index=False).agg(
        n_parts=("n_parts", "sum"), price_cents=("price_cents", "sum"),
        min_size=("min_size", "min"), max_size=("max_size", "max"))
    for c in ("n_parts", "price_cents", "min_size", "max_size"):
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


_SQL_BRAND_STATS = """
SELECT p_brand, count(*)::BIGINT AS n_parts,
       sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))::BIGINT
         AS price_cents,
       min(p_size)::BIGINT AS min_size, max(p_size)::BIGINT AS max_size
FROM part GROUP BY 1
"""



def q_segment_activity(sf_dir: str):
    """Event activity per customer market segment (events ⋈ customer on
    user_id = c_custkey) — the behavioral-rollup join a growth dashboard
    reads.  Segment comes aboard through ONE hash-shuffle join (both
    sides pruned and pre-collapsed: events partial-combine per user
    BEFORE the join, so join cardinality is users, not events); event
    values are summed as integer micros with the oracle's half-away
    rounding."""
    import ray.data as rd

    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.util import auto_partitions

    P = auto_partitions()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def ev_partial(b: pa.Table) -> pa.Table:
        # pandas astype raises on NaN — a NULL value must fail loudly
        v = np.floor(b["value"].to_pandas() * 1_000_000 + 0.5
                     ).astype("int64")
        g = (pd.DataFrame({"user_id":
                           b["user_id"].to_numpy().astype(np.int64),
                           "v": v})
             .groupby("user_id", as_index=False)
             .agg(n_events=("v", "size"), value_micros=("v", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    from deduplicator_ray.stages.exact import hash_bucket

    per_user = ev.map_batches(ev_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    per_user = (hash_bucket(per_user, "user_id", P)
                .groupby("_part")
                .map_groups(lambda g: (
                    g.drop(columns=["_part"])
                    .groupby("user_id", as_index=False)
                    .agg(n_events=("n_events", "sum"),
                         value_micros=("value_micros", "sum"))),
                    batch_format="pandas")
                .materialize())  # barrier before the hash join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    def c_side(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["c_custkey"],
                         "segment": b["c_mktsegment"]})

    j = hash_join(per_user,
                  cust.map_batches(c_side, batch_format="pyarrow",
                                   zero_copy_batch=True),
                  on=("user_id",), num_partitions=P,
                  out_schema={"user_id": pa.int64(),
                              "n_events": pa.int64(),
                              "value_micros": pa.int64(),
                              "segment": pa.string()})

    def seg_partial(b: pa.Table) -> pa.Table:
        df = (b.select(["segment", "n_events", "value_micros"])
              .to_pandas()
              .groupby("segment", as_index=False)
              .agg(n_users=("n_events", "size"),
                   n_events=("n_events", "sum"),
                   value_micros=("value_micros", "sum")))
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = j.map_batches(seg_partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    cols = ("segment", "n_users", "n_events", "value_micros")
    if parts.empty:
        return pa.table({"segment": pa.array([], type=pa.string()),
                         **{c: pa.array([], type=pa.int64())
                            for c in cols[1:]}})
    g = parts.groupby("segment", as_index=False).agg(
        n_users=("n_users", "sum"), n_events=("n_events", "sum"),
        value_micros=("value_micros", "sum"))
    for c in cols[1:]:
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


_SQL_SEGMENT_ACTIVITY = """
WITH u AS (
  SELECT user_id, count(*)::BIGINT AS n_events,
         sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))::BIGINT
           AS value_micros
  FROM events GROUP BY 1
)
SELECT c.c_mktsegment AS segment, count(*)::BIGINT AS n_users,
       sum(u.n_events)::BIGINT AS n_events,
       sum(u.value_micros)::BIGINT AS value_micros
FROM u JOIN customer c ON u.user_id = c.c_custkey
GROUP BY 1
"""


def registry_rel():
    return {
        "events_hopping": (q_events_hopping, _SQL_EVENTS_HOPPING),
        "orders_range_join": (q_orders_range_join, _SQL_ORDERS_RANGE_JOIN),
        "grouped_topk": (q_grouped_topk, _SQL_GROUPED_TOPK),
        "host_stats": (q_host_stats, _sql_host_stats()),
        "host_gini": (q_host_gini, _sql_host_gini()),
        "order_revenue_topk": (q_order_revenue_topk,
                               _SQL_ORDER_REVENUE_TOPK),
        "supplier_balance_by_region": (q_supplier_balance_by_region,
                                       _SQL_SUPPLIER_BALANCE_BY_REGION),
        "brand_stats": (q_brand_stats, _SQL_BRAND_STATS),
        "segment_activity": (q_segment_activity, _SQL_SEGMENT_ACTIVITY),
        "lineitem_agg": (q_lineitem_agg, _SQL_LINEITEM_AGG),
        "funnel_counts": (q_funnel_counts, _sql_funnel()),
        "retention_cohorts": (q_retention_cohorts, _SQL_RETENTION),
    }
