"""Web link-graph operators: href extraction, host-edge aggregation,
and integer-arithmetic PageRank.

Why these live in a crawl-dedup engine: at web scale the link graph is
the other first-class artifact a crawl corpus yields (host authority for
crawl scheduling / quality weighting, mirror detection via reciprocal
edges).  The reference's CrawlDataIterator walks the same WARC captures
these stages consume; graph extraction is the natural widening of its
per-capture scan (DeDuplicator.java processes captures one at a time —
here the whole family is expressed as vectorized Arrow batch transforms).

Design for 10^12 pages / 10^8 hosts:

- ``extract_links`` is a streaming map-only stage — pure Arrow string
  kernels (split_pattern / list offsets / RE2 host extraction), never a
  Python loop over rows, never a DOM parse.
- ``edge_aggregate`` partial-combines per batch (hosts^2 is tiny next to
  raw link rows) before ONE hash-bucket shuffle on the (src,dst) key.
- ``pagerank`` is integer-only (rank mass in fixed-point units, floor
  division) so the distributed path, the driver path, and the DuckDB
  oracle mirror (queries_graph.py) agree BIT-EXACTLY — float PageRank
  sums are order-dependent and cannot be value-checked across engines.
  The rank vector is assumed to fit in one process' memory (10^8 hosts
  x 16 B = 1.6 GB — standard for host-level PR); per-edge contribution
  sums, which scale with the edge count, stay distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.stages.exact import hash_bucket
from deduplicator_ray.util import auto_partitions

# named group: pyarrow's extract_regex requires one; RE2/DuckDB treat it
# as capture group 1, so the same pattern string feeds both sides.
HOST_PAT = r"^https?://(?P<host>[^/]+)"


def _host_of(url: pa.Array) -> pa.Array:
    m = pc.extract_regex(url, HOST_PAT)
    return pc.fill_null(pc.struct_field(m, "host"), "")


def extract_links(ds, *, html_col: str = "html", url_col: str = "url",
                  with_anchor: bool = False):
    """One output row per ``<a href="...">`` in ``html_col``.

    Columns: (src_host, dst_host, dst_url[, anchor]).  Map-only, Arrow
    string kernels end to end: split on ``href="``, drop each row's
    pre-link prefix fragment via list offsets, take the quoted prefix of
    every remaining fragment.  Fragments with no closing quote
    (truncated html) are dropped, mirroring a strict parser.
    """

    def kern(b: pa.Table) -> pa.Table:
        html = b[html_col].combine_chunks().cast(pa.string())
        frags = pc.split_pattern(html, 'href="')
        if isinstance(frags, pa.ChunkedArray):  # pragma: no cover - defensive
            frags = frags.combine_chunks()
        offs = np.asarray(frags.offsets, dtype=np.int64)
        flat = frags.flatten()
        keep = np.ones(len(flat), dtype=bool)
        keep[offs[:-1] - offs[0]] = False  # first fragment per row = prefix
        link_idx = np.nonzero(keep)[0]
        link_frags = flat.take(pa.array(link_idx, type=pa.int64()))
        closed = pc.match_substring(link_frags, '"')
        if not pc.all(closed).as_py():
            link_idx = link_idx[np.asarray(closed)]
            link_frags = link_frags.filter(closed)
        row_of = np.repeat(np.arange(len(b), dtype=np.int64), np.diff(offs))
        src_row = row_of[link_idx]
        two = pc.split_pattern(link_frags, '"', max_splits=1)
        dst_url = pc.list_element(two, 0)
        src_url = b[url_col].take(pa.array(src_row, type=pa.int64()))
        out = {
            "src_host": _host_of(src_url),
            "dst_host": _host_of(dst_url),
            "dst_url": dst_url,
        }
        if with_anchor:
            rest = pc.utf8_slice_codeunits(pc.list_element(two, 1), 1)
            out["anchor"] = pc.list_element(
                pc.split_pattern(rest, "<", max_splits=1), 0)
        return pa.table(out)

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def edge_aggregate(links, *, src_col: str = "src_host",
                   dst_col: str = "dst_host",
                   num_partitions: int | None = None):
    """(src_host, dst_host) link rows -> (src_host, dst_host, n_links).

    Per-batch partial counts first (the host-pair universe is tiny next
    to the raw link stream), then ONE hash-bucket shuffle on the pair
    key with a vectorized per-bucket final sum.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table({src_col: b[src_col], dst_col: b[dst_col]}).to_pandas()
        g = (df.groupby([src_col, dst_col], as_index=False).size()
               .rename(columns={"size": "n_links"}))
        g["n_links"] = g["n_links"].astype("int64")
        t = pa.Table.from_pandas(g, preserve_index=False)
        key = pc.binary_join_element_wise(t[src_col], t[dst_col], "\x1f")
        return t.append_column("_ekey", key)

    parts = links.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([src_col, dst_col], as_index=False)
               .agg(n_links=("n_links", "sum")))
        g["n_links"] = g["n_links"].astype("int64")
        return g

    return (hash_bucket(parts, "_ekey", P)
            .groupby("_part")
            .map_groups(final, batch_format="pandas"))


def pagerank(edges, *, iters: int = 5, damping_pct: int = 85,
             scale: int = 10 ** 9, seeds=None, src_col: str = "src_host",
             dst_col: str = "dst_host", weight_col: str = "n_links",
             max_driver_edges: int = 2_000_000,
             num_partitions: int | None = None) -> pa.Table:
    """Fixed-point integer PageRank over an aggregated edge table.

    Iteration (all int64, every division a floor division):

        r0(v)   = scale
        r_k(v)  = ((100 - d) * scale) // 100
                  + (d * sum_{(u,v)} (r_{k-1}(u) // outdeg(u)) * w(u,v)) // 100

    With ``seeds`` (an iterable of trusted hosts) this becomes integer
    TrustRank (Gyongyi, Garcia-Molina & Pedersen 2004, "Combating web
    spam with TrustRank"): the teleport base and the initial mass go
    ONLY to seed hosts (r0 = scale on seeds, 0 elsewhere), so trust
    flows outward along links and link-farm clusters unreachable from
    the seed set score 0.

    Dangling mass is dropped (a host with no outlinks contributes
    nothing), matching the SQL mirror which only sums over edges.
    Deterministic and order-independent, so the driver numpy path, the
    distributed bucketed path, and the DuckDB oracle agree exactly.

    Scale note: rank mass is bounded by n_hosts * scale; with the
    default scale 1e9 the d*sum term stays inside int64 up to ~1e8
    hosts, which is also the rank-vector-fits-in-memory bound.

    Returns a pyarrow Table (host, rank) — n_hosts rows, small by the
    stated assumption.
    """
    n_edges = edges.count()
    if n_edges <= max_driver_edges:
        pdf = edges.to_pandas()
        return _pagerank_numpy(pdf, src_col, dst_col, weight_col,
                               iters, damping_pct, scale, seeds)
    return _pagerank_bucketed(edges, src_col, dst_col, weight_col,
                              iters, damping_pct, scale, seeds,
                              num_partitions or auto_partitions())


def _pr_update(base, damping_pct: int, s: np.ndarray) -> np.ndarray:
    return base + (damping_pct * s) // 100


def _pr_vectors(hosts: np.ndarray, scale: int, damping_pct: int, seeds):
    """(r0, base) vectors: uniform for plain PageRank, seed-concentrated
    for TrustRank.  Seeds not present in the graph are ignored."""
    b = ((100 - damping_pct) * scale) // 100
    if seeds is None:
        return (np.full(len(hosts), scale, dtype=np.int64),
                np.full(len(hosts), b, dtype=np.int64))
    mask = np.isin(hosts, np.asarray(list(seeds), dtype=object))
    return (np.where(mask, scale, 0).astype(np.int64),
            np.where(mask, b, 0).astype(np.int64))


def _pagerank_numpy(pdf: pd.DataFrame, src_col, dst_col, weight_col,
                    iters, damping_pct, scale, seeds=None) -> pa.Table:
    hosts = np.unique(np.concatenate([
        pdf[src_col].to_numpy(dtype=object),
        pdf[dst_col].to_numpy(dtype=object),
    ]))
    si = np.searchsorted(hosts, pdf[src_col].to_numpy(dtype=object))
    di = np.searchsorted(hosts, pdf[dst_col].to_numpy(dtype=object))
    w = pdf[weight_col].to_numpy(dtype=np.int64)
    outdeg = np.zeros(len(hosts), dtype=np.int64)
    np.add.at(outdeg, si, w)
    r, base = _pr_vectors(hosts, scale, damping_pct, seeds)
    for _ in range(iters):
        contrib = (r[si] // np.maximum(outdeg[si], 1)) * w
        s = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(s, di, contrib)
        r = _pr_update(base, damping_pct, s)
    return pa.table({"host": pa.array(hosts, type=pa.string()),
                     "rank": pa.array(r, type=pa.int64())})


def _pagerank_bucketed(edges, src_col, dst_col, weight_col,
                       iters, damping_pct, scale, seeds, P) -> pa.Table:
    """Distributed path: the per-edge contribution work (the part that
    scales with |E|) runs as map_batches + one small hash-bucket reduce
    per iteration; only n_hosts-bounded tables reach the driver."""
    import ray

    edges = edges.materialize()  # consumed iters+2 times
    hosts = _collect_hosts(edges, (src_col, dst_col))

    def outdeg_partial(b: pa.Table) -> pa.Table:
        si = np.searchsorted(hosts, np.asarray(b[src_col], dtype=object))
        w = np.asarray(b[weight_col], dtype=np.int64)
        od = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(od, si, w)
        nz = np.nonzero(od)[0]
        return pa.table({"idx": pa.array(nz, type=pa.int64()),
                         "od": pa.array(od[nz], type=pa.int64())})

    outdeg = np.zeros(len(hosts), dtype=np.int64)
    odp = (edges.map_batches(outdeg_partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas())
    np.add.at(outdeg, odp["idx"].to_numpy(), odp["od"].to_numpy())

    hosts_ref = ray.put(hosts)
    od_ref = ray.put(outdeg)
    r, base = _pr_vectors(hosts, scale, damping_pct, seeds)
    for _ in range(iters):
        r_ref = ray.put(r)

        def contrib_partial(b: pa.Table, *, _r=r_ref, _h=hosts_ref,
                            _odr=od_ref) -> pa.Table:
            hs = ray.get(_h) if isinstance(_h, ray.ObjectRef) else _h
            rv = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
            od = ray.get(_odr) if isinstance(_odr, ray.ObjectRef) else _odr
            si = np.searchsorted(hs, np.asarray(b[src_col], dtype=object))
            di = np.searchsorted(hs, np.asarray(b[dst_col], dtype=object))
            w = np.asarray(b[weight_col], dtype=np.int64)
            contrib = (rv[si] // np.maximum(od[si], 1)) * w
            s = np.zeros(len(hs), dtype=np.int64)
            np.add.at(s, di, contrib)
            nz = np.nonzero(s)[0]
            return pa.table({"idx": pa.array(nz, type=pa.int64()),
                             "s": pa.array(s[nz], type=pa.int64())})

        parts = edges.map_batches(contrib_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
        r = _pr_update(base, damping_pct,
                       _bucket_vector_sum(parts, len(hosts), P))
    return pa.table({"host": pa.array(hosts, type=pa.string()),
                     "rank": pa.array(r, type=pa.int64())})


def mirror_hosts(edges, *, threshold: float = 0.8, max_fanin: int = 10_000,
                 src_col: str = "src_host", dst_col: str = "dst_host",
                 weight_col: str = "n_links",
                 num_partitions: int | None = None):
    """Host pairs with near-identical outlink profiles — mirror / alias
    detection: cosine >= ``threshold`` between the hosts' integer
    outlink-count vectors (dimension = destination host).

    Same shape as lexical.tfidf_cosine_pairs with term := dst_host:
    pairs are generated per shared destination (partial dot w_a * w_b),
    summed across ONE hash-bucket shuffle on the pair key, then
    normalized.  Dots and norms are exact int64; the cosine is the
    identical float expression on both engine and oracle
    (dot / (sqrt(qa) * sqrt(qb))), so values match bit-for-bit.

    ``max_fanin``: destinations linked from more than this many distinct
    hosts are excluded from PAIR GENERATION (kept in norms) — part of
    the contract, mirroring tfidf's max_df.  A hub dst (everyone links
    to google.com) says nothing about two sources mirroring each other
    but costs O(fanin^2) pairs; capping it is the standard prefix-style
    pruning for this family.

    Returns a Dataset (host_a, host_b, cosine), host_a < host_b.
    """
    import ray

    from deduplicator_ray.util import auto_partitions as _ap

    P = num_partitions or _ap()
    edges = edges.materialize()  # feeds the norm pass and the pair pass

    # ---- exact norms per source host (tiny result: one row per host)
    def norm_partial(b: pa.Table) -> pa.Table:
        df = pa.table({"h": b[src_col], "w": b[weight_col]}).to_pandas()
        df["q"] = df["w"].astype("int64") ** 2
        g = df.groupby("h", as_index=False).agg(q=("q", "sum"))
        g["q"] = g["q"].astype("int64")
        return pa.Table.from_pandas(g[["h", "q"]], preserve_index=False)

    def norm_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", as_index=False).agg(q=("q", "sum"))
        g["q"] = g["q"].astype("int64")
        return g

    norms = (hash_bucket(
        edges.map_batches(norm_partial, batch_format="pyarrow",
                          zero_copy_batch=True), "h", P)
        .groupby("_part").map_groups(norm_final, batch_format="pandas")
        .to_pandas())
    hosts_sorted = np.sort(norms["h"].to_numpy(dtype=object))
    q_sorted = norms.set_index("h").loc[hosts_sorted, "q"].to_numpy(np.int64)
    hosts_ref = ray.put(hosts_sorted)
    q_ref = ray.put(q_sorted)

    # ---- pair generation per shared destination
    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        from deduplicator_ray.stages.lexical import _tri_pair_indices

        df = df.sort_values([dst_col, src_col], kind="mergesort")
        dsts = df[dst_col].to_numpy(dtype=object)
        srcs = df[src_col].to_numpy(dtype=object)
        w = df[weight_col].to_numpy(dtype=np.int64)
        _, starts, counts = np.unique(dsts, return_index=True,
                                      return_counts=True)
        keep = counts <= max_fanin
        sizes = counts[keep]
        offs = starts[keep]
        gid, i, j = _tri_pair_indices(sizes)
        ai = offs[gid] + i
        bi = offs[gid] + j
        out = pd.DataFrame({
            "host_a": srcs[ai], "host_b": srcs[bi],
            "dot": w[ai] * w[bi],
        })
        g = out.groupby(["host_a", "host_b"], as_index=False).agg(
            dot=("dot", "sum"))
        g["dot"] = g["dot"].astype("int64")
        g["_pkey"] = g["host_a"] + "\x1f" + g["host_b"]
        return g

    by_dst = hash_bucket(edges, dst_col, P)
    pairs = by_dst.groupby("_part").map_groups(gen_pairs,
                                               batch_format="pandas")

    # ---- global dot sum + normalize + threshold
    def finish(df: pd.DataFrame, *, _h=hosts_ref, _q=q_ref) -> pd.DataFrame:
        hs = ray.get(_h) if not isinstance(_h, np.ndarray) else _h
        qv = ray.get(_q) if not isinstance(_q, np.ndarray) else _q
        g = df.groupby(["host_a", "host_b"], as_index=False).agg(
            dot=("dot", "sum"))
        qa = qv[np.searchsorted(hs, g["host_a"].to_numpy(dtype=object))]
        qb = qv[np.searchsorted(hs, g["host_b"].to_numpy(dtype=object))]
        cos = g["dot"].to_numpy(np.int64) / (np.sqrt(qa.astype(np.float64))
                                             * np.sqrt(qb.astype(np.float64)))
        g["cosine"] = cos
        return g.loc[cos >= threshold, ["host_a", "host_b", "cosine"]]

    return (hash_bucket(pairs, "_pkey", P)
            .groupby("_part").map_groups(finish, batch_format="pandas"))


def co_occurrence_pairs(ds, *, key_col: str, item_col: str,
                        max_fanin: int = 10_000, min_shared: int = 1,
                        num_partitions: int | None = None):
    """Item pairs ranked by how many distinct keys they share —
    the generic "two things keep showing up together" operator
    (content-mirror detection: key=digest, item=host; co-citation:
    key=src page, item=dst host; shared-vocabulary: key=term,
    item=doc).

    Exact semantics the oracle mirrors: distinct (key, item) pairs
    first; keys with more than ``max_fanin`` distinct items are excluded
    from pairing entirely (contract, not approximation — a key shared
    by everyone carries no pairing signal but costs O(fanin^2));
    output (item_a, item_b, n_shared) with item_a < item_b and
    n_shared >= ``min_shared``.

    Shape: within-batch distinct -> hash-bucket on key (global
    distinct + per-key pair expansion via the closed-form triangular
    decode) -> hash-bucket on the pair -> summed counts.
    """
    from deduplicator_ray.stages.lexical import _tri_pair_indices
    from deduplicator_ray.util import auto_partitions as _ap

    P = num_partitions or _ap()

    def batch_distinct(b: pa.Table) -> pa.Table:
        df = pa.table({"k": b[key_col], "i": b[item_col]}).to_pandas()
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    dist = ds.map_batches(batch_distinct, batch_format="pyarrow",
                          zero_copy_batch=True)

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["k", "i"]].drop_duplicates().sort_values(
            ["k", "i"], kind="mergesort")
        items = df["i"].to_numpy(dtype=object)
        _, starts, counts = np.unique(df["k"].to_numpy(dtype=object),
                                      return_index=True, return_counts=True)
        keep = counts <= max_fanin
        gid, a, bidx = _tri_pair_indices(counts[keep])
        offs = starts[keep]
        out = pd.DataFrame({
            "item_a": items[offs[gid] + a],
            "item_b": items[offs[gid] + bidx],
        })
        g = out.groupby(["item_a", "item_b"], as_index=False).size().rename(
            columns={"size": "n_shared"})
        g["n_shared"] = g["n_shared"].astype("int64")
        g["_pkey"] = g["item_a"] + "\x1f" + g["item_b"]
        return g

    pairs = (hash_bucket(dist, "k", P)
             .groupby("_part").map_groups(gen_pairs, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["item_a", "item_b"], as_index=False).agg(
            n_shared=("n_shared", "sum"))
        g["n_shared"] = g["n_shared"].astype("int64")
        return g[g["n_shared"] >= min_shared]

    return (hash_bucket(pairs, "_pkey", P)
            .groupby("_part").map_groups(final, batch_format="pandas"))


def top_outlinks(edges, *, m: int = 2, src_col: str = "src_host",
                 dst_col: str = "dst_host", weight_col: str = "n_links",
                 num_partitions: int | None = None):
    """Keep each source host's top-``m`` destinations by link count
    (ties broken by dst name ascending — fully deterministic).

    The standard sparsifier before host-graph traversals: the pruned
    graph is <= m x hosts rows however large the corpus.  One
    hash-bucket shuffle on the source host; a host's edge fan-out is
    already aggregated (edge_aggregate), so buckets hold host-level
    rows, not raw links.
    """
    P = num_partitions or auto_partitions()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([src_col, weight_col, dst_col],
                            ascending=[True, False, True], kind="mergesort")
        return (df.groupby(src_col, as_index=False).head(m)
                  [[src_col, dst_col, weight_col]])

    return (hash_bucket(edges, src_col, P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def host_reach(edges, seeds: list[str], *, max_hops: int = 4, top_m: int = 2,
               src_col: str = "src_host", dst_col: str = "dst_host") -> pd.DataFrame:
    """Minimum-hop BFS reachability from ``seeds`` over the top-``top_m``
    outlink host graph -> DataFrame (host, hops BIGINT), hops <= max_hops.

    Crawl-frontier analysis: which hosts does a crawl seeded at ``seeds``
    reach within k link hops, following only each host's strongest
    outlinks?  Seeds report hops 0 even when absent from the graph
    (a seed is in scope by definition).

    Scale contract (same as ``pagerank``): extraction and aggregation
    are distributed and scale with the corpus; the PRUNED graph is
    host-level (<= top_m x hosts rows) and BFS runs over it in one
    process — 10^8 hosts x top_m edges ~ a few GB, the standard
    single-process frontier for host graphs.  Page-level BFS would
    instead iterate a broadcast-frontier semi-join per hop.
    """
    pruned = top_outlinks(edges, m=top_m, src_col=src_col, dst_col=dst_col)
    pdf = pruned.to_pandas()
    # adjacency: src -> list of dst
    adj = pdf.groupby(src_col)[dst_col].apply(list).to_dict()
    hops: dict[str, int] = {s: 0 for s in seeds}
    frontier = list(dict.fromkeys(seeds))
    for h in range(1, max_hops + 1):
        nxt: list[str] = []
        for s in frontier:
            for d in adj.get(s, ()):
                if d not in hops:
                    hops[d] = h
                    nxt.append(d)
        if not nxt:
            break
        frontier = nxt
    out = pd.DataFrame({"host": list(hops.keys()),
                        "hops": np.asarray(list(hops.values()), dtype=np.int64)})
    return out.sort_values(["hops", "host"], ignore_index=True)


def frontier_gap(links, captured, *, src_col: str = "src_host",
                 dst_col: str = "dst_url", url_col: str = "url",
                 canonicalizer: str = "default",
                 num_partitions: int | None = None):
    """Uncaptured outlinks per source host -> Dataset
    (src_host, n_gap_links BIGINT, n_gap_targets BIGINT).

    The crawl-completeness product: of everything the captured pages
    link TO, what did the crawl never fetch?  ``n_gap_links`` counts
    link instances to uncaptured targets, ``n_gap_targets`` the distinct
    uncaptured target pages.  Both sides key on the CANONICAL target url
    (cfg-pluggable, functions/canonical.get_canonicalizer) so www/session
    aliases of a captured page don't read as gaps.

    Distribution — a distributed anti-join without Dataset.join: both
    sides reduce within-batch to distinct keys (links also carry a
    count), union-tag, ONE hash-bucket shuffle on the canonical target;
    each bucket subtracts its captured-key set vectorized and emits
    per-src_host partials (targets are disjoint across buckets, so
    partials sum exactly); a tiny final groupby merges them.  Hosts with
    no gaps emit no row.
    """
    import pandas as pd

    from deduplicator_ray.functions.canonical import get_canonicalizer
    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    P = num_partitions or auto_partitions()
    canon = get_canonicalizer(canonicalizer)[1]

    def link_partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "src": b[src_col].to_pandas(),
            "k": canon(b[dst_col].combine_chunks().cast(pa.string())).to_pandas(),
        })
        g = df.groupby(["src", "k"], as_index=False, sort=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        g["cap"] = False
        return g

    def cap_partial(b: pa.Table) -> pd.DataFrame:
        k = canon(b[url_col].combine_chunks().cast(pa.string())).to_pandas()
        g = pd.DataFrame({"k": k}).drop_duplicates()
        g["src"] = ""
        g["n"] = 0
        g["cap"] = True
        return g[["src", "k", "n", "cap"]]

    tagged = (links.map_batches(link_partial, batch_format="pyarrow",
                                batch_size=8192)
              .union(captured.map_batches(cap_partial,
                                          batch_format="pyarrow",
                                          batch_size=8192)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        have = set(df.loc[df["cap"], "k"])
        lk = df[~df["cap"]]
        gap = lk[~lk["k"].isin(have)]
        if gap.empty:
            return pd.DataFrame({
                "src_host": pd.Series([], dtype=object),
                "n_gap_links": pd.Series([], dtype="int64"),
                "n_gap_targets": pd.Series([], dtype="int64"),
            })
        g = gap.groupby(["src", "k"], as_index=False, sort=False).agg(
            n=("n", "sum"))
        out = g.groupby("src", sort=False).agg(
            n_gap_links=("n", "sum"), n_gap_targets=("k", "size")
        ).reset_index().rename(columns={"src": "src_host"})
        return out.astype({"n_gap_links": "int64", "n_gap_targets": "int64"})

    parts = (hash_bucket(tagged, "k", P)
             .groupby("_part")
             .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                         batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # no gaps anywhere: to_pandas may drop the schema
            return pd.DataFrame({
                "src_host": pd.Series([], dtype=object),
                "n_gap_links": pd.Series([], dtype="int64"),
                "n_gap_targets": pd.Series([], dtype="int64"),
            })
        return (df.groupby("src_host", as_index=False)
                .agg(n_gap_links=("n_gap_links", "sum"),
                     n_gap_targets=("n_gap_targets", "sum"))
                .astype({"n_gap_links": "int64", "n_gap_targets": "int64"}))

    # bucket partials are host x bucket rows (tiny) — one driver-side merge
    return final(parts.to_pandas())


def _collect_hosts(ds, cols) -> np.ndarray:
    """Sorted host universe of ``ds`` over ``cols``: per-batch unique
    partials, driver merge.  The result is n_hosts-bounded by the same
    contract that lets the iterative operators (pagerank/hits/kcore)
    hold one score vector per process."""
    def partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate(
            [np.asarray(b[c], dtype=object) for c in cols]))
        return pa.table({"host": pa.array(u, type=pa.string())})

    return np.unique(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .to_pandas()["host"].to_numpy(dtype=object))


def _bucket_vector_sum(parts, n: int, P) -> np.ndarray:
    """(idx, s) partial rows -> dense int64 length-``n`` vector: ONE
    hash-bucket shuffle of nonzero partials + vectorized per-bucket sum
    — the reduce half of every broadcast-vector iteration here."""
    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        # an all-zero iteration (every partial empty) can hand map_groups
        # a column-less empty frame
        if not len(df) or "idx" not in df.columns:
            return pd.DataFrame({"idx": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        g = df.groupby("idx", as_index=False).agg(s=("s", "sum"))
        g["s"] = g["s"].astype("int64")
        return g

    summed = (hash_bucket(parts, "idx", P).groupby("_part")
              .map_groups(bucket_sum, batch_format="pandas")
              .to_pandas())
    out = np.zeros(n, dtype=np.int64)
    if len(summed):
        out[summed["idx"].to_numpy(dtype=np.int64)] = \
            summed["s"].to_numpy(dtype=np.int64)
    return out


def hits(edges, *, iters: int = 5, scale: int = 10 ** 5,
         src_col: str = "src_host", dst_col: str = "dst_host",
         weight_col: str = "n_links", max_driver_edges: int = 2_000_000,
         num_partitions: int | None = None) -> pa.Table:
    """Fixed-point integer HITS (Kleinberg 1999) over an aggregated edge
    table: hubs point at good authorities, authorities are pointed at by
    good hubs.

    Iteration (all int64, floor division; max-norm instead of L2 so the
    arithmetic stays integer-exact across engines):

        h0 = a0 = scale
        a'_v = sum_{(u,v)} h(u) * w(u,v);  a = (a' * scale) // max(a')
        h'_u = sum_{(u,v)} a(v) * w(u,v);  h = (h' * scale) // max(h')

    Overflow bound: a' <= scale * sum(w_in)  and the rescale multiplies
    by scale again, so sum of edge weight into (or out of) any host must
    stay below 2^63 / scale^2 (~9e8 at the default scale).  ENFORCED a
    priori: since scores never exceed ``scale`` after a rescale, checking
    max weighted degree W <= (2^63-1) // scale^2 up front guarantees no
    int64 wrap can occur anywhere in the iteration — heavier graphs
    raise OverflowError directing callers to a smaller ``scale``.

    Driver numpy path under ``max_driver_edges``; above it, the same
    per-edge contribution runs distributed (map_batches partial + one
    hash-bucket reduce per half-iteration) with the n_hosts-bounded
    score vectors broadcast via ray.put — the pagerank shape.
    """
    edges = edges.materialize()  # consumed 1 + 2*iters times
    n_edges = edges.count()
    if n_edges <= max_driver_edges:
        return _hits_numpy(edges.to_pandas(), src_col, dst_col,
                           weight_col, iters, scale)
    return _hits_bucketed(edges, src_col, dst_col, weight_col, iters,
                          scale, num_partitions or auto_partitions())


def _check_hits_bound(max_wdeg: int, scale: int) -> None:
    """A-priori overflow guard: with scores <= scale (invariant after
    every max-rescale, and true initially), every spread sum is
    <= scale * max_wdeg and the rescale multiplies by scale again — so
    max_wdeg <= (2^63-1) // scale^2 makes an int64 wrap IMPOSSIBLE
    anywhere in the iteration.  Checking inputs beats checking outputs:
    a wrapped sum can land positive and below any post-hoc threshold."""
    if max_wdeg > (2 ** 63 - 1) // (scale * scale):
        raise OverflowError(
            f"hits: max weighted degree {max_wdeg} exceeds the int64-safe "
            f"bound {(2 ** 63 - 1) // (scale * scale)} at scale {scale}; "
            "rerun with a smaller scale")


def _rescale_max(v: np.ndarray, scale: int) -> np.ndarray:
    m = int(v.max()) if len(v) else 0
    return (v * scale) // max(m, 1)


def _hits_numpy(pdf: pd.DataFrame, src_col, dst_col, weight_col,
                iters, scale) -> pa.Table:
    hosts = np.unique(np.concatenate([
        pdf[src_col].to_numpy(dtype=object),
        pdf[dst_col].to_numpy(dtype=object),
    ]))
    si = np.searchsorted(hosts, pdf[src_col].to_numpy(dtype=object))
    di = np.searchsorted(hosts, pdf[dst_col].to_numpy(dtype=object))
    w = pdf[weight_col].to_numpy(dtype=np.int64)
    win = np.zeros(len(hosts), dtype=np.int64)
    wout = np.zeros(len(hosts), dtype=np.int64)
    np.add.at(win, di, w)
    np.add.at(wout, si, w)
    wdeg = np.maximum(win, wout)
    _check_hits_bound(int(wdeg.max()) if len(wdeg) else 0, scale)
    h = np.full(len(hosts), scale, dtype=np.int64)
    a = np.full(len(hosts), scale, dtype=np.int64)
    for _ in range(iters):
        araw = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(araw, di, h[si] * w)
        a = _rescale_max(araw, scale)
        hraw = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(hraw, si, a[di] * w)
        h = _rescale_max(hraw, scale)
    return pa.table({"host": pa.array(hosts, type=pa.string()),
                     "hub": pa.array(h, type=pa.int64()),
                     "auth": pa.array(a, type=pa.int64())})


def _hits_bucketed(edges, src_col, dst_col, weight_col, iters, scale,
                   P) -> pa.Table:
    """Distributed HITS: per half-iteration, the |E|-scaling work is a
    map_batches partial + hash-bucket sum; only n_hosts-bounded vectors
    cross the driver (broadcast once per iteration via ray.put)."""
    import ray

    hosts = _collect_hosts(edges, (src_col, dst_col))
    hosts_ref = ray.put(hosts)

    def spread(vec_ref, from_col, to_col):
        def partial(b: pa.Table, *, _v=vec_ref, _h=hosts_ref) -> pa.Table:
            hs = ray.get(_h) if isinstance(_h, ray.ObjectRef) else _h
            v = ray.get(_v) if isinstance(_v, ray.ObjectRef) else _v
            fi = np.searchsorted(hs, np.asarray(b[from_col], dtype=object))
            ti = np.searchsorted(hs, np.asarray(b[to_col], dtype=object))
            w = np.asarray(b[weight_col], dtype=np.int64)
            s = np.zeros(len(hs), dtype=np.int64)
            np.add.at(s, ti, v[fi] * w)
            nz = np.nonzero(s)[0]
            return pa.table({"idx": pa.array(nz, type=pa.int64()),
                             "s": pa.array(s[nz], type=pa.int64())})

        parts = edges.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return _bucket_vector_sum(parts, len(hosts), P)

    # weighted-degree bound via the same spread with a ones vector —
    # spread(1, u->v) IS the weighted in-degree; symmetric for out
    ones = ray.put(np.ones(len(hosts), dtype=np.int64))
    wdeg = np.maximum(spread(ones, src_col, dst_col),
                      spread(ones, dst_col, src_col))
    _check_hits_bound(int(wdeg.max()) if len(wdeg) else 0, scale)

    h = np.full(len(hosts), scale, dtype=np.int64)
    a = np.full(len(hosts), scale, dtype=np.int64)
    for _ in range(iters):
        a = _rescale_max(spread(ray.put(h), src_col, dst_col), scale)
        h = _rescale_max(spread(ray.put(a), dst_col, src_col), scale)
    return pa.table({"host": pa.array(hosts, type=pa.string()),
                     "hub": pa.array(h, type=pa.int64()),
                     "auth": pa.array(a, type=pa.int64())})


def _undirected_edges(edges, src_col, dst_col, P):
    """Globally-distinct undirected host edges (u < v lexicographically,
    self-loops dropped): within-batch canonicalize + distinct, ONE
    hash-bucket shuffle on the edge key, per-bucket distinct."""
    def partial(b: pa.Table) -> pa.Table:
        s = np.asarray(b[src_col], dtype=object)
        d = np.asarray(b[dst_col], dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        df = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        # explicit string types: an all-self-loop batch leaves df empty
        # and from_pandas would infer null-typed columns
        return pa.table({"u": pa.array(df["u"], type=pa.string()),
                         "v": pa.array(df["v"], type=pa.string())})

    def bucket_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[["u", "v"]].drop_duplicates()

    parts = edges.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return (hash_bucket(parts, "u", P)
            .groupby("_part").map_groups(bucket_distinct,
                                         batch_format="pandas"))


def triangles(edges, *, src_col: str = "src_host",
              dst_col: str = "dst_host",
              max_driver_edges: int = 2_000_000,
              num_partitions: int | None = None) -> pa.Table:
    """Exact per-host triangle counts on the UNDIRECTED host graph
    (direction and multiplicity dropped, self-loops ignored): for each
    host, the number of distinct host triangles it participates in —
    the local-clustering numerator used for web-spam / link-farm
    detection (densely interlinked host clusters).

    Algorithm (compact-forward / degree orientation; Latapy 2008,
    "Main-memory triangle computations for very large (sparse
    (power-law)) graphs"): orient every undirected edge from the
    endpoint with lower (degree, host) rank to the higher; each
    triangle then has exactly ONE vertex with two out-edges, so
    enumerating wedges only at out-neighbors bounds candidate pairs by
    sum(out_deg^2) <= O(E * arboricity) instead of the hub-quadratic
    sum(deg^2) — the standard skew shield for power-law host graphs.

    Distributed shape: distinct-undirected-edges shuffle -> degree
    partials (host-bounded, broadcast via ray.put) -> per-bucket wedge
    generation keyed by the oriented pair -> tagged-union hash-bucket
    match of wedges against oriented edges -> per-host count partials
    -> final host-key sum.  Hosts with zero triangles are omitted.
    """
    P = num_partitions or auto_partitions()
    und = _undirected_edges(edges, src_col, dst_col, P).materialize()

    n_edges = und.count()
    if n_edges <= max_driver_edges:
        return _triangles_pandas(und.to_pandas())
    return _triangles_bucketed(und, P)


def _tri_rank(hosts: np.ndarray, deg: np.ndarray) -> np.ndarray:
    """Total order (degree, host): rank[i] = position of host i."""
    order = np.lexsort((hosts, deg))
    rank = np.empty(len(hosts), dtype=np.int64)
    rank[order] = np.arange(len(hosts), dtype=np.int64)
    return rank


def _triangles_pandas(und: pd.DataFrame) -> pa.Table:
    hosts = np.unique(np.concatenate([
        und["u"].to_numpy(dtype=object), und["v"].to_numpy(dtype=object)]))
    ui = np.searchsorted(hosts, und["u"].to_numpy(dtype=object))
    vi = np.searchsorted(hosts, und["v"].to_numpy(dtype=object))
    deg = np.zeros(len(hosts), dtype=np.int64)
    np.add.at(deg, ui, 1)
    np.add.at(deg, vi, 1)
    rank = _tri_rank(hosts, deg)
    # orient low rank -> high rank
    lo = np.where(rank[ui] < rank[vi], ui, vi)
    hi = np.where(rank[ui] < rank[vi], vi, ui)
    # wedges at each center: pairs of out-neighbors, ordered by rank
    order = np.argsort(lo, kind="stable")
    lo_s, hi_s = lo[order], hi[order]
    counts = np.bincount(lo_s, minlength=len(hosts))
    from deduplicator_ray.stages.lexical import _tri_pair_indices
    centers_all = np.nonzero(counts)[0]
    starts = np.zeros(len(hosts), dtype=np.int64)
    starts[centers_all] = np.searchsorted(lo_s, centers_all)
    gid, a_off, b_off = _tri_pair_indices(counts[centers_all])
    centers = centers_all[gid]
    wa = hi_s[starts[centers] + a_off]
    wb = hi_s[starts[centers] + b_off]
    # canonical rank order within the wedge so it matches the oriented edge
    swap = rank[wa] > rank[wb]
    wa2 = np.where(swap, wb, wa)
    wb2 = np.where(swap, wa, wb)
    # membership test against oriented edges via int64 pair keys
    n = np.int64(len(hosts))
    edge_keys = np.sort(lo.astype(np.int64) * n + hi.astype(np.int64))
    wedge_keys = wa2.astype(np.int64) * n + wb2.astype(np.int64)
    if len(edge_keys):
        pos = np.minimum(np.searchsorted(edge_keys, wedge_keys),
                         len(edge_keys) - 1)
        hit = edge_keys[pos] == wedge_keys
    else:
        hit = np.zeros(len(wedge_keys), dtype=bool)
    tri = np.zeros(len(hosts), dtype=np.int64)
    for idx in (centers[hit], wa2[hit], wb2[hit]):
        np.add.at(tri, idx, 1)
    nz = np.nonzero(tri)[0]
    return pa.table({"host": pa.array(hosts[nz], type=pa.string()),
                     "n_triangles": pa.array(tri[nz], type=pa.int64())})


def _triangles_bucketed(und, P) -> pa.Table:
    """Distributed triangle count: degrees broadcast (host-bounded),
    wedge generation per oriented-center bucket, tagged-union match of
    wedge keys against oriented-edge keys, host-key count reduce."""
    import ray
    import ray.data as rd

    # degrees: per-batch endpoint partials -> driver-bounded vector
    def deg_partial(b: pa.Table) -> pa.Table:
        h, c = np.unique(np.concatenate([
            np.asarray(b["u"], dtype=object),
            np.asarray(b["v"], dtype=object)]), return_counts=True)
        return pa.table({"host": pa.array(h, type=pa.string()),
                         "n": pa.array(c.astype(np.int64), type=pa.int64())})

    dd = (und.map_batches(deg_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
          .to_pandas().groupby("host", as_index=False).agg(n=("n", "sum")))
    hosts = dd["host"].to_numpy(dtype=object)
    srt = np.argsort(hosts)
    hosts = hosts[srt]
    deg = dd["n"].to_numpy(dtype=np.int64)[srt]
    rank = _tri_rank(hosts, deg)
    ctx = ray.put((hosts, rank))

    def orient(b: pa.Table, *, _c=ctx) -> pa.Table:
        hs, rk = ray.get(_c) if isinstance(_c, ray.ObjectRef) else _c
        ui = np.searchsorted(hs, np.asarray(b["u"], dtype=object))
        vi = np.searchsorted(hs, np.asarray(b["v"], dtype=object))
        lo = np.where(rk[ui] < rk[vi], ui, vi)
        hi = np.where(rk[ui] < rk[vi], vi, ui)
        return pa.table({"lo": pa.array(lo, type=pa.int64()),
                         "hi": pa.array(hi, type=pa.int64())})

    oriented = und.map_batches(orient, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    nh = len(hosts)

    def gen_wedges(df: pd.DataFrame, *, _c=ctx) -> pd.DataFrame:
        from deduplicator_ray.stages.lexical import _tri_pair_indices
        _, rk = ray.get(_c) if isinstance(_c, ray.ObjectRef) else _c
        df = df.sort_values(["lo", "hi"], kind="mergesort")
        lo = df["lo"].to_numpy(dtype=np.int64)
        hi = df["hi"].to_numpy(dtype=np.int64)
        cs, starts, counts = np.unique(lo, return_index=True,
                                       return_counts=True)
        gid, a_off, b_off = _tri_pair_indices(counts)
        centers = cs[gid]
        wa, wb = hi[starts[gid] + a_off], hi[starts[gid] + b_off]
        swap = rk[wa] > rk[wb]
        wa2 = np.where(swap, wb, wa)
        wb2 = np.where(swap, wa, wb)
        return pd.DataFrame({"pkey": wa2 * np.int64(nh) + wb2,
                             "center": centers})

    wedges = (hash_bucket(oriented, "lo", P)
              .groupby("_part").map_groups(gen_wedges,
                                           batch_format="pandas"))

    def edge_keys(b: pa.Table) -> pa.Table:
        k = (np.asarray(b["lo"], dtype=np.int64) * np.int64(nh)
             + np.asarray(b["hi"], dtype=np.int64))
        return pa.table({"pkey": pa.array(k, type=pa.int64()),
                         "center": pa.array(np.full(len(k), -1),
                                            type=pa.int64())})

    tagged = wedges.union(
        oriented.map_batches(edge_keys, batch_format="pyarrow",
                             zero_copy_batch=True))

    def match(df: pd.DataFrame) -> pd.DataFrame:
        is_edge = df["center"].to_numpy() < 0
        ek = np.unique(df.loc[is_edge, "pkey"].to_numpy(dtype=np.int64))
        w = df.loc[~is_edge]
        if not len(w) or not len(ek):
            return pd.DataFrame({"hidx": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        wk = w["pkey"].to_numpy(dtype=np.int64)
        pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
        hit = ek[pos] == wk
        c = w["center"].to_numpy(dtype=np.int64)[hit]
        wkh = wk[hit]
        parts = np.concatenate([c, wkh // nh, wkh % nh])
        h, n = np.unique(parts, return_counts=True)
        return pd.DataFrame({"hidx": h, "n": n.astype(np.int64)})

    parts = (hash_bucket(tagged, "pkey", P)
             .groupby("_part").map_groups(match, batch_format="pandas"))

    def final(df: pd.DataFrame, *, _c=ctx) -> pd.DataFrame:
        # hosts via the broadcast ref, not the closure — the closure
        # would cloudpickle the whole string array into every task
        hs, _ = ray.get(_c) if isinstance(_c, ray.ObjectRef) else _c
        g = df.groupby("hidx", as_index=False).agg(n=("n", "sum"))
        return pd.DataFrame({"host": hs[g["hidx"].to_numpy()],
                             "n_triangles": g["n"].astype("int64")})

    out = (hash_bucket(parts, "hidx", P)
           .groupby("_part").map_groups(final, batch_format="pandas")
           .to_pandas())
    return pa.Table.from_pandas(out, preserve_index=False)


def kcore(edges, *, k: int = 2, rounds: int = 6,
          src_col: str = "src_host", dst_col: str = "dst_host",
          max_driver_edges: int = 2_000_000,
          num_partitions: int | None = None) -> pa.Table:
    """Fixed-round k-core peeling on the undirected host graph: run
    exactly ``rounds`` peels (compute degree within the currently-alive
    subgraph, drop hosts with degree < k), then return the survivors
    with their degree inside the surviving subgraph — the dense-core
    extraction used to locate tightly-interlinked host neighborhoods
    (link farms, platform clusters).

    FIXED rounds, not peel-to-convergence: both the Ray paths and the
    unrolled-CTE oracle run the identical round count, so results are
    comparable across engines even on graphs where peeling hasn't
    converged; on converged graphs this IS the k-core (Seidman 1983).
    Degree = distinct alive neighbors (multiplicity and direction
    dropped, self-loops ignored).

    Distributed shape per round: alive bitmap (n_hosts-bounded)
    broadcast via ray.put; per-batch degree partials over the
    undirected edge set; one hash-bucket sum — the pagerank/hits
    spread pattern with an alive mask.
    """
    P = num_partitions or auto_partitions()
    und = _undirected_edges(edges, src_col, dst_col, P).materialize()
    n_edges = und.count()
    if n_edges <= max_driver_edges:
        return _kcore_numpy(und.to_pandas(), k, rounds)
    return _kcore_bucketed(und, k, rounds, P)


def _kcore_numpy(und: pd.DataFrame, k: int, rounds: int) -> pa.Table:
    hosts = np.unique(np.concatenate([
        und["u"].to_numpy(dtype=object), und["v"].to_numpy(dtype=object)]))
    ui = np.searchsorted(hosts, und["u"].to_numpy(dtype=object))
    vi = np.searchsorted(hosts, und["v"].to_numpy(dtype=object))

    def degrees(alive: np.ndarray) -> np.ndarray:
        live = alive[ui] & alive[vi]
        deg = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(deg, ui[live], 1)
        np.add.at(deg, vi[live], 1)
        return deg

    alive = np.ones(len(hosts), dtype=bool)
    for _ in range(rounds):
        alive &= degrees(alive) >= k
    deg = degrees(alive)
    keep = np.nonzero(alive)[0]
    return pa.table({"host": pa.array(hosts[keep], type=pa.string()),
                     "core_degree": pa.array(deg[keep], type=pa.int64())})


def _kcore_bucketed(und, k: int, rounds: int, P) -> pa.Table:
    import ray

    hosts = _collect_hosts(und, ("u", "v"))
    hosts_ref = ray.put(hosts)

    def degrees(alive_ref) -> np.ndarray:
        def partial(b: pa.Table, *, _a=alive_ref, _h=hosts_ref) -> pa.Table:
            hs = ray.get(_h) if isinstance(_h, ray.ObjectRef) else _h
            al = ray.get(_a) if isinstance(_a, ray.ObjectRef) else _a
            ui = np.searchsorted(hs, np.asarray(b["u"], dtype=object))
            vi = np.searchsorted(hs, np.asarray(b["v"], dtype=object))
            live = al[ui] & al[vi]
            deg = np.zeros(len(hs), dtype=np.int64)
            np.add.at(deg, ui[live], 1)
            np.add.at(deg, vi[live], 1)
            nz = np.nonzero(deg)[0]
            return pa.table({"idx": pa.array(nz, type=pa.int64()),
                             "s": pa.array(deg[nz], type=pa.int64())})

        parts = und.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
        return _bucket_vector_sum(parts, len(hosts), P)

    alive = np.ones(len(hosts), dtype=bool)
    for _ in range(rounds):
        alive &= degrees(ray.put(alive)) >= k
    deg = degrees(ray.put(alive))
    keep = np.nonzero(alive)[0]
    return pa.table({"host": pa.array(hosts[keep], type=pa.string()),
                     "core_degree": pa.array(deg[keep], type=pa.int64())})


def reciprocity(edges, *, src_col: str = "src_host",
                dst_col: str = "dst_host",
                num_partitions: int | None = None):
    """Per-host link reciprocity: of a host's distinct out-neighbors
    (self-loops dropped), how many link back — the mutual-linking
    signal that separates organic site neighborhoods from one-way spam
    blasts.  Columns (host, n_out, n_recip, recip_ppm) with
    recip_ppm = (n_recip * 1e6) // n_out (integer, oracle-exact).

    Shape: within-batch distinct directed pairs -> ONE hash-bucket
    shuffle on the UNORDERED pair key (both directions of an edge land
    in the same bucket, so reciprocation is decided locally) -> per-host
    partial sums -> host-key final.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": np.asarray(b[src_col], dtype=object),
            "d": np.asarray(b[dst_col], dtype=object)})
        df = df[df["s"] != df["d"]].drop_duplicates()
        # explicit string types: an all-self-loop batch leaves df empty
        # and from_pandas' null-typed columns crash min_element_wise
        t = pa.table({"s": pa.array(df["s"], type=pa.string()),
                      "d": pa.array(df["d"], type=pa.string())})
        lo = pc.min_element_wise(t["s"], t["d"])
        hi = pc.max_element_wise(t["s"], t["d"])
        return t.append_column(
            "_ukey", pc.binary_join_element_wise(lo, hi, "\x1f"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["s", "d"]].drop_duplicates()
        fwd = df["s"] + "\x1f" + df["d"]
        rev = set(df["d"] + "\x1f" + df["s"])
        rec = fwd.isin(rev).astype("int64")
        g = pd.DataFrame({"host": df["s"], "out": 1, "rec": rec}).groupby(
            "host", as_index=False).agg(out=("out", "sum"),
                                        rec=("rec", "sum"))
        return g

    parts = (hash_bucket(
        edges.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True), "_ukey", P)
        .groupby("_part").map_groups(per_bucket, batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("host", as_index=False).agg(
            n_out=("out", "sum"), n_recip=("rec", "sum"))
        g["n_out"] = g["n_out"].astype("int64")
        g["n_recip"] = g["n_recip"].astype("int64")
        g["recip_ppm"] = (g["n_recip"] * 1_000_000) // g["n_out"]
        return g

    return (hash_bucket(parts, "host", P)
            .groupby("_part").map_groups(final, batch_format="pandas"))


def degree_census(edges, *, src_col: str = "src_host",
                  dst_col: str = "dst_host",
                  num_partitions: int | None = None) -> pa.Table:
    """Log2-bucketed in/out degree histogram of the host graph — the
    power-law shape check every web-graph audit starts with (does the
    crawl over-sample hubs?).  Degree = distinct neighbors, self-loops
    dropped; bucket = bit_length(deg) - 1, exact integer on both engines
    (the oracle uses length(bin(deg)) - 1, never float log2).

    Columns (direction, log2_bucket, n_hosts); histogram partials are
    <= 64 rows per bucket task, merged on the driver.
    """
    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": np.asarray(b[src_col], dtype=object),
            "d": np.asarray(b[dst_col], dtype=object)})
        df = df[df["s"] != df["d"]].drop_duplicates()
        # explicit string types (empty-batch null-schema hazard)
        return pa.table({"s": pa.array(df["s"], type=pa.string()),
                         "d": pa.array(df["d"], type=pa.string())})

    dist = edges.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def hist(key: str, direction: str):
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            deg = (df[["s", "d"]].drop_duplicates()
                   .groupby(key).size().to_numpy(dtype=np.int64))
            # frexp exponent is exact for any int64 < 2^53: deg in
            # [2^k, 2^(k+1)) -> exponent k+1 -> bucket k
            buckets = np.frexp(deg.astype(np.float64))[1].astype(np.int64) - 1
            bk, n = np.unique(buckets, return_counts=True)
            return pd.DataFrame({"direction": direction, "log2_bucket": bk,
                                 "n_hosts": n.astype(np.int64)})

        return (hash_bucket(dist, key, P)
                .groupby("_part").map_groups(per_bucket,
                                             batch_format="pandas")
                .to_pandas())

    out = pd.concat([hist("s", "out"), hist("d", "in")], ignore_index=True)
    out = out.groupby(["direction", "log2_bucket"], as_index=False).agg(
        n_hosts=("n_hosts", "sum"))
    out["log2_bucket"] = out["log2_bucket"].astype("int64")
    out["n_hosts"] = out["n_hosts"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def host_components(edges, *, src_col: str = "src_host",
                    dst_col: str = "dst_host",
                    num_partitions: int | None = None) -> pa.Table:
    """Connected components of the undirected host graph -> (host,
    component) with component = the component's lexicographically
    smallest host — the coarse "web neighborhood" partition (which
    hosts are link-reachable from which, ignoring direction).

    Reuses the engine's CC machinery (stages/cc.py: driver union-find
    under the counted edge limit, distributed hash-min propagation
    above it) over integer host indices; because the host universe is
    SORTED before indexing, the component's min index IS its min host,
    so the integer labels translate back exactly.
    """
    import ray

    from deduplicator_ray.stages.cc import connected_components_auto

    P = num_partitions or auto_partitions()
    und = _undirected_edges(edges, src_col, dst_col, P).materialize()
    hosts = _collect_hosts(und, ("u", "v"))
    hosts_ref = ray.put(hosts)

    def to_idx(b: pa.Table, *, _h=hosts_ref) -> pa.Table:
        hs = ray.get(_h) if isinstance(_h, ray.ObjectRef) else _h
        return pa.table({
            "a": pa.array(np.searchsorted(
                hs, np.asarray(b["u"], dtype=object)), type=pa.int64()),
            "b": pa.array(np.searchsorted(
                hs, np.asarray(b["v"], dtype=object)), type=pa.int64()),
        })

    asg = connected_components_auto(
        und.map_batches(to_idx, batch_format="pyarrow",
                        zero_copy_batch=True))
    # n_hosts-bounded by the same contract as the rank vectors
    adf = asg.to_pandas()
    node = adf["doc_key"].to_numpy(dtype=np.int64)
    comp = adf["cluster_id"].to_numpy(dtype=np.int64)
    return pa.table({
        "host": pa.array(hosts[node], type=pa.string()),
        "component": pa.array(hosts[comp], type=pa.string()),
    })


def orphan_pages(links, captured, *, dst_col: str = "dst_url",
                 url_col: str = "url", canonicalizer: str = "default",
                 num_partitions: int | None = None) -> pd.DataFrame:
    """Per-site ORPHAN census — frontier_gap's dual: of everything the
    crawl captured, which pages does nothing link to?  Orphans are the
    archive's discoverability blind spots (reachable only by seed list,
    not by following links).  Returns (site, n_pages, n_orphans) per
    site of the captured pages' canonical urls; sites where every page
    has an inlink still appear (n_orphans = 0) so rates are computable.

    Same shape as frontier_gap: both sides reduce within-batch to
    distinct canonical keys, union-tag, ONE hash-bucket shuffle on the
    key; each bucket subtracts its link-target set vectorized and emits
    per-site (pages, orphans) partials — keys are disjoint across
    buckets, so partials sum exactly.
    """
    from deduplicator_ray.functions.canonical import get_canonicalizer
    from deduplicator_ray.util import auto_partitions as _ap

    P = num_partitions or _ap()
    canon = get_canonicalizer(canonicalizer)[1]

    def link_partial(b: pa.Table) -> pd.DataFrame:
        k = canon(b[dst_col].combine_chunks().cast(pa.string())).to_pandas()
        g = pd.DataFrame({"k": k}).drop_duplicates()
        g["cap"] = False
        return g

    def cap_partial(b: pa.Table) -> pd.DataFrame:
        k = canon(b[url_col].combine_chunks().cast(pa.string())).to_pandas()
        g = pd.DataFrame({"k": k}).drop_duplicates()
        g["cap"] = True
        return g

    tagged = (links.map_batches(link_partial, batch_format="pyarrow",
                                batch_size=8192)
              .union(captured.map_batches(cap_partial,
                                          batch_format="pyarrow",
                                          batch_size=8192)))

    _EMPTY = pd.DataFrame({
        "site": pd.Series([], dtype=object),
        "n_pages": pd.Series([], dtype="int64"),
        "n_orphans": pd.Series([], dtype="int64"),
    })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        linked = set(df.loc[~df["cap"], "k"])
        pages = df.loc[df["cap"], ["k"]].drop_duplicates()
        if pages.empty:
            return _EMPTY
        # fillna(''): a hostless canonical key must count under site ''
        # like the SQL mirror's regexp_extract, not silently drop
        pages["site"] = (pages["k"].str.extract(r"^([^/]+)", expand=False)
                         .fillna(""))
        pages["orph"] = (~pages["k"].isin(linked)).astype("int64")
        out = pages.groupby("site", as_index=False).agg(
            n_pages=("k", "size"), n_orphans=("orph", "sum"))
        return out.astype({"n_pages": "int64", "n_orphans": "int64"})

    parts = (hash_bucket(tagged, "k", P)
             .groupby("_part")
             .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                         batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return _EMPTY
    return (parts.groupby("site", as_index=False)
            .agg(n_pages=("n_pages", "sum"), n_orphans=("n_orphans", "sum"))
            .astype({"n_pages": "int64", "n_orphans": "int64"}))


def assortativity(edges, *, src_col: str = "src_host",
                  dst_col: str = "dst_host",
                  num_partitions: int | None = None) -> pa.Table:
    """Degree assortativity of the undirected host graph (Newman 2002,
    "Assortative mixing in networks") -> one row (n_edges,
    assort_micro): the Pearson correlation of endpoint degrees over edge
    stubs — positive means hubs link to hubs (a core/periphery web),
    negative means hubs link to leaves (a hub-and-spoke web).

    Degrees = DISTINCT undirected neighbors, self-loops dropped.  The
    symmetric stub marginals collapse Newman's formula to the exact
    rational r = (4m*S_jk - Sx^2) / (2m*S_jj - Sx^2) with
    Sx = sum(j + k), S_jk = sum(j*k), S_jj = sum(j^2 + k^2) over the m
    distinct edges — every sum an integer, so the ONLY float op is the
    final single division, floored to micro identically by numpy and
    DuckDB.  den == 0 (regular graph) reports 0 by contract.

    Shape: distinct undirected edges via ONE unordered-pair-key shuffle;
    degrees via ONE node-key shuffle over the distinct edge set; two
    hash-shuffle joins attach endpoint degrees; per-block integer
    partial sums (4 tiny rows per block) merge on the driver as Python
    big-ints.  (Per-block int64 partials bound degrees to < 2^31 —
    beyond any observed host graph.)
    """
    import math

    from deduplicator_ray.stages.joins import hash_join

    P = num_partitions or auto_partitions()

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": np.asarray(b[src_col], dtype=object),
            "d": np.asarray(b[dst_col], dtype=object)})
        df = df[df["s"] != df["d"]].drop_duplicates()
        t = pa.table({"s": pa.array(df["s"], type=pa.string()),
                      "d": pa.array(df["d"], type=pa.string())})
        lo = pc.min_element_wise(t["s"], t["d"])
        hi = pc.max_element_wise(t["s"], t["d"])
        return pa.table({
            "u": lo, "v": hi,
            "_ukey": pc.binary_join_element_wise(lo, hi, "\x1f")})

    und = (hash_bucket(
        edges.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True), "_ukey", P)
        .groupby("_part")
        .map_groups(lambda g: g[["u", "v"]].drop_duplicates(),
                    batch_format="pandas")
        .materialize())  # consumed 3x: degrees + two join sides

    _zero = pa.table({"n_edges": pa.array([0], type=pa.int64()),
                      "assort_micro": pa.array([0], type=pa.int64())})
    # an empty dataset loses its schema before hash_join (Acero would
    # fail on the missing key field) — report the documented zero row
    if und.count() == 0:
        return _zero

    def stubs(b: pa.Table) -> pa.Table:
        return pa.table({"h": pa.concat_arrays(
            [b["u"].combine_chunks().cast(pa.string()),
             b["v"].combine_chunks().cast(pa.string())])})

    def deg_of(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", as_index=False).size()
        return pd.DataFrame({"h": g["h"],
                             "deg": g["size"].astype("int64")})

    deg = (hash_bucket(
        und.map_batches(stubs, batch_format="pyarrow",
                        zero_copy_batch=True), "h", P)
        .groupby("_part")
        .map_groups(lambda g: deg_of(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .materialize())  # consumed 2x: both join sides

    def rename(to_h: str, to_d: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({to_h: b["h"].cast(pa.string()),
                             to_d: b["deg"].cast(pa.int64())})
        return f

    deg_u = deg.map_batches(rename("u", "deg_u"),
                            batch_format="pyarrow", zero_copy_batch=True)
    deg_v = deg.map_batches(rename("v", "deg_v"),
                            batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(und, deg_u, on=("u",), num_partitions=P,
                   out_schema={"u": pa.string(), "v": pa.string(),
                               "deg_u": pa.int64()})
    # barrier between the chained hash joins: two sets of shuffle
    # aggregator actors in ONE streaming topology can deadlock each
    # other on a small cpu budget (see queries_rel.q_order_revenue_topk)
    j1 = j1.materialize()
    j2 = hash_join(j1, deg_v, on=("v",), num_partitions=P,
                   out_schema={"u": pa.string(), "v": pa.string(),
                               "deg_u": pa.int64(), "deg_v": pa.int64()})

    def sums(b: pa.Table) -> pa.Table:
        j = b["deg_u"].to_numpy().astype(np.int64)
        k = b["deg_v"].to_numpy().astype(np.int64)
        return pa.table({
            "m": pa.array([len(j)], type=pa.int64()),
            "sx": pa.array([int((j + k).sum())], type=pa.int64()),
            "sjj": pa.array([int((j * j + k * k).sum())], type=pa.int64()),
            "sjk": pa.array([int((j * k).sum())], type=pa.int64()),
        })

    parts = j2.map_batches(sums, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if parts.empty or "m" not in parts.columns:  # schema-drop hazard
        return _zero
    m = int(parts["m"].sum())
    if m == 0:
        return _zero
    sx = int(parts["sx"].sum())
    sjj = int(parts["sjj"].sum())
    sjk = int(parts["sjk"].sum())
    num = 4 * m * sjk - sx * sx
    den = 2 * m * sjj - sx * sx
    micro = 0 if den == 0 else int(
        math.floor(float(num) / float(den) * 1_000_000 + 0.5))
    return pa.table({"n_edges": pa.array([m], type=pa.int64()),
                     "assort_micro": pa.array([micro], type=pa.int64())})


def _symmetrize(pdf: pd.DataFrame, src_col, dst_col, weight_col
                ) -> pd.DataFrame:
    """Directed aggregated edges -> undirected weighted neighbor list
    (both orientations, per-pair weights summed, self-loops dropped)."""
    pdf = pdf[pdf[src_col] != pdf[dst_col]]
    fwd = pdf.rename(columns={src_col: "a", dst_col: "b",
                              weight_col: "w"})[["a", "b", "w"]]
    rev = pdf.rename(columns={dst_col: "a", src_col: "b",
                              weight_col: "w"})[["a", "b", "w"]]
    und = pd.concat([fwd, rev], ignore_index=True)
    return und.groupby(["a", "b"], as_index=False).agg(w=("w", "sum"))


def _lpa_winners(node: np.ndarray, lab: np.ndarray, w: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Vote reduce: per node, the label with max summed weight, ties to
    the SMALLEST label index (== lexicographically smallest label
    string, since labels index a sorted host array).  Pure numpy:
    sort by (node, label), segment-sum, then pick per-node best."""
    order = np.lexsort((lab, node))
    node, lab, w = node[order], lab[order], w[order]
    new_seg = np.empty(len(node), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = (node[1:] != node[:-1]) | (lab[1:] != lab[:-1])
    starts = np.nonzero(new_seg)[0]
    c = np.add.reduceat(w, starts)
    n_seg, l_seg = node[starts], lab[starts]
    # per-node winner: stable sort by (node asc, count desc, label asc);
    # l_seg is already ascending within node from the segment pass
    win = np.lexsort((l_seg, -c, n_seg))
    first = np.empty(len(win), dtype=bool)
    nw = n_seg[win]
    first[0] = True
    first[1:] = nw[1:] != nw[:-1]
    sel = win[first]
    return n_seg[sel], l_seg[sel]


def lpa_communities(edges, *, rounds: int = 4,
                    src_col: str = "src_host", dst_col: str = "dst_host",
                    weight_col: str = "n_links",
                    max_driver_edges: int = 2_000_000,
                    num_partitions: int | None = None) -> pa.Table:
    """Deterministic synchronous label propagation communities
    (Raghavan, Albert & Kumara 2007, "Near linear time algorithm to
    detect community structures in large-scale networks"), made
    order-independent so the numpy path, the distributed path and the
    unrolled-CTE DuckDB oracle agree value-for-value:

    - every label updates SIMULTANEOUSLY from the previous round's
      labels (no in-round cascades),
    - votes are edge-weight sums over the undirected, self-loop-free
      neighborhood (both directions' multiplicities merged),
    - ties break to the lexicographically smallest label,
    - exactly ``rounds`` rounds, no convergence test.

    l0(v) = v.  Labels are always host names, so community ids are
    stable, meaningful strings.  Every node in the edge table has a
    neighbor by construction, so each round relabels every node.

    Driver numpy path under ``max_driver_edges``; above it, each round
    broadcasts the n_hosts-bounded label vector via ``ray.put`` and
    runs the per-edge voting as map_batches partials + one hash-bucket
    winner reduce (the pagerank shape).  Returns (host, community).
    """
    n_edges = edges.count()
    if n_edges <= max_driver_edges:
        und = _symmetrize(edges.to_pandas(), src_col, dst_col, weight_col)
        hosts = np.unique(und["a"].to_numpy(dtype=object))
        ai = np.searchsorted(hosts, und["a"].to_numpy(dtype=object))
        bi = np.searchsorted(hosts, und["b"].to_numpy(dtype=object))
        w = und["w"].to_numpy(dtype=np.int64)
        lbl = np.arange(len(hosts), dtype=np.int64)
        for _ in range(rounds):
            nodes, wins = _lpa_winners(ai, lbl[bi], w)
            nxt = lbl.copy()
            nxt[nodes] = wins
            lbl = nxt
        return pa.table({"host": pa.array(hosts, type=pa.string()),
                         "community": pa.array(hosts[lbl], type=pa.string())})
    return _lpa_bucketed(edges, src_col, dst_col, weight_col, rounds,
                         num_partitions or auto_partitions())


def _lpa_bucketed(edges, src_col, dst_col, weight_col, rounds, P
                  ) -> pa.Table:
    """Distributed LPA: symmetrize as a map + one (a, b) hash-bucket
    combine, then per round broadcast the label vector and reduce the
    per-block vote partials by node bucket — only n_hosts-bounded
    tables ever reach the driver."""
    import ray

    def sym_partial(b: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({
            src_col: np.asarray(b[src_col], dtype=object),
            dst_col: np.asarray(b[dst_col], dtype=object),
            weight_col: np.asarray(b[weight_col], dtype=np.int64),
        })
        return pa.Table.from_pandas(
            _symmetrize(pdf, src_col, dst_col, weight_col),
            preserve_index=False)

    def sym_combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "a" not in df.columns:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype="int64")})
        g = df.groupby(["a", "b"], as_index=False).agg(w=("w", "sum"))
        g["w"] = g["w"].astype("int64")
        return g

    parts = edges.map_batches(sym_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    und = (hash_bucket(parts, "a", P).groupby("_part")
           .map_groups(sym_combine, batch_format="pandas")
           ).materialize()  # consumed per round; sym_combine drops _part
    hosts = _collect_hosts(und, ("a",))
    hosts_ref = ray.put(hosts)
    lbl = np.arange(len(hosts), dtype=np.int64)
    for _ in range(rounds):
        lbl_ref = ray.put(lbl)

        def vote_partial(b: pa.Table, *, _h=hosts_ref, _l=lbl_ref
                         ) -> pa.Table:
            hs = ray.get(_h) if isinstance(_h, ray.ObjectRef) else _h
            lv = ray.get(_l) if isinstance(_l, ray.ObjectRef) else _l
            ai = np.searchsorted(hs, np.asarray(b["a"], dtype=object))
            bi = np.searchsorted(hs, np.asarray(b["b"], dtype=object))
            w = np.asarray(b["w"], dtype=np.int64)
            df = pd.DataFrame({"node": ai, "lab": lv[bi], "w": w})
            g = df.groupby(["node", "lab"], as_index=False).agg(
                w=("w", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        def vote_winner(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "node" not in df.columns:
                return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                     "lab": pd.Series([], dtype="int64")})
            g = df.groupby(["node", "lab"], as_index=False).agg(
                w=("w", "sum"))
            g = g.sort_values(["node", "w", "lab"],
                              ascending=[True, False, True])
            g = g.drop_duplicates("node")
            return g[["node", "lab"]].astype("int64")

        votes = und.map_batches(vote_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
        wins = (hash_bucket(votes, "node", P).groupby("_part")
                .map_groups(vote_winner, batch_format="pandas")
                .to_pandas())
        nxt = lbl.copy()
        if len(wins):
            nxt[wins["node"].to_numpy(dtype=np.int64)] = \
                wins["lab"].to_numpy(dtype=np.int64)
        lbl = nxt
    return pa.table({"host": pa.array(hosts, type=pa.string()),
                     "community": pa.array(hosts[lbl], type=pa.string())})
