"""Near-duplicate clustering pipeline: MinHash -> LSH -> verify -> CC
(north_rule core). Produces a (doc_key, cluster_id) assignment plus the
cluster table over the corpus.

Partitioning assumptions, stated explicitly:
- signature computation is embarrassingly parallel (actor pool);
- the only all-to-all exchanges are (1) the band-bucket groupby, keyed on
  bands x 64-bit bucket hashes (band index folded in = natural salt), and
  (2) the distinct-pair groupby over verified tiny rows;
- connected components defaults to driver union-find because verified
  edges << docs by construction (LSH + Jaccard filter); the distributed
  hash-min path exists for adversarial graphs (see stages/cc.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicator_ray.config import MinHashConfig
from deduplicator_ray.stages.cc import (
    connected_components_auto,
    connected_components_distributed,
)
from deduplicator_ray.stages.lsh import band_explode, candidate_pairs, verified_edges
from deduplicator_ray.stages.minhash import signatures


def ensure_doc_key(ds, *, key_col: str = "doc_key"):
    """Attach a stable int64 doc key when absent: vectorized 64-bit
    siphash (fixed key) of "url|warc_ts" (deterministic across
    runs/workers/nodes; collision odds at 10^12 docs ~ 2.7e-5 —
    acceptable for clustering, and any collision only over-merges one
    pair of docs).  One ``hash_pandas_object`` call per batch — this is
    the first stage of the north-star pipeline and must never run
    row-at-a-time Python."""
    import pandas as pd

    def f(b: pa.Table) -> pa.Table:
        if key_col in b.column_names:
            return b
        if "url" not in b.column_names:
            # documents-style table: a unique int id column IS the key
            for alt in ("doc_id", "id"):
                if alt in b.column_names:
                    return b.append_column(key_col, b[alt].cast(pa.int64()))
            raise ValueError(
                f"cannot derive {key_col}: need url+warc_ts or a doc_id/id column"
            )
        urls = b["url"].to_pandas().astype("string").fillna("")
        ts = (
            b["warc_ts"].cast(pa.int64()).to_pandas().astype("Int64").astype("string").fillna("")
        )
        keys = (
            pd.util.hash_pandas_object(urls + "|" + ts, index=False)
            .to_numpy()
            .astype(np.uint64)
            >> np.uint64(1)  # keep positive in int64
        ).astype(np.int64)
        return b.append_column(key_col, pa.array(keys, type=pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def incremental_neardup(
    new_ds,
    old_ds,
    cfg: MinHashConfig | None = None,
    *,
    key_col: str = "doc_key",
    text_col: str = "text",
    old_is_signatures: bool = False,
    num_buckets: int = 32,
    verify: str = "est",
    exact_ngram: int = 5,
    exact_num: int = 4,
    exact_den: int = 5,
):
    """Dedup a NEW crawl against an EXISTING corpus (snapshot-over-
    snapshot dedup): returns (doc_key, dup_of, est_jaccard) with ONE row
    per new doc that near-duplicates an old doc — its best old match
    (highest estimated Jaccard, smallest old key on ties).

    ``verify="exact"`` swaps the estimator verification for EXACT word
    ``exact_ngram``-gram Jaccard on the LSH candidate pairs (integer
    threshold ``exact_num/exact_den``; the LSH-candidates +
    exact-verify recipe of Lee et al. 2021) and returns
    (doc_key, dup_of, n_inter, n_union) — best match by true Jaccard
    (ties to the smallest old key).  This output is fully
    SQL-recomputable (the driver oracle recomputes it all-pairs in
    DuckDB), modulo LSH recall, which is pytest-gated >= 0.99 and
    ~1 - 5e-8 per pair at the configured banding.  Exact mode needs old
    TEXT, so it rejects ``old_is_signatures=True``.

    This is the incremental workflow the snapshot pipeline can't express:
    new-vs-new and old-vs-old pairs are explicitly NOT candidates, only
    the cross join matters.  Shape: both sides' signatures are parity-
    tagged (old key k -> 2k, new -> 2k+1; keys are non-negative int64 by
    construction so 2k+1 never overflows) and ride the SAME band-explode
    -> candidate-pairs -> verify machinery as the snapshot pipeline;
    same-side pairs are dropped by a parity test on the 16-byte pair
    stream before any signature bytes attach.  ``old_is_signatures=True``
    skips re-shingling a corpus whose (doc_key, minhash_sig) table was
    persisted at its own ingest — the production path: signatures are
    computed once per snapshot, ever.

    Recall caveat (same as the snapshot pipeline): banding is
    probabilistic and mega-bucket star degradation can skip a direct
    cross pair; recall >= 0.99 at the configured threshold is pytest-
    gated.  Output is deterministic (seeded permutations, total
    tie-break)."""
    import ray.data as rd  # noqa: F401  (parity with sibling pipeline imports)

    from deduplicator_ray.stages.exact import hash_bucket

    if verify not in ("est", "exact"):
        raise ValueError(f"verify must be 'est' or 'exact', got {verify!r}")
    if verify == "exact" and old_is_signatures:
        raise ValueError("verify='exact' needs the old side's text; "
                         "old_is_signatures=True only carries signatures")
    cfg = cfg or MinHashConfig()

    def tagger(side: int):
        def f(b: pa.Table) -> pa.Table:
            k = b[key_col].to_numpy().astype(np.int64)
            tagged = (k.astype(np.uint64) * np.uint64(2) + np.uint64(side)).view(
                np.int64
            )
            return b.set_column(
                b.column_names.index(key_col), key_col, pa.array(tagged)
            )
        return f

    def side_sigs(ds, side: int, is_sigs: bool):
        if not is_sigs:
            ds = signatures(
                ensure_doc_key(ds, key_col=key_col).select_columns(
                    [key_col, text_col]
                ),
                cfg, text_col=text_col,
            )
        return ds.map_batches(tagger(side), batch_format="pyarrow",
                              zero_copy_batch=True)

    # one pinned signature table feeds both the band explode and the
    # verify join (same justification as the snapshot pipeline)
    sigs = side_sigs(old_ds, 0, old_is_signatures).union(
        side_sigs(new_ds, 1, False)
    ).materialize()

    from deduplicator_ray.stages.lsh import band_explode as _bands
    from deduplicator_ray.stages.lsh import candidate_pairs as _pairs
    from deduplicator_ray.stages.lsh import verified_edges as _verify

    pairs = _pairs(_bands(sigs, cfg, key_col=key_col), cfg, key_col=key_col)

    def cross_only(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        return b.filter(pa.array(((a ^ bb) & 1) == 1))

    pairs = pairs.map_batches(cross_only, batch_format="pyarrow",
                              zero_copy_batch=True)

    if verify == "exact":
        import ray

        from deduplicator_ray.stages.jaccard import _gram_hashes, pack_u64_blobs
        from deduplicator_ray.stages.lsh import attach_signatures

        def grams_table(b: pa.Table) -> pa.Table:
            arr = pack_u64_blobs(
                [_gram_hashes(t, exact_ngram) for t in b[text_col].to_pylist()])
            return pa.table({key_col: b[key_col], "gramblob": arr})

        # same ensure_doc_key normalization the signature side applies:
        # a corpus keyed by doc_id/id or url+warc_ts must work in exact
        # mode exactly like it does in est mode
        texts = (
            ensure_doc_key(old_ds, key_col=key_col)
            .select_columns([key_col, text_col])
            .map_batches(tagger(0), batch_format="pyarrow", zero_copy_batch=True)
            .union(ensure_doc_key(new_ds, key_col=key_col)
                   .select_columns([key_col, text_col])
                   .map_batches(tagger(1), batch_format="pyarrow",
                                zero_copy_batch=True))
        )
        # shingle ONLY the candidate keys: LSH makes candidates a small
        # minority of the corpus, so re-shingling every doc (signatures
        # already cost one full pass) would roughly double the corpus
        # scan for rows attach_signatures' join discards anyway.  Same
        # driver guard as verified_edges: collect the distinct pair
        # keys when the pair set is small (the realistic regime);
        # beyond it, full shingling is the safe fallback.
        pairs = pairs.materialize()
        if pairs.count() <= 500_000:
            pdf = pairs.to_pandas()
            cand = np.unique(np.concatenate([
                pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)]
            ) if len(pdf) else [np.empty(0, np.int64)])
            cref = ray.put(cand)

            def semi(b: pa.Table) -> pa.Table:
                from deduplicator_ray.util import isin_sorted

                want = ray.get(cref)
                k = b[key_col].to_numpy().astype(np.int64)
                return b.filter(pa.array(isin_sorted(want, k)))

            texts = texts.map_batches(semi, batch_format="pyarrow",
                                      zero_copy_batch=True)
        blobs = texts.map_batches(grams_table, batch_format="pyarrow",
                                  batch_size=1024,
                                  zero_copy_batch=True).materialize()
        withblobs = attach_signatures(pairs, blobs, key_col=key_col,
                                      sig_col="gramblob")

        def exact_verify(b: pa.Table) -> pa.Table:
            n = b.num_rows
            ia = np.zeros(n, dtype=np.int64)
            iu = np.zeros(n, dtype=np.int64)
            for i, (ba, bb) in enumerate(zip(b["sig_a"].to_pylist(),
                                             b["sig_b"].to_pylist())):
                ga = np.frombuffer(ba, dtype="<u8")
                gb = np.frombuffer(bb, dtype="<u8")
                inter = len(np.intersect1d(ga, gb, assume_unique=True))
                ia[i] = inter
                iu[i] = len(ga) + len(gb) - inter
            keep = (ia > 0) & (exact_den * ia >= exact_num * iu)
            t = b.filter(pa.array(keep))
            return pa.table({"a": t["a"], "b": t["b"],
                             "n_inter": pa.array(ia[keep]),
                             "n_union": pa.array(iu[keep])})

        edges = withblobs.map_batches(exact_verify, batch_format="pyarrow",
                                      batch_size=4096, zero_copy_batch=True)
        val_cols = ["n_inter", "n_union"]
    else:
        edges = _verify(pairs, sigs, cfg, key_col=key_col)
        val_cols = ["est_jaccard"]

    def decode(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        a_new = (a & 1) == 1
        new_k = np.where(a_new, a, bb) >> 1
        old_k = np.where(a_new, bb, a) >> 1
        out = {
            "doc_key": pa.array(new_k.astype(np.int64)),
            "dup_of": pa.array(old_k.astype(np.int64)),
        }
        for c in val_cols:
            out[c] = b[c]
        return pa.table(out)

    decoded = edges.map_batches(decode, batch_format="pyarrow",
                                zero_copy_batch=True)
    bucketed = hash_bucket(decoded, "doc_key", num_buckets)

    def best(g):
        import pandas as pd  # noqa: F811

        if verify == "exact":
            # true Jaccard as IEEE double — the same division the SQL
            # oracle orders by, so ties break identically
            g = g.assign(_j=g["n_inter"].to_numpy(np.float64)
                         / g["n_union"].to_numpy(np.float64))
            g = g.sort_values(["doc_key", "_j", "dup_of"],
                              ascending=[True, False, True], kind="mergesort")
        else:
            g = g.sort_values(["doc_key", "est_jaccard", "dup_of"],
                              ascending=[True, False, True], kind="mergesort")
        return g.drop_duplicates("doc_key", ignore_index=True)[
            ["doc_key", "dup_of"] + val_cols
        ]

    return bucketed.groupby("_part").map_groups(best, batch_format="pandas")


def cluster_near_duplicates(
    corpus_ds,
    cfg: MinHashConfig | None = None,
    *,
    key_col: str = "doc_key",
    text_col: str = "text",
    distributed_cc: bool = False,
):
    """corpus (needs text + doc_key/url+warc_ts) ->
    (edges_ds, assignments) where assignments is an Arrow table or
    Dataset of (doc_key, cluster_id) for every doc in some cluster.

    Docs not present in assignments are singletons (cluster_id = own key).
    """
    cfg = cfg or MinHashConfig()
    ds = ensure_doc_key(corpus_ds, key_col=key_col)
    # shed payload columns before anything wide: only key + text go on.
    # Signatures are materialized ONCE (keys + num_perms*4 B/doc): they
    # feed both the band explode and the verify join, and without pinning
    # each consumer would recompute the shingling.
    sigs = signatures(
        ds.select_columns([key_col, text_col]), cfg, text_col=text_col
    ).materialize()
    bands = band_explode(sigs, cfg, key_col=key_col)
    pairs = candidate_pairs(bands, cfg, key_col=key_col)
    edges = verified_edges(pairs, sigs, cfg, key_col=key_col).materialize()
    if distributed_cc:
        assignments = connected_components_distributed(edges)
    else:
        # counted guard: driver union-find while edges stay collectable,
        # automatic switch to distributed hash-min beyond the limit
        assignments = connected_components_auto(edges)
    return edges, assignments
