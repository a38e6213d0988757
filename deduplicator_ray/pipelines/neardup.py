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
