"""Connected components over verified near-dup edges (north-star
extension; SURVEY.md §7.2 step 6).

Two execution paths, chosen by edge count:

- **driver union-find** (default for edges << docs, the realistic regime:
  candidate edges are a tiny fraction of the corpus): collect (a, b)
  int64 pairs — NOT the docs — and run path-compressed union-find on the
  driver. Cluster id = smallest doc_key in the component (deterministic).

- **distributed hash-min label propagation** for adversarial edge counts:
  iterate  label[v] <- min(label[v], min over neighbors label[u])  as
  groupby-min rounds until fixpoint.  Each round is one shuffle keyed on
  the node id; near-dup clusters have tiny diameters so rounds are few
  (bounded by ``max_rounds``, with convergence detected by a changed-count
  aggregate).

Both return a Dataset (doc_key, cluster_id) covering every node that
appears in an edge; singleton docs keep cluster_id == their own doc_key
(the caller left-joins / fills).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _cc_labels(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over int64 edge arrays: compact the
    node ids with ``np.unique``, then iterate min-label edge relaxation +
    pointer jumping (each round is whole-array numpy — no per-edge Python).
    Rounds needed ~ log(diameter).  Returns (nodes, cluster_label_per_node)
    where the label is the component's minimum node id (deterministic)."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a):]
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(labels[ai], labels[bi])
        new = labels.copy()
        np.minimum.at(new, ai, m)
        np.minimum.at(new, bi, m)
        new = np.minimum(new, new[new])  # pointer jumping halves chains
        if np.array_equal(new, labels):
            break
        labels = new
    # full path compression to the component root
    while True:
        nl = labels[labels]
        if np.array_equal(nl, labels):
            break
        labels = nl
    # label is an index into the ascending-sorted nodes array, so the
    # root index maps to the component's minimum doc_key
    return nodes, nodes[labels]


def _unionfind(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Back-compat shim over ``_cc_labels``: node -> component root (the
    component's minimum node id) for every node appearing in an edge."""
    nodes, labels = _cc_labels(a, b)
    return dict(zip(nodes.tolist(), labels.tolist()))


def connected_components_driver(edges_ds) -> "pa.Table":
    """Collect edges (small by construction) and run the vectorized
    union-find on the driver. Returns an Arrow table (doc_key, cluster_id)."""
    pdf = edges_ds.select_columns(["a", "b"]).to_pandas()
    if len(pdf) == 0:
        return pa.table({"doc_key": pa.array([], type=pa.int64()),
                         "cluster_id": pa.array([], type=pa.int64())})
    nodes, labels = _cc_labels(
        pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)
    )
    return pa.table({"doc_key": nodes, "cluster_id": labels})


# Above this many edges the driver path would materialize an edge table
# that no longer counts as "small" (hundreds of MB of int64 pairs); the
# distributed hash-min path takes over automatically.
DRIVER_EDGE_LIMIT = 20_000_000


def connected_components_auto(edges_ds, *, driver_edge_limit: int = DRIVER_EDGE_LIMIT,
                              num_buckets: int = 64):
    """Counted guard: edge sets small enough to collect run the driver
    union-find (one numpy pass); boilerplate-heavy crawls whose verified
    edge count exceeds ``driver_edge_limit`` switch to the distributed
    hash-min propagation without the caller having to know."""
    edges_ds = edges_ds.materialize()  # counted AND iterated — pin once
    if edges_ds.count() <= driver_edge_limit:
        return connected_components_driver(edges_ds)
    return connected_components_distributed(edges_ds, num_buckets=num_buckets)


def connected_components_distributed(edges_ds, *, max_rounds: int = 50,
                                     num_buckets: int = 64):
    """Hash-min label propagation, one hash-bucket shuffle + vectorized
    per-bucket reduce per round (no per-key Python, no Acero joins).

    Per round: co-locate edges (bucketed on src) with labels (bucketed on
    doc_key); inside each bucket a pandas merge emits messages
    (dst, label(src)); messages ∪ current labels re-bucket on doc_key and
    a per-bucket groupby-min produces the new labels.  Converged when the
    (monotone non-increasing) label sum stops changing — a cheap scalar
    aggregate over the per-node rows.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def symmetrize(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], dtype=np.int64)
        bb = np.asarray(b["b"], dtype=np.int64)
        return pa.table(
            {"src": np.concatenate([a, bb]), "dst": np.concatenate([bb, a])}
        )

    edges = edges_ds.select_columns(["a", "b"]).map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # reused every round; edge set is the small side

    def _min_per_key(msgs_ds):
        """(doc_key, label) rows -> per-key min, one vectorized reduce
        per hash bucket."""
        bp = hash_bucket(msgs_ds, "doc_key", num_buckets)

        def reduce_min(g):
            g = g.drop(columns=["_part"])
            out = g.groupby("doc_key", as_index=False)["label"].min()
            return out.rename(columns={"label": "cluster_id"}).astype("int64")

        return bp.groupby("_part").map_groups(reduce_min, batch_format="pandas").materialize()

    # initial labels: label(v) = min neighbor (including self)
    def init_msgs(b: pa.Table) -> pa.Table:
        src = np.asarray(b["src"], dtype=np.int64)
        dst = np.asarray(b["dst"], dtype=np.int64)
        return pa.table({"doc_key": dst, "label": np.minimum(src, dst)})

    labels = _min_per_key(
        edges.map_batches(init_msgs, batch_format="pyarrow", zero_copy_batch=True)
    )

    converged = False
    for _ in range(max_rounds):
        # co-partition: edges keyed by src, labels keyed by doc_key
        def edge_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {"key": b["src"], "dst": b["dst"],
                 "label": pa.nulls(b.num_rows, pa.int64()),
                 "side": pa.array(np.zeros(b.num_rows, dtype=np.int8))}
            )

        def label_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {"key": b["doc_key"], "dst": pa.nulls(b.num_rows, pa.int64()),
                 "label": b["cluster_id"],
                 "side": pa.array(np.ones(b.num_rows, dtype=np.int8))}
            )

        both = hash_bucket(
            edges.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True).union(
                labels.map_batches(label_rows, batch_format="pyarrow", zero_copy_batch=True)
            ),
            "key",
            num_buckets,
        )

        def propagate(g):
            import pandas as pd

            e = g[g["side"] == 0][["key", "dst"]]
            l = g[g["side"] == 1][["key", "label"]]
            if e.empty or l.empty:
                return pd.DataFrame({"doc_key": pd.Series([], dtype="int64"),
                                     "label": pd.Series([], dtype="int64")})
            m = e.merge(l, on="key", how="inner")
            return pd.DataFrame(
                {"doc_key": m["dst"].astype("int64"), "label": m["label"].astype("int64")}
            )

        msgs = both.groupby("_part").map_groups(propagate, batch_format="pandas")
        new_labels = _min_per_key(
            msgs.union(
                labels.map_batches(
                    lambda b: pa.table({"doc_key": b["doc_key"], "label": b["cluster_id"]}),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        )
        # convergence: label sums are monotone non-increasing per node
        old_sum = labels.sum("cluster_id")
        new_sum = new_labels.sum("cluster_id")
        labels = new_labels
        if old_sum == new_sum:
            converged = True
            break
    if not converged:
        # hash-min needs ~component-diameter rounds; a chain-shaped graph
        # (possible via star-degraded mega-buckets chained across LSH
        # buckets) that exhausts the budget has WRONG labels — fail loudly
        # rather than return silently-incorrect cluster ids
        raise RuntimeError(
            f"connected_components_distributed did not converge within "
            f"{max_rounds} rounds; raise max_rounds (rounds needed ~= max "
            f"component diameter)"
        )
    return labels
