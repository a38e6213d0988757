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


def _unionfind(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # keep the smaller id as root -> deterministic cluster ids
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    return {x: find(x) for x in parent}


def connected_components_driver(edges_ds) -> "pa.Table":
    """Collect edges (small by construction) and union-find on the driver.
    Returns an Arrow table (doc_key, cluster_id)."""
    pdf = edges_ds.select_columns(["a", "b"]).to_pandas()
    if len(pdf) == 0:
        return pa.table({"doc_key": pa.array([], type=pa.int64()),
                         "cluster_id": pa.array([], type=pa.int64())})
    roots = _unionfind(pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64))
    nodes = np.unique(np.concatenate([pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)]))
    labels = np.array([roots.get(int(n), int(n)) for n in nodes], dtype=np.int64)
    return pa.table({"doc_key": nodes, "cluster_id": labels})


def connected_components_distributed(edges_ds, *, max_rounds: int = 10):
    """Hash-min label propagation as repeated groupby-min shuffles.

    Per round: messages = (dst=v, label=l(u)) for every directed edge
    (u, v) plus the self message (v, l(v)); new labels = min per dst.
    Converged when no label changed (checked with a tiny aggregate).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    def symmetrize(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], dtype=np.int64)
        bb = np.asarray(b["b"], dtype=np.int64)
        return pa.table(
            {"src": np.concatenate([a, bb]), "dst": np.concatenate([bb, a])}
        )

    edges = edges_ds.select_columns(["a", "b"]).map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # reused every round; edge set is the small side

    # initial labels: label(v) = min neighbor (including self)
    def init_msgs(b: pa.Table) -> pa.Table:
        src = np.asarray(b["src"], dtype=np.int64)
        dst = np.asarray(b["dst"], dtype=np.int64)
        return pa.table({"doc_key": dst, "label": np.minimum(src, dst)})

    labels = (
        edges.map_batches(init_msgs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_key")
        .aggregate(Min("label", alias_name="cluster_id"))
        .materialize()
    )

    for _ in range(max_rounds):
        lab_pdf = None
        # messages: join labels to edges on src — labels are (shrinking)
        # per-node rows; propagate via map_groups-free hash join
        joined = edges.join(
            labels.rename_columns({"doc_key": "src", "cluster_id": "label"}),
            join_type="inner",
            on=("src",),
            num_partitions=max(2, edges.num_blocks() if hasattr(edges, "num_blocks") else 8),
        )

        def msgs(b: pa.Table) -> pa.Table:
            return pa.table({"doc_key": b["dst"], "label": b["label"]})

        new_labels = (
            joined.map_batches(msgs, batch_format="pyarrow")
            .union(labels.rename_columns({"cluster_id": "label"}))
            .groupby("doc_key")
            .aggregate(Min("label", alias_name="cluster_id"))
            .materialize()
        )
        # convergence: compare sums of labels (monotone non-increasing per
        # node, so equal sum <=> no change)
        old_sum = labels.sum("cluster_id")
        new_sum = new_labels.sum("cluster_id")
        labels = new_labels
        if old_sum == new_sum:
            break
    return labels
