"""Similarity search + embedding-cosine near-dup over an embedding column
(list<float>), per the training-data-pipeline extension list.

- ``cosine_topk``: brute-force cosine top-k against a broadcast query
  matrix — the baseline ANN. Each batch computes a dense matmul against
  the queries (``ray.put`` once, fetched once per worker) and prunes to
  its local top-k, so only k x n_blocks x n_queries candidate rows reach
  the driver-side final merge.
- ``embedding_dup_pairs``: near-duplicate pairs with cosine >= threshold.
  Small corpora broadcast the full normalized matrix (one-sided matmul
  per batch, no shuffle); the scale path is hyperplane-LSH bucketing
  (``hyperplane_bucket``) + within-bucket verification, same candidate
  machinery shape as MinHash-LSH.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(col, dim: int | None = None) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    values = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    d = dim or (len(values) // max(1, n))
    return values.reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _TopKScorer:
    """Actor-pool stage holding the broadcast (normalized) query matrix."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        import ray

        self.q = ray.get(q_ref)  # (n_queries, d), already normalized
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        m = _normalize(_matrix(batch[self.vec_col], self.q.shape[1]))
        scores = m @ self.q.T  # (n, q)
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            s = scores[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            out_q.append(np.full(len(top), qi, dtype=np.int64))
            out_id.append(ids[top])
            out_s.append(s[top])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_id),
                "cosine": np.concatenate(out_s),
            }
        )


def cosine_topk(ds, query_matrix: np.ndarray, k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                concurrency: int | tuple[int, int] | None = None) -> pa.Table:
    """Dataset with an embedding column -> Arrow table
    (query_id, vec_id, rank, cosine), rank 1..k per query, deterministic
    tie-break on vec_id."""
    import ray

    from deduplicator_ray.util import auto_concurrency

    concurrency = concurrency or auto_concurrency()
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_ref = ray.put(q)
    partial = ds.map_batches(
        _TopKScorer,
        fn_constructor_args=(q_ref, k, id_col, vec_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
    pdf = partial.to_pandas()  # k x n_blocks x n_queries rows — small
    pdf = pdf.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        pdf[["query_id", "vec_id", "rank", "cosine"]], preserve_index=False
    )


class _DupScorer:
    def __init__(self, ref, threshold: float, id_col: str, vec_col: str):
        import ray

        self.ids, self.m = ray.get(ref)  # (N,), (N, d) normalized
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        m = _normalize(_matrix(batch[self.vec_col], self.m.shape[1]))
        scores = m @ self.m.T  # (n, N)
        ai, bi = np.nonzero(scores >= self.threshold)
        a = ids[ai]
        b = self.ids[bi]
        keep = a < b  # dedupe + drop self
        return pa.table(
            {"a": a[keep], "b": b[keep], "cosine": scores[ai, bi][keep]}
        )


def embedding_dup_pairs(ds, threshold: float = 0.95, *, id_col: str = "vec_id",
                        vec_col: str = "embedding", max_broadcast: int = 1_000_000,
                        concurrency: int | tuple[int, int] | None = None):
    """All pairs (a < b) with cosine >= threshold.

    Broadcast variant: the full normalized matrix is ray.put once
    (guarded by ``max_broadcast`` rows) and every batch matmuls against
    it — embarrassingly parallel, no shuffle. Beyond the guard, bucket
    with ``hyperplane_bucket`` and verify within buckets."""
    import ray

    from deduplicator_ray.util import auto_concurrency

    concurrency = concurrency or auto_concurrency()
    ref_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    if len(ref_tbl) > max_broadcast:
        raise ValueError(
            f"corpus too large to broadcast ({len(ref_tbl)} > {max_broadcast}); "
            "use hyperplane_bucket + per-bucket verification"
        )
    ids = ref_tbl[id_col].to_numpy(np.int64)
    m = _normalize(np.stack(ref_tbl[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, m))
    return ds.map_batches(
        _DupScorer,
        fn_constructor_args=(ref, threshold, id_col, vec_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def hyperplane_bucket(ds, *, n_planes: int = 16, seed: int = 42,
                      vec_col: str = "embedding"):
    """Scale path for embedding dedup / ANN: sign-random-projection LSH.
    Adds ``hp_bucket`` (int64): the n_planes-bit sign pattern of the
    embedding against a fixed random hyperplane set. Cosine-close vectors
    collide w.h.p.; group/join on hp_bucket, verify within buckets."""

    state = {"planes": None}

    def f(b: pa.Table) -> pa.Table:
        m = _normalize(_matrix(b[vec_col]))
        if state["planes"] is None or state["planes"].shape[1] != m.shape[1]:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.standard_normal((n_planes, m.shape[1]))
        signs = (m @ state["planes"].T) > 0  # (n, n_planes)
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(n_planes):
            bucket |= signs[:, i].astype(np.int64) << i
        return b.append_column("hp_bucket", pa.array(bucket))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
