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
import pyarrow.compute as pc


def _matrix(col, dim: int | None = None) -> np.ndarray:
    """list<float> (or tensor-extension) column -> (n, d) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    if isinstance(arr, pa.ExtensionArray):
        # Ray's ArrowTensorArray (from_pandas over ndarray cells)
        v = arr.to_numpy(zero_copy_only=False)
        if v.dtype == object:
            return np.stack(v).astype(np.float64)
        return np.asarray(v, dtype=np.float64).reshape(len(arr), -1)
    values = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    d = dim or (len(values) // max(1, n))
    return values.reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


# Per-process broadcast cache (task-pool pattern, see minhash.signatures):
# worker processes are reused across tasks, so each worker fetches the
# query/centroid broadcast from the object store ONCE — a stateful actor
# pool would add ramp-up/queueing cost for the same effect (measured on
# MinHash: task pool 2.6x faster at fixed cpus).
_BCAST_CACHE: dict[bytes, object] = {}


def _bcast(ref):
    import ray

    key = ref.binary()
    val = _BCAST_CACHE.get(key)
    if val is None:
        val = ray.get(ref)
        # keep-last eviction: one live broadcast per worker process.  An
        # unbounded cache would pin every query/centroid matrix (and its
        # plasma buffer — the numpy view is zero-copy) for the worker's
        # lifetime, growing RSS monotonically across repeated top-k calls
        _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = val
    return val


# Per-process grow-only scratch arenas.  The score kernels reuse ONE
# float64 buffer per role across tasks instead of letting numpy allocate
# a fresh multi-MB region per call: glibc services those via mmap/munmap,
# and on hosts with a slow or serialized page-fault path (lazily faulted
# VM memory — this sandbox; also cold NUMA pages on real clusters) the
# first-touch faults dominate the kernel at high concurrency (measured
# here: per-process fault bandwidth collapses ~20x at 16 concurrent
# workers).  Worker processes are reused across tasks, so the arena is
# paid once per process.
_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, shape: tuple[int, ...]) -> np.ndarray:
    need = 1
    for s in shape:
        need *= int(s)
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < need:
        buf = np.empty(need, dtype=np.float64)
        _SCRATCH[name] = buf
    return buf[:need].reshape(shape)


def _normalize_into(m: np.ndarray, out: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return np.divide(m, norms, out=out)


# 256 queries x 2048 corpus rows x 8 B = 4 MiB score tile — L3-resident,
# so the dgemm output never streams to DRAM (the full q @ m.T for a 32k
# batch is 64 MiB and memory-bound; blocked evaluation is the FAISS
# brute-force pattern and is bitwise-identical on the kept candidates)
_TOPK_CHUNK = 2048


def _topk_per_query(qi: np.ndarray, vid: np.ndarray, s: np.ndarray, k: int):
    """Candidate triples -> top-k per query with the same deterministic
    tie-break as the driver merge (score desc, vec_id asc)."""
    order = np.lexsort((vid, -s, qi))
    qi, vid, s = qi[order], vid[order], s[order]
    starts = np.flatnonzero(np.r_[True, qi[1:] != qi[:-1]])
    counts = np.diff(np.r_[starts, len(qi)])
    ranks = np.arange(len(qi)) - np.repeat(starts, counts)
    keep = ranks < k
    return qi[keep], vid[keep], s[keep]


def _chunked_topk(q: np.ndarray, m: np.ndarray, ids: np.ndarray, k: int,
                  masked_rows=None):
    """Blocked brute-force top-k: score (n_queries x chunk) tiles into a
    reused scratch buffer, keep each tile's per-query top-k (kth-from-top
    argpartition — no negated copy of the score matrix), then merge the
    k x n_chunks candidates per query.  ``masked_rows``, if given, is a
    callable chunk-slice -> (n_queries, chunk_len) bool of DISALLOWED
    scores (IVF probe masking): masked entries are set to -inf in place."""
    nq, n = len(q), len(m)
    if n == 0 or nq == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.float64)
    outs_q, outs_i, outs_s = [], [], []
    arange_q = np.arange(nq, dtype=np.int64)
    for s0 in range(0, n, _TOPK_CHUNK):
        s1 = min(n, s0 + _TOPK_CHUNK)
        nc = s1 - s0
        tile = _scratch("score_tile", (nq, nc))
        np.dot(q, m[s0:s1].T, out=tile)
        if masked_rows is not None:
            tile[masked_rows(s0, s1)] = -np.inf
        kk = min(k, nc)
        if kk < nc:
            idx = np.argpartition(tile, nc - kk, axis=1)[:, nc - kk:]
            vals = np.take_along_axis(tile, idx, axis=1)
        else:
            idx = np.broadcast_to(np.arange(nc), (nq, nc))
            vals = tile.copy()  # tile is reused next iteration
        outs_q.append(np.repeat(arange_q, idx.shape[1]))
        outs_i.append(ids[s0 + idx.ravel()])
        outs_s.append(vals.ravel())
    return _topk_per_query(
        np.concatenate(outs_q), np.concatenate(outs_i), np.concatenate(outs_s), k
    )


def _topk_score_batch(batch: pa.Table, q_ref, k: int, id_col: str,
                      vec_col: str) -> pa.Table:
    q = _bcast(q_ref)  # (n_queries, d), already normalized
    ids = np.asarray(batch[id_col], dtype=np.int64)
    raw = _matrix(batch[vec_col], q.shape[1])
    m = _normalize_into(raw, _scratch("corpus", raw.shape))
    out_q, out_id, out_s = _chunked_topk(q, m, ids, k)
    return pa.table({"query_id": out_q, "vec_id": out_id, "cosine": out_s})


def cosine_topk(ds, query_matrix: np.ndarray, k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                batch_size: int = 4096) -> pa.Table:
    """Dataset with an embedding column -> Arrow table
    (query_id, vec_id, rank, cosine), rank 1..k per query, deterministic
    tie-break on vec_id.  Task-pool stage (per-process broadcast cache),
    so concurrency follows the streaming executor's cpu budget.  Raise
    ``batch_size`` for small-dim corpora (bigger matmuls per task, fewer
    partial rows to the driver merge); keep it modest at high dim so
    batch x d x 8 B stays in the worker heap."""
    import ray

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_ref = ray.put(q)
    partial = ds.map_batches(
        _topk_score_batch,
        fn_kwargs={"q_ref": q_ref, "k": k, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow",
        batch_size=batch_size,
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
                        allow_approximate: bool = True,
                        concurrency: int | tuple[int, int] | None = None):
    """All pairs (a < b) with cosine >= threshold.

    Broadcast variant (corpus row count <= ``max_broadcast``): the full
    normalized matrix is ray.put once and every batch matmuls against it
    — embarrassingly parallel, no shuffle. Beyond the guard the pipeline
    switches to banded hyperplane LSH + exact-cosine verify
    (``embedding_dup_pairs_bucketed``): output pairs stay exact
    (precision 1), but candidate RECALL is probabilistic (>= 0.99 at the
    default banding, pytest-gated) — a loud warning marks the switch, the
    LSH path runs with ``overflow='error'`` so mega-buckets can never
    silently drop pairs on top of the banding miss rate, and callers that
    need the strict all-pairs contract pass ``allow_approximate=False``
    to get a hard error instead."""
    import ray

    from deduplicator_ray.util import auto_concurrency

    concurrency = concurrency or auto_concurrency()
    # pin once: for transformed inputs, count() would otherwise execute
    # the upstream chain and the collect below would execute it AGAIN
    ds = ds.materialize()
    n = ds.count()
    if n > max_broadcast:
        if not allow_approximate:
            raise ValueError(
                f"corpus has {n} rows > max_broadcast={max_broadcast} and "
                "allow_approximate=False: the exact broadcast all-pairs path "
                "cannot hold the full matrix; raise max_broadcast or opt into "
                "the banded-LSH path (allow_approximate=True, recall >= 0.99)"
            )
        import warnings

        warnings.warn(
            f"embedding_dup_pairs: corpus ({n} rows) exceeds max_broadcast="
            f"{max_broadcast}; switching to banded hyperplane-LSH + exact-"
            "cosine verify — pair recall is ~0.99+, no longer exhaustive "
            "(pass allow_approximate=False to forbid this)",
            stacklevel=2,
        )
        return embedding_dup_pairs_bucketed(
            ds, threshold, id_col=id_col, vec_col=vec_col, overflow="error"
        )
    ref_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
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


# Per-process hyperplane cache (same pattern as minhash.signatures' task
# pool: worker processes are reused, so the seeded RNG work runs once per
# process instead of once per task; outputs are identical either way).
_PLANE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _hyperplanes(seed: int, n_planes: int, dim: int) -> np.ndarray:
    key = (seed, n_planes, dim)
    planes = _PLANE_CACHE.get(key)
    if planes is None:
        planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
        _PLANE_CACHE[key] = planes
    return planes


def _blob_matrix(col, *, dtype="<f8") -> np.ndarray:
    """Fixed-width binary column of serialized vectors -> (n, d) matrix,
    decoded straight from the Arrow buffers (mirror of lsh._sig_matrix)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    itemsize = np.dtype(dtype).itemsize
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[col.offset: col.offset + n + 1]
    width = (offsets[1] - offsets[0]) // itemsize
    if col.null_count == 0 and offsets[-1] - offsets[0] == n * width * itemsize:
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        return (
            data[offsets[0]: offsets[0] + n * width * itemsize]
            .view(dtype)
            .reshape(n, width)
            .astype(np.float64, copy=False)
        )
    blobs = col.to_pylist()
    return np.stack([np.frombuffer(b, dtype=dtype) for b in blobs]).astype(np.float64)


def _vec_blob_table(b: pa.Table, id_col: str, vec_col: str) -> pa.Table:
    """(id, list<float>) batch -> (id, vecblob) with the NORMALIZED float64
    vector serialized to a fixed-width binary blob (joins/shuffles move
    binary payloads; Acero can't move fixed_size_list)."""
    m = _normalize(_matrix(b[vec_col]))
    n, d = m.shape
    blob = m.astype("<f8").tobytes()
    offsets = np.arange(n + 1, dtype=np.int32) * (8 * d)
    arr = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)]
    )
    return pa.table({id_col: b[id_col], "vecblob": arr})


def embedding_dup_pairs_bucketed(ds, threshold: float, *, id_col: str = "vec_id",
                                 vec_col: str = "embedding", n_tables: int = 32,
                                 planes_per_table: int = 4, seed: int = 42,
                                 num_partitions: int = 64, overflow: str = "star"):
    """Scale path for embedding near-dup: banded sign-random-projection
    LSH (Charikar, STOC'02) + exact-cosine verification.

    Shape mirrors the MinHash/LSH pipeline exactly:
      vectors -> (band_bucket, id) rows (one per hash table; the table
      index is folded into the bucket hash = natural salt)
      -> candidate_pairs (hash-bucket shuffle, vectorized pair gen, mega
         buckets degrade to stars, global pair dedupe)
      -> attach_signatures joins the serialized vectors to the DISTINCT
         pairs only (vector bytes never ride the band shuffle)
      -> exact float64 cosine >= threshold filter.

    Recall: a pair at cosine c collides in one table w.p.
    p = (1 - arccos(c)/pi)^planes_per_table and overall
    1 - (1-p)^n_tables; the defaults give >= 0.99 for c >= 0.4
    (pytest-gated in tests/test_stages2.py). Output pairs are exact
    (verified), so precision is 1 by construction."""
    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.lsh import attach_signatures, candidate_pairs

    base = ds.map_batches(
        lambda b: _vec_blob_table(b, id_col, vec_col),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True,
    ).materialize()  # feeds both the band explode and the verify join

    def bands(b: pa.Table) -> pa.Table:
        m = _blob_matrix(b["vecblob"])
        n = len(m)
        if n == 0:
            return pa.table({"band_bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        planes = _hyperplanes(seed, n_tables * planes_per_table, m.shape[1])
        signs = (m @ planes.T) > 0  # (n, tables*planes)
        buckets = []
        weights = (np.uint64(1) << np.arange(planes_per_table, dtype=np.uint64))
        for t in range(n_tables):
            pat = signs[:, t * planes_per_table: (t + 1) * planes_per_table]
            code = (pat.astype(np.uint64) * weights[None, :]).sum(axis=1)
            # fold the table index in (same mixing as lsh._band_hash seeds)
            with np.errstate(over="ignore"):
                salt = np.uint64((t * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
                h = (code ^ salt) * np.uint64(0x100000001B3)
            buckets.append(h.astype(np.int64))
        return pa.table(
            {"band_bucket": np.concatenate(buckets),
             id_col: np.tile(np.asarray(b[id_col], dtype=np.int64), n_tables)}
        )

    band_rows = base.map_batches(bands, batch_format="pyarrow", batch_size=4096,
                                 zero_copy_batch=True)
    pairs = candidate_pairs(band_rows, MinHashConfig(), key_col=id_col,
                            num_partitions=num_partitions, overflow=overflow)
    withvecs = attach_signatures(pairs, base, key_col=id_col, sig_col="vecblob")

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ma = _blob_matrix(b["sig_a"])
        mb = _blob_matrix(b["sig_b"])
        cos = np.einsum("ij,ij->i", ma, mb)
        keep = cos >= threshold
        t = b.filter(pa.array(keep))
        return pa.table({"a": t["a"], "b": t["b"], "cosine": pa.array(cos[keep])})

    return withvecs.map_batches(verify, batch_format="pyarrow", batch_size=4096,
                                zero_copy_batch=True)


def incremental_embed_dedup(new_ds, old_ds, *, threshold: float = 0.9,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            max_broadcast: int = 2_000_000,
                            num_buckets: int = 32):
    """Snapshot-over-snapshot SEMANTIC dedup: one row per NEW vector
    whose best OLD match has cosine >= ``threshold`` ->
    (vec_id, dup_of, cos_micro) — the embedding-space complement of
    ``pipelines/neardup.py::incremental_neardup`` (same side contract,
    same best-match election: highest similarity, smallest old id on
    ties; cosine reported in 1e-6 integer units so the DuckDB mirror
    compares exactly, the decontaminate_embed convention).

    Shape: the OLD side broadcasts once via ``ray.put`` when it fits
    ``max_broadcast`` rows (ids sorted ascending, so argmax's
    first-occurrence rule IS the smallest-old-id tie break) and the new
    corpus streams through one map-only matmul — no shuffle.  Beyond
    the cap, sides are parity-tagged (old 2k / new 2k+1) and ride the
    banded sign-random-projection machinery
    (``embedding_dup_pairs_bucketed``) with a cross-parity filter and a
    per-new hash-bucket argmax reduce; recall is then banding-bound
    like every LSH path (>= 0.99 at the default tables for cosines in
    the threshold regime, pytest-gated)."""
    import ray
    import ray.data as rd  # noqa: F401

    from deduplicator_ray.stages.exact import hash_bucket

    old_mat = old_ds.select_columns([id_col, vec_col]).materialize()
    n_old = old_mat.count()
    if n_old <= max_broadcast:
        ids_l, vecs_l = [], []
        for b in old_mat.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                ids_l.append(np.asarray(b[id_col], dtype=np.int64))
                vecs_l.append(_normalize(_matrix(b[vec_col])))
        if not ids_l:
            return rd.from_arrow(pa.table({
                id_col: pa.array([], pa.int64()),
                "dup_of": pa.array([], pa.int64()),
                "cos_micro": pa.array([], pa.int64())}))
        ids = np.concatenate(ids_l)
        order = np.argsort(ids, kind="stable")
        ref = ray.put((ids[order], np.concatenate(vecs_l)[order]))

        def f(b: pa.Table) -> pa.Table:
            oid, on = ray.get(ref)
            nid = np.asarray(b[id_col], dtype=np.int64)
            if not len(nid):
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "dup_of": pa.array([], pa.int64()),
                                 "cos_micro": pa.array([], pa.int64())})
            cos = _normalize(_matrix(b[vec_col])) @ on.T
            best = np.argmax(cos, axis=1)
            bc = cos[np.arange(len(nid)), best]
            keep = bc >= threshold
            return pa.table({
                id_col: pa.array(nid[keep]),
                "dup_of": pa.array(oid[best[keep]]),
                "cos_micro": pa.array(
                    np.floor(bc[keep] * 1e6 + 0.5).astype(np.int64)),
            })

        return new_ds.select_columns([id_col, vec_col]).map_batches(
            f, batch_format="pyarrow", zero_copy_batch=True)

    # beyond-broadcast: parity-tag and ride the bucketed pair machinery
    def tagger(side: int):
        def f(b: pa.Table) -> pa.Table:
            k = np.asarray(b[id_col], dtype=np.int64)
            tagged = (k.astype(np.uint64) * np.uint64(2)
                      + np.uint64(side)).view(np.int64)
            return b.set_column(b.column_names.index(id_col), id_col,
                                pa.array(tagged))
        return f

    both = (old_mat.map_batches(tagger(0), batch_format="pyarrow",
                                zero_copy_batch=True)
            .union(new_ds.select_columns([id_col, vec_col])
                   .map_batches(tagger(1), batch_format="pyarrow",
                                zero_copy_batch=True)))
    pairs = embedding_dup_pairs_bucketed(both, threshold, id_col=id_col,
                                         vec_col=vec_col)

    def decode(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        cross = ((a ^ bb) & 1) == 1
        a, bb = a[cross], bb[cross]
        cos = b["cosine"].to_numpy()[cross]
        a_new = (a & 1) == 1
        return pa.table({
            id_col: pa.array(np.where(a_new, a, bb) >> 1),
            "dup_of": pa.array(np.where(a_new, bb, a) >> 1),
            "cosine": pa.array(cos),
        })

    decoded = pairs.map_batches(decode, batch_format="pyarrow",
                                zero_copy_batch=True)
    bucketed = hash_bucket(decoded, id_col, num_buckets)

    def best(g):
        g = g.sort_values([id_col, "cosine", "dup_of"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates(id_col, ignore_index=True)
        g["cos_micro"] = np.floor(
            g["cosine"].to_numpy(np.float64) * 1e6 + 0.5).astype(np.int64)
        return g[[id_col, "dup_of", "cos_micro"]]

    return bucketed.groupby("_part").map_groups(best, batch_format="pandas")


def _hash_sample(ds, id_col: str, vec_col: str, n_rows: int,
                 oversample: int = 4) -> np.ndarray:
    """Uniform, deterministic, input-order-independent sample of
    ``n_rows`` vectors: keep rows whose siphash(id) falls under an
    oversampled threshold, then trim to the ``n_rows`` smallest hashes.
    A ``limit(n)`` sample is the FIRST n rows — on a sorted/clustered
    corpus that biases the k-means quantizer to one region and silently
    degrades partial-probe recall; hashing the id decouples the sample
    from physical order.  One bounded extra scan of (id, vec)."""
    import pandas as pd

    total = ds.count()
    if total <= n_rows:
        # sort by id: to_pandas() concatenates blocks in ARRIVAL order,
        # which varies run to run — an unsorted sample re-seeds k-means
        # differently each run and breaks quantizer determinism
        pdf = ds.select_columns([id_col, vec_col]).to_pandas()
        pdf = pdf.sort_values(id_col, kind="mergesort")
        return np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    frac = min(1.0, oversample * n_rows / total)
    thresh = np.uint64(min((1 << 64) - 1, int(frac * float(1 << 64))))

    def samp(b: pa.Table) -> pa.Table:
        ids = pd.Series(np.asarray(b[id_col], dtype=np.int64))
        h = pd.util.hash_pandas_object(ids, index=False).to_numpy()
        keep = h < thresh
        t = b.select([vec_col]).filter(pa.array(keep))
        return t.append_column("_h", pa.array(h[keep], type=pa.uint64()))

    pdf = ds.select_columns([id_col, vec_col]).map_batches(
        samp, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    ).to_pandas()
    pdf = pdf.sort_values("_h", kind="mergesort").head(n_rows)
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float64)


def _kmeans_fit(sample: np.ndarray, k: int, *, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side sample -> (k, d) normalized
    centroids.  Deterministic (seeded init, fixed iteration count)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def _ivf_score_batch(batch: pa.Table, ref, k: int, id_col: str,
                     vec_col: str) -> pa.Table:
    """Task-pool IVF scorer: coarse-assign the batch, score only against
    queries probing each row's list (mask), vectorized local top-k."""
    centroids, q, mask = _bcast(ref)
    ids = np.asarray(batch[id_col], dtype=np.int64)
    raw = _matrix(batch[vec_col], q.shape[1])
    m = _normalize_into(raw, _scratch("corpus", raw.shape))
    coarse = _scratch("coarse", (len(m), len(centroids)))
    lists = np.argmax(np.dot(m, centroids.T, out=coarse), axis=1)
    # rows NOT probed by a query score -inf (mask is (n_lists, n_queries))
    out_q, out_id, out_s = _chunked_topk(
        q, m, ids, k, masked_rows=lambda s0, s1: ~mask[lists[s0:s1]].T
    )
    keep = out_s > -np.inf
    return pa.table({"query_id": out_q[keep], "vec_id": out_id[keep],
                     "cosine": out_s[keep]})


def ivf_topk(ds, query_matrix: np.ndarray, k: int = 10, *,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_lists: int = 64, n_probe: int = 8,
             train_sample: int = 10_000) -> pa.Table:
    """IVF-style ANN top-k — the similarity-search scale path.

    Index: k-means coarse quantizer trained on a driver-side sample
    (bounded by ``train_sample``), centroids broadcast via ``ray.put``;
    every batch assigns its vectors to their nearest centroid (one
    matmul).  Search: each query probes only its ``n_probe`` nearest
    centroid lists; per batch, vectors are scored ONLY against the
    queries probing their list (mask from one small matmul), then pruned
    to the local top-k — same partial/merge shape as ``cosine_topk`` but
    touching ~n_probe/n_lists of the score work.  Exact recall is not
    guaranteed (pytest gates it against brute force on planted data);
    ``cosine_topk`` remains the exact baseline."""
    import ray

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    m_sample = _hash_sample(ds, id_col, vec_col, train_sample)
    centroids = _kmeans_fit(m_sample, n_lists)
    # per-query probe set -> boolean (n_lists, n_queries) probe mask
    probe_order = np.argsort(-(q @ centroids.T), axis=1)[:, : min(n_probe, len(centroids))]
    probe_mask = np.zeros((len(centroids), len(q)), dtype=bool)
    for qi, lists in enumerate(probe_order):
        probe_mask[lists, qi] = True
    ref = ray.put((centroids, q, probe_mask))
    partial = ds.map_batches(
        _ivf_score_batch,
        fn_kwargs={"ref": ref, "k": k, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow",
        batch_size=4096,
        zero_copy_batch=True,
    )
    pdf = partial.to_pandas()
    pdf = pdf.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
    pdf = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        pdf[["query_id", "vec_id", "rank", "cosine"]], preserve_index=False
    )


def hyperplane_bucket(ds, *, n_planes: int = 16, seed: int = 42,
                      vec_col: str = "embedding"):
    """Scale path for embedding dedup / ANN: sign-random-projection LSH.
    Adds ``hp_bucket`` (int64): the n_planes-bit sign pattern of the
    embedding against a fixed random hyperplane set. Cosine-close vectors
    collide w.h.p.; group/join on hp_bucket, verify within buckets."""

    def f(b: pa.Table) -> pa.Table:
        m = _normalize(_matrix(b[vec_col]))
        planes = _hyperplanes(seed, n_planes, m.shape[1])
        signs = (m @ planes.T) > 0  # (n, n_planes)
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(n_planes):
            bucket |= signs[:, i].astype(np.int64) << i
        return b.append_column("hp_bucket", pa.array(bucket))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


def embedding_dedup_keep(ds, threshold: float = 0.95, *, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_broadcast_removals: int = 50_000_000,
                         num_buckets: int = 64):
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540
    — simplified: the dup graph comes from a cosine threshold rather than
    k-means cluster interiors): connect every pair with cosine >=
    ``threshold`` (``embedding_dup_pairs``), take connected components,
    keep ONE representative per component (the min id — deterministic);
    singletons keep.  Returns (id_col, keep:bool) for every input row.

    Scale shape: the removal id set is bounded by the number of clustered
    non-representatives.  Up to ``max_broadcast_removals`` it is sorted,
    ``ray.put`` ONCE, and the corpus pass is a map-only searchsorted —
    no shuffle touches the vectors.  Beyond that (a corpus that is
    mostly duplicates) the flag switches to a hash-bucket co-partition
    of (corpus ids, removal ids) — still key-only traffic; embedding
    payloads never enter any shuffle in either path.
    """
    import ray

    from deduplicator_ray.stages.cc import connected_components_auto
    from deduplicator_ray.stages.exact import hash_bucket

    pairs = embedding_dup_pairs(ds, threshold, id_col=id_col, vec_col=vec_col)
    edges = pairs.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    asg = connected_components_auto(edges)
    # NOTE: Ray Datasets also expose .to_pandas(), so hasattr can't
    # distinguish the driver-path pa.Table from the distributed path
    if isinstance(asg, pa.Table):  # driver CC path
        apdf = asg.to_pandas()
        removals = np.sort(apdf.loc[apdf["doc_key"] != apdf["cluster_id"],
                                    "doc_key"].to_numpy(np.int64))
        n_removals = len(removals)
    else:  # distributed Dataset path: count before deciding how to ship
        rem_ds = asg.map_batches(
            lambda b: pa.table({"id": pc.filter(
                b["doc_key"], pc.not_equal(b["doc_key"], b["cluster_id"]))}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        n_removals = rem_ds.count()
        removals = None

    ids_only = ds.select_columns([id_col])

    if n_removals <= max_broadcast_removals:
        if removals is None:
            removals = np.sort(rem_ds.to_pandas()["id"].to_numpy(np.int64))
        ref = ray.put(removals)

        def flag(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy().astype(np.int64)
            rem = ray.get(ref)
            if len(rem):
                pos = np.searchsorted(rem, ids)
                is_dup = (pos < len(rem)) & (rem[np.minimum(pos, len(rem) - 1)] == ids)
            else:
                is_dup = np.zeros(len(ids), dtype=bool)
            return pa.table({id_col: pa.array(ids), "keep": pa.array(~is_dup)})

        return ids_only.map_batches(flag, batch_format="pyarrow",
                                    zero_copy_batch=True)

    # co-partition fallback: tag removal ids (src=0) and corpus ids (src=1)
    if removals is not None:  # driver CC path: lift the array into a Dataset
        import ray.data as rd

        rem_ds = rd.from_arrow(pa.table({"id": pa.array(removals,
                                                        type=pa.int64())}))

    def tag(src):
        def f(b: pa.Table) -> pa.Table:
            col = b["id"] if src == 0 else b[id_col]
            n = len(col)
            return pa.table({id_col: col.cast(pa.int64()),
                             "src": pa.array(np.full(n, src, dtype=np.int8))})
        return f

    union = ids_only.map_batches(tag(1), batch_format="pyarrow",
                                 zero_copy_batch=True).union(
        rem_ds.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
    )

    def reduce_flag(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        rem = np.sort(g.loc[g["src"] == 0, id_col].to_numpy(np.int64))
        cur = g.loc[g["src"] == 1, id_col].to_numpy(np.int64)
        if len(rem):
            pos = np.searchsorted(rem, cur)
            is_dup = (pos < len(rem)) & (rem[np.minimum(pos, len(rem) - 1)] == cur)
        else:
            is_dup = np.zeros(len(cur), dtype=bool)
        return pd.DataFrame({id_col: cur, "keep": ~is_dup})

    return hash_bucket(union, id_col, num_buckets).groupby("_part").map_groups(
        reduce_flag, batch_format="pandas")


def kmeans_centroids(ds, *, k: int = 8, iters: int = 3,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """The centroid loop of ``kmeans_assign``, exposed so composed
    operators (``semdedup_keep``) can assign AND carry payload in one
    map pass instead of joining assignments back to vectors.  Returns
    the (k, d) float64 centroid matrix after ``iters`` Lloyd rounds
    under the same deterministic contract as ``kmeans_assign``.

    Deterministic contract (the DuckDB oracle recomputes it exactly):
    initial centroids are the vectors of the ``k`` smallest ids, cluster
    labels 0..k-1 in that id order; ``iters`` Lloyd rounds; an empty
    cluster keeps its previous centroid; distance ties assign to the
    lowest cluster label.  All arithmetic is float64 (exact float32
    upcast on both sides).

    Scale shape: NO shuffle anywhere.  Init is a per-block k-smallest
    prune + tiny driver merge; each round broadcasts the (k, d) centroid
    matrix once (``ray.put``) and one map-only pass emits k*(d+1)
    partial-sum cells per block; the driver reduces k*(d+1) numbers per
    block and updates centroids.  The final pass emits (id, cluster).
    """
    import ray

    if k < 1 or iters < 0:
        raise ValueError("k must be >= 1 and iters >= 0")

    def local_min(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        order = np.argsort(ids, kind="stable")[:k]
        return b.take(pa.array(np.sort(order)))

    seed = (ds.select_columns([id_col, vec_col])
            .map_batches(local_min, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas().sort_values(id_col, kind="mergesort").head(k))
    if len(seed) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seed)}")
    cent = np.stack([np.asarray(v, dtype=np.float64)
                     for v in seed[vec_col].to_numpy()])
    d = cent.shape[1]

    for _ in range(iters):
        cref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cref)
            X = _matrix(b[vec_col], dim=d)
            a = _kmeans_argmin(X, c)
            onehot = (a[:, None] == np.arange(k)[None, :]).astype(np.float64)
            sums = onehot.T @ X                      # (k, d)
            cnts = np.bincount(a, minlength=k).astype(np.float64)
            cells = np.concatenate([sums, cnts[:, None]], axis=1).ravel()
            cl = np.repeat(np.arange(k, dtype=np.int64), d + 1)
            dim = np.tile(np.arange(d + 1, dtype=np.int64), k)
            return pa.table({"cl": pa.array(cl), "dim": pa.array(dim),
                             "s": pa.array(cells)})

        agg = (ds.select_columns([vec_col])
               .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
               .to_pandas().groupby(["cl", "dim"], sort=True)["s"].sum()
               .to_numpy().reshape(k, d + 1))
        cnts = agg[:, d]
        live = cnts > 0
        cent = np.where(live[:, None], agg[:, :d] /
                        np.maximum(cnts, 1.0)[:, None], cent)

    return cent


def _kmeans_argmin(X: np.ndarray, c: np.ndarray) -> np.ndarray:
    # argmin ||x - c||^2 = argmin(-2 x.c + ||c||^2); ties -> first
    return np.argmin(X @ (-2.0 * c.T) + (c * c).sum(axis=1), axis=1)


def kmeans_assign(ds, *, k: int = 8, iters: int = 3,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed Lloyd's k-means assignments: run the
    ``kmeans_centroids`` loop, broadcast the final matrix once, one
    map-only pass emits (id, cluster).  See kmeans_centroids for the
    deterministic contract the DuckDB oracle recomputes."""
    import ray

    cent = kmeans_centroids(ds, k=k, iters=iters, id_col=id_col,
                            vec_col=vec_col)
    d = cent.shape[1]
    cref = ray.put(cent)

    def final(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        X = _matrix(b[vec_col], dim=d)
        return pa.table({id_col: b[id_col],
                         "cluster": pa.array(_kmeans_argmin(X, c).astype(np.int64))})

    return ds.select_columns([id_col, vec_col]).map_batches(
        final, batch_format="pyarrow", zero_copy_batch=True)


def semdedup_keep(ds, *, k: int = 8, iters: int = 3, threshold: float = 0.9,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  num_buckets: int | None = None, sim_chunk: int = 4096):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-blocked
    semantic dedup -> Dataset (vec_id, cluster BIGINT, is_duplicate
    bool).  A vector is a duplicate iff a LOWER-id vector in the SAME
    k-means cluster has cosine similarity >= ``threshold`` — the
    paper's within-cluster pruning with a deterministic keep-lowest-id
    rule (greedy, not transitive: contrast embedding_dedup_keep's
    connected-components semantics).

    Scale shape: the ``kmeans_centroids`` loop is shuffle-free; ONE
    map pass assigns clusters while carrying the vector; ONE
    cluster-key shuffle co-locates each cluster; the per-cluster kernel
    is a normalized-matmul scan in ``sim_chunk``-column tiles, so peak
    memory is n_cluster x sim_chunk, not n_cluster^2.  Partitioning
    assumption (the paper's own regime): ``k`` is sized so the largest
    cluster fits one worker — at 10^9 vectors that means k ~ n/100k,
    not this default demo k.
    """
    import ray

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    cent = kmeans_centroids(ds, k=k, iters=iters, id_col=id_col,
                            vec_col=vec_col)
    d = cent.shape[1]
    cref = ray.put(cent)
    P = num_buckets or min(auto_partitions(), max(1, k))

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        X = _matrix(b[vec_col], dim=d)
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "cluster": pa.array(_kmeans_argmin(X, c).astype(np.int64)),
            vec_col: b[vec_col],
        })

    labeled = ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
    labeled = hash_bucket(labeled, "cluster", P)

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        outs = []
        for cl, grp in g.groupby("cluster", sort=False):
            grp = grp.sort_values(id_col, kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in grp[vec_col].to_numpy()])
            n = len(X)
            dup = _greedy_dup_flags(X, threshold, sim_chunk)
            outs.append(pd.DataFrame({
                id_col: grp[id_col].to_numpy(np.int64),
                "cluster": np.full(n, cl, dtype=np.int64),
                "is_duplicate": dup,
            }))
        if not outs:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "is_duplicate": pd.Series(dtype="bool")})
        return pd.concat(outs, ignore_index=True)

    return (labeled.groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def prototypicality(ds, *, k: int = 8, iters: int = 3,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """SSL-prototype pruning metric (Sorscher et al. 2022,
    arXiv:2206.14486 "Beyond neural scaling laws"): per vector, the
    cosine similarity to its k-means cluster centroid -> Dataset
    (vec_id, cluster BIGINT, proto_micro BIGINT).  High similarity =
    prototypical (the paper prunes prototypical examples in the
    abundant-data regime and keeps them when data is scarce); the score
    ships as integer micros (floor(x*1e6 + 0.5)) so the DuckDB oracle
    value-hashes exactly despite cross-engine float summation order.

    Shape: the shuffle-free kmeans_centroids loop, then ONE map-only
    pass — assign + cosine to own centroid per block.  No shuffle.
    """
    import ray

    cent = kmeans_centroids(ds, k=k, iters=iters, id_col=id_col,
                            vec_col=vec_col)
    d = cent.shape[1]
    cnorm = np.linalg.norm(cent, axis=1)
    cref = ray.put((cent, cnorm))

    def score(b: pa.Table) -> pa.Table:
        c, cn = ray.get(cref)
        X = _matrix(b[vec_col], dim=d)
        a = _kmeans_argmin(X, c)
        xn = np.linalg.norm(X, axis=1)
        dots = np.einsum("ij,ij->i", X, c[a])
        denom = np.maximum(xn * cn[a], 1e-30)
        cos = dots / denom
        micro = np.floor(cos * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
            "proto_micro": pa.array(micro),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def _greedy_dup_flags(X: np.ndarray, threshold: float,
                      sim_chunk: int) -> np.ndarray:
    """SemDeDup's within-cluster greedy rule over id-sorted rows: row i
    is a duplicate iff some EARLIER row has cosine >= threshold.  Tiled
    normalized matmul: peak memory n x sim_chunk."""
    n = len(X)
    norms = np.linalg.norm(X, axis=1)
    Xn = X / np.maximum(norms, 1e-30)[:, None]
    dup = np.zeros(n, dtype=bool)
    row_idx = np.arange(n)
    for j0 in range(0, n, sim_chunk):
        j1 = min(j0 + sim_chunk, n)
        S = Xn @ Xn[j0:j1].T
        lower = row_idx[:, None] < np.arange(j0, j1)[None, :]
        dup[j0:j1] |= (lower & (S >= threshold)).any(axis=0)
    return dup


def embedding_covariance(ds, *, vec_col: str = "embedding",
                         grid: int = 1000):
    """Distributed covariance of the embedding column — the
    second-moment pass PCA/whitening and Mahalanobis outlier scoring
    start from — computed EXACTLY over ``grid``-quantized vector
    elements: x_hat = floor(x*grid + 0.5) (half-up, mirrored verbatim
    by the SQL oracle), so every sum is integer, the cross-block
    reduction is order-independent, and the result is bit-deterministic
    at any parallelism with NO float-summation-order caveat at all.

    Shape: ONE map-only pass; each block emits its [sum x_hat,
    sum x_hat x_hat^T, count] int64 partial — O(d^2) per block,
    independent of row count; the driver reduces exact integers.

    Returns (mean (d,) float64, cov (d, d) float64, n, cov_num (d, d)
    int64): ``cov_num = n*sum(x_i x_j) - sum(x_i)*sum(x_j)`` over the
    quantized elements, i.e. n^2*grid^2 * cov — the integer numerator
    the driver oracle recomputes.  int64 envelope: |cov_num| <~
    n^2 * grid^2 * var; at grid=1000 that holds to ~10^6 rows of
    unit-scale vectors — beyond that, lower ``grid`` or shard the
    corpus and pool covariances."""
    d = None
    for b in ds.select_columns([vec_col]).limit(1).iter_batches(
            batch_format="pyarrow", batch_size=1):
        d = _matrix(b[vec_col]).shape[1]
        break
    if d is None:
        raise ValueError("empty dataset")
    n_cells = d + d * d + 1

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"j": z, "v": z})
        X = _matrix(b[vec_col], d)
        Xq = np.floor(X * grid + 0.5).astype(np.int64)
        vals = np.concatenate([Xq.sum(axis=0), (Xq.T @ Xq).ravel(),
                               [len(Xq)]])
        return pa.table({"j": pa.array(np.arange(n_cells, dtype=np.int64)),
                         "v": pa.array(vals)})

    pdf = ds.select_columns([vec_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    sums = pdf.groupby("j", sort=True)["v"].sum().to_numpy()
    n = int(sums[-1])
    s1 = sums[:d]
    s2 = sums[d:-1].reshape(d, d)
    cov_num = n * s2 - np.outer(s1, s1)
    mean = s1 / (grid * float(n))
    cov = cov_num / (float(grid) ** 2 * float(n) ** 2)
    return mean, cov, n, cov_num


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid, "Product quantization for
# nearest neighbor search", IEEE TPAMI 2011) — the memory-scale ANN path.
# At 10^12 vectors the float corpus cannot live anywhere (64-dim float32 =
# 256 B/vec -> 256 TB); PQ codes at m bytes/vec (default 8) compress 32-64x
# so the search index fits the cluster's aggregate object store, and the
# ADC scan reads m bytes per vector instead of d*8.
# ---------------------------------------------------------------------------


def _lloyd_l2(X: np.ndarray, k: int, *, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Plain (non-spherical) L2 Lloyd's on a driver-side sample ->
    (min(k, n), dsub) centroids.  Deterministic: seeded init without
    replacement, argmin distance ties to the lowest label, an empty
    cluster keeps its previous centroid."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    cent = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        a = _kmeans_argmin(X, cent)
        sums = np.zeros_like(cent)
        np.add.at(sums, a, X)
        cnt = np.bincount(a, minlength=k).astype(np.float64)
        live = cnt > 0
        cent[live] = sums[live] / cnt[live, None]
    return cent


def pq_train(sample: np.ndarray, *, n_subspaces: int = 8, n_centroids: int = 256,
             iters: int = 10, seed: int = 42) -> np.ndarray:
    """Train PQ codebooks on a NORMALIZED (n, d) sample -> (m, ksub, dsub)
    float64 codebook tensor: the vector space is split into m contiguous
    subspaces and each gets an independent L2 k-means codebook (the
    product-quantizer structure of Jegou et al. 2011, Sec. II).  ksub is
    capped at 256 so codes stay one byte per subspace."""
    n, d = sample.shape
    if n_subspaces < 1 or d % n_subspaces:
        raise ValueError(f"dim {d} not divisible by n_subspaces {n_subspaces}")
    if not (1 <= n_centroids <= 256):
        raise ValueError("n_centroids must be in [1, 256] (one-byte codes)")
    dsub = d // n_subspaces
    ksub = min(n_centroids, n)
    books = np.empty((n_subspaces, ksub, dsub), dtype=np.float64)
    for j in range(n_subspaces):
        books[j] = _lloyd_l2(sample[:, j * dsub:(j + 1) * dsub], ksub,
                             iters=iters, seed=seed + j)
    return books


def _pq_assign(m_norm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Nearest sub-centroid per subspace -> (n, m) uint8 codes.  One small
    matmul per subspace; ties resolve to the lowest code (argmin)."""
    M, _, dsub = books.shape
    codes = np.empty((len(m_norm), M), dtype=np.uint8)
    for j in range(M):
        codes[:, j] = _kmeans_argmin(m_norm[:, j * dsub:(j + 1) * dsub], books[j])
    return codes


def _codes_blob(codes: np.ndarray) -> pa.BinaryArray:
    n, M = codes.shape
    offsets = np.arange(n + 1, dtype=np.int32) * M
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(codes.tobytes())],
    )


def _blob_codes(col, n_subspaces: int) -> np.ndarray:
    """Fixed-width binary pqcode column -> (n, m) uint8, zero-copy off the
    Arrow data buffer when the column is dense."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, n_subspaces), dtype=np.uint8)
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[col.offset: col.offset + n + 1]
    if col.null_count == 0 and offsets[-1] - offsets[0] == n * n_subspaces:
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        return data[offsets[0]: offsets[0] + n * n_subspaces].reshape(n, n_subspaces)
    return np.stack([np.frombuffer(b, dtype=np.uint8) for b in col.to_pylist()])


def pq_encode(ds, books: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding", batch_size: int = 4096):
    """Dataset with an embedding column -> Dataset (id, pqcode binary[m]):
    the compressed search index.  Vectors are normalized before encoding
    (the ADC scores then approximate cosine).  Map-only: the codebook
    tensor is ray.put once and cached per worker process."""
    import ray

    ref = ray.put(books)
    d = books.shape[0] * books.shape[2]

    def enc(b: pa.Table) -> pa.Table:
        bks = _bcast(ref)
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pqcode": pa.array([], pa.binary())})
        m = _normalize(_matrix(b[vec_col], d))
        return pa.table({id_col: pc.cast(b[id_col], pa.int64()),
                         "pqcode": _codes_blob(_pq_assign(m, bks))})

    return ds.select_columns([id_col, vec_col]).map_batches(
        enc, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def pq_topk(ds, query_matrix: np.ndarray, k: int = 10, *,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_subspaces: int = 8, n_centroids: int = 256,
            train_sample: int = 10_000, rerank: int = 0,
            iters: int = 10, seed: int = 42, batch_size: int = 4096) -> pa.Table:
    """PQ-compressed ANN top-k (asymmetric distance computation, Jegou et
    al. 2011 Sec. IV): codebooks trained on a hash-sampled driver-side
    sample, the corpus encoded ONCE into m-byte codes (the only
    materialized state — 32-64x smaller than the float corpus), then a
    scan over the codes scores every vector against every query through a
    per-query (m x ksub) inner-product lookup table, one gather-add per
    subspace, no float vectors touched.

    ``rerank`` > 0 turns on exact re-ranking: the ADC scan keeps a
    shortlist of ``rerank`` candidates per query, their float vectors are
    fetched in one filtered map pass (shortlist ids broadcast sorted;
    bounded by n_queries x rerank rows), and exact cosine re-orders the
    shortlist — with shortlist recall 1 the output EQUALS the brute-force
    top-k, which is how the driver row pins this machinery against the
    same DuckDB oracle as ``cosine_topk``.  Partial-recall regimes are
    pytest recall-gated.

    Returns (query_id, vec_id, rank, cosine): ``cosine`` is the exact
    score when reranked, else the ADC approximation."""
    import pandas as pd
    import ray

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    nq, d = q.shape
    sample = _normalize(_hash_sample(ds, id_col, vec_col, train_sample))
    books = pq_train(sample, n_subspaces=n_subspaces, n_centroids=n_centroids,
                     iters=iters, seed=seed)
    M, ksub, dsub = books.shape
    codes_ds = pq_encode(ds, books, id_col=id_col, vec_col=vec_col,
                         batch_size=batch_size).materialize()
    # ADC lookup tables: lut[qi, j, c] = q_sub(qi, j) . centroid(j, c)
    lut = np.einsum("qjd,jkd->qjk", q.reshape(nq, M, dsub), books)
    lut_ref = ray.put(np.ascontiguousarray(lut))
    keep_n = max(k, rerank)

    def score(b: pa.Table) -> pa.Table:
        lt = _bcast(lut_ref)
        ids = np.asarray(b[id_col], dtype=np.int64)
        codes = _blob_codes(b["pqcode"], M)
        n = len(ids)
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"query_id": z, "vec_id": z, "adc": pa.array([], pa.float64())})
        tile = _scratch("adc_tile", (lt.shape[0], n))
        tile[:] = 0.0
        for j in range(M):
            tile += lt[:, j, codes[:, j]]
        kk = min(keep_n, n)
        if kk < n:
            idx = np.argpartition(tile, n - kk, axis=1)[:, n - kk:]
            vals = np.take_along_axis(tile, idx, axis=1)
        else:
            idx = np.broadcast_to(np.arange(n), (lt.shape[0], n))
            vals = tile.copy()
        qi = np.repeat(np.arange(lt.shape[0], dtype=np.int64), idx.shape[1])
        return pa.table({"query_id": qi, "vec_id": ids[idx.ravel()],
                         "adc": vals.ravel().copy()})

    pdf = codes_ds.map_batches(score, batch_format="pyarrow",
                               batch_size=batch_size, zero_copy_batch=True).to_pandas()
    pdf = pdf.sort_values(["query_id", "adc", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    short = pdf.groupby("query_id", sort=True).head(keep_n).reset_index(drop=True)

    if rerank <= 0:
        top = short.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        top["rank"] = top.groupby("query_id").cumcount() + 1
        return pa.Table.from_pandas(
            top.rename(columns={"adc": "cosine"})
               [["query_id", "vec_id", "rank", "cosine"]], preserve_index=False)

    # exact rerank: fetch the shortlist's float vectors (one filtered pass)
    need = np.unique(short["vec_id"].to_numpy(np.int64))
    need_ref = ray.put(need)  # sorted by construction of np.unique

    def gather(b: pa.Table) -> pa.Table:
        from deduplicator_ray.util import isin_sorted

        want = _bcast(need_ref)
        ids = np.asarray(b[id_col], dtype=np.int64)
        t = b.filter(pa.array(isin_sorted(want, ids)))
        return _vec_blob_table(t, id_col, vec_col)

    vecs = ds.select_columns([id_col, vec_col]).map_batches(
        gather, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True).to_pandas()
    vid = vecs[id_col].to_numpy(np.int64)
    V = np.stack([np.frombuffer(bts, dtype="<f8") for bts in vecs["vecblob"]]) \
        if len(vecs) else np.empty((0, d))
    row_of = pd.Series(np.arange(len(vid)), index=vid)
    rows = row_of[short["vec_id"].to_numpy(np.int64)].to_numpy()
    qs = short["query_id"].to_numpy(np.int64)
    short = short.assign(cosine=np.einsum("ij,ij->i", q[qs], V[rows]))
    short = short.sort_values(["query_id", "cosine", "vec_id"],
                              ascending=[True, False, True], kind="mergesort")
    top = short.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        top[["query_id", "vec_id", "rank", "cosine"]], preserve_index=False)


def d4_keep(ds, *, k: int = 8, iters: int = 3, threshold: float = 0.9,
            prune_frac: float = 0.25, id_col: str = "vec_id",
            vec_col: str = "embedding", num_buckets: int | None = None,
            sim_chunk: int = 4096):
    """D4 selection (Tirumala et al. 2023, arXiv:2308.12284 "D4:
    Improving LLM Pretraining via Document De-Duplication and
    Diversification"): SemDeDup, then prune the most PROTOTYPICAL
    ``prune_frac`` of each cluster's survivors -> Dataset (vec_id,
    cluster BIGINT, keep bool).

    Rules (deterministic, oracle-recomputable):
    - a vector whose lower-id same-cluster neighbor has cosine >=
      ``threshold`` is a semantic duplicate: keep = false;
    - survivors rank within their cluster by (cosine-to-centroid DESC,
      vec_id ASC) on the integer-micro score; ranks 1 ..
      floor(n_survivors * prune_frac) — the near-centroid mass D4
      diversifies away — get keep = false; the rest keep = true.

    Shape: kmeans_centroids is shuffle-free; ONE map pass assigns
    clusters and carries the vector; ONE cluster-key shuffle; the
    per-cluster kernel reuses the tiled greedy-dup scan and scores
    centroids from the broadcast matrix.  Same partitioning assumption
    as semdedup_keep (k sized so a cluster fits one worker).
    """
    import ray

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    if not (0.0 <= prune_frac < 1.0):
        raise ValueError("prune_frac must be in [0, 1)")
    cent = kmeans_centroids(ds, k=k, iters=iters, id_col=id_col,
                            vec_col=vec_col)
    d = cent.shape[1]
    cnorm = np.linalg.norm(cent, axis=1)
    cref = ray.put((cent, cnorm))
    P = num_buckets or min(auto_partitions(), max(1, k))

    def assign(b: pa.Table) -> pa.Table:
        c, _ = ray.get(cref)
        X = _matrix(b[vec_col], dim=d)
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "cluster": pa.array(_kmeans_argmin(X, c).astype(np.int64)),
            vec_col: b[vec_col],
        })

    labeled = ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
    labeled = hash_bucket(labeled, "cluster", P)

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        c, cn = ray.get(cref)
        outs = []
        for cl, grp in g.groupby("cluster", sort=False):
            grp = grp.sort_values(id_col, kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in grp[vec_col].to_numpy()])
            n = len(X)
            dup = _greedy_dup_flags(X, threshold, sim_chunk)
            xn = np.linalg.norm(X, axis=1)
            cos = (X @ c[cl]) / np.maximum(xn * cn[cl], 1e-30)
            pm = np.floor(cos * 1e6 + 0.5).astype(np.int64)
            ids = grp[id_col].to_numpy(np.int64)
            keep = ~dup
            surv = np.flatnonzero(keep)
            if len(surv):
                order = surv[np.lexsort((ids[surv], -pm[surv]))]
                n_prune = int(np.floor(len(surv) * prune_frac))
                keep[order[:n_prune]] = False
            outs.append(pd.DataFrame({
                id_col: ids,
                "cluster": np.full(n, cl, dtype=np.int64),
                "keep": keep,
            }))
        if not outs:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "keep": pd.Series(dtype="bool")})
        return pd.concat(outs, ignore_index=True)

    return (labeled.groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def ivfpq_topk(ds, query_matrix: np.ndarray, k: int = 10, *,
               id_col: str = "vec_id", vec_col: str = "embedding",
               n_lists: int = 16, n_probe: int = 4,
               n_subspaces: int = 8, n_centroids: int = 256,
               train_sample: int = 10_000, rerank: int = 50,
               iters: int = 10, seed: int = 42,
               batch_size: int = 4096) -> pa.Table:
    """IVF+PQ ANN top-k (Jegou et al. 2011 Sec. V — the FAISS IVFPQ
    layout): a k-means coarse quantizer routes every vector to a list,
    the RESIDUAL (v - centroid) is product-quantized to m bytes, and the
    stored index is (id, list, code) SORTED BY LIST so blocks are
    list-pure.  A query probes its ``n_probe`` nearest lists: blocks
    whose lists no query probes are skipped outright (the partition
    pruning that makes IVF pay at cluster scale — each probe reads only
    its lists' partitions), probed blocks are scored by residual ADC
    (score = q.centroid_list + sum_j LUT[q, j, code_j]) and pruned to a
    per-query shortlist; exact cosine reranks the shortlist (one
    filtered gather pass, same machinery as ``pq_topk``).

    With full probing and shortlist recall 1 the output EQUALS brute
    force (the pytest gate); partial-probe recall is gated on planted
    clusters.  Returns (query_id, vec_id, rank, cosine) — exact cosine
    after rerank."""
    import pandas as pd
    import ray

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    nq, d = q.shape
    sample = _normalize(_hash_sample(ds, id_col, vec_col, train_sample))
    centroids = _kmeans_fit(sample, n_lists, iters=iters, seed=seed)
    L = len(centroids)
    assign = np.argmax(sample @ centroids.T, axis=1)
    books = pq_train(sample - centroids[assign], n_subspaces=n_subspaces,
                     n_centroids=n_centroids, iters=iters, seed=seed)
    M, ksub, dsub = books.shape
    enc_ref = ray.put((centroids, books))

    def encode(b: pa.Table) -> pa.Table:
        cents, bks = _bcast(enc_ref)
        ids = np.asarray(b[id_col], dtype=np.int64)
        m = _normalize(_matrix(b[vec_col], d))
        lists = np.argmax(m @ cents.T, axis=1)
        res = m - cents[lists]
        codes = np.empty((len(m), M), dtype=np.uint8)
        for j in range(M):
            sub = res[:, j * dsub: (j + 1) * dsub]
            # argmin ||r - c||^2 = argmin(|c|^2 - 2 r.c)
            d2 = (bks[j] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ bks[j].T)
            codes[:, j] = np.argmin(d2, axis=1)
        offsets = np.arange(len(m) + 1, dtype=np.int32) * M
        arr = pa.BinaryArray.from_buffers(
            pa.binary(), len(m),
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(codes.tobytes())])
        return pa.table({id_col: pa.array(ids), "list_id": pa.array(
            lists.astype(np.int64)), "pqcode": arr})

    # the stored index: 17-byte rows, list-pure blocks (partition pruning)
    codes_ds = (ds.select_columns([id_col, vec_col])
                .map_batches(encode, batch_format="pyarrow",
                             batch_size=batch_size, zero_copy_batch=True)
                .sort("list_id").materialize())

    qdotc = q @ centroids.T                      # (nq, L) list constants
    probe_order = np.argsort(-qdotc, axis=1)[:, : min(n_probe, L)]
    probe_mask = np.zeros((L, nq), dtype=bool)
    for qi, lists in enumerate(probe_order):
        probe_mask[lists, qi] = True
    lut = np.einsum("qjd,jkd->qjk", q.reshape(nq, M, dsub), books)
    scan_ref = ray.put((np.ascontiguousarray(lut), qdotc, probe_mask))
    keep_n = max(k, rerank)

    def scan(b: pa.Table) -> pa.Table:
        lt, qc, mask = _bcast(scan_ref)
        z = pa.array([], pa.int64())
        empty = pa.table({"query_id": z, "vec_id": z,
                          "adc": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        lists = np.asarray(b["list_id"], dtype=np.int64)
        if not mask[np.unique(lists)].any():
            return empty                          # block-level skip
        ids = np.asarray(b[id_col], dtype=np.int64)
        codes = _blob_codes(b["pqcode"], M)
        n = len(ids)
        tile = _scratch("ivfpq_tile", (nq, n))
        np.copyto(tile, qc[:, lists])
        for j in range(M):
            tile += lt[:, j, codes[:, j]]
        tile[~mask[lists].T] = -np.inf
        kk = min(keep_n, n)
        idx = (np.argpartition(tile, n - kk, axis=1)[:, n - kk:]
               if kk < n else
               np.broadcast_to(np.arange(n), (nq, n)))
        vals = np.take_along_axis(tile, idx, axis=1)
        qi = np.repeat(np.arange(nq, dtype=np.int64), idx.shape[1])
        vid = ids[idx.ravel()]
        adc = vals.ravel()
        keep = adc > -np.inf
        return pa.table({"query_id": qi[keep], "vec_id": vid[keep],
                         "adc": adc[keep].copy()})

    pdf = codes_ds.map_batches(scan, batch_format="pyarrow",
                               batch_size=batch_size,
                               zero_copy_batch=True).to_pandas()
    if pdf.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    pdf = pdf.sort_values(["query_id", "adc", "vec_id"],
                          ascending=[True, False, True], kind="mergesort")
    short = pdf.groupby("query_id", sort=True).head(keep_n).reset_index(drop=True)

    need = np.unique(short["vec_id"].to_numpy(np.int64))
    need_ref = ray.put(need)

    def gather(b: pa.Table) -> pa.Table:
        from deduplicator_ray.util import isin_sorted

        want = _bcast(need_ref)
        ids = np.asarray(b[id_col], dtype=np.int64)
        t = b.filter(pa.array(isin_sorted(want, ids)))
        return _vec_blob_table(t, id_col, vec_col)

    vecs = ds.select_columns([id_col, vec_col]).map_batches(
        gather, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True).to_pandas()
    vid = vecs[id_col].to_numpy(np.int64)
    V = (np.stack([np.frombuffer(bts, dtype="<f8") for bts in vecs["vecblob"]])
         if len(vecs) else np.empty((0, d)))   # blobs are pre-normalized
    row_of = pd.Series(np.arange(len(vid)), index=vid)
    rows = row_of[short["vec_id"].to_numpy(np.int64)].to_numpy()
    qs = short["query_id"].to_numpy(np.int64)
    short = short.assign(cosine=np.einsum("ij,ij->i", q[qs], V[rows]))
    short = short.sort_values(["query_id", "cosine", "vec_id"],
                              ascending=[True, False, True], kind="mergesort")
    top = short.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        top[["query_id", "vec_id", "rank", "cosine"]], preserve_index=False)


def kcenter_sample(ds, *, k: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pd.DataFrame:
    """Greedy k-center / farthest-point sampling (Gonzalez 1985,
    "Clustering to minimize the maximum intercluster distance") — the
    classic 2-approximation coreset used for diversity-first data
    selection: seed with the smallest id, then repeatedly take the
    point FARTHEST (euclidean, ties to the smallest id) from the chosen
    set, excluding already-chosen ids.

    Shape per round: the ≤ k chosen vectors ship inside the task
    closure (tiny), each block reduces to its single best candidate
    (argmax decomposes over partitions because (d DESC, id ASC) is a
    total order), and the driver picks among ≤ #blocks winners — k
    passes over the corpus, no shuffle.

    Returns (round, vec_id, radius_micro): radius_micro is the selected
    point's distance to the previous centers in 1e-6 units (integer, so
    the DuckDB mirror compares exactly); the seed's is 0 by convention.
    """
    import pandas as pd

    def seed_partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col])
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: pa.array([], pa.list_(pa.float64()))})
        i = int(np.argmin(ids))
        return pa.table({id_col: pa.array([ids[i]]),
                         vec_col: pa.array([b[vec_col][i].as_py()])})

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if not len(seeds):
        return pd.DataFrame(columns=["round", id_col, "radius_micro"]
                            ).astype("int64")
    si = int(seeds[id_col].astype("int64").idxmin())
    chosen_ids = [int(seeds[id_col][si])]
    chosen_vecs = [np.asarray(seeds[vec_col][si], dtype=np.float64)]
    out = [(0, chosen_ids[0], 0)]

    for rnd in range(1, k):
        C = np.stack(chosen_vecs)
        taken = frozenset(chosen_ids)

        def far_partial(b: pa.Table, *, _C=C, _t=taken) -> pa.Table:
            ids = np.asarray(b[id_col], dtype=np.int64)
            keep = ~np.isin(ids, np.fromiter(_t, dtype=np.int64))
            if not keep.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "d": pa.array([], pa.float64()),
                                 "vec": pa.array([], pa.list_(pa.float64()))})
            m = _matrix(b[vec_col])[keep]
            ids = ids[keep]
            # direct (a-b)^2 sums (not the matmul identity): matches
            # DuckDB's list_distance arithmetic to ~1 ulp, where the
            # a^2-2ab+b^2 form loses ~1e-10 to cancellation and could
            # flip the argmax/rounding against the oracle
            diff = m[:, None, :] - _C[None, :, :]
            d = np.sqrt((diff * diff).sum(axis=2).min(axis=1))
            # block winner by (d DESC, id ASC): stable argmax on -d
            order = np.lexsort((ids, -d))
            j = order[0]
            return pa.table({id_col: pa.array([ids[j]]),
                             "d": pa.array([float(d[j])]),
                             "vec": pa.array([m[j].tolist()],
                                             pa.list_(pa.float64()))})

        cand = ds.map_batches(far_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
        if not len(cand):
            break  # k exceeds the point count: return what we found
        cand = cand.sort_values(["d", id_col],
                                ascending=[False, True], ignore_index=True)
        win_id = int(cand[id_col][0])
        win_d = float(cand["d"][0])
        chosen_ids.append(win_id)
        chosen_vecs.append(np.asarray(cand["vec"][0], dtype=np.float64))
        out.append((rnd, win_id, int(np.floor(win_d * 1e6 + 0.5))))

    return pd.DataFrame(out, columns=["round", id_col, "radius_micro"]
                        ).astype("int64")
