"""Distributed learned quality classifier: hashed bag-of-words logistic
regression trained by distributed IRLS (full-batch Newton).

The fasttext/LR quality-filter pattern of the big training-data
pipelines — CCNet (Wenzek et al. 2020, arXiv:1911.00359) trains a
linear classifier to score web text against a clean corpus; GPT-3
(Brown et al. 2020, arXiv:2005.14165 App. A) filters Common Crawl with
an LR classifier over hashed features — expressed Ray-Data-first:

- **Features once**: one map-only pass turns (id, text, label) into a
  dense ``(id, label, tf-vector blob)`` dataset, materialized — the
  only state the training loop re-reads (a few KB/doc; at larger ``d``
  switch the blob to a sparse index/value encoding, same machinery).
  Hashing trick (Weinberger et al. 2009): token -> stable 64-bit hash
  -> bucket in [0, d); values are term frequencies (count / n_words).
- **Per-iteration**: the weight vector broadcasts via ``ray.put``; one
  map-only pass emits each block's gradient AND Hessian partial; the
  driver sums and solves the ridge-damped Newton step (IRLS), which
  converges in single-digit corpus scans where plain GD needs
  thousands.  No shuffle anywhere; per-iteration traffic is
  O(blocks x d^2) int64, independent of row count.
- **Bit-determinism across parallelism**: float partial sums depend
  on block arrival order, so each block QUANTIZES its partial to an
  integer grid (1e-6) and the driver sums int64 — order-independent
  and exact, so the trained weights (and the pinned driver output) are
  identical at any cluster size.  Grid headroom: |partial| <= n_block
  per component, so int64 holds corpora to ~9e12 docs.

Tokenization matches the dedup stages: words = single-space split.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GRID = 1_000_000.0  # gradient quantization grid (1e-6)


def _bcast(ref):
    from deduplicator_ray.stages.embed import _bcast as b

    return b(ref)


_N_DENSE = 3  # log-length, mean word length, alpha-word ratio


def _hashed_tf(texts: pa.ChunkedArray | pa.Array, d: int) -> np.ndarray:
    """Text column -> (n, d + 3) float64 feature matrix: ``d`` hashed
    term-frequency buckets plus three dense stats features (log1p word
    count / 10, mean word length / 10, alpha-word ratio) — normalized TF
    alone is blind to the length/shape signals quality rules key on.
    Vectorized: one split_pattern, one flatten, one vectorized hash of
    the flat token array, scatter-adds for the per-row aggregates."""
    import pandas as pd

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    X = np.zeros((n, d + _N_DENSE), dtype=np.float64)
    if n == 0:
        return X
    toks = pc.split_pattern(pc.coalesce(texts, pa.scalar("")), " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    denom = np.maximum(counts, 1).astype(np.float64)
    X[:, d] = np.log1p(counts) / 10.0
    if len(flat):
        rows = np.repeat(np.arange(n), counts)
        h = pd.util.hash_pandas_object(flat.to_pandas(), index=False).to_numpy()
        np.add.at(X, (rows, (h % np.uint64(d)).astype(np.int64)), 1.0)
        X[:, :d] /= denom[:, None]
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        char_sum = np.zeros(n)
        np.add.at(char_sum, rows, tok_len.astype(np.float64))
        X[:, d + 1] = char_sum / denom / 10.0
        alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
            zero_copy_only=False)
        alpha_sum = np.zeros(n)
        np.add.at(alpha_sum, rows, alpha.astype(np.float64))
        X[:, d + 2] = alpha_sum / denom
    return X


def _tf_blob(X: np.ndarray) -> pa.BinaryArray:
    n, d = X.shape
    offsets = np.arange(n + 1, dtype=np.int32) * (8 * d)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(X.astype("<f8").tobytes())],
    )


def hashed_features(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    label_col: str = "label", n_features: int = 256,
                    batch_size: int = 1024):
    """(id, text, label) Dataset -> materialized (id, label, tfblob)
    feature dataset the GD loop iterates over."""
    from deduplicator_ray.stages.embed import _blob_matrix  # noqa: F401 (doc xref)

    def feat(b: pa.Table) -> pa.Table:
        X = _hashed_tf(b[text_col], n_features)
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            label_col: pc.cast(b[label_col], pa.bool_()),
            "tfblob": _tf_blob(X),
        })

    return ds.select_columns([id_col, text_col, label_col]).map_batches(
        feat, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True).materialize()


def train_logreg(features, *, n_features: int, iters: int = 8,
                 l2: float = 1e-4) -> np.ndarray:
    """Distributed IRLS (Newton's method) on the materialized feature
    dataset -> (d+1,) float64 weights (bias last).  Each of the ``iters``
    rounds broadcasts w and runs ONE map-only pass in which every block
    emits its gradient AND Hessian partial — (d+1) + (d+1)^2 values —
    QUANTIZED to an integer grid so the cross-block sum is
    order-independent; the driver solves the (ridge-damped) Newton step.
    Newton converges in single-digit passes where plain GD needs
    thousands, so a full training run costs ~``iters`` corpus scans.

    Scale notes: per-block partial traffic is O(d^2) int64 (d=259
    default -> ~0.5 MB/block), independent of block row count — size
    ``n_features`` with that quadratic in mind and keep the hashed
    space small (the hashing-trick regime); at d beyond a few thousand
    switch the solver to the GD/L-BFGS family (gradient-only partials).
    """
    import ray

    from deduplicator_ray.stages.embed import _blob_matrix

    d = n_features + _N_DENSE
    n_total = features.count()
    if n_total == 0:
        raise ValueError("empty feature dataset")
    w = np.zeros(d + 1, dtype=np.float64)
    n_cells = (d + 1) + (d + 1) * (d + 1)

    for _ in range(iters):
        wref = ray.put(w)

        def partials(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                z = pa.array([], pa.int64())
                return pa.table({"j": z, "v": z})
            wv = _bcast(wref)
            X = _blob_matrix(b["tfblob"])
            y = b["label"].to_numpy(zero_copy_only=False).astype(np.float64)
            Xa = np.concatenate([X, np.ones((len(X), 1))], axis=1)
            p = 1.0 / (1.0 + np.exp(-(Xa @ wv)))
            r = np.maximum(p * (1.0 - p), 1e-12)
            g = Xa.T @ (p - y)                      # (d+1,)
            H = (Xa * r[:, None]).T @ Xa            # (d+1, d+1)
            vals = np.concatenate([g, H.ravel()])
            qi = np.floor(vals * _GRID + 0.5).astype(np.int64)
            return pa.table({"j": pa.array(np.arange(n_cells, dtype=np.int64)),
                             "v": pa.array(qi)})

        pdf = features.map_batches(partials, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()
        sums = pdf.groupby("j", sort=True)["v"].sum().to_numpy() / _GRID
        g = sums[: d + 1] / n_total + l2 * w
        H = sums[d + 1:].reshape(d + 1, d + 1) / n_total
        H[np.diag_indices_from(H)] += l2
        w = w - np.linalg.solve(H, g)
    return w


def logreg_quality(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   label_col: str = "label", n_features: int = 256,
                   iters: int = 8, l2: float = 1e-4):
    """End-to-end learned quality scorer: hash features, train, then one
    map-only scoring pass -> Dataset (id, label, prob_micro BIGINT,
    pred BOOLEAN).  ``prob_micro`` = floor(sigmoid(x.w)*1e6 + 0.5);
    ``pred`` = prob_micro >= 500000 (the integer mirror of p >= 0.5,
    kept integer so pins and oracles hash exactly)."""
    import ray

    from deduplicator_ray.stages.embed import _blob_matrix

    feats = hashed_features(ds, id_col=id_col, text_col=text_col,
                            label_col=label_col, n_features=n_features)
    w = train_logreg(feats, n_features=n_features, iters=iters, l2=l2)
    d = n_features + _N_DENSE
    wref = ray.put(w)

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             label_col: pa.array([], pa.bool_()),
                             "prob_micro": pa.array([], pa.int64()),
                             "pred": pa.array([], pa.bool_())})
        wv = _bcast(wref)
        X = _blob_matrix(b["tfblob"])
        z = X @ wv[:d] + wv[d]
        p = 1.0 / (1.0 + np.exp(-z))
        micro = np.floor(p * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            label_col: b[label_col],
            "prob_micro": pa.array(micro),
            "pred": pa.array(micro >= 500_000),
        })

    return feats.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)
