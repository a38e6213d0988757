"""LSH band hashing -> candidate pairs -> signature-verified edges
(north-star extension; SURVEY.md §7.2 step 5).

Pipeline shape (ALL stages vectorized — no per-key Python):

    sigs (doc_key, minhash_sig)                       [materialized once]
      -> band_explode:     one 16-byte (band_bucket, doc_key) row per
                           band x doc (stateless map_batches)
      -> candidate_pairs:  hash-bucket shuffle on band_bucket, then ONE
                           numpy pass per partition generates all-pairs
                           for small buckets / star edges for mega
                           buckets; second hash-bucket shuffle on (a, b)
                           makes pairs globally distinct
      -> attach_signatures: two hash joins bring sig_a/sig_b to the
                           (deduplicated) pairs only
      -> verified_edges:   estimated Jaccard from the signature pair,
                           vectorized, >= threshold kept

Skew / scale notes (explicit per north_rule):
- the band index is folded into the bucket hash, so the shuffle key space
  is bands x buckets — a natural salt;
- a bucket larger than ``cfg.max_band_group`` (hub pages: empty docs,
  boilerplate shells) would emit O(n^2) pairs; such buckets instead
  degrade to a STAR around the bucket's smallest doc_key — O(n) pairs
  that preserve connected-component connectivity exactly, at the cost of
  pair-level completeness inside that bucket (docs in one bucket already
  share a full band, i.e. are near-identical w.h.p.);
- signature bytes NEVER enter the band/pair shuffles: band rows and
  pairs are 16-byte rows, and signatures (num_perms * 4 B each) are
  joined to unique pairs only — at web scale this is the difference
  between shuffling keys and shuffling the signature corpus x bands;
  payload columns (html/text) must NOT enter this stage (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.config import MinHashConfig

_FNV64 = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def _band_hash(band_rows: np.ndarray, band_idx: int) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over each row of a (n, rows_per_band)
    uint32 matrix, seeded with the band index."""
    seed = np.uint64((int(_FNV64) ^ (band_idx * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF)
    h = np.full(band_rows.shape[0], seed, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(band_rows.shape[1]):
            h = (h ^ band_rows[:, j].astype(np.uint64)) * _FNV64_PRIME
    return h.astype(np.int64)  # signed for Arrow/groupby friendliness


def band_explode(sigs_ds, cfg: MinHashConfig | None = None, *, key_col: str = "doc_key"):
    """(doc_key, minhash_sig) -> (band_bucket, doc_key), #bands rows per
    doc.  Signatures deliberately do NOT ride along: band rows and the
    candidate pairs they produce are 16-byte rows, and signatures are
    joined back only for the (deduplicated) verify step — at web scale
    this is the difference between shuffling keys and shuffling the
    entire signature corpus x bands."""
    cfg = cfg or MinHashConfig()

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "band_bucket": pa.array([], type=pa.int64()),
                    key_col: pa.array([], type=pa.int64()),
                }
            )
        sig = _sig_matrix(batch["minhash_sig"], cfg.num_perms)
        buckets = []
        for bi in range(cfg.bands):
            band = sig[:, bi * cfg.rows_per_band : (bi + 1) * cfg.rows_per_band]
            buckets.append(_band_hash(band, bi))
        bucket_col = np.concatenate(buckets)
        keys = np.tile(np.asarray(batch[key_col]), cfg.bands)
        return pa.table({"band_bucket": bucket_col, key_col: keys})

    return sigs_ds.map_batches(f, batch_format="pyarrow", batch_size=2048, zero_copy_batch=True)


def _sig_matrix(col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    """binary signature column -> (n, num_perms) uint32 matrix.

    Zero-copy fast path: fixed-width, null-free binary arrays are
    reinterpreted straight from the Arrow data buffer (no Python loop)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, num_perms), dtype=np.uint32)
    width = num_perms * 4
    if col.null_count == 0:
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ]
        if offsets[-1] - offsets[0] == n * width:
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            return (
                data[offsets[0] : offsets[0] + n * width]
                .view("<u4")
                .reshape(n, num_perms)
            )
    blobs = col.to_pylist()
    out = np.empty((n, num_perms), dtype=np.uint32)
    for i, b in enumerate(blobs):
        out[i] = np.frombuffer(b, dtype="<u4")
    return out


def candidate_pairs(
    bands_ds,
    cfg: MinHashConfig | None = None,
    *,
    key_col: str = "doc_key",
    num_partitions: int = 64,
    overflow: str = "star",
):
    """Band rows (band_bucket, key) -> DISTINCT candidate pairs (a, b),
    a < b — 16-byte rows end to end.

    One hash-bucket shuffle on band_bucket co-locates every bucket's
    rows; pair generation is then a single numpy pass per partition
    (group boundaries -> repeat/offset index arithmetic), with mega
    buckets (> cfg.max_band_group) degraded to a STAR around the bucket
    minimum — O(n) edges that preserve connected-component connectivity
    exactly while capping the O(n^2) hub-bucket blowup (empty pages,
    boilerplate shells).  A second hash-bucket shuffle on (a, b) makes
    the pairs globally distinct BEFORE any signature bytes are attached.
    No per-key Python, no joins, no driver collection anywhere.

    ``overflow`` controls mega-bucket handling: "star" (default) degrades
    to star edges; "error" raises instead — for callers that need
    pair-level completeness (e.g. exact prefix-filter Jaccard) and must
    not silently lose pairs.
    """
    cfg = cfg or MinHashConfig()
    from deduplicator_ray.stages.exact import hash_bucket

    cap = cfg.max_band_group
    bp = hash_bucket(bands_ds, "band_bucket", num_partitions)

    def gen_pairs(g):
        import pandas as pd

        if len(g) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        g = g.sort_values(["band_bucket", key_col], kind="mergesort")
        bucket = g["band_bucket"].to_numpy()
        keys = g[key_col].to_numpy(np.int64)
        n = len(bucket)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = bucket[1:] != bucket[:-1]
        gid = np.cumsum(new) - 1
        start = np.flatnonzero(new)
        counts = np.diff(np.append(start, n))
        n_g = counts[gid]
        pos = np.arange(n) - start[gid]
        small = n_g <= cap
        if overflow == "error" and not small.all():
            raise ValueError(
                f"candidate bucket exceeds max_band_group={cap} "
                f"(largest: {int(n_g.max())} rows) and overflow='error'; "
                "use frequency-ordered prefixes or raise the cap"
            )
        # small buckets: row at position p pairs with the n_g-1-p rows
        # after it; mega buckets: only the first (minimum) row fans out
        reps = np.where(small & (n_g > 1), n_g - 1 - pos, 0)
        reps = np.where((~small) & (pos == 0), n_g - 1, reps)
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        a_idx = np.repeat(np.arange(n), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        b_off = np.arange(total) - np.repeat(cum[:-1], reps) + 1
        b_idx = a_idx + b_off
        # keys ascend within a bucket, so a < b always holds
        return pd.DataFrame({"a": keys[a_idx], "b": keys[b_idx]}).drop_duplicates(
            ignore_index=True
        )

    pairs = bp.groupby("_part").map_groups(gen_pairs, batch_format="pandas")

    # global distinct: same-pair rows from different bands hash together
    def add_pair_part(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], dtype=np.uint64)
        bb = np.asarray(b["b"], dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = a * np.uint64(0x9E3779B97F4A7C15) + bb
        return b.append_column(
            "_part", pa.array((h % np.uint64(num_partitions)).astype(np.int32))
        )

    pairs = pairs.map_batches(add_pair_part, batch_format="pyarrow", zero_copy_batch=True)

    def dedupe(g):
        return g.drop_duplicates(["a", "b"], ignore_index=True)[["a", "b"]]

    return pairs.groupby("_part").map_groups(dedupe, batch_format="pandas")


def _empty_pairs_table() -> pa.Table:
    return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})


def attach_signatures(pairs_ds, sigs_ds, *, key_col: str = "doc_key",
                      sig_col: str = "minhash_sig", num_partitions: int | None = None,
                      max_broadcast_keys: int = 20_000_000):
    """Distinct (a, b) pairs + signature table -> (a, b, sig_a, sig_b).

    Fast path (pair-key set fits a broadcast): ``ray.put`` the distinct
    pair keys once, SEMI-JOIN-filter the signature stream down to only
    the keys that appear in some pair (near-dup pairs are a tiny
    fraction of the corpus), then hash-join small-with-small.  The full
    signature corpus never enters a shuffle.

    Beyond ``max_broadcast_keys`` (~160 MB of int64s) the semi-join
    filter is skipped and the signatures flow through the hash join
    directly — correct at any scale, just heavier."""
    import ray
    import ray.data as rd

    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.util import auto_partitions

    num_partitions = num_partitions or auto_partitions()
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "sig_a": pa.array([], pa.binary()), "sig_b": pa.array([], pa.binary())})
        )
    base = sigs_ds.select_columns([key_col, sig_col])

    n_pairs = pairs_ds.count()
    if 2 * n_pairs <= max_broadcast_keys:
        keys_pdf = pairs_ds.to_pandas()
        needed = np.unique(
            np.concatenate([keys_pdf["a"].to_numpy(np.int64), keys_pdf["b"].to_numpy(np.int64)])
        )
        needed_ref = ray.put(needed)

        def semi(t: pa.Table) -> pa.Table:
            from deduplicator_ray.util import isin_sorted

            nd = ray.get(needed_ref)
            k = np.asarray(t[key_col], dtype=np.int64)
            # needed is sorted: membership via the shared helper
            return t.filter(pa.array(isin_sorted(nd, k)))

        base = base.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)

    def _ren(nk: str, ns: str):
        def g(t: pa.Table) -> pa.Table:
            return pa.table({nk: t[key_col], ns: t[sig_col]})

        return base.map_batches(g, batch_format="pyarrow", zero_copy_batch=True)

    e = hash_join(
        pairs_ds, _ren("a", "sig_a"), on=("a",), num_partitions=num_partitions,
        out_schema={"a": pa.int64(), "b": pa.int64(), "sig_a": pa.binary()},
    )
    return hash_join(
        e, _ren("b", "sig_b"), on=("b",), num_partitions=num_partitions,
        out_schema={"a": pa.int64(), "b": pa.int64(), "sig_a": pa.binary(),
                    "sig_b": pa.binary()},
    )


def verified_edges(pairs_ds, sigs_ds, cfg: MinHashConfig | None = None, *,
                   key_col: str = "doc_key", num_partitions: int | None = None,
                   max_driver_pairs: int = 500_000):
    """Distinct candidate pairs + signatures -> verified edges
    (a, b, est_jaccard >= threshold), fully vectorized.

    Fast path: when the pair set is small (<= ``max_driver_pairs``, the
    realistic LSH regime at bench scale), the signature stream is
    semi-filtered to the pair keys (a streaming pass; only <= 2 x pairs
    rows ever reach the driver) and the whole verify is ONE searchsorted
    lookup + one (n_pairs, num_perms) equality reduction — no joins, no
    shuffle.  Beyond the guard the join-based ``attach_signatures`` path
    handles web-scale pair sets."""
    import ray
    import ray.data as rd

    from deduplicator_ray.util import auto_partitions

    num_partitions = num_partitions or auto_partitions()
    cfg = cfg or MinHashConfig()
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs <= max_driver_pairs:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "est_jaccard": pa.array([], pa.float64())})
        if n_pairs == 0:
            return rd.from_arrow(empty)
        pdf = pairs_ds.to_pandas()
        a = pdf["a"].to_numpy(np.int64)
        b = pdf["b"].to_numpy(np.int64)
        needed = np.unique(np.concatenate([a, b]))
        needed_ref = ray.put(needed)

        def semi(t: pa.Table) -> pa.Table:
            from deduplicator_ray.util import isin_sorted

            nd = ray.get(needed_ref)
            k = np.asarray(t[key_col], dtype=np.int64)
            return t.filter(pa.array(isin_sorted(nd, k)))

        kept = (
            sigs_ds.select_columns([key_col, "minhash_sig"])
            .map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )  # <= 2 * n_pairs rows by construction
        if len(kept) == 0:
            # none of the pair keys exist in the signature table
            return rd.from_arrow(empty)
        keys = kept[key_col].to_numpy(np.int64)
        order = np.argsort(keys)
        keys = keys[order]
        sig = np.stack(
            [np.frombuffer(s, dtype="<u4") for s in kept["minhash_sig"].to_numpy()[order]]
        )
        ia = np.searchsorted(keys, a)
        ib = np.searchsorted(keys, b)
        ok = (ia < len(keys)) & (ib < len(keys))
        ia = np.clip(ia, 0, max(0, len(keys) - 1))
        ib = np.clip(ib, 0, max(0, len(keys) - 1))
        ok &= (keys[ia] == a) & (keys[ib] == b)
        j = np.zeros(len(a), dtype=np.float64)
        j[ok] = (sig[ia[ok]] == sig[ib[ok]]).mean(axis=1)
        keep = ok & (j >= cfg.jaccard_threshold)
        return rd.from_arrow(
            pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                      "est_jaccard": pa.array(j[keep])})
        )

    withsigs = attach_signatures(
        pairs_ds, sigs_ds, key_col=key_col, num_partitions=num_partitions
    )

    def verify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        num_perms = cfg.num_perms
        sa = _sig_matrix(b["sig_a"], num_perms)
        sb = _sig_matrix(b["sig_b"], num_perms)
        j = (sa == sb).mean(axis=1)
        keep = j >= cfg.jaccard_threshold
        t = b.filter(pa.array(keep))
        return pa.table({"a": t["a"], "b": t["b"], "est_jaccard": pa.array(j[keep])})

    return withsigs.map_batches(verify, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


def exact_jaccard_edges(edges_ds, corpus_ds, cfg: MinHashConfig | None = None, *,
                        key_col: str = "doc_key", text_col: str = "text",
                        num_partitions: int | None = None):
    """n-gram Jaccard dedup: re-verify (or independently score) candidate
    pairs with the EXACT word-shingle Jaccard (set intersection over
    union), not the signature estimate.  Texts are attached to the small
    pair table by two hash joins; the set computation is per-pair numpy.

    Output: (a, b, jaccard) for pairs with jaccard >= cfg.jaccard_threshold.
    """
    import re as _re

    from deduplicator_ray.stages.minhash import shingle_hashes
    from deduplicator_ray.util import auto_partitions

    num_partitions = num_partitions or auto_partitions()
    cfg = cfg or MinHashConfig()
    texts = corpus_ds.select_columns([key_col, text_col])

    def _ren(new_key: str, new_text: str):
        def g(t: pa.Table) -> pa.Table:
            return pa.table({new_key: t[key_col], new_text: t[text_col]})

        return texts.map_batches(g, batch_format="pyarrow", zero_copy_batch=True)

    ta = _ren("a", "text_a")
    tb = _ren("b", "text_b")
    from deduplicator_ray.stages.joins import hash_join

    txt = pa.large_string()
    e = hash_join(
        edges_ds.select_columns(["a", "b"]), ta, on=("a",), num_partitions=num_partitions,
        out_schema={"a": pa.int64(), "b": pa.int64(), "text_a": txt},
    )
    e = hash_join(
        e, tb, on=("b",), num_partitions=num_partitions,
        out_schema={"a": pa.int64(), "b": pa.int64(), "text_a": txt, "text_b": txt},
    )
    token_re = _re.compile(r"\w+", _re.UNICODE)

    def f(b: pa.Table) -> pa.Table:
        xs = b["text_a"].to_pylist()
        ys = b["text_b"].to_pylist()
        jac = np.zeros(len(xs), dtype=np.float64)
        for i, (x, y) in enumerate(zip(xs, ys)):
            ha = shingle_hashes(x or "", cfg.shingle_words, token_re)
            hb = shingle_hashes(y or "", cfg.shingle_words, token_re)
            if len(ha) == 0 and len(hb) == 0:
                jac[i] = 1.0
                continue
            inter = len(np.intersect1d(ha, hb, assume_unique=True))
            union = len(ha) + len(hb) - inter
            jac[i] = inter / union if union else 0.0
        keep = jac >= cfg.jaccard_threshold
        t = b.filter(pa.array(keep))
        return pa.table({"a": t["a"], "b": t["b"], "jaccard": pa.array(jac[keep])})

    return e.map_batches(f, batch_format="pyarrow", batch_size=1024)
