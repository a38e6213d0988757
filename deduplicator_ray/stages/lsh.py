"""LSH band hashing -> candidate pairs -> signature-verified edges
(north-star extension; SURVEY.md §7.2 step 5).

Pipeline shape (ALL stages vectorized — no per-group Python):

    sigs (doc_key, minhash_sig)
      -> band_explode:    one row per (band, doc) with a 64-bit band
                          bucket hash (stateless map_batches)
      -> bucket stats:    native Count/Min aggregation per bucket
      -> self hash-join on band_bucket (small buckets)   \\  candidate
         star join around min(doc_key) (mega buckets)    /   pairs
      -> verify:          estimated Jaccard from the two signatures,
                          vectorized per batch, drops sigs
      -> distinct:        native Max aggregation on (a, b)

Skew / scale notes (explicit per north_rule):
- the band index is folded into the bucket hash, so the shuffle key space
  is bands x buckets — a natural salt;
- a bucket larger than ``cfg.max_band_group`` (hub pages: empty docs,
  boilerplate shells) would emit O(n^2) pairs from the self-join; such
  buckets instead degrade to a STAR around the bucket's smallest doc_key
  — O(n) pairs that preserve connected-component connectivity exactly,
  at the cost of pair-level completeness inside that bucket (docs in one
  bucket already share a full band, i.e. are near-identical w.h.p.);
- signatures ride along the band rows (num_perms * 4 B each). That
  multiplies signature bytes by #bands but keeps the pipeline a pure
  stream (no extra join against a signature table); payload columns
  (html/text) must NOT be carried into this stage (SURVEY.md §7.4).
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
    """(doc_key, minhash_sig) -> (band_bucket, doc_key, minhash_sig),
    #bands rows per doc."""
    cfg = cfg or MinHashConfig()

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "band_bucket": pa.array([], type=pa.int64()),
                    key_col: pa.array([], type=pa.int64()),
                    "minhash_sig": pa.array([], type=pa.binary()),
                }
            )
        sig = _sig_matrix(batch["minhash_sig"], cfg.num_perms)
        buckets = []
        for bi in range(cfg.bands):
            band = sig[:, bi * cfg.rows_per_band : (bi + 1) * cfg.rows_per_band]
            buckets.append(_band_hash(band, bi))
        bucket_col = np.concatenate(buckets)
        keys = np.tile(np.asarray(batch[key_col]), cfg.bands)
        sig_rep = pa.chunked_array([batch["minhash_sig"].combine_chunks()] * cfg.bands)
        return pa.table({"band_bucket": bucket_col, key_col: keys, "minhash_sig": sig_rep})

    return sigs_ds.map_batches(f, batch_format="pyarrow", batch_size=2048, zero_copy_batch=True)


def _sig_matrix(col: pa.ChunkedArray | pa.Array, num_perms: int) -> np.ndarray:
    """binary signature column -> (n, num_perms) uint32 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    blobs = col.to_pylist()
    out = np.empty((len(blobs), num_perms), dtype=np.uint32)
    for i, b in enumerate(blobs):
        out[i] = np.frombuffer(b, dtype="<u4")
    return out


def candidate_pairs(
    bands_ds,
    cfg: MinHashConfig | None = None,
    *,
    key_col: str = "doc_key",
    num_partitions: int = 8,
):
    """Band rows -> candidate pairs (a, b, sig_a, sig_b), a < b.

    Small buckets: hash self-join on band_bucket. Mega buckets
    (> cfg.max_band_group): star join around the bucket minimum.

    ``bands_s`` (band rows restricted to non-singleton buckets) is
    materialized deliberately: it is consumed by three downstream
    branches (small / mega-min / mega-nonmin), and without pinning, each
    branch would re-execute the stats join from scratch.  Its size is
    bounded by collision rows only — docs that share a band bucket with
    at least one other doc — a small fraction of the corpus for real
    near-dup rates, not the full band table.
    """
    cfg = cfg or MinHashConfig()
    from ray.data.aggregate import Count, Min

    cap = cfg.max_band_group
    stats = bands_ds.groupby("band_bucket").aggregate(
        Count(alias_name="bucket_n"), Min(key_col, alias_name="bucket_min")
    )
    # prune singleton buckets before the join — they can't form pairs and
    # are the overwhelming majority of buckets
    stats = stats.map_batches(
        lambda b: b.filter(pc.greater(b["bucket_n"], 1)), batch_format="pyarrow"
    )
    stats = stats.materialize()
    if stats.count() == 0:
        import ray.data as rd

        return rd.from_arrow(_empty_pairs_table())
    from deduplicator_ray.stages.joins import hash_join

    _BANDS_SCHEMA = {
        "band_bucket": pa.int64(),
        key_col: pa.int64(),
        "minhash_sig": pa.binary(),
        "bucket_n": pa.int64(),
        "bucket_min": pa.int64(),
    }
    bands_s = hash_join(
        bands_ds, stats, on=("band_bucket",), num_partitions=num_partitions,
        out_schema=_BANDS_SCHEMA,
    ).materialize()

    def split_small(b: pa.Table) -> pa.Table:
        return b.filter(pc.less_equal(b["bucket_n"], cap))

    def split_mega_nonmin(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater(b["bucket_n"], cap), pc.not_equal(b[key_col], b["bucket_min"])
        )
        return b.filter(m)

    def split_mega_min(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater(b["bucket_n"], cap), pc.equal(b[key_col], b["bucket_min"])
        )
        return b.filter(m).select(["band_bucket", key_col, "minhash_sig"])

    small = bands_s.map_batches(split_small, batch_format="pyarrow", zero_copy_batch=True).materialize()
    small_r = small.select_columns(["band_bucket", key_col, "minhash_sig"]).rename_columns(
        {key_col: "b_key", "minhash_sig": "sig_b"}
    )
    pairs_small = hash_join(
        small, small_r, on=("band_bucket",), num_partitions=num_partitions,
        out_schema=dict(_BANDS_SCHEMA, b_key=pa.int64(), sig_b=pa.binary()),
    )

    def project_small(b: pa.Table) -> pa.Table:
        ka = np.asarray(b[key_col], dtype=np.int64)
        kb = np.asarray(b["b_key"], dtype=np.int64)
        keep = ka < kb
        t = b.filter(pa.array(keep))
        return pa.table(
            {
                "a": t[key_col],
                "b": t["b_key"],
                "sig_a": t["minhash_sig"],
                "sig_b": t["sig_b"],
            }
        )

    pairs_small = pairs_small.map_batches(project_small, batch_format="pyarrow", zero_copy_batch=True)

    mega_nonmin = bands_s.map_batches(
        split_mega_nonmin, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if mega_nonmin.count() == 0:
        # no oversize buckets (the common case) — skip the star join, whose
        # empty schema-less input Acero would reject anyway
        return pairs_small
    mega_min = bands_s.map_batches(split_mega_min, batch_format="pyarrow", zero_copy_batch=True)
    mega_min_r = mega_min.rename_columns({key_col: "a_key", "minhash_sig": "sig_a0"})
    pairs_mega = hash_join(
        mega_nonmin, mega_min_r, on=("band_bucket",), num_partitions=num_partitions,
        out_schema=dict(_BANDS_SCHEMA, a_key=pa.int64(), sig_a0=pa.binary()),
    )

    def project_mega(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": b["a_key"],
                "b": b[key_col],
                "sig_a": b["sig_a0"],
                "sig_b": b["minhash_sig"],
            }
        )

    pairs_mega = pairs_mega.map_batches(project_mega, batch_format="pyarrow", zero_copy_batch=True)
    return pairs_small.union(pairs_mega)


def _empty_pairs_table() -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "sig_a": pa.array([], pa.binary()),
            "sig_b": pa.array([], pa.binary()),
        }
    )


def verified_edges(pairs_ds, cfg: MinHashConfig | None = None):
    """Candidate pairs -> distinct verified edges (a, b, est_jaccard).

    Verification runs FIRST (vectorized, stateless, drops sigs and failed
    pairs), so only tiny (a, b, j) rows enter the distinct shuffle, which
    is a native Max aggregation (no per-group Python)."""
    cfg = cfg or MinHashConfig()
    from ray.data.aggregate import Max

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

    verified = pairs_ds.map_batches(verify, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
    return verified.groupby(["a", "b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


def exact_jaccard_edges(edges_ds, corpus_ds, cfg: MinHashConfig | None = None, *,
                        key_col: str = "doc_key", text_col: str = "text",
                        num_partitions: int = 8):
    """n-gram Jaccard dedup: re-verify (or independently score) candidate
    pairs with the EXACT word-shingle Jaccard (set intersection over
    union), not the signature estimate.  Texts are attached to the small
    pair table by two hash joins; the set computation is per-pair numpy.

    Output: (a, b, jaccard) for pairs with jaccard >= cfg.jaccard_threshold.
    """
    import re as _re

    from deduplicator_ray.stages.minhash import shingle_hashes

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
