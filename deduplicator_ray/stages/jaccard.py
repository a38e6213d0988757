"""Exact n-gram Jaccard pairs via prefix filtering (AllPairs / PPJoin
family, Bayardo et al. WWW'07) — the distributed, bounded replacement for
per-language all-pairs grouping.

Completeness guarantee (why this is EXACT, not approximate): fix any
total order over grams.  If J(A, B) >= t then |A∩B| >= ceil(t·max(|A|,|B|)),
and two sets with overlap >= α must share an element among the first
|A|-α+1 / |B|-α+1 elements of their sorted gram lists.  Using the longer
per-doc prefix L = n - ceil(t·n) + 1 (independent of the partner's size)
is therefore safe: every qualifying pair collides on at least one gram
that lies in BOTH prefixes.  Candidate generation over prefix grams only
+ exact verification finds exactly the pairs the all-pairs oracle finds.

Pipeline shape (hash-bucket pattern end to end, no per-key Python):

    docs -> gram sets (hashed uint64, sorted)                [map_batches]
      -> prefix explode: (band_bucket = hash(gram, lang), doc_id) rows
      -> candidate_pairs (lsh.py): hash-bucket shuffle, vectorized
         per-bucket pair gen, global pair dedupe — 16-byte rows
      -> attach_signatures joins each doc's serialized gram array to the
         DISTINCT pairs only
      -> exact intersection/union counts, integer threshold compare.

Partitioning assumption: one (gram, lang) prefix group fits a worker.
Groups are bounded by the doc-frequency of prefix grams; with the
hash-canonical gram order a pathological corpus (one gram in every doc's
prefix) can still blow a group up, so ``max_group`` fails loudly instead
of silently going O(n^2) — the scale remedy is frequency-ordered
prefixes (rarest grams first), which plugs in as a df-join before the
explode without changing this pipeline's shape.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[a-z0-9]+")


def _gram_hashes(text: str, n: int, *, distinct: bool = True) -> np.ndarray:
    """Word n-grams of ``text`` -> sorted uint64 hashes (pandas siphash
    with fixed key — deterministic across processes/nodes).  ``distinct``
    dedupes within the doc (set semantics); pass False to keep
    multiplicity (tf semantics, used by lexical.tfidf_cosine_pairs)."""
    w = _WORD_RE.findall((text or "").lower())
    if len(w) < n:
        return np.empty(0, dtype=np.uint64)
    grams = [" ".join(w[i: i + n]) for i in range(len(w) - n + 1)]
    if distinct:
        grams = list(set(grams))
    h = pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64)
    return np.sort(h)


def pack_u64_blobs(per_doc: list[np.ndarray]) -> pa.Array:
    """One uint64 hash array per doc -> a binary column, with a single
    bytes join instead of per-row Python object churn.  Offsets promote
    to large_binary past the int32 limit (> 2 GiB of hashes in one
    batch) instead of silently wrapping negative."""
    nrows = len(per_doc)
    sizes = np.fromiter((len(g) for g in per_doc), dtype=np.int64, count=nrows)
    blob = b"".join(g.astype("<u8").tobytes() for g in per_doc)
    off64 = np.concatenate(([0], np.cumsum(sizes * 8)))
    if off64[-1] <= np.iinfo(np.int32).max:
        return pa.BinaryArray.from_buffers(
            pa.binary(), nrows,
            [None, pa.py_buffer(off64.astype(np.int32).tobytes()),
             pa.py_buffer(blob)],
        )
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), nrows,
        [None, pa.py_buffer(off64.tobytes()), pa.py_buffer(blob)],
    )


def ngram_jaccard_pairs(ds, *, num: int = 1, den: int = 2, ngram: int = 3,
                        id_col: str = "doc_id", lang_col: str | None = "lang",
                        text_col: str = "text", num_partitions: int = 64,
                        max_group: int = 100_000):
    """Documents Dataset -> exact Jaccard pairs (doc_a, doc_b, n_inter,
    n_union) with den*inter >= num*union and inter > 0, restricted to
    same-``lang_col`` pairs when that column is given.

    Threshold t = num/den compares as integers — no float drift vs the
    SQL oracle."""
    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.lsh import attach_signatures, candidate_pairs

    cols = [id_col, text_col] + ([lang_col] if lang_col else [])

    def grams_table(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        arr = pack_u64_blobs([_gram_hashes(t, ngram) for t in texts])
        out = {id_col: b[id_col], "gramblob": arr}
        if lang_col:
            out[lang_col] = b[lang_col]
        return pa.table(out)

    sigs = ds.select_columns(cols).map_batches(
        grams_table, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    ).materialize()  # feeds both the prefix explode and the verify join

    def prefix_explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        blobs = b["gramblob"].to_pylist()
        langs = (
            pd.util.hash_array(np.asarray(b[lang_col].to_pylist(), dtype=object)).astype(np.uint64)
            if lang_col else np.zeros(len(ids), dtype=np.uint64)
        )
        out_bucket, out_id = [], []
        for i, blob in enumerate(blobs):
            g = np.frombuffer(blob, dtype="<u8")
            n = len(g)
            if n == 0:
                continue
            # prefix length L = n - ceil(t*n) + 1 (see module docstring)
            L = n - (-(num * n) // den) + 1
            pre = g[: int(L)].astype(np.uint64)
            with np.errstate(over="ignore"):
                bucket = ((pre * np.uint64(0x9E3779B97F4A7C15)) ^ langs[i]).astype(np.int64)
            out_bucket.append(bucket)
            out_id.append(np.full(len(pre), ids[i], dtype=np.int64))
        if not out_bucket:
            return pa.table({"band_bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        return pa.table({"band_bucket": np.concatenate(out_bucket),
                         id_col: np.concatenate(out_id)})

    bands = sigs.map_batches(prefix_explode, batch_format="pyarrow", batch_size=1024,
                             zero_copy_batch=True)
    # no star degradation here (completeness required): max_group fails
    # loudly if a prefix gram is pathologically common
    pairs = candidate_pairs(bands, MinHashConfig(max_band_group=max_group),
                            key_col=id_col, num_partitions=num_partitions,
                            overflow="error")
    withsigs = attach_signatures(pairs, sigs, key_col=id_col, sig_col="gramblob")

    def verify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ia = np.zeros(n, dtype=np.int64)
        iu = np.zeros(n, dtype=np.int64)
        for i, (ba, bb) in enumerate(zip(b["sig_a"].to_pylist(), b["sig_b"].to_pylist())):
            ga = np.frombuffer(ba, dtype="<u8")
            gb = np.frombuffer(bb, dtype="<u8")
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            ia[i] = inter
            iu[i] = len(ga) + len(gb) - inter
        keep = (ia > 0) & (den * ia >= num * iu)
        t = b.filter(pa.array(keep))
        return pa.table({"doc_a": t["a"], "doc_b": t["b"],
                         "n_inter": pa.array(ia[keep]), "n_union": pa.array(iu[keep])})

    return withsigs.map_batches(verify, batch_format="pyarrow", batch_size=4096,
                                zero_copy_batch=True)


def ngram_containment_pairs(ds, *, num: int = 7, den: int = 10,
                            ngram: int = 3, stop_df: int = 50,
                            id_col: str = "doc_id", text_col: str = "text",
                            num_partitions: int = 64,
                            max_group: int = 100_000):
    """Exact ASYMMETRIC near-dup pairs — containment C(A,B) =
    |A∩B| / min(|A|,|B|) >= num/den over each doc's RARE distinct word
    n-grams (corpus document frequency <= ``stop_df``).  Containment
    catches what Jaccard misses: a short page quoted inside a long one,
    boilerplate wrappers around syndicated bodies (Broder 1997's
    containment, SIGMOD overlap-join family).

    Why rare grams are part of the SEMANTICS, not an approximation: the
    Jaccard prefix filter does not carry over to containment (the
    overlap bound depends on the SMALLER set, so a qualifying shared
    gram need not sit in any fixed prefix of the larger one) — a
    complete candidate generator must co-locate every shared gram, and a
    stopword-like gram present in k docs generates O(k^2) candidates.
    Restricting the gram universe to df <= stop_df makes that k bounded
    BY DEFINITION, keeps the operator exact and oracle-checkable for the
    stated semantics, and mirrors standard practice (drop boilerplate
    shingles before containment comparison).  Returns
    (doc_a, doc_b, n_inter, n_min) with den*n_inter >= num*n_min > 0.

    Shape: gram blobs materialized once; df pass = hash-bucket count of
    per-block distinct gram partials; heavy grams (df > stop_df, few by
    construction at a sane stop_df) broadcast ONCE; rare-gram explode ->
    candidate_pairs (overflow='error'; per-gram group <= stop_df) ->
    semi-join signature attach -> vectorized verify.
    """
    import ray

    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.stages.lsh import attach_signatures, candidate_pairs

    if not (0 < num <= den):
        raise ValueError("need 0 < num <= den")
    if stop_df < 2:
        raise ValueError("stop_df < 2 would drop every shared gram")

    def grams_table(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        arr = pack_u64_blobs([_gram_hashes(t, ngram) for t in texts])
        return pa.table({id_col: b[id_col], "gramblob": arr})

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        grams_table, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    ).materialize()  # feeds the df pass, the explode AND the verify join

    # pass 1: exact document frequency per gram (per-block partials, one
    # key-only shuffle; gram blobs already hold DISTINCT grams per doc)
    def df_partial(b: pa.Table) -> pa.Table:
        gs = [np.frombuffer(blob, dtype="<u8") for blob in b["gramblob"].to_pylist()]
        allg = np.concatenate(gs) if gs else np.empty(0, dtype=np.uint64)
        uniq, cnt = np.unique(allg, return_counts=True)
        return pa.table({"gram": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    counted = hash_bucket(
        sigs.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True),
        "gram", num_partitions,
    )

    def df_heavy(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("gram", sort=False)["c"].sum()
        heavy = s[s > stop_df]
        return pd.DataFrame({"gram": heavy.index.to_numpy(np.int64)})

    heavy = np.sort(
        counted.groupby("_part").map_groups(df_heavy, batch_format="pandas")
        .to_pandas()["gram"].to_numpy(np.int64).astype(np.uint64)
    )
    heavy_ref = ray.put(heavy)

    def rare_of(blob: bytes, stop: np.ndarray) -> np.ndarray:
        g = np.frombuffer(blob, dtype="<u8")
        if len(stop) == 0 or len(g) == 0:
            return g
        pos = np.searchsorted(stop, g)
        hit = (pos < len(stop)) & (stop[np.minimum(pos, len(stop) - 1)] == g)
        return g[~hit]

    def rare_explode(b: pa.Table) -> pa.Table:
        stop = ray.get(heavy_ref)
        ids = np.asarray(b[id_col], dtype=np.int64)
        out_bucket, out_id = [], []
        for i, blob in enumerate(b["gramblob"].to_pylist()):
            g = rare_of(blob, stop)
            if len(g) == 0:
                continue
            with np.errstate(over="ignore"):
                bucket = (g * np.uint64(0x9E3779B97F4A7C15)).astype(np.int64)
            out_bucket.append(bucket)
            out_id.append(np.full(len(g), ids[i], dtype=np.int64))
        if not out_bucket:
            return pa.table({"band_bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        return pa.table({"band_bucket": np.concatenate(out_bucket),
                         id_col: np.concatenate(out_id)})

    bands = sigs.map_batches(rare_explode, batch_format="pyarrow",
                             batch_size=1024, zero_copy_batch=True)
    pairs = candidate_pairs(bands, MinHashConfig(max_band_group=max_group),
                            key_col=id_col, num_partitions=num_partitions,
                            overflow="error")
    withsigs = attach_signatures(pairs, sigs, key_col=id_col, sig_col="gramblob")

    def verify(b: pa.Table) -> pa.Table:
        stop = ray.get(heavy_ref)
        n = b.num_rows
        ia = np.zeros(n, dtype=np.int64)
        im = np.zeros(n, dtype=np.int64)
        for i, (ba, bb) in enumerate(zip(b["sig_a"].to_pylist(), b["sig_b"].to_pylist())):
            ga = rare_of(ba, stop)
            gb = rare_of(bb, stop)
            ia[i] = len(np.intersect1d(ga, gb, assume_unique=True))
            im[i] = min(len(ga), len(gb))
        keep = (ia > 0) & (den * ia >= num * im)
        t = b.filter(pa.array(keep))
        return pa.table({"doc_a": t["a"], "doc_b": t["b"],
                         "n_inter": pa.array(ia[keep]), "n_min": pa.array(im[keep])})

    return withsigs.map_batches(verify, batch_format="pyarrow", batch_size=4096,
                                zero_copy_batch=True)


def _gram_tf(text: str, n: int) -> np.ndarray:
    """Word n-grams WITH multiplicity -> interleaved (hash u64, count
    u64) pairs, hash-sorted, flattened — the weighted-set encoding
    ``weighted_jaccard_pairs`` ships through its shuffles."""
    w = _WORD_RE.findall((text or "").lower())
    if len(w) < n:
        return np.empty(0, dtype=np.uint64)
    grams = [" ".join(w[i: i + n]) for i in range(len(w) - n + 1)]
    h = pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64)
    uniq, cnt = np.unique(h, return_counts=True)  # sorted by hash
    return np.column_stack([uniq, cnt.astype(np.uint64)]).ravel()


def _tf_blob_table(ds, *, ngram: int, id_col: str,
                   lang_col: str | None, text_col: str):
    """(id, [lang], text) -> materialized (id, tfblob, [lang]) table of
    hash-sorted (gram u64, count u64) blobs — the shared weighted-set
    encoding both ``weighted_jaccard_pairs`` and ``cws_jaccard_pairs``
    feed to their candidate and verify stages."""
    cols = [id_col, text_col] + ([lang_col] if lang_col else [])

    def grams_table(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        arr = pack_u64_blobs([_gram_tf(t, ngram) for t in texts])
        out = {id_col: b[id_col], "tfblob": arr}
        if lang_col:
            out[lang_col] = b[lang_col]
        return pa.table(out)

    return ds.select_columns(cols).map_batches(
        grams_table, batch_format="pyarrow", batch_size=1024,
        zero_copy_batch=True
    ).materialize()  # feeds both the candidate explode and the verify join


def weighted_jaccard_pairs(ds, *, num: int = 1, den: int = 2, ngram: int = 3,
                           id_col: str = "doc_id",
                           lang_col: str | None = "lang",
                           text_col: str = "text", num_partitions: int = 64,
                           max_group: int = 100_000):
    """Exact WEIGHTED Jaccard pairs over n-gram term frequencies:
    J_w(A,B) = sum_t min(a_t, b_t) / sum_t max(a_t, b_t) — the
    multiset generalization (Ioffe 2010's target similarity; Broder's
    resemblance with multiplicity).  Weighted similarity separates
    "same template, repeated boilerplate" from true near-dups where the
    set (distinct-gram) Jaccard saturates.  Returns (doc_a, doc_b,
    w_inter, w_union) with den*w_inter >= num*w_union and w_inter > 0,
    same-``lang_col`` pairs only; all-integer, so the DuckDB oracle
    recomputes it exactly.

    Completeness of the WEIGHTED prefix filter (this file's AllPairs
    bound generalized to multisets): order grams by a fixed total order
    (hash); give each doc the minimal prefix whose suffix mass is
    < t*|A|/2 (|A| = total gram count).  For a qualifying pair,
    sum min >= t * sum max >= t*(|A|+|B|)/2 (since max(a,b) >=
    (a+b)/2 per gram).  If NO gram lay in both prefixes, every shared
    gram would miss at least one prefix, so sum min < t*|A|/2 +
    t*|B|/2 — contradiction.  Prefix explode over those grams +
    candidate_pairs + exact verification is therefore EXACT.  The
    suffix bound compares as integers: 2*den*suffix < num*n.

    Shape mirrors ``ngram_jaccard_pairs``: (hash, count) blobs
    materialized once; prefix explode -> hash-bucket candidate shuffle
    (16-byte rows, ``overflow='error'`` — completeness-critical) ->
    semi-join blob attach -> vectorized min/max verify.  Partitioning
    assumption: one (gram, lang) prefix group fits a worker; the scale
    remedy for stopword-heavy gram universes is frequency-ordered
    prefixes (rarest first), a df-join before the explode as in
    ``ngram_containment_pairs``."""
    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.lsh import attach_signatures, candidate_pairs

    if not (0 < num <= den):
        raise ValueError("need 0 < num <= den")
    sigs = _tf_blob_table(ds, ngram=ngram, id_col=id_col,
                          lang_col=lang_col, text_col=text_col)

    def prefix_explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        blobs = b["tfblob"].to_pylist()
        langs = (
            pd.util.hash_array(
                np.asarray(b[lang_col].to_pylist(), dtype=object)
            ).astype(np.uint64)
            if lang_col else np.zeros(len(ids), dtype=np.uint64)
        )
        out_bucket, out_id = [], []
        for i, blob in enumerate(blobs):
            arr = np.frombuffer(blob, dtype="<u8").reshape(-1, 2)
            if len(arr) == 0:
                continue
            g, c = arr[:, 0], arr[:, 1].astype(np.int64)
            n = int(c.sum())
            # minimal prefix with suffix mass < t*n/2 (integer compare)
            suffix = n - np.cumsum(c)
            L = int(np.argmax(2 * den * suffix < num * n)) + 1
            pre = g[:L]
            with np.errstate(over="ignore"):
                bucket = ((pre * np.uint64(0x9E3779B97F4A7C15))
                          ^ langs[i]).astype(np.int64)
            out_bucket.append(bucket)
            out_id.append(np.full(L, ids[i], dtype=np.int64))
        if not out_bucket:
            return pa.table({"band_bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        return pa.table({"band_bucket": np.concatenate(out_bucket),
                         id_col: np.concatenate(out_id)})

    bands = sigs.map_batches(prefix_explode, batch_format="pyarrow",
                             batch_size=1024, zero_copy_batch=True)
    pairs = candidate_pairs(bands, MinHashConfig(max_band_group=max_group),
                            key_col=id_col, num_partitions=num_partitions,
                            overflow="error")
    withsigs = attach_signatures(pairs, sigs, key_col=id_col, sig_col="tfblob")
    return withsigs.map_batches(
        lambda b: _verify_weighted(b, num, den),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


def _verify_weighted(b: pa.Table, num: int, den: int) -> pa.Table:
    """Candidate pairs with attached (hash, count) tf blobs -> exact
    weighted-Jaccard verification (shared by the exact prefix-filter
    path and the CWS sketch path)."""
    n = b.num_rows
    wi = np.zeros(n, dtype=np.int64)
    wu = np.zeros(n, dtype=np.int64)
    for i, (ba, bb) in enumerate(zip(b["sig_a"].to_pylist(),
                                     b["sig_b"].to_pylist())):
        aa = np.frombuffer(ba, dtype="<u8").reshape(-1, 2)
        ab = np.frombuffer(bb, dtype="<u8").reshape(-1, 2)
        _, ia, ib = np.intersect1d(aa[:, 0], ab[:, 0],
                                   assume_unique=True,
                                   return_indices=True)
        inter = int(np.minimum(aa[ia, 1], ab[ib, 1]).sum())
        wi[i] = inter
        wu[i] = int(aa[:, 1].sum()) + int(ab[:, 1].sum()) - inter
    keep = (wi > 0) & (den * wi >= num * wu)
    t = b.filter(pa.array(keep))
    return pa.table({"doc_a": t["a"], "doc_b": t["b"],
                     "w_inter": pa.array(wi[keep]),
                     "w_union": pa.array(wu[keep])})


_SPLITMIX_SALTS = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
                   0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5)


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """SplitMix64 finalizer over a u64 array (vectorized, overflow wraps)."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(salt)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _uniform01(x: np.ndarray, salt: int) -> np.ndarray:
    """u64 array -> floats in (0, 1): 53 mantissa bits, +1 keeps it > 0
    so the log-transforms below never hit -inf."""
    return ((_mix64(x, salt) >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0 ** -53)


def _cws_samples(gh: np.ndarray, cnt: np.ndarray, n_samples: int,
                 seed: int) -> np.ndarray:
    """Consistent Weighted Sampling (Ioffe, ICDM 2010, Algorithm 1) ->
    (n_samples,) u64 sample ids for one weighted set: P(sample_k(A) ==
    sample_k(B)) = J_w(A, B) exactly.  All randomness is counter-based
    (SplitMix64 of gram hash x sample index), so samples are a pure
    function of the multiset — no per-doc RNG state, any partitioning.

    Per sample k and gram t: r, c ~ Gamma(2,1) (sum of two exponentials),
    beta ~ U(0,1); t_k = floor(ln w_t / r + beta); pick the gram
    minimizing ln c - r*(t_k - beta) - r; the sample id hashes (gram,
    t_k, k)."""
    m = len(gh)
    K = n_samples
    k = np.arange(K, dtype=np.uint64)
    with np.errstate(over="ignore"):
        base = (gh[None, :] ^ (k[:, None] * np.uint64(0x9E3779B97F4A7C15))
                ^ np.uint64(seed * 0xD6E8FEB86659FD93 & 0xFFFFFFFFFFFFFFFF))
    u = [_uniform01(base, s) for s in _SPLITMIX_SALTS]
    r = -np.log(u[0]) - np.log(u[1])
    c = -np.log(u[2]) - np.log(u[3])
    beta = u[4]
    lw = np.log(cnt.astype(np.float64))[None, :]
    t_disc = np.floor(lw / r + beta)
    lna = np.log(c) - r * (t_disc - beta) - r
    arg = np.argmin(lna, axis=1)
    rows = np.arange(K)
    gsel = gh[arg]
    tsel = t_disc[rows, arg].astype(np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        sid = _mix64(gsel ^ (tsel * np.uint64(0xBF58476D1CE4E5B9))
                     ^ (k * np.uint64(0x94D049BB133111EB)), 0x1B873593)
    return sid


def cws_jaccard_pairs(ds, *, num: int = 1, den: int = 2, ngram: int = 3,
                      n_samples: int = 64, band_size: int = 2,
                      seed: int = 42, id_col: str = "doc_id",
                      lang_col: str | None = "lang", text_col: str = "text",
                      num_partitions: int = 64, max_group: int = 100_000,
                      overflow: str = "error"):
    """Weighted-Jaccard near-dup pairs via Consistent Weighted Sampling
    sketches — the SCALE path for ``weighted_jaccard_pairs`` when the
    gram universe is stopword-heavy and prefix groups would blow up
    (the weighted analog of MinHash-LSH for the set case).

    Per doc: ``n_samples`` CWS samples (collision probability exactly
    J_w, Ioffe 2010), banded ``band_size`` at a time -> band-bucket rows
    -> candidate_pairs -> tf-blob attach -> EXACT weighted verification
    (shared kernel with the exact path), so precision is 1 and only
    candidate recall is probabilistic: a pair at J_w = j survives with
    p = 1 - (1 - j^band_size)^(n_samples/band_size) (defaults: 0.9999
    at j = 0.5; pytest recall-gated).  ``overflow='error'`` by default —
    like the exact path, this output is completeness-critical, so a
    mega band-bucket (a duplicate family past ``max_group``) raises
    instead of silently degrading to star edges; pass
    ``overflow='star'`` to opt into that degradation.  Sketch cost per doc is
    O(n_samples x m) vectorized flops; band rows are 16 bytes — tf
    blobs never ride the band shuffle."""
    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.lsh import attach_signatures, candidate_pairs

    if not (0 < num <= den):
        raise ValueError("need 0 < num <= den")
    if n_samples % band_size:
        raise ValueError("band_size must divide n_samples")
    sigs = _tf_blob_table(ds, ngram=ngram, id_col=id_col,
                          lang_col=lang_col, text_col=text_col)

    n_bands = n_samples // band_size
    band_idx = np.arange(n_bands, dtype=np.uint64)

    def sketch_explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        blobs = b["tfblob"].to_pylist()
        langs = (
            pd.util.hash_array(
                np.asarray(b[lang_col].to_pylist(), dtype=object)
            ).astype(np.uint64)
            if lang_col else np.zeros(len(ids), dtype=np.uint64)
        )
        out_bucket, out_id = [], []
        for i, blob in enumerate(blobs):
            arr = np.frombuffer(blob, dtype="<u8").reshape(-1, 2)
            if len(arr) == 0:
                continue
            sid = _cws_samples(arr[:, 0], arr[:, 1], n_samples, seed)
            # fold each band's samples into one bucket hash
            h = np.zeros(n_bands, dtype=np.uint64)
            for j in range(band_size):
                h = _mix64(h ^ sid[j::band_size][:n_bands], 0x85EBCA6B + j)
            with np.errstate(over="ignore"):
                bucket = (_mix64(h ^ (band_idx * np.uint64(
                    0xC2B2AE3D27D4EB4F)), 0xE6546B64) ^ langs[i]).astype(np.int64)
            out_bucket.append(bucket)
            out_id.append(np.full(n_bands, ids[i], dtype=np.int64))
        if not out_bucket:
            return pa.table({"band_bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        return pa.table({"band_bucket": np.concatenate(out_bucket),
                         id_col: np.concatenate(out_id)})

    bands = sigs.map_batches(sketch_explode, batch_format="pyarrow",
                             batch_size=1024, zero_copy_batch=True)
    pairs = candidate_pairs(bands, MinHashConfig(max_band_group=max_group),
                            key_col=id_col, num_partitions=num_partitions,
                            overflow=overflow)
    withsigs = attach_signatures(pairs, sigs, key_col=id_col, sig_col="tfblob")
    return withsigs.map_batches(
        lambda b: _verify_weighted(b, num, den),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
