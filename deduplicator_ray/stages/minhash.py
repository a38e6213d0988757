"""MinHash signatures over word shingles (north-star extension; no
counterpart in the reference, which only does exact digest matching —
SURVEY.md §2.7 note).

Design (north_rule: "batched MinHash signatures over word shingles ...
stateful stages on actor pools"):

- ``MinHasher`` is a callable CLASS -> Ray actor pool via
  ``map_batches(MinHasher, concurrency=N)``.  The permutation tables and
  tokenizer regex are built ONCE per actor in ``__init__``.
- Per batch the computation is fully vectorized: all shingle hashes of
  the batch are concatenated into one uint64 array; the 128 permutations
  are applied as one (P x S) modular-affine matrix; per-doc minima come
  from ``np.minimum.reduceat`` — no Python loop over permutations.
- Shingle base hash = vectorized siphash over the batch's concatenated
  token array + a position-sensitive rolling combine, folded into the
  Mersenne prime 2^31-1 so the affine step fits uint64 without overflow.

Signatures are emitted as a binary column (4*P bytes/doc, little-endian
uint32) built straight from buffers — zero-copy Arrow to the LSH stage.
"""

from __future__ import annotations

import re
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.config import MinHashConfig

_P = np.uint64((1 << 31) - 1)  # Mersenne prime 2^31-1


# NOTE on the modulus: numpy's uint64 scalar % measures ~8 ms per 1M
# elements — NOT the kernel's bottleneck.  The measured 90%-of-batch
# "affine" cost was the fresh multi-MB temporaries each chunk allocated
# (mmap/munmap + first-touch faults, the same pathology the embed kernel
# hit); the fix is in-place arithmetic into a persistent per-hasher
# buffer, keeping the plain scalar %.  A division-free Mersenne fold was
# tried and was SLOWER (5 array passes of temps vs 1 in-place divide).


def _perm_tables(cfg: MinHashConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, int(_P), size=cfg.num_perms, dtype=np.uint64)
    b = rng.integers(0, int(_P), size=cfg.num_perms, dtype=np.uint64)
    return a, b


# positional mixing constants for the rolling k-word shingle combine
_SHINGLE_COEF = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
     0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D], dtype=np.uint64,
)


def _word_hashes(words: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit word hashes (pandas siphash, fixed key —
    deterministic across processes/nodes)."""
    import pandas as pd

    return pd.util.hash_array(words).astype(np.uint64)


def _combine_shingles(wh: np.ndarray, k: int) -> np.ndarray:
    """uint64 word hashes -> distinct k-shingle hashes in [0, P): a
    position-sensitive multiply-xor combine, vectorized (k products over
    the array, no Python per shingle)."""
    n = len(wh)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    k = min(k, n)
    with np.errstate(over="ignore"):
        h = wh[: n - k + 1] * _SHINGLE_COEF[0]
        for j in range(1, k):
            h = h ^ (wh[j : n - k + 1 + j] * _SHINGLE_COEF[j % len(_SHINGLE_COEF)])
    return np.unique(h % _P)


def shingle_hashes(text: str, k: int, token_re: re.Pattern[str]) -> np.ndarray:
    """Distinct 64-bit hashes of the k-word shingles of ``text``
    (vectorized: C-regex tokenize, siphash word hashes, rolling combine).
    Texts shorter than k words collapse to one all-words shingle."""
    words = token_re.findall(text.lower())
    if not words:
        return np.empty(0, dtype=np.uint64)
    wh = _word_hashes(np.asarray(words, dtype=object))
    return _combine_shingles(wh, k)


class MinHasher:
    """Actor-pool stage: text column -> minhash signature column."""

    def __init__(self, cfg: MinHashConfig | None = None, text_col: str = "text",
                 word_hash: str = "pandas"):
        self.cfg = cfg or MinHashConfig()
        self.a, self.b = _perm_tables(self.cfg)
        self.word_hash = word_hash
        if word_hash == "md5":
            # DuckDB-recomputable variant (see queries_ext
            # `minhash_md5_sigs`): per-word hash = md5_number_lower and
            # an ASCII \\w token class, so a SQL regexp reproduces the
            # token stream byte-for-byte.  Production default stays the
            # vectorized siphash path with unicode \\w.
            self.token_re = re.compile(r"[0-9a-z_]+")
        else:
            self.token_re = re.compile(r"\w+", re.UNICODE)
        self.text_col = text_col
        self._affine_buf = np.empty(0, dtype=np.uint64)  # grow-only scratch

    def _affine(self, n_elems: int) -> np.ndarray:
        """Persistent (num_perms x chunk) uint64 scratch: the affine step
        runs fully in place here instead of allocating 3 fresh multi-MB
        temporaries per chunk — allocation (mmap + first-touch faults)
        measured ~3x the arithmetic itself on this host."""
        if self._affine_buf.size < n_elems:
            self._affine_buf = np.empty(n_elems, dtype=np.uint64)
        return self._affine_buf[:n_elems]

    def signature_matrix(self, texts: list[str | None], *,
                         distinct_counts: list | None = None) -> np.ndarray:
        """(n_docs, num_perms) uint32 signature matrix.

        Whole-batch vectorization: every doc's words are hashed in ONE
        ``pd.util.hash_array`` call over the concatenated token array;
        only the (cheap) k-term rolling combine runs per doc.

        ``distinct_counts``: pass an empty list to ALSO receive the
        per-doc DISTINCT shingle counts (int64 array appended to the
        list) — consumers like ``containment_est_pairs`` need |A|
        without re-running the tokenize/hash work."""
        cfg = self.cfg
        words_per_doc = [self.token_re.findall((t or "").lower()) for t in texts]
        lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                           count=len(words_per_doc))
        if lens.sum() == 0:
            per_doc = [np.empty(0, dtype=np.uint64) for _ in texts]
        else:
            flat = np.empty(int(lens.sum()), dtype=object)
            pos = 0
            for w in words_per_doc:
                flat[pos : pos + len(w)] = w
                pos += len(w)
            if self.word_hash == "md5":
                from deduplicator_ray.stages.simhash import _md5_lower64

                all_wh = _md5_lower64(flat)
            else:
                all_wh = _word_hashes(flat)
            bounds = np.concatenate(([0], np.cumsum(lens)))
            per_doc = [
                _combine_shingles(all_wh[bounds[i] : bounds[i + 1]], cfg.shingle_words)
                for i in range(len(texts))
            ]
        counts = np.array([len(h) for h in per_doc], dtype=np.int64)
        if distinct_counts is not None:
            distinct_counts.append(np.fromiter(
                (len(np.unique(h)) for h in per_doc), dtype=np.int64,
                count=len(per_doc)))
        n = len(per_doc)
        sigs = np.full((n, cfg.num_perms), int(_P), dtype=np.uint64)
        nonempty_idx = np.flatnonzero(counts > 0)
        if len(nonempty_idx):
            all_h = np.concatenate([per_doc[i] for i in nonempty_idx])
            ne_counts = counts[nonempty_idx]
            bounds2 = np.concatenate(([0], np.cumsum(ne_counts)))
            # (P x S) affine permutations, evaluated in doc-aligned chunks
            # so the temp matrix stays ~32 MB (one giant a*h+b%P temp set
            # costs more in page faults than the arithmetic itself)
            max_elems = 1_000_000
            chunk_s = max(1, max_elems // cfg.num_perms)
            doc_lo = 0
            while doc_lo < len(nonempty_idx):
                doc_hi = doc_lo
                while (
                    doc_hi < len(nonempty_idx)
                    and bounds2[doc_hi + 1] - bounds2[doc_lo] <= chunk_s
                ):
                    doc_hi += 1
                doc_hi = max(doc_hi, doc_lo + 1)  # a huge doc still goes alone
                sub = all_h[bounds2[doc_lo] : bounds2[doc_hi]]
                A = self._affine(cfg.num_perms * len(sub)).reshape(
                    cfg.num_perms, len(sub)
                )
                np.multiply(self.a[:, None], sub[None, :], out=A)
                np.add(A, self.b[:, None], out=A)
                np.mod(A, _P, out=A)
                offs = (bounds2[doc_lo:doc_hi] - bounds2[doc_lo]).astype(np.int64)
                mins = np.minimum.reduceat(A, offs, axis=1)  # (P, docs_in_chunk)
                sigs[nonempty_idx[doc_lo:doc_hi]] = mins.T
                doc_lo = doc_hi
        return sigs.astype(np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = self.signature_matrix(texts)
        # signatures travel as binary blobs (4*num_perms bytes, little-
        # endian uint32): Acero hash joins accept binary payload columns
        # but not fixed_size_list ones
        blob = sigs.astype("<u4").tobytes()
        w = 4 * self.cfg.num_perms
        n = len(texts)
        # build the binary array straight from buffers (no per-doc slices)
        offsets = np.arange(n + 1, dtype=np.int32) * w
        sig_arr = pa.BinaryArray.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)]
        )
        return batch.append_column("minhash_sig", sig_arr)


_HASHER_CACHE: dict[tuple, "MinHasher"] = {}


def signatures(ds, cfg: MinHashConfig | None = None, *, text_col: str = "text",
               concurrency: int | tuple[int, int] | None = None, batch_size: int = 1024,
               use_actor_pool: bool = False, word_hash: str = "pandas"):
    """corpus Dataset -> Dataset with ``minhash_sig`` column.

    Default is a TASK pool with a per-PROCESS cached ``MinHasher``: Ray
    reuses worker processes across tasks, so the permutation tables are
    still built once per worker — the actor-pool guarantee — while task
    scheduling avoids the pool's ramp-up/queueing costs (measured 2.6x
    faster on a 16-cpu budget: 9.2 s vs 24.3 s for 640k docs; the state
    here is microseconds to build, so the pool bought nothing).

    ``use_actor_pool=True`` keeps the explicit actor-pool form — the
    right shape when per-actor state is genuinely expensive (a model
    checkpoint, a big broadcast table) or must NOT be rebuilt per
    process."""
    from deduplicator_ray.util import auto_concurrency

    cfg = cfg or MinHashConfig()
    if use_actor_pool:
        concurrency = concurrency or auto_concurrency()
        return ds.map_batches(
            MinHasher,
            fn_constructor_args=(cfg, text_col, word_hash),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            zero_copy_batch=True,
        )

    def f(batch: pa.Table) -> pa.Table:
        key = (cfg, text_col, word_hash)
        mh = _HASHER_CACHE.get(key)
        if mh is None:
            mh = _HASHER_CACHE.setdefault(key, MinHasher(cfg, text_col, word_hash))
        return mh(batch)

    return ds.map_batches(
        f, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased Jaccard estimate: fraction of equal minhash components."""
    return float(np.mean(sig_a == sig_b))


# ---------------------------------------------------------------------------
# b-bit minhash (Li & Koenig, WWW 2010 / CACM 2011)
# ---------------------------------------------------------------------------

def _blob_matrix(col: pa.ChunkedArray | pa.Array, width: int) -> np.ndarray:
    """Fixed-width binary column -> (n, width) uint8 matrix (zero-copy
    when the array is null-free and contiguous; gather otherwise)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, width), dtype=np.uint8)
    if col.null_count == 0:
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ]
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        if offsets[-1] - offsets[0] == n * width:
            return data[offsets[0] : offsets[0] + n * width].reshape(n, width)
        return data[offsets[:-1, None] + np.arange(width)]
    out = np.empty((n, width), dtype=np.uint8)
    for i, blob in enumerate(col.to_pylist()):
        out[i] = np.frombuffer(blob, dtype=np.uint8)
    return out


def bbit_pack(ds, cfg: MinHashConfig | None = None, *, b: int = 1,
              sig_col: str = "minhash_sig", out_col: str = "bbit_sig",
              drop_sig: bool = False):
    """Full minhash signatures -> b-bit sketches (Li & Koenig 2010):
    keep only the lowest ``b`` bits of each of the ``num_perms`` minhash
    values, packed bitwise — 32/b x smaller at rest (128 perms: 512 B ->
    16 B at b=1), which is what makes RETAINING sketches of a 10^12-doc
    corpus for cross-snapshot dedup feasible.  Estimation error grows
    only ~sqrt((1-C)^-2 / k), so b=1 with 2-4x more perms still nets
    >= 8x storage at equal accuracy (the paper's headline result).

    Map-only; the bit extraction and packing are whole-batch numpy
    (``np.unpackbits``/``packbits``), no per-row Python."""
    from deduplicator_ray.stages.lsh import _sig_matrix

    cfg = cfg or MinHashConfig()
    if b not in (1, 2, 4, 8):
        raise ValueError("b must be one of 1, 2, 4, 8 (byte-aligned packs)")
    k = cfg.num_perms

    def f(batch: pa.Table) -> pa.Table:
        sigs = _sig_matrix(batch[sig_col], k)
        n = len(sigs)
        low = (sigs & np.uint32((1 << b) - 1)).astype(np.uint8)
        bits = np.unpackbits(low[:, :, None], axis=2)[:, :, 8 - b:]
        packed = np.packbits(bits.reshape(n, k * b), axis=1)
        w = packed.shape[1] if n else (k * b + 7) // 8
        offsets = np.arange(n + 1, dtype=np.int32) * w
        arr = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(np.ascontiguousarray(packed).tobytes())])
        out = batch.append_column(out_col, arr)
        if drop_sig:
            out = out.drop_columns([sig_col])
        return out

    return ds.map_batches(f, batch_format="pyarrow", batch_size=1024,
                          zero_copy_batch=True)


def bbit_estimate_matrix(pa_bits: np.ndarray, pb_bits: np.ndarray, *,
                         k: int, b: int) -> np.ndarray:
    """(n, W) packed sketch pairs -> unbiased Jaccard estimates in ppm
    (int64).  P(b-bit values collide) = C + (1-C) J with C = 2^-b (the
    Li-Koenig C1/C2 terms collapse to 2^-b when set sizes are tiny vs
    the 2^64 hash domain), so J_hat = (P_hat - C) / (1 - C), clipped to
    [0, 1].  Integer ppm output keeps the driver pin exact."""
    n = len(pa_bits)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    diff = np.unpackbits(pa_bits ^ pb_bits, axis=1)[:, : k * b]
    group_diff = diff.reshape(n, k, b).any(axis=2)
    phat = 1.0 - group_diff.sum(axis=1) / k
    C = 2.0 ** -b
    j = np.clip((phat - C) / (1.0 - C), 0.0, 1.0)
    return np.floor(j * 1_000_000 + 0.5).astype(np.int64)


def bbit_jaccard_pairs(ds, cfg: MinHashConfig | None = None, *, b: int = 1,
                       key_col: str = "doc_key", text_col: str = "text",
                       num_partitions: int = 64,
                       min_est_ppm: int | None = None):
    """Near-dup candidate pairs scored from b-bit sketches ONLY:
    signatures -> LSH banding (full signatures, standard recall curve)
    -> candidate pairs -> attach the b-bit sketch (16 bytes/doc at
    default config, not the 512-byte signature) -> Jaccard ESTIMATE per
    pair.  The compressed sketch is the only per-doc state the scoring
    shuffle ships — the retention/transport shape for trillion-doc
    corpora where verified_edges' full-signature attach is too heavy.
    Returns (doc_a, doc_b, j_est_ppm); ``min_est_ppm`` filters on the
    estimate.  Accuracy is pytest-gated (|J_hat - J| bounded by the
    binomial bound); the driver query pins the exact output."""
    from deduplicator_ray.stages.lsh import (attach_signatures, band_explode,
                                             candidate_pairs)

    cfg = cfg or MinHashConfig()
    # key+sig only: materializing with the text column would pin the
    # whole corpus in the object store for the stage's lifetime
    sigs = signatures(ds, cfg, text_col=text_col).select_columns(
        [key_col, "minhash_sig"]).materialize()
    bands = band_explode(sigs, cfg, key_col=key_col)
    pairs = candidate_pairs(bands, cfg, key_col=key_col,
                            num_partitions=num_partitions)
    sketches = bbit_pack(sigs, cfg, b=b, drop_sig=True)
    withsk = attach_signatures(pairs, sketches, key_col=key_col,
                               sig_col="bbit_sig")
    k = cfg.num_perms
    W = (k * b + 7) // 8

    def score(batch: pa.Table) -> pa.Table:
        est = bbit_estimate_matrix(_blob_matrix(batch["sig_a"], W),
                                   _blob_matrix(batch["sig_b"], W), k=k, b=b)
        t = pa.table({"doc_a": batch["a"], "doc_b": batch["b"],
                      "j_est_ppm": pa.array(est)})
        if min_est_ppm is not None:
            t = t.filter(pc.greater_equal(t["j_est_ppm"],
                                          pa.scalar(min_est_ppm)))
        return t

    return withsk.map_batches(score, batch_format="pyarrow",
                              batch_size=4096, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# containment estimation from minhash sketches (quote / subset detection)
# ---------------------------------------------------------------------------

def containment_est_pairs(ds, cfg: MinHashConfig | None = None, *,
                          key_col: str = "doc_key", text_col: str = "text",
                          num_partitions: int = 64,
                          min_c_ppm: int | None = None,
                          word_hash: str = "pandas"):
    """Asymmetric CONTAINMENT estimates for near-dup candidates, from
    minhash sketches + exact distinct-shingle counts: c(A->B) =
    |A ∩ B| / |A| — the quote / page-within-page / partial-mirror signal
    the symmetric Jaccard flattens (a doc fully quoted inside a 10x
    bigger page has c = 1.0 but J ~ 0.1).

    Estimator: J_hat = signature agreement fraction; with exact sizes
    |A|, |B| (8 bytes each, computed once per doc), I_hat =
    J_hat (|A| + |B|) / (1 + J_hat) and c_a = I_hat / |A|, c_b =
    I_hat / |B|, both clipped to [0, 1], integer ppm.  Returns
    (doc_a, doc_b, c_ab_ppm, c_ba_ppm, j_est_ppm).

    Scale shape: the size rides INSIDE the signature blob (sig || u64
    size), so the existing attach machinery ships one binary column and
    the shuffles stay key-only.  RECALL CAVEAT (documented, inherent):
    candidates come from Jaccard-keyed LSH banding, so a tiny doc inside
    a much bigger one (high c, low J) can miss candidacy — the exact
    prefix-filter path (stages/jaccard.ngram_containment_pairs) is the
    completeness-critical alternative; per-size-partition banding (LSH
    Ensemble, Zhu et al. VLDB 2016) is the scale remedy if that matters.
    """
    from deduplicator_ray.stages.lsh import (attach_signatures,
                                             band_explode, candidate_pairs)

    cfg = cfg or MinHashConfig()
    k = cfg.num_perms

    def sig_and_size(b: pa.Table) -> pa.Table:
        # ONE tokenize/hash pass: the signature kernel also reports the
        # per-doc distinct-shingle counts (|A| for the estimator)
        key = (cfg, text_col, word_hash)
        mh = _HASHER_CACHE.get(key)
        if mh is None:
            mh = _HASHER_CACHE.setdefault(
                key, MinHasher(cfg, text_col, word_hash))
        texts = b[text_col].to_pylist()
        out: list = []
        sig = mh.signature_matrix(texts, distinct_counts=out)
        sizes = out[0].astype("<u8")
        n = len(sig)
        sig_bytes = sig.astype("<u4").view(np.uint8).reshape(n, 4 * k)
        blob = np.concatenate(
            [sig_bytes, sizes.view(np.uint8).reshape(n, 8)], axis=1)
        w = 4 * k + 8
        offsets = np.arange(n + 1, dtype=np.int32) * w
        arr = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(np.ascontiguousarray(blob).tobytes())])
        sig_off = np.arange(n + 1, dtype=np.int32) * (4 * k)
        sig_arr = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(sig_off.tobytes()),
             pa.py_buffer(np.ascontiguousarray(sig_bytes).tobytes())])
        return pa.table({key_col: b[key_col], "sigsz": arr,
                         "minhash_sig": sig_arr})

    sigsz = ds.select_columns([key_col, text_col]).map_batches(
        sig_and_size, batch_format="pyarrow", batch_size=1024,
        zero_copy_batch=True).materialize()
    bands = band_explode(sigsz, cfg, key_col=key_col)
    pairs = candidate_pairs(bands, cfg, key_col=key_col,
                            num_partitions=num_partitions)
    withsk = attach_signatures(
        pairs, sigsz.select_columns([key_col, "sigsz"]),
        key_col=key_col, sig_col="sigsz")

    def score(batch: pa.Table) -> pa.Table:
        W = 4 * k + 8
        A = _blob_matrix(batch["sig_a"], W)
        B = _blob_matrix(batch["sig_b"], W)
        sa = A[:, : 4 * k].copy().view("<u4").reshape(len(A), k)
        sb = B[:, : 4 * k].copy().view("<u4").reshape(len(B), k)
        za = A[:, 4 * k:].copy().view("<u8").ravel().astype(np.float64)
        zb = B[:, 4 * k:].copy().view("<u8").ravel().astype(np.float64)
        j = (sa == sb).mean(axis=1)
        inter = j * (za + zb) / (1.0 + j)
        with np.errstate(divide="ignore", invalid="ignore"):
            ca = np.where(za > 0, np.clip(inter / za, 0.0, 1.0), 0.0)
            cb = np.where(zb > 0, np.clip(inter / zb, 0.0, 1.0), 0.0)
        t = pa.table({
            "doc_a": batch["a"], "doc_b": batch["b"],
            "c_ab_ppm": pa.array(np.floor(ca * 1e6 + 0.5).astype(np.int64)),
            "c_ba_ppm": pa.array(np.floor(cb * 1e6 + 0.5).astype(np.int64)),
            "j_est_ppm": pa.array(np.floor(j * 1e6 + 0.5).astype(np.int64)),
        })
        if min_c_ppm is not None:
            keep = pc.greater_equal(
                pc.max_element_wise(t["c_ab_ppm"], t["c_ba_ppm"]),
                pa.scalar(min_c_ppm))
            t = t.filter(keep)
        return t

    return withsk.map_batches(score, batch_format="pyarrow",
                              batch_size=4096, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# LSH-Ensemble-style containment pair mining (Zhu et al., VLDB 2016)
# ---------------------------------------------------------------------------

def _ensemble_rows_per_band(j_min: float, k: int, target_recall: float) -> int:
    """Largest rows-per-band r such that banding k samples at r rows
    keeps pair recall >= target at Jaccard j_min: 1-(1-j^r)^(k//r)."""
    best = 1
    for r in range(1, 9):
        b = k // r
        if b < 1:
            break
        if 1.0 - (1.0 - j_min ** r) ** b >= target_recall:
            best = r
    return best


def containment_pairs_ensemble(ds, *, num: int = 4, den: int = 5,
                               cfg: MinHashConfig | None = None,
                               key_col: str = "doc_key",
                               text_col: str = "text",
                               max_ratio_log2: int = 3,
                               target_recall: float = 0.95,
                               num_partitions: int = 64,
                               max_group: int = 100_000,
                               overflow: str = "star"):
    """Containment pair mining at scale, LSH-Ensemble style (Zhu et
    al., VLDB 2016): docs are STRATIFIED BY SET SIZE (log2 buckets) and
    each stratum PAIR gets its own banding — fewer rows per band the
    larger the size ratio, because a contained pair's Jaccard shrinks
    with the ratio (I >= c|A|, |B| <= R|A| => J >= c/(1+R-c)).  Plain
    Jaccard-keyed banding (``containment_est_pairs``'s documented
    caveat) misses exactly these high-containment/low-J pairs; the
    ensemble engineers >= ``target_recall`` candidate recall for every
    ratio up to 2^``max_ratio_log2`` (beyond that J collapses toward 0
    and the exact prefix-filter path ``ngram_containment_pairs`` is the
    honest tool).  Every candidate is verified EXACTLY on the distinct
    shingle sets, so precision is 1 and the output keeps (doc_a, doc_b,
    n_inter, size_a, size_b) with den*n_inter >= num*min(size_a,
    size_b).

    Shape: ONE tokenize pass emits (sig, sorted distinct-shingle blob,
    size); band rows are 16 bytes keyed (stratum-pair, band, r-row
    hash); one candidate shuffle serves every stratum pair (the pair id
    salts the bucket); the set blobs ride only the (small) verify
    attach."""
    from deduplicator_ray.stages.jaccard import pack_u64_blobs
    from deduplicator_ray.stages.lsh import attach_signatures, candidate_pairs

    cfg = cfg or MinHashConfig()
    if not (0 < num <= den):
        raise ValueError("need 0 < num <= den")
    k = cfg.num_perms
    c_thr = num / den
    # rows-per-band per stratum DISTANCE d: worst ratio R = 2^(d+1)
    r_of_dist = [
        _ensemble_rows_per_band(c_thr / (1.0 + 2.0 ** (d + 1) - c_thr),
                                k, target_recall)
        for d in range(max_ratio_log2 + 1)
    ]
    token_re = re.compile(r"\w+", re.UNICODE)

    def prep(b: pa.Table) -> pa.Table:
        key = (cfg, text_col)
        mh = _HASHER_CACHE.get(key)
        if mh is None:
            mh = _HASHER_CACHE.setdefault(key, MinHasher(cfg, text_col))
        texts = b[text_col].to_pylist()
        uniqs, sigs, sizes = [], [], []
        for t in texts:
            u = np.unique(shingle_hashes(t or "", cfg.shingle_words,
                                         token_re))
            uniqs.append(u)
            sizes.append(len(u))
            if len(u):
                with np.errstate(over="ignore"):
                    A = (mh.a[:, None] * u[None, :] + mh.b[:, None]) % _P
                sigs.append(A.min(axis=1).astype(np.uint32))
            else:
                sigs.append(np.full(k, int(_P), dtype=np.uint32))
        sig_bytes = np.ascontiguousarray(np.stack(sigs)).astype("<u4")
        n = len(texts)
        offsets = np.arange(n + 1, dtype=np.int32) * (4 * k)
        sig_arr = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(sig_bytes.tobytes())])
        return pa.table({key_col: b[key_col], "minhash_sig": sig_arr,
                         "setblob": pack_u64_blobs(uniqs),
                         "set_size": pa.array(
                             np.asarray(sizes, dtype=np.int64))})

    base = ds.select_columns([key_col, text_col]).map_batches(
        prep, batch_format="pyarrow", batch_size=1024,
        zero_copy_batch=True).materialize()

    def band_rows(b: pa.Table) -> pa.Table:
        from deduplicator_ray.stages.jaccard import _mix64
        from deduplicator_ray.stages.lsh import _sig_matrix

        ids = np.asarray(b[key_col], dtype=np.int64)
        sizes = np.asarray(b["set_size"], dtype=np.int64)
        sig = _sig_matrix(b["minhash_sig"], k).astype(np.uint64)
        out_bucket, out_id = [], []
        strata = np.maximum(sizes, 1)
        strata = np.frexp(strata.astype(np.float64))[1] - 1  # floor(log2)
        for i in range(len(ids)):
            if sizes[i] == 0:
                continue
            s = int(strata[i])
            for t in range(max(0, s - max_ratio_log2),
                           s + max_ratio_log2 + 1):
                lo, hi = min(s, t), max(s, t)
                r = r_of_dist[hi - lo]
                nb = k // r
                with np.errstate(over="ignore"):
                    h = np.zeros(nb, dtype=np.uint64)
                    for j in range(r):
                        h = _mix64(h ^ sig[i, j::r][:nb],
                                   0x9E3779B9 + 977 * j)
                    pair_salt = np.uint64(
                        (lo * 131 + hi) * 0xC2B2AE3D27D4EB4F
                        & 0xFFFFFFFFFFFFFFFF)
                    band_idx = np.arange(nb, dtype=np.uint64)
                    bucket = _mix64(
                        h ^ pair_salt ^ (band_idx
                                         * np.uint64(0xD6E8FEB86659FD93)),
                        0xE6546B64).astype(np.int64)
                out_bucket.append(bucket)
                out_id.append(np.full(nb, ids[i], dtype=np.int64))
        if not out_bucket:
            return pa.table({"band_bucket": pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64())})
        return pa.table({"band_bucket": np.concatenate(out_bucket),
                         key_col: np.concatenate(out_id)})

    bands = base.select_columns([key_col, "minhash_sig", "set_size"]
                                ).map_batches(
        band_rows, batch_format="pyarrow", batch_size=1024,
        zero_copy_batch=True)
    pairs = candidate_pairs(bands, MinHashConfig(max_band_group=max_group),
                            key_col=key_col, num_partitions=num_partitions,
                            overflow=overflow)
    withsets = attach_signatures(
        pairs, base.select_columns([key_col, "setblob"]),
        key_col=key_col, sig_col="setblob")

    def verify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        inter = np.zeros(n, dtype=np.int64)
        sa = np.zeros(n, dtype=np.int64)
        sb = np.zeros(n, dtype=np.int64)
        for i, (ba, bb) in enumerate(zip(b["sig_a"].to_pylist(),
                                         b["sig_b"].to_pylist())):
            aa = np.frombuffer(ba, dtype="<u8")
            ab = np.frombuffer(bb, dtype="<u8")
            sa[i], sb[i] = len(aa), len(ab)
            inter[i] = len(np.intersect1d(aa, ab, assume_unique=True))
        keep = (inter > 0) & (den * inter >= num * np.minimum(sa, sb))
        t = b.filter(pa.array(keep))
        return pa.table({"doc_a": t["a"], "doc_b": t["b"],
                         "n_inter": pa.array(inter[keep]),
                         "size_a": pa.array(sa[keep]),
                         "size_b": pa.array(sb[keep])})

    return withsets.map_batches(verify, batch_format="pyarrow",
                                batch_size=4096, zero_copy_batch=True)
