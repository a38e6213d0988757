"""SimHash near-duplicate detection (training-data-pipeline extension).

64-bit SimHash over word features: each token hashes to 64 bits; each bit
position accumulates +1/-1 votes across the doc's tokens; the signature
is the sign vector.  Near-duplicates have small Hamming distance.

Candidate generation reuses the LSH machinery (stages/lsh.py): the 64-bit
signature is split into 4 x 16-bit chunks stored in the same binary
signature layout ``candidate_pairs`` consumes, with a 4-band x 1-row
config — by the pigeonhole principle any pair within Hamming distance 3
shares at least one exact 16-bit chunk, so banding finds every such pair.
Verification computes the exact Hamming distance (vectorized popcount).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from deduplicator_ray.config import MinHashConfig
from deduplicator_ray.stages.lsh import _sig_matrix, band_explode, candidate_pairs

# config that makes lsh.band_explode treat the 4x16-bit chunks as 4 bands
SIMHASH_BAND_CFG = MinHashConfig(
    shingle_words=1, num_perms=4, bands=4, rows_per_band=1, jaccard_threshold=0.0
)


def _token_hashes64(text: str) -> np.ndarray:
    """Vectorized 64-bit per-token hashes (pandas siphash, fixed key)."""
    import pandas as pd

    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)


# exact RE2 \s character class — the md5 token-hash variant tokenizes
# with THIS so a DuckDB oracle (string_split_regex on the same class)
# reproduces the token stream byte-for-byte; Python str.split() would
# additionally split on unicode whitespace the SQL regex can't see
_SQL_WS_RE = re.compile(r"[ \t\n\r\f]+")


def _md5_lower64(flat: np.ndarray) -> np.ndarray:
    """Per-token 64-bit hash = little-endian int of md5 digest bytes
    8..16 — exactly DuckDB's ``md5_number_lower``, making the whole
    SimHash vote kernel SQL-recomputable.  Python-loops over tokens by
    construction (hashlib has no batch API); it exists as the
    correctness bridge for the oracle row — the production default
    stays the vectorized pandas siphash path."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[8:], "little")
         for w in flat),
        dtype=np.uint64, count=len(flat))


def _batch_simhash(texts: list[str | None], *, token_hash: str = "pandas") -> np.ndarray:
    """Whole-batch SimHash: one token-hash pass over the concatenated
    token array, per-doc bit votes via ``np.add.reduceat``.

    ``token_hash="pandas"`` (default): siphash via pandas, unicode
    whitespace tokenization — the fast production path.
    ``token_hash="md5"``: DuckDB-mirrorable md5_number_lower hashes over
    the RE2 ``\\s`` tokenization — the independently-recomputable path
    (see `_md5_lower64`)."""
    import pandas as pd

    if token_hash == "md5":
        toks_per = [[w for w in _SQL_WS_RE.split((t or "").lower()) if w]
                    for t in texts]
    else:
        toks_per = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(w) for w in toks_per), dtype=np.int64, count=len(toks_per))
    sigs = np.zeros(len(texts), dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return sigs
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in toks_per:
        flat[pos : pos + len(w)] = w
        pos += len(w)
    if token_hash == "md5":
        h = _md5_lower64(flat)
    else:
        h = pd.util.hash_array(flat).astype(np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )  # (T, 64)
    nonempty = np.flatnonzero(lens > 0)
    offsets = np.concatenate(([0], np.cumsum(lens[nonempty][:-1])))
    ones = np.add.reduceat(bits, offsets, axis=0)  # (n_nonempty, 64)
    votes = 2 * ones - lens[nonempty][:, None]
    pos_bits = (votes > 0).astype(np.uint64)  # (n_nonempty, 64)
    packed = (pos_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    sigs[nonempty] = packed
    return sigs


def simhash64(text: str | None) -> int:
    """64-bit SimHash of a text (0 for empty)."""
    return int(_batch_simhash([text])[0])


class SimHasher:
    """Actor-pool stage: adds ``simhash`` (int64 bit-cast) and the banded
    binary signature column reused by the LSH candidate machinery."""

    def __init__(self, text_col: str = "text", token_hash: str = "pandas"):
        self.text_col = text_col
        self.token_hash = token_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = _batch_simhash(texts, token_hash=self.token_hash)
        # 4 x 16-bit chunks widened to uint32, little-endian — the layout
        # lsh._sig_matrix / band_explode expect
        chunks = np.empty((len(texts), 4), dtype=np.uint32)
        for c in range(4):
            chunks[:, c] = ((sigs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.uint32)
        blob = chunks.astype("<u4").tobytes()
        sig_arr = pa.array(
            [blob[i * 16 : (i + 1) * 16] for i in range(len(texts))], type=pa.binary()
        )
        out = batch.append_column("simhash", pa.array(sigs.astype(np.int64)))
        return out.append_column("minhash_sig", sig_arr)


def simhash_signatures(ds, *, text_col: str = "text", token_hash: str = "pandas",
                       concurrency: int | tuple[int, int] | None = None, batch_size: int = 1024):
    from deduplicator_ray.util import auto_concurrency

    concurrency = concurrency or auto_concurrency()
    return ds.map_batches(
        SimHasher,
        fn_constructor_args=(text_col, token_hash),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    v = x.copy()
    count = np.zeros(v.shape, dtype=np.int64)
    while True:
        nz = v != 0
        if not nz.any():
            return count
        count += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)


def simhash_pairs(ds, *, key_col: str = "doc_key", max_hamming: int = 3,
                  num_partitions: int = 8, overflow: str = "star"):
    """Signature dataset (from simhash_signatures) -> distinct pairs
    (a, b, hamming) with Hamming distance <= max_hamming.

    Banding guarantee: complete for max_hamming <= 3 (4 bands); larger
    radii may miss pairs that differ in all four chunks.  ``overflow``
    is passed through to ``candidate_pairs``: "star" (default) degrades
    mega chunk-buckets to connectivity-preserving stars; "error" raises
    instead, for callers that need pair-level completeness (e.g. the
    brute-force-checked oracle row)."""
    from deduplicator_ray.stages.lsh import attach_signatures

    sigs = ds.select_columns([key_col, "minhash_sig"]).materialize()
    bands = band_explode(sigs, SIMHASH_BAND_CFG, key_col=key_col)
    pairs = candidate_pairs(bands, SIMHASH_BAND_CFG, key_col=key_col,
                            num_partitions=num_partitions, overflow=overflow)
    withsigs = attach_signatures(pairs, sigs, key_col=key_col, num_partitions=num_partitions)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        sa = _sig_matrix(b["sig_a"], 4).astype(np.uint64)
        sb = _sig_matrix(b["sig_b"], 4).astype(np.uint64)
        va = (sa[:, 0] | (sa[:, 1] << np.uint64(16)) | (sa[:, 2] << np.uint64(32)) | (sa[:, 3] << np.uint64(48)))
        vb = (sb[:, 0] | (sb[:, 1] << np.uint64(16)) | (sb[:, 2] << np.uint64(32)) | (sb[:, 3] << np.uint64(48)))
        d = _popcount64(va ^ vb)
        keep = d <= max_hamming
        t = b.filter(pa.array(keep))
        return pa.table({"a": t["a"], "b": t["b"], "hamming": pa.array(d[keep])})

    return withsigs.map_batches(verify, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


def hash64_signatures(ds, *, id_col: str, hash_col: str):
    """Any int64 64-bit hash column -> (id, minhash_sig) in the banded
    4 x 16-bit signature layout ``simhash_pairs`` consumes — lets
    perceptual image hashes (stages/multimodal.py phash) and other
    64-bit fingerprints ride the same pigeonhole-complete hamming-pair
    machinery as text SimHash."""
    def pack(b: pa.Table) -> pa.Table:
        h = np.asarray(b[hash_col], dtype=np.int64).astype(np.uint64)
        chunks = np.empty((len(h), 4), dtype=np.uint32)
        for c in range(4):
            chunks[:, c] = ((h >> np.uint64(16 * c))
                            & np.uint64(0xFFFF)).astype(np.uint32)
        blob = chunks.astype("<u4").tobytes()
        sig = pa.array([blob[i * 16:(i + 1) * 16] for i in range(len(h))],
                       type=pa.binary())
        return pa.table({id_col: pa.compute.cast(b[id_col], pa.int64()),
                         "minhash_sig": sig})

    return ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)


def hamming_pairs(ds, *, id_col: str, hash_col: str, max_hamming: int = 3,
                  num_partitions: int = 8):
    """Distinct pairs (a, b, hamming) of rows whose 64-bit ``hash_col``
    values differ in <= ``max_hamming`` bits — complete for radius <= 3
    by the 4-band pigeonhole (see simhash_pairs)."""
    return simhash_pairs(hash64_signatures(ds, id_col=id_col,
                                           hash_col=hash_col),
                         key_col=id_col, max_hamming=max_hamming,
                         num_partitions=num_partitions)
