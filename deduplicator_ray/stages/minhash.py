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
- Shingle base hash = crc32 (deterministic across processes, C speed),
  folded into the Mersenne prime 2^31-1 so the affine step fits uint64
  without overflow.

Signatures are emitted as ``fixed_size_list<uint32, P>`` — zero-copy
Arrow all the way to the LSH stage.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

from deduplicator_ray.config import MinHashConfig

_P = np.uint64((1 << 31) - 1)  # Mersenne prime 2^31-1


def _perm_tables(cfg: MinHashConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, int(_P), size=cfg.num_perms, dtype=np.uint64)
    b = rng.integers(0, int(_P), size=cfg.num_perms, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int, token_re: re.Pattern[str]) -> np.ndarray:
    """Distinct crc32 hashes of the k-word shingles of ``text``."""
    words = token_re.findall(text.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    hs = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in set(shingles)),
        dtype=np.uint64,
    )
    return hs % _P


class MinHasher:
    """Actor-pool stage: text column -> minhash signature column."""

    def __init__(self, cfg: MinHashConfig | None = None, text_col: str = "text"):
        self.cfg = cfg or MinHashConfig()
        self.a, self.b = _perm_tables(self.cfg)
        self.token_re = re.compile(r"\w+", re.UNICODE)
        self.text_col = text_col

    def signature_matrix(self, texts: list[str | None]) -> np.ndarray:
        """(n_docs, num_perms) uint32 signature matrix."""
        cfg = self.cfg
        per_doc = [
            shingle_hashes(t or "", cfg.shingle_words, self.token_re) for t in texts
        ]
        counts = np.array([len(h) for h in per_doc], dtype=np.int64)
        n = len(per_doc)
        sigs = np.full((n, cfg.num_perms), int(_P), dtype=np.uint64)
        nonempty = counts > 0
        if nonempty.any():
            all_h = np.concatenate([h for h in per_doc if len(h)]) if nonempty.any() else None
            # (P x S) affine permutations in one shot; a*h+b < 2^62 fits uint64
            A = (self.a[:, None] * all_h[None, :] + self.b[:, None]) % _P
            offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
            np.cumsum(counts[nonempty][:-1], out=offsets[1:])
            mins = np.minimum.reduceat(A, offsets, axis=1)  # (P, n_nonempty)
            sigs[nonempty] = mins.T
        return sigs.astype(np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = self.signature_matrix(texts)
        # signatures travel as binary blobs (4*num_perms bytes, little-
        # endian uint32): Acero hash joins accept binary payload columns
        # but not fixed_size_list ones
        blob = sigs.astype("<u4").tobytes()
        w = 4 * self.cfg.num_perms
        sig_arr = pa.array([blob[i * w : (i + 1) * w] for i in range(len(texts))], type=pa.binary())
        return batch.append_column("minhash_sig", sig_arr)


def signatures(ds, cfg: MinHashConfig | None = None, *, text_col: str = "text",
               concurrency: int | tuple[int, int] = (2, 8), batch_size: int = 1024):
    """corpus Dataset -> Dataset with ``minhash_sig`` column (actor pool)."""
    cfg = cfg or MinHashConfig()
    return ds.map_batches(
        MinHasher,
        fn_constructor_args=(cfg, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased Jaccard estimate: fraction of equal minhash components."""
    return float(np.mean(sig_a == sig_b))
