"""Suffix-array longest-duplicate-substring detection (north_rule:
"suffix-array-based longest-duplicate-substring detection for
boilerplate-heavy pages").

Two operators:

- ``longest_repeated_substring``: per-doc self-similarity — the longest
  substring occurring at least twice inside one document (boilerplate
  shells repeat nav/footer blocks).  Stateless ``map_batches``; the
  suffix-array doubling is numpy-vectorized, the Kasai LCP walk is an
  O(n) amortized loop over characters.
- ``pair_longest_common_substring``: for candidate pairs (bounded by the
  LSH stage — never all-pairs), the longest common substring between the
  two texts via a joint suffix array over s + SEP + t, taking the max
  LCP between adjacent suffixes from different documents.

Scale note: CPU-heavy per row (O(n log n) on text length). Run as a
task-pool ``map_batches`` sized by ``num_cpus``; candidate pairs are the
verified LSH edges, i.e. a small fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling with np.lexsort; O(n log^2 n)."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(codes, dtype=np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        newrank = np.zeros(n, dtype=np.int64)
        diff = (rank[order[1:]] != rank[order[:-1]]) | (
            second[order[1:]] != second[order[:-1]]
        )
        newrank[order[1:]] = np.cumsum(diff)
        rank = newrank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def _lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's algorithm; lcp[i] = LCP(suffix sa[i-1], suffix sa[i])."""
    n = len(codes)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            m = n - max(i, j)
            while h < m and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def _codes(text: str) -> np.ndarray:
    # +2 keeps 0 and 1 free for separators/sentinels
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 2


def longest_repeated_substring(text: str | None) -> tuple[int, str]:
    """(length, substring) of the longest substring occurring >= 2 times."""
    if not text or len(text) < 2:
        return 0, ""
    codes = _codes(text)
    sa = _suffix_array(codes)
    lcp = _lcp_array(codes, sa)
    i = int(np.argmax(lcp))
    length = int(lcp[i])
    if length == 0:
        return 0, ""
    start = int(sa[i])
    return length, text[start : start + length]


def longest_common_substring(s: str, t: str) -> tuple[int, str]:
    """(length, substring) of the longest common substring of s and t,
    via a joint suffix array over s + SEP + t."""
    if not s or not t:
        return 0, ""
    cs, ct = _codes(s), _codes(t)
    sep = np.array([1], dtype=np.int64)  # smaller than any text code
    u = np.concatenate([cs, sep, ct])
    sa = _suffix_array(u)
    lcp = _lcp_array(u, sa)
    ls = len(cs)
    side = sa < ls  # True: suffix starts in s (position ls is the SEP)
    # adjacent pairs from different sides
    cross = side[1:] != side[:-1]
    # also exclude the separator suffix itself (sa == ls)
    valid = cross & (sa[1:] != ls) & (sa[:-1] != ls)
    if not valid.any():
        return 0, ""
    masked = np.where(valid, lcp[1:], 0)
    length = int(masked.max())
    if length == 0:
        return 0, ""
    idx = int(np.argmax(masked)) + 1
    start = int(sa[idx])
    if start < ls:
        return length, s[start : start + length]
    return length, t[start - ls - 1 : start - ls - 1 + length]


def self_similarity(ds, *, text_col: str = "text", min_len: int = 20,
                    batch_size: int = 256, num_cpus: float = 1):
    """Adds ``lrs_len`` (+ ``lrs_snippet`` when >= min_len) per doc."""

    def f(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        lens = np.zeros(len(texts), dtype=np.int64)
        snips: list[str | None] = [None] * len(texts)
        for i, t in enumerate(texts):
            ln, sub = longest_repeated_substring(t)
            lens[i] = ln
            if ln >= min_len:
                snips[i] = sub
        return b.append_column("lrs_len", pa.array(lens)).append_column(
            "lrs_snippet", pa.array(snips, type=pa.large_string())
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size, num_cpus=num_cpus)


def pair_common_substrings(edges_ds, corpus_ds, *, key_col: str = "doc_key",
                           text_col: str = "text", num_partitions: int = 8):
    """Verified LSH edges (a, b) + corpus texts -> (a, b, lcs_len,
    lcs_snippet). Texts are attached by two hash joins keyed on the doc
    key (edges are the small side by construction)."""
    texts = corpus_ds.select_columns([key_col, text_col])

    def _ren(new_key: str, new_text: str):
        # map_batches projection instead of Dataset.rename_columns: the
        # latter fails on pandas-format blocks in Ray 2.49
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

    def f(b: pa.Table) -> pa.Table:
        sa = b["text_a"].to_pylist()
        sb = b["text_b"].to_pylist()
        lens = np.zeros(len(sa), dtype=np.int64)
        snips: list[str] = [""] * len(sa)
        for i, (x, y) in enumerate(zip(sa, sb)):
            ln, sub = longest_common_substring(x or "", y or "")
            lens[i] = ln
            snips[i] = sub
        return pa.table(
            {
                "a": b["a"],
                "b": b["b"],
                "lcs_len": pa.array(lens),
                "lcs_snippet": pa.array(snips, type=pa.large_string()),
            }
        )

    return e.map_batches(f, batch_format="pyarrow", batch_size=256)


def levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Byte-level (UTF-8) Levenshtein distance — the same unit DuckDB's
    ``levenshtein`` uses (verified: 'café'→'cafe' = 2, '日本語'→'日本' = 3,
    i.e. bytes, not codepoints), so the SQL oracle compares exactly.

    Vectorized row DP: the vertical/diagonal terms are pure numpy; the
    horizontal (insertion-chain) relaxation cur[j] = min_k<=j(cur'[k]+j-k)
    is one ``np.minimum.accumulate`` scan over (cur' - j) — no inner
    Python loop, O(|a|) numpy passes of width |b|."""
    A = np.frombuffer(a, dtype=np.uint8)
    B = np.frombuffer(b, dtype=np.uint8)
    if len(A) < len(B):
        A, B = B, A
    n = len(B)
    if n == 0:
        return len(A)
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(n + 1, dtype=np.int64)
    for i, ca in enumerate(A, 1):
        cur[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (B != ca), out=cur[1:])
        np.minimum(cur, np.minimum.accumulate(cur - idx) + idx, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])
