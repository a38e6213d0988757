"""Text analysis stages for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting (first-class
extensions alongside SURVEY.md §2).

All stages are vectorized ``map_batches`` transforms; the language
profiles and compiled regexes live in an actor (built once per worker).
"""

from __future__ import annotations

import re
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# shared RE2 token patterns (same strings feed the DuckDB oracle mirrors
# in pipelines/queries_ext.py — keep in lockstep)
WS_TOKEN_PAT = r"[^ \t\n\r\f\v]+"
# BPE-ish pre-tokenizer (GPT-2 style, simplified): contractions, words,
# non-space punctuation runs; RE2-safe (no lookarounds)
BPE_TOKEN_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_counts(ds, *, text_col: str = "text"):
    """Adds ``n_ws_tokens`` (whitespace tokens; SQL-mirrorable) and
    ``n_bpe_tokens`` (regex pre-tokenizer count).  Both are RE2 kernels
    (``pc.count_substring_regex``) over the whole column — no Python rows."""

    def f(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")
        ws = pc.cast(pc.count_substring_regex(t, WS_TOKEN_PAT), pa.int64())
        bpe = pc.cast(pc.count_substring_regex(t, BPE_TOKEN_PAT), pa.int64())
        return b.append_column("n_ws_tokens", ws).append_column("n_bpe_tokens", bpe)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quality metrics
# ---------------------------------------------------------------------------


def quality_metrics(ds, *, text_col: str = "text"):
    """Adds integer quality counters (SQL-mirrorable): n_chars, n_punct,
    n_digits, n_upper, n_spaces — plus a float ``quality_score`` in [0,1]
    combining length, punctuation balance and word-length sanity.

    Fully vectorized: counters are RE2 kernels
    (``pc.count_substring_regex``); mean word length is derived as
    (non-whitespace chars) / (whitespace-token count) — identical to the
    mean over ``str.split()`` word lengths, without touching Python."""

    def f(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")

        def cnt(pat: str) -> np.ndarray:
            return pc.count_substring_regex(t, pat).to_numpy(zero_copy_only=False).astype(np.int64)

        n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
        punct = cnt(r"[^\pL\pN\s]")
        digits = cnt(r"\pN")
        upper = cnt(r"\p{Lu}")
        spaces = cnt(" ")
        n_words = cnt(r"\S+")
        n_ws = cnt(r"\s")
        nonspace = n_chars - n_ws
        mwl = np.where(n_words > 0, nonspace / np.maximum(1, n_words), 0.0)
        len_ok = np.minimum(1.0, n_chars / 200.0) * np.where(n_chars < 20000, 1.0, 0.5)
        punct_ok = 1.0 - np.minimum(1.0, (punct / np.maximum(1, n_chars)) * 4.0)
        word_ok = np.where((mwl >= 2.0) & (mwl <= 12.0), 1.0, 0.3)
        score = np.round(len_ok * 0.4 + punct_ok * 0.3 + word_ok * 0.3, 6)
        empty = n_chars == 0
        score = np.where(empty, 0.0, score)
        out = b.append_column("n_chars_q", pa.array(n_chars))
        for name, arr in [
            ("n_punct", punct),
            ("n_digits", digits),
            ("n_upper", upper),
            ("n_spaces", spaces),
        ]:
            out = out.append_column(name, pa.array(arr))
        return out.append_column("quality_score", pa.array(score))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# language identification (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is was for on that with as it at by from this be are".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf des ein eine nicht als".split()),
    "fr": frozenset("le la les de des et en un une du est pour que dans qui au sur pas".split()),
    "es": frozenset("el la los las de y en un una del es por que con para su al como".split()),
    "is": frozenset("og að í á er um við sem af fyrir það til en ekki hann hún með".split()),
}


class LangId:
    """Actor-pool stage: heuristic language ID.

    Scoring: stopword hit-rate per language profile; CJK codepoint ratio
    short-circuits to 'zh'. Unknown -> 'und'."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.profiles = _PROFILES

    def detect(self, text: str | None) -> str:
        if not text:
            return "und"
        sample = text[:2000]
        cjk = sum(1 for c in sample if "一" <= c <= "鿿")
        if cjk > 0.2 * max(1, len(sample.replace(" ", ""))):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(sample)]
        if not words:
            return "und"
        best, best_rate = "und", 0.04  # minimum confidence
        for lang, prof in self.profiles.items():
            rate = sum(w in prof for w in words) / len(words)
            if rate > best_rate:
                best, best_rate = lang, rate
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.detect(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


# RE2 mirror of LangId.word_re ([^\W\d_]+ = Python isalnum minus decimal
# digits minus underscore): letters plus non-decimal numerics.  \p{Mn}
# marks are excluded by both (not alnum in Python, not \pL in RE2).
_LANG_TOKEN_PAT = r"[\pL\p{Nl}\p{No}]+"
_LANG_SPLIT_PAT = r"[^\pL\p{Nl}\p{No}]+"
_CJK_PAT = r"[\x{4E00}-\x{9FFF}]"
_LANG_ORDER = list(_PROFILES)  # dict order = detect()'s tie order
_PROFILE_ARRS = {lang: pa.array(sorted(p)) for lang, p in _PROFILES.items()}


def _batch_lang_id(col) -> pa.Array:
    """Whole-batch mirror of ``LangId.detect`` (pytest-gated equal on the
    test corpora): Arrow RE2 kernels for the sample slice, CJK ratio and
    word count; stopword hits via ONE tokenize + ``pc.is_in`` per
    language; numpy picks the best rate with detect()'s exact tie order
    and 0.04 confidence floor — no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string())
    sample = pc.utf8_slice_codeunits(pc.fill_null(col, ""), 0, 2000)
    s_len = pc.utf8_length(sample).to_numpy(zero_copy_only=False).astype(np.int64)
    cjk = (
        pc.count_substring_regex(sample, _CJK_PAT)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    spaces = (
        pc.count_substring(sample, " ").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    is_zh = cjk > 0.2 * np.maximum(1, s_len - spaces)
    low = pc.utf8_lower(sample)
    # tokenize once; split fragments are the findall tokens plus empty
    # boundary fragments — empties are not in any profile (never a hit)
    # and n_words is the per-doc count of NON-empty fragments, so the
    # split replaces a second (expensive) unicode-class regex pass
    toks = pc.split_pattern_regex(low, _LANG_SPLIT_PAT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    tok_offsets = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
        toks.offset : toks.offset + n + 1
    ].astype(np.int64)
    counts = np.diff(tok_offsets)
    starts = tok_offsets[:-1] - tok_offsets[0]
    nonempty = (
        pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64) > 0
    ).astype(np.int64)
    n_words = np.zeros(n, dtype=np.int64)
    nz0 = counts > 0
    if nz0.any():
        n_words[nz0] = np.add.reduceat(nonempty, starts[nz0])
    rates = np.zeros((len(_LANG_ORDER), n))
    denom = np.maximum(1, n_words)
    nz = counts > 0
    for li, lang in enumerate(_LANG_ORDER):
        hit = (
            pc.is_in(flat, value_set=_PROFILE_ARRS[lang])
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sums = np.zeros(n, dtype=np.int64)
        if nz.any():
            sums[nz] = np.add.reduceat(hit, starts[nz])
        rates[li] = sums / denom
    best_idx = np.argmax(rates, axis=0)  # first max = detect()'s tie order
    best_rate = rates[best_idx, np.arange(n)]
    langs = np.array(_LANG_ORDER, dtype=object)[best_idx]
    out = np.where(
        is_zh, "zh", np.where((n_words > 0) & (best_rate > 0.04), langs, "und")
    )
    return pa.array(out, type=pa.string())


def lang_id(ds, *, text_col: str = "text"):
    """Vectorized heuristic language ID (adds ``lang_pred``): Arrow RE2
    kernels + one ``pc.is_in`` per language profile, no per-row Python.
    ``LangId`` remains the row-at-a-time reference implementation the
    batch path is pytest-gated against."""

    def f(b: pa.Table) -> pa.Table:
        return b.append_column("lang_pred", _batch_lang_id(b[text_col]))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing)
# ---------------------------------------------------------------------------


_WINNOW_BASE = np.uint64(0x100000001B3)  # FNV64 prime as the poly base
_WINNOW_MASK = np.uint64((1 << 62) - 1)  # keep int64-positive


def winnow_fingerprints(text: str, *, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD'03): rolling k-gram polynomial
    hashes over the UTF-8 bytes, minimum per sliding window,
    deduplicated.  Fully vectorized (k shift-multiply passes over one
    byte array — no Python per gram). Deterministic across processes."""
    s = (text or "").encode("utf-8")
    if len(s) < k:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    with np.errstate(over="ignore"):
        grams = b[:n] + np.uint64(1)
        for j in range(1, k):
            grams = grams * _WINNOW_BASE + b[j : n + j]
    grams = (grams & _WINNOW_MASK).astype(np.int64)
    if len(grams) <= window:
        return np.unique(grams[[int(np.argmin(grams))]])
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(grams, window).min(axis=1)
    return np.unique(mins)


# Per-process grow-only scratch arenas (same pattern as embed._scratch /
# MinHasher._affine_buf): the winnow kernel's big arrays are written in
# place here instead of allocating fresh multi-MB temporaries per batch —
# mmap churn + first-touch faults dominate under worker concurrency on
# hosts with a slow page-fault path.
_TS_SCRATCH: dict[str, np.ndarray] = {}


def _ts_scratch(name: str, n: int, dtype=np.uint64) -> np.ndarray:
    buf = _TS_SCRATCH.get(name)
    if buf is None or buf.size < n or buf.dtype != np.dtype(dtype):
        buf = np.empty(n, dtype=dtype)
        _TS_SCRATCH[name] = buf
    return buf[:n]


def _sliding_min(x: np.ndarray, w: int) -> np.ndarray:
    """Sliding-window minimum via sparse-table doubling: log2(w) pairwise
    ``np.minimum`` passes instead of a w-stride reduction (measured ~4x
    for w=16 on 1M-element arrays).  Exact for any 1 <= w <= len(x).
    Ping-pongs between two scratch buffers — no fresh allocations."""
    n = len(x)
    a = _ts_scratch("w_sm_a", n, x.dtype)
    b = _ts_scratch("w_sm_b", n, x.dtype)
    t = 1
    cur, nxt = x, a
    cur_len = n
    while t * 2 <= w:
        np.minimum(cur[: cur_len - t], cur[t:cur_len], out=nxt[: cur_len - t])
        cur_len -= t
        cur, nxt = nxt, (b if nxt is a else a)
        t *= 2
    n_out = n - w + 1
    out = nxt[:n_out]
    np.minimum(cur[:n_out], cur[w - t : w - t + n_out], out=out)
    return out


def _range_mask(total: int, starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Boolean mask of length ``total`` that is True on each half-open
    range [starts[i], starts[i]+counts[i]) — one delta/cumsum pass, no
    per-range Python."""
    delta = np.zeros(total + 1, dtype=np.int32)
    np.add.at(delta, starts, 1)
    np.add.at(delta, starts + counts, -1)
    return np.cumsum(delta[:-1]) > 0


def _batch_winnow(col, k: int, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch winnowing -> (fp_min, fp_count) per doc, byte-exact
    with ``winnow_fingerprints`` (pytest-asserted) but with NO per-doc
    Python: the Arrow string column's data buffer IS the concatenated
    UTF-8 bytes, so the rolling k-gram hash runs once over the batch,
    cross-doc grams are masked out, the sliding-window minima come from
    ONE ``sliding_window_view`` pass, and per-doc reductions are
    reduceat/bincount.  Per-doc numpy-call overhead measured ~50us/doc
    (12 calls on ~300-byte arrays); this is ~30x less per doc."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    fmin = np.full(n, -1, dtype=np.int64)
    fcnt = np.zeros(n, dtype=np.int64)
    if n == 0:
        return fmin, fcnt
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
        if buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    offsets = offsets - offsets[0]
    blen = np.diff(offsets)
    total = len(data)
    if total < k:
        return fmin, fcnt
    # rolling k-gram polynomial over the WHOLE buffer (same recurrence as
    # winnow_fingerprints), computed IN PLACE in a per-process scratch
    # arena.  No packing step: a window starting inside doc i's valid
    # gram range [off_i, off_i + cnt_i - window] touches only doc-i
    # grams, so cross-doc grams are excluded by the per-doc slice bounds
    # alone and never need masking out.
    m = total - k + 1
    b64 = _ts_scratch("w_b64", total)
    np.copyto(b64, data)
    g = _ts_scratch("w_grams", m + 1)  # +1: sentinel slot for reduceat
    gm = g[:m]
    np.add(b64[:m], np.uint64(1), out=gm)
    with np.errstate(over="ignore"):
        for j in range(1, k):
            np.multiply(gm, _WINNOW_BASE, out=gm)
            np.add(gm, b64[j : m + j], out=gm)
    np.bitwise_and(gm, _WINNOW_MASK, out=gm)
    g[m] = _WINNOW_MASK  # sentinel (only ever inside inter-doc gaps)
    gi = g[: m + 1].view(np.int64)  # values <= 2^62-1: same bits
    cnt = np.maximum(0, blen - k + 1)  # valid grams per doc
    nz = np.flatnonzero(cnt > 0)
    if len(nz) == 0:
        return fmin, fcnt
    # fp_min: every gram is covered by some window, so the min fingerprint
    # is the doc's gram minimum — one interleaved reduceat (segment ends
    # never collide with the next start: docs are k-1 gram positions
    # apart, and the sentinel slot keeps the last end index in range)
    s_nz = offsets[:-1][nz]
    inter = np.empty(2 * len(nz), dtype=np.int64)
    inter[0::2] = s_nz
    inter[1::2] = s_nz + cnt[nz]
    fmin[nz] = np.minimum.reduceat(gi, inter)[0::2]
    # fp_count: docs with cnt <= window emit exactly one fingerprint; the
    # rest need the distinct count of their sliding-window minima
    fcnt[nz] = 1
    slid = nz[cnt[nz] > window]
    if len(slid):
        mins_all = _sliding_min(gi[:m], window)
        w_cnt = cnt[slid] - window + 1
        wmask = _range_mask(len(mins_all), offsets[:-1][slid], w_cnt)
        vals = mins_all[wmask]
        ids = np.repeat(np.arange(len(slid)), w_cnt)
        # adjacent window minima repeat ~(window-1)/window of the time;
        # dropping adjacent duplicates first (distinct-count invariant)
        # shrinks the sort ~window-fold
        keep = np.concatenate(
            ([True], (vals[1:] != vals[:-1]) | (ids[1:] != ids[:-1]))
        )
        vals, ids = vals[keep], ids[keep]
        order = np.lexsort((vals, ids))
        ids_s, vals_s = ids[order], vals[order]
        new = np.concatenate(
            ([True], (ids_s[1:] != ids_s[:-1]) | (vals_s[1:] != vals_s[:-1]))
        )
        fcnt[slid] = np.bincount(ids_s, weights=new, minlength=len(slid)).astype(
            np.int64
        )
    return fmin, fcnt


def fingerprints(ds, *, text_col: str = "text", k: int = 8, window: int = 16):
    """Adds ``fp_min`` (the smallest winnow fingerprint, an int64 doc
    sketch) and ``fp_count`` (number of distinct window minima)."""

    def f(b: pa.Table) -> pa.Table:
        fmin, fcnt = _batch_winnow(pc.fill_null(b[text_col], ""), k, window)
        return b.append_column("fp_min", pa.array(fmin)).append_column(
            "fp_count", pa.array(fcnt)
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
