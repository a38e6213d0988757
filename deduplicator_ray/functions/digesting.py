"""Content digests + digest-scheme handling (operators M6, and the digest
computation the reference delegates to Heritrix's FetchHTTP
``digestContent=sha1`` — profile-crawler-beans.cxml:257-258).

The reference carries digests as Base32(SHA-1) strings optionally prefixed
with a scheme, e.g. ``sha1:YA3G7O6TNMHXA5WWDSIZJDNXV56WDRCA``
(CrawlLogIteratorTest.java:37-38); ``IndexBuilder.java:203-207`` strips the
prefix up to the LAST ':' unless ``indexDigestScheme`` is set, and
``LuceneIndexSearcher.java:217-220`` picks which form to query.  We
reproduce exactly that: ``sha1_base32`` computes the canonical digest of the
raw ``html`` bytes; ``strip_scheme`` implements the last-colon rule.

``md5_hex`` exists only so oracle-checkable queries can use a digest DuckDB
also implements (DuckDB 1.0 has ``md5`` but no ``sha1``); the engine-native
digest is Base32(SHA-1) everywhere else.
"""

from __future__ import annotations

import base64
import hashlib
from collections.abc import Iterable

SCHEME_SHA1 = "sha1"


def sha1_base32(payload: bytes | None, *, with_scheme: bool = False) -> str | None:
    """Base32(SHA-1) digest of raw payload bytes, Heritrix-style."""
    if payload is None:
        return None
    d = base64.b32encode(hashlib.sha1(payload).digest()).decode("ascii")
    return f"{SCHEME_SHA1}:{d}" if with_scheme else d


def sha1_base32_many(payloads: Iterable[bytes | None], *, with_scheme: bool = False) -> list[str | None]:
    """Batch form for ``map_batches`` bodies (hashlib releases the GIL-heavy
    work to C; the Python loop is not the bottleneck)."""
    b32 = base64.b32encode
    sha1 = hashlib.sha1
    if with_scheme:
        return [
            None if p is None else SCHEME_SHA1 + ":" + b32(sha1(p).digest()).decode("ascii")
            for p in payloads
        ]
    return [None if p is None else b32(sha1(p).digest()).decode("ascii") for p in payloads]


def strip_scheme(digest: str | None) -> str | None:
    """Strip any ``algo:`` prefix up to the LAST ':', per
    IndexBuilder.java:203-207 (``lastIndexOf(':')``)."""
    if digest is None:
        return None
    i = digest.rfind(":")
    return digest[i + 1 :] if i >= 0 else digest


# vectorized twins of strip_scheme — ONE place owns the last-colon rule
# (greedy ^.*: == strip up to the LAST ':', matching lastIndexOf above)
_SCHEME_RE = r"^.*:"


def strip_scheme_arrow(col):
    """Arrow string array/chunked array -> scheme-stripped digests."""
    import pyarrow.compute as pc

    return pc.replace_substring_regex(col, _SCHEME_RE, "")


def strip_scheme_series(s):
    """pandas Series -> scheme-stripped digests."""
    return s.str.replace(_SCHEME_RE, "", regex=True)


def md5_hex(text: str | None) -> str | None:
    """Hex MD5 of a unicode string's UTF-8 bytes (oracle-parity digest;
    matches DuckDB ``md5(col)``)."""
    if text is None:
        return None
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def md5_hex_many(texts: Iterable[str | None]) -> list[str | None]:
    md5 = hashlib.md5
    return [None if t is None else md5(t.encode("utf-8")).hexdigest() for t in texts]


# ---------------------------------------------------------------------------
# Shuffle-side digest packing
# ---------------------------------------------------------------------------
#
# A 32-char hex digest rides a shuffle as 36 bytes (32 chars + 4-byte
# offset); packed to its raw 16 bytes plus a 1-byte tag it costs 21 — a
# 40% cut on the column that keys EVERY exact-dedup shuffle.  The
# encoding is injective at the VALUE level (the same digest string packs
# identically in every batch, so bucketing and equality are preserved):
#
#   tag 0x01 + unhex(d)   when d is exactly 32 lowercase-hex chars
#   tag 0x00 + utf8(d)    for every other value (Base32 SHA-1 etc.)
#
# Tags make the two images disjoint, so distinct digests can never
# collide after packing; unpacking restores the exact original string.
# Both kernels are numpy whole-column code — no per-row Python on hex
# corpora; the non-hex fallback costs one C-level decode per value.

import numpy as np

_HEX_NIB = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate(b"0123456789abcdef"):
    _HEX_NIB[_c] = _i
_HEX_CHARS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
# pair LUTs for the uniform fast paths: one gather per OUTPUT byte/char
# pair instead of per input char.  Little-endian uint16 view: first char
# is the LOW byte.  _HEX_PAIR maps 2 hex chars -> byte value (0x100
# sentinel = not hex); _CHAR_PAIR maps byte -> its 2 hex chars as uint16.
_HEX_PAIR = np.full(65536, 0x100, dtype=np.uint16)
_hi = np.repeat(np.arange(256), 256)
_lo = np.tile(np.arange(256), 256)
_ok = (_HEX_NIB[_hi] != 255) & (_HEX_NIB[_lo] != 255)
# uint16 LE of (char_lo=first char=hi nibble, char_hi=second char=lo nibble)
_idx = (_lo[_ok].astype(np.uint32) << 8) | _hi[_ok]
_HEX_PAIR[_idx] = (_HEX_NIB[_hi[_ok]].astype(np.uint16) << 4) | _HEX_NIB[_lo[_ok]]
_CHAR_PAIR = (
    _HEX_CHARS[np.arange(256) >> 4].astype(np.uint16)
    | (_HEX_CHARS[np.arange(256) & 15].astype(np.uint16) << 8)
)
del _hi, _lo, _ok, _idx


def _ragged_arange(lengths: "np.ndarray") -> "np.ndarray":
    """[2,3] -> [0,1,0,1,2]: per-segment aranges for ragged gathers."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - lengths, lengths)


def pack_digest_array(col):
    """Arrow string array -> tagged ``binary`` array (see module note).

    Pure value-level transform: equal strings -> equal bytes, distinct
    strings -> distinct bytes, nulls preserved.  Vectorized (offset
    arithmetic + LUT gathers); safe for string and large_string input.
    """
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        return col  # already packed
    if pa.types.is_null(col.type):
        return col.cast(pa.binary())
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.binary())
    valid = np.asarray(col.is_valid())
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    lens = np.where(valid, lens, 0)

    # uniform fast path: every row valid and exactly 32 hex chars — the
    # data region is then contiguous and reshapes (n, 32) zero-copy, so
    # the whole pack is LUT + strided math with no fancy-index gathers
    # (6x the general path; this is the shape every hex corpus hits)
    if valid.all() and (lens == 32).all():
        pairs = data[offs[0] : offs[-1]].view(np.uint16).reshape(n, 16)
        vals = _HEX_PAIR[pairs]
        if not (vals > 255).any():
            buf = np.empty((n, 17), dtype=np.uint8)
            buf[:, 0] = 1
            buf[:, 1:] = vals
            out_offs = np.arange(0, 17 * (n + 1), 17, dtype=np.int32)
            return pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(out_offs.tobytes()),
                 pa.py_buffer(buf.tobytes())],
            )

    is_hex = np.zeros(n, dtype=bool)
    packed = np.empty((0, 16), dtype=np.uint8)
    cand = np.flatnonzero(valid & (np.diff(offs) == 32))
    if len(cand):
        chars = data[offs[cand][:, None] + np.arange(32)]
        nib = _HEX_NIB[chars]
        ok = ~(nib == 255).any(axis=1)
        is_hex[cand[ok]] = True
        packed = ((nib[ok, 0::2] << 4) | nib[ok, 1::2]).astype(np.uint8)

    is_raw = valid & ~is_hex
    w = np.zeros(n, dtype=np.int64)
    w[is_hex] = 17
    w[is_raw] = lens[is_raw] + 1
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(w, out=out_offs[1:])
    total = int(out_offs[-1])
    if total >= np.iinfo(np.int32).max:  # pragma: no cover - 2 GiB batch
        raise ValueError("digest batch too large for int32 binary offsets")
    out = np.zeros(total, dtype=np.uint8)
    if is_hex.any():
        pos = out_offs[:-1][is_hex]
        out[pos] = 1
        out[pos[:, None] + 1 + np.arange(16)] = packed
    if is_raw.any():
        ls = lens[is_raw]
        src = np.repeat(offs[:-1][is_raw], ls) + _ragged_arange(ls)
        dst = np.repeat(out_offs[:-1][is_raw] + 1, ls) + _ragged_arange(ls)
        out[dst] = data[src]  # tag byte stays 0

    vbuf = None
    if not valid.all():
        vbuf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.binary(), n,
        [vbuf, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())],
    )


def unpack_digest_series(s):
    """pandas Series of packed digest bytes -> original strings.

    No-op when the values are already strings (callers can feed either
    form); the hex path is whole-column numpy, the raw path one C-level
    decode per value."""
    import pandas as pd

    if len(s) == 0:
        return s
    v = s.to_numpy()
    probe = next((x for x in v if x is not None), None)
    if not isinstance(probe, (bytes, bytearray)):
        return s
    n = len(v)
    valid = np.fromiter((x is not None for x in v), dtype=bool, count=n)
    lens = np.fromiter(
        (0 if x is None else len(x) for x in v), dtype=np.int64, count=n
    )
    data = np.frombuffer(
        b"".join(x for x in v if x is not None), dtype=np.uint8
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    first = np.zeros(n, dtype=np.uint8)
    has = valid & (lens > 0)
    first[has] = data[offs[:-1][has]]
    is_hex = valid & (lens == 17) & (first == 1)
    out = np.empty(n, dtype=object)
    if is_hex.any():
        raw = data[offs[:-1][is_hex][:, None] + 1 + np.arange(16)]
        chars = np.empty((raw.shape[0], 32), dtype=np.uint8)
        chars[:, 0::2] = _HEX_CHARS[raw >> 4]
        chars[:, 1::2] = _HEX_CHARS[raw & 15]
        out[is_hex] = np.frombuffer(chars.tobytes(), dtype="S32").astype("U32").tolist()
    is_raw = valid & ~is_hex
    if is_raw.any():
        out[np.flatnonzero(is_raw)] = [
            bytes(v[i][1:]).decode("utf-8") for i in np.flatnonzero(is_raw)
        ]
    return pd.Series(out, index=s.index)


def unpack_digest_array(col):
    """Arrow ``binary`` array of packed digests -> original string array.

    Buffer-level inverse of ``pack_digest_array`` — no per-row Python
    objects anywhere: hex rows expand through a LUT gather, raw rows are
    one ragged copy dropping the tag byte.  No-op for string input."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col
    if pa.types.is_null(col.type):
        return col.cast(pa.string())
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string())
    valid = np.asarray(col.is_valid())
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    lens = np.where(valid, np.diff(offs), 0)
    # uniform fast path (mirror of pack's): all rows tag-1 hex
    if valid.all() and (lens == 17).all():
        raw2d = data[offs[0] : offs[-1]].reshape(n, 17)
        if (raw2d[:, 0] == 1).all():
            chars = np.ascontiguousarray(_CHAR_PAIR[raw2d[:, 1:]])
            out_offs = np.arange(0, 32 * (n + 1), 32, dtype=np.int32)
            return pa.Array.from_buffers(
                pa.string(), n,
                [None, pa.py_buffer(out_offs.tobytes()),
                 pa.py_buffer(chars.tobytes())],
            )
    first = np.zeros(n, dtype=np.uint8)
    has = valid & (lens > 0)
    first[has] = data[offs[:-1][has]]
    is_hex = valid & (lens == 17) & (first == 1)
    is_raw = valid & ~is_hex

    w = np.zeros(n, dtype=np.int64)
    w[is_hex] = 32
    w[is_raw] = lens[is_raw] - 1
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(w, out=out_offs[1:])
    out = np.zeros(int(out_offs[-1]), dtype=np.uint8)
    if is_hex.any():
        raw = data[offs[:-1][is_hex][:, None] + 1 + np.arange(16)]
        chars = np.empty((raw.shape[0], 32), dtype=np.uint8)
        chars[:, 0::2] = _HEX_CHARS[raw >> 4]
        chars[:, 1::2] = _HEX_CHARS[raw & 15]
        out[out_offs[:-1][is_hex][:, None] + np.arange(32)] = chars
    if is_raw.any():
        ls = lens[is_raw] - 1
        src = np.repeat(offs[:-1][is_raw] + 1, ls) + _ragged_arange(ls)
        dst = np.repeat(out_offs[:-1][is_raw], ls) + _ragged_arange(ls)
        out[dst] = data[src]
    vbuf = None
    if not valid.all():
        vbuf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.string(), n,
        [vbuf, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())],
    )


def md5_hex_arrow(col):
    """Hex MD5 per value of an Arrow string array -> Arrow string array.

    Reads each value's UTF-8 bytes as a memoryview slice of the Arrow
    data buffer — no per-row str materialization or ``.encode()`` copy
    (the buffer already IS utf8).  The md5+hexdigest calls are C; the
    loop body does no Python string work beyond collecting the 32-char
    results.  Nulls map to nulls."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string())
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + n + 1
    ].tolist()
    mv = memoryview(col.buffers()[2])
    md5 = hashlib.md5
    if col.null_count == 0:
        out = [md5(mv[offs[i] : offs[i + 1]]).hexdigest() for i in range(n)]
    else:
        valid = np.asarray(col.is_valid()).tolist()
        out = [
            md5(mv[offs[i] : offs[i + 1]]).hexdigest() if valid[i] else None
            for i in range(n)
        ]
    return pa.array(out, type=pa.string())
