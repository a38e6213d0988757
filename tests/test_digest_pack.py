"""Shuffle-side digest packing kernels (functions/digesting.py):
value-level injectivity, exact roundtrip, slice/offset handling, and
the md5 Arrow-buffer kernel."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplicator_ray.functions.digesting import (
    md5_hex,
    md5_hex_arrow,
    md5_hex_many,
    pack_digest_array,
    sha1_base32,
    unpack_digest_array,
    unpack_digest_series,
)


def _mixed_values():
    vals = [md5_hex(f"doc{i}") for i in range(64)]
    vals += [sha1_base32(f"d{i}".encode()) for i in range(16)]
    vals += [None, "", "sha1:ABC", "weird:été",
             "0123456789ABCDEF0123456789abcdef",  # mixed case: NOT hex-packed
             "2345672345672345672345672345672",   # 31 chars
             "f" * 32, "F" * 32]
    return vals


def test_roundtrip_mixed():
    vals = _mixed_values()
    col = pa.array(vals, type=pa.string())
    packed = pack_digest_array(col)
    assert packed.type == pa.binary()
    assert unpack_digest_array(packed).to_pylist() == vals
    # pandas-side unpack agrees
    s = pd.Series(packed.to_pandas())
    back = unpack_digest_series(s)
    assert list(back.fillna("<NULL>")) == [
        v if v is not None else "<NULL>" for v in vals]


def test_value_level_injectivity_across_batches():
    """The same digest packs identically whether its batch is uniform
    hex (fast path) or mixed (general path) — bucket equality depends
    on it."""
    hexes = [md5_hex(f"x{i}") for i in range(32)]
    uniform = pack_digest_array(pa.array(hexes, type=pa.string()))
    mixed = pack_digest_array(pa.array(hexes + ["nothex!"], type=pa.string()))
    assert uniform.to_pylist() == mixed.to_pylist()[:32]
    # distinct inputs -> distinct packed bytes (tags keep images disjoint)
    allv = [v for v in _mixed_values() if v is not None]
    packed = pack_digest_array(pa.array(allv, type=pa.string())).to_pylist()
    assert len(set(packed)) == len(set(allv))


def test_hex_rows_shrink_raw_rows_tagged():
    p = pack_digest_array(pa.array([md5_hex("a"), "XYZ"], type=pa.string()))
    hex_b, raw_b = p.to_pylist()
    assert len(hex_b) == 17 and hex_b[:1] == b"\x01"
    assert raw_b == b"\x00XYZ"


def test_slices_offsets_large_string():
    vals = [md5_hex(f"v{i}") for i in range(500)]
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(vals, type=typ)
        for s0, ln in [(0, 500), (1, 300), (101, 77)]:
            sl = col.slice(s0, ln)
            assert unpack_digest_array(pack_digest_array(sl)).to_pylist() \
                == vals[s0:s0 + ln]
    # packed-side slices unpack correctly too (non-zero array offset)
    packed = pack_digest_array(pa.array(vals, type=pa.string()))
    assert unpack_digest_array(packed.slice(3, 99)).to_pylist() == vals[3:102]
    # ODD data-buffer offset into a uniform-hex run (first value 3 bytes):
    # the fast path's uint16 view must handle the unaligned start
    odd = pa.array(["abc"] + vals[:50], type=pa.string()).slice(1)
    assert unpack_digest_array(pack_digest_array(odd)).to_pylist() == vals[:50]


def test_empty_all_null_and_null_type():
    assert len(pack_digest_array(pa.array([], type=pa.string()))) == 0
    an = pack_digest_array(pa.array([None, None], type=pa.string()))
    assert an.null_count == 2
    assert unpack_digest_array(an).to_pylist() == [None, None]
    # degenerate all-null blocks arrive as null-type arrays
    nt = pa.nulls(3)
    assert pack_digest_array(nt).type == pa.binary()
    assert unpack_digest_array(pa.nulls(3).cast(pa.binary())).to_pylist() \
        == [None, None, None]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.text(max_size=48),
    st.text(alphabet="0123456789abcdef", min_size=32, max_size=32),
), max_size=40))
def test_roundtrip_property(vals):
    col = pa.array(vals, type=pa.string())
    assert unpack_digest_array(pack_digest_array(col)).to_pylist() == vals


@pytest.mark.parametrize("typ", [pa.string(), pa.large_string()])
def test_md5_hex_arrow_matches_reference(typ):
    vals = ["", "héllo wörld", "a" * 10_000, None, "x"]
    col = pa.array(vals, type=typ)
    got = md5_hex_arrow(col).to_pylist()
    assert got == md5_hex_many(vals)
    # sliced input (non-zero offset)
    assert md5_hex_arrow(col.slice(1, 3)).to_pylist() == md5_hex_many(vals[1:4])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=64), max_size=30))
def test_md5_hex_arrow_property(vals):
    got = md5_hex_arrow(pa.array(vals, type=pa.string())).to_pylist()
    want = [hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]
    assert got == want
