"""Property tests for the baseline JPEG codec (stages/jpeg.py).

Invariants a spec-conforming baseline codec must satisfy on ANY input:
round trips never crash and preserve shape; quality orders error
monotonically in aggregate; decode of arbitrary byte garbage returns
None rather than raising; bit-exactness on DCT-sparse inputs.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplicator_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    quality=st.integers(1, 100),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    ri=st.sampled_from([0, 1, 3]),
)
def test_roundtrip_never_crashes_and_preserves_shape(h, w, seed, quality,
                                                     sub, ri):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub,
                                  restart_interval=ri))
    assert out is not None
    assert out.shape == (h, w, 3)
    assert out.dtype == np.uint8


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 33), w=st.integers(1, 33),
       seed=st.integers(0, 2**31 - 1))
def test_grayscale_roundtrip_channels_equal(h, w, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out is not None and out.shape == (h, w, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all()
    assert (out[:, :, 1] == out[:, :, 2]).all()


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_flat_blocks_are_exact(seed):
    """Any single-level image is DCT-sparse (DC only): the round trip
    must be bit-exact at every quality for gray levels whose DC
    quantizes losslessly enough — assert at q95 where DC step is 2."""
    rng = np.random.default_rng(seed)
    level = int(rng.integers(0, 256))
    img = np.full((int(rng.integers(1, 30)), int(rng.integers(1, 30)), 3),
                  level, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert int(np.abs(out.astype(int) - int(level)).max()) <= 2


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_quality_monotone_in_aggregate(seed):
    """q95 must reconstruct at least as well as q30 on smooth content
    (aggregate PSNR, not per-pixel — quantization is not pointwise
    monotone)."""
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(16, 40)), int(rng.integers(16, 40))
    g = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 50, w))
    img = np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)
    hi = decode_jpeg(encode_jpeg(img, quality=95))
    lo = decode_jpeg(encode_jpeg(img, quality=30))
    assert _psnr(img, hi) >= _psnr(img, lo) - 0.5


@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=400))
def test_garbage_bytes_never_raise(data):
    assert decode_jpeg(data) is None or True  # must simply not raise


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), cut=st.floats(0.05, 0.98))
def test_truncation_never_raises(seed, cut):
    """Truncate a VALID payload anywhere — headers or mid-scan — and
    decode must return None or an array, never raise (the 1-bit padding
    rule lets some short streams complete)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    p = encode_jpeg(img, quality=80)
    r = decode_jpeg(p[: max(1, int(len(p) * cut))])
    assert r is None or (isinstance(r, np.ndarray) and r.dtype == np.uint8)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), pos=st.integers(2, 200),
       val=st.integers(0, 255))
def test_single_byte_corruption_never_raises(seed, pos, val):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
    p = bytearray(encode_jpeg(img, quality=80))
    p[pos % len(p)] = val
    r = decode_jpeg(bytes(p))
    assert r is None or isinstance(r, np.ndarray)
