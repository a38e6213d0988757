"""Baseline JPEG codec (stages/jpeg.py): golden frozen-byte fixtures,
spec round-trips across subsampling/quality/restart shapes, exactness
invariants, malformed payloads, and the ImageDecoder pipeline."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from deduplicator_ray.stages.jpeg import (
    AC_CHROM_BITS,
    AC_CHROM_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    decode_jpeg,
    encode_jpeg,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("name", ["jpeg_fixture1", "jpeg_fixture2"])
def test_decode_jpeg_golden_pixels(name):
    """Committed JPEG bytes decode to the committed pixel arrays — a
    frozen-bytes regression gate independent of encode_jpeg."""
    with open(os.path.join(GOLDEN, f"{name}.jpg"), "rb") as f:
        payload = f.read()
    want = np.load(os.path.join(GOLDEN, f"{name}_pixels.npy"))
    got = decode_jpeg(payload)
    assert got is not None
    assert got.shape == want.shape
    assert (got == want).all()


def test_huffman_table_sizes():
    """Annex K table shape sanity: 162 AC values, counts sum correctly."""
    assert sum(AC_LUM_BITS) == len(AC_LUM_VALS) == 162
    assert sum(AC_CHROM_BITS) == len(AC_CHROM_VALS) == 162


def test_solid_gray_exact():
    """A flat 128 image has zero DCT energy: decode must be EXACT (any
    zigzag/dequant/IDCT slip would show)."""
    img = np.full((16, 24, 3), 128, np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=50))
    assert (got == img).all()


def test_solid_color_chroma_roundtrip_420():
    """Constant chroma survives 4:2:0 almost exactly — catches swapped
    Cb/Cr, wrong color matrix, or broken upsampling."""
    img = np.zeros((24, 24, 3), np.uint8)
    img[:, :, 0] = 200
    img[:, :, 2] = 30
    got = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:2:0"))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("subsampling,min_db", [("4:4:4", 45.0),
                                                ("4:2:0", 25.0)])
@pytest.mark.parametrize("shape", [(16, 16), (37, 29), (8, 41)])
def test_roundtrip_psnr_smooth(subsampling, min_db, shape):
    """Smooth but chroma-steep gradients at q95, including odd /
    partial-MCU dimensions.  4:2:0 uses spec-simple nearest-neighbor
    chroma upsampling (not libjpeg's 'fancy' interpolation), so steep
    chroma pays a real, bounded penalty — the chroma-FLAT 4:2:0 case is
    asserted tight separately below."""
    h, w = shape
    g = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
    img = np.stack([g, g[::-1], g * 0.5 + 64], -1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=95, subsampling=subsampling))
    assert got.shape == img.shape
    assert _psnr(img, got) >= min_db


@pytest.mark.parametrize("shape", [(16, 16), (37, 29), (8, 41)])
def test_roundtrip_420_chroma_flat_tight(shape):
    """Luma-varying, chroma-constant image: 4:2:0 subsampling is
    lossless in chroma there, so the round trip must stay >= 40 dB."""
    h, w = shape
    g = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
    img = np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:2:0"))
    assert _psnr(img, got) >= 40.0


def test_grayscale_roundtrip():
    rng = np.random.default_rng(3)
    gimg = rng.integers(0, 256, (21, 33), np.uint8)
    got = decode_jpeg(encode_jpeg(gimg, quality=95))
    assert got.shape == (21, 33, 3)
    assert (got[:, :, 0] == got[:, :, 1]).all()
    assert (got[:, :, 1] == got[:, :, 2]).all()
    assert _psnr(np.repeat(gimg[:, :, None], 3, 2), got) >= 35.0


def test_restart_markers_do_not_change_pixels():
    """DRI/RSTn is pure framing: pixel output must be identical with and
    without restart intervals (DC predictors reset correctly)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (48, 40, 3), np.uint8)
    for ss in ("4:4:4", "4:2:0"):
        a = decode_jpeg(encode_jpeg(img, quality=80, subsampling=ss,
                                    restart_interval=2))
        b = decode_jpeg(encode_jpeg(img, quality=80, subsampling=ss))
        assert (a == b).all()


def test_noise_roundtrip_high_quality():
    """Pure noise at q100 (all-ones quant would be ideal; q100 is close)
    still round-trips with bounded per-pixel error in 4:4:4."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24, 3), np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=100))
    assert _psnr(img, got) >= 30.0


def test_malformed_payloads_return_none():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    good = encode_jpeg(img)
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8") is None
    assert decode_jpeg(b"not a jpeg at all") is None
    assert decode_jpeg(good[:20]) is None          # inside headers
    assert decode_jpeg(good[2:]) is None           # missing SOI
    # progressive SOF2 is unsupported: flip the SOF marker
    mut = bytearray(good)
    sof = mut.find(b"\xff\xc0")
    mut[sof + 1] = 0xC2
    assert decode_jpeg(bytes(mut)) is None
    # mid-scan truncation must never RAISE (None or a partial decode —
    # the spec's 1-bit padding can let short streams complete)
    for cut in (len(good) - 8, len(good) // 2):
        r = decode_jpeg(good[:cut])
        assert r is None or isinstance(r, np.ndarray)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="4:1:1")
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg(np.zeros((8, 8, 4), np.uint8))


def test_image_decoder_jpeg_pipeline(ray_session):
    """decoder="jpeg" end to end through the actor-pool stage: valid
    payloads get real features, corrupt ones zero phash; identical
    pixels under DIFFERENT encodings (444 vs 420 q95) land within
    hamming distance of each other's ahash."""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import (
        decode_images,
        synth_jpeg_media,
    )

    media = synth_jpeg_media(24)
    feats = decode_images(rd.from_arrow(media), decoder="jpeg").to_pandas()
    assert len(feats) == 24
    corrupt = set(range(24)).intersection({11, 23})
    for r in feats.itertuples():
        if r.media_id in corrupt:
            assert r.phash == 0
        else:
            assert r.payload_bytes > 0 and r.phash != 0


def test_ahash_stable_across_encodings():
    """The SAME image encoded 4:4:4 vs 4:2:0 at q95 must produce nearby
    average-hashes (the phash-dup pipeline's premise)."""
    from deduplicator_ray.stages.multimodal import _ppm_features

    g = np.add.outer(np.linspace(0, 220, 32), np.linspace(0, 35, 32))
    img = np.stack([g, 255 - g, g * 0.7], -1).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:4:4"))
    b = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:2:0"))
    ha, _ = _ppm_features(a)
    hb, _ = _ppm_features(b)
    assert bin(ha ^ hb).count("1") <= 3


def test_gray_sof_sampling_factors_ignored():
    """T.81 A.2: a single-component scan is non-interleaved, so declared
    sampling factors must not change the decode.  Patch the SOF sampling
    byte of a real grayscale stream from 1x1 to 2x2 (what encoders that
    keep luma factors emit) and require pixel-identical output."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    p = encode_jpeg(img, quality=90)
    ref = decode_jpeg(p)
    i = p.index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) cid(1) -> hv
    hv_off = i + 11
    assert p[hv_off] == 0x11
    patched = p[:hv_off] + b"\x22" + p[hv_off + 1:]
    got = decode_jpeg(patched)
    assert got is not None and np.array_equal(got, ref)


def test_decode_jpeg_dimension_bomb_rejected():
    """A tiny crafted header must not drive a multi-GB allocation: any
    SOF declaring more than the 16 MP untrusted-payload cap decodes to
    None instead of allocating."""
    img = np.zeros((8, 8), dtype=np.uint8)
    p = encode_jpeg(img, quality=90)
    i = p.index(b"\xff\xc0")
    # patch height x width to 65503 x 65503
    dims = (65503).to_bytes(2, "big") * 2
    patched = p[: i + 5] + dims + p[i + 9:]
    assert decode_jpeg(patched) is None
