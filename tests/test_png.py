"""Real PNG decode path (stages/multimodal.decode_png): golden pixels
vs committed fixtures, spec-filter roundtrips, color types, malformed
payloads, and the phash near-dup pipeline over PNG payloads."""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pytest

from deduplicator_ray.stages.multimodal import decode_png, encode_png

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big"))


_SIG = b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("name", ["fixture1", "fixture2"])
def test_decode_png_golden_pixels(name):
    """Committed PNG bytes decode to the committed pixel arrays — a
    frozen-bytes regression gate independent of encode_png."""
    with open(os.path.join(GOLDEN, f"{name}.png"), "rb") as f:
        payload = f.read()
    want = np.load(os.path.join(GOLDEN, f"{name}_pixels.npy"))
    got = decode_png(payload)
    assert got is not None
    assert got.shape == want.shape
    assert (got == want).all()


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(filt):
    rng = np.random.default_rng(filt)
    img = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img, filters=filt)) == img).all()


def test_roundtrip_mixed_filters_and_gradient():
    g = (np.mgrid[0:32, 0:32].sum(axis=0)[..., None]
         .repeat(3, axis=2) * 3 % 256).astype(np.uint8)
    filts = [y % 5 for y in range(32)]
    assert (decode_png(encode_png(g, filters=filts)) == g).all()
    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    assert (decode_png(encode_png(one, filters=4)) == one).all()


def test_color_types_gray_palette_rgba():
    # gray 2x2 -> replicated channels
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    raw = bytes([0, 10, 20, 0, 30, 40])
    p = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    out = decode_png(p)
    assert out.tolist() == [[[10] * 3, [20] * 3], [[30] * 3, [40] * 3]]

    # palette 2x1
    ihdr = (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    plte = bytes([255, 0, 0, 0, 255, 0])
    raw = bytes([0, 1, 0])
    p = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
         + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert decode_png(p).tolist() == [[[0, 255, 0], [255, 0, 0]]]

    # RGBA 1x2, Sub filter; alpha dropped
    ihdr = (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
    px = np.array([[[10, 20, 30, 255], [15, 25, 35, 128]]], dtype=np.uint8)
    delta = ((px[0, 1].astype(int) - px[0, 0].astype(int)) % 256).astype(np.uint8)
    enc = bytes([1]) + px[0, 0].tobytes() + delta.tobytes()
    p = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(enc)) + _chunk(b"IEND", b"")
    assert (decode_png(p) == px[:, :, :3]).all()

    # gray+alpha 1x2, Up filter on row 0 (prev row = zeros)
    ihdr = (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 4, 0, 0, 0])
    enc = bytes([2, 50, 255, 60, 10])
    p = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(enc)) + _chunk(b"IEND", b"")
    assert decode_png(p).tolist() == [[[50] * 3, [60] * 3]]


def test_malformed_and_unsupported_return_none():
    g = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(g)
    assert decode_png(b"not a png") is None
    assert decode_png(_SIG) is None
    assert decode_png(good[:24]) is None
    assert decode_png(good[:-12]) is not None  # missing IEND tolerated
    # truncated IDAT -> zlib error -> None
    assert decode_png(good[: len(good) // 2]) is None
    # 16-bit depth unsupported
    ihdr = (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([16, 2, 0, 0, 0])
    p = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 7)) + _chunk(b"IEND", b"")
    assert decode_png(p) is None
    # Adam7 interlace unsupported
    ihdr = (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 2, 0, 0, 1])
    p = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 4)) + _chunk(b"IEND", b"")
    assert decode_png(p) is None
    # palette index out of range
    ihdr = (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    plte = bytes([255, 0, 0])
    p = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
         + _chunk(b"IDAT", zlib.compress(bytes([0, 5]))) + _chunk(b"IEND", b""))
    assert decode_png(p) is None


def test_png_matches_ppm_features(ray_session):
    """The SAME pixels through decoder='png' and decoder='ppm' yield
    identical phash + embedding (the decode layer is interchangeable)."""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import decode_images, encode_ppm

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
            for _ in range(6)]

    def media(payloads, mime):
        n = len(payloads)
        return pa.table({
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([mime] * n),
            "width": pa.nulls(n, pa.int32()),
            "height": pa.nulls(n, pa.int32()),
            "duration_ms": pa.nulls(n, pa.int32()),
        })

    png = decode_images(
        rd.from_arrow(media([encode_png(im, filters=[y % 5 for y in range(im.shape[0])])
                             for im in imgs], "image/png")),
        decoder="png").to_pandas().sort_values("media_id", ignore_index=True)
    ppm = decode_images(
        rd.from_arrow(media([encode_ppm(im) for im in imgs],
                            "image/x-portable-pixmap")),
        decoder="ppm").to_pandas().sort_values("media_id", ignore_index=True)
    assert (png["phash"] == ppm["phash"]).all()
    for a, b in zip(png["embedding"], ppm["embedding"]):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_media_phash_dups_png_planted(ray_session, sf_dir):
    from deduplicator_ray.pipelines.queries_ext import q_media_phash_dups_png

    out = q_media_phash_dups_png(sf_dir).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    # exact copy under a DIFFERENT filter encoding + one-pixel variant
    assert (0, 1000) in pairs and (0, 1001) in pairs
    assert (5, 1002) in pairs
    zero_h = out[out["hamming"] == 0]
    assert {(0, 1000), (5, 1002)} <= set(zip(zero_h["a"], zero_h["b"]))


def test_synth_png_media_decodes(ray_session):
    from deduplicator_ray.stages.multimodal import synth_png_media

    t = synth_png_media(24)
    ok = sum(decode_png(p) is not None for p in t["payload"].to_pylist())
    bad = 24 - ok
    assert bad == 2  # i % 12 == 11 planted-corrupt rows
    for i, p in enumerate(t["payload"].to_pylist()):
        img = decode_png(p)
        if img is not None:
            assert img.shape == (t["height"][i].as_py(), t["width"][i].as_py(), 3)
