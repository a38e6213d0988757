"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (training-data-pipeline extension).

Every image format this engine claims has a REAL no-dependency decode
path: ``decoder="ppm"`` (pure-numpy binary-PPM), ``decoder="png"``
(stdlib zlib + numpy unfiltering), and ``decoder="jpeg"`` (baseline
JFIF — pure numpy Huffman + dequant + IDCT + YCbCr, ``stages/jpeg.py``).
Audio codecs remain stubbed (no libsndfile/ffmpeg in this container).
Everything Ray-side is real and tested: schemas, actor-pool signatures,
batch sizing for wide binary rows, and the output layout.
``decoder="fake"`` provides a deterministic stand-in
(content-hash-derived features) for arbitrary binary; ``decoder="real"``
(the old Pillow integration point) now points users at the real paths.

Memory note: binary payloads can be MBs/row — these stages default to a
small ``batch_size`` (64) so batch x concurrency stays within worker
heaps, and they DROP the payload column on output (features only), per
SURVEY.md §7.4 ("wide binary rows: keep payloads out of shuffles").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # nullable metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload_bytes", pa.int64()),
        ("phash", pa.int64()),                 # perceptual-hash slot
        ("embedding", pa.list_(pa.float32(), 8)),
    ]
)


def decode_ppm(p: bytes) -> "np.ndarray | None":
    """Minimal binary-PPM (P6, netpbm spec) parser in pure numpy — a REAL
    decode kernel needing no image library: header tokens (magic, width,
    height, maxval) with whitespace/#-comment handling, then the raw
    interleaved RGB plane.  Returns (h, w, 3) uint8, or None when the
    payload is not well-formed P6 (wrong magic, maxval > 255, truncated)."""
    if not p.startswith(b"P6"):
        return None
    tokens, i = [], 2
    while len(tokens) < 3 and i < len(p):
        c = p[i:i + 1]
        if c == b"#":
            i = p.find(b"\n", i)
            if i < 0:
                return None
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(p) and not p[j:j + 1].isspace():
                j += 1
            tokens.append(p[i:j])
            i = j
    if len(tokens) < 3 or i >= len(p):
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        return None
    i += 1  # exactly one whitespace byte after maxval, per spec
    data = p[i:i + w * h * 3]
    if len(data) < w * h * 3:
        return None
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def decode_png(p: bytes) -> "np.ndarray | None":
    """Real PNG decode with no image library: stdlib ``zlib`` inflate +
    numpy scanline unfiltering (PNG spec §9 filters: None/Sub/Up/
    Average/Paeth), RGB output.

    Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced.  Alpha is dropped (feature
    extraction wants opaque RGB); palette rows are one vectorized take.
    Returns (h, w, 3) uint8, or None for malformed/unsupported payloads
    (16-bit, Adam7 interlace) — same contract as ``decode_ppm``.

    Filter math: None/Up/Sub rows are whole-row numpy (Sub is a prefix
    sum over the bpp-strided lanes); Average/Paeth are sequential in x
    by definition, so those rows fall back to a per-pixel loop over
    (bpp,) lane vectors — encoders emit them per-row, so cost is bounded
    by the rows that actually chose them."""
    import zlib

    SIG = b"\x89PNG\r\n\x1a\n"
    if not p.startswith(SIG):
        return None
    pos, n = len(SIG), len(p)
    ihdr = None
    plte = None
    idat = []
    try:
        while pos + 8 <= n:
            ln = int.from_bytes(p[pos:pos + 4], "big")
            typ = p[pos + 4:pos + 8]
            data = p[pos + 8:pos + 8 + ln]
            if len(data) < ln:
                return None
            if typ == b"IHDR":
                ihdr = data
            elif typ == b"PLTE":
                plte = data
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
            pos += 12 + ln  # length + type + data + crc
        if ihdr is None or len(ihdr) < 13 or not idat:
            return None
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, ctype, comp, filt, interlace = ihdr[8:13]
        if min(w, h) < 1 or depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
        if channels is None or (ctype == 3 and plte is None):
            return None
        raw = zlib.decompress(b"".join(idat))
    except Exception:
        return None
    bpp = channels  # bytes per pixel at depth 8
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        return None
    lines = np.frombuffer(raw[: h * (stride + 1)], dtype=np.uint8)
    lines = lines.reshape(h, stride + 1)
    ftypes = lines[:, 0]
    if (ftypes > 4).any():
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        row = lines[y, 1:].copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            row += prev
        elif f == 1:  # Sub: prefix sum over bpp-strided lanes
            row = (
                row.reshape(w, bpp).astype(np.int64).cumsum(axis=0) & 255
            ).astype(np.uint8).reshape(stride)
        else:  # Average (3) / Paeth (4): sequential in x per spec
            rp = row.reshape(w, bpp).astype(np.int16)
            up = prev.reshape(w, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            ul = np.zeros(bpp, dtype=np.int16)
            for x in range(w):
                if f == 3:
                    rp[x] = (rp[x] + ((left + up[x]) >> 1)) & 255
                else:
                    pa_ = left + up[x] - ul
                    da, db, dc = (
                        np.abs(pa_ - left), np.abs(pa_ - up[x]), np.abs(pa_ - ul),
                    )
                    pred = np.where(
                        (da <= db) & (da <= dc), left,
                        np.where(db <= dc, up[x], ul),
                    )
                    rp[x] = (rp[x] + pred) & 255
                left = rp[x]
                ul = up[x]
            row = rp.astype(np.uint8).reshape(stride)
        out[y] = row
        prev = row
    px = out.reshape(h, w, bpp)
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    pal = np.frombuffer(plte, dtype=np.uint8)
    pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max()) >= len(pal):
        return None
    return pal[idx]


def encode_png(img: np.ndarray, *, filters: "list[int] | int" = 0) -> bytes:
    """(h, w, 3) uint8 -> PNG payload (test/synth helper; stdlib zlib).

    ``filters`` picks the per-row filter type (single int, or one per
    row) so tests can exercise every unfilter branch; rows are filtered
    exactly per spec before deflate."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3).astype(np.int16)
    frows = [filters] * h if isinstance(filters, int) else list(filters)
    body = bytearray()
    prev = np.zeros(w * 3, dtype=np.int16)
    for y in range(h):
        f = int(frows[y])
        cur = flat[y]
        left = np.concatenate([np.zeros(3, np.int16), cur[:-3]])
        up = prev
        ul = np.concatenate([np.zeros(3, np.int16), up[:-3]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - up
        elif f == 3:
            enc = cur - ((left + up) >> 1)
        else:
            pa_ = left + up - ul
            da, db, dc = np.abs(pa_ - left), np.abs(pa_ - up), np.abs(pa_ - ul)
            pred = np.where((da <= db) & (da <= dc), left,
                            np.where(db <= dc, up, ul))
            enc = cur - pred
        body.append(f)
        body.extend((enc & 255).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, deflate, std filter, no interlace
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary-PPM payload (test/synth helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def _ppm_features(img: np.ndarray) -> tuple[int, np.ndarray]:
    """Real image features off a decoded array: an 8x8 average-hash
    (block-mean grayscale thresholded at its mean — the classic aHash)
    and an 8-dim stats embedding (per-channel mean/std + log-dims)."""
    h, w = img.shape[:2]
    gray = img.astype(np.float32).mean(axis=2)
    rb = (np.arange(9, dtype=np.int64) * h) // 8
    cb = (np.arange(9, dtype=np.int64) * w) // 8
    # block sums via two reduceat passes; block sizes from the boundaries
    rows = np.add.reduceat(gray, rb[:8], axis=0)
    blocks = np.add.reduceat(rows, cb[:8], axis=1)
    area = (np.diff(rb)[:, None] * np.diff(cb)[None, :]).astype(np.float32)
    np.maximum(area, 1.0, out=area)
    bm = blocks / area
    bits = (bm >= bm.mean()).reshape(-1)
    phash = int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)
    ch = img.reshape(-1, 3).astype(np.float32)
    emb = np.concatenate([
        ch.mean(axis=0) / 255.0,
        ch.std(axis=0) / 255.0,
        [np.log1p(w) / 16.0, np.log1p(h) / 16.0],
    ]).astype(np.float32)
    return phash, emb


class ImageDecoder:
    """Actor-pool stage: decode + feature-extract an image payload column.

    ``decoder="ppm"`` is a REAL pure-numpy decode path (binary PPM/P6 —
    see ``decode_ppm``): parse, average-hash, channel-stats embedding;
    undecodable payloads emit zero features (payload_bytes still real).
    ``decoder="real"`` is the integration point for a Pillow-backed
    JPEG/PNG implementation (raises NotImplementedError here: the library
    is not in this container). ``decoder="fake"`` derives deterministic
    features from the payload bytes so the Ray plumbing is fully
    exercised on arbitrary binary.
    """

    def __init__(self, decoder: str = "fake", payload_col: str = "payload"):
        if decoder == "real":
            raise NotImplementedError(
                "decoder='real' was the Pillow/turbojpeg integration point; "
                "every image format this engine claims now has a REAL "
                "no-dependency path — use decoder='jpeg', 'png' or 'ppm' "
                "(decoder='fake' remains the arbitrary-binary plumbing "
                "stand-in)"
            )
        if decoder not in ("fake", "ppm", "png", "jpeg"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.payload_col = payload_col
        if decoder == "jpeg":
            from deduplicator_ray.stages.jpeg import decode_jpeg

            self._decode = decode_jpeg
        else:
            self._decode = {"ppm": decode_ppm, "png": decode_png}.get(decoder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        nbytes = np.zeros(n, dtype=np.int64)
        phash = np.zeros(n, dtype=np.int64)
        emb = np.zeros((n, 8), dtype=np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            nbytes[i] = len(p)
            if self._decode is not None:
                img = self._decode(p)
                if img is not None:
                    phash[i], emb[i] = _ppm_features(img)
                continue
            d = hashlib.blake2b(p, digest_size=16).digest()
            phash[i] = int.from_bytes(d[:8], "big", signed=True)
            emb[i] = np.frombuffer(d, dtype=np.uint8)[:8].astype(np.float32) / 255.0
        emb_arr = pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 8)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload_bytes": pa.array(nbytes),
                "phash": pa.array(phash),
                "embedding": emb_arr,
            }
        )


def decode_images(ds, *, decoder: str = "fake", batch_size: int = 64,
                  concurrency: int | tuple[int, int] = (2, 4), num_cpus: float = 1):
    """Media dataset -> image feature dataset (payload column dropped)."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_args=(decoder,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        zero_copy_batch=True,
    )


AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload_bytes", pa.int64()),
        ("n_windows", pa.int32()),
        ("energy", pa.list_(pa.float32(), 8)),  # per-window energy profile
    ]
)


class AudioFeatureExtractor:
    """Actor-pool stage: audio payload -> fixed-size energy profile.

    ``decoder="real"`` is the libsndfile/ffmpeg integration point (not in
    this container); ``decoder="fake"`` treats the payload bytes as a
    PCM-ish sample stream and computes a REAL windowed-energy reduction
    over them — deterministic, vectorized, and shaped exactly like a real
    feature extractor's output."""

    def __init__(self, decoder: str = "fake", payload_col: str = "payload"):
        if decoder == "real":
            raise NotImplementedError(
                "real audio decoding needs libsndfile/ffmpeg — not available "
                "in this environment; use decoder='fake' for plumbing tests"
            )
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        nbytes = np.zeros(n, dtype=np.int64)
        nwin = np.zeros(n, dtype=np.int32)
        energy = np.zeros((n, 8), dtype=np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            nbytes[i] = len(p)
            if not p:
                continue
            samples = np.frombuffer(p, dtype=np.uint8).astype(np.float32) - 128.0
            wins = np.array_split(samples, 8)
            nwin[i] = sum(1 for w in wins if len(w))
            energy[i] = [float(np.sqrt(np.mean(w**2))) if len(w) else 0.0 for w in wins]
        e_arr = pa.FixedSizeListArray.from_arrays(pa.array(energy.reshape(-1)), 8)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload_bytes": pa.array(nbytes),
                "n_windows": pa.array(nwin),
                "energy": e_arr,
            }
        )


def extract_audio_features(ds, *, decoder: str = "fake", batch_size: int = 64,
                           concurrency: int | tuple[int, int] = (2, 4),
                           num_cpus: float = 1):
    """Media dataset -> audio feature dataset (payload dropped)."""
    return ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_args=(decoder,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        zero_copy_batch=True,
    )


def resize_plan(ds, *, max_side: int = 256, batch_size: int = 256):
    """Image resize stage, metadata half: computes target (width, height)
    preserving aspect ratio with the long side clamped to ``max_side``,
    plus the scale factor — the real pixel resample is the 'real'-decoder
    kernel's job; everything the scheduler/schema cares about is here."""

    def f(b: pa.Table) -> pa.Table:
        w = np.asarray(b["width"], dtype=np.float64)
        h = np.asarray(b["height"], dtype=np.float64)
        long_side = np.maximum(w, h)
        scale = np.where(long_side > 0, np.minimum(1.0, max_side / np.maximum(1, long_side)), 1.0)
        tw = np.maximum(1, np.round(w * scale)).astype(np.int32)
        th = np.maximum(1, np.round(h * scale)).astype(np.int32)
        return (
            b.append_column("target_width", pa.array(tw))
            .append_column("target_height", pa.array(th))
            .append_column("resize_scale", pa.array(scale))
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def sample_frames(ds, *, fps: float = 1.0, batch_size: int = 64):
    """Video frame-sampling stage: adds ``frame_ts_ms`` (the timestamps a
    real decoder would extract) per row via ``frame_sample_plan``."""

    def f(b: pa.Table) -> pa.Table:
        col = b["duration_ms"]
        if isinstance(col, pa.ChunkedArray):
            plan = frame_sample_plan(col, fps=fps)
        else:
            plan = frame_sample_plan(pa.chunked_array([col]), fps=fps)
        return b.append_column("frame_ts_ms", plan)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def frame_sample_plan(duration_ms_col: pa.ChunkedArray, fps: float = 1.0) -> pa.Array:
    """Video frame-sampling plan: timestamps (ms) to decode per row —
    the pure-plumbing half of a frame sampler (the decode itself would be
    a 'real' decoder kernel)."""
    out = []
    for d in duration_ms_col.to_pylist():
        if not d or d <= 0:
            out.append([])
        else:
            step = int(1000 / fps)
            out.append(list(range(0, int(d), step)))
    return pa.array(out, type=pa.list_(pa.int32()))


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table in MEDIA_SCHEMA (no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(100, 5000, size=n)]
    kinds = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n),
            "width": pa.array([64] * n, type=pa.int32()),
            "height": pa.array([64] * n, type=pa.int32()),
            "duration_ms": pa.array([3000 if k == "video" else 0 for k in kinds], type=pa.int32()),
        }
    )


def synth_png_media(n: int = 48, seed: int = 44) -> pa.Table:
    """Deterministic VALID PNG media table (all five scanline filters,
    plus a few corrupt payloads) — drives the REAL ``decoder="png"``
    path (zlib inflate + numpy unfiltering) with no external data."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h = int(rng.integers(4, 40))
        w = int(rng.integers(4, 40))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        # cycle every filter type across rows so all unfilter branches run
        filts = [(i + y) % 5 for y in range(h)]
        p = encode_png(img, filters=filts)
        if i % 12 == 11:  # corrupt a few: truncate inside IDAT
            p = p[: len(p) // 2]
        rows.append((i, p, w, h))
    return pa.table({
        "media_id": pa.array(np.array([r[0] for r in rows], dtype=np.int64)),
        "kind": pa.array(["image"] * n),
        "payload": pa.array([r[1] for r in rows], type=pa.binary()),
        "mime": pa.array(["image/png"] * n),
        "width": pa.array([r[2] for r in rows], type=pa.int32()),
        "height": pa.array([r[3] for r in rows], type=pa.int32()),
        "duration_ms": pa.array([0] * n, type=pa.int32()),
    })


def synth_jpeg_media(n: int = 48, seed: int = 45) -> pa.Table:
    """Deterministic VALID baseline-JPEG media table cycling subsampling
    (4:4:4 / 4:2:0), grayscale, quality levels and restart intervals,
    plus a few corrupt payloads — drives the REAL ``decoder="jpeg"``
    path (stages/jpeg.py) with no external data."""
    from deduplicator_ray.stages.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        if i % 5 == 4:
            img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)  # gray
        else:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        p = encode_jpeg(
            img,
            quality=(60, 85, 95)[i % 3],
            subsampling="4:2:0" if (img.ndim == 3 and i % 2) else "4:4:4",
            restart_interval=(i % 4 == 3) and 2 or 0,
        )
        if i % 12 == 11:  # corrupt a few: truncate inside the headers
            # (mid-SCAN truncation may still decode — the spec pads the
            # entropy stream with 1-bits — so it is exercised separately
            # in tests, not used as a guaranteed-invalid payload)
            p = p[:20]
        rows.append((i, p, w, h))
    return pa.table({
        "media_id": pa.array(np.array([r[0] for r in rows], dtype=np.int64)),
        "kind": pa.array(["image"] * n),
        "payload": pa.array([r[1] for r in rows], type=pa.binary()),
        "mime": pa.array(["image/jpeg"] * n),
        "width": pa.array([r[2] for r in rows], type=pa.int32()),
        "height": pa.array([r[3] for r in rows], type=pa.int32()),
        "duration_ms": pa.array([0] * n, type=pa.int32()),
    })


def synth_ppm_media(n: int = 48, seed: int = 43) -> pa.Table:
    """Deterministic VALID binary-PPM media table (plus a few corrupt
    payloads) — drives the REAL ``decoder="ppm"`` path end to end with
    no external data."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h = int(rng.integers(4, 40))
        w = int(rng.integers(4, 40))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        p = encode_ppm(img)
        if i % 12 == 11:  # corrupt a few: truncate past the header
            p = p[: len(p) // 2]
        rows.append((i, p, w, h))
    return pa.table({
        "media_id": pa.array(np.array([r[0] for r in rows], dtype=np.int64)),
        "kind": pa.array(["image"] * n),
        "payload": pa.array([r[1] for r in rows], type=pa.binary()),
        "mime": pa.array(["image/x-portable-pixmap"] * n),
        "width": pa.array([r[2] for r in rows], type=pa.int32()),
        "height": pa.array([r[3] for r in rows], type=pa.int32()),
        "duration_ms": pa.array([0] * n, type=pa.int32()),
    })
