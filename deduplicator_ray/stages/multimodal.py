"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (training-data-pipeline extension).

The decode kernels themselves are STUBBED — this container ships no
image/audio libraries — but everything Ray-side is real and tested:
schemas, actor-pool signatures, batch sizing for wide binary rows, and
the output layout.  ``decoder="fake"`` provides a deterministic
stand-in (content-hash-derived features) so pipelines exercise the full
path; ``decoder="real"`` raises ``NotImplementedError`` at actor init,
exactly where a Pillow/libav-backed implementation would load.

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


class ImageDecoder:
    """Actor-pool stage: decode + feature-extract an image payload column.

    ``decoder="real"`` is the integration point for a Pillow-backed
    implementation (raises NotImplementedError here: the library is not
    in this container). ``decoder="fake"`` derives deterministic features
    from the payload bytes so the Ray plumbing is fully exercised.
    """

    def __init__(self, decoder: str = "fake", payload_col: str = "payload"):
        if decoder == "real":
            raise NotImplementedError(
                "real image decoding needs Pillow/turbojpeg — not available "
                "in this environment; use decoder='fake' for plumbing tests"
            )
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        nbytes = np.zeros(n, dtype=np.int64)
        phash = np.zeros(n, dtype=np.int64)
        emb = np.zeros((n, 8), dtype=np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            nbytes[i] = len(p)
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
