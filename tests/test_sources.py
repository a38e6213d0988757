"""crawl.log parser golden tests (fixtures ported from the reference's
CrawlLogIteratorTest.java:29-38 — its only golden data) + multimodal
plumbing tests."""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deduplicator_ray.sources.crawl_log import (
    DEFAULT_REVISIT_REGEX,
    parse_batch,
    parse_line,
    read_crawl_log,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "crawl.log")


@pytest.fixture(scope="module")
def lines():
    with open(GOLDEN) as f:
        return f.read().splitlines()


RX = re.compile(DEFAULT_REVISIT_REGEX)


class TestParseLine:
    def test_valid_without_annotation(self, lines):
        r = parse_line(lines[0], RX)
        assert r is not None
        assert r["status"] == 200
        assert r["url"] == "http://www.bok.hi.is/image.gif"
        assert r["mime"] == "image/gif"
        assert r["digest"] == "YA3G7O6TNMHXA5WWDSIZJDNXV56WDRCA"
        assert str(r["warc_ts"]) == "2006-10-17 14:22:29"  # 17-digit -> iso
        assert r["is_revisit"] is False

    def test_valid_without_origin(self, lines):
        r = parse_line(lines[1], RX)
        assert r is not None and r["original_url"] is None

    def test_valid_with_old_style_annotation(self, lines):
        # 'duplicate:"ORIGIN",3t' doesn't match the new revisit marker
        r = parse_line(lines[2], RX)
        assert r is not None and r["is_revisit"] is False

    def test_truncated_returns_none(self, lines):
        assert parse_line(lines[3], RX) is None

    def test_digest_prefix_preserved(self, lines):
        r = parse_line(lines[4], RX)
        assert r["digest"] == "sha1:YA3G7O6TNMHXA5WWDSIZJDNXV56WDRCA"

    def test_revisit_with_json_extra_info(self, lines):
        r = parse_line(lines[5], RX)
        assert r["is_revisit"] is True
        assert r["original_url"] == "http://example.com/orig"
        assert str(r["original_ts"]) == "2022-06-01 10:00:00"
        assert "identical-payload-digest" in r["revisit_profile"]

    def test_custom_regex(self, lines):
        rx = re.compile(r"^.*duplicate:.*$")
        assert parse_line(lines[2], rx)["is_revisit"] is True

    def test_short_line(self):
        assert parse_line("short", RX) is None
        assert parse_line(None, RX) is None


def test_parse_batch_counts(lines):
    t = parse_batch(lines)
    assert t.num_rows == 5  # 6 lines, 1 truncated
    assert sum(t["parse_dropped"].to_pylist()) == 1


def test_parse_batch_all_malformed_keeps_dropped_count():
    """A batch whose every line is malformed must still surface its
    parse_dropped count (metrics-only row, status 0, null fields)."""
    t = parse_batch(["short", "x", "also way too short"])
    assert t.num_rows == 1
    assert t["parse_dropped"].to_pylist() == [3]
    assert t["status"].to_pylist() == [0]  # status>0 filters drop the row
    assert t["url"].to_pylist() == [None]
    # empty batches with nothing dropped stay empty
    assert parse_batch([]).num_rows == 0


def test_read_crawl_log_dataset(ray_session):
    ds = read_crawl_log(GOLDEN)
    pdf = ds.to_pandas()
    assert len(pdf) == 5
    assert pdf["is_revisit"].sum() == 1


class TestMultimodal:
    def test_fake_decode_pipeline(self, ray_session):
        import ray.data as rd

        from deduplicator_ray.stages.multimodal import decode_images, synth_media

        media = synth_media(32)
        out = decode_images(rd.from_arrow(media)).to_pandas()
        assert len(out) == 32
        assert "payload" not in out.columns  # payload dropped on output
        assert (out["payload_bytes"] > 0).all()
        # deterministic features
        out2 = decode_images(rd.from_arrow(synth_media(32))).to_pandas()
        assert out["phash"].tolist() == out2["phash"].tolist()

    def test_audio_features(self, ray_session):
        import ray.data as rd

        from deduplicator_ray.stages.multimodal import extract_audio_features, synth_media

        out = extract_audio_features(rd.from_arrow(synth_media(30))).to_pandas()
        assert len(out) == 30
        assert "payload" not in out.columns
        assert (out["n_windows"] == 8).all()
        # deterministic energy profiles
        out2 = extract_audio_features(rd.from_arrow(synth_media(30))).to_pandas()
        assert out["energy"].apply(tuple).tolist() == out2["energy"].apply(tuple).tolist()

    def test_resize_plan_and_frame_sampling(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        from deduplicator_ray.stages.multimodal import resize_plan, sample_frames

        media = pa.table(
            {"media_id": pa.array([1, 2, 3], pa.int64()),
             "width": pa.array([640, 100, 0], pa.int32()),
             "height": pa.array([480, 400, 0], pa.int32()),
             "duration_ms": pa.array([2500, 0, None], pa.int32())}
        )
        out = sample_frames(resize_plan(rd.from_arrow(media), max_side=256)).to_pandas()
        out = out.sort_values("media_id", ignore_index=True)
        assert out.loc[0, "target_width"] == 256 and out.loc[0, "target_height"] == 192
        assert out.loc[1, "target_width"] == 64 and out.loc[1, "target_height"] == 256
        assert list(out.loc[0, "frame_ts_ms"]) == [0, 1000, 2000]
        assert list(out.loc[1, "frame_ts_ms"]) == []

    def test_audio_real_decoder_is_stubbed(self):
        from deduplicator_ray.stages.multimodal import AudioFeatureExtractor

        with pytest.raises(NotImplementedError):
            AudioFeatureExtractor(decoder="real")

    def test_real_decoder_is_stubbed(self):
        from deduplicator_ray.stages.multimodal import ImageDecoder

        with pytest.raises(NotImplementedError):
            ImageDecoder(decoder="real")

    def test_frame_sample_plan(self):
        import pyarrow as pa

        from deduplicator_ray.stages.multimodal import frame_sample_plan

        col = pa.chunked_array([pa.array([3000, 0, None], type=pa.int32())])
        plan = frame_sample_plan(col, fps=1.0)
        assert plan.to_pylist() == [[0, 1000, 2000], [], []]


class TestPpmDecode:
    def _img(self, rng, h=20, w=31):
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def test_roundtrip_and_comment_header(self):
        from deduplicator_ray.stages.multimodal import decode_ppm, encode_ppm

        rng = np.random.default_rng(3)
        img = self._img(rng)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        # comments between header tokens are legal netpbm
        p = encode_ppm(img)
        commented = p.replace(b"P6\n", b"P6\n# a comment\n", 1)
        assert (decode_ppm(commented) == img).all()

    def test_malformed_payloads_return_none(self):
        from deduplicator_ray.stages.multimodal import decode_ppm, encode_ppm

        rng = np.random.default_rng(5)
        p = encode_ppm(self._img(rng))
        assert decode_ppm(b"") is None
        assert decode_ppm(b"P5" + p[2:]) is None          # wrong magic
        assert decode_ppm(p[: len(p) - 10]) is None       # truncated
        assert decode_ppm(b"P6\n4 4\n65535\n" + b"x" * 96) is None  # 16-bit

    def test_decode_images_ppm_matches_reference(self, ray_session):
        import ray.data as rd

        from deduplicator_ray.stages.multimodal import (
            _ppm_features,
            decode_images,
            encode_ppm,
        )

        rng = np.random.default_rng(7)
        imgs = [self._img(rng, h, w) for h, w in [(8, 8), (20, 31), (64, 48)]]
        payloads = [encode_ppm(i) for i in imgs] + [b"not an image"]
        t = pa.table({
            "media_id": pa.array(np.arange(4, dtype=np.int64)),
            "kind": pa.array(["image"] * 4),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/x-portable-pixmap"] * 4),
            "width": pa.array([8, 31, 48, None], type=pa.int32()),
            "height": pa.array([8, 20, 64, None], type=pa.int32()),
            "duration_ms": pa.array([None] * 4, type=pa.int32()),
        })
        out = (decode_images(rd.from_arrow(t), decoder="ppm")
               .to_pandas().sort_values("media_id").reset_index(drop=True))
        for i, img in enumerate(imgs):
            ph, emb = _ppm_features(img)
            assert out.loc[i, "phash"] == ph
            np.testing.assert_allclose(np.array(out.loc[i, "embedding"]),
                                       emb, rtol=1e-6)
            assert out.loc[i, "payload_bytes"] == len(payloads[i])
        # undecodable payload: zero features, real byte count
        assert out.loc[3, "phash"] == 0
        assert out.loc[3, "payload_bytes"] == len(b"not an image")
        # identical images hash identically; a brightness shift stays close
        ph1, _ = _ppm_features(imgs[1])
        ph2, _ = _ppm_features(np.clip(imgs[1].astype(np.int16) + 6,
                                       0, 255).astype(np.uint8))
        ham = bin(np.uint64(ph1 ^ ph2) & np.uint64(2**64 - 1)).count("1")
        assert ham <= 12  # aHash is brightness-shift tolerant


def test_csv_source_warc_ts_normalized(ray_session, tmp_path):
    """The csv registered source parses a header CSV and normalizes
    warc_ts to timestamp[us] like every other source."""
    import pyarrow as pa

    from deduplicator_ray.sources import get_source

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,url,warc_ts,text\n"
        "1,https://www.a.example/x,2024-01-02T03:04:05Z,hello world\n"
        "2,https://www.b.example/y,2024-01-02T03:04:06Z,second row\n"
    )
    ds = get_source("csv")(str(p))
    t = ds.schema()
    f = dict(zip(t.names, t.types))["warc_ts"]
    assert pa.types.is_timestamp(f) and f.unit == "us"
    rows = ds.to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(rows["doc_id"]) == [1, 2]
    assert rows["text"].iloc[0] == "hello world"
    assert rows["warc_ts"].iloc[0].isoformat().startswith("2024-01-02T03:04:05")


def test_wet_roundtrip(ray_session, tmp_path):
    """WET conversion records parse back text/url/ts exactly; warcinfo
    and non-http records are skipped; gzip and plain files agree; dir
    scan picks .wet/.wet.gz recursively."""
    import pandas as pd

    from deduplicator_ray.sources import get_source
    from deduplicator_ray.sources.wet import parse_wet_bytes, write_wet

    recs = [
        {"type": "warcinfo", "url": "https://x.example/ignored",
         "date": "2024-01-01T00:00:00Z", "text": "robots: classic"},
        {"url": "https://a.example/p1", "date": "2024-01-02T03:04:05Z",
         "text": "hello world\nsecond line"},
        {"url": "https://b.example/p2", "date": "2024-01-03T00:00:00Z",
         "text": "unicode: café — ok"},
        {"type": "conversion", "url": "ftp://c.example/skip",
         "date": "2024-01-04T00:00:00Z", "text": "non-http skipped"},
    ]
    d = tmp_path / "wet" / "sub"
    d.mkdir(parents=True)
    write_wet(str(d / "part-0.warc.wet"), recs)
    write_wet(str(d / "part-1.wet.gz"), recs[1:2])

    got = (get_source("wet")(str(tmp_path / "wet")).to_pandas()
           .sort_values(["source_path", "url"], ignore_index=True))
    assert len(got) == 3  # 2 + 1 conversion rows, skips dropped
    r = got.iloc[0]
    assert r["url"] == "https://a.example/p1"
    assert r["text"] == "hello world\nsecond line"
    assert r["warc_ts"] == pd.Timestamp("2024-01-02T03:04:05")
    assert got.iloc[1]["text"].startswith("unicode: café")
    # gzip member parses identically to the plain file
    raw = open(d / "part-0.warc.wet", "rb").read()
    import gzip as _gz

    assert parse_wet_bytes(_gz.compress(raw)).to_pydict() == \
        parse_wet_bytes(raw).to_pydict()


def test_wat_roundtrip(ray_session, tmp_path):
    """WAT metadata records flatten to one row per outlink; request
    records, non-http targets, malformed JSON envelopes and link-less
    pages are skipped; gzip parses identically."""
    import gzip as _gz

    from deduplicator_ray.sources import get_source
    from deduplicator_ray.sources.wat import parse_wat_bytes, write_wat

    recs = [
        {"url": "https://a.example/p", "date": "2024-02-01T00:00:00Z",
         "links": ["https://b.example/x", "https://c.example/y"]},
        {"url": "https://d.example/q", "date": "2024-02-02T00:00:00Z",
         "links": []},                                   # no rows
        {"type": "request", "url": "https://e.example/r",
         "date": "2024-02-03T00:00:00Z", "links": ["https://f/"]},
        {"url": "https://g.example/bad", "date": "2024-02-04T00:00:00Z",
         "raw_body": b"{truncated"},                     # malformed: skip
    ]
    d = tmp_path / "wat"
    d.mkdir()
    write_wat(str(d / "part-0.warc.wat.gz"), recs)
    got = (get_source("wat")(str(d)).to_pandas()
           .sort_values("dst_url", ignore_index=True))
    assert got["url"].tolist() == ["https://a.example/p"] * 2
    assert got["dst_url"].tolist() == ["https://b.example/x",
                                       "https://c.example/y"]
    raw = _gz.decompress(open(d / "part-0.warc.wat.gz", "rb").read())
    assert parse_wat_bytes(raw).num_rows == 2


# ---------------------------------------------------------------------------
# ARC (legacy Internet Archive container)
# ---------------------------------------------------------------------------


def test_arc_v2_roundtrip_fields(ray_session, tmp_path):
    from deduplicator_ray.sources.arc import parse_arc_bytes, write_arc

    body = b"hello arc world"
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b'ETag: "e1"\r\n\r\n' + body)
    import hashlib
    p = write_arc(str(tmp_path / "a.arc"), [
        {"url": "http://a.example/x", "date14": "20231114221320",
         "mime": "text/html", "status": 200,
         "checksum": hashlib.md5(body).hexdigest(), "payload": payload},
        {"url": "dns:a.example", "date14": "20231114221320", "payload": b"z"},
    ])
    t = parse_arc_bytes(open(p, "rb").read(), source_path=p)
    assert t.num_rows == 1  # filedesc + dns filtered
    r = {k: t[k][0].as_py() for k in t.column_names}
    assert r["url"] == "http://a.example/x"
    assert r["status"] == 200
    assert r["mime"] == "text/html"
    assert r["digest"] == hashlib.md5(body).hexdigest()
    assert r["etag"] == '"e1"'
    assert r["is_revisit"] is False
    assert r["content_length"] == len(payload)
    assert r["warc_ts"].isoformat().startswith("2023-11-14T22:13:20")
    assert r["record_id"].startswith("arc:")


def test_arc_v1_sha1_fallback_and_gzip_dir(ray_session, tmp_path):
    """v1 headers carry no checksum/status: status+mime come from the
    HTTP block, digest is sha1:BASE32 of the HTTP body; .arc.gz and
    sorted recursive directory scan work like the WARC family."""
    from deduplicator_ray.functions.digesting import sha1_base32
    from deduplicator_ray.sources import get_source
    from deduplicator_ray.sources.arc import write_arc

    body = b"v1 body bytes"
    payload = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n" + body
    sub = tmp_path / "deep"
    sub.mkdir()
    write_arc(str(sub / "b.arc.gz"), [
        {"url": "https://b.example/y", "date14": "20240101000000",
         "mime": "-", "payload": payload},
    ], version=1)
    ds = get_source("arc")(str(tmp_path))
    rows = ds.to_pandas()
    assert len(rows) == 1
    r = rows.iloc[0]
    assert r["status"] == 404
    assert r["mime"] == "text/plain"  # '-' field falls back to HTTP header
    assert r["digest"] == sha1_base32(body, with_scheme=True)
    assert r["record_id"] == "arc:2"  # ordinal counts the filedesc record


def test_arc_feeds_index_build(ray_session, tmp_path):
    """An ARC corpus flows through normalize + build_index unchanged
    (RECORD_SCHEMA parity with the WARC source)."""
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.sources.arc import read_arc, write_arc
    from deduplicator_ray.stages.exact import build_index
    from deduplicator_ray.stages.normalize import normalize

    recs = []
    for i in range(6):
        body = b"doc %d" % i
        payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        recs.append({"url": f"https://c.example/{i % 3}",  # re-crawled urls
                     "date14": f"2024010100000{i}", "status": 200,
                     "payload": payload})
    p = write_arc(str(tmp_path / "c.arc"), recs)
    # mime_whitelist: the reference's default "^text/.*" is a BLACKLIST
    idx = build_index(normalize(read_arc(p),
                                PipelineConfig(mime_whitelist=True)))
    pdf = idx.to_pandas()
    assert len(pdf) == 6  # distinct (url, digest) pairs
    assert pdf["digest"].notna().all()


def test_arc_torn_tail_stops_clean(ray_session, tmp_path):
    from deduplicator_ray.sources.arc import parse_arc_bytes, write_arc

    p = write_arc(str(tmp_path / "d.arc"), [
        {"url": "http://d.example/1", "date14": "20240101000000",
         "payload": b"HTTP/1.1 200 OK\r\n\r\nok"},
    ])
    data = open(p, "rb").read()
    torn = data + b"http://d.example/2 10.0.0.1 2024"  # truncated header
    t = parse_arc_bytes(torn)
    assert t.num_rows == 1  # parsed rows kept, torn tail dropped
