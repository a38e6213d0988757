"""WARC source tests — golden semantics mirror WarcFileIterator.java
(record-type switch, http(s) url filter, HTTP status/Content-Type/ETag
extraction, revisit demap + ETag nulling) and WarcIterator.java (recursive
sorted dir scan)."""

from __future__ import annotations

import gzip
import os

import pytest

from deduplicator_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_paths,
    write_warc,
)

IDENTICAL = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
NOT_MODIFIED = "http://netpreserve.org/warc/1.0/revisit/server-not-modified"


def _fixture_records():
    return [
        {  # plain response with full HTTP block
            "type": "response", "url": "http://example.com/a",
            "date": "2022-06-01T10:00:00Z",
            "digest": "sha1:YA3G7O6TNMHXA5WWDSIZJDNXV56WDRCA",
            "record_id": "<urn:uuid:1>", "http_status": 200,
            "mime": "text/html; charset=utf-8", "etag": 'W/"abc"',
            "payload": b"<html>hi</html>",
        },
        {  # revisit, identical-payload profile -> ETag must be nulled
            "type": "revisit", "url": "https://example.com/b",
            "date": "2022-06-02T10:00:00Z", "digest": "sha1:AAA",
            "record_id": "<urn:uuid:2>", "http_status": 304,
            "mime": "text/html", "etag": 'W/"keepme?"',
            "refers_to_url": "https://example.com/b-orig",
            "refers_to_date": "2022-01-01T00:00:00Z", "profile": IDENTICAL,
        },
        {  # revisit, server-not-modified -> ETag survives
            "type": "revisit", "url": "https://example.com/c",
            "date": "2022-06-03T10:00:00Z", "digest": "sha1:BBB",
            "record_id": "<urn:uuid:3>", "http_status": 304,
            "mime": "text/html", "etag": 'W/"kept"',
            "refers_to_url": "https://example.com/c-orig",
            "refers_to_date": "2022-01-02T00:00:00Z", "profile": NOT_MODIFIED,
        },
        {  # metadata record -> skipped (record-type switch default)
            "type": "metadata", "url": "http://example.com/meta",
            "date": "2022-06-04T10:00:00Z", "payload": b"ignored",
        },
        {  # non-http url -> skipped (:82-84)
            "type": "response", "url": "dns:example.com",
            "date": "2022-06-05T10:00:00Z",
        },
        {  # response without an HTTP block -> status 0, no mime/etag
            "type": "response", "url": "http://example.com/raw",
            "date": "2022-06-06T10:00:00Z", "digest": "sha1:CCC",
            "record_id": "<urn:uuid:6>", "payload": b"rawbytes-no-eol",
        },
    ]


@pytest.fixture(scope="module")
def parsed(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("warc") / "fixture.warc")
    write_warc(p, _fixture_records())
    with open(p, "rb") as f:
        return parse_warc_bytes(f.read()).to_pandas()


def test_row_selection(parsed):
    # metadata + dns records skipped; 4 rows survive
    assert parsed["url"].tolist() == [
        "http://example.com/a", "https://example.com/b",
        "https://example.com/c", "http://example.com/raw",
    ]


def test_response_fields(parsed):
    r = parsed.iloc[0]
    assert r["status"] == 200
    assert r["mime"] == "text/html; charset=utf-8"
    assert r["etag"] == 'W/"abc"'
    assert r["digest"] == "sha1:YA3G7O6TNMHXA5WWDSIZJDNXV56WDRCA"
    assert str(r["warc_ts"]) == "2022-06-01 10:00:00"
    assert r["record_id"] == "<urn:uuid:1>"
    assert not r["is_revisit"]


def test_revisit_demap_and_etag_nulling(parsed):
    r = parsed.iloc[1]
    assert r["is_revisit"]
    assert r["original_url"] == "https://example.com/b-orig"
    assert str(r["original_ts"]) == "2022-01-01 00:00:00"
    assert r["revisit_profile"] == IDENTICAL
    assert r["etag"] is None  # nulled (WarcFileIterator.java:146-149)
    assert r["status"] == 304  # HTTP block still parsed


def test_not_modified_keeps_etag(parsed):
    r = parsed.iloc[2]
    assert r["is_revisit"] and r["revisit_profile"] == NOT_MODIFIED
    assert r["etag"] == 'W/"kept"'


def test_no_http_block(parsed):
    r = parsed.iloc[3]
    assert r["status"] == 0  # CrawlDataItem default
    assert r["mime"] is None and r["etag"] is None
    assert r["content_length"] == len(b"rawbytes-no-eol")


def test_gzip_roundtrip(tmp_path):
    p = str(tmp_path / "x.warc.gz")
    write_warc(p, _fixture_records())
    with open(p, "rb") as f:
        raw = f.read()
    assert raw[:2] == b"\x1f\x8b"
    t = parse_warc_bytes(raw)
    assert t.num_rows == 4
    # deterministic bytes (mtime pinned)
    write_warc(str(tmp_path / "y.warc.gz"), _fixture_records())
    with open(str(tmp_path / "y.warc.gz"), "rb") as f:
        assert f.read() == raw


def test_eol_required_for_http_parse(tmp_path):
    """Status line without ANY newline -> eolCharCount == 0 -> the HTTP
    block is NOT parsed (WarcFileIterator.java:119-120)."""
    p = str(tmp_path / "e.warc")
    write_warc(p, [{
        "type": "response", "url": "http://example.com/noeol",
        "date": "2022-06-01T10:00:00Z", "payload": b"HTTP/1.1 200 OK",
    }])
    with open(p, "rb") as f:
        t = parse_warc_bytes(f.read()).to_pandas()
    assert t["status"].tolist() == [0]


def test_dir_scan_sorted_recursive(tmp_path):
    os.makedirs(tmp_path / "sub")
    for name in ["b.warc", "a.warc.gz", "sub/c.warc", "notes.txt", "x.warcx"]:
        fp = tmp_path / name
        if str(name).endswith((".warc", ".warc.gz")):
            write_warc(str(fp), _fixture_records()[:1])
        else:
            fp.write_text("not a warc")
    got = [os.path.relpath(p, tmp_path) for p in warc_paths(str(tmp_path))]
    assert got == ["a.warc.gz", "b.warc", "sub/c.warc"]


def test_read_warc_dataset(ray_session, tmp_path):
    write_warc(str(tmp_path / "a.warc.gz"), _fixture_records())
    write_warc(str(tmp_path / "b.warc"), _fixture_records()[:1])
    pdf = read_warc(str(tmp_path)).to_pandas()
    assert len(pdf) == 5
    assert pdf["is_revisit"].sum() == 2
    assert pdf["source_path"].nunique() == 2


def test_truncated_tail_tolerated():
    good = write_warc("/tmp/_trunc.warc", _fixture_records()[:1])
    with open(good, "rb") as f:
        data = f.read()
    # append garbage: the scan stops at the malformed tail, keeping rows
    t = parse_warc_bytes(data + b"GARBAGE NOT A RECORD")
    assert t.num_rows == 1


def test_write_revisit_warc_roundtrip(ray_session, tmp_path):
    """Match output -> revisit WARC -> reader: every duplicate becomes a
    revisit record carrying its original's url/ts; novels are skipped."""
    import pandas as pd

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.sources.warc import read_warc, write_revisit_warc
    from deduplicator_ray.stages.exact import build_index, match_shuffle
    from deduplicator_ray.stages.normalize import normalize
    import ray.data as rd

    cfg = PipelineConfig()
    hist = pd.DataFrame({
        "url": ["http://a/1", "http://b/2"],
        "warc_ts": pd.to_datetime([1_700_000_000, 1_700_000_000], unit="s"),
        "text": ["same content", "other content"],
    })
    cur = pd.DataFrame({
        "url": ["http://c/3", "http://d/4"],
        "warc_ts": pd.to_datetime([1_700_000_500, 1_700_000_500], unit="s"),
        "text": ["same content", "novel content"],
    })
    idx = build_index(normalize(rd.from_pandas(hist), cfg,
                                digest_mode="md5_text", side="index"), cfg)
    matches = match_shuffle(normalize(rd.from_pandas(cur), cfg,
                                      digest_mode="md5_text"), idx, cfg)
    path, n = write_revisit_warc(matches, str(tmp_path / "revisits.warc"))
    assert n == 1  # only the duplicate row

    back = read_warc(path).to_pandas()
    assert len(back) == 1
    r = back.iloc[0]
    assert bool(r["is_revisit"])
    assert r["url"] == "http://c/3"
    assert r["original_url"] == "http://a/1"
    assert pd.Timestamp(r["original_ts"]).timestamp() == 1_700_000_000
    # reader strips the scheme-prefixed digest to the match's digest
    assert str(r["digest"]).endswith(matches.to_pandas()
                                     .set_index("url")
                                     .loc["http://c/3", "digest"])
