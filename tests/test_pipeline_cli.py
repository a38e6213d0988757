"""End-to-end CLI tests: WARC-corpus index build + match (the reference's
flagship WARC-based indexing mode, manual.md:192), source registry, and
A3 counters in REPORT.json."""

from __future__ import annotations

import json
import os

import pytest

from deduplicator_ray.pipelines.dedup_pipeline import build_parser, run
from deduplicator_ray.sources import get_source, register_source
from deduplicator_ray.sources.warc import write_warc


def _mk_warc_dir(tmp_path, n: int = 20) -> str:
    d = tmp_path / "warcs"
    os.makedirs(d)
    records = []
    for i in range(n):
        records.append(
            {
                "type": "response",
                "url": f"https://www.site{i % 3}.example/p/{i}",
                "date": f"2023-01-{(i % 27) + 1:02d}T00:00:00Z",
                "digest": f"sha1:DIG{i % 8:04d}",  # 8 distinct payloads
                "record_id": f"<urn:uuid:{i}>",
                "http_status": 200,
                "mime": "text/html",
                "etag": f'W/"{i}"',
                "payload": b"<html>x</html>",
            }
        )
    write_warc(str(d / "crawl-00.warc.gz"), records)
    return str(d)


def test_registry():
    assert get_source("parquet") and get_source("warc") and get_source("crawl_log")
    with pytest.raises(ValueError, match="unknown source"):
        get_source("nope")
    register_source("custom", lambda p: p)
    assert get_source("custom")("x") == "x"


def test_warc_index_build_then_match(ray_session, tmp_path):
    warc_dir = _mk_warc_dir(tmp_path)

    # 1) build a keep-latest index from the WARC corpus (with ETags)
    out1 = str(tmp_path / "out_index")
    args = build_parser().parse_args(
        ["--corpus", warc_dir, "--corpus-format", "warc", "--build-index",
         "--include-etag", "--mime-filter", "^text/.*", "--whitelist",
         "--out", out1]
    )
    res1 = run(args)
    idx_dir = os.path.join(out1, "index", "data")
    import pyarrow.dataset as pads

    idx = pads.dataset(idx_dir).to_table().to_pandas()
    # keep-latest upsert on (url, digest): all 20 (url,digest) pairs distinct
    assert len(idx) == 20
    assert idx["etag"].notna().all()  # ETag flowed source -> index (M11/-e)
    assert res1["counters"]["handled"] == 20

    # 2) match the same WARC corpus against that index: every capture is a
    # duplicate (their (digest) pairs are all in the index)
    out2 = str(tmp_path / "out_match")
    args2 = build_parser().parse_args(
        ["--corpus", warc_dir, "--corpus-format", "warc",
         "--history", idx_dir, "--out", out2, "--strategy", "DIGEST_ANY",
         "--mime-filter", "^text/.*", "--whitelist"]
    )
    res2 = run(args2)
    assert res2["report"]["handled"] == 20
    assert res2["report"]["duplicates"] == 20
    with open(os.path.join(out2, "REPORT.json")) as f:
        rep = json.load(f)
    assert rep["counters"]["handled"] == 20
