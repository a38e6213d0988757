"""WET (WARC Encapsulated Text) source — Common Crawl's extracted-text
distribution format: a WARC container whose ``conversion`` records carry
the page's plain text as the record body (one record per page, no HTTP
block).  The natural ingest format for a TEXT dedup pipeline that wants
to skip html extraction entirely.

Same container machinery as sources/warc.py (``_split_records`` handles
plain and multi-member-gzip bytes); only the record filter and row shape
differ — conversion records instead of response/revisit, and the body IS
the document text (UTF-8, replacement on invalid bytes) instead of an
HTTP response to header-parse.  Reference analog: the WarcIterator
family's pluggable-record contract (WarcFileIterator.java:62-104); WET
is the text-side sibling of the capture-side WARC reader.
"""

from __future__ import annotations

import gzip
import os
import re
import uuid

import pyarrow as pa

from deduplicator_ray.functions.timestamps import iso_to_datetime
from deduplicator_ray.sources.warc import _split_records

WET_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("text", pa.string()),
    ("content_length", pa.int64()),
    ("record_id", pa.string()),
    ("source_path", pa.string()),
])

_WET_FILE_RE = re.compile(r".*\.wet(\.gz)?$")  # covers .warc.wet(.gz) too


def parse_wet_bytes(data: bytes, *, source_path: str = "") -> pa.Table:
    """One WET file's bytes (plain or gzip, multi-member) -> Arrow table
    of (url, warc_ts, text, content_length, record_id, source_path).
    Only ``conversion`` records with an http(s) target URI produce rows
    (warcinfo headers and any other record types are skipped)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    for headers, body in _split_records(data):
        if headers.get("warc-type", "") != "conversion":
            continue
        url = headers.get("warc-target-uri")
        if url is None or not url.startswith("http"):
            continue
        rows.append({
            "url": url,
            "warc_ts": iso_to_datetime(headers.get("warc-date")),
            "text": body.decode("utf-8", "replace"),
            "content_length": len(body),
            "record_id": headers.get("warc-record-id"),
            "source_path": source_path,
        })
    cols = {
        f.name: pa.array([r[f.name] for r in rows], type=f.type)
        for f in WET_SCHEMA
    }
    return pa.table(cols)


def wet_paths(source: str) -> list[str]:
    """Directory -> sorted recursive ``*.wet`` / ``*.wet.gz`` /
    ``*.warc.wet(.gz)`` list; a file path passes through unchanged."""
    from deduplicator_ray.sources.warc import family_paths

    return family_paths(source, _WET_FILE_RE)


def read_wet(source: str | list[str]):
    """WET file / directory / path list -> Dataset of text rows.  One
    file per read task (a decompressed WET member bounds task memory);
    unlike read_warc the rows DO carry the payload — the text is the
    point."""
    from deduplicator_ray.sources.warc import read_container_family

    return read_container_family(source, _WET_FILE_RE, parse_wet_bytes)


def write_wet(path: str, records: list[dict],
              *, compress: bool | None = None) -> str:
    """Deterministic WET writer (fixtures + round-trip tests).  Each
    record dict: url, date (iso8601), text; plus an optional ``type`` to
    plant non-conversion records the reader must skip."""
    blocks: list[bytes] = []
    for i, r in enumerate(records):
        body = r.get("text", "").encode("utf-8")
        rtype = r.get("type", "conversion")
        headers = [
            "WARC/1.0",
            f"WARC-Type: {rtype}",
            f"WARC-Target-URI: {r['url']}",
            f"WARC-Date: {r['date']}",
            f"WARC-Record-ID: <urn:uuid:wet-{i}>",
            "Content-Type: text/plain",
            f"Content-Length: {len(body)}",
        ]
        blocks.append("\r\n".join(headers).encode("latin-1")
                      + b"\r\n\r\n" + body + b"\r\n\r\n")
    data = b"".join(blocks)
    if compress is None:
        compress = path.endswith(".gz")
    if compress:
        # mtime pinned -> byte-identical output for identical input
        data = gzip.compress(data, mtime=0)
    # atomic publish (same contract as write_warc)
    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path
