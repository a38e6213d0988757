"""ARC (Internet Archive legacy container, v1/v2) source.

The reference's WARC handling (WarcFileIterator.java) postdates
Heritrix's original ARC output; web archives hold decades of ``.arc.gz``
that a dedup index must still ingest, so the container family grows the
legacy member.  Public spec: the Internet Archive "ARC file format"
document (v1 URL-record ``URL IP date mimetype length``; v2 adds
``result-code checksum location offset filename``; 14-digit archive
dates; the leading ``filedesc://`` version block; records separated by a
newline).

Semantics, mirroring the WARC source's contract (same RECORD_SCHEMA so
normalize/match consume either):
- the ``filedesc://`` version block is metadata, not a capture — skipped;
- only records whose URL starts with "http" produce rows (the reference's
  http filter, WarcFileIterator.java:82-84);
- v2 ``result-code``/``checksum`` populate status/digest directly
  (checksum carried bare, no scheme — exactly as ARC writers emit it);
  '-' or v1 fall back to parsing the embedded HTTP block (shared
  ``_parse_http``) and digesting the HTTP body (sha1:BASE32, the
  engine-native scheme);
- ARC has no revisit concept: ``is_revisit`` is always false;
- ``record_id`` synthesizes ``arc:<offset>`` (v2) / ``arc:<ordinal>``
  (v1) — ARC records carry no ids;
- directories scan recursively for ``*.arc`` / ``*.arc.gz`` in sorted
  order; gzip (multi-member) handled transparently.

``write_arc`` emits deterministic spec-shaped ARC bytes for fixtures and
the oracle-checked ``arc_roundtrip`` query (no external data).
"""

from __future__ import annotations

import gzip
import os
import re
import uuid

import pyarrow as pa

from deduplicator_ray.functions.digesting import sha1_base32
from deduplicator_ray.sources.warc import (
    RECORD_SCHEMA,
    _parse_http,
    read_container_family,
)

ARC_FILE_REGEX = r"^.*\.arc(\.gz)?$"
_ARC_FILE_RE = re.compile(ARC_FILE_REGEX)


def _ts14(date14: str):
    """14-digit ARC archive date (YYYYMMDDHHMMSS) -> datetime (UTC)."""
    import datetime as dt

    try:
        return dt.datetime.strptime(date14, "%Y%m%d%H%M%S")
    except ValueError:
        return None


def _http_body(payload: bytes) -> bytes:
    """HTTP block -> body after the header/body separator (the whole
    payload when no separator: digest what was archived)."""
    i = payload.find(b"\r\n\r\n")
    if i >= 0:
        return payload[i + 4:]
    i = payload.find(b"\n\n")
    return payload[i + 2:] if i >= 0 else payload


def parse_arc_bytes(data: bytes, *, source_path: str = "") -> pa.Table:
    """One ARC file's bytes (plain or gzip) -> Arrow table of
    CrawlDataItem-shaped rows (the WARC source's RECORD_SCHEMA)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    pos = 0
    n = len(data)
    ordinal = 0
    while pos < n:
        # skip blank separator lines between records
        while pos < n and data[pos : pos + 1] == b"\n":
            pos += 1
        if pos >= n:
            break
        eol = data.find(b"\n", pos)
        if eol < 0:
            break
        header = data[pos:eol].decode("latin-1", "replace")
        fields = header.split(" ")
        # v1: url ip date mime length (5) / v2: + code checksum
        # location offset filename (10)
        if len(fields) not in (5, 10):
            break  # malformed header: stop (a torn file tail)
        try:
            length = int(fields[-1])
        except ValueError:
            break
        payload = data[eol + 1 : eol + 1 + length]
        pos = eol + 1 + length
        ordinal += 1

        url = fields[0]
        if url.startswith("filedesc://") or not url.startswith("http"):
            continue
        ts = _ts14(fields[2])
        mime = fields[3] if fields[3] != "-" else None
        status = digest = offset = None
        if len(fields) == 10:
            code, checksum, _location, offset, _fname = fields[4:9]
            if code not in ("", "-"):
                try:
                    status = int(code)
                except ValueError:
                    status = None
            if checksum not in ("", "-"):
                digest = checksum  # bare, as ARC writers emit it
        h_status, h_mime, etag = _parse_http(payload)
        if status is None:
            status = h_status
        if mime is None:
            mime = h_mime
        if digest is None:
            digest = sha1_base32(_http_body(payload), with_scheme=True)
        rows.append({
            "url": url,
            "warc_ts": ts,
            "status": 0 if status is None else status,
            "mime": mime,
            "digest": digest,
            "etag": etag,
            "is_revisit": False,
            "original_url": None,
            "original_ts": None,
            "revisit_profile": None,
            "record_id": f"arc:{offset}" if offset not in (None, "-")
                         else f"arc:{ordinal}",
            "content_length": length,
            "source_path": source_path,
        })
    cols = {
        f.name: pa.array([r[f.name] for r in rows], type=f.type)
        for f in RECORD_SCHEMA
    }
    return pa.table(cols)


def read_arc(source: str | list[str]):
    """ARC file / directory / path list -> Dataset of CrawlDataItem rows
    (one file per read task, the container-family scaffold)."""
    return read_container_family(source, _ARC_FILE_RE, parse_arc_bytes)


# ---------------------------------------------------------------------------
# deterministic ARC writer (fixtures + synthetic round-trip corpus)
# ---------------------------------------------------------------------------


def write_arc(path: str, records: list[dict], *, compress: bool | None = None,
              version: int = 2) -> str:
    """Write spec-shaped ARC bytes.  Each record dict:
    url, date14 (YYYYMMDDHHMMSS), mime, payload (bytes, usually a full
    HTTP block); v2 extras: status, checksum (bare digest or None).
    ``compress`` defaults to the path suffix."""
    if compress is None:
        compress = path.endswith(".gz")
    out = bytearray()

    def emit(header_fields: list[str], payload: bytes) -> None:
        out.extend(" ".join(header_fields).encode("latin-1"))
        out.extend(b"\n")
        out.extend(payload)
        out.extend(b"\n")

    vblock = (b"%d 0 InternetArchive\n"
              b"URL IP-address Archive-date Content-type Archive-length\n"
              % version)
    fd = f"filedesc://{path.rsplit('/', 1)[-1]}"
    if version == 1:
        emit([fd, "0.0.0.0", "20231114221320", "text/plain",
              str(len(vblock))], vblock)
    else:
        emit([fd, "0.0.0.0", "20231114221320", "text/plain", "200", "-",
              "-", "0", path.rsplit("/", 1)[-1], str(len(vblock))], vblock)
    offset = len(out)
    for r in records:
        payload = r.get("payload", b"")
        if version == 1:
            emit([r["url"], r.get("ip", "10.0.0.1"), r["date14"],
                  r.get("mime", "text/html"), str(len(payload))], payload)
        else:
            emit([r["url"], r.get("ip", "10.0.0.1"), r["date14"],
                  r.get("mime", "text/html"), str(r.get("status", 200)),
                  r.get("checksum") or "-", "-", str(offset),
                  path.rsplit("/", 1)[-1], str(len(payload))], payload)
        offset = len(out)
    blob = bytes(out)
    if compress:
        blob = gzip.compress(blob, mtime=0)
    # atomic publish (same contract as write_warc): concurrent
    # writers/readers of one fixture path must never see a truncation
    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path
