"""WARC (ISO-28500) source — operators S2/S3 + M11/M12 (SURVEY.md §2.1).

Re-expresses the reference's ``WarcFileIterator`` (record-at-a-time pull,
WarcFileIterator.java:56-154) and ``WarcIterator`` (recursive dir scan +
sort, WarcIterator.java:51-73) as a pure-Python record parser driven by
``ray.data.read_binary_files`` + one ``map_batches`` — one WARC file per
task (the natural processing grain: crawl WARCs are written as ~1 GB
units and parsed sequentially).

Semantics mirrored from the reference:
- only ``response`` and ``revisit`` records produce rows; everything else
  is skipped (record-type switch, WarcFileIterator.java:86-98);
- records whose WARC-Target-URI is missing or doesn't start with "http"
  are skipped (:82-84);
- url / payload digest (scheme preserved) / timestamp / record id come
  from the WARC headers (:111-115);
- the HTTP block is parsed only when the first line ends with an EOL and
  starts with "HTTP" (:118-124, getEolCharsCount :182-192): status code
  plus the Content-Type and ETag headers, case-insensitive (:126-133);
- revisit records add WARC-Refers-To-Target-URI / WARC-Refers-To-Date /
  WARC-Profile and NULL the ETag unless the profile is the
  server-not-modified revisit profile (:141-154);
- directory sources are scanned recursively for ``*.warc`` / ``*.warc.gz``
  and processed in sorted-path order (WarcIterator.java:29,57-73).

``write_warc`` emits deterministic, spec-shaped WARC bytes for fixtures
and the oracle-checked round-trip query — the repo synthesises its own
WARC inputs (no external data).
"""

from __future__ import annotations

import gzip
import io
import os
import re
import uuid

import pyarrow as pa

from deduplicator_ray.functions.timestamps import iso_to_datetime

# WarcIterator.java:29 spells this "^.*\.warc(.gz)?$" with the gz dot
# UNescaped (so "x.warcagz" would match there) — we deliberately escape
# it; the reference's looser match is a latent bug, not a semantic.
WARC_FILE_REGEX = r"^.*\.warc(\.gz)?$"
_WARC_FILE_RE = re.compile(WARC_FILE_REGEX)

# WARCConstants.PROFILE_REVISIT_NOT_MODIFIED (warc 1.0); suffix-matched so
# warc 1.1 profile URIs behave identically
_NOT_MODIFIED_SUFFIX = "/revisit/server-not-modified"

RECORD_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("status", pa.int32()),
        ("mime", pa.string()),
        ("digest", pa.string()),
        ("etag", pa.string()),
        ("is_revisit", pa.bool_()),
        ("original_url", pa.string()),
        ("original_ts", pa.timestamp("us")),
        ("revisit_profile", pa.string()),
        ("record_id", pa.string()),
        ("content_length", pa.int64()),
        ("source_path", pa.string()),
    ]
)


def _split_records(data: bytes):
    """Raw (decompressed) WARC bytes -> (headers_dict, body_bytes) per
    record.  Headers are lowercased; malformed trailing bytes end the
    scan (mirrors the reference's tolerant skip-on-bad-record posture)."""
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos: pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data.startswith(b"WARC/", pos):
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            i = line.find(b":")
            if i <= 0:
                continue
            headers[line[:i].decode("latin-1").strip().lower()] = (
                line[i + 1:].decode("latin-1").strip()
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return
        body = data[head_end + 4: head_end + 4 + length]
        pos = head_end + 4 + length
        yield headers, body


def _parse_http(body: bytes) -> tuple[int | None, str | None, str | None]:
    """HTTP block -> (status, mime, etag); all None when the block is not
    an HTTP response (first line must END WITH an EOL and start with
    "HTTP" — WarcFileIterator.java:118-124)."""
    i = body.find(b"\n")
    if i < 0:
        return None, None, None  # no EOL -> eolCharCount == 0 -> skip
    status_line = body[:i].rstrip(b"\r").decode("latin-1", "replace")
    if not status_line.startswith("HTTP"):
        return None, None, None
    parts = status_line.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, None
    mime = etag = None
    head_end = body.find(b"\r\n\r\n", i)
    head = body[i + 1: head_end if head_end >= 0 else len(body)]
    for line in head.split(b"\n"):
        line = line.rstrip(b"\r")
        j = line.find(b":")
        if j <= 0:
            continue
        name = line[:j].decode("latin-1").strip().lower()
        if name == "content-type":
            mime = line[j + 1:].decode("latin-1").strip()
        elif name == "etag":
            etag = line[j + 1:].decode("latin-1").strip()
    return status, mime, etag


def parse_warc_bytes(data: bytes, *, source_path: str = "") -> pa.Table:
    """One WARC file's bytes (plain or gzip, multi-member) -> Arrow table
    of CrawlDataItem-shaped rows (RECORD_SCHEMA)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    for headers, body in _split_records(data):
        url = headers.get("warc-target-uri")
        if url is None or not url.startswith("http"):
            continue
        rtype = headers.get("warc-type", "")
        if rtype not in ("response", "revisit"):
            continue
        status, mime, etag = _parse_http(body)
        row = {
            "url": url,
            "warc_ts": iso_to_datetime(headers.get("warc-date")),
            "status": 0 if status is None else status,  # CrawlDataItem default
            "mime": mime,
            "digest": headers.get("warc-payload-digest"),  # scheme preserved
            "etag": etag,
            "is_revisit": rtype == "revisit",
            "original_url": None,
            "original_ts": None,
            "revisit_profile": None,
            "record_id": headers.get("warc-record-id"),
            "content_length": len(body),
            "source_path": source_path,
        }
        if rtype == "revisit":
            row["original_url"] = headers.get("warc-refers-to-target-uri")
            row["original_ts"] = iso_to_datetime(headers.get("warc-refers-to-date"))
            profile = headers.get("warc-profile")
            row["revisit_profile"] = profile
            if not (profile or "").endswith(_NOT_MODIFIED_SUFFIX):
                # ETags are of questionable value here (:146-149)
                row["etag"] = None
        rows.append(row)
    cols = {
        f.name: pa.array([r[f.name] for r in rows], type=f.type) for f in RECORD_SCHEMA
    }
    return pa.table(cols)


def family_paths(source: str, file_re) -> list[str]:
    """Directory -> sorted recursive list of files matching ``file_re``
    (WarcIterator.initialize's scan rule); a file path passes through
    unchanged.  Shared by the WARC/WET/WAT container family."""
    if os.path.isfile(source):
        return [source]
    if not os.path.isdir(source):
        raise ValueError(f"{source} is not a valid directory")
    out: list[str] = []
    for root, _dirs, files in os.walk(source):
        for f in files:
            if file_re.match(f):
                out.append(os.path.join(root, f))
    return sorted(out)


def read_container_family(source: str | list[str], file_re, parse_fn):
    """Shared reader scaffold for the WARC container family (WARC / WET
    / WAT): resolve paths, ONE file per read task (a decompressed member
    bounds task memory), per-file ``parse_fn(bytes, source_path=...)``,
    empty-batch schema fallback via ``parse_fn(b"")``."""
    import ray.data as rd

    if isinstance(source, str):
        paths = family_paths(source, file_re)
    else:
        paths = [p for s in source for p in family_paths(s, file_re)]

    ds = rd.read_binary_files(paths, include_paths=True)

    def f(b: pa.Table) -> pa.Table:
        tables = [
            parse_fn(data, source_path=path)
            for data, path in zip(b["bytes"].to_pylist(),
                                  b["path"].to_pylist())
        ]
        if not tables:
            return parse_fn(b"")
        return pa.concat_tables(tables)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def warc_paths(source: str) -> list[str]:
    """Directory -> sorted recursive ``*.warc`` / ``*.warc.gz`` list
    (WarcIterator.initialize); a file path passes through unchanged."""
    return family_paths(source, _WARC_FILE_RE)


def read_warc(source: str | list[str]):
    """WARC file / directory / path list -> Dataset of CrawlDataItem rows.

    One file per read task; the parse is a streaming single pass, and the
    output rows carry no payload bytes (the indexer consumes only
    metadata — IndexBuilder.java:124-241), so memory per task is bounded
    by one decompressed WARC."""
    return read_container_family(source, _WARC_FILE_RE, parse_warc_bytes)


# ---------------------------------------------------------------------------
# deterministic WARC writer (fixtures + synthetic round-trip corpus)
# ---------------------------------------------------------------------------


def write_warc(path: str, records: list[dict], *, compress: bool | None = None) -> str:
    """Write spec-shaped WARC/1.0 bytes. Each record dict:
    type ('response'|'revisit'|other), url, date (iso8601), digest,
    record_id, and optionally http_status/mime/etag/payload (bytes),
    refers_to_url/refers_to_date/profile.  Deterministic for fixed input."""
    if compress is None:
        compress = path.endswith(".gz")
    buf = io.BytesIO()
    for r in records:
        body = b""
        if r.get("http_status") is not None:
            head = [f"HTTP/1.1 {r['http_status']} OK"]
            if r.get("mime"):
                head.append(f"Content-Type: {r['mime']}")
            if r.get("etag"):
                head.append(f"ETag: {r['etag']}")
            body = ("\r\n".join(head) + "\r\n\r\n").encode("latin-1") + r.get("payload", b"")
        elif r.get("payload"):
            body = r["payload"]
        headers = [
            "WARC/1.0",
            f"WARC-Type: {r['type']}",
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}",
            f"WARC-Date: {r['date']}",
        ]
        if r.get("url"):
            headers.append(f"WARC-Target-URI: {r['url']}")
        if r.get("digest"):
            headers.append(f"WARC-Payload-Digest: {r['digest']}")
        if r["type"] == "revisit":
            if r.get("refers_to_url"):
                headers.append(f"WARC-Refers-To-Target-URI: {r['refers_to_url']}")
            if r.get("refers_to_date"):
                headers.append(f"WARC-Refers-To-Date: {r['refers_to_date']}")
            if r.get("profile"):
                headers.append(f"WARC-Profile: {r['profile']}")
        headers.append(f"Content-Length: {len(body)}")
        buf.write(("\r\n".join(headers) + "\r\n\r\n").encode("latin-1"))
        buf.write(body)
        buf.write(b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        # mtime pinned -> byte-identical output for identical input
        data = gzip.compress(data, mtime=0)
    # atomic publish: concurrent writers/readers of the same fixture path
    # (parallel pytest, driver gate) must never observe a truncated file
    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def write_revisit_warc(matches, path: str, *,
                       profile: str = ("http://netpreserve.org/warc/1.0/"
                                       "revisit/identical-payload-digest")):
    """The reference's crawl-time OUTPUT, batch form: for every
    duplicate row of a match table (stages/exact.match_shuffle —
    is_duplicate with refers_to_url/refers_to_date), write a WARC
    *revisit* record pointing at the original instead of storing the
    payload again (DeDuplicator.java's processor verdict; the
    identical-payload-digest profile of sources/warc.py's reader).

    ``matches`` is a Dataset or pandas/Arrow table; rows with
    ``is_duplicate == false`` are skipped.  Records are sorted by
    (warc_ts/ts, url) so the file is deterministic.  Returns the path
    and the record count as a (path, n) tuple.
    """
    import pandas as pd

    if hasattr(matches, "to_pandas"):
        df = matches.to_pandas()
    else:
        df = pd.DataFrame(matches)
    df = df[df["is_duplicate"].astype(bool)].copy()
    ts_col = "warc_ts" if "warc_ts" in df.columns else "ts"
    ts = pd.to_datetime(df[ts_col])
    ref_ts = pd.to_datetime(df["refers_to_date"])
    df["iso"] = ts.dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    df["ref_iso"] = ref_ts.dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    df = df.sort_values(["iso", "url"], kind="mergesort")
    records = [
        {
            "type": "revisit",
            "url": url,
            "date": iso,
            "digest": digest if ":" in str(digest) else f"md5:{digest}",
            "record_id": f"<urn:dedup:{i}>",
            "refers_to_url": ref_url,
            "refers_to_date": ref_iso,
            "profile": profile,
            "payload": b"",
        }
        for i, (url, iso, digest, ref_url, ref_iso) in enumerate(
            zip(df["url"], df["iso"], df["digest"],
                df["refers_to_url"], df["ref_iso"]))
    ]
    write_warc(path, records)
    return path, len(records)
