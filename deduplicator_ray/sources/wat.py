"""WAT source — Common Crawl's web-metadata distribution format: a WARC
container whose ``metadata`` records carry a JSON envelope per page
(headers, HTML metadata, outlinks).  The outlink lists are how the
public Common Crawl host/domain graphs are built, so this source feeds
the engine's link-graph family (stages/graph.py) WITHOUT html parsing:
``read_wat`` emits one row per outlink, ready for ``edge_aggregate``.

Same container machinery as sources/warc.py (``_split_records``); the
JSON envelope is parsed per record — that parse IS the format's work
(mirrors the per-line parse of sources/crawl_log.py).  Envelope paths
follow the public WAT layout:
Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Links.
"""

from __future__ import annotations

import gzip
import json
import re

import pyarrow as pa

from deduplicator_ray.functions.timestamps import iso_to_datetime
from deduplicator_ray.sources.warc import _split_records

WAT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("dst_url", pa.string()),
    ("record_id", pa.string()),
    ("source_path", pa.string()),
])

_WAT_FILE_RE = re.compile(r".*\.wat(\.gz)?$")  # covers .warc.wat(.gz) too


def _envelope_links(env: dict) -> list[str]:
    """Outlink urls from a WAT JSON envelope; absent levels -> []."""
    try:
        links = (env["Envelope"]["Payload-Metadata"]
                 ["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"])
    except (KeyError, TypeError):
        return []
    out = []
    for entry in links:
        u = entry.get("url") if isinstance(entry, dict) else None
        if u:
            out.append(u)
    return out


def parse_wat_bytes(data: bytes, *, source_path: str = "") -> pa.Table:
    """One WAT file's bytes (plain or gzip, multi-member) -> Arrow table
    of (url, warc_ts, dst_url, record_id, source_path): one row per
    outlink.  Only ``metadata`` records with an http(s) target URI and a
    parseable JSON body produce rows; pages with no outlinks produce
    none (the link-graph consumer wants edges, not pages)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    for headers, body in _split_records(data):
        if headers.get("warc-type", "") != "metadata":
            continue
        url = headers.get("warc-target-uri")
        if url is None or not url.startswith("http"):
            continue
        try:
            env = json.loads(body)
        except ValueError:
            continue  # malformed envelope: skip record, not the file
        ts = iso_to_datetime(headers.get("warc-date"))
        rid = headers.get("warc-record-id")
        for dst in _envelope_links(env):
            rows.append({"url": url, "warc_ts": ts, "dst_url": dst,
                         "record_id": rid, "source_path": source_path})
    cols = {
        f.name: pa.array([r[f.name] for r in rows], type=f.type)
        for f in WAT_SCHEMA
    }
    return pa.table(cols)


def wat_paths(source: str) -> list[str]:
    from deduplicator_ray.sources.warc import family_paths

    return family_paths(source, _WAT_FILE_RE)


def read_wat(source: str | list[str]):
    """WAT file / directory / path list -> Dataset of outlink rows,
    one file per read task."""
    from deduplicator_ray.sources.warc import read_container_family

    return read_container_family(source, _WAT_FILE_RE, parse_wat_bytes)


def write_wat(path: str, records: list[dict],
              *, compress: bool | None = None) -> str:
    """Deterministic WAT writer (fixtures + round-trip tests).  Each
    record dict: url, date (iso8601), links (list of urls); optional
    ``type`` to plant non-metadata records, ``raw_body`` to plant a
    malformed envelope."""
    blocks: list[bytes] = []
    for i, r in enumerate(records):
        if "raw_body" in r:
            body = r["raw_body"]
        else:
            env = {"Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": r["url"], "WARC-Date": r["date"]},
                "Payload-Metadata": {"HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Links": [{"path": "A@/href", "url": u}
                                  for u in r.get("links", [])]}}},
            }}
            body = json.dumps(env, sort_keys=True).encode("utf-8")
        rtype = r.get("type", "metadata")
        headers = [
            "WARC/1.0",
            f"WARC-Type: {rtype}",
            f"WARC-Target-URI: {r['url']}",
            f"WARC-Date: {r['date']}",
            f"WARC-Record-ID: <urn:uuid:wat-{i}>",
            "Content-Type: application/json",
            f"Content-Length: {len(body)}",
        ]
        blocks.append("\r\n".join(headers).encode("latin-1")
                      + b"\r\n\r\n" + body + b"\r\n\r\n")
    data = b"".join(blocks)
    if compress is None:
        compress = path.endswith(".gz")
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return path
