"""Heritrix crawl.log source (operator S4, SURVEY.md §2.1).

Re-expresses the reference's ``CrawlLogIterator`` (record-at-a-time pull
iterator, CrawlLogIterator.java:135-228) as ``ray.data.read_text`` + one
vectorized ``map_batches`` parser.  Field semantics follow the reference
exactly:

- line must be > 42 chars; whitespace-split, limit 13 parts; < 10 parts
  -> dropped (:152-155);
- idx 1 status (must be > 0, :160-164), idx 3 url, idx 6 mime,
  idx 8 17-digit fetch-begin timestamp + '+duration' -> w3c-iso8601
  (:182-189), idx 9 digest (scheme preserved, :192), idx 11 annotations
  matched against the revisit regex (default
  '^.*Revisit:IdenticalPayloadDigest.*$', :51-53, overridable like the
  ``deduplicator.crawllogiterator.revisit-annotation-regex`` property),
- idx 12 JSON extra-info with RevisitProfile / RevisitRefersToURI /
  RevisitRefersToDate (:207-212, DeDuplicatorConstants.java:23-25).

Malformed lines are counted per batch into the ``parse_dropped`` metric
column convention instead of a log line (the indexer's "skipped" counter,
IndexBuilder.java:131).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from deduplicator_ray.functions.timestamps import heritrix17_to_iso, iso_to_datetime

REVISIT_ANNOTATION_MARKER = "Revisit:IdenticalPayloadDigest"
DEFAULT_REVISIT_REGEX = f"^.*{REVISIT_ANNOTATION_MARKER}.*$"

EXTRA_REVISIT_PROFILE = "RevisitProfile"
EXTRA_REVISIT_URI = "RevisitRefersToURI"
EXTRA_REVISIT_DATE = "RevisitRefersToDate"

_SPLIT = re.compile(r"\s+")


def parse_line(line: str, revisit_re: re.Pattern[str]) -> dict | None:
    """One crawl.log line -> record dict, or None if unusable."""
    if line is None or len(line) <= 42:
        return None
    parts = _SPLIT.split(line, maxsplit=12)
    if len(parts) < 10:
        return None
    try:
        status = int(parts[1])
    except ValueError:
        return None
    if status <= 0:
        return None
    iso = heritrix17_to_iso(parts[8])
    if iso is None:
        return None
    revisit = bool(revisit_re.match(parts[11])) if len(parts) > 11 else False
    original_url = original_ts = revisit_profile = None
    if revisit and len(parts) == 13:
        try:
            extra = json.loads(parts[12])
            original_url = extra.get(EXTRA_REVISIT_URI)
            original_ts = extra.get(EXTRA_REVISIT_DATE)
            revisit_profile = extra.get(EXTRA_REVISIT_PROFILE)
        except json.JSONDecodeError:
            pass
    return {
        "url": parts[3],
        "warc_ts": iso_to_datetime(iso),
        "status": status,
        "mime": parts[6],
        "digest": parts[9],
        "is_revisit": revisit,
        "original_url": original_url,
        "original_ts": iso_to_datetime(original_ts) if original_ts else None,
        "revisit_profile": revisit_profile,
    }


_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("status", pa.int32()),
        ("mime", pa.string()),
        ("digest", pa.string()),
        ("is_revisit", pa.bool_()),
        ("original_url", pa.string()),
        ("original_ts", pa.timestamp("us")),
        ("revisit_profile", pa.string()),
        ("parse_dropped", pa.int64()),
    ]
)


def parse_batch(lines: list[str], revisit_regex: str = DEFAULT_REVISIT_REGEX) -> pa.Table:
    rx = re.compile(revisit_regex)
    rows = []
    dropped = 0
    for ln in lines:
        r = parse_line(ln, rx)
        if r is None:
            dropped += 1
        else:
            rows.append(r)
    cols = {f.name: [] for f in _SCHEMA if f.name != "parse_dropped"}
    for r in rows:
        for k in cols:
            cols[k].append(r[k])
    arrays = {
        k: pa.array(v, type=_SCHEMA.field(k).type) for k, v in cols.items()
    }
    # parse_dropped: per-batch partial count on the first row convention —
    # summed downstream with a native aggregate
    n = len(rows)
    arrays["parse_dropped"] = pa.array(
        [dropped] + [0] * (n - 1) if n else [], type=pa.int64()
    )
    if n == 0:
        if dropped == 0:
            return pa.table(
                {k: pa.array([], type=_SCHEMA.field(k).type) for k in _SCHEMA.names}
            )
        # every line in the batch was malformed: keep the skipped-lines
        # metric by emitting ONE metrics-only row (all record fields null,
        # status 0 so record consumers' status>0 filter drops it)
        return pa.table(
            {
                k: pa.array(
                    [dropped] if k == "parse_dropped"
                    else [0] if k == "status"
                    else [None],
                    type=_SCHEMA.field(k).type,
                )
                for k in _SCHEMA.names
            }
        )
    return pa.table(arrays)


def read_crawl_log(paths, *, revisit_regex: str = DEFAULT_REVISIT_REGEX, batch_size: int = 8192):
    """crawl.log file(s) -> Dataset of CrawlDataItem-shaped records."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def f(b: pa.Table) -> pa.Table:
        return parse_batch(b["text"].to_pylist(), revisit_regex)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
