"""Timestamp conversions (operator M8) and report formatting helpers
(operator M13 / §2.8 scalar functions).

The reference converts Heritrix 17-digit timestamps ``yyyyMMddHHmmssSSS``
(with an optional ``+duration`` suffix) to w3c-iso8601
``yyyy-MM-dd'T'HH:mm:ss'Z'`` at crawl-log parse time
(CrawlLogIterator.java:182-189) and formats WARC dates with the same
pattern (IndexBuilder.java:52, CrawlDataItem.java:82-88).
"""

from __future__ import annotations

import datetime as _dt

W3C_FORMAT = "%Y-%m-%dT%H:%M:%SZ"


def heritrix17_to_iso(ts: str | None) -> str | None:
    """``20130522141637177+564`` -> ``2013-05-22T14:16:37Z``.

    Mirrors CrawlLogIterator.java:182-189: strip the ``+duration`` suffix,
    keep second precision, emit w3c-iso8601 Zulu.  Returns None on
    malformed input (reference throws; our parser drops the line and
    counts it, see sources/crawl_log.py).
    """
    if ts is None:
        return None
    s = ts.split("+", 1)[0]
    if len(s) < 14 or not s[:14].isdigit():
        return None
    try:
        d = _dt.datetime.strptime(s[:14], "%Y%m%d%H%M%S")
    except ValueError:
        return None
    return d.strftime(W3C_FORMAT)


def iso_to_datetime(iso: str | None) -> _dt.datetime | None:
    """w3c-iso8601 Zulu string -> naive UTC datetime (Arrow timestamp[us])."""
    if iso is None:
        return None
    try:
        return _dt.datetime.strptime(iso, W3C_FORMAT)
    except ValueError:
        return None


def get_percentage(portion: float, total: float) -> str:
    """``getPercentage(5, 200) == "2.5%"`` — DeDuplicator.java:249-253
    (one decimal, truncating-free float formatting like Java's)."""
    if total == 0:
        return "0.0%"
    pct = portion * 100.0 / total
    return f"{pct:.1f}%"


def format_bytes(n: int) -> str:
    """Human-readable byte count for the report (stand-in for
    ``ArchiveUtils.formatBytesForDisplay``, DeDuplicator.java:218-234)."""
    v = float(n)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB", "PiB"):
        if v < 1024 or unit == "PiB":
            return f"{v:.1f} {unit}" if unit != "B" else f"{int(v)} B"
        v /= 1024.0
    return f"{v:.1f} PiB"
