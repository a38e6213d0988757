"""Sources: corpus generation/derivation, WARC parsing and crawl.log
parsing.

The reference's pluggable ``CrawlDataIterator`` sources
(CrawlDataIterator.java:27-67, reflective class loading in
IndexingLauncher.java:137) map to REGISTERED callables
``f(source_path) -> ray.data.Dataset`` with the corpus schema; see
SURVEY.md §2.1 / §2.10.  ``register_source`` is the extension point a
user of the reference's ``--iterator`` flag would reach for.
"""

from __future__ import annotations

from collections.abc import Callable


def _parquet_source(path: str):
    import ray.data as rd

    return rd.read_parquet(path)


def _warc_source(path: str):
    from deduplicator_ray.sources.warc import read_warc

    return read_warc(path)


def _crawl_log_source(path: str):
    from deduplicator_ray.sources.crawl_log import read_crawl_log

    return read_crawl_log(path)


def _jsonl_source(path: str):
    """JSON-lines corpus (the common interchange format for web-text
    dumps): one JSON object per line with the corpus columns (url,
    warc_ts, text, ...).  ``read_json`` handles .jsonl/.json and gzip
    transparently and streams per-file like the other sources; timestamp
    strings are normalized to Arrow timestamps when present."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_json(path, file_extensions=["jsonl", "json", "gz"])

    def norm(b: pa.Table) -> pa.Table:
        if "warc_ts" not in b.column_names:
            return b
        t = b.schema.field("warc_ts").type
        us = pa.timestamp("us", tz=getattr(t, "tz", None))
        if pa.types.is_timestamp(t) and t != us:
            # Arrow's JSON reader infers ISO-Z strings as timestamp[s];
            # every other source carries timestamp[us] — normalize so
            # url|warc_ts doc keys hash identically across formats
            b = b.set_column(b.column_names.index("warc_ts"), "warc_ts",
                             b["warc_ts"].cast(us))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            # strings reach here when inference bailed (fractional
            # seconds, mixed values).  Arrow refuses to cast a
            # zone-suffixed string to a NAIVE timestamp, so try naive
            # first (plain ISO) and fall back to tz-aware for the
            # Z/offset family; epoch-micros are identical either way.
            try:
                ts = b["warc_ts"].cast(pa.timestamp("us"))
            except pa.ArrowInvalid:
                ts = b["warc_ts"].cast(pa.timestamp("us", tz="UTC"))
            b = b.set_column(b.column_names.index("warc_ts"), "warc_ts", ts)
        return b

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def _csv_source(path: str):
    """CSV corpus with a header row.  Same warc_ts normalization need as
    jsonl: Arrow's CSV reader infers ISO strings as timestamp[s] (or
    leaves them strings when inference bails) while every other source
    carries timestamp[us]."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_csv(path, file_extensions=["csv", "gz"])

    def norm(b: pa.Table) -> pa.Table:
        if "warc_ts" not in b.column_names:
            return b
        t = b.schema.field("warc_ts").type
        us = pa.timestamp("us", tz=getattr(t, "tz", None))
        if pa.types.is_timestamp(t) and t != us:
            b = b.set_column(b.column_names.index("warc_ts"), "warc_ts",
                             b["warc_ts"].cast(us))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            try:
                ts = b["warc_ts"].cast(pa.timestamp("us"))
            except pa.ArrowInvalid:
                ts = b["warc_ts"].cast(pa.timestamp("us", tz="UTC"))
            b = b.set_column(b.column_names.index("warc_ts"), "warc_ts", ts)
        return b

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def _wet_source(path: str):
    from deduplicator_ray.sources.wet import read_wet

    return read_wet(path)


def _wat_source(path: str):
    from deduplicator_ray.sources.wat import read_wat

    return read_wat(path)


def _cdx_source(path: str):
    from deduplicator_ray.sources.cdx import read_cdx

    return read_cdx(path)


def _arc_source(path: str):
    from deduplicator_ray.sources.arc import read_arc

    return read_arc(path)


_SOURCES: dict[str, Callable] = {
    "parquet": _parquet_source,
    "warc": _warc_source,        # WarcIterator / WarcFileIterator
    "crawl_log": _crawl_log_source,  # CrawlLogIterator
    "jsonl": _jsonl_source,      # JSON-lines web-text dumps
    "csv": _csv_source,          # header CSV dumps
    "cdx": _cdx_source,          # classic CDX-11 capture indexes
    "wet": _wet_source,          # Common Crawl extracted-text WET
    "wat": _wat_source,          # Common Crawl web-metadata WAT (outlinks)
    "arc": _arc_source,          # legacy Internet Archive ARC v1/v2
}


def register_source(name: str, fn: Callable) -> None:
    """Register a corpus source: ``fn(path) -> ray.data.Dataset``."""
    _SOURCES[name] = fn


def get_source(name: str) -> Callable:
    try:
        return _SOURCES[name]
    except KeyError:
        raise ValueError(
            f"unknown source {name!r}; registered: {sorted(_SOURCES)}"
        ) from None
