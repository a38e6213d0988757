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


def _mixed_source(path: str):
    """Mixed-container directory — ARC + WARC + WET side by side, the
    realistic shape of a decades-spanning web archive (ARC predates
    WARC; WET extracts ride along in Common Crawl drops).  Every archive
    file dispatches to its format reader by the family extension rules
    (``*.arc(.gz)`` / ``*.warc(.gz)`` / ``*.wet(.gz)``, disjoint by
    construction), each family conforms to ONE superset record schema
    (WARC's RECORD_SCHEMA + ``text``), and the families union into a
    single Dataset — so one ``dedup_pipeline --build-index`` run indexes
    a mixed archive directly.

    Conform rules: container records (ARC/WARC) gain ``text = null``
    (they are metadata rows; payloads never ride the pipeline).  WET
    rows are extracted text without HTTP envelope: they gain
    ``status=200`` / ``mime='text/plain'`` (a WET conversion record
    exists only for a successful text capture), null revisit fields, and
    — because WET carries no payload digest — the md5-of-text digest
    computed AT PARSE TIME with the same kernel the text pipelines use,
    keeping wet-in-mixed rows byte-identical to a wet-only run under
    ``digest_mode='md5_text'`` (normalize leaves existing digest
    columns untouched)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.functions.digesting import md5_hex_many
    from deduplicator_ray.sources.arc import _ARC_FILE_RE, read_arc
    from deduplicator_ray.sources.warc import (
        _WARC_FILE_RE,
        RECORD_SCHEMA,
        family_paths,
        read_warc,
    )
    from deduplicator_ray.sources.wet import _WET_FILE_RE, read_wet

    import os

    mixed_fields = (list(RECORD_SCHEMA)
                    + [pa.field("text", pa.large_string()),
                       pa.field("content_bytes", pa.int64())])
    names = [f.name for f in mixed_fields]
    types = {f.name: f.type for f in mixed_fields}

    # content_bytes is pre-computed HERE for both families (container:
    # the record's content_length; wet: utf-8 byte length of the text,
    # what normalize computes for a text corpus) because the superset
    # schema carries a text column that is null for container rows —
    # normalize's own fallback order (html -> text -> content_length)
    # would see that null text first and emit null byte counts,
    # silently zeroing the per-tier byte aggregates of a mixed run.

    def conform_container(b: pa.Table) -> pa.Table:
        out = {n: b[n] if n in b.column_names
               else pa.nulls(b.num_rows, types[n]) for n in names}
        out["content_bytes"] = b["content_length"].cast(pa.int64())
        return pa.table(out)

    def conform_wet(b: pa.Table) -> pa.Table:
        n_rows = b.num_rows
        texts = b["text"].to_pylist()
        text_large = b["text"].cast(pa.large_string())
        import pyarrow.compute as pc

        cols = {
            "url": b["url"],
            "warc_ts": b["warc_ts"],
            "status": pa.array(np.full(n_rows, 200, dtype=np.int32)),
            "mime": pa.array(["text/plain"] * n_rows, pa.string()),
            "digest": pa.array(md5_hex_many(texts), pa.string()),
            "etag": pa.nulls(n_rows, pa.string()),
            "is_revisit": pa.array(np.zeros(n_rows, dtype=bool)),
            "original_url": pa.nulls(n_rows, pa.string()),
            "original_ts": pa.nulls(n_rows, pa.timestamp("us")),
            "revisit_profile": pa.nulls(n_rows, pa.string()),
            "record_id": b["record_id"],
            "content_length": b["content_length"],
            "source_path": b["source_path"],
            "text": text_large,
            "content_bytes": pc.cast(pc.binary_length(
                pc.cast(text_large, pa.large_binary())), pa.int64()),
        }
        return pa.table({n: cols[n] for n in names})

    parts = []
    is_file = os.path.isfile(path)
    for file_re, reader, conform in (
        (_ARC_FILE_RE, read_arc, conform_container),
        (_WARC_FILE_RE, read_warc, conform_container),
        (_WET_FILE_RE, read_wet, conform_wet),
    ):
        if is_file:
            # family_paths passes a FILE path through without applying
            # the family regex (a single-format reader wants that); the
            # mixed dispatcher must re-assert the extension rule or one
            # file would feed ALL THREE parsers
            paths = [path] if file_re.match(os.path.basename(path)) else []
        else:
            paths = family_paths(path, file_re)
        if paths:
            parts.append(reader(paths).map_batches(
                conform, batch_format="pyarrow", zero_copy_batch=True))
    if not parts:
        return rd.from_arrow(pa.table(
            {n: pa.array([], type=types[n]) for n in names}))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


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
    "mixed": _mixed_source,      # ARC + WARC + WET in one directory
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
