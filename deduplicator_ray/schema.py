"""Arrow schemas for every table the engine reads or writes.

Data model mapping (SURVEY.md §1.3):
- ``CORPUS``       — the crawl capture stream (input_hint shape); one row
  per capture, the Ray analogue of the reference's ``CrawlDataItem``
  (CrawlDataItem.java:26-39).
- ``INDEX_TABLE``  — the persisted dedup-index rows; the Lucene index
  fields of IndexFields.java:22-40 as Arrow columns
  (IndexBuilder.java:188-226 builds the same six fields).
- ``MATCHES``      — the crawl-side output: the reference's crawl.log
  annotations + revisit profile (DeDuplicator.java:180-188,
  DeDuplicatorConstants.java:20-25) as real columns.
- ``CLUSTERS``     — near-dup extension output (north_rule).
"""

from __future__ import annotations

import pyarrow as pa

TS = pa.timestamp("us")  # UTC-naive like DuckDB / parquet defaults

CORPUS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", TS),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

# Mirror of IndexFields.java:22-40 (URL, DIGEST, DATE, ETAG,
# URL_CANONICALIZED, ORIGINAL_RECORD_ID).
INDEX_TABLE = pa.schema(
    [
        ("url", pa.string()),
        ("url_canonical", pa.string()),
        ("digest", pa.string()),
        ("date", TS),
        ("etag", pa.string()),
        ("original_record_id", pa.string()),
    ]
)

# Output of the match stage: one row per current capture, annotated.
# match_tier values follow DeDuplicator.java:194-205's post-hoc tiering:
# exact_url > canonical_url > digest; 'none' for novel captures.
MATCHES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", TS),
        ("digest", pa.string()),
        ("is_duplicate", pa.bool_()),
        ("match_tier", pa.string()),
        ("refers_to_url", pa.string()),
        ("refers_to_date", TS),
        ("refers_to_record_id", pa.string()),
        ("content_bytes", pa.int64()),
    ]
)

CLUSTERS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", TS),
        ("cluster_id", pa.int64()),
    ]
)

MATCH_TIER_EXACT_URL = "exact_url"
MATCH_TIER_CANONICAL = "canonical_url"
MATCH_TIER_DIGEST = "digest"
MATCH_TIER_NONE = "none"
