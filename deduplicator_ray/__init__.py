"""deduplicator_ray — a Ray-Data-native web-scale dedup + clustering engine.

A from-scratch reimplementation of the *semantics* of the Heritrix 3
DeDuplicator (Landsbokasafn/deduplicator) as idiomatic Ray Data pipelines
over Parquet tables of Common-Crawl-style web pages:

    (url: string, warc_ts: timestamp[us, UTC], html: binary,
     text: large_string, lang: string)

The reference's Lucene-index lookups become groupby-aggregate shuffles /
broadcast joins; its record-at-a-time iterators become ``map_batches`` over
zero-copy Arrow batches; its stateful searcher becomes either data (shuffle
mode) or a sharded actor index (incremental mode).  On top of the
reference's exact digest-match strategies the engine adds near-duplicate
clustering (MinHash/LSH, SimHash, n-gram Jaccard, embedding cosine),
connected components, suffix-array longest-duplicate-substring detection,
text analysis, similarity search, and multimodal column plumbing.

IMPORTANT: nothing in this package calls ``ray.init`` / ``ray.shutdown``;
sessions are owned by the caller (driver, tests' conftest, bench.py).
"""

__version__ = "0.1.0"
