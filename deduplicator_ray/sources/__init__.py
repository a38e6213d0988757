"""Sources: corpus generation/derivation and crawl.log parsing.

The reference's pluggable ``CrawlDataIterator`` sources
(CrawlDataIterator.java:27-67, WarcIterator, CrawlLogIterator) map to
callables returning a ``ray.data.Dataset`` with the corpus schema; see
SURVEY.md §2.1 / §2.10.
"""
