"""Normalization-stage tests (operators M1-M12, SURVEY.md §2.2): filter
semantics, digest/canonical column production, and empty-batch schema
consistency."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.normalize import _normalize_batch, normalize, skip_counters


def _mk(rows: dict) -> pa.Table:
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def test_status_filter_2xx():
    t = _mk({"url": ["a", "b", "c"], "status": [200, 404, 206],
             "text": ["x", "y", "z"]})
    out = _normalize_batch(t, PipelineConfig(), "md5_text")
    assert out["url"].to_pylist() == ["a", "c"]


def test_mime_blacklist_and_whitelist():
    t = _mk({"url": ["a", "b"], "mime": ["text/html", "image/png"],
             "text": ["x", "y"]})
    black = _normalize_batch(t, PipelineConfig(mime_filter="^image/.*"), "md5_text")
    assert black["url"].to_pylist() == ["a"]
    white = _normalize_batch(
        t, PipelineConfig(mime_filter="^image/.*", mime_whitelist=True), "md5_text"
    )
    assert white["url"].to_pylist() == ["b"]


def test_url_quote_sanity():
    t = _mk({"url": ['http://a/"x"', "http://b"], "text": ["x", "y"]})
    out = _normalize_batch(t, PipelineConfig(), "md5_text")
    assert out["url"].to_pylist() == ["http://b"]


def test_empty_batch_schema_matches_nonempty_path():
    """A batch emptied by filters must carry EXACTLY the columns the
    non-empty path would add under the same config/corpus shape."""
    cfg_no_canon = PipelineConfig(include_canonical=False)
    nonempty = _mk({"url": ["http://a"], "status": [200], "text": ["x"]})
    emptied = _mk({"url": ["http://a"], "status": [404], "text": ["x"]})
    s1 = _normalize_batch(nonempty, cfg_no_canon, "md5_text").schema
    s2 = _normalize_batch(emptied, cfg_no_canon, "md5_text").schema
    assert s1.names == s2.names

    # corpus with NO url column: url_canonical must not appear either way
    nonempty2 = _mk({"status": [200], "text": ["x"]})
    emptied2 = _mk({"status": [404], "text": ["x"]})
    cfg = PipelineConfig()
    s3 = _normalize_batch(nonempty2, cfg, "md5_text").schema
    s4 = _normalize_batch(emptied2, cfg, "md5_text").schema
    assert s3.names == s4.names
    assert "url_canonical" not in s4.names


def test_index_side_requires_exactly_200():
    """IndexBuilder.java:147-152: only statusCode == 200 is indexed; the
    crawl side accepts any 2xx (DeDuplicator.java:123-141)."""
    t = _mk({"url": ["a", "b"], "status": [200, 206], "text": ["x", "y"]})
    crawl = _normalize_batch(t, PipelineConfig(), "md5_text", side="crawl")
    index = _normalize_batch(t, PipelineConfig(), "md5_text", side="index")
    assert crawl["url"].to_pylist() == ["a", "b"]
    assert index["url"].to_pylist() == ["a"]


def test_206_matched_but_not_indexed(ray_session):
    """End-to-end pin: a 206 current capture still matches against the
    index, but a 206 history capture is never indexed."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import build_index, match_shuffle

    hist = pd.DataFrame(
        {"url": ["h1", "h2"], "status": [200, 206], "text": ["A", "B"],
         "warc_ts": pd.to_datetime([1, 2], unit="s")}
    )
    cur = pd.DataFrame(
        {"url": ["c1", "c2"], "status": [206, 206], "text": ["A", "B"],
         "warc_ts": pd.to_datetime([5, 6], unit="s")}
    )
    cfg = PipelineConfig()
    idx = build_index(
        normalize(rd.from_pandas(hist), cfg, digest_mode="md5_text", side="index"), cfg
    )
    assert idx.count() == 1  # only the 200 history row
    got = (
        match_shuffle(
            normalize(rd.from_pandas(cur), cfg, digest_mode="md5_text", side="crawl"),
            idx, cfg,
        )
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert got["url"].tolist() == ["c1", "c2"]
    assert got["is_duplicate"].tolist() == [True, False]


def test_skip_counters(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame(
        {
            "url": ["a", "b", 'bad"url', "c", "d"],
            "status": [200, 404, 200, 206, 200],
            "mime": ["text/html", "text/html", "text/html", "text/html", "image/png"],
            "text": ["1", "2", "3", "4", "5"],
            "is_revisit": [False, False, False, True, False],
            "original_url": [None] * 5,
            "original_ts": pd.Series([None] * 5, dtype="datetime64[us]"),
        }
    )
    cfg = PipelineConfig(mime_filter="^image/.*")  # blacklist images
    c = skip_counters(rd.from_pandas(pdf), cfg, side="crawl")
    assert c["status_skipped"] == 1       # 404
    assert c["mime_skipped"] == 1         # image/png (blacklist)
    assert c["url_skipped"] == 1          # quoted url
    assert c["unresolved_revisit"] == 1   # revisit without originals
    assert c["handled"] == 5
    c_idx = skip_counters(rd.from_pandas(pdf), cfg, side="index")
    assert c_idx["status_skipped"] == 2   # 404 + 206


def test_skip_counters_ignore_metrics_only_rows(ray_session):
    """The all-malformed crawl.log metrics row must feed parse_dropped —
    and must NOT count as a handled or status-skipped record."""
    import ray.data as rd

    from deduplicator_ray.sources.crawl_log import parse_batch

    t = parse_batch(["short", "bad"])  # 1 metrics-only row, 2 dropped lines
    c = skip_counters(rd.from_arrow(t), PipelineConfig(), side="crawl")
    assert c["parse_dropped"] == 2
    assert c["handled"] == 0
    assert c["status_skipped"] == 0


def test_actor_index_verbatim_scheme_mode(ray_session):
    """ShardedDigestIndex built with strip_digest_scheme=False stores
    digests verbatim, and the matcher follows the INDEX's convention —
    scheme-qualified lookups hit, bare ones miss."""
    import ray.data as rd

    from deduplicator_ray.state.index_actor import ShardedDigestIndex, match_actor_index

    idx_pdf = pd.DataFrame(
        {"url": ["h"], "url_canonical": ["h"], "digest": ["sha1:ABC"],
         "date": pd.to_datetime([1], unit="s").astype("datetime64[us]")}
    )
    idx = ShardedDigestIndex(rd.from_pandas(idx_pdf), n_shards=2,
                             strip_digest_scheme=False)
    cur = pd.DataFrame(
        {"url": ["a", "b"], "url_canonical": ["a", "b"],
         "digest": ["sha1:ABC", "ABC"],
         "warc_ts": pd.to_datetime([5, 6], unit="s")}
    )
    got = (
        match_actor_index(rd.from_pandas(cur), idx, PipelineConfig(use_digest_scheme=True))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert got["is_duplicate"].tolist() == [True, False]
    # default-built (stripped) index matches either digest form
    idx2 = ShardedDigestIndex(rd.from_pandas(idx_pdf), n_shards=2)
    got2 = (
        match_actor_index(rd.from_pandas(cur), idx2, PipelineConfig())
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert got2["is_duplicate"].tolist() == [True, True]


def test_normalize_dataset_end_to_end(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame(
        {
            "url": ["http://www.a.example/", "http://b.example/x"],
            "status": [200, 200],
            "text": ["hello world", "hello world"],
        }
    )
    out = normalize(rd.from_pandas(pdf), digest_mode="md5_text").to_pandas()
    assert out["digest"].nunique() == 1  # identical text -> identical digest
    assert set(out.columns) >= {"url", "text", "digest", "url_canonical", "content_bytes"}
