"""Normalization-stage tests (operators M1-M12, SURVEY.md §2.2): filter
semantics, digest/canonical column production, and empty-batch schema
consistency."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.normalize import _normalize_batch, normalize


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
