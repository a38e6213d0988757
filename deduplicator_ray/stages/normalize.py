"""Per-record normalization stage (operators M1-M12, SURVEY.md §2.2).

One vectorized ``map_batches`` pass over zero-copy Arrow batches that:
- extracts ``text`` from ``html`` when absent (north_rule extension),
- computes the content digest (Base32(SHA-1) of html bytes, like
  Heritrix's FetchHTTP digestContent=sha1; or md5-of-text for
  oracle-parity pipelines),
- canonicalizes the URL (must be the same function on index and lookup
  sides — IndexBuilder.java:194-199 / DeDuplicator.java:158),
- computes ``content_bytes`` (the reference counts content size into its
  byte totals, DeDuplicator.java:154-155),
- applies the status / mime / URL-sanity filters when those columns exist
  (DeDuplicator.java:123-141, IndexBuilder.java:147-157,180-185).

Stateless → plain function tasks, no actor pool needed.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions.canonical import canonicalize_arrow
from deduplicator_ray.functions.digesting import md5_hex_many, sha1_base32_many
from deduplicator_ray.functions.textextract import extract_text_many


def _normalize_batch(batch: pa.Table, cfg: PipelineConfig, digest_mode: str) -> pa.Table:
    cols = set(batch.column_names)

    # --- filters first, so we never digest rows we drop ---
    # M1/M2: 2xx status only (when a status column exists)
    if "status" in cols:
        batch = batch.filter(
            pc.and_(pc.greater_equal(batch["status"], 200), pc.less(batch["status"], 300))
        )
    # M4: mime regex black/whitelist
    if "mime" in cols and cfg.mime_filter:
        hit = pc.match_substring_regex(batch["mime"], cfg.mime_filter)
        keep = hit if cfg.mime_whitelist else pc.invert(hit)
        # null mime → keep (reference only skips on a positive match)
        batch = batch.filter(pc.fill_null(keep, True))
    # M9: URLs containing unescaped quotes are invalid
    if "url" in cols:
        batch = batch.filter(pc.invert(pc.match_substring(batch["url"], '"')))

    if batch.num_rows == 0:
        # mirror EXACTLY the columns the non-empty path would add — a
        # divergent empty-batch schema (e.g. url_canonical on a corpus
        # with no url column) breaks downstream union/write
        out = batch
        add = [("text", pa.large_string()), ("digest", pa.string())]
        if cfg.include_canonical and "url" in cols:
            add.append(("url_canonical", pa.string()))
        add.append(("content_bytes", pa.int64()))
        for name, typ in add:
            if name not in out.column_names:
                out = out.append_column(name, pa.array([], type=typ))
        return out

    html = batch["html"].to_pylist() if "html" in cols else None

    # text extraction (only when the column is absent — input_hint corpora
    # carry pre-extracted text whose bytes we must not alter)
    if "text" not in cols:
        texts = extract_text_many(html)
        batch = batch.append_column("text", pa.array(texts, type=pa.large_string()))

    # digest
    if "digest" not in cols:
        if digest_mode == "sha1_html":
            digests = sha1_base32_many(html, with_scheme=cfg.index_digest_scheme)
        elif digest_mode == "md5_text":
            digests = md5_hex_many(batch["text"].to_pylist())
        else:
            raise ValueError(f"unknown digest_mode {digest_mode!r}")
        batch = batch.append_column("digest", pa.array(digests, type=pa.string()))

    if "url_canonical" not in cols and cfg.include_canonical and "url" in cols:
        canon = canonicalize_arrow(batch["url"])  # chained RE2 kernels, no Python loop
        batch = batch.append_column("url_canonical", pc.cast(canon, pa.string()))

    if "content_bytes" not in cols:
        if html is not None:
            nbytes = pa.array([0 if h is None else len(h) for h in html], type=pa.int64())
        else:
            nbytes = pc.cast(pc.binary_length(pc.cast(batch["text"], pa.large_binary())), pa.int64())
        batch = batch.append_column("content_bytes", nbytes)
    return batch


def normalize(ds, cfg: PipelineConfig | None = None, *, digest_mode: str = "sha1_html"):
    """corpus Dataset -> normalized Dataset (adds text/digest/
    url_canonical/content_bytes, applies record filters)."""
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        lambda b: _normalize_batch(b, cfg, digest_mode),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
