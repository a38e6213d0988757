"""Per-record normalization stage (operators M1-M12, SURVEY.md §2.2).

One vectorized ``map_batches`` pass over zero-copy Arrow batches that:
- extracts ``text`` from ``html`` when absent (north_rule extension),
- computes the content digest (Base32(SHA-1) of html bytes, like
  Heritrix's FetchHTTP digestContent=sha1; or md5-of-text for
  oracle-parity pipelines) unless the source already carries one (WARC /
  crawl.log records arrive with their payload digest),
- canonicalizes the URL (must be the same function on index and lookup
  sides — IndexBuilder.java:194-199 / DeDuplicator.java:158),
- computes ``content_bytes`` (the reference counts content size into its
  byte totals, DeDuplicator.java:154-155),
- applies the status / mime / URL-sanity filters when those columns exist.

Status-filter fidelity (``side``): the reference's INDEX build accepts
only ``statusCode == 200`` (IndexBuilder.java:147-152) while the
crawl-side processor treats any 2xx success as processable
(DeDuplicator shouldProcess, DeDuplicator.java:123-141) — so a 206
response can be matched as a duplicate but is never indexed.

Stateless → plain function tasks, no actor pool needed.

``skip_counters`` mirrors the reference's run counters (A3): records
skipped by the status / mime / url filters (IndexBuilder.java:131-133
"skipped") and revisit records whose original could not be resolved
(:174-178 "unresolved") — computed as per-batch partials summed on the
driver, without disturbing the streaming normalize pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions.canonical import canonicalize_arrow
from deduplicator_ray.functions.digesting import md5_hex_many, sha1_base32_many
from deduplicator_ray.functions.textextract import extract_text_many


def _apply_filters(batch: pa.Table, cfg: PipelineConfig, side: str,
                   counts: dict | None = None) -> pa.Table:
    """Sequential (status, mime, url) record filters; each mask is
    evaluated on the rows surviving the previous one.  ``counts`` (when
    given) accumulates per-filter dropped-row counts — the counting and
    the filtering share this one definition."""
    cols = set(batch.column_names)

    def step(name: str, mask):
        nonlocal batch
        kept = batch.filter(mask)
        if counts is not None:
            counts[f"{name}_skipped"] = counts.get(f"{name}_skipped", 0) + (
                batch.num_rows - kept.num_rows
            )
        batch = kept

    if "status" in cols:
        if side == "index":
            step("status", pc.equal(batch["status"], 200))  # IndexBuilder.java:147-152
        else:
            step("status", pc.and_(
                pc.greater_equal(batch["status"], 200), pc.less(batch["status"], 300)
            ))
    if "mime" in cols and cfg.mime_filter:
        hit = pc.match_substring_regex(batch["mime"], cfg.mime_filter)
        keep = hit if cfg.mime_whitelist else pc.invert(hit)
        # null mime → keep (reference only skips on a positive match)
        step("mime", pc.fill_null(keep, True))
    if "url" in cols:
        step("url", pc.invert(pc.match_substring(batch["url"], '"')))
    return batch


def _normalize_batch(batch: pa.Table, cfg: PipelineConfig, digest_mode: str,
                     side: str = "crawl") -> pa.Table:
    # --- filters first, so we never digest rows we drop ---
    batch = _apply_filters(batch, cfg, side)
    cols = set(batch.column_names)
    has_html = "html" in cols

    if batch.num_rows == 0:
        # mirror EXACTLY the columns the non-empty path would add — a
        # divergent empty-batch schema (e.g. url_canonical on a corpus
        # with no url column) breaks downstream union/write
        out = batch
        add = []
        if "text" not in cols and has_html:
            add.append(("text", pa.large_string()))
        add.append(("digest", pa.string()))
        if cfg.include_canonical and "url" in cols:
            add.append(("url_canonical", pa.string()))
        add.append(("content_bytes", pa.int64()))
        for name, typ in add:
            if name not in out.column_names:
                out = out.append_column(name, pa.array([], type=typ))
        return out

    html = batch["html"].to_pylist() if has_html else None

    # text extraction (only when the column is absent — input_hint corpora
    # carry pre-extracted text whose bytes we must not alter). Metadata-only
    # corpora (WARC / crawl.log records) have neither: nothing to extract.
    if "text" not in cols and html is not None:
        texts = extract_text_many(html)
        batch = batch.append_column("text", pa.array(texts, type=pa.large_string()))
    cols = set(batch.column_names)

    # digest
    if "digest" not in cols:
        if digest_mode == "sha1_html":
            if html is None:
                raise ValueError("digest_mode='sha1_html' needs an html column")
            digests = sha1_base32_many(html, with_scheme=cfg.index_digest_scheme)
        elif digest_mode == "md5_text":
            if "text" not in cols:
                raise ValueError("digest_mode='md5_text' needs a text column")
            digests = md5_hex_many(batch["text"].to_pylist())
        else:
            raise ValueError(f"unknown digest_mode {digest_mode!r}")
        batch = batch.append_column("digest", pa.array(digests, type=pa.string()))

    if "url_canonical" not in cols and cfg.include_canonical and "url" in cols:
        from deduplicator_ray.functions.canonical import get_canonicalizer

        arrow_fn = get_canonicalizer(cfg.canonicalizer)[1]  # vectorized, no Python loop
        canon = arrow_fn(batch["url"])
        batch = batch.append_column("url_canonical", pc.cast(canon, pa.string()))

    if "content_bytes" not in cols:
        if html is not None:
            nbytes = pa.array([0 if h is None else len(h) for h in html], type=pa.int64())
        elif "text" in cols:
            nbytes = pc.cast(pc.binary_length(pc.cast(batch["text"], pa.large_binary())), pa.int64())
        elif "content_length" in cols:
            nbytes = pc.cast(batch["content_length"], pa.int64())
        else:
            nbytes = pa.nulls(batch.num_rows, pa.int64())
        batch = batch.append_column("content_bytes", nbytes)
    return batch


def normalize(ds, cfg: PipelineConfig | None = None, *, digest_mode: str = "sha1_html",
              side: str = "crawl"):
    """corpus Dataset -> normalized Dataset (adds text/digest/
    url_canonical/content_bytes, applies record filters).  ``side`` picks
    the status rule: 'crawl' = any 2xx, 'index' = exactly 200."""
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        lambda b: _normalize_batch(b, cfg, digest_mode, side),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )


def skip_counters(ds, cfg: PipelineConfig | None = None, *, side: str = "crawl") -> dict:
    """A3 run counters: how many records each filter would drop, plus
    unresolved revisits (revisit rows lacking an original url/ts —
    IndexBuilder.java:174-178).  One cheap streaming pass of per-batch
    partial counts; only a handful of ints reach the driver."""
    cfg = cfg or PipelineConfig()
    keys = ["status_skipped", "mime_skipped", "url_skipped", "unresolved_revisit",
            "parse_dropped", "handled"]

    def partial(b: pa.Table) -> pa.Table:
        counts = dict.fromkeys(keys, 0)
        if "parse_dropped" in b.column_names:
            counts["parse_dropped"] = pc.sum(b["parse_dropped"]).as_py() or 0
            if "url" in b.column_names:
                # exclude metrics-only rows (all-malformed crawl.log
                # batches emit one: url null, parse_dropped > 0) — they
                # are not records and must not inflate handled/skipped
                metrics = pc.and_(
                    pc.is_null(b["url"]), pc.greater(b["parse_dropped"], 0)
                )
                b = b.filter(pc.invert(metrics))
        n0 = b.num_rows
        b = _apply_filters(b, cfg, side, counts)
        if "is_revisit" in b.column_names:
            rev = pc.fill_null(b["is_revisit"], False)
            # both columns must exist AND be non-null; a corpus carrying
            # original_url without original_ts counts as unresolved (and
            # must not KeyError the counters pass)
            has_both = {"original_url", "original_ts"} <= set(b.column_names)
            resolved = pc.and_(
                pc.is_valid(b["original_url"]), pc.is_valid(b["original_ts"])
            ) if has_both else pa.array([False] * b.num_rows)
            unresolved = pc.and_(rev, pc.invert(resolved))
            counts["unresolved_revisit"] = pc.sum(unresolved).as_py() or 0
        counts["handled"] = n0
        return pa.table({k: pa.array([counts[k]], pa.int64()) for k in keys})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return {k: int(parts[k].sum()) for k in keys}
