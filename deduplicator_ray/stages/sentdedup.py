"""C4-style global chunk-level dedup + Gopher-style repetition metrics.

The C4 pipeline (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning", §2.2) removes every repeated three-sentence span from the
corpus, keeping one global occurrence.  The corpus here is unpunctuated
text, so the dedup unit is the exact analog for it: NON-OVERLAPPING
``w``-word chunks.  Semantics (exactly what the DuckDB oracle computes):

- split each document on single spaces; group words into chunks of ``w``
  (last chunk may be short);
- a chunk occurrence is kept iff it is the GLOBALLY FIRST occurrence of
  that chunk string, ordered by (doc id, chunk ordinal);
- each document is rebuilt from its kept chunks in order, joined by a
  single space (round-trips byte-exact when nothing was removed).

Distributed shape (100 TB): chunk text NEVER rides a shuffle.  The
explode stage emits 26 bytes/chunk (doc id, ordinal, two independent
64-bit siphashes = one 128-bit key); the dedup shuffle buckets on the
hash; the rebuild co-partitions the (tiny) removal list with the
documents by doc id and re-chunks locally.  Collision caveat: equality
is on the 128-bit hash, not the string — at 10^12 chunks the collision
probability is ~10^-14 (birthday bound), and the driver oracle pins
exactness at test scale.

Gopher repetition metrics (Rae et al. 2021, appendix A1.1) are per-doc
map-only: word/bigram frequency concentration signals boilerplate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# independent 16-byte sip keys -> two independent 64-bit hashes = 128 bits
_HK1 = "chunkdedup_hash1"
_HK2 = "chunkdedup_hash2"


def _chunk_frame(doc_ids: np.ndarray, text: pa.Array, w: int):
    """Vectorized chunker: (doc_id array, string array) -> pandas frame
    (doc_id, ord, chunk) — Arrow split + offset arithmetic, no per-row
    Python.  Null text is treated as "" (one empty word), matching the
    codebase's null-text convention; corpora with null text therefore
    keep one row per doc here while a SQL unnest would drop them."""
    words = pc.split_pattern(pc.fill_null(text, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy()  # len n_docs+1
    flat = words.values
    n_words = np.diff(offsets)
    counts = -(-n_words // w)  # ceil; a doc always yields >=1 chunk
    # (split of "" is [""] so n_words >= 1 and counts >= 1 — every doc
    # appears in the chunk frame, mirroring DuckDB string_split)
    total = int(counts.sum())
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    starts = offsets[:-1][doc_idx] + w * intra
    bounds = np.append(starts, offsets[-1]).astype(np.int32)
    chunks = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(bounds), flat), " "
    )
    return pd.DataFrame({
        "doc_id": doc_ids[doc_idx],
        "ord": intra,
        "chunk": chunks.to_pandas(),
    })


def _hash_chunks(s: pd.Series):
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=_HK1).to_numpy()
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_HK2).to_numpy()
    return h1, h2


def chunk_dedup(ds, *, words_per_chunk: int = 10, num_buckets: int = 64,
                id_col: str = "doc_id", text_col: str = "text",
                max_broadcast: int = 2_000_000):
    """Global keep-first dedup of ``words_per_chunk``-word chunks.

    Returns a Dataset (doc_id, text_dedup, removed_chunks) with one row
    per input document.  Three stages, ONE hash shuffle in the common
    case, text bytes only in the map-local explode/rebuild kernels:

    1. explode: doc -> (doc_id, ord, h1, h2) per chunk (26 B/row);
    2. dedup shuffle on h1: per bucket, sort (h1, h2, doc_id, ord) and
       emit every NON-first occurrence as removed (same 128-bit key
       always lands in the same bucket, so keep-first is global);
    3. rebuild — the removal list is normally tiny relative to the
       corpus (the duplicate fraction), so up to ``max_broadcast`` rows
       it is ``ray.put`` once and every rebuild task anti-joins it
       map-side: DOCUMENT TEXT NEVER RIDES A SHUFFLE.  Beyond the cap,
       fall back to co-partitioning removals with the documents on
       doc_id (one corpus shuffle) and rebuilding per bucket.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        f = _chunk_frame(ids, b[text_col].combine_chunks(), words_per_chunk)
        h1, h2 = _hash_chunks(f["chunk"])
        return pa.table({
            "doc_id": pa.array(f["doc_id"].to_numpy()),
            "ord": pa.array(f["ord"].to_numpy()),
            "h1": pa.array(h1),
            "h2": pa.array(h2),
        })

    chunks = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    chunks = hash_bucket(chunks, "h1", num_buckets)

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h1", "h2", "doc_id", "ord"], kind="mergesort")
        rem = g[g.duplicated(["h1", "h2"], keep="first")]
        return rem[["doc_id", "ord"]].reset_index(drop=True)

    # materialize the (tiny) removal list once: it feeds a count (the
    # broadcast-vs-shuffle switch) and then one rebuild path; without the
    # pin each consumer would recompute the whole dedup shuffle
    removed = chunks.groupby("_part").map_groups(
        mark, batch_format="pandas"
    ).materialize()

    return _apply_removals(ds, removed, words_per_chunk=words_per_chunk,
                           num_buckets=num_buckets, id_col=id_col,
                           text_col=text_col, max_broadcast=max_broadcast)


def boilerplate_dedup(ds, *, words_per_chunk: int = 10, min_count: int = 3,
                      num_buckets: int = 64, id_col: str = "doc_id",
                      text_col: str = "text", max_broadcast: int = 2_000_000):
    """CCNet-style frequent-chunk boilerplate removal: drop EVERY
    occurrence of any ``words_per_chunk``-word chunk whose global
    occurrence count is >= ``min_count`` (nav bars, footers, cookie
    banners — text so common it carries no signal).  Complements
    ``chunk_dedup`` (keep-first): here even the first copy goes.

    Returns a Dataset (doc_id, text_dedup, removed_chunks), one row per
    input document.  Same 100-TB shape as chunk_dedup: the dedup shuffle
    moves 26 B/chunk hash rows only; all occurrences of one 128-bit key
    land in one bucket so the count (and hence the removal decision) is
    exact and global; the rebuild never ships document text unless the
    removal list exceeds ``max_broadcast``.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        f = _chunk_frame(ids, b[text_col].combine_chunks(), words_per_chunk)
        h1, h2 = _hash_chunks(f["chunk"])
        return pa.table({
            "doc_id": pa.array(f["doc_id"].to_numpy()),
            "ord": pa.array(f["ord"].to_numpy()),
            "h1": pa.array(h1),
            "h2": pa.array(h2),
        })

    chunks = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    chunks = hash_bucket(chunks, "h1", num_buckets)

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby(["h1", "h2"])["doc_id"].transform("size")
        rem = g[n >= min_count]
        return rem[["doc_id", "ord"]].reset_index(drop=True)

    removed = chunks.groupby("_part").map_groups(
        mark, batch_format="pandas"
    ).materialize()

    return _apply_removals(ds, removed, words_per_chunk=words_per_chunk,
                           num_buckets=num_buckets, id_col=id_col,
                           text_col=text_col, max_broadcast=max_broadcast)


def _apply_removals(ds, removed, *, words_per_chunk: int, num_buckets: int,
                    id_col: str, text_col: str, max_broadcast: int):
    """Shared rebuild tail: given a materialized (doc_id, ord) removal
    list, rebuild each document from its kept chunks.  Broadcast the list
    (``ray.put`` once, map-side anti-join — document text never rides a
    shuffle) up to ``max_broadcast`` rows; beyond that co-partition
    removals with the documents on doc_id (one corpus shuffle)."""
    from deduplicator_ray.stages.exact import hash_bucket

    if removed.count() <= max_broadcast:
        import ray

        rem_pdf = removed.to_pandas()
        if "doc_id" not in rem_pdf.columns:  # zero removals: schema is lost
            rem_pdf = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                    "ord": pd.Series(dtype="int64")})
        rem_ref = ray.put(rem_pdf)

        def rebuild_bcast(b: pa.Table) -> pa.Table:
            rem = ray.get(rem_ref)
            out = _rebuild_docs(
                b[id_col].to_numpy().astype(np.int64),
                b[text_col].combine_chunks(),
                rem, words_per_chunk,
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        return ds.map_batches(rebuild_bcast, batch_format="pyarrow",
                              zero_copy_batch=True)

    # co-partition documents + removal list on doc_id (asof-join pattern)
    def doc_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "doc_id": pc.cast(b[id_col], pa.int64()),
            "ord": pa.nulls(n, pa.int64()),
            "text": b[text_col],
            "src": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def rem_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "ord": pc.cast(b["ord"], pa.int64()),
            "text": pa.nulls(n, pa.string()),
            "src": pa.array(np.ones(n, dtype=np.int8)),
        })

    both = ds.map_batches(doc_side, batch_format="pyarrow", zero_copy_batch=True).union(
        removed.map_batches(rem_side, batch_format="pyarrow", zero_copy_batch=True)
    )
    both = hash_bucket(both, "doc_id", num_buckets)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["src"] == 0]
        if docs.empty:
            return _EMPTY_REBUILD.copy()
        rem = g[g["src"] == 1][["doc_id", "ord"]]
        return _rebuild_docs(
            docs["doc_id"].to_numpy(np.int64),
            pa.array(docs["text"], type=pa.string()),
            rem, words_per_chunk,
        )

    return both.groupby("_part").map_groups(rebuild, batch_format="pandas")


_EMPTY_REBUILD = pd.DataFrame({
    "doc_id": pd.Series(dtype="int64"),
    "text_dedup": pd.Series(dtype="object"),
    "removed_chunks": pd.Series(dtype="int64"),
})


def _rebuild_docs(doc_ids: np.ndarray, text: pa.Array, rem: pd.DataFrame,
                  w: int) -> pd.DataFrame:
    """Shared rebuild kernel: re-chunk these docs, drop removed (doc_id,
    ord) pairs, re-join kept chunks.  ``rem`` may cover docs outside this
    batch (broadcast path) — the merge restricts it."""
    if not len(doc_ids):
        return _EMPTY_REBUILD.copy()
    f = _chunk_frame(doc_ids, text, w)
    f = f.merge(rem.assign(_rm=1), on=["doc_id", "ord"], how="left")
    kept = f[f["_rm"].isna()]
    out = (
        kept.sort_values(["doc_id", "ord"], kind="mergesort")
        .groupby("doc_id", sort=True)["chunk"]
        .agg(" ".join)
        .rename("text_dedup")
        .reset_index()
    )
    # docs whose every chunk was removed rebuild to the empty string
    out = (
        pd.DataFrame({"doc_id": np.sort(np.unique(doc_ids))})
        .merge(out, on="doc_id", how="left")
    )
    out["text_dedup"] = out["text_dedup"].fillna("")
    n_rm = (
        f[f["_rm"].notna()].groupby("doc_id").size()
        .rename("removed_chunks").reset_index()
    )
    out = out.merge(n_rm, on="doc_id", how="left")
    out["removed_chunks"] = out["removed_chunks"].fillna(0).astype("int64")
    return out


def boilerplate_report(ds, *, words_per_chunk: int = 10, min_count: int = 3,
                       top_n: int = 20, num_buckets: int = 64,
                       id_col: str = "doc_id", text_col: str = "text"):
    """The boilerplate itself: the ``top_n`` most frequent
    ``words_per_chunk``-word chunks with occurrence and document counts
    — the discovery report behind ``boilerplate_dedup``'s ``min_count``
    knob (what WILL be stripped, and how much of the corpus it is).

    Returns a Dataset (chunk, n_occ BIGINT, n_docs BIGINT) ordered by
    (n_occ DESC, chunk), at most ``top_n`` rows.

    Two passes so chunk TEXT only ever ships for frequent chunks:
    pass 1 counts 128-bit chunk hashes through one 16-byte-row shuffle
    and collects the frequent hash set (boilerplate is rare as a
    distinct-string population, so this is driver-small); pass 2
    broadcasts that set, re-chunks map-side, keeps only frequent-hash
    occurrences, and aggregates (chunk, n_occ, n_docs) through one
    small shuffle.  The final top-n sort runs on the filtered
    aggregate, which ``min_count`` already made tiny.
    """
    import ray

    from deduplicator_ray.stages.exact import hash_bucket

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        f = _chunk_frame(ids, b[text_col].combine_chunks(), words_per_chunk)
        h1, h2 = _hash_chunks(f["chunk"])
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2)})

    hashes = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    hashes = hash_bucket(hashes, "h1", num_buckets)

    def freq_only(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby(["h1", "h2"], as_index=False).size()
        return n[n["size"] >= min_count][["h1", "h2"]]

    def combine64(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # 128 -> 64-bit membership key.  A false positive only lets an
        # infrequent chunk into pass 2, where the final n_occ >= min_count
        # filter drops it; a true frequent pair always matches (the map
        # is deterministic), so the report is exact either way.
        return h1 * np.uint64(0x9E3779B97F4A7C15) + h2

    fp = (hashes.groupby("_part")
          .map_groups(freq_only, batch_format="pandas").to_pandas())
    if "h1" not in fp.columns:  # zero frequent chunks: schema is lost
        fp = pd.DataFrame({"h1": pd.Series(dtype="uint64"),
                           "h2": pd.Series(dtype="uint64")})
    freq = ray.put(np.sort(combine64(fp["h1"].to_numpy(np.uint64),
                                     fp["h2"].to_numpy(np.uint64))))

    def extract(b: pa.Table) -> pd.DataFrame:
        fkeys = ray.get(freq)
        ids = b[id_col].to_numpy().astype(np.int64)
        f = _chunk_frame(ids, b[text_col].combine_chunks(), words_per_chunk)
        h1, h2 = _hash_chunks(f["chunk"])
        pos = np.searchsorted(fkeys, combine64(h1, h2))
        pos[pos >= len(fkeys)] = 0
        keep = (fkeys[pos] == combine64(h1, h2)) if len(fkeys) else \
            np.zeros(len(h1), dtype=bool)
        f = f[keep]
        g = f.groupby(["chunk", "doc_id"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "n"})

    occ = ds.map_batches(extract, batch_format="pyarrow", batch_size=4096)
    occ = hash_bucket(occ, "chunk", max(1, num_buckets // 4))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        # re-distinct (chunk, doc_id) across batches before the doc count
        d = g.groupby(["chunk", "doc_id"], as_index=False, sort=False).agg(
            n=("n", "sum"))
        out = d.groupby("chunk", sort=False).agg(
            n_occ=("n", "sum"), n_docs=("doc_id", "size")).reset_index()
        out = out[out["n_occ"] >= min_count]  # drop combine64 false positives
        return out.astype({"n_occ": "int64", "n_docs": "int64"})

    out = (occ.groupby("_part")
           .map_groups(lambda g: agg(g.drop(columns=["_part"])),
                       batch_format="pandas"))
    # the aggregate is already min_count-filtered and tiny; a global
    # descending sort with the chunk-text tiebreak is a driver-size op
    def neg(b: pa.Table) -> pa.Table:
        return b.append_column("_neg", pc.negate(b["n_occ"]))

    return (out.map_batches(neg, batch_format="pyarrow", zero_copy_batch=True)
            .sort(["_neg", "chunk"]).limit(top_n)
            .drop_columns(["_neg"]))


def split_documents(ds, *, words_per_chunk: int = 64, stride: int | None = None,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split documents into fixed-size training samples: a window of
    ``words_per_chunk`` words starting every ``stride`` words (default:
    non-overlapping, stride == words_per_chunk; stride < words_per_chunk
    gives the overlapping windows context-window packing uses).  The last
    window of a doc may be short; every doc yields at least one window
    (splitting "" gives the one-empty-word doc, like the dedup stages).

    Windows stop once the doc is covered: a doc with n words yields
    ceil((n - w)/stride) + 1 windows (1 when n <= w) — the final window
    always reaches the last word and no window is a pure suffix of an
    earlier one.

    Map-only and fully vectorized: window starts come from offset
    arithmetic; overlapping windows gather through one ``pc.take`` and
    re-join via list offsets — no per-row Python.  Returns
    (<id_col>, chunk_ord, chunk, n_words) with one row per window.
    """
    w = int(words_per_chunk)
    s = int(stride) if stride is not None else w
    if w < 1 or s < 1:
        raise ValueError("words_per_chunk and stride must be >= 1")
    if s > w:
        raise ValueError(
            "stride > words_per_chunk would skip words between windows; "
            "packing requires stride <= words_per_chunk"
        )

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        words = pc.split_pattern(pc.fill_null(b[text_col].combine_chunks(), ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = words.offsets.to_numpy().astype(np.int64)
        n_words = np.diff(offsets)
        counts = np.where(
            n_words <= w, 1, -(-(n_words - w) // s) + 1
        ).astype(np.int64)  # >= 1 per doc: split("") = [""]
        total = int(counts.sum())
        doc_idx = np.repeat(np.arange(len(ids)), counts)
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        starts = offsets[:-1][doc_idx] + s * intra
        ends = np.minimum(starts + w, offsets[1:][doc_idx])
        lens = ends - starts
        # gather each window's words explicitly (windows may overlap, so
        # a shared-boundary ListArray over the flat values cannot express
        # them) — one take + one join, still zero per-row Python
        gath_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(lens, out=gath_off[1:])
        idx = np.repeat(starts, lens) + (
            np.arange(int(gath_off[-1]), dtype=np.int64)
            - np.repeat(gath_off[:-1], lens)
        )
        # string VALUE offsets (bytes) hit int32 range long before list
        # offsets (element counts) do, so the value side is large_string
        # end-to-end; pyarrow's only large-output binary_join kernel is
        # (list<large_string>, large_string-scalar), so the list offsets
        # stay int32 — guarded (2^31 gathered words/batch is far beyond
        # any sane block; bytes were the realistic ceiling)
        if gath_off[-1] >= 2**31:
            raise ValueError(
                "split_documents: >2^31 gathered words in one batch; "
                "lower batch_size/stride inflation"
            )
        flat = words.values.cast(pa.large_string())
        taken = pc.take(flat, pa.array(idx))
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(gath_off, type=pa.int32()),
                                     taken),
            pa.scalar(" ", type=pa.large_string()),
        )
        return pa.table({
            id_col: pa.array(ids[doc_idx]),
            "chunk_ord": pa.array(intra),
            "chunk": chunks,
            "n_words": pa.array(lens.astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _word_hashes(text: pa.Array):
    """Per-word 64-bit hashes + doc offsets, vectorized.  Stable across
    batches/processes (fixed sip key), so window combines of these are a
    consistent n-gram fingerprint corpus-wide.  Null text counts as ""."""
    words = pc.split_pattern(pc.fill_null(text, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy()
    h = pd.util.hash_pandas_object(
        words.values.to_pandas(), index=False, hash_key=_HK1
    ).to_numpy()
    return h, offsets


def _ngram_hashes(h: np.ndarray, offsets: np.ndarray, n: int):
    """Overlapping n-gram fingerprints from word hashes: a fixed-weight
    polynomial combine over each length-n window (position j weighted by
    R^(n-1-j), odd R so the map is a bijection per slot).  Returns
    (gram_hash uint64, doc_index int64) for every window that fits
    entirely inside one document."""
    R = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
    n_words = np.diff(offsets)
    total = len(h)
    if total == 0 or n <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    acc = np.zeros(total - n + 1 if total >= n else 0, dtype=np.uint64)
    if not len(acc):
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    for j in range(n):  # n is small (8): n vectorized passes
        acc *= R
        acc += h[j:j + len(acc)]
    # keep only windows fully inside one doc: window starting at global
    # position p is valid iff p+n <= end-offset of p's doc
    doc_idx = np.repeat(np.arange(len(n_words)), n_words)[:len(acc)]
    ends = offsets[1:][doc_idx]
    starts = np.arange(len(acc), dtype=np.int64)
    valid = starts + n <= ends
    return acc[valid], doc_idx[valid]


def _ngram_occurrences(text: pa.Array, n: int):
    """Overlapping ``n``-word-gram occurrences with within-doc positions:
    (h1 uint64, h2 uint64, doc_index int64, pos int64) for every window
    that fits entirely inside one document.  h1/h2 are two INDEPENDENT
    fixed-weight polynomial combines over per-word sip hashes with
    independent keys — together a 128-bit gram fingerprint (equal grams
    always collide; unequal collide at ~2^-128, same rigor as
    chunk_dedup).  ``pos`` is the 0-based word index of the window start
    inside its document.  Null text counts as ""."""
    R = np.uint64(0x9E3779B97F4A7C15)
    words = pc.split_pattern(pc.fill_null(text, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy()
    flat = words.values.to_pandas()
    total = len(flat)
    empty = (np.empty(0, np.uint64), np.empty(0, np.uint64),
             np.empty(0, np.int64), np.empty(0, np.int64))
    if total < n or n <= 0:
        return empty
    h1 = pd.util.hash_pandas_object(flat, index=False, hash_key=_HK1).to_numpy()
    h2 = pd.util.hash_pandas_object(flat, index=False, hash_key=_HK2).to_numpy()

    def comb(h: np.ndarray) -> np.ndarray:
        acc = np.zeros(total - n + 1, dtype=np.uint64)
        for j in range(n):  # n vectorized passes, no per-row Python
            acc *= R
            acc += h[j:j + len(acc)]
        return acc

    g1, g2 = comb(h1), comb(h2)
    n_words = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(n_words)), n_words)[:len(g1)]
    starts = np.arange(len(g1), dtype=np.int64)
    valid = starts + n <= offsets[1:][doc_idx]
    pos = starts - offsets[:-1][doc_idx]
    return g1[valid], g2[valid], doc_idx[valid], pos[valid]


def span_dedup(ds, *, ngram: int = 8, num_buckets: int = 64,
               id_col: str = "doc_id", text_col: str = "text",
               max_broadcast: int = 2_000_000):
    """ExactSubstr-style duplicated-SPAN removal (the word-granular
    analog of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better", §ExactSubstr): unlike ``chunk_dedup``'s
    non-overlapping chunks, windows slide over EVERY word position, so a
    shared span is caught at any alignment.  Semantics (exactly what the
    DuckDB oracle computes):

    - overlapping ``ngram``-word windows at every word position of every
      document (windows that fit entirely inside the doc);
    - a window occurrence is DUPLICATED unless it is the globally-first
      occurrence of its gram string, ordered by (doc id, position);
    - every word covered by at least one duplicated occurrence is
      removed; each doc is rebuilt from its kept words joined by ' '.

    The globally-first copy of a repeated span therefore survives intact
    while every later copy loses the whole span (including within-doc
    repetition).  Returns (doc_id, text_dedup, removed_words), one row
    per input document.

    Distributed shape (100 TB), mirroring ``chunk_dedup``: gram text
    never rides a shuffle — the explode emits 32 B/window (doc id, pos,
    128-bit hash); keep-first runs per hash bucket (same 128-bit key
    always lands in one bucket, so first-occurrence election is global);
    the removal list (duplicated occurrences only) is broadcast up to
    ``max_broadcast`` rows so document text never shuffles, with a
    co-partition-on-doc_id fallback beyond the cap.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        g1, g2, didx, pos = _ngram_occurrences(
            b[text_col].combine_chunks(), ngram
        )
        return pa.table({
            "doc_id": pa.array(ids[didx] if len(didx) else
                               np.empty(0, np.int64)),
            "pos": pa.array(pos),
            "h1": pa.array(g1),
            "h2": pa.array(g2),
        })

    occ = hash_bucket(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        "h1", num_buckets,
    )

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h1", "h2", "doc_id", "pos"], kind="mergesort")
        rem = g[g.duplicated(["h1", "h2"], keep="first")]
        return rem[["doc_id", "pos"]].reset_index(drop=True)

    # materialized once: feeds the broadcast-vs-shuffle count and one
    # rebuild path (same justification as chunk_dedup)
    removed = occ.groupby("_part").map_groups(
        mark, batch_format="pandas"
    ).materialize()

    if removed.count() <= max_broadcast:
        import ray

        rem_pdf = removed.to_pandas()
        if "doc_id" not in rem_pdf.columns:  # zero removals: schema is lost
            rem_pdf = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                    "pos": pd.Series(dtype="int64")})
        rem_ref = ray.put(rem_pdf)

        def rebuild_bcast(b: pa.Table) -> pa.Table:
            out = _rebuild_span_docs(
                b[id_col].to_numpy().astype(np.int64),
                b[text_col].combine_chunks(),
                ray.get(rem_ref), ngram,
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        return ds.map_batches(rebuild_bcast, batch_format="pyarrow",
                              zero_copy_batch=True)

    # co-partition documents + removal list on doc_id (chunk_dedup shape)
    def doc_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "doc_id": pc.cast(b[id_col], pa.int64()),
            "pos": pa.nulls(n, pa.int64()),
            "text": b[text_col],
            "src": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def rem_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "pos": pc.cast(b["pos"], pa.int64()),
            "text": pa.nulls(n, pa.string()),
            "src": pa.array(np.ones(n, dtype=np.int8)),
        })

    both = ds.map_batches(doc_side, batch_format="pyarrow",
                          zero_copy_batch=True).union(
        removed.map_batches(rem_side, batch_format="pyarrow",
                            zero_copy_batch=True)
    )
    both = hash_bucket(both, "doc_id", num_buckets)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["src"] == 0]
        if docs.empty:
            return _EMPTY_SPAN_REBUILD.copy()
        rem = g[g["src"] == 1][["doc_id", "pos"]]
        return _rebuild_span_docs(
            docs["doc_id"].to_numpy(np.int64),
            pa.array(docs["text"], type=pa.string()),
            rem, ngram,
        )

    return both.groupby("_part").map_groups(rebuild, batch_format="pandas")


_EMPTY_SPAN_REBUILD = pd.DataFrame({
    "doc_id": pd.Series(dtype="int64"),
    "text_dedup": pd.Series(dtype="object"),
    "removed_words": pd.Series(dtype="int64"),
})


def _rebuild_span_docs(doc_ids: np.ndarray, text: pa.Array,
                       rem: pd.DataFrame, n: int) -> pd.DataFrame:
    """Span-rebuild kernel: re-split these docs to words, mark every word
    covered by a removed window [pos, pos+n), re-join the kept words.
    ``rem`` may cover docs outside this batch (broadcast path) — the
    membership filter restricts it.  Fully vectorized: interval cover via
    a +1/-1 delta array + cumsum, per-doc re-join via list offsets."""
    if not len(doc_ids):
        return _EMPTY_SPAN_REBUILD.copy()
    words = pc.split_pattern(pc.fill_null(text, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy().astype(np.int64)
    n_words = np.diff(offsets)
    total = int(offsets[-1])
    pos_of = pd.Series(np.arange(len(doc_ids)), index=doc_ids)
    r = rem[rem["doc_id"].isin(pos_of.index)]
    delta = np.zeros(total + 1, dtype=np.int64)
    if len(r):
        di = pos_of.loc[r["doc_id"]].to_numpy()
        p = r["pos"].to_numpy(np.int64)
        starts = offsets[:-1][di] + p
        ends = offsets[:-1][di] + np.minimum(p + n, n_words[di])
        np.add.at(delta, starts, 1)
        np.add.at(delta, ends, -1)
    covered = np.cumsum(delta[:-1]) > 0
    doc_idx = np.repeat(np.arange(len(doc_ids)), n_words)
    kept = ~covered
    flat_kept = words.values.filter(pa.array(kept))
    kept_counts = np.bincount(doc_idx[kept], minlength=len(doc_ids))
    new_off = np.zeros(len(doc_ids) + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=new_off[1:])
    text_dedup = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_off, type=pa.int32()),
                                 flat_kept), " "
    )
    removed_words = np.bincount(
        doc_idx[covered], minlength=len(doc_ids)
    ).astype(np.int64)
    return pd.DataFrame({
        "doc_id": doc_ids,
        "text_dedup": text_dedup.to_pandas(),
        "removed_words": removed_words,
    })


def decontaminate(docs_ds, bench_ds, *, ngram: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_bench_grams: int = 50_000_000):
    """Benchmark decontamination (GPT-3 appx C / PaLM style): flag every
    training document sharing at least one ``ngram``-word n-gram with the
    benchmark corpus.

    Shape for 100 TB: the benchmark side is SMALL by definition (eval
    sets), so its distinct n-gram fingerprints are collected once,
    sorted, and ``ray.put`` — the training corpus is then a single
    map-only scan (np.searchsorted membership per batch), no shuffle at
    all.  ``max_bench_grams`` guards the driver collect (64-bit
    fingerprints -> 8 B each).  Fingerprints are fixed-key sip hashes of
    words combined with a fixed-weight polynomial: equal n-grams always
    collide, unequal ones collide with ~2^-64 probability (the driver
    oracle pins exact-string semantics at test scale).

    Returns (doc_id, n_hits, contaminated) per training doc, where
    ``n_hits`` counts contaminated n-gram OCCURRENCES in the doc.
    """
    import ray

    def bench_grams(b: pa.Table) -> pa.Table:
        h, offs = _word_hashes(b[text_col].combine_chunks())
        grams, _ = _ngram_hashes(h, offs, ngram)
        return pa.table({"g": pa.array(np.unique(grams))})

    gpdf = bench_ds.map_batches(bench_grams, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    # an all-short / empty benchmark loses its schema through to_pandas
    raw = gpdf["g"].to_numpy() if "g" in gpdf.columns else np.empty(0, np.uint64)
    gset = np.unique(raw)  # sorted + cross-block distinct (dedup BEFORE the cap)
    if len(gset) > max_bench_grams:
        raise ValueError(
            f"benchmark side has {len(gset)} distinct {ngram}-grams > "
            f"max_bench_grams={max_bench_grams}; decontamination expects "
            "a small benchmark corpus (raise the cap deliberately)"
        )
    gref = ray.put(gset)

    def scan(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if not len(ids):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_hits": pa.array([], type=pa.int64()),
                             "contaminated": pa.array([], type=pa.bool_())})
        g = ray.get(gref)
        h, offs = _word_hashes(b[text_col].combine_chunks())
        grams, doc_idx = _ngram_hashes(h, offs, ngram)
        if len(grams) and len(g):
            pos = np.searchsorted(g, grams)
            hit = (pos < len(g)) & (g[np.minimum(pos, len(g) - 1)] == grams)
            n_hits = np.bincount(doc_idx[hit], minlength=len(ids)).astype(np.int64)
        else:
            n_hits = np.zeros(len(ids), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_hits": pa.array(n_hits),
            "contaminated": pa.array(n_hits > 0),
        })

    return docs_ds.map_batches(scan, batch_format="pyarrow",
                               zero_copy_batch=True)


def corpus_overlap(ds_a, ds_b, *, ngram: int = 8, num_buckets: int = 32,
                   text_col: str = "text"):
    """Corpus-level overlap between two snapshots: the number of DISTINCT
    ``ngram``-word grams in each side and in their intersection — the
    aggregate a crawl operator reads before deciding whether a new
    snapshot is worth deduplicating against an old one (containment =
    n_common / n_grams_b).

    Distributed shape: each side explodes to 128-bit gram fingerprints
    (within-batch deduped first, so repeated boilerplate never inflates
    the shuffle), both streams co-partition on one hash bucket, and each
    bucket contributes distinct/intersection partial counts — gram text
    never rides the shuffle, the result is three integers.

    Returns a one-row pandas DataFrame (n_grams_a, n_grams_b, n_common).
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def explode(side: int):
        def f(b: pa.Table) -> pa.Table:
            g1, g2, _, _ = _ngram_occurrences(
                b[text_col].combine_chunks(), ngram
            )
            # within-batch dedup before anything wide
            u = np.unique(np.stack([g1, g2], axis=1), axis=0) if len(g1) \
                else np.empty((0, 2), np.uint64)
            n = len(u)
            return pa.table({
                "h1": pa.array(u[:, 0]),
                "h2": pa.array(u[:, 1]),
                "side": pa.array(np.full(n, side, dtype=np.int8)),
            })
        return f

    both = ds_a.map_batches(explode(0), batch_format="pyarrow",
                            zero_copy_batch=True).union(
        ds_b.map_batches(explode(1), batch_format="pyarrow",
                         zero_copy_batch=True)
    )
    both = hash_bucket(both, "h1", num_buckets)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        per = g.drop_duplicates(["h1", "h2", "side"]).groupby(
            ["h1", "h2"], sort=False
        )["side"].agg(["count", "min"])
        n_both = int((per["count"] == 2).sum())
        n_a = int(((per["count"] == 2) | (per["min"] == 0)).sum())
        n_b = int(((per["count"] == 2) | (per["min"] == 1)).sum())
        return pd.DataFrame({"n_grams_a": [n_a], "n_grams_b": [n_b],
                             "n_common": [n_both]})

    parts = both.groupby("_part").map_groups(
        partial, batch_format="pandas"
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame({"n_grams_a": [0], "n_grams_b": [0],
                             "n_common": [0]})
    return parts.sum().to_frame().T.astype("int64")


def repetition_stats(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style per-document repetition metrics (map-only):
    n_words, n_distinct words, count of the most frequent word, count of
    the most frequent word bigram.  High top-word/bigram concentration
    flags boilerplate and low-quality repetition (Rae et al. 2021 A1.1)."""

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if not len(ids):
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_words": pa.array([], type=pa.int64()),
                "n_distinct": pa.array([], type=pa.int64()),
                "top_word_n": pa.array([], type=pa.int64()),
                "top_bigram_n": pa.array([], type=pa.int64()),
            })
        words = pc.split_pattern(
            pc.fill_null(b[text_col].combine_chunks(), ""), " "
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = words.offsets.to_numpy()
        n_words = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(ids)), n_words)
        flat = words.values.to_pandas()
        codes, _ = pd.factorize(flat, sort=False)
        wf = pd.DataFrame({"d": doc_idx, "c": codes})
        per = wf.groupby(["d", "c"], sort=False).size()
        agg = per.groupby(level=0).agg(["count", "max"])
        # bigrams: adjacent word pairs within a doc (vectorized over the
        # flat code array; pairs spanning a doc boundary are masked out)
        big = codes[:-1].astype(np.int64) * (codes.max() + 1) + codes[1:]
        same_doc = doc_idx[:-1] == doc_idx[1:]
        bf = pd.DataFrame({"d": doc_idx[:-1][same_doc], "c": big[same_doc]})
        if len(bf):
            btop = bf.groupby(["d", "c"], sort=False).size().groupby(level=0).max()
        else:
            btop = pd.Series(dtype="int64")
        top_bi = np.zeros(len(ids), dtype=np.int64)
        if len(btop):
            top_bi[btop.index.to_numpy()] = btop.to_numpy()
        out = pa.table({
            "doc_id": pa.array(ids),
            "n_words": pa.array(n_words.astype(np.int64)),
            "n_distinct": pa.array(
                agg["count"].reindex(range(len(ids)), fill_value=0).to_numpy(np.int64)
            ),
            "top_word_n": pa.array(
                agg["max"].reindex(range(len(ids)), fill_value=0).to_numpy(np.int64)
            ),
            "top_bigram_n": pa.array(top_bi),
        })
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def doc_novelty(ds, *, ngram: int = 8, num_buckets: int = 64,
                id_col: str = "doc_id", text_col: str = "text"):
    """Per-document novelty -> Dataset (doc_id, n_grams BIGINT,
    n_novel BIGINT): of a document's DISTINCT ``ngram``-word grams, how
    many does it OWN — i.e. it is the minimum-doc_id document containing
    the gram corpus-wide.  n_novel/n_grams is the memorization/novelty
    signal used to order crawls and prune boilerplate-heavy additions;
    a doc made entirely of already-seen grams scores 0.

    Shape: map-local gram fingerprinting (the 128-bit combine of
    span_dedup), within-batch distinct per doc (a doc's text lives in
    one row, so its distinct-gram count is exact map-side), ONE gram-key
    shuffle of tagged integer rows (gram rows keyed by fingerprint for
    global min-doc ownership; per-doc count rows ride the same shuffle
    untouched), per-bucket owner partials, then one tiny doc_id-key
    shuffle summing the two integer streams.  Text never rides a
    shuffle.  Documents with fewer than ``ngram`` words emit no row
    (they have no grams).
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def explode(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g1, g2, di, _pos = _ngram_occurrences(b[text_col].combine_chunks(),
                                              ngram)
        df = pd.DataFrame({"h1": g1, "h2": g2,
                           "doc": ids[di]}).drop_duplicates()
        per_doc = df.groupby("doc", as_index=False).size().rename(
            columns={"size": "k"})
        grams = pd.DataFrame({
            "key": df["h1"].to_numpy().view("int64"),
            "h2": df["h2"].to_numpy().view("int64"),
            "doc": df["doc"].to_numpy(),
            "k": np.int64(0),
            "is_gram": True,
        })
        counts = pd.DataFrame({
            "key": per_doc["doc"].to_numpy(),
            "h2": np.int64(0),
            "doc": per_doc["doc"].to_numpy(),
            "k": per_doc["k"].to_numpy().astype("int64"),
            "is_gram": False,
        })
        return pd.concat([grams, counts], ignore_index=True)

    tagged = ds.map_batches(explode, batch_format="pyarrow",
                            batch_size=4096)

    def own_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df[df["is_gram"]]
        passthrough = df.loc[~df["is_gram"], ["doc", "k"]].copy()
        passthrough["novel"] = np.int64(0)
        g = (g.sort_values(["key", "h2", "doc"], kind="mergesort")
             .drop_duplicates(["key", "h2"]))  # global min doc per gram
        own = g.groupby("doc", as_index=False).size().rename(
            columns={"size": "novel"})
        own["k"] = np.int64(0)
        out = pd.concat([own[["doc", "k", "novel"]], passthrough],
                        ignore_index=True)
        return out.astype({"doc": "int64", "k": "int64", "novel": "int64"})

    partials = (hash_bucket(tagged, "key", num_buckets)
                .groupby("_part")
                .map_groups(lambda g: own_partial(g.drop(columns=["_part"])),
                            batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc", as_index=False).agg(
            n_grams=("k", "sum"), n_novel=("novel", "sum"))
        out = out.rename(columns={"doc": id_col})
        return out.astype({"n_grams": "int64", "n_novel": "int64"})

    return (hash_bucket(partials, "doc", num_buckets)
            .groupby("_part")
            .map_groups(lambda g: final(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def source_overlap_matrix(ds, *, ngram: int = 8, group_col: str = "source",
                          id_col: str = "doc_id", text_col: str = "text",
                          num_buckets: int = 64):
    """Pairwise corpus-overlap matrix -> pandas DataFrame (source_a,
    source_b, n_shared BIGINT): for every pair of sources, how many
    DISTINCT ``ngram``-word grams they share — the contamination matrix
    a data-mixing recipe consults before weighting sources (the pairwise
    generalization of ``corpus_overlap``).

    Shape: map-local 128-bit gram fingerprints, within-batch distinct
    (gram, source), ONE gram-key shuffle; per bucket a self-merge per
    gram emits source pairs (bounded by |sources|^2/2 rows per gram,
    sources are few by assumption) pre-summed per bucket; the global
    matrix (<= |sources|^2/2 rows) merges on the driver.  Text never
    rides a shuffle.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def explode(b: pa.Table) -> pd.DataFrame:
        grp = b[group_col].to_numpy(zero_copy_only=False)
        g1, g2, di, _pos = _ngram_occurrences(b[text_col].combine_chunks(),
                                              ngram)
        return pd.DataFrame({
            "key": g1.view("int64"),
            "h2": g2.view("int64"),
            "g": grp[di],
        }).drop_duplicates(ignore_index=True)

    grams = ds.map_batches(explode, batch_format="pyarrow",
                           batch_size=4096)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["key", "h2", "g"])
        m = df.merge(df, on=["key", "h2"])
        m = m[m["g_x"] < m["g_y"]]
        out = (m.groupby(["g_x", "g_y"], as_index=False, sort=False)
               .size().rename(columns={"size": "n", "g_x": "source_a",
                                       "g_y": "source_b"}))
        out["n"] = out["n"].astype("int64")
        return out

    parts = (hash_bucket(grams, "key", num_buckets)
             .groupby("_part")
             .map_groups(lambda g: pair_partial(g.drop(columns=["_part"])),
                         batch_format="pandas")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({"source_a": pd.Series([], dtype=object),
                             "source_b": pd.Series([], dtype=object),
                             "n_shared": pd.Series([], dtype="int64")})
    out = (parts.groupby(["source_a", "source_b"], as_index=False)
           .agg(n_shared=("n", "sum")))
    return out.astype({"n_shared": "int64"})


def dup_gram_coverage(ds, *, ngram: int = 3, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Gopher's duplicated-n-gram fraction (Rae et al. 2021, appendix
    A1.1 "fraction of characters in duplicate n-grams"), word-granular:
    per doc, the ppm of token positions covered by any ``ngram``-word
    gram that occurs >= 2 times WITHIN the doc -> Dataset (doc_id,
    n_tokens BIGINT, covered_tokens BIGINT, dup_gram_ppm BIGINT).

    Map-only, zero shuffle, no per-row Python: gram fingerprints and
    within-doc positions come from ``_ngram_occurrences``; within-doc
    duplicate runs are found with one lexsort; coverage (the UNION of
    the duplicated windows' [pos, pos+n) intervals) is a +1/-1 diff
    array over the batch's flat token axis, cumsummed once and
    reduceat-ed back per doc.  Integer outputs, so the DuckDB oracle
    value-hashes exactly.
    """
    def kern(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.int64())
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray) else b[text_col]
        words = pc.split_pattern(pc.fill_null(text, ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = words.offsets.to_numpy()
        offsets = (offsets - offsets[0]).astype(np.int64)
        n_tokens = np.diff(offsets)
        total = int(offsets[-1])

        g1, g2, di, pos = _ngram_occurrences(text, ngram)
        covered_per_doc = np.zeros(len(n_tokens), dtype=np.int64)
        if len(g1):
            order = np.lexsort((g2, g1, di))
            d_s, a_s, b_s = di[order], g1[order], g2[order]
            new = np.empty(len(d_s), dtype=bool)
            new[0] = True
            new[1:] = ((d_s[1:] != d_s[:-1]) | (a_s[1:] != a_s[:-1])
                       | (b_s[1:] != b_s[:-1]))
            run = np.cumsum(new) - 1
            run_len = np.bincount(run)
            dup = run_len[run] >= 2          # every member of a dup run
            dup_pos = pos[order][dup]
            dup_doc = d_s[dup]
            gstart = offsets[:-1][dup_doc] + dup_pos
            delta = np.zeros(total + 1, dtype=np.int64)
            np.add.at(delta, gstart, 1)
            np.add.at(delta, gstart + ngram, -1)  # windows never cross docs
            covered = np.cumsum(delta[:-1]) > 0
            if total:
                covered_per_doc = np.add.reduceat(
                    covered.astype(np.int64), offsets[:-1])
                covered_per_doc[n_tokens == 0] = 0
        ppm = covered_per_doc * 1_000_000 // np.maximum(n_tokens, 1)
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array(n_tokens),
            "covered_tokens": pa.array(covered_per_doc),
            "dup_gram_ppm": pa.array(ppm.astype(np.int64)),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def onion_coverage(ds, *, ngram: int = 3, num_buckets: int = 64,
                   threshold_ppm: int = 500_000,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Onion-style cross-document duplication filter (Pomikálek 2011,
    "Removing Boilerplate and Duplicate Content from Web Corpora", ch. 5:
    resemblance on the n-gram multiset) -> Dataset (doc_id,
    n_pos BIGINT, shared_pos BIGINT, onion_ppm BIGINT, keep BOOL).

    Per document, over its overlapping ``ngram``-word positions: a
    position is SHARED iff its gram occurs in >= 2 DISTINCT documents
    corpus-wide (within-doc-only repetition does not count — that is
    ``dup_gram_coverage``'s signal).  ``onion_ppm`` = shared positions
    per million gram positions; ``keep`` = onion_ppm <= threshold_ppm —
    the "drop documents that are mostly other documents" gate Onion
    applies with its default 50% resemblance cut.  Documents with fewer
    than ``ngram`` words have no positions and emit no row (same rule as
    ``doc_novelty``).

    Shape (100 TB): text never rides a shuffle.  Map-side the batch
    collapses to one row per (gram, doc) carrying its occurrence count
    (a doc lives in one row, so the count is exact) plus one per-doc
    total row riding the same tagged stream; ONE gram-key shuffle of
    integer rows; per bucket, distinct-doc>=2 election and per-doc
    partial sums; one tiny doc-key shuffle sums the two integer streams.
    Same tagged-union shape as ``doc_novelty``.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def explode(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g1, g2, di, _pos = _ngram_occurrences(b[text_col].combine_chunks(),
                                              ngram)
        df = pd.DataFrame({"h1": g1, "h2": g2, "doc": ids[di]})
        per = (df.groupby(["h1", "h2", "doc"], as_index=False, sort=False)
               .size().rename(columns={"size": "cnt"}))
        tot = per.groupby("doc", as_index=False)["cnt"].sum()
        grams = pd.DataFrame({
            "key": per["h1"].to_numpy().view("int64"),
            "h2": per["h2"].to_numpy().view("int64"),
            "doc": per["doc"].to_numpy(),
            "cnt": per["cnt"].to_numpy().astype("int64"),
            "is_gram": True,
        })
        totals = pd.DataFrame({
            "key": tot["doc"].to_numpy(),
            "h2": np.int64(0),
            "doc": tot["doc"].to_numpy(),
            "cnt": tot["cnt"].to_numpy().astype("int64"),
            "is_gram": False,
        })
        return pd.concat([grams, totals], ignore_index=True)

    tagged = ds.map_batches(explode, batch_format="pyarrow",
                            batch_size=4096)

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df[df["is_gram"]]
        passthrough = df.loc[~df["is_gram"], ["doc", "cnt"]].copy()
        passthrough = passthrough.rename(columns={"cnt": "n_pos"})
        passthrough["shared"] = np.int64(0)
        ndoc = g.groupby(["key", "h2"])["doc"].transform("nunique")
        sh = g[ndoc >= 2]
        shared = sh.groupby("doc", as_index=False)["cnt"].sum().rename(
            columns={"cnt": "shared"})
        shared["n_pos"] = np.int64(0)
        out = pd.concat([shared[["doc", "n_pos", "shared"]], passthrough],
                        ignore_index=True)
        return out.astype({"doc": "int64", "n_pos": "int64",
                           "shared": "int64"})

    partials = (hash_bucket(tagged, "key", num_buckets)
                .groupby("_part")
                .map_groups(lambda g: bucket_partial(g.drop(columns=["_part"])),
                            batch_format="pandas"))

    thr = int(threshold_ppm)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc", as_index=False).agg(
            n_pos=("n_pos", "sum"), shared_pos=("shared", "sum"))
        ppm = (out["shared_pos"].to_numpy(np.int64) * 1_000_000
               // np.maximum(out["n_pos"].to_numpy(np.int64), 1))
        out["onion_ppm"] = ppm
        out["keep"] = ppm <= thr
        out = out.rename(columns={"doc": id_col})
        return out.astype({"n_pos": "int64", "shared_pos": "int64",
                           "onion_ppm": "int64", "keep": "bool"})

    return (hash_bucket(partials, "doc", num_buckets)
            .groupby("_part")
            .map_groups(lambda g: final(g.drop(columns=["_part"])),
                        batch_format="pandas"))
