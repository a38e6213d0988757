"""Sparse lexical similarity operators: BM25 top-k ranking and tf-idf
cosine near-duplicate pairs over word n-gram shingles.

These are the inverted-index-shaped complements of the dense paths in
``stages/embed.py``: the reference resolves lookups against a Lucene
index (deduplicator-indexer/.../DigestIndexer.java builds the postings;
deduplicator-heritrix/.../LuceneIndexSearcher.java scores hits), and
these operators re-express the two classic Lucene scoring modes —
free-text ranking (BM25, Lucene's default similarity since 6.0) and
vector-space cosine (Lucene's ClassicSimilarity) — as Ray Data shuffles
over a term-partitioned postings stream instead of index lookups.

Scale shapes
------------
``bm25_topk``: two map-only passes.  Pass 1 partial-combines the corpus
stats a scorer needs (N, total tokens, per-query-term doc frequency)
inside each block — only ``len(terms) + 2`` tiny rows leave any block.
Pass 2 scores and keeps a local top-k per block, so at most k rows per
block reach the driver merge.  No shuffle at all.

``tfidf_cosine_pairs``: the vector space is the corpus's word n-grams
with doc frequency <= ``max_df`` (the hub-gram skew guard: a boilerplate
shingle shared by half the web would otherwise generate O(N^2) pairs —
capping df bounds per-gram pair fan-out at max_df^2 and, because its
idf ~ ln(N/df) -> 0, discards exactly the grams that carry no signal).
Per-doc weights and norms are computed entirely map-side against a
broadcast (gram -> df) table of the grams that appear in >= 2 documents
(df=1 grams contribute to norms with idf = ln N but can never pair, so
they never leave the map task; at index scales past ``max_broadcast``
the operator raises — the sharded-actor path of state/index_actor.py is
the drop-in replacement, same lookup contract).  Pair generation is the
hash-bucket pattern: ONE gram-hash shuffle of (gram, doc, weight) rows,
vectorized per-bucket triangular pair expansion with a within-bucket
partial sum, then ONE pair-key shuffle to finish the dot products.
Weights are pre-normalized map-side, so the final sum IS the cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.stages.jaccard import _gram_hashes, pack_u64_blobs

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


# ---------------------------------------------------------------- BM25


def _tokenize_ws(batch: pa.Table, text_col: str):
    """Whitespace-split a text column -> (flat token array, slice-relative
    offsets, per-row token counts) — the shared tokenizer of the lexical
    rankers (null text tokenizes to the single token '')."""
    text = pc.coalesce(batch[text_col], pa.scalar("", batch[text_col].type))
    lists = pc.split_pattern(text, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy()
    offsets = offsets - offsets[0]  # flatten() is slice-relative
    dl = np.diff(offsets).astype(np.int64)
    toks = lists.flatten().to_pandas().to_numpy(object)
    return toks, offsets, dl


def _query_tf(toks, offsets, nrows, qidx: pd.Index):
    """(nrows, |qidx|) int64 term-frequency matrix for the query terms."""
    tf = np.zeros((nrows, len(qidx)), dtype=np.int64)
    if len(toks):
        hit = qidx.get_indexer(toks)
        pos = np.flatnonzero(hit >= 0)
        if len(pos):
            doc_of = np.searchsorted(offsets, pos, side="right") - 1
            np.add.at(tf, (doc_of, hit[pos]), 1)
    return tf


def bm25_topk(ds, terms: list[str], *, k: int = 15, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> pd.DataFrame:
    """Top ``k`` documents by BM25 score for the bag-of-words query
    ``terms`` (Robertson & Zaragoza 2009, "The Probabilistic Relevance
    Framework"; idf is Lucene's non-negative variant
    ln(1 + (N - df + .5)/(df + .5))).

    Tokenization is whitespace (the same convention as
    ``textstats.unigram_logloss`` / ``freq.inverted_index``: null text
    tokenizes to the single token '').  Only documents containing at
    least one query term are candidates; ties break on ascending
    ``id_col``.  Returns a pandas DataFrame (id_col, score) — k rows at
    most ever reach the driver per block, so the merge is O(k * blocks).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct")
    if any(" " in t for t in terms):
        raise ValueError("whitespace tokens cannot contain a space")
    qterms = list(terms)
    qidx = pd.Index(np.asarray(qterms, dtype=object))

    def _tokenize(batch: pa.Table):
        return _tokenize_ws(batch, text_col)

    def _tf_matrix(toks, offsets, nrows):
        return _query_tf(toks, offsets, nrows, qidx)

    def stats(batch: pa.Table) -> pa.Table:
        toks, offsets, dl = _tokenize(batch)
        tf = _tf_matrix(toks, offsets, batch.num_rows)
        # whitespace-split tokens never contain a space, so these two
        # sentinel keys cannot collide with a query term
        keys = qterms + ["n docs", "n tok"]
        vals = np.concatenate([
            (tf > 0).sum(axis=0).astype(np.int64),
            [np.int64(batch.num_rows), dl.sum()],
        ])
        return pa.table({"key": pa.array(keys, pa.string()), "val": pa.array(vals)})

    parts = (
        ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("key")["val"].sum()
    )
    n_docs = float(parts["n docs"])
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = float(parts["n tok"]) / n_docs
    df_t = parts.reindex(qterms).fillna(0).to_numpy(np.float64)
    idf = np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))

    def score(batch: pa.Table) -> pa.Table:
        toks, offsets, dl = _tokenize(batch)
        tf = _tf_matrix(toks, offsets, batch.num_rows).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dl[:, None] / avgdl))
        s = ((tf * (k1 + 1.0) / denom) * idf[None, :]).sum(axis=1)
        cand = np.flatnonzero(tf.sum(axis=1) > 0)
        ids = np.asarray(batch[id_col], dtype=np.int64)[cand]
        s = s[cand]
        order = np.lexsort((ids, -s))[:k]  # local top-k: score desc, id asc
        return pa.table({id_col: pa.array(ids[order]),
                         "score": pa.array(s[order])})

    out = ds.map_batches(score, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if out.empty:  # all-empty results drop the schema in to_pandas
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    out = out.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort", ignore_index=True)
    return out.head(k).reset_index(drop=True)


# -------------------------------------------------- tf-idf cosine pairs


def _tri_pair_indices(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized unordered-pair expansion for contiguous groups.

    For groups of the given ``sizes``, return (group_id, i, j) arrays
    enumerating every within-group pair with local indices i < j, in
    (i, j) lexicographic order.  Closed-form triangular decode + an
    integer correction step (float sqrt error is < 1 ulp for any size
    a worker could hold, but correcting costs nothing)."""
    sizes = sizes.astype(np.int64)
    c = sizes * (sizes - 1) // 2
    total = int(c.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    gid = np.repeat(np.arange(len(sizes), dtype=np.int64), c)
    base = np.concatenate(([0], np.cumsum(c)[:-1]))
    p = np.arange(total, dtype=np.int64) - base[gid]
    s = sizes[gid]
    # pairs with first index < i: f(i) = i*(2s - i - 1)/2; invert for i
    i = np.floor((2 * s - 1 - np.sqrt((2 * s - 1.0) ** 2 - 8.0 * p)) / 2).astype(np.int64)
    i = np.clip(i, 0, s - 2)
    f = lambda x: x * (2 * s - x - 1) // 2  # noqa: E731
    i = np.where(f(i + 1) <= p, i + 1, i)   # one step up if sqrt undershot
    i = np.where(f(i) > p, i - 1, i)        # one step down if it overshot
    j = p - f(i) + i + 1
    return gid, i, j


def tfidf_cosine_pairs(ds, *, threshold: float = 0.5, ngram: int = 3,
                       max_df: int = 1000, id_col: str = "doc_id",
                       text_col: str = "text", num_buckets: int = 64,
                       max_broadcast: int = 5_000_000):
    """All document pairs (doc_a < doc_b) whose tf-idf vectors over word
    ``ngram``-shingles have cosine >= ``threshold``.

    Semantics (the DuckDB oracle recomputes exactly this): term space =
    shingles with doc frequency <= ``max_df``; weight w(d, t) =
    tf(d, t) * ln(N / df(t)) with N = TOTAL corpus row count; norms run
    over the full term space, pairing only over the df >= 2 subset
    (df=1 grams cannot pair by definition).  Exact — the only pruning,
    ``max_df``, is part of the contract, not an approximation.

    Returns a Dataset (doc_a, doc_b, cosine).
    """
    import ray

    from deduplicator_ray.stages.exact import hash_bucket

    if not 0 < ngram:
        raise ValueError("ngram must be positive")
    if max_df < 2:
        raise ValueError("max_df must be >= 2 (no gram could ever pair)")

    n_total = ds.count()  # parquet metadata count: no data scan

    def grams_table(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        # multiplicity KEPT (distinct=False): the run lengths are the tfs
        arr = pack_u64_blobs([_gram_hashes(t, ngram, distinct=False)
                              for t in texts])
        return pa.table({id_col: batch[id_col], "gramblob": arr})

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        grams_table, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    ).materialize()  # feeds both the df count and the weight pass

    def _flatten(batch: pa.Table):
        """gramblob rows -> (doc_ids, flat sorted-per-doc hashes, doc
        offsets into the flat array)."""
        ids = np.asarray(batch[id_col], dtype=np.int64)
        blobs = batch["gramblob"].combine_chunks()
        odt = np.int64 if pa.types.is_large_binary(blobs.type) else np.int32
        boff = blobs.buffers()[1]
        bdat = blobs.buffers()[2]
        offsets = np.frombuffer(
            boff, dtype=odt, count=len(ids) + 1,
            offset=blobs.offset * np.dtype(odt).itemsize,
        ).astype(np.int64)
        flat = (np.frombuffer(bdat, dtype="<u8")[offsets[0] // 8: offsets[-1] // 8]
                if bdat is not None else np.empty(0, dtype=np.uint64))
        return ids, flat.astype(np.uint64, copy=False), (offsets - offsets[0]) // 8

    def _uniq_runs(ids, flat, doc_off):
        """Run-length encode per-doc sorted hashes -> (LOCAL doc index
        per unique (doc, gram) row, gram hash, tf)."""
        ndoc = len(ids)
        if len(flat) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.uint64), e.copy()
        doc_of = np.repeat(np.arange(ndoc, dtype=np.int64), np.diff(doc_off))
        first = np.ones(len(flat), dtype=bool)
        first[1:] = (flat[1:] != flat[:-1]) | (doc_of[1:] != doc_of[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.concatenate((starts, [len(flat)])))
        return doc_of[starts], flat[starts], tf.astype(np.int64)

    # --- pass 1: exact df per gram (distinct docs), gram-hash shuffle
    def distinct_rows(batch: pa.Table) -> pa.Table:
        ids, flat, doc_off = _flatten(batch)
        _udoc, grams, _tf = _uniq_runs(ids, flat, doc_off)
        return pa.table({"gram": pa.array(grams.astype(np.uint64), pa.uint64())})

    def df_reduce(g: pd.DataFrame) -> pa.Table:
        counts = g.groupby("gram", sort=False)["gram"].size()
        keep = counts[counts.to_numpy() >= 2]
        return pa.table({
            "gram": pa.array(keep.index.to_numpy(np.uint64), pa.uint64()),
            "df": pa.array(keep.to_numpy(np.int64)),
        })

    df_tbl = (
        hash_bucket(sigs.map_batches(distinct_rows, batch_format="pyarrow",
                                     zero_copy_batch=True),
                    "gram", num_buckets)
        .groupby("_part").map_groups(df_reduce, batch_format="pandas")
        .to_pandas()
    )
    if len(df_tbl) > max_broadcast:
        raise ValueError(
            f"{len(df_tbl)} grams with df>=2 exceeds max_broadcast="
            f"{max_broadcast}; shard the df table behind "
            "state/index_actor.py instead of broadcasting"
        )
    order = np.argsort(df_tbl["gram"].to_numpy(np.uint64), kind="stable")
    vocab = df_tbl["gram"].to_numpy(np.uint64)[order]
    vocab_df = df_tbl["df"].to_numpy(np.int64)[order]
    ref = ray.put((vocab, vocab_df))
    log_n = float(np.log(n_total)) if n_total else 0.0

    # --- pass 2 (map-only): weights + per-doc norms, emit pairable rows
    def weight_rows(batch: pa.Table) -> pa.Table:
        voc, voc_df = ray.get(ref)
        ids, flat, doc_off = _flatten(batch)
        udoc, grams, tf = _uniq_runs(ids, flat, doc_off)
        if len(grams) == 0 or len(voc) == 0:
            return pa.table({"gram": pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        pos = np.minimum(np.searchsorted(voc, grams), len(voc) - 1)
        in_vocab = voc[pos] == grams
        dfv = np.where(in_vocab, voc_df[pos], 1)
        live = dfv <= max_df  # hub grams leave the space entirely
        idf = log_n - np.log(dfv.astype(np.float64))
        w = np.where(live, tf.astype(np.float64) * idf, 0.0)
        # norms over the whole (non-hub) space, summed per local doc
        nrm = np.sqrt(np.bincount(udoc, weights=w * w, minlength=len(ids)))
        nrm_row = nrm[udoc]
        keep = in_vocab & live & (nrm_row > 0)
        return pa.table({
            "gram": pa.array(grams[keep], pa.uint64()),
            id_col: pa.array(ids[udoc[keep]]),
            "w": pa.array(w[keep] / nrm_row[keep]),
        })

    weights = sigs.map_batches(weight_rows, batch_format="pyarrow",
                               zero_copy_batch=True)

    # --- pass 3: gram shuffle -> per-bucket pair expansion + partial sum
    def pair_reduce(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["gram", id_col], kind="mergesort")
        grams = g["gram"].to_numpy(np.uint64)
        docs = g[id_col].to_numpy(np.int64)
        w = g["w"].to_numpy(np.float64)
        starts = np.flatnonzero(np.concatenate(([True], grams[1:] != grams[:-1])))
        sizes = np.diff(np.concatenate((starts, [len(grams)])))
        gid, i, j = _tri_pair_indices(sizes)
        if len(gid) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "p": pa.array([], pa.float64())})
        ia = starts[gid] + i
        ib = starts[gid] + j
        part = pd.DataFrame({"doc_a": docs[ia], "doc_b": docs[ib],
                             "p": w[ia] * w[ib]})
        # within-bucket partial combine before the pair-key shuffle
        part = part.groupby(["doc_a", "doc_b"], sort=False, as_index=False)["p"].sum()
        return pa.table({"doc_a": pa.array(part["doc_a"].to_numpy(np.int64)),
                         "doc_b": pa.array(part["doc_b"].to_numpy(np.int64)),
                         "p": pa.array(part["p"].to_numpy(np.float64))})

    partials = (
        hash_bucket(weights, "gram", num_buckets)
        .groupby("_part").map_groups(pair_reduce, batch_format="pandas")
    )

    # --- pass 4: pair-key shuffle -> final cosine + threshold
    def pair_part(batch: pa.Table) -> pa.Table:
        a = pd.util.hash_pandas_object(
            pd.Series(np.asarray(batch["doc_a"], dtype=np.int64)), index=False
        ).to_numpy().astype(np.uint64)
        bb = pd.util.hash_pandas_object(
            pd.Series(np.asarray(batch["doc_b"], dtype=np.int64)), index=False
        ).to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((a * _GOLDEN) ^ bb) % np.uint64(num_buckets)
        return batch.append_column("_part", pa.array(part.astype(np.int32)))

    def cosine_reduce(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["doc_a", "doc_b"], sort=False, as_index=False)["p"].sum()
        s = s[s["p"].to_numpy() >= threshold]
        return pa.table({"doc_a": pa.array(s["doc_a"].to_numpy(np.int64)),
                         "doc_b": pa.array(s["doc_b"].to_numpy(np.int64)),
                         "cosine": pa.array(s["p"].to_numpy(np.float64))})

    return (
        partials.map_batches(pair_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part").map_groups(cosine_reduce, batch_format="pandas")
    )


def bpe_merge_candidates(ds, *, top_k: int = 30, text_col: str = "text"):
    """The first BPE merge computation (Sennrich et al. 2016,
    arXiv:1508.07909 §3.2): corpus-wide counts of adjacent CHARACTER
    pairs within words -> pandas DataFrame (a, b, n BIGINT), the
    ``top_k`` most frequent pairs ordered (n DESC, a, b) — exactly the
    statistic whose argmax becomes the first merge rule when inducing a
    subword vocabulary from a corpus.

    Scale shape: per batch the whole text column is joined into ONE
    string with a NUL separator (never present in text) and viewed as a
    uint32 codepoint array; pairs are two stacked slices combined into
    one uint64 code and counted with np.unique — no per-word Python.
    Per-block partials are at most |alphabet|^2 cells, so the driver
    merge is tiny regardless of corpus size.  Zero shuffle.
    """
    def partial(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b[text_col], "")
        # words separated by NUL: pairs never straddle a word boundary
        joined = pc.replace_substring(text, " ", "\x00")
        blob = "\x00".join(joined.to_pylist())
        cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
        if len(cp) < 2:
            return pa.table({"code": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        a, bb = cp[:-1], cp[1:]
        keep = (a != 0) & (bb != 0)
        codes = (a[keep].astype(np.uint64) << np.uint64(32)) | bb[keep]
        uniq, cnt = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if parts.empty:
        return pd.DataFrame({"a": pd.Series(dtype=object),
                             "b": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    agg = parts.groupby("code", as_index=False)["n"].sum()
    codes = agg["code"].to_numpy(np.uint64)
    out = pd.DataFrame({
        "a": [chr(int(c >> np.uint64(32))) for c in codes],
        "b": [chr(int(c & np.uint64(0xFFFFFFFF))) for c in codes],
        "n": agg["n"].astype("int64"),
    })
    out = out.sort_values(["n", "a", "b"], ascending=[False, True, True],
                          kind="mergesort", ignore_index=True)
    return out.head(top_k).reset_index(drop=True)


def pmi_collocations(ds, *, top_k: int = 30, min_count: int = 5,
                     text_col: str = "text", num_buckets: int = 64,
                     max_candidates: int = 2_000_000):
    """Top-``top_k`` adjacent-word collocations by pointwise mutual
    information (Church & Hanks 1990) -> pandas (a, b, n, pmi_micro):
    the phrase-mining read a tokenizer/vocab recipe takes to decide which
    multi-word units deserve merges.

    PMI over the bigram event space: with c_ab the bigram count, ca/cb
    the LEFT/RIGHT marginals of the bigram table and N the total bigram
    count, pmi = ln(c_ab * N / (ca * cb)); reported as
    floor(pmi * 1e6 + 0.5) with both factors evaluated in DOUBLE in the
    same association order as the SQL oracle.  Rank: pmi_micro desc,
    then (a, b) asc — deterministic through ties at the cut.

    Scale shape: the token stream collapses to per-block partial bigram
    counts BEFORE the one bigram-key shuffle (classic combiner); the
    marginals are per-block regroups of the already-aggregated bigram
    table filtered to the candidate words, so no second token-stream
    pass and no vocabulary-wide second shuffle.  Candidates
    (n >= min_count) come to the driver behind a counted guard
    (``max_candidates`` — raise, never silently truncate), and the
    marginal rows that reach the driver are candidate-bounded too.
    """
    import ray.data  # noqa: F401 - ensures Dataset impl loaded

    from deduplicator_ray.stages.exact import hash_bucket

    if top_k < 1 or min_count < 1:
        raise ValueError("top_k and min_count must be >= 1")

    def bigram_partials(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "k": pa.array([], type=pa.string()),
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        })
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ).combine_chunks()
        lens = np.diff(words.offsets.to_numpy())
        flat = words.flatten().to_pandas().to_numpy(object)
        if len(flat) < 2:
            return empty
        # adjacent pairs, masking the ones that straddle a doc boundary
        valid = np.ones(len(flat) - 1, dtype=bool)
        bounds = np.cumsum(lens)[:-1]
        valid[bounds - 1] = False
        if not valid.any():
            return empty
        g = (pd.DataFrame({"a": flat[:-1][valid], "b": flat[1:][valid]})
             .groupby(["a", "b"], as_index=False, sort=False).size())
        return pa.table({
            "k": pa.array(g["a"] + "\x01" + g["b"], type=pa.string()),
            "a": pa.array(g["a"], type=pa.string()),
            "b": pa.array(g["b"], type=pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        g = df.groupby(["a", "b"], as_index=False, sort=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return g

    bg = (hash_bucket(
        ds.map_batches(bigram_partials, batch_format="pyarrow",
                       zero_copy_batch=True), "k", num_buckets)
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["k", "_part"])),
                    batch_format="pandas")
        .materialize())  # consumed 4x: N, candidates, two marginal passes

    total = bg.sum("n")
    if total is None:  # empty corpus
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "pmi_micro": pd.Series([], dtype="int64")})
    n_total = int(total)

    cand_ds = bg.filter(expr=f"n >= {int(min_count)}")
    cand = cand_ds.limit(max_candidates + 1).to_pandas()
    if len(cand) > max_candidates:
        raise ValueError(
            f"pmi_collocations: > {max_candidates} bigrams pass "
            f"min_count={min_count}; raise min_count or max_candidates"
        )

    import ray

    a_ref = ray.put(frozenset(cand["a"]))
    b_ref = ray.put(frozenset(cand["b"]))

    def marginal(side: str, keep_ref):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            keep = ray.get(keep_ref) if isinstance(
                keep_ref, ray.ObjectRef) else keep_ref
            if df.empty or side not in df.columns:
                return pd.DataFrame({side: pd.Series([], dtype=object),
                                     "c": pd.Series([], dtype="int64")})
            g = df.groupby(side, as_index=False, sort=False)["n"].sum()
            g = g[g[side].isin(keep)]
            return pd.DataFrame({side: g[side],
                                 "c": g["n"].to_numpy(np.int64)})
        # per-block partial regroup, then ONE word-key reduce of the
        # candidate-filtered (word, count) rows
        part = bg.map_batches(f, batch_format="pandas")
        return (hash_bucket(part, side, num_buckets)
                .groupby("_part")
                .map_groups(lambda g: (
                    g.drop(columns=["_part"])
                    .groupby(side, as_index=False, sort=False)["c"].sum()),
                    batch_format="pandas")
                .to_pandas())

    la = marginal("a", a_ref).rename(columns={"c": "ca"})
    rb = marginal("b", b_ref).rename(columns={"c": "cb"})
    out = cand.merge(la, on="a").merge(rb, on="b")
    ratio = (out["n"].to_numpy(np.float64) * float(n_total)) / (
        out["ca"].to_numpy(np.float64) * out["cb"].to_numpy(np.float64))
    out["pmi_micro"] = np.floor(
        np.log(ratio) * 1_000_000 + 0.5).astype(np.int64)
    out = (out.sort_values(["pmi_micro", "a", "b"],
                           ascending=[False, True, True], kind="mergesort")
           .head(top_k).reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out[["a", "b", "n", "pmi_micro"]]


def rank_fusion_rrf(ds, terms: list[str], *, k: int = 10, pool: int = 20,
                    rrf_k: int = 60, k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> pd.DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    retrieval systems over the same corpus and query: BM25 (the
    probabilistic ranker) and raw query-term frequency (the boolean-ish
    ranker) -> pandas (id_col, rrf_micro), top ``k`` fused.

    Each system contributes its top-``pool`` list; a doc's fused score is
    the INTEGER sum of 1_000_000 // (rrf_k + rank) over the lists it
    appears in (1-based ranks; ties inside a list break on ascending id)
    — integer end to end, so the SQL oracle is exact.  Fused ties break
    on ascending id.

    Scale shape: both rankers are map-only local-top-``pool`` passes
    (<= pool rows per block reach the driver; BM25 additionally partial-
    combines its corpus stats) — no shuffle anywhere; the fusion itself
    touches <= 2*pool rows.
    """
    if not (1 <= k <= pool):
        raise ValueError("need 1 <= k <= pool")
    if rrf_k < 0:
        raise ValueError("rrf_k must be non-negative")
    bm = bm25_topk(ds, terms, k=pool, k1=k1, b=b, id_col=id_col,
                   text_col=text_col)
    qidx = pd.Index(np.asarray(list(terms), dtype=object))

    def tfs(batch: pa.Table) -> pa.Table:
        toks, offsets, _dl = _tokenize_ws(batch, text_col)
        tf = _query_tf(toks, offsets, batch.num_rows, qidx).sum(axis=1)
        cand = np.flatnonzero(tf > 0)
        ids = np.asarray(batch[id_col], dtype=np.int64)[cand]
        c = tf[cand]
        order = np.lexsort((ids, -c))[:pool]  # local top: tf desc, id asc
        return pa.table({id_col: pa.array(ids[order]),
                         "c": pa.array(c[order])})

    tfd = ds.map_batches(tfs, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if tfd.empty:
        tfd = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                            "c": pd.Series([], dtype="int64")})
    tfd = tfd.sort_values(["c", id_col], ascending=[False, True],
                          kind="mergesort").head(pool)

    score: dict[int, int] = {}
    for ranked in (bm, tfd):
        for r, d in enumerate(ranked[id_col].tolist(), start=1):
            score[int(d)] = score.get(int(d), 0) + 1_000_000 // (rrf_k + r)
    out = pd.DataFrame({id_col: list(score), "rrf_micro": list(score.values())})
    out[id_col] = out[id_col].astype("int64")
    out["rrf_micro"] = out["rrf_micro"].astype("int64")
    return (out.sort_values(["rrf_micro", id_col], ascending=[False, True],
                            kind="mergesort")
            .head(k).reset_index(drop=True))
