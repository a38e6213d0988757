"""Corpus-frequency operators with sketch-bounded shuffles.

``heavy_hitters``: EXACT corpus-level heavy words without ever shuffling
the full vocabulary — a two-pass mergeable Misra-Gries summary (Agarwal
et al. 2012, "Mergeable Summaries", §3; Misra & Gries 1982) proposes a
provably-complete candidate superset, then a broadcast second pass
counts only the candidates exactly.  At 100 TB the vocabulary of a web
corpus is O(10^9) distinct tokens; a naive groupby ships every one of
them through an all-to-all exchange, while this shape ships at most
``sketch_size`` rows per input block plus the (tiny) candidate counts.

``length_quantiles``: exact distributed quantiles over a BOUNDED-DOMAIN
integer column (document lengths): per-block (group, value) partial
counts collapse the data to a histogram whose size is |groups| x
|distinct values| — independent of row count — so quantiles are read off
cumulative counts exactly, no sort shuffle, no approximation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# row tags inside the pass-1 sketch stream
_TAG_WORD = 0   # (word, clipped count)
_TAG_ERR = 1    # per-block truncation threshold t  (sum = global bound E)
_TAG_TOTAL = 2  # per-block word count              (sum = global N)


def _flat_words(text: pa.Array) -> pd.Series:
    words = pc.split_pattern(pc.fill_null(text, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words.values.to_pandas()


def heavy_hitters(ds, *, min_ppm: int = 1000, sketch_size: int = 4096,
                  num_buckets: int = 16, text_col: str = "text",
                  return_total: bool = False):
    """All words whose global occurrence count is >= ``min_ppm`` parts
    per million of the total word count, with EXACT counts — computed
    without a full-vocabulary shuffle.  Returns a Dataset (word, n).

    Pass 1 (sketch): each block's word counts are Misra-Gries truncated
    (subtract the (sketch_size+1)-th largest count, clip at zero) so at
    most ``sketch_size`` (word, clipped-count) rows leave the block,
    plus two scalar rows: the truncation threshold t (the block's error
    bound) and the block's total word count.  Summed sketches undercount
    any word by at most E = sum(t); candidates = words whose summed
    clipped count >= threshold - E, a PROVABLY COMPLETE superset of the
    true heavy hitters (threshold = ceil(N * min_ppm / 1e6), N from the
    summed total rows).

    Pass 2 (verify): the candidate list — bounded by the sketch, small
    by construction — is ``ray.put`` once; a map-only scan counts ONLY
    candidate words per block, and one tiny shuffle sums those partials.
    The output is therefore exact, not approximate: the sketch only
    proposes, the count pass disposes.

    Completeness precondition: the candidate superset is provably
    complete only while ``threshold > E`` — a word truncated to zero in
    EVERY block never reaches the merged sketch, and MG only bounds its
    global undercount by E, so when E >= threshold such a word could be
    a true heavy hitter.  When that happens (sketch too small for the
    block count / threshold combination) this function AUTO-FALLS-BACK
    to exact counting of all words (one full-vocabulary shuffle): always
    correct, just no longer sketch-bounded.  Size ``sketch_size`` >
    1e6/min_ppm per expected block count to stay on the sketch path.
    """
    import ray

    from deduplicator_ray.stages.exact import hash_bucket

    def sketch(b: pa.Table) -> pa.Table:
        flat = _flat_words(b[text_col].combine_chunks())
        vc = flat.value_counts()
        t = 0
        if len(vc) > sketch_size:
            t = int(vc.iloc[sketch_size])
            vc = vc - t
            vc = vc[vc > 0]
        words = vc.index.to_numpy(object)
        cnts = vc.to_numpy(np.int64)
        return pa.table({
            "word": pa.array(np.append(words, [None, None]), type=pa.string()),
            "cnt": pa.array(np.append(cnts, [t, len(flat)])),
            "tag": pa.array(np.append(
                np.full(len(words), _TAG_WORD, dtype=np.int8),
                np.array([_TAG_ERR, _TAG_TOTAL], dtype=np.int8),
            )),
        })

    merged = hash_bucket(
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True),
        "word", num_buckets,
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["tag", "word"], sort=False, dropna=False)["cnt"]
               .sum().reset_index())
        return out[["word", "cnt", "tag"]]

    # the merged sketch is small by construction (<= sketch_size rows per
    # input block, pre-combined per bucket above) — driver collect is the
    # point where the candidate threshold needs ALL blocks' error terms
    sk = merged.groupby("_part").map_groups(
        combine, batch_format="pandas"
    ).to_pandas()
    n_total = int(sk.loc[sk["tag"] == _TAG_TOTAL, "cnt"].sum())
    err = int(sk.loc[sk["tag"] == _TAG_ERR, "cnt"].sum())
    threshold = -(-n_total * min_ppm // 1_000_000)  # ceil
    sketch_complete = threshold > err or n_total == 0
    if sketch_complete:
        wordrows = sk[sk["tag"] == _TAG_WORD]
        cand = wordrows.loc[
            wordrows["cnt"] >= threshold - err, "word"
        ].to_numpy(object)
        cand_ref = ray.put(pd.Index(cand))
    else:
        # a word clipped to zero in every block is invisible to the merged
        # sketch yet could still reach `threshold` globally when
        # err >= threshold — the candidate pass cannot be trusted, count
        # everything (correct, unbounded shuffle; see docstring)
        import warnings

        warnings.warn(
            f"heavy_hitters: summed MG error {err} >= threshold {threshold}; "
            "sketch completeness not guaranteed — falling back to exact "
            "full-vocabulary counting (raise sketch_size to avoid this)",
            stacklevel=2,
        )
        cand_ref = None

    def exact(b: pa.Table) -> pa.Table:
        flat = _flat_words(b[text_col].combine_chunks())
        vc = flat.value_counts()
        if cand_ref is not None:
            vc = vc[vc.index.isin(ray.get(cand_ref))]
        return pa.table({
            "word": pa.array(vc.index.to_numpy(object), type=pa.string()),
            "n": pa.array(vc.to_numpy(np.int64)),
        })

    counted = hash_bucket(
        ds.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True),
        "word", num_buckets,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", sort=False)["n"].sum().reset_index()
        return out[out["n"] >= threshold].reset_index(drop=True)

    hits = counted.groupby("_part").map_groups(final, batch_format="pandas")
    if return_total:
        # n_total was already paid for by the sketch pass — callers that
        # need the corpus token count (e.g. LM smoothing denominators)
        # get it without another full text scan
        return hits, n_total
    return hits


def length_quantiles(ds, *, group_col: str = "lang",
                     value_col: str = "n_chars",
                     qs: tuple[int, ...] = (25, 50, 90)):
    """Exact per-group quantiles of a bounded-domain integer column.

    Shape: map-only partial count of (group, value) per block — the
    histogram, whose size is |groups| x |distinct values| regardless of
    row count — then one tiny shuffle to merge, then quantiles read off
    cumulative counts at the driver.  Matches DuckDB ``quantile_disc``
    exactly: the q-quantile of n sorted values is element ceil(q*n)-1
    (0-based); ``qs`` are integer percents so the index arithmetic stays
    in integers (no float-ceil hazard).

    NULL values are ignored, exactly as ``quantile_disc`` ignores them
    (``n`` counts non-null values; a group whose values are all null
    contributes no row).  Returns a pandas DataFrame
    (group, n, p<q>...) sorted by group.
    """
    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": b[group_col].to_pandas(),
            "v": b[value_col].to_pandas(),
        })
        df = df[df["v"].notna()]
        out = df.groupby(["g", "v"], sort=False, dropna=False).size()
        out = out.rename("c").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["g", "v"], sort=True, dropna=False)["c"].sum().reset_index()
    )
    rows = []
    for g, sub in hist.groupby("g", sort=True, dropna=False):
        vals = sub["v"].to_numpy()          # sorted: outer groupby sorts v
        cum = np.cumsum(sub["c"].to_numpy(np.int64))
        n = int(cum[-1])
        row = {group_col: g, "n": n}
        for q in qs:
            idx = -(-q * n // 100) - 1      # ceil(q/100 * n) - 1, integer-exact
            row[f"p{q}"] = int(vals[np.searchsorted(cum, idx + 1)])
        rows.append(row)
    cols = [group_col, "n"] + [f"p{q}" for q in qs]
    return pd.DataFrame(rows, columns=cols)


def cap_per_group(ds, *, group_col: str, max_per_group: int,
                  id_col: str = "doc_id", seed: int = 0,
                  num_buckets: int = 64):
    """Per-group document cap — "keep at most N random docs per host",
    the hub-domain damper a web corpus runs before training (hub sites
    contribute millions of near-identical pages; capping them is the
    cheapest diversity lever after dedup).

    Priority is the bijective Weyl shuffle key, so the N survivors are a
    SEEDED UNIFORM SAMPLE of each group (not the N lowest ids), stable
    across runs/cluster sizes, and the SQL mirror (row_number over the
    HUGEINT key order) is bit-exact.

    Distributed shape: a within-batch partial cap first — each block
    forwards at most N rows per group it sees, so the one shuffle carries
    O(N x groups_per_block x blocks) rows no matter how hot a hub is —
    then a hash-bucket groupby applies the exact cap per group.

    Returns (id_col, group_col) of the kept rows.
    """
    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.stages.shuffle import shuffle_key

    if max_per_group <= 0:
        raise ValueError("max_per_group must be positive")
    if seed < 0:
        raise ValueError("seed must be non-negative")

    def partial_cap(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("cap_per_group requires non-negative ids")
        df = pd.DataFrame({
            id_col: ids,
            group_col: b[group_col].to_pandas(),
            "_key": shuffle_key(ids, seed),
        })
        kept = df.sort_values("_key", kind="stable").groupby(
            group_col, sort=False
        ).head(max_per_group)
        return pa.Table.from_pandas(
            kept, preserve_index=False
        ).replace_schema_metadata(None)

    pre = ds.map_batches(partial_cap, batch_format="pyarrow",
                         zero_copy_batch=True)
    pre = hash_bucket(pre, group_col, num_buckets)

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        kept = g.sort_values("_key", kind="stable").groupby(
            group_col, sort=False
        ).head(max_per_group)
        return kept[[id_col, group_col]].reset_index(drop=True)

    return pre.groupby("_part").map_groups(final_cap, batch_format="pandas")


def distinctive_terms(ds, *, k: int = 5, id_col: str = "doc_id",
                      text_col: str = "text", num_buckets: int = 64):
    """Per-document keyword extraction, tf-idf style but INTEGER-EXACT:
    each doc's top-``k`` terms ranked by (tf DESC, df ASC, term ASC) —
    frequent in the doc, rare in the corpus.  Ranking by raw tf-idf
    floats would make the result depend on libm rounding; this
    lexicographic rank preserves the "high tf, low df wins" intent while
    keeping the DuckDB oracle bit-exact.

    Distributed shape (two bounded shuffles, no broadcast of the
    vocabulary):
      1. explode (doc, term, tf) once, vectorized, then PRUNE each doc's
         tf rows to its tf-top-k WITH ties — sound because tf is the
         primary sort key, so a term below the doc's k-th largest tf can
         never reach rank <= k regardless of its df.  The shuffled tf
         volume is therefore ~k rows per doc, not every doc-term pair;
      2. per-block PARTIAL document-frequency rows (term, partial_df)
         over the UNPRUNED vocabulary — df stays exact; the extra volume
         is one row per distinct (block, term), bounded by block vocab;
      3. co-partition both streams on the term hash; each bucket sums df
         and attaches it to its surviving tf rows;
      4. re-bucket by doc and keep the top k per doc.

    Returns (doc_id, term, tf, df, rank), rank in [1, k].
    """
    from deduplicator_ray.stages.exact import hash_bucket

    if k <= 0:
        raise ValueError("k must be positive")

    def explode(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        )
        flat = words.combine_chunks()
        lens = np.diff(flat.offsets.to_numpy())
        ids = np.repeat(b[id_col].to_numpy().astype(np.int64), lens)
        df = pd.DataFrame({"doc_id": ids,
                           "term": flat.flatten().to_pandas()})
        tf = df.groupby(["doc_id", "term"], sort=False).size().reset_index(
            name="tf"
        )
        # partial df: this block's distinct docs per term (pre-prune)
        pdf = tf.groupby("term", sort=False).size().reset_index(name="tf")
        # prune tf rows to each doc's top-k-by-tf WITH boundary ties
        tf = tf.sort_values(["doc_id", "tf"], ascending=[True, False],
                            kind="stable")
        pos = tf.groupby("doc_id", sort=False).cumcount()
        thr = tf.loc[pos == k - 1].set_index("doc_id")["tf"]
        thr_all = tf["doc_id"].map(thr)
        tf = tf[thr_all.isna() | (tf["tf"] >= thr_all)]
        out = pd.concat([
            tf.assign(src=np.int8(1)),
            pdf.assign(doc_id=np.int64(-1), src=np.int8(0))[
                ["doc_id", "term", "tf", "src"]],
        ], ignore_index=True)
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "term": pa.array(out["term"].astype(object), type=pa.string()),
            "tf": pa.array(out["tf"].to_numpy(np.int64)),
            "src": pa.array(out["src"].to_numpy(np.int8)),
        })

    exploded = hash_bucket(
        ds.map_batches(explode, batch_format="pyarrow",
                       zero_copy_batch=True),
        "term", num_buckets,
    )

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        df_rows = g[g["src"] == 0]
        dfs = df_rows.groupby("term", sort=False)["tf"].sum()
        tf_rows = g[g["src"] == 1]
        return pd.DataFrame({
            "doc_id": tf_rows["doc_id"].to_numpy(np.int64),
            "term": tf_rows["term"].to_numpy(),
            "tf": tf_rows["tf"].to_numpy(np.int64),
            "df": tf_rows["term"].map(dfs).to_numpy(np.int64),
        })

    with_df = hash_bucket(
        exploded.groupby("_part").map_groups(attach_df,
                                             batch_format="pandas"),
        "doc_id", num_buckets,
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tf", "df", "term"],
                          ascending=[False, True, True], kind="stable")
        top = g.groupby("doc_id", sort=False).head(k).copy()
        top["rank"] = top.groupby("doc_id", sort=False).cumcount() + 1
        out = top[["doc_id", "term", "tf", "df", "rank"]].sort_values(
            ["doc_id", "rank"]
        )
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "term": pa.array(out["term"].astype(object), type=pa.string()),
            "tf": pa.array(out["tf"].to_numpy(np.int64)),
            "df": pa.array(out["df"].to_numpy(np.int64)),
            "rank": pa.array(out["rank"].to_numpy(np.int64)),
        })

    return with_df.groupby("_part").map_groups(topk, batch_format="pandas")


def inverted_index(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   num_buckets: int = 64, max_postings: int = 10_000):
    """Term -> posting-list index over the corpus — the Ray-native
    analogue of the reference's Lucene index build
    (deduplicator/.../DigestIndexer.java builds url/digest postings;
    this is the same structure at word granularity, as a TABLE).

    Returns (term, df, postings): df = exact document frequency,
    postings = comma-joined doc ids ascending — or NULL when df exceeds
    ``max_postings``.  The cap is the hub-term skew guard: a stopword's
    posting list at web scale is millions of ids that no consumer reads
    as one row; df stays exact for every term either way, so cap
    overruns are visible, not silent.

    Shape: per-block distinct (doc, term) explode (vectorized), ONE
    term-hash shuffle of key-only rows, per-bucket vectorized reduce.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    if max_postings <= 0:
        raise ValueError("max_postings must be positive")

    def explode(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        )
        flat = words.combine_chunks()
        lens = np.diff(flat.offsets.to_numpy())
        ids = np.repeat(b[id_col].to_numpy().astype(np.int64), lens)
        df = pd.DataFrame({"doc_id": ids,
                           "term": flat.flatten().to_pandas()})
        df = df.drop_duplicates(["doc_id", "term"])
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "term": pa.array(df["term"].astype(object), type=pa.string()),
        })

    pairs = hash_bucket(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        "term", num_buckets,
    )

    def reduce(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["term", "doc_id"], kind="stable")
        counts = g.groupby("term", sort=False)["doc_id"].size()
        # hub terms are capped to NULL — don't materialize their multi-MB
        # posting strings just to discard them
        keep_terms = counts.index[counts.to_numpy() <= max_postings]
        gk = g[g["term"].isin(keep_terms)]
        post = (gk.assign(s=gk["doc_id"].astype(str))
                .groupby("term", sort=False)["s"].agg(",".join))
        post = post.reindex(counts.index).astype(object)
        post = post.where(pd.notna(post), None)
        return pa.table({
            "term": pa.array(counts.index.to_numpy(object), type=pa.string()),
            "df": pa.array(counts.to_numpy(np.int64)),
            "postings": pa.array(post.to_numpy(object), type=pa.string()),
        })

    return pairs.groupby("_part").map_groups(reduce, batch_format="pandas")


def vocabulary_stats(ds, *, group_col: str = "source",
                     text_col: str = "text", num_buckets: int = 64):
    """Per-group corpus vocabulary statistics: EXACT distinct-word count,
    total token count, and integer-exact type/token ratio in ppm —
    the Zipf-health / vocabulary-growth diagnostic a data-mixing recipe
    reads before choosing per-source rates (Heaps' law monitoring).

    Shape: one pass emits per-block partials — distinct (group, word)
    marker rows (bounded by block vocab x groups present) and per-group
    token-count rows; ONE word-hash shuffle dedups markers across blocks
    and counts distinct exactly (no count-distinct approximation); the
    per-group reduce is a tiny second shuffle over |groups| x buckets
    partial rows.  Word identity is the same siphash the jaccard/minhash
    stages use — 8-byte rows through the wide shuffle, never strings.

    Returns (group_col, n_tokens, n_distinct, ttr_ppm) with
    ttr_ppm = n_distinct * 1_000_000 // n_tokens (0 for empty groups).
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def partials(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        )
        flat = words.combine_chunks()
        lens = np.diff(flat.offsets.to_numpy())
        grp = b[group_col].to_pandas().to_numpy(object)
        pdf = pd.DataFrame({
            "g": np.repeat(grp, lens),
            "w": pd.util.hash_array(
                flat.flatten().to_pandas().to_numpy(object)
            ).astype(np.int64),
        })
        d = pdf.drop_duplicates()
        tcounts = pd.DataFrame({"g": grp, "n": lens}).groupby(
            "g", sort=False)["n"].sum().reset_index()
        return pa.table({
            "g": pa.array(
                np.concatenate([d["g"].to_numpy(object),
                                tcounts["g"].to_numpy(object)]),
                type=pa.string()),
            "w": pa.array(np.concatenate([
                d["w"].to_numpy(np.int64),
                np.zeros(len(tcounts), dtype=np.int64)])),
            "n": pa.array(np.concatenate([
                np.zeros(len(d), dtype=np.int64),
                tcounts["n"].to_numpy(np.int64)])),
            "is_tok": pa.array(np.concatenate([
                np.zeros(len(d), dtype=np.int8),
                np.ones(len(tcounts), dtype=np.int8)])),
        })

    # shuffle on the word hash: every (group, word) marker for one word
    # lands in one bucket, so cross-block dedup is a local drop_duplicates
    marked = hash_bucket(
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True),
        "w", num_buckets,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        toks = g[g["is_tok"] == 1].groupby("g", sort=False)["n"].sum()
        dist = (g[g["is_tok"] == 0].drop_duplicates(["g", "w"])
                .groupby("g", sort=False).size())
        idx = toks.index.union(dist.index)
        return pd.DataFrame({
            "g": idx.to_numpy(object),
            "n_tokens": toks.reindex(idx, fill_value=0).to_numpy(np.int64),
            "n_distinct": dist.reindex(idx, fill_value=0).to_numpy(np.int64),
        })

    partial2 = marked.groupby("_part").map_groups(per_bucket,
                                                  batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("g", sort=False)[["n_tokens", "n_distinct"]].sum()
        out = out.reset_index().rename(columns={"g": group_col})
        nt = out["n_tokens"].to_numpy(np.int64)
        nd = out["n_distinct"].to_numpy(np.int64)
        out["ttr_ppm"] = np.where(nt > 0, nd * 1_000_000 // np.maximum(nt, 1), 0)
        return out

    return hash_bucket(partial2, "g", min(num_buckets, 16)).groupby(
        "_part").map_groups(final, batch_format="pandas")


def grouped_heavy_hitters(ds, *, group_col: str = "lang",
                          min_ppm: int = 10_000, sketch_size: int = 4096,
                          num_buckets: int = 16, text_col: str = "text"):
    """Per-GROUP exact heavy words (stopword-list discovery: every word
    whose count within its group is >= ``min_ppm`` ppm of that group's
    token count) -> Dataset (group, word, n) — the grouped analog of
    ``heavy_hitters``, same two-pass mergeable-Misra-Gries shape with
    the sketch, error bound, threshold and completeness check all
    per group.

    Groups are assumed FEW (languages, sources): the merged sketch is
    <= |groups| x sketch_size rows per input block before per-bucket
    combining, and the candidate pass broadcasts one small per-group
    word index.  Any group whose summed MG error reaches its threshold
    falls back to exact full-vocabulary counting FOR THAT GROUP only
    (same correctness argument as the ungrouped op).
    """
    import ray

    from deduplicator_ray.stages.exact import hash_bucket

    def sketch(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks()
        words = pc.split_pattern(pc.fill_null(text, ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.repeat(
            b[group_col].to_numpy(zero_copy_only=False), np.diff(off))
        df = pd.DataFrame({"g": grp, "w": words.values.to_pandas()})
        frames = []
        for g, sub in df.groupby("g", sort=False):
            vc = sub["w"].value_counts()
            t = 0
            if len(vc) > sketch_size:
                t = int(vc.iloc[sketch_size])
                vc = (vc - t)[lambda s: s > 0]
            frames.append(pd.DataFrame({
                "g": g,
                "word": np.append(vc.index.to_numpy(object), [None, None]),
                "cnt": np.append(vc.to_numpy(np.int64), [t, len(sub)]),
                "tag": np.append(
                    np.full(len(vc), _TAG_WORD, dtype=np.int8),
                    np.array([_TAG_ERR, _TAG_TOTAL], dtype=np.int8)),
            }))
        if not frames:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64()),
                             "tag": pa.array([], type=pa.int8())})
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), type=pa.string()),
            "word": pa.array(out["word"].to_numpy(object), type=pa.string()),
            "cnt": pa.array(out["cnt"].to_numpy(np.int64)),
            "tag": pa.array(out["tag"].to_numpy(np.int8)),
        })

    merged = hash_bucket(
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True),
        "word", num_buckets)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["g", "tag", "word"], sort=False, dropna=False)
               ["cnt"].sum().reset_index())
        return out[["g", "word", "cnt", "tag"]]

    sk = merged.groupby("_part").map_groups(
        combine, batch_format="pandas").to_pandas()
    totals = (sk[sk["tag"] == _TAG_TOTAL].groupby("g")["cnt"].sum())
    errs = (sk[sk["tag"] == _TAG_ERR].groupby("g")["cnt"].sum())
    thresholds, cand_map, exact_groups = {}, {}, []
    wordrows = sk[sk["tag"] == _TAG_WORD]
    for g, n_g in totals.items():
        n_g = int(n_g)
        e_g = int(errs.get(g, 0))
        thr = -(-n_g * min_ppm // 1_000_000)  # ceil
        thresholds[g] = thr
        if thr > e_g or n_g == 0:
            wr = wordrows[wordrows["g"] == g]
            cand_map[g] = set(wr.loc[wr["cnt"] >= thr - e_g, "word"])
        else:
            exact_groups.append(g)  # per-group fallback (see docstring)
    if exact_groups:
        import warnings

        warnings.warn(
            f"grouped_heavy_hitters: groups {sorted(exact_groups)} exceed "
            "the MG error bound; counting their full vocabulary exactly",
            stacklevel=2)
    cand_ref = ray.put((cand_map, set(exact_groups)))

    def exact(b: pa.Table) -> pa.Table:
        cands, full = ray.get(cand_ref)
        text = b[text_col].combine_chunks()
        words = pc.split_pattern(pc.fill_null(text, ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.repeat(
            b[group_col].to_numpy(zero_copy_only=False), np.diff(off))
        df = pd.DataFrame({"g": grp, "w": words.values.to_pandas()})
        frames = []
        for g, sub in df.groupby("g", sort=False):
            vc = sub["w"].value_counts()
            if g not in full:
                vc = vc[vc.index.isin(cands.get(g, ()))]
            if len(vc):
                frames.append(pd.DataFrame({
                    "g": g, "word": vc.index.to_numpy(object),
                    "n": vc.to_numpy(np.int64)}))
        if not frames:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "g": pa.array(out["g"].to_numpy(object), type=pa.string()),
            "word": pa.array(out["word"].to_numpy(object), type=pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        })

    counted = hash_bucket(
        ds.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True),
        "word", num_buckets)

    thr_ref = ray.put(thresholds)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        thr = ray.get(thr_ref)
        out = g.groupby(["g", "word"], sort=False)["n"].sum().reset_index()
        keep = out["n"] >= out["g"].map(lambda x: thr.get(x, 1)).astype("int64")
        out = out[keep].rename(columns={"g": group_col}).reset_index(drop=True)
        return out[[group_col, "word", "n"]]

    return counted.groupby("_part").map_groups(final, batch_format="pandas")


def hll_merged_registers(ds, col: str, *, p: int = 12,
                         hash_fn: str = "pandas") -> np.ndarray:
    """The register-vector half of ``distinct_count_hll``: per-block
    partial register tables merged by slot-wise max -> int64 vector of
    length 2^p.  ``hash_fn="pandas"`` is the production siphash;
    ``"md5"`` hashes rows with DuckDB's ``md5_number_lower`` so a SQL
    oracle can rebuild every register from the raw column (see
    queries_ext `hll_md5_registers`)."""
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        s = b[col].to_pandas()
        if hash_fn == "md5":
            from deduplicator_ray.stages.simhash import _md5_lower64

            h = _md5_lower64(s.to_numpy(dtype=object))
        else:
            h = pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel ones
        # rho = 1-based position of the first 1 bit of the remaining
        # 64-p bits (the sentinel low bits cap it at 64-p+1, and make
        # rest always nonzero).  bit_length via vectorized binary
        # shift-accumulation — no per-row Python.
        bl = np.zeros(len(h), dtype=np.int64)
        v = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(s))
            bl[big] += s
            v[big] >>= np.uint64(s)
        bl += (v > 0).astype(np.int64)
        rho = (64 - bl + 1).astype(np.uint8)
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, idx, rho)
        return pa.table({"reg": pa.array(regs, type=pa.uint8()),
                         "slot": pa.array(np.arange(m, dtype=np.int32))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    regs = np.zeros(m, dtype=np.int64)
    if len(parts):
        agg = parts.groupby("slot")["reg"].max()
        regs[agg.index.to_numpy()] = agg.to_numpy()
    return regs


def distinct_count_hll(ds, col: str, *, p: int = 12):
    """Approximate distinct count with ZERO key shuffle -> dict
    (estimate BIGINT, registers m, std_error_pct) — HyperLogLog
    (Flajolet, Fusy, Gandouet, Meunier 2007) with the standard
    small-range linear-counting correction.

    Every other distinct in this engine is exact; this is the scale
    TOOL the exact ops can't be: at 10^12 rows an exact distinct of a
    high-cardinality key is itself a full shuffle, while the HLL moves
    ONE 2^p-byte register vector per block and merges by elementwise
    max (associative + commutative + idempotent => order-independent
    and retry-safe).  Relative error ~= 1.04/sqrt(2^p) (1.6% at p=12).

    Deterministic given the column values (fixed siphash key), so the
    driver check can golden-pin it; pytest gates it against the exact
    count at the documented tolerance.
    """
    regs = hll_merged_registers(ds, col, p=p)
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:  # linear counting correction
        est = m * np.log(m / zeros)
    return {"estimate": int(round(est)), "registers": m,
            "std_error_pct": round(104.0 / np.sqrt(m), 2)}


def _cms_row_hashes(s: pd.Series, d: int, hash_fn: str) -> np.ndarray:
    """Per-depth 64-bit row hashes for the Count-Min family.
    ``"pandas"``: keyed siphash (production).  ``"md5"``:
    ``md5_number_lower('<d>|' || value)`` — DuckDB-recomputable, the
    correctness bridge for the `cms_md5_freq` oracle row (per-row
    string build; not a hot path)."""
    if hash_fn == "md5":
        from deduplicator_ray.stages.simhash import _md5_lower64

        vals = np.array([f"{d}|{v}" for v in s.astype(str)], dtype=object)
        return _md5_lower64(vals)
    return pd.util.hash_pandas_object(
        s, index=False, hash_key=f"{d:016d}").to_numpy(np.uint64)


def count_min_sketch(ds, col: str, *, width: int = 16384, depth: int = 4,
                     hash_fn: str = "pandas"):
    """Mergeable Count-Min sketch of a key column (Cormode &
    Muthukrishnan 2005) -> numpy int64 array of shape (depth, width).

    The frequency twin of ``distinct_count_hll``: per-block partial
    sketches merge by elementwise SUM (associative/commutative), so
    estimating key frequencies over 10^12 rows moves depth x width x 8 B
    per block and NO key ever rides a shuffle.  Point query via
    ``cms_query``: an overestimate only, within eps*N (eps = e/width)
    with probability 1 - e^-depth.  Deterministic (fixed per-row hash
    keys), so driver checks can golden-pin derived estimates.
    """
    def partial(b: pa.Table) -> pa.Table:
        s = b[col].to_pandas()
        sk = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            h = _cms_row_hashes(s, d, hash_fn)
            np.add.at(sk[d], (h % np.uint64(width)).astype(np.int64), 1)
        # emit only occupied cells: bounded by depth x distinct keys per
        # block, not depth x width
        flat = sk.ravel()
        nz = np.flatnonzero(flat)
        return pa.table({
            "row": pa.array((nz // width).astype(np.int32)),
            "slot": pa.array((nz % width).astype(np.int32)),
            "c": pa.array(flat[nz]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    sk = np.zeros((depth, width), dtype=np.int64)
    if len(parts):
        agg = parts.groupby(["row", "slot"])["c"].sum()
        idx = agg.index.to_frame().to_numpy()
        sk[idx[:, 0], idx[:, 1]] = agg.to_numpy()
    return sk


def cms_query(sketch: np.ndarray, keys, *, hash_fn: str = "pandas") -> np.ndarray:
    """Point-query a ``count_min_sketch`` result for ``keys`` (list-like
    of the key column's values) -> int64 estimates (min over rows —
    never an underestimate).  ``hash_fn`` must match the sketch's."""
    depth, width = sketch.shape
    s = pd.Series(list(keys))
    est = np.full(len(s), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        h = _cms_row_hashes(s, d, hash_fn)
        est = np.minimum(est, sketch[d, (h % np.uint64(width)).astype(np.int64)])
    return est


def log_histogram_quantiles(ds, col: str, *, qs: tuple[int, ...] = (50, 90, 99)):
    """Mergeable log2-histogram quantiles for UNBOUNDED non-negative
    int domains -> pandas DataFrame (q BIGINT, lo BIGINT, hi BIGINT).

    ``length_quantiles`` is exact but needs a bounded value domain (its
    histogram is |distinct values|); this is its unbounded-domain
    partner: 65 power-of-two buckets per block (value v -> bucket
    bit_length(v), bucket 0 = value 0), merged by elementwise sum —
    constant-size partials, zero key shuffle, deterministic.  The
    q-quantile is bracketed to its bucket: lo <= q-th value <= hi with
    hi <= 2*lo (a factor-2 relative bound), which is what an operator
    sizing batch/window knobs from a 10^12-row column actually needs.
    Same discrete convention as length_quantiles: element ceil(q*n/100)-1
    (0-based) of the sorted values.
    """
    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (v < 0).any():
            raise ValueError("log_histogram_quantiles: negative values")
        # bucket = bit_length(v): vectorized shift-accumulation
        bl = np.zeros(len(v), dtype=np.int64)
        w = v.astype(np.uint64)
        for s in (32, 16, 8, 4, 2, 1):
            big = w >= (np.uint64(1) << np.uint64(s))
            bl[big] += s
            w[big] >>= np.uint64(s)
        bl += (w > 0).astype(np.int64)
        counts = np.bincount(bl, minlength=65).astype(np.int64)
        return pa.table({"bucket": pa.array(np.arange(65, dtype=np.int32)),
                         "c": pa.array(counts)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    hist = np.zeros(65, dtype=np.int64)
    if len(parts):
        agg = parts.groupby("bucket")["c"].sum()
        hist[agg.index.to_numpy()] = agg.to_numpy()
    n = int(hist.sum())
    cum = np.cumsum(hist)
    rows = []
    for q in qs:
        if n == 0:
            rows.append((int(q), -1, -1))
            continue
        rank = -(-q * n // 100) - 1  # 0-based ceil(q*n/100)-1
        b = int(np.searchsorted(cum, rank + 1))
        lo = 0 if b == 0 else 1 << (b - 1)
        hi = 0 if b == 0 else (1 << b) - 1
        rows.append((int(q), int(lo), int(hi)))
    return pd.DataFrame(rows, columns=["q", "lo", "hi"]).astype("int64")


def freq_spectrum(ds, *, text_col: str = "text", num_buckets: int = 64):
    """Corpus word frequency-of-frequencies spectrum -> pyarrow Table
    (n_occurrences BIGINT, n_words BIGINT): how many distinct words
    occur exactly k times — the Zipf-tail / Good-Turing shape (Gale &
    Sampson 1995) a vocabulary or smoothing recipe reads first.

    Shape: per-block word-hash partial counts (8-byte rows through the
    wide shuffle — same siphash identity contract as vocabulary_stats:
    a 64-bit collision would merge two words' counts), ONE word-hash
    shuffle with per-bucket exact summing, then <= O(distinct
    frequencies) spectrum partials per bucket merged on the driver
    (distinct frequency values are tiny next to the vocabulary).
    """
    from deduplicator_ray.stages.exact import hash_bucket

    def partials(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ).combine_chunks()
        h = pd.util.hash_array(
            words.flatten().to_pandas().to_numpy(object)).astype(np.int64)
        w, n = np.unique(h, return_counts=True)
        return pa.table({"w": pa.array(w, type=pa.int64()),
                         "n": pa.array(n.astype(np.int64), type=pa.int64())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "w" not in df.columns:
            return pd.DataFrame({
                "n_occurrences": pd.Series([], dtype="int64"),
                "n_words": pd.Series([], dtype="int64")})
        wc = df.groupby("w", sort=False)["n"].sum()
        k, c = np.unique(wc.to_numpy(dtype=np.int64), return_counts=True)
        return pd.DataFrame({"n_occurrences": k,
                             "n_words": c.astype("int64")})

    spec = (hash_bucket(
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True), "w", num_buckets)
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    if spec.empty:  # zero groups -> column-less frame from to_pandas
        return pa.table({"n_occurrences": pa.array([], type=pa.int64()),
                         "n_words": pa.array([], type=pa.int64())})
    out = (spec.groupby("n_occurrences", as_index=False)
           .agg(n_words=("n_words", "sum")))
    out["n_occurrences"] = out["n_occurrences"].astype("int64")
    out["n_words"] = out["n_words"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def oov_rate(ds, *, group_col: str = "source", text_col: str = "text",
             vocab_k: int = 16, num_buckets: int = 64):
    """Out-of-vocabulary rate per group against the corpus's EXACT
    top-``vocab_k`` words (count desc, word asc tie-break) -> Dataset
    (group, n_tokens, n_oov, oov_ppm) — the tokenizer-coverage metric a
    vocab/tokenizer recipe reads per source before fixing a vocabulary.

    Two passes, both scale-shaped: (1) exact global word counts via ONE
    word-key shuffle where each bucket's LOCAL top-k is globally correct
    for its words (a word's whole count lives in one bucket), k x
    buckets candidate rows merge on the driver; (2) the tiny vocab set
    broadcasts via ray.put into a map-only counting pass + a
    groups-bounded final merge.
    """
    import ray

    from deduplicator_ray.stages.exact import hash_bucket

    def wc_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ).combine_chunks()
        w, n = np.unique(words.flatten().to_pandas().to_numpy(object),
                         return_counts=True)
        return pa.table({"w": pa.array(w, type=pa.string()),
                         "n": pa.array(n.astype(np.int64), type=pa.int64())})

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "w" not in df.columns:
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        g = df.groupby("w", as_index=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return (g.sort_values(["n", "w"], ascending=[False, True],
                              kind="mergesort").head(vocab_k))

    cand = (hash_bucket(
        ds.map_batches(wc_partial, batch_format="pyarrow",
                       zero_copy_batch=True), "w", num_buckets)
        .groupby("_part")
        .map_groups(lambda g: bucket_topk(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    cand = cand.sort_values(["n", "w"], ascending=[False, True],
                            kind="mergesort").head(vocab_k)
    vocab_ref = ray.put(frozenset(cand["w"]))

    def count_oov(b: pa.Table, *, _v=vocab_ref) -> pa.Table:
        vocab = ray.get(_v) if isinstance(_v, ray.ObjectRef) else _v
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ).combine_chunks()
        lens = np.diff(words.offsets.to_numpy())
        flat = words.flatten()
        in_vocab = pc.is_in(
            flat, value_set=pa.array(sorted(vocab), type=pa.string()))
        oov = 1 - np.asarray(in_vocab).astype(np.int64)
        grp = np.repeat(b[group_col].to_pandas().to_numpy(object), lens)
        g = (pd.DataFrame({"g": grp, "t": 1, "o": oov})
             .groupby("g", as_index=False)
             .agg(n_tokens=("t", "sum"), n_oov=("o", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(count_oov, batch_format="pyarrow",
                           zero_copy_batch=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("g", as_index=False).agg(
            n_tokens=("n_tokens", "sum"), n_oov=("n_oov", "sum"))
        out = pd.DataFrame({
            group_col: g["g"],
            "n_tokens": g["n_tokens"].astype("int64"),
            "n_oov": g["n_oov"].astype("int64"),
        })
        out["oov_ppm"] = (out["n_oov"] * 1_000_000) // out["n_tokens"]
        return out

    return (hash_bucket(parts, "g", num_buckets)
            .groupby("_part")
            .map_groups(lambda g: final(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def kmv_sketch(ds, *, text_col: str = "text", k: int = 256,
               ngram: int = 1, hash_fn: str = "pandas") -> np.ndarray:
    """K-minimum-values distinct sketch of a corpus's word ``ngram``s
    (Beyer et al. 2007, "On synopses for distinct value estimation under
    multiset operations"): the k smallest 64-bit gram hashes, sorted
    uint64.  Deterministic given the corpus (same siphash identity as
    the other word operators), so estimates are exactly reproducible
    and golden-pinnable.

    Shape: each block emits AT MOST k candidate rows (its local k
    smallest distinct hashes — any global k-minimum is a local one);
    the driver merge is bounded by k x blocks.  Zero shuffle.
    """
    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(b[text_col].combine_chunks(), ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten().to_pandas().to_numpy(object)
        if ngram > 1:
            # within-row n-grams: positions whose whole window stays
            # inside one document's word list
            offs = np.asarray(words.offsets, dtype=np.int64)
            offs = offs - offs[0]
            row_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
            n = len(flat) - (ngram - 1)
            if n <= 0:
                return pa.table({"h": pa.array([], type=pa.uint64())})
            keep = row_of[:n] == row_of[ngram - 1:]
            grams = flat[:n]
            for j in range(1, ngram):
                grams = np.char.add(np.char.add(
                    grams.astype(str), " "), flat[j:n + j].astype(str))
            vals = grams[keep].astype(object)
        else:
            vals = flat
        if hash_fn == "md5":
            from deduplicator_ray.stages.simhash import _md5_lower64

            h = np.unique(_md5_lower64(vals))
        else:
            h = np.unique(pd.util.hash_array(vals))
        return pa.table({"h": pa.array(h[:k], type=pa.uint64())})

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .to_pandas())
    merged = np.unique(parts["h"].to_numpy(dtype=np.uint64))
    return merged[:k]


def kmv_estimate(sk: np.ndarray, k: int) -> int:
    """Distinct-count estimate from a KMV sketch: exact when the sketch
    isn't full, else the unbiased (k-1) / normalized-k-th-minimum — all
    integer arithmetic (python bigints), bit-reproducible."""
    if len(sk) < k:
        return int(len(sk))
    th = int(sk[k - 1]) + 1  # hash values are uniform over [0, 2^64)
    return ((k - 1) << 64) // th


def kmv_overlap(ds_a, ds_b, *, text_col: str = "text",
                k: int = 256, ngram: int = 1,
                hash_fn: str = "pandas") -> dict:
    """Sketch-side corpus vocabulary overlap — union and intersection
    distinct-word estimates from two KMV sketches WITHOUT a join: the
    scale path for "how much do these two 10 TB corpora share?" where
    the exact answer (corpus_overlap / source_overlap) would shuffle
    both vocabularies.

    Union sketch = k smallest of the sketches' merged hash sets; with
    K = |union sketch| (= k when full), est_union from kmv_estimate and
    est_intersection = (|union sketch ∩ A ∩ B| * est_union) // K — the
    standard KMV multiset-operation estimator, integer end to end.
    """
    a = kmv_sketch(ds_a, text_col=text_col, k=k, ngram=ngram,
                   hash_fn=hash_fn)
    b = kmv_sketch(ds_b, text_col=text_col, k=k, ngram=ngram,
                   hash_fn=hash_fn)
    union = np.unique(np.concatenate([a, b]))[:k]
    kk = min(k, len(union))
    est_union = kmv_estimate(union, k)
    in_both = np.isin(union, a) & np.isin(union, b)
    n_both = int(in_both.sum())
    est_inter = (n_both * est_union) // max(kk, 1)
    return {
        "k": int(k),
        "est_distinct_a": kmv_estimate(a, k),
        "est_distinct_b": kmv_estimate(b, k),
        "est_union": est_union,
        "est_intersection": est_inter,
    }


def vocab_growth(ds, *, max_id: int, id_col: str = "doc_id",
                 text_col: str = "text", num_stops: int = 10,
                 num_buckets: int = 64):
    """Heaps-law vocabulary-saturation curve -> pyarrow Table
    (stop BIGINT, new_words BIGINT, cum_words BIGINT): distinct words
    seen in the corpus PREFIX (doc_id order) ending at each of
    ``num_stops`` equal id-range stops — the "is more crawl still buying
    vocabulary?" read a tokenizer/corpus recipe takes before fixing a
    vocab size (Heaps 1978).

    stop(doc) = doc_id * num_stops // (max_id + 1) — exact integer
    arithmetic mirrored by the SQL oracle; ``max_id`` comes from parquet
    row-group statistics (metadata-only, zero data read) in the query
    wrapper, so the kernel itself is single-pass.

    Shape: per-block (word-hash, min-stop) partials (16 B rows — same
    siphash identity contract as freq_spectrum: a 64-bit collision would
    merge two words' first-seen stops), ONE word-hash shuffle with
    per-bucket exact min + first-seen histogram partials, then
    <= num_stops rows per bucket merge on the driver.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    if num_stops < 1:
        raise ValueError("num_stops must be >= 1")
    if max_id < 0 or max_id > 2**62 // max(num_stops, 1):
        raise ValueError("max_id out of the exact-arithmetic range")
    span = max_id + 1

    def partials(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() > max_id):
            raise ValueError("doc ids must lie in [0, max_id]")
        words = pc.split_pattern(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ).combine_chunks()
        lens = np.diff(words.offsets.to_numpy())
        h = pd.util.hash_array(
            words.flatten().to_pandas().to_numpy(object)).astype(np.int64)
        st = np.repeat(ids * num_stops // span, lens)
        g = (pd.DataFrame({"w": h, "s": st})
             .groupby("w", as_index=False, sort=False)["s"].min())
        return pa.table({"w": pa.array(g["w"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64))})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "w" not in df.columns:
            return pd.DataFrame({"s": pd.Series([], dtype="int64"),
                                 "new_words": pd.Series([], dtype="int64")})
        fs = df.groupby("w", sort=False)["s"].min()
        k, c = np.unique(fs.to_numpy(dtype=np.int64), return_counts=True)
        return pd.DataFrame({"s": k, "new_words": c.astype("int64")})

    hist = (hash_bucket(
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True), "w", num_buckets)
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    full = np.zeros(num_stops, dtype=np.int64)
    if not hist.empty and "s" in hist.columns:
        per = hist.groupby("s")["new_words"].sum()
        full[per.index.to_numpy()] = per.to_numpy()
    return pa.table({
        "stop": pa.array(np.arange(num_stops, dtype=np.int64)),
        "new_words": pa.array(full),
        "cum_words": pa.array(np.cumsum(full)),
    })


def dup_growth(ds, *, max_id: int, id_col: str = "doc_id",
               text_col: str = "text", num_stops: int = 10,
               num_buckets: int = 64):
    """Dedup-saturation curve -> pyarrow Table (stop, n_docs, n_dups,
    cum_docs, cum_dups, cum_dup_ppm — all BIGINT): exact-duplicate rate
    of the corpus PREFIX (doc_id order) at ``num_stops`` equal id-range
    stops.  A doc is a duplicate iff an earlier doc (smaller id) has
    byte-identical (null-coalesced) text — so the curve answers "how fast
    is the marginal crawl going stale?", the capacity-planning twin of
    vocab_growth.

    Shape: ONE text-hash shuffle of (hash, id, stop) rows (24 B/row, the
    text itself never moves — same 64-bit collision contract as
    freq_spectrum), per-bucket min-id election + dup histogram partials;
    per-stop doc totals ride a separate map-only pass.  Driver merges
    2 x num_stops histogram rows and cumsums.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    if num_stops < 1:
        raise ValueError("num_stops must be >= 1")
    if max_id < 0 or max_id > 2**62 // max(num_stops, 1):
        raise ValueError("max_id out of the exact-arithmetic range")
    span = max_id + 1

    def keyed(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() > max_id):
            raise ValueError("doc ids must lie in [0, max_id]")
        txt = (b[text_col].to_pandas().fillna("").to_numpy(object))
        h = pd.util.hash_array(txt).astype(np.int64)
        return pa.table({"h": pa.array(h),
                         "doc_id": pa.array(ids),
                         "s": pa.array(ids * num_stops // span)})

    def dup_hist(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "h" not in df.columns:
            return pd.DataFrame({"s": pd.Series([], dtype="int64"),
                                 "n_dups": pd.Series([], dtype="int64")})
        dup = df["doc_id"] != df.groupby("h")["doc_id"].transform("min")
        k, c = np.unique(df.loc[dup, "s"].to_numpy(dtype=np.int64),
                         return_counts=True)
        return pd.DataFrame({"s": k, "n_dups": c.astype("int64")})

    dups = (hash_bucket(
        ds.map_batches(keyed, batch_format="pyarrow",
                       zero_copy_batch=True), "h", num_buckets)
        .groupby("_part")
        .map_groups(lambda g: dup_hist(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())

    def doc_hist(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        k, c = np.unique(ids * num_stops // span, return_counts=True)
        return pa.table({"s": pa.array(k.astype(np.int64)),
                         "n_docs": pa.array(c.astype(np.int64))})

    docs = ds.map_batches(doc_hist, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()

    nd = np.zeros(num_stops, dtype=np.int64)
    if not docs.empty and "s" in docs.columns:
        per = docs.groupby("s")["n_docs"].sum()
        nd[per.index.to_numpy()] = per.to_numpy()
    du = np.zeros(num_stops, dtype=np.int64)
    if not dups.empty and "s" in dups.columns:
        per = dups.groupby("s")["n_dups"].sum()
        du[per.index.to_numpy()] = per.to_numpy()
    cd, cu = np.cumsum(nd), np.cumsum(du)
    ppm = np.where(cd > 0, cu * 1_000_000 // np.maximum(cd, 1), 0)
    return pa.table({
        "stop": pa.array(np.arange(num_stops, dtype=np.int64)),
        "n_docs": pa.array(nd), "n_dups": pa.array(du),
        "cum_docs": pa.array(cd), "cum_dups": pa.array(cu),
        "cum_dup_ppm": pa.array(ppm.astype(np.int64)),
    })
