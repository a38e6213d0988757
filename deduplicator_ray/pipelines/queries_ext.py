"""Training-data-pipeline queries over the ``documents`` / ``embeddings``
tables: dedup strategies, similarity search, and text analysis as
first-class driver-checked entries (extension list alongside SURVEY.md §2).

Oracle parity notes:
- Regex counters use RE2 on BOTH sides (pyarrow ``count_substring_regex``
  and DuckDB ``regexp_extract_all`` are both RE2) so semantics match
  exactly, including escape handling.
- Cosine similarities are computed in float64 on both sides (numpy
  float64 matmul vs DuckDB ``::DOUBLE[]`` + ``list_cosine_similarity``);
  thresholds sit far from any observed pair value, so 1e-15 summation
  drift cannot flip a comparison.
- Jaccard thresholds compare integers (``2*inter >= union``), never
  floats.

Non-SQL-expressible pipelines (MinHash/LSH/CC clustering, SimHash,
suffix-array longest-repeated-substring, winnowing sketches) are
registered without an oracle — the driver records a rows-only check and
pytest covers their semantics against in-process oracles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.functions.digesting import md5_hex_arrow

# ---------------------------------------------------------------------------
# D1: exact text dedup (hash-partition + per-group first)
# ---------------------------------------------------------------------------


def q_dedup_exact_text(sf_dir: str):
    """Exact dedup over ``documents``: md5(text) groups, earliest doc_id
    is canonical, everything else is a duplicate. The groupby is a hash
    shuffle on the digest — the per-group reduce never sees more than one
    digest's rows (scale-safe; hub digests are the only skew risk and
    they collapse to one tiny output row per member)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def dig(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"],
                         "digest": md5_hex_arrow(b["text"])})

    from deduplicator_ray.stages.exact import hash_bucket

    ds = hash_bucket(ds.map_batches(dig, batch_format="pyarrow", zero_copy_batch=True),
                     "digest", 64)

    def mark(g):
        # one call per hash bucket; per-digest min via vectorized transform
        g = g.drop(columns=["_part"]).copy()
        canonical = g.groupby("digest")["doc_id"].transform("min").astype("int64")
        g["canonical_id"] = canonical
        g["is_duplicate"] = g["doc_id"] != canonical
        return g[["doc_id", "digest", "canonical_id", "is_duplicate"]]

    return ds.groupby("_part").map_groups(mark, batch_format="pandas")


_SQL_DEDUP_EXACT_TEXT = """
SELECT doc_id, md5(text) AS digest,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents
"""

_DUPBAND_W = 8


def q_dup_rate_by_length(sf_dir: str):
    """Duplicate rate per document-length band — the composition
    diagnostic ("are short docs more duplicated?") a cleaning recipe
    reads before setting a min-length cutoff: md5(text) exact-dup
    election joined with word-count bands of width {w} words.

    ONE digest-key shuffle: each bucket elects min-doc_id per digest,
    then collapses to <= n_bands partial rows; the band merge is a tiny
    driver-side groupby."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def dig(b: pa.Table) -> pa.Table:
        txt = pc.coalesce(b["text"], pa.scalar("", b["text"].type))
        digests = md5_hex_arrow(txt)
        spaces = pc.subtract(
            pc.utf8_length(txt),
            pc.utf8_length(pc.replace_substring(txt, " ", "")))
        return pa.table({
            "doc_id": b["doc_id"],
            "dg": digests,
            "band": pc.divide(pc.add(pc.cast(spaces, pa.int64()), 1),
                              _DUPBAND_W),
        })

    def per_bucket(df):
        import pandas as pd

        is_dup = (df["doc_id"]
                  != df.groupby("dg")["doc_id"].transform("min"))
        g = (pd.DataFrame({"band": df["band"], "d": is_dup.astype("int64")})
             .groupby("band", as_index=False)
             .agg(n_docs=("d", "size"), n_dups=("d", "sum")))
        return g

    parts = (hash_bucket(
        ds.map_batches(dig, batch_format="pyarrow", zero_copy_batch=True),
        "dg", auto_partitions())
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    if parts.empty:  # zero groups -> column-less frame from to_pandas
        return pa.table({c: pa.array([], type=pa.int64())
                         for c in ("band", "n_docs", "n_dups", "dup_ppm")})
    out = parts.groupby("band", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_dups=("n_dups", "sum"))
    for c in ("band", "n_docs", "n_dups"):
        out[c] = out[c].astype("int64")
    out["dup_ppm"] = (out["n_dups"] * 1_000_000) // out["n_docs"]
    return pa.Table.from_pandas(out, preserve_index=False)


_SQL_DUP_RATE_BY_LENGTH = f"""
WITH d AS (
  SELECT doc_id,
         ((length(COALESCE(text, ''))
           - length(replace(COALESCE(text, ''), ' ', '')) + 1)
          // {_DUPBAND_W})::BIGINT AS band,
         md5(COALESCE(text, '')) AS dg
  FROM documents),
f AS (
  SELECT band,
         CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY dg)
              THEN 1 ELSE 0 END AS is_dup
  FROM d)
SELECT band, count(*)::BIGINT AS n_docs, sum(is_dup)::BIGINT AS n_dups,
       ((sum(is_dup) * 1000000) // count(*))::BIGINT AS dup_ppm
FROM f GROUP BY band
"""


def q_dedup_exact_norm(sf_dir: str):
    """Exact dedup keyed on the CCNet-style NORMALIZED text
    (functions/textnorm.py): accent-fold + case-fold + punct-strip +
    whitespace-collapse before hashing, so presentation variants
    collapse onto one key. Same hash-bucket shape as dedup_exact_text."""
    import ray.data as rd

    from deduplicator_ray.functions.textnorm import normalize_text_arrow

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def dig(b: pa.Table) -> pa.Table:
        norm = normalize_text_arrow(b["text"].combine_chunks())
        return pa.table({"doc_id": b["doc_id"],
                         "digest": md5_hex_arrow(norm)})

    from deduplicator_ray.stages.exact import hash_bucket

    ds = hash_bucket(ds.map_batches(dig, batch_format="pyarrow", zero_copy_batch=True),
                     "digest", 64)

    def mark(g):
        g = g.drop(columns=["_part"]).copy()
        canonical = g.groupby("digest")["doc_id"].transform("min").astype("int64")
        g["canonical_id"] = canonical
        g["is_duplicate"] = g["doc_id"] != canonical
        return g[["doc_id", "digest", "canonical_id", "is_duplicate"]]

    return ds.groupby("_part").map_groups(mark, batch_format="pandas")


def _sql_dedup_exact_norm() -> str:
    from deduplicator_ray.functions.textnorm import textnorm_sql_expr

    expr = textnorm_sql_expr("text")
    return f"""
SELECT doc_id, md5({expr}) AS digest,
       min(doc_id) OVER (PARTITION BY md5({expr})) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY md5({expr})) AS is_duplicate
FROM documents
"""


def q_tier_census(sf_dir: str):
    """THE tier-dedup summary, one row: duplicate counts per dedup tier
    over ``documents`` — exact text (md5), normalized text (CCNet-style
    key), near-duplicate (5-shingle Jaccard >= 0.8 connected
    components) — plus the distinct union (what a tiered pipeline would
    remove in total).  Every per-doc stream after the flag shuffles is
    bounded by DUP counts, not corpus size: the digest tiers emit only
    duplicate ids from their buckets, the near tier reuses the
    north-star cluster assignment (clustered docs only)."""
    import ray.data as rd

    from deduplicator_ray.functions.textnorm import normalize_text_arrow
    from deduplicator_ray.stages.exact import hash_bucket

    def dup_ids(key_of):
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

        def dig(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b["doc_id"], "k": key_of(b)})

        def mark(g):
            dup = g["doc_id"] != g.groupby("k")["doc_id"].transform("min")
            return g.loc[dup, ["doc_id"]]

        return (hash_bucket(
            ds.map_batches(dig, batch_format="pyarrow",
                           zero_copy_batch=True), "k", 64)
            .groupby("_part")
            .map_groups(lambda g: mark(g.drop(columns=["_part"])),
                        batch_format="pandas"))

    def md5_of(col: pa.Array) -> pa.Array:
        return md5_hex_arrow(col)

    # materialize: each stream is consumed twice (count + union)
    ex = dup_ids(lambda b: md5_of(b["text"].combine_chunks())).materialize()
    nm = dup_ids(lambda b: md5_of(
        normalize_text_arrow(b["text"].combine_chunks()))).materialize()

    asg = q_neardup_clusters(sf_dir)  # (doc_key, cluster_id), pandas
    near_ids = asg.loc[asg["doc_key"] != asg["cluster_id"],
                       ["doc_key"]].rename(columns={"doc_key": "doc_id"})

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    dup_exact, dup_norm = ex.count(), nm.count()
    dup_near = len(near_ids)

    # distinct union of the three (dup-bounded) id streams
    allids = ex.union(nm).union(rd.from_pandas(near_ids))

    def distinct_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["doc_id"], dtype=np.int64))
        return pa.table({"doc_id": pa.array(u, type=pa.int64())})

    dup_any = (hash_bucket(
        allids.map_batches(distinct_partial, batch_format="pyarrow",
                           zero_copy_batch=True), "doc_id", 16)
        .groupby("_part")
        .map_groups(lambda g: g.drop(columns=["_part"]).drop_duplicates(),
                    batch_format="pandas")
        .count())

    return pa.table({
        "n_docs": pa.array([n_docs], type=pa.int64()),
        "dup_exact": pa.array([dup_exact], type=pa.int64()),
        "dup_norm": pa.array([dup_norm], type=pa.int64()),
        "dup_near": pa.array([dup_near], type=pa.int64()),
        "dup_any": pa.array([dup_any], type=pa.int64()),
    })


def _sql_tier_census() -> str:
    from deduplicator_ray.functions.textnorm import textnorm_sql_expr

    nexpr = textnorm_sql_expr("text")
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_NEARDUP_NGRAM}
              THEN list_distinct(list_transform(range(1, len(w) - {_NEARDUP_NGRAM - 2}),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
              ELSE [] END AS g
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.g, b.g)) > 0
    AND {_NEARDUP_DEN} * len(list_intersect(a.g, b.g))
        >= {_NEARDUP_NUM} * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT rr.node, e.b FROM reach rr JOIN edges e ON rr.r = e.a
),
nr AS (
  SELECT node AS doc_id FROM
    (SELECT node, least(node, min(r)) AS c FROM reach GROUP BY node)
  WHERE node <> c
),
ex AS (
  SELECT doc_id FROM
    (SELECT doc_id,
            doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS d
     FROM documents) WHERE d
),
nm AS (
  SELECT doc_id FROM
    (SELECT doc_id,
            doc_id <> min(doc_id) OVER (PARTITION BY md5({nexpr})) AS d
     FROM documents) WHERE d
),
u AS (SELECT doc_id FROM ex UNION SELECT doc_id FROM nm
      UNION SELECT doc_id FROM nr)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(*) FROM ex)::BIGINT AS dup_exact,
       (SELECT count(*) FROM nm)::BIGINT AS dup_norm,
       (SELECT count(*) FROM nr)::BIGINT AS dup_near,
       (SELECT count(*) FROM u)::BIGINT AS dup_any
"""


# ---------------------------------------------------------------------------
# D2: n-gram Jaccard dedup (exact, lang-blocked; LSH is the scale path)
# ---------------------------------------------------------------------------

_NGRAM_N = 3
_JACCARD_NUM = 1  # threshold = _JACCARD_NUM / _JACCARD_DEN (integer compare)
_JACCARD_DEN = 2


def q_ngram_jaccard(sf_dir: str):
    """Pairs (doc_a < doc_b) within a ``lang`` block whose word-3-gram
    Jaccard is >= 0.5, with integer intersection/union sizes.

    Distributed prefix-filter pipeline (stages/jaccard.py): candidate
    groups are (prefix-gram, lang) buckets — bounded by prefix-gram doc
    frequency, never "all docs of one language" — and the prefix-filter
    theorem guarantees the SAME pair set as the all-pairs SQL oracle."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    return ngram_jaccard_pairs(
        ds, num=_JACCARD_NUM, den=_JACCARD_DEN, ngram=_NGRAM_N
    )


_SQL_NGRAM_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         CASE WHEN len(w) >= {_NGRAM_N}
              THEN list_distinct(list_transform(range(1, len(w) - {_NGRAM_N - 2}),
                                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [] END AS g
  FROM toks
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.g, b.g)) AS n_inter,
       len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS n_union
FROM grams a JOIN grams b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.g, b.g)) > 0
  AND {_JACCARD_DEN} * len(list_intersect(a.g, b.g))
      >= {_JACCARD_NUM} * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
"""

def q_weighted_jaccard_pairs(sf_dir: str):
    """Exact weighted (multiset) Jaccard near-dup pairs over 3-gram
    term frequencies: sum-min / sum-max >= 1/2, same-lang, all-integer
    output (stages/jaccard.weighted_jaccard_pairs — weighted AllPairs
    prefix filter, provably complete, overflow='error').  Catches
    repeated-boilerplate templates the distinct-gram Jaccard saturates
    on; the DuckDB oracle recomputes the same min/max sums from the raw
    text."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import weighted_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    return weighted_jaccard_pairs(ds, num=_JACCARD_NUM, den=_JACCARD_DEN,
                                  ngram=_NGRAM_N)


_SQL_WEIGHTED_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         CASE WHEN len(w) >= {_NGRAM_N}
              THEN list_transform(range(1, len(w) - {_NGRAM_N - 2}),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              ELSE [] END AS g
  FROM toks
),
eg AS (SELECT doc_id, lang, unnest(g) AS gram FROM grams),
c AS (SELECT doc_id, lang, gram, count(*) AS c FROM eg GROUP BY ALL),
tot AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(least(a.c, b.c)) AS w_inter
  FROM c a JOIN c b ON a.gram = b.gram AND a.lang = b.lang
                    AND a.doc_id < b.doc_id
  GROUP BY ALL
)
SELECT doc_a, doc_b, CAST(w_inter AS BIGINT) AS w_inter,
       CAST(ta.n + tb.n - w_inter AS BIGINT) AS w_union
FROM inter
JOIN tot ta ON ta.doc_id = doc_a
JOIN tot tb ON tb.doc_id = doc_b
WHERE w_inter > 0
  AND {_JACCARD_DEN} * w_inter >= {_JACCARD_NUM} * (ta.n + tb.n - w_inter)
"""


def q_cws_jaccard_pairs(sf_dir: str):
    """Weighted-Jaccard pairs via Consistent Weighted Sampling sketches
    (stages/jaccard.cws_jaccard_pairs) — the SCALE path for
    ``weighted_jaccard_pairs`` when stopword-heavy gram universes blow
    up the exact prefix filter.  Candidates come from banded CWS
    samples (Ioffe 2010: collision probability exactly J_w) and every
    candidate is verified EXACTLY, so the output matches the exact
    path's pair set whenever the sketch recall holds (pytest-gated
    >= 0.99; 1.0 at both driver scales) and the same DuckDB oracle
    applies."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import cws_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    return cws_jaccard_pairs(ds, num=_JACCARD_NUM, den=_JACCARD_DEN,
                             ngram=_NGRAM_N)


_CURVE_NUM, _CURVE_DEN, _CURVE_BANDS = 1, 5, 20


def q_jaccard_curve(sf_dir: str):
    """Dedup-threshold tuning curve: candidate-pair counts per 5%
    Jaccard band (band = floor(20 * J)), computed from the exact
    prefix-filter pair pipeline at a LOW floor (J >= 1/5) — the census a
    recipe reads to place the near-dup cutoff where the pair mass
    actually separates.  Pairs never leave the cluster: each band
    partial collapses to at most the band count per block."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    pairs = ngram_jaccard_pairs(ds, num=_CURVE_NUM, den=_CURVE_DEN,
                                ngram=_NGRAM_N)

    def band_partial(b: pa.Table) -> pa.Table:
        inter = np.asarray(b["n_inter"], dtype=np.int64)
        union = np.asarray(b["n_union"], dtype=np.int64)
        band = (_CURVE_BANDS * inter) // np.maximum(union, 1)
        bk, n = np.unique(band, return_counts=True)
        return pa.table({"band": pa.array(bk, type=pa.int64()),
                         "n_pairs": pa.array(n.astype(np.int64),
                                             type=pa.int64())})

    parts = pairs.map_batches(band_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    if parts.empty:
        return pa.table({"band": pa.array([], type=pa.int64()),
                         "n_pairs": pa.array([], type=pa.int64())})
    out = parts.groupby("band", as_index=False).agg(
        n_pairs=("n_pairs", "sum"))
    out["band"] = out["band"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


_SQL_JACCARD_CURVE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         CASE WHEN len(w) >= {_NGRAM_N}
              THEN list_distinct(list_transform(range(1, len(w) - {_NGRAM_N - 2}),
                                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [] END AS g
  FROM toks
),
p AS (
  SELECT len(list_intersect(a.g, b.g))::BIGINT AS n_inter,
         (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))::BIGINT AS n_union
  FROM grams a JOIN grams b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.g, b.g)) > 0
    AND {_CURVE_DEN} * len(list_intersect(a.g, b.g))
        >= {_CURVE_NUM} * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
)
SELECT (({_CURVE_BANDS} * n_inter) // greatest(n_union, 1))::BIGINT AS band,
       count(*)::BIGINT AS n_pairs
FROM p GROUP BY 1
"""


_CONT_NUM, _CONT_DEN, _CONT_STOP_DF = 7, 10, 5


def q_ngram_containment(sf_dir: str):
    """Asymmetric near-dup (stages/jaccard.py:ngram_containment_pairs):
    containment |A∩B|/min >= {_CONT_NUM}/{_CONT_DEN} over rare distinct
    {_NGRAM_N}-grams (df <= {_CONT_STOP_DF}) — quote/wrapper detection
    Jaccard misses."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_containment_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ngram_containment_pairs(ds, num=_CONT_NUM, den=_CONT_DEN,
                                   ngram=_NGRAM_N, stop_df=_CONT_STOP_DF)


_SQL_NGRAM_CONTAINMENT = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_NGRAM_N}
              THEN list_distinct(list_transform(range(1, len(w) - {_NGRAM_N - 2}),
                                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [] END AS g
  FROM toks
),
eg AS (SELECT doc_id, unnest(g) AS gram FROM grams),
df AS (SELECT gram, count(*) AS c FROM eg GROUP BY gram),
rare AS (SELECT doc_id, gram FROM eg JOIN df USING (gram)
         WHERE c <= {_CONT_STOP_DF}),
sz AS (SELECT doc_id, count(*) AS n FROM rare GROUP BY doc_id),
inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
          FROM rare a JOIN rare b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT inter.a AS doc_a, inter.b AS doc_b,
       i AS n_inter, least(sa.n, sb.n) AS n_min
FROM inter
JOIN sz sa ON sa.doc_id = inter.a
JOIN sz sb ON sb.doc_id = inter.b
WHERE {_CONT_DEN} * i >= {_CONT_NUM} * least(sa.n, sb.n)
"""


# ---------------------------------------------------------------------------
# D3: embedding-cosine near-dup pairs
# ---------------------------------------------------------------------------

_EMB_DUP_THRESHOLD = 0.4


def q_embed_dup_pairs(sf_dir: str):
    """Embedding near-dup: all pairs (a < b) with float64 cosine >=
    threshold. Broadcast-matrix matmul per batch (ray.put once); scale
    path is hyperplane-LSH bucketing (stages/embed.py)."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import embedding_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_dup_pairs(ds, threshold=_EMB_DUP_THRESHOLD)
    return pairs.select_columns(["a", "b"])


_SQL_EMB_DUP_PAIRS = f"""
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {_EMB_DUP_THRESHOLD}
"""

def q_embed_dedup_keep(sf_dir: str):
    """SemDeDup-style semantic dedup (stages/embed.py:
    embedding_dedup_keep): connected components over the cosine >=
    threshold graph, keep the min vec_id per component; singletons keep.
    Returns (vec_id, keep) for every embedding row."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import embedding_dedup_keep

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return embedding_dedup_keep(ds, threshold=_EMB_DUP_THRESHOLD)


_INC_EMB_THRESHOLD = 0.42  # the synthetic embeddings are diffuse (no
# cross pairs above cosine 0.5), so the DEMO threshold sits where the
# operator actually matches; the API default stays 0.9


def q_incremental_embed_dedup(sf_dir: str):
    """Snapshot-over-snapshot SEMANTIC dedup (stages/embed.py:
    incremental_embed_dedup): vectors with vec_id % 4 == 0 play the
    existing corpus, the rest the new snapshot; one row per new vector
    whose best old match reaches cosine >= {t} — (vec_id, dup_of,
    cos_micro), best = highest cosine then smallest old id, cosine in
    1e-6 integer units (the decontaminate_embed convention).  The
    embedding-space complement of ``incremental_neardup``."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import incremental_embed_dedup

    def side(keep_old: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["vec_id"].to_numpy() % 4 == 0
            return b.filter(pa.array(m if keep_old else ~m))
        return f

    read = lambda: rd.read_parquet(  # noqa: E731 - two independent scans
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    old = read().map_batches(side(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    new = read().map_batches(side(False), batch_format="pyarrow",
                             zero_copy_batch=True)
    return incremental_embed_dedup(new, old, threshold=_INC_EMB_THRESHOLD)


_SQL_INCREMENTAL_EMBED_DEDUP = f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
o AS MATERIALIZED (SELECT * FROM emb WHERE vec_id % 4 = 0),
n AS (SELECT * FROM emb WHERE vec_id % 4 <> 0),
nn AS (
  SELECT n.vec_id, o.vec_id AS dup_of,
         list_cosine_similarity(n.v, o.v) AS c,
         row_number() OVER (PARTITION BY n.vec_id
                            ORDER BY list_cosine_similarity(n.v, o.v) DESC,
                                     o.vec_id) AS rn
  FROM n JOIN o ON true
)
SELECT vec_id, dup_of,
       CAST(floor(c * 1000000 + 0.5) AS BIGINT) AS cos_micro
FROM nn WHERE rn = 1 AND c >= {_INC_EMB_THRESHOLD} ORDER BY vec_id
"""


_SQL_EMB_DEDUP_KEEP = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= {_EMB_DUP_THRESHOLD}
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT rr.node, e.b FROM reach rr JOIN edges e ON rr.r = e.a
),
asg AS (
  SELECT node, least(node, min(r)) AS cluster_id FROM reach GROUP BY node
)
SELECT v.vec_id, COALESCE(a.cluster_id = v.vec_id, TRUE) AS keep
FROM embeddings v LEFT JOIN asg a ON v.vec_id = a.node
"""


# ---------------------------------------------------------------------------
# D4: similarity search — brute-force cosine top-k
# ---------------------------------------------------------------------------

_TOPK_K = 10
_TOPK_NQ = 8


def _topk_query_matrix(sf_dir: str) -> np.ndarray:
    """The shared query matrix of the ANN queries: the first _TOPK_NQ
    embeddings sorted by vec_id (the fixture's vec_ids are contiguous
    from 0, so row index == vec_id == query_id in the outputs)."""
    import pyarrow.parquet as pq

    qtbl = (
        pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
        .filter(pc.less(pc.field("vec_id"), _TOPK_NQ))
        .sort_by("vec_id")
    )
    return np.stack(qtbl["embedding"].to_pylist()).astype(np.float64)


def q_embed_covariance(sf_dir: str):
    """Distributed embedding covariance (the PCA/whitening/Mahalanobis
    second-moment pass): one map-only pass of int64 [sum x, sum x x^T,
    n] block partials over milli-quantized elements — exact integer
    arithmetic end to end, so the reduction is order-independent and
    the DuckDB oracle recomputes the numerators verbatim.  Output: one
    row per (i, j) cell, cov_num = n*S_ij - S_i*S_j (= n^2 * 10^6 *
    cov of the quantized vectors)."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import embedding_covariance

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    _, _, _, cov_num = embedding_covariance(ds, grid=1000)
    d = cov_num.shape[0]
    ii, jj = np.meshgrid(np.arange(d, dtype=np.int64),
                         np.arange(d, dtype=np.int64), indexing="ij")
    return pa.table({"i": ii.ravel(), "j": jj.ravel(),
                     "cov_num": cov_num.ravel()})


_SQL_EMB_COVARIANCE = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding) AS x
  FROM embeddings
),
q AS (SELECT vec_id, i,
             CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qx
      FROM e),
s1 AS (SELECT i, sum(qx) AS s FROM q GROUP BY i),
s2 AS (SELECT a.i AS i, b.i AS j, sum(a.qx * b.qx) AS sij
       FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i),
nn AS (SELECT count(*) AS n FROM embeddings)
SELECT s2.i - 1 AS i, s2.j - 1 AS j,
       CAST(nn.n * s2.sij - sa.s * sb.s AS BIGINT) AS cov_num
FROM s2, nn
JOIN s1 sa ON sa.i = s2.i
JOIN s1 sb ON sb.i = s2.j
"""


def q_embed_topk(sf_dir: str):
    """ANN baseline: top-{_TOPK_K} by cosine for the first {_TOPK_NQ}
    vectors as queries; rank ties broken by vec_id (both sides). The
    query matrix is ray.put once; per-batch matmuls prune to local top-k
    so only k * n_blocks * n_queries rows reach the final merge."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import cosine_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = cosine_topk(ds, _topk_query_matrix(sf_dir), k=_TOPK_K)
    # query_id is the row index into q == vec_id (sorted 0..NQ-1)
    return out.select(["query_id", "vec_id", "rank"])


def q_embed_topk_ivf(sf_dir: str):
    """ANN scale path: IVF coarse-quantized top-k (hash-sampled k-means
    lists + probing).  The driver row runs FULL probe (n_probe ==
    n_lists), where IVF provably equals the exact brute-force top-k —
    that pins the whole machinery (sampling, training, coarse assign,
    masked scoring, partial/merge) against the same DuckDB oracle as
    ``embed_topk``; the approximate partial-probe regime is pytest
    recall-gated, including on an adversarially SORTED corpus (the
    order-bias case a limit() training sample used to fail)."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import ivf_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, _topk_query_matrix(sf_dir), k=_TOPK_K,
                   n_lists=16, n_probe=16)
    return out.select(["query_id", "vec_id", "rank"])


def q_embed_topk_pq(sf_dir: str):
    """ANN memory-scale path: product-quantization ADC top-k (Jegou et
    al., TPAMI 2011) with exact re-ranking.  The corpus is encoded ONCE
    into 16-byte PQ codes (32x smaller than the float64 vectors — the
    representation that makes 10^12-vector search indexes fit a cluster's
    object store); the scan scores codes against per-query lookup tables
    (no float vectors touched), keeps a 128-candidate shortlist per
    query, and one filtered pass fetches shortlist vectors for exact
    cosine re-ranking.  At these params shortlist recall is 1 with >= 4x
    margin (measured: the last true top-10 member sits at ADC position
    <= 29 at both test scales), so the output EQUALS brute force and the
    row pins the whole machinery — hash-sampled training, per-subspace
    Lloyd's, encoding, LUT scan, shortlist merge, exact rerank — against
    the same DuckDB oracle as ``embed_topk``.  Partial-recall regimes
    (no rerank / tight shortlist) are pytest recall-gated."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import pq_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = pq_topk(ds, _topk_query_matrix(sf_dir), k=_TOPK_K,
                  n_subspaces=16, rerank=128)
    return out.select(["query_id", "vec_id", "rank"])


def q_embed_topk_ivfpq(sf_dir: str):
    """ANN compute+memory scale path: IVF+PQ (Jegou et al. 2011 Sec. V,
    the FAISS IVFPQ layout; stages/embed.ivfpq_topk).  The stored index
    is (id, coarse list, 16-byte residual PQ code) SORTED BY LIST —
    list-pure blocks give probe-side partition pruning on top of PQ's
    32x at-rest compression.  This row runs FULL probe + 128-deep exact
    rerank, so the output EQUALS brute force and pins the entire
    machinery (coarse quantizer, residual codebooks, list-sorted
    encode, q.c + LUT ADC scan with block skipping, shortlist merge,
    exact rerank) against the same DuckDB oracle as ``embed_topk``;
    partial-probe recall and the shortlist-sizing effect are
    pytest-gated on planted clusters."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import ivfpq_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ivfpq_topk(ds, _topk_query_matrix(sf_dir), k=_TOPK_K,
                     n_lists=16, n_probe=16, n_subspaces=16, rerank=128)
    return out.select(["query_id", "vec_id", "rank"])


_ADC_DEPTHS = (10, 20, 40, 80, 160)


def q_adc_recall_curve(sf_dir: str):
    """PQ shortlist-sizing curve: recall@10 of the ADC-ordered candidate
    list against exact brute force, per shortlist depth — the tuning
    read that sizes ``rerank`` in pq_topk / ivfpq_topk (ADC noise ~
    0.005 cosine shuffles ranks inside near-tie sets, so recall vs
    depth is the decision curve, not a single recall number).  ADC
    ordering comes from the distributed no-rerank PQ scan; exact truth
    from ``cosine_topk``; the fold over both is tiny (n_queries x
    max depth rows).  Deterministic -> golden-pinned."""
    import pandas as pd

    import ray.data as rd

    from deduplicator_ray.stages.embed import cosine_topk, pq_topk

    q = _topk_query_matrix(sf_dir)
    K = _TOPK_K
    max_d = max(_ADC_DEPTHS)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = cosine_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]), q, k=K).to_pandas()
    adc = pq_topk(ds, q, k=max_d, n_subspaces=16, rerank=0).to_pandas()
    truth = {qi: set(g["vec_id"]) for qi, g in exact.groupby("query_id")}
    rows = []
    for depth in _ADC_DEPTHS:
        short = adc[adc["rank"] <= depth]
        hits = sum(len(truth[qi] & set(g["vec_id"]))
                   for qi, g in short.groupby("query_id"))
        total = sum(len(v) for v in truth.values())
        rows.append((depth, int(round(1_000_000 * hits / total))))
    return pd.DataFrame(rows, columns=["depth", "recall_ppm"]).astype("int64")


_SQL_EMB_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_TOPK_NQ}
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS c
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, rank FROM r WHERE rank <= {_TOPK_K}
"""

# ---------------------------------------------------------------------------
# T1/T2: token + quality counters (RE2 on both sides)
# ---------------------------------------------------------------------------

from deduplicator_ray.stages.textstats import BPE_TOKEN_PAT as _BPE_PAT
from deduplicator_ray.stages.textstats import WS_TOKEN_PAT as _WS_CLASS


def q_token_stats(sf_dir: str):
    """Token counting: whitespace tokens + BPE-ish pre-tokenizer matches,
    fully vectorized via RE2 (pyarrow count_substring_regex)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        t = b["text"]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_ws_tokens": pc.cast(pc.count_substring_regex(t, _WS_CLASS), pa.int64()),
                "n_bpe_tokens": pc.cast(pc.count_substring_regex(t, _BPE_PAT), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


_SQL_TOKEN_STATS = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_WS_CLASS}')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}')) AS n_bpe_tokens
FROM documents
"""


def q_quality_stats(sf_dir: str):
    """Quality counters: chars, punctuation, digits, uppercase, spaces —
    integer counts, RE2 both sides."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        t = b["text"]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(t), pa.int64()),
                "n_punct": pc.cast(
                    pc.count_substring_regex(t, r"[^A-Za-z0-9\s]"), pa.int64()
                ),
                "n_digits": pc.cast(pc.count_substring_regex(t, "[0-9]"), pa.int64()),
                "n_upper": pc.cast(pc.count_substring_regex(t, "[A-Z]"), pa.int64()),
                "n_spaces": pc.cast(pc.count_substring(t, " "), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


_SQL_QUALITY_STATS = r"""
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
       len(regexp_extract_all(text, '[0-9]')) AS n_digits,
       len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
       length(text) - length(replace(text, ' ', '')) AS n_spaces
FROM documents
"""

# ---------------------------------------------------------------------------
# rows-only pipelines (no SQL oracle; pytest covers semantics)
# ---------------------------------------------------------------------------


_NEARDUP_NGRAM = 5      # word shingle width (north_rule / FIXTURES.md §5)
_NEARDUP_NUM = 4        # Jaccard threshold 4/5 = 0.8, integer-exact
_NEARDUP_DEN = 5


def q_neardup_clusters(sf_dir: str):
    """North-star output: near-duplicate cluster assignments over
    ``documents`` — connected components of the EXACT 5-word-shingle
    Jaccard >= 0.8 graph; cluster id = min doc_id in the cluster.

    Pair generation is the provably-complete prefix-filter pipeline
    (stages/jaccard.py), so this output is deterministic and matches the
    all-pairs SQL oracle value-for-value (the recursive-CTE CC mirror).
    The MinHash -> LSH scale path (``neardup_clusters_minhash``) is
    recall-gated >= 0.99 against THIS definition in tests/test_queries.py
    — exactly the north_rule's acceptance criterion."""
    import ray.data as rd

    from deduplicator_ray.stages.cc import connected_components_auto
    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(
        ds, num=_NEARDUP_NUM, den=_NEARDUP_DEN, ngram=_NEARDUP_NGRAM, lang_col=None
    )
    edges = pairs.map_batches(
        lambda b: pa.table({"a": b["doc_a"], "b": b["doc_b"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    asg = connected_components_auto(edges)
    df = asg.to_pandas() if hasattr(asg, "to_pandas") else asg
    return df.sort_values("doc_key").reset_index(drop=True)


# The SQL mirror: all-pairs exact 5-gram Jaccard + connected components
# via a recursive min-label transitive closure.  `reach` enumerates every
# (node, reachable-node) pair over the symmetrized edge set (UNION gives
# set semantics, so the recursion terminates on cycles); the final group
# by takes the minimum reachable id — identical to stages/cc.py labels.
# shared CTE body: exact 5-gram Jaccard pairs + recursive-CTE connected
# components (used by _SQL_NEARDUP_CLUSTERS and _SQL_SPLIT_BY_CLUSTER)
_NEARDUP_GRAMS_CTES = f"""toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_NEARDUP_NGRAM}
              THEN list_distinct(list_transform(range(1, len(w) - {_NEARDUP_NGRAM - 2}),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))
              ELSE [] END AS g
  FROM toks
)"""

_NEARDUP_CC_CTES = f"""{_NEARDUP_GRAMS_CTES},
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.g, b.g)) AS n_inter,
         len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS n_union
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.g, b.g)) > 0
    AND {_NEARDUP_DEN} * len(list_intersect(a.g, b.g))
        >= {_NEARDUP_NUM} * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT rr.node, e.b FROM reach rr JOIN edges e ON rr.r = e.a
)"""

_SQL_NEARDUP_CLUSTERS = f"""
WITH RECURSIVE {_NEARDUP_CC_CTES}
SELECT node AS doc_key, least(node, min(r)) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_key
"""


def split_by_cluster(ds, fractions, *, seed: int,
                     num: int, den: int, ngram: int,
                     num_partitions: int = 16):
    """Leakage-FREE train/val/test assignment: every near-duplicate
    CLUSTER (connected components of the exact ngram-Jaccard graph —
    the north-star cluster definition) lands wholly in one split, the
    constructive fix for the straddling pairs ``split_leakage`` counts
    and the gap document-level ``split_assign`` / site-level
    ``split_assign_grouped`` leave (near-dups cross sites).

    Split key is the CLUSTER id through the same Weyl-interval machinery
    as split_assign (singletons key on their own doc_id, so an
    edge-free corpus degrades to exactly split_assign).  Shape: exact
    pair pipeline -> CC -> one hash join of (doc_key, cluster_id)
    against the id column -> map-only interval assign; the join ships
    16-byte rows only."""
    import ray.data as rd

    from deduplicator_ray.stages.cc import connected_components_auto
    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs
    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.stages.shuffle import split_assign

    pairs = ngram_jaccard_pairs(ds, num=num, den=den, ngram=ngram,
                                lang_col=None)
    edges = pairs.map_batches(
        lambda b: pa.table({"a": b["doc_a"], "b": b["doc_b"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    asg = connected_components_auto(edges)
    if not hasattr(asg, "map_batches"):          # driver fast path result
        asg = (rd.from_arrow(asg) if isinstance(asg, pa.Table)
               else rd.from_pandas(asg))
    else:
        # chained-hash-join barrier: the distributed-CC result's lineage
        # reaches back through the pair pipeline's semi-join; materialize
        # (assignment is small by contract) so the outer join's topology
        # holds exactly one shuffle (see stages/graph.assortativity)
        asg = asg.materialize()
    ids = ds.select_columns(["doc_id"]).map_batches(
        lambda b: pa.table({"doc_key": b["doc_id"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(
        ids, asg, on=("doc_key",), num_partitions=num_partitions,
        out_schema={"doc_key": pa.int64(), "cluster_id": pa.int64()},
        join_type="left_outer")
    filled = joined.map_batches(
        lambda b: pa.table({
            "doc_key": b["doc_key"],
            "cluster_id": pc.coalesce(b["cluster_id"], b["doc_key"]),
        }), batch_format="pyarrow", zero_copy_batch=True)
    return split_assign(filled, fractions, seed=seed, id_col="cluster_id",
                        keep_cols=("doc_key",))


def q_split_by_cluster(sf_dir: str):
    """Cluster-aware split over ``documents`` at the north-star config
    (exact 5-shingle Jaccard >= 0.8 components; split_assign's
    fractions/seed).  Returns (cluster_id, split, doc_key); the oracle
    recomputes clusters via the recursive CTE and the split via the
    same integer Weyl expression."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return split_by_cluster(ds, _SPLIT_FRACTIONS, seed=_SPLIT_SEED,
                            num=_NEARDUP_NUM, den=_NEARDUP_DEN,
                            ngram=_NEARDUP_NGRAM)


def _sql_split_by_cluster() -> str:
    from deduplicator_ray.stages.shuffle import split_sql_expr

    return f"""
WITH RECURSIVE {_NEARDUP_CC_CTES},
cl AS (
  SELECT node AS doc_key, least(node, min(r)) AS cluster_id
  FROM reach GROUP BY node
),
alldocs AS (
  SELECT d.doc_id AS doc_key,
         coalesce(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl ON cl.doc_key = d.doc_id
)
SELECT cluster_id, {split_sql_expr(_SPLIT_FRACTIONS, _SPLIT_SEED,
                                   id_col="cluster_id")} AS split, doc_key
FROM alldocs
"""


def q_cluster_cohesion(sf_dir: str):
    """Per-cluster cohesion census over the north-star assignment:
    (cluster_id, n_docs, n_edges, min_j_ppm, sum_j_ppm) — the
    transitive-chaining diagnostic.  Connected components merge docs
    that never directly matched; a cluster whose edge density
    2*n_edges/(n_docs*(n_docs-1)) is low or whose min edge Jaccard sits
    at the threshold is a CC chain, not a clique — exactly what a
    dedup-recipe review inspects before trusting keep-one-per-cluster.

    All-integer/ppm output (j_ppm = floor(1e6*inter/union + 0.5); both
    engines evaluate the identical double expression, exact below 2^53).
    Shape: exact pair pipeline -> CC -> one hash join of the (small)
    edge list against the assignment -> per-block partial min/sum
    combine; the driver merge holds one row per cluster (the census
    contract; the 10^12-doc path buckets the combine by cluster hash)."""
    import pandas as pd

    import ray.data as rd

    from deduplicator_ray.stages.cc import connected_components_auto
    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs
    from deduplicator_ray.stages.joins import hash_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, num=_NEARDUP_NUM, den=_NEARDUP_DEN,
                                ngram=_NEARDUP_NGRAM, lang_col=None)

    def with_j(b: pa.Table) -> pa.Table:
        inter = b["n_inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = b["n_union"].to_numpy(zero_copy_only=False).astype(np.float64)
        j_ppm = np.floor(1_000_000.0 * inter / union + 0.5).astype(np.int64)
        return pa.table({"doc_key": b["doc_a"].cast(pa.int64()),
                         "a": b["doc_a"], "b": b["doc_b"],
                         "j_ppm": pa.array(j_ppm)})

    # barrier: the pair pipeline carries its own semi-join; leaving it in
    # the outer hash_join's live topology means two sets of shuffle
    # aggregator actors co-scheduled in one streaming graph, which can
    # deadlock on a small cpu budget (see stages/graph.assortativity).
    # It also pins the (small) edge list so CC and the join share one
    # computation instead of re-running the pair pipeline.
    edges_j = pairs.map_batches(with_j, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    asg = connected_components_auto(edges_j.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"]}),
        batch_format="pyarrow", zero_copy_batch=True))
    if not hasattr(asg, "map_batches"):
        asg = (rd.from_arrow(asg) if isinstance(asg, pa.Table)
               else rd.from_pandas(asg))
    joined = hash_join(
        edges_j.select_columns(["doc_key", "j_ppm"]), asg,
        on=("doc_key",), num_partitions=16,
        out_schema={"cluster_id": pa.int64(), "j_ppm": pa.int64()})

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return df.groupby("cluster_id", as_index=False).agg(
            n_edges=("j_ppm", "size"), min_j_ppm=("j_ppm", "min"),
            sum_j_ppm=("j_ppm", "sum"))

    parts = joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    agg = parts.groupby("cluster_id", as_index=False).agg(
        n_edges=("n_edges", "sum"), min_j_ppm=("min_j_ppm", "min"),
        sum_j_ppm=("sum_j_ppm", "sum"))
    sizes = (asg.to_pandas().groupby("cluster_id", as_index=False)
             .size().rename(columns={"size": "n_docs"}))
    out = sizes.merge(agg, on="cluster_id", how="inner")
    for c in ("n_docs", "n_edges", "min_j_ppm", "sum_j_ppm"):
        out[c] = out[c].astype("int64")
    return out


_SQL_CLUSTER_COHESION = f"""
WITH RECURSIVE {_NEARDUP_CC_CTES},
cl AS (
  SELECT node AS doc_key, least(node, min(r)) AS cluster_id
  FROM reach GROUP BY node
),
ej AS (
  SELECT cl.cluster_id,
         CAST(floor(1000000.0 * p.n_inter / p.n_union + 0.5) AS BIGINT)
           AS j_ppm
  FROM pairs p JOIN cl ON cl.doc_key = p.a
),
nd AS (SELECT cluster_id, count(*)::BIGINT AS n_docs FROM cl GROUP BY 1)
SELECT nd.cluster_id, nd.n_docs, count(*)::BIGINT AS n_edges,
       min(ej.j_ppm)::BIGINT AS min_j_ppm, sum(ej.j_ppm)::BIGINT AS sum_j_ppm
FROM ej JOIN nd ON nd.cluster_id = ej.cluster_id GROUP BY 1, 2
"""


def q_neardup_clusters_minhash(sf_dir: str):
    """The SCALE path for the north-star output: MinHash signatures ->
    LSH banding -> signature-verified edges -> connected components.
    Deterministic at fixed MinHashConfig; dup-pair recall and cluster
    agreement vs the exact definition (``neardup_clusters``) are
    pytest-gated >= 0.99 (tests/test_queries.py)."""
    import pandas as pd

    import ray.data as rd

    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.pipelines.neardup import cluster_near_duplicates

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: pa.table({"doc_key": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    _edges, assignments = cluster_near_duplicates(ds, MinHashConfig())
    df = assignments if isinstance(assignments, pd.DataFrame) else assignments.to_pandas()
    return df.sort_values("doc_key").reset_index(drop=True)


def q_simhash_dups(sf_dir: str):
    """SimHash near-dup pairs (64-bit, hamming <= 3) over ``documents``."""
    import ray.data as rd

    from deduplicator_ray.stages.simhash import simhash_pairs, simhash_signatures

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: pa.table({"doc_key": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sigs = simhash_signatures(ds)
    return simhash_pairs(sigs)


def q_self_similarity(sf_dir: str):
    """Suffix-array longest-repeated-substring length per document
    (boilerplate detector)."""
    import ray.data as rd

    from deduplicator_ray.stages.substr import self_similarity

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = self_similarity(ds)
    return out.select_columns(["doc_id", "lrs_len"])


def q_pair_lcs(sf_dir: str):
    """Suffix-array longest-common-substring over the near-dup candidate
    pairs (north-star: boilerplate detection on LSH-bounded pairs, never
    all-pairs). Emits (a, b, lcs_len)."""
    import ray.data as rd

    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.pipelines.neardup import cluster_near_duplicates
    from deduplicator_ray.stages.substr import pair_common_substrings

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: pa.table({"doc_key": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    edges, _asg = cluster_near_duplicates(ds, MinHashConfig())
    out = pair_common_substrings(edges, ds)
    return out.select_columns(["a", "b", "lcs_len"])


_LRS_SHORT_N = 200
_LRS_SHORT_CHARS = 80


def q_self_similarity_short(sf_dir: str):
    """The suffix-array longest-repeated-substring kernel value-checked
    against SQL brute force: the REAL ``self_similarity`` stage
    (stages/substr.py — codepoint suffix array + LCP maximum) over
    documents truncated to {n} chars, where a from-scratch oracle is
    tractable (enumerate every substring, keep lengths occurring at
    >= 2 positions, take the max).  Overlapping repeats count in both
    engines (suffix-array LRS is overlap-inclusive; so is the SQL
    position count).  Truncation is by CODEPOINTS on both sides
    (python slice / DuckDB substr).  The full-text twin `self_similarity`
    stays pinned — the O(n^2)-substring oracle is only feasible short."""
    import ray.data as rd

    from deduplicator_ray.stages.substr import self_similarity

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_LRS_SHORT_N}")

    def trunc(b: pa.Table) -> pa.Table:
        texts = [(t or "")[:_LRS_SHORT_CHARS] for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"],
                         "text": pa.array(texts, type=pa.large_string())})

    out = self_similarity(
        ds.map_batches(trunc, batch_format="pyarrow", zero_copy_batch=True))
    return out.select_columns(["doc_id", "lrs_len"])


q_self_similarity_short.__doc__ = q_self_similarity_short.__doc__.format(
    n=_LRS_SHORT_CHARS)

_SQL_SELF_SIMILARITY_SHORT = f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {_LRS_SHORT_CHARS}) AS t
  FROM documents WHERE doc_id < {_LRS_SHORT_N}
), subs AS (
  SELECT doc_id, ll.L AS L, substr(t, ss.s, ll.L) AS sub
  FROM d,
       unnest(range(1, length(t)+1)) AS ll(L),
       unnest(range(1, length(t)+1)) AS ss(s)
  WHERE ss.s + ll.L <= length(t) + 1
), rep AS (
  SELECT doc_id, L FROM subs GROUP BY doc_id, L, sub HAVING COUNT(*) >= 2
)
SELECT d.doc_id, CAST(COALESCE(MAX(r.L), 0) AS BIGINT) AS lrs_len
FROM d LEFT JOIN rep r USING (doc_id) GROUP BY d.doc_id
"""


def q_pair_lcs_short(sf_dir: str):
    """The joint-suffix-array longest-COMMON-substring path value-checked
    against SQL brute force: deterministic consecutive-doc edges
    (i, i+1) through the REAL ``pair_common_substrings`` stage
    (stages/substr.py — hash-join text attach + joint suffix array per
    pair) over {n}-char texts; the oracle enumerates both docs'
    substrings and takes the longest shared one.  The production twin
    `pair_lcs` (LSH-derived edges) stays pinned — its pair set rides
    the siphash minhash pipeline."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.stages.substr import pair_common_substrings

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_LRS_SHORT_N}")

    def trunc(b: pa.Table) -> pa.Table:
        texts = [(t or "")[:_LRS_SHORT_CHARS] for t in b["text"].to_pylist()]
        return pa.table({"doc_key": b["doc_id"],
                         "text": pa.array(texts, type=pa.large_string())})

    corpus = ds.map_batches(trunc, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    ids = np.arange(_LRS_SHORT_N - 1, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"a": ids, "b": ids + 1}))
    out = pair_common_substrings(edges, corpus)
    return out.select_columns(["a", "b", "lcs_len"])


q_pair_lcs_short.__doc__ = q_pair_lcs_short.__doc__.format(
    n=_LRS_SHORT_CHARS)

_SQL_PAIR_LCS_SHORT = f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {_LRS_SHORT_CHARS}) AS t
  FROM documents WHERE doc_id < {_LRS_SHORT_N}
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, x.t AS ta, y.t AS tb
  FROM d x JOIN d y ON y.doc_id = x.doc_id + 1
), subs_a AS (
  SELECT DISTINCT a, b, ll.L AS L, substr(ta, ss.s, ll.L) AS sub
  FROM pairs,
       unnest(range(1, length(ta)+1)) AS ll(L),
       unnest(range(1, length(ta)+1)) AS ss(s)
  WHERE ss.s + ll.L <= length(ta) + 1
), subs_b AS (
  SELECT DISTINCT a, b, ll.L AS L, substr(tb, ss.s, ll.L) AS sub
  FROM pairs,
       unnest(range(1, length(tb)+1)) AS ll(L),
       unnest(range(1, length(tb)+1)) AS ss(s)
  WHERE ss.s + ll.L <= length(tb) + 1
), com AS (
  SELECT sa.a, sa.b, sa.L
  FROM subs_a sa JOIN subs_b sb
    ON sa.a = sb.a AND sa.b = sb.b AND sa.L = sb.L AND sa.sub = sb.sub
)
SELECT p.a, p.b, CAST(COALESCE(MAX(c.L), 0) AS BIGINT) AS lcs_len
FROM pairs p LEFT JOIN com c ON c.a = p.a AND c.b = p.b
GROUP BY p.a, p.b
"""


_PPM_BRIDGE_N = 200


def q_media_ahash_docs(sf_dir: str):
    """REAL image decode under an independent SQL recomputation: build
    valid binary-PPM P6 payloads deterministically from document text
    bytes (8x8 pixels, each byte tripled to R=G=B, so every float32 op
    in `_ppm_features` is exact — gray == byte, block == pixel, mean =
    SUM/64 a dyadic rational), run the REAL
    ``ImageDecoder(decoder="ppm")`` actor stage (stages/multimodal.py:
    the same P6 parser + average-hash the pinned media rows use), and
    emit (media_id, payload_bytes, phash).  The oracle rebuilds every
    pixel from ``hex(encode(text))``, thresholds at the exact SUM/64.0
    mean, and packs the 64 bits big-endian two's-complement — the first
    image-DECODE path value-checked against a from-scratch
    recomputation (the sibling media pins stay: their payloads come
    from non-SQL synthetic RNG).  Docs shorter than 64 utf-8 bytes are
    excluded on both sides."""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import decode_images

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_PPM_BRIDGE_N}")

    def to_media(b: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            tb = (t or "").encode("utf-8")
            if len(tb) < 64:
                continue
            px = bytes(bytearray(v for x in tb[:64] for v in (x, x, x)))
            ids.append(did)
            payloads.append(b"P6\n8 8\n255\n" + px)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow",
                           zero_copy_batch=True)
    feats = decode_images(media, decoder="ppm")

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": b["media_id"],
            "payload_bytes": pc.cast(b["payload_bytes"], pa.int64()),
            "phash": pc.cast(b["phash"], pa.int64()),
        })

    return feats.map_batches(project, batch_format="pyarrow",
                             zero_copy_batch=True)


def _ahash_docs_sql(extra_cols: str = "") -> str:
    """Shared from-scratch ahash recomputation for the media-decode
    bridge oracles (PPM and PNG carry IDENTICAL expected pixels — the
    formats differ only in container): rebuild the 64 gray values from
    ``hex(encode(text))`` via the 256-row hex lookup, threshold at the
    exact SUM/64.0 mean, pack big-endian (bit for 1-based pixel pos at
    64 - pos), fold to signed via HUGEINT two's complement."""
    return f"""
WITH hexmap AS (
  SELECT lpad(upper(to_hex(i)), 2, '0') AS hh, CAST(i AS UBIGINT) AS v
  FROM range(256) t(i)
), d AS (
  SELECT doc_id, hex(encode(text)) AS hs
  FROM documents
  WHERE doc_id < {_PPM_BRIDGE_N} AND octet_length(encode(text)) >= 64
), px AS (
  SELECT doc_id, pos, m.v AS g
  FROM (SELECT doc_id, hs, unnest(range(1, 65)) AS pos FROM d) x
  JOIN hexmap m ON m.hh = substr(x.hs, CAST(pos*2 - 1 AS BIGINT), 2)
), mu AS (
  SELECT doc_id, SUM(g) AS sg FROM px GROUP BY doc_id
), ph AS (
  SELECT p.doc_id,
         SUM(CASE WHEN CAST(p.g AS DOUBLE) >= CAST(m.sg AS DOUBLE) / 64.0
                  THEN CAST(1 AS HUGEINT) << CAST(64 - p.pos AS INTEGER)
                  ELSE CAST(0 AS HUGEINT) END) AS s
  FROM px p JOIN mu m USING (doc_id) GROUP BY p.doc_id
)
SELECT doc_id AS media_id,{extra_cols}
       CAST(CASE WHEN s >= CAST('9223372036854775808' AS HUGEINT)
                 THEN s - CAST('18446744073709551616' AS HUGEINT)
                 ELSE s END AS BIGINT) AS phash
FROM ph
"""


# payload = 11-byte P6 header + 64 tripled pixels = 203 bytes
_SQL_MEDIA_AHASH_DOCS = _ahash_docs_sql(
    "\n       CAST(203 AS BIGINT) AS payload_bytes,")


def q_media_ahash_png_docs(sf_dir: str):
    """The WHOLE PNG codec roundtrip under the same SQL check as
    `media_ahash_docs`: the same deterministic 8x8 R=G=B pixels from
    document text bytes are ENCODED to real PNG (stages/multimodal.py
    `encode_png`, zlib + cycling scanline filters so every unfilter
    branch runs), decoded back through the REAL
    ``ImageDecoder(decoder="png")`` stage and average-hashed.  PNG is
    lossless, so the oracle needs no zlib: it rebuilds the EXPECTED
    pixels straight from ``hex(encode(text))`` and recomputes the hash
    — any pixel the decoder mangles flips phash bits and fails the
    row.  (JPEG cannot join this bridge: lossy.)"""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import decode_images, encode_png

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_PPM_BRIDGE_N}")

    def to_media(b: pa.Table) -> pa.Table:
        import numpy as np

        ids, payloads = [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            tb = (t or "").encode("utf-8")
            if len(tb) < 64:
                continue
            g = np.frombuffer(tb[:64], dtype=np.uint8).reshape(8, 8)
            img = np.repeat(g[:, :, None], 3, axis=2)
            # cycle the filter types so all five unfilter branches run
            payloads.append(encode_png(img, filters=[(int(did) + y) % 5
                                                     for y in range(8)]))
            ids.append(did)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow",
                           zero_copy_batch=True)
    feats = decode_images(media, decoder="png")

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": b["media_id"],
            "phash": pc.cast(b["phash"], pa.int64()),
        })

    return feats.map_batches(project, batch_format="pyarrow",
                             zero_copy_batch=True)


_SQL_MEDIA_AHASH_PNG_DOCS = _ahash_docs_sql()


def q_fingerprint_sketch(sf_dir: str):
    """Winnowing sketch summary per document (fp_count distinct window
    minima + fp_min) — GRADUATED from its golden pin in round 5: the
    production kernel (rolling FNV-base polynomial over utf-8 bytes,
    16-gram sliding-window minima) is mirrored from scratch in SQL, see
    `_winnow_fps_cte`."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = fingerprints(ds)
    return out.select_columns(["doc_id", "fp_min", "fp_count"])


def _winnow_fps_cte() -> str:
    """CTE chain rebuilding stages/textstats.winnow_fingerprints
    (k=8, window=16) from raw text, ending in ``fps(doc_id, m)`` =
    each doc's distinct winnow fingerprints:

    - utf-8 bytes via hex(encode(text)) + a 256-row hex lookup (DuckDB
      1.0 has no BLOB substring);
    - rolling k-gram polynomial: ((b0+1)*BASE^7 + b1*BASE^6 + ... + b7)
      mod 2^64 (UHUGEINT products, BASE = the FNV64 prime 0x100000001B3,
      powers inlined) masked to 62 bits — bit-for-bit the numpy kernel's
      wraparound arithmetic;
    - window minima: MIN over 16 consecutive grams; docs with <= 16
      grams collapse to the single global min (the stage's short-doc
      branch), captured by pos <= GREATEST(n_grams - 15, 1);
    - DISTINCT per doc (np.unique in the stage)."""
    base = 0x100000001B3
    coefs = [pow(base, 7 - j, 1 << 64) for j in range(8)]
    m64 = "CAST('18446744073709551616' AS UHUGEINT)"

    def term(col: str, c: int, plus1: bool = False) -> str:
        v = f"(CAST({col} AS UHUGEINT){' + 1' if plus1 else ''})"
        return f"({v} * CAST({c} AS UHUGEINT))"

    gsum = " + ".join(
        [term("b0", coefs[0], True)]
        + [f"CASE WHEN b{j} IS NULL THEN CAST(0 AS UHUGEINT) "
           f"ELSE {term(f'b{j}', coefs[j])} END" for j in range(1, 8)]
    )
    leads = ", ".join(
        f"lead(b, {j}) OVER (PARTITION BY doc_id ORDER BY pos) AS b{j}"
        for j in range(1, 8)
    )
    return f"""hexmap AS (
  SELECT lpad(upper(to_hex(i)), 2, '0') AS hh, CAST(i AS UBIGINT) AS v
  FROM range(256) t(i)
), hx AS (
  SELECT doc_id, hex(encode(text)) AS hs FROM documents
), by_ AS (
  SELECT doc_id, pos, m.v AS b, length(hs) / 2 AS nb
  FROM (SELECT doc_id, hs,
               unnest(range(1, CAST(length(hs)/2 AS BIGINT) + 1)) AS pos
        FROM hx) x
  JOIN hexmap m ON m.hh = substr(x.hs, CAST(pos*2 - 1 AS BIGINT), 2)
), lg AS (
  SELECT doc_id, pos, nb, b AS b0, {leads} FROM by_
), grams AS (
  SELECT doc_id, pos,
         CAST((({gsum}) % {m64}) % 4611686018427387904 AS BIGINT) AS g,
         nb - 7 AS ng
  FROM lg WHERE pos <= nb - 7
), mins AS (
  SELECT doc_id, pos, ng,
         MIN(g) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS m
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, m FROM mins
  WHERE pos <= GREATEST(ng - 15, 1)
)"""


def _sql_fingerprint_sketch() -> str:
    return f"""
WITH {_winnow_fps_cte()}
SELECT d.doc_id,
       CAST(COALESCE(MIN(f.m), -1) AS BIGINT) AS fp_min,
       CAST(COUNT(f.m) AS BIGINT) AS fp_count
FROM documents d LEFT JOIN fps f USING (doc_id)
GROUP BY d.doc_id
"""


def _sql_winnow_pairs() -> str:
    # same fingerprint sets; global df cap 50 (the fp-keyed shuffle
    # co-locates every fp, so the stage's in-bucket df IS global df),
    # pair fan-out a < b, keep >= 10 shared
    return f"""
WITH {_winnow_fps_cte()},
df AS (SELECT m, COUNT(*) AS c FROM fps GROUP BY m),
kept AS (
  SELECT f.doc_id, f.m FROM fps f JOIN df USING (m) WHERE df.c <= 50
)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept x JOIN kept y ON x.m = y.m AND x.doc_id < y.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 10
"""


def q_media_ppm_features(sf_dir: str):
    """REAL image decode end to end (stages/multimodal.py decoder='ppm'):
    deterministic valid binary-PPM payloads (plus planted corrupt ones)
    through the actor-pool decode — pure-numpy P6 parse, 8x8
    average-hash, channel-stats embedding.  Golden-pinned (the kernel has
    no SQL mirror); corrupt payloads must emit zero features."""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import (
        decode_images,
        synth_ppm_media,
    )

    out = decode_images(rd.from_arrow(synth_ppm_media(48)), decoder="ppm")

    def flat(b: pa.Table) -> pa.Table:
        emb = b["embedding"].combine_chunks()
        m = np.asarray(emb.values).reshape(-1, 8)
        return pa.table({
            "media_id": b["media_id"],
            "payload_bytes": b["payload_bytes"],
            "phash": b["phash"],
            # integer micros: the golden VALUES pin only takes int/str
            "emb_mean_micro": pa.array(np.round(
                m.mean(axis=1).astype(np.float64) * 1e6).astype(np.int64)),
        })

    return out.map_batches(flat, batch_format="pyarrow", zero_copy_batch=True)


def q_media_phash_dups(sf_dir: str):
    """Perceptual near-duplicate images: the real PPM decode path feeds
    average-hash signatures into the 4-band pigeonhole hamming machinery
    (stages/simhash.hamming_pairs — complete for radius <= 3).  The
    synthetic deck plants one exact copy and one single-pixel variant of
    two base images; un-decodable payloads (phash 0) are excluded before
    pairing (a shared failure sentinel is not visual similarity).
    Deterministic end to end -> golden pin."""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import decode_images, synth_ppm_media
    from deduplicator_ray.stages.simhash import hamming_pairs

    base = synth_ppm_media(48)
    pay = base["payload"].to_pylist()
    dup0 = pay[0]
    var0 = bytearray(pay[0])
    var0[-1] ^= 0x40  # one channel of one pixel: <= 1 ahash bit
    dup5 = pay[5]
    extra = pa.table({
        "media_id": pa.array([1000, 1001, 1002], type=pa.int64()),
        "kind": pa.array(["image"] * 3),
        "payload": pa.array([dup0, bytes(var0), dup5], type=pa.binary()),
        "mime": pa.array(["image/x-portable-pixmap"] * 3),
        "width": pa.nulls(3, pa.int32()),
        "height": pa.nulls(3, pa.int32()),
        "duration_ms": pa.nulls(3, pa.int32()),
    })
    media = rd.from_arrow(pa.concat_tables([base.select(extra.column_names),
                                            extra]))
    feats = decode_images(media, decoder="ppm")

    def valid(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["phash"], 0))

    feats = feats.map_batches(valid, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hamming_pairs(feats, id_col="media_id", hash_col="phash",
                         max_hamming=3)


def q_media_phash_dups_png(sf_dir: str):
    """Perceptual near-duplicate images over REAL PNG payloads: the
    no-dependency zlib+numpy decode path (stages/multimodal.decode_png)
    feeds average-hash signatures into the 4-band pigeonhole hamming
    machinery.  Stronger planting than the PPM variant: the exact
    duplicate of image 0 is re-encoded with DIFFERENT scanline filters
    (same pixels, different bytes), so the pair asserts the decoder is
    encoding-invariant, not byte-matching; a one-pixel variant (<= 1
    ahash bit) and a filter-shuffled copy of image 5 round out the
    planted pairs.  Deterministic end to end -> golden pin."""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import decode_images, encode_png
    from deduplicator_ray.stages.simhash import hamming_pairs

    rng = np.random.default_rng(44)
    imgs = []
    for i in range(48):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        imgs.append(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))

    rows = [(i, encode_png(im, filters=[(i + y) % 5 for y in range(im.shape[0])]))
            for i, im in enumerate(imgs)]
    # planted: exact pixels of img0 under a different encoding; a
    # one-pixel variant of img0; img5 re-encoded paeth-only
    var0 = imgs[0].copy()
    var0[0, 0, 0] ^= 0x04  # one channel of one pixel: <= 1 ahash bit
    rows += [
        (1000, encode_png(imgs[0], filters=3)),
        (1001, encode_png(var0, filters=0)),
        (1002, encode_png(imgs[5], filters=4)),
    ]
    media = pa.table({
        "media_id": pa.array(np.array([r[0] for r in rows], dtype=np.int64)),
        "kind": pa.array(["image"] * len(rows)),
        "payload": pa.array([r[1] for r in rows], type=pa.binary()),
        "mime": pa.array(["image/png"] * len(rows)),
        "width": pa.nulls(len(rows), pa.int32()),
        "height": pa.nulls(len(rows), pa.int32()),
        "duration_ms": pa.nulls(len(rows), pa.int32()),
    })
    feats = decode_images(rd.from_arrow(media), decoder="png")
    feats = feats.map_batches(
        lambda b: b.filter(pc.not_equal(b["phash"], 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    return hamming_pairs(feats, id_col="media_id", hash_col="phash",
                         max_hamming=3)


def q_media_phash_dups_jpeg(sf_dir: str):
    """Perceptual near-duplicate images over REAL baseline-JPEG
    payloads: the pure-numpy JFIF decode path (stages/jpeg.py —
    Huffman + dequant + IDCT + YCbCr) feeds average-hash signatures
    into the 4-band pigeonhole hamming machinery.  JPEG being lossy,
    the plants assert encoding-ROBUSTNESS rather than byte identity:
    one structured image appears under 4:4:4 and 4:2:0 subsampling and
    as a one-pixel variant (all within <= 3 ahash bits), and a noise
    image is re-encoded with restart markers — pure framing, so its
    DECODED pixels (and hash) are identical despite different bytes.
    48 base noise images keep the non-pair background far apart.
    Deterministic end to end -> golden pin."""
    import ray.data as rd

    from deduplicator_ray.stages.jpeg import encode_jpeg
    from deduplicator_ray.stages.multimodal import decode_images
    from deduplicator_ray.stages.simhash import hamming_pairs

    rng = np.random.default_rng(45)
    rows = []
    for i in range(48):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, encode_jpeg(img, quality=85)))
        if i == 5:
            img5 = img
    g = np.add.outer(np.linspace(0, 220, 32), np.linspace(0, 35, 32))
    structured = np.stack([g, 255 - g, g * 0.7], -1).astype(np.uint8)
    var = structured.copy()
    var[0, 0, 0] ^= 0x04
    rows += [
        (1000, encode_jpeg(structured, quality=95, subsampling="4:4:4")),
        (1001, encode_jpeg(structured, quality=95, subsampling="4:2:0")),
        (1002, encode_jpeg(var, quality=95, subsampling="4:4:4")),
        (1003, encode_jpeg(img5, quality=85, restart_interval=2)),
    ]
    media = pa.table({
        "media_id": pa.array(np.array([r[0] for r in rows], dtype=np.int64)),
        "kind": pa.array(["image"] * len(rows)),
        "payload": pa.array([r[1] for r in rows], type=pa.binary()),
        "mime": pa.array(["image/jpeg"] * len(rows)),
        "width": pa.nulls(len(rows), pa.int32()),
        "height": pa.nulls(len(rows), pa.int32()),
        "duration_ms": pa.nulls(len(rows), pa.int32()),
    })
    feats = decode_images(rd.from_arrow(media), decoder="jpeg")
    feats = feats.map_batches(
        lambda b: b.filter(pc.not_equal(b["phash"], 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    return hamming_pairs(feats, id_col="media_id", hash_col="phash",
                         max_hamming=3)


def q_media_features(sf_dir: str):
    """Multimodal plumbing end-to-end: deterministic synthetic media
    table -> kind-routed actor-pool stages (image decode, audio features,
    video frame sampling + resize plan), payloads dropped before the
    union.  Rows-only (the fake kernels are pytest-pinned); the point is
    the Ray-side schema/batch/actor plumbing, exercised for every kind."""
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import (
        decode_images,
        extract_audio_features,
        resize_plan,
        sample_frames,
        synth_media,
    )

    media = rd.from_arrow(synth_media(96))
    imgs = decode_images(media.filter(expr="kind == 'image'"))
    auds = extract_audio_features(media.filter(expr="kind == 'audio'"))
    vids = sample_frames(resize_plan(media.filter(expr="kind == 'video'")))

    def img_row(b: pa.Table) -> pa.Table:
        return pa.table({"media_id": b["media_id"], "kind": pa.array(["image"] * b.num_rows),
                         "feature": pc.cast(b["phash"], pa.int64())})

    def aud_row(b: pa.Table) -> pa.Table:
        return pa.table({"media_id": b["media_id"], "kind": pa.array(["audio"] * b.num_rows),
                         "feature": pc.cast(b["n_windows"], pa.int64())})

    def vid_row(b: pa.Table) -> pa.Table:
        n_frames = pc.list_value_length(b["frame_ts_ms"])
        return pa.table({"media_id": b["media_id"], "kind": pa.array(["video"] * b.num_rows),
                         "feature": pc.cast(n_frames, pa.int64())})

    out = (
        imgs.map_batches(img_row, batch_format="pyarrow", zero_copy_batch=True)
        .union(auds.map_batches(aud_row, batch_format="pyarrow", zero_copy_batch=True))
        .union(vids.map_batches(vid_row, batch_format="pyarrow", zero_copy_batch=True))
    )
    return out


def q_lang_id_pred(sf_dir: str):
    """Heuristic language ID vs the table's labeled lang: confusion
    counts (pred, label, n) — GRADUATED from its golden pin in round 5:
    the classifier is fixed stopword profiles + a CJK codepoint rule,
    no trained state, so the oracle recomputes every prediction from
    raw text (see `_sql_lang_id_pred`)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from deduplicator_ray.stages.textstats import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    ds = lang_id(ds)
    return ds.groupby(["lang", "lang_pred"]).aggregate(Count(alias_name="n"))


def _sql_lang_id_pred() -> str:
    """From-scratch SQL mirror of stages/textstats.LangId.detect over
    every document, grouped into the confusion table.  Interpolates the
    SAME `_PROFILES` dict the stage uses (single source of truth):
    2000-codepoint sample, CJK short-circuit (>20% of non-space chars
    in U+4E00..U+9FFF -> 'zh'), unicode tokenization, per-language
    stopword hit rates, argmax with the
    stage's tie rule (strict >, earlier profile wins) and the 0.04
    confidence floor.  Token class ``[\\p{{L}}\\p{{Nl}}\\p{{No}}]+`` is
    the exact RE2 spelling of Python's ``[^\\W\\d_]`` (unicode
    alphanumerics minus decimal digits minus underscore = letters +
    letter-numerals + other-numerals), so numeral-letters like 'Ⅻ' or
    '½' embedded in words tokenize identically on both sides."""
    from deduplicator_ray.stages.textstats import _PROFILES

    langs = list(_PROFILES)
    prof_vals = ", ".join(
        f"({i}, '{l}', '{w}')"
        for i, l in enumerate(langs) for w in sorted(_PROFILES[l]))
    lang_vals = ", ".join(f"({i}, '{l}')" for i, l in enumerate(langs))
    return f"""
WITH d AS (
  SELECT doc_id, lang, substr(text, 1, 2000) AS s FROM documents
), stats AS (
  SELECT doc_id,
         length(regexp_replace(s, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))
             AS cjk,
         GREATEST(1, length(replace(s, ' ', ''))) AS nosp
  FROM d
), words AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(s, '[\\p{{L}}\\p{{Nl}}\\p{{No}}]+')))
             AS w
  FROM d
), wc AS (
  SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id
), prof AS (SELECT * FROM (VALUES {prof_vals}) p(ord, plang, w)),
hits AS (
  SELECT wo.doc_id, p.ord, COUNT(*) AS h
  FROM words wo JOIN prof p ON p.w = wo.w
  GROUP BY 1, 2
), rates AS (
  SELECT wc.doc_id, l.ord, l.plang,
         CAST(COALESCE(h.h, 0) AS DOUBLE) / wc.n AS rate
  FROM wc CROSS JOIN (SELECT * FROM (VALUES {lang_vals}) x(ord, plang)) l
  LEFT JOIN hits h ON h.doc_id = wc.doc_id AND h.ord = l.ord
), best AS (
  SELECT doc_id, plang, rate,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY rate DESC, ord ASC) AS rn
  FROM rates
), pred AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN st.cjk > 0.2 * st.nosp THEN 'zh'
              WHEN b.rate IS NOT NULL AND b.rate > 0.04 THEN b.plang
              ELSE 'und' END AS lang_pred
  FROM d JOIN stats st USING (doc_id)
  LEFT JOIN (SELECT doc_id, plang, rate FROM best WHERE rn = 1) b
    USING (doc_id)
)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY lang, lang_pred
"""


# ---------------------------------------------------------------------------
# W1: gap-based sessionization (streaming window Ray Data lacks natively)
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800


def q_events_sessions(sf_dir: str):
    """Per-user gap sessionization over the events stream: a new session
    starts when the gap to the previous event exceeds 30 min.

    Partitioning assumption (stated per the custom-operator contract):
    all events of one user land in one hash bucket, so session boundaries
    are computed from a complete per-user timeline; within a bucket the
    whole computation is one vectorized pandas pass (sort + diff +
    cumsum), never per-user Python."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])

    def to_epoch(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"], "tse": epoch})

    ds = hash_bucket(ds.map_batches(to_epoch, batch_format="pyarrow", zero_copy_batch=True),
                     "user_id", 32)

    def sessionize(g):
        import pandas as pd

        g = g.drop(columns=["_part"]).sort_values(
            ["user_id", "tse", "event_id"], kind="mergesort", ignore_index=True
        )
        uid = g["user_id"].to_numpy()
        tse = g["tse"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = _SESSION_GAP_S + 1
        gap[1:] = tse[1:] - tse[:-1]
        brk = (new_user | (gap > _SESSION_GAP_S)).astype(np.int64)
        # per-user session index: cumulative breaks minus the user's base
        cum = np.cumsum(brk)
        user_base = pd.Series(cum - brk).groupby(uid).transform("min").to_numpy()
        g["session_idx"] = cum - user_base
        out = (
            g.groupby(["user_id", "session_idx"], as_index=False)
            .agg(
                n_events=("event_id", "size"),
                start_epoch=("tse", "min"),
                end_epoch=("tse", "max"),
                first_event=("event_id", "min"),
            )
        )
        return out.astype("int64")

    return ds.groupby("_part").map_groups(sessionize, batch_format="pandas")


_SQL_EVENTS_SESSIONS = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) // 1000 AS tse FROM events
),
b AS (
  SELECT *, CASE WHEN lag(tse) OVER w IS NULL
                   OR tse - lag(tse) OVER w > {_SESSION_GAP_S} THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tse, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM b
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(tse) AS start_epoch, max(tse) AS end_epoch,
       min(event_id) AS first_event
FROM s GROUP BY user_id, session_idx
"""

# ---------------------------------------------------------------------------
# W2: as-of join (events -> most recent order of the same customer)
# ---------------------------------------------------------------------------


def q_orders_asof(sf_dir: str):
    """As-of join: each event picks the latest order (by o_orderdate,
    ties broken by highest o_orderkey) with o_custkey == user_id and
    o_orderdate <= event ts.

    Partitioning assumption: both sides hash-bucket on the join key, so
    each bucket holds every order a bucket's events can match; the
    per-bucket kernel is ``pd.merge_asof`` on the co-sorted frames."""
    import pandas as pd

    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ev_conform(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        n = b.num_rows
        return pa.table(
            {"key": b["user_id"], "event_id": b["event_id"], "ts_epoch": epoch,
             "o_orderkey": pa.nulls(n, pa.int64()), "order_epoch": pa.nulls(n, pa.int64()),
             "side": pa.array(np.full(n, 1, dtype=np.int8))}
        )

    def od_conform(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b["o_orderdate"].cast(pa.timestamp("us")), pa.int64()), 1_000_000)
        n = b.num_rows
        return pa.table(
            {"key": b["o_custkey"], "event_id": pa.nulls(n, pa.int64()),
             "ts_epoch": pa.nulls(n, pa.int64()),
             "o_orderkey": b["o_orderkey"], "order_epoch": epoch,
             "side": pa.array(np.full(n, 0, dtype=np.int8))}
        )

    from deduplicator_ray.stages.exact import hash_bucket

    both = ev.map_batches(ev_conform, batch_format="pyarrow", zero_copy_batch=True).union(
        od.map_batches(od_conform, batch_format="pyarrow", zero_copy_batch=True)
    )
    both = hash_bucket(both, "key", 32)

    def asof(g):
        import pandas as pd

        g = g.drop(columns=["_part"])
        left = g[g["side"] == 1][["key", "event_id", "ts_epoch"]].astype("int64")
        right = g[g["side"] == 0][["key", "o_orderkey", "order_epoch"]].astype("int64")
        if left.empty:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "ts_epoch": pd.Series([], dtype="int64"),
                 "asof_orderkey": pd.Series([], dtype="float64"),
                 "order_epoch": pd.Series([], dtype="float64")}
            )
        left = left.sort_values(["ts_epoch", "event_id"], kind="mergesort", ignore_index=True)
        # merge_asof keeps the LAST right row at each (key, time): sorting
        # by (order_epoch, o_orderkey) makes that the max orderkey
        right = right.sort_values(["order_epoch", "o_orderkey"], kind="mergesort",
                                  ignore_index=True)
        m = pd.merge_asof(
            left, right, left_on="ts_epoch", right_on="order_epoch", by="key",
            direction="backward", allow_exact_matches=True,
        )
        return pd.DataFrame(
            {"event_id": m["event_id"].astype("int64"),
             "user_id": m["key"].astype("int64"),
             "ts_epoch": m["ts_epoch"].astype("int64"),
             "asof_orderkey": m["o_orderkey"].astype("float64"),
             "order_epoch": m["order_epoch"].astype("float64")}
        )

    return both.groupby("_part").map_groups(asof, batch_format="pandas")


_SQL_ORDERS_ASOF = """
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) // 1000 AS ts_epoch FROM events
),
o AS (
  SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) // 1000 AS order_epoch FROM orders
),
ranked AS (
  SELECT e.event_id, e.user_id, e.ts_epoch, o.o_orderkey, o.order_epoch,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.order_epoch DESC, o.o_orderkey DESC) AS rn
  FROM e JOIN o ON o.o_custkey = e.user_id AND o.order_epoch <= e.ts_epoch
)
SELECT e.event_id, e.user_id, e.ts_epoch,
       CAST(r.o_orderkey AS DOUBLE) AS asof_orderkey,
       CAST(r.order_epoch AS DOUBLE) AS order_epoch
FROM e LEFT JOIN ranked r ON r.event_id = e.event_id AND r.rn = 1
"""

# ---------------------------------------------------------------------------
# S2/S3 + M11/M12: WARC ingest round-trip (oracle-checked)
# ---------------------------------------------------------------------------

_WARC_N_DOCS = 200
_WARC_EPOCH0 = 1_700_000_000
_PROFILE_IDENTICAL = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
_PROFILE_NOT_MODIFIED = "http://netpreserve.org/warc/1.0/revisit/server-not-modified"


def q_warc_roundtrip(sf_dir: str):
    """Synthesize a deterministic WARC file from the documents table
    (response + revisit records with HTTP blocks), read it back through
    the WARC source, and emit the parsed rows — exercising url filtering,
    HTTP status/Content-Type/ETag extraction, revisit demap and the
    ETag-nulling rule (WarcFileIterator.java:109-154) end to end.  The
    oracle recomputes every expected row directly from ``documents``."""
    import datetime as _dt
    import hashlib as _hl
    import os as _os

    import pyarrow.parquet as pq

    from deduplicator_ray.sources.warc import read_warc, write_warc

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
    )
    docs = docs[docs["doc_id"] < _WARC_N_DOCS].sort_values("doc_id")
    records = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        iso = _dt.datetime.fromtimestamp(
            _WARC_EPOCH0 + doc_id, _dt.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        url = f"https://warc.example/d/{doc_id}"
        rec = {
            "url": url,
            "date": iso,
            "digest": "md5:" + _hl.md5(text.encode("utf-8")).hexdigest(),
            "record_id": f"<urn:uuid:{doc_id}>",
            "http_status": 200,
            "mime": "text/html",
            "etag": f'W/"{doc_id}"',
            "payload": text.encode("utf-8"),
        }
        if doc_id % 5 == 0 and doc_id > 0:
            rec.update(
                type="revisit",
                refers_to_url=url,
                refers_to_date=_dt.datetime.fromtimestamp(
                    _WARC_EPOCH0 + doc_id - 1000, _dt.timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%SZ"),
                # every other revisit is server-not-modified: its ETag
                # survives; identical-payload revisits get it nulled
                profile=_PROFILE_NOT_MODIFIED if doc_id % 10 == 0 else _PROFILE_IDENTICAL,
                payload=b"",
            )
        else:
            rec["type"] = "response"
        records.append(rec)
    # a skipped record type + a non-http url prove the filters
    records.append({"type": "metadata", "url": "https://warc.example/meta",
                    "date": "2023-11-14T22:13:20Z", "payload": b"x"})
    records.append({"type": "response", "url": "dns:warc.example",
                    "date": "2023-11-14T22:13:20Z"})
    out_dir = "/tmp/graft_warc"
    _os.makedirs(out_dir, exist_ok=True)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = write_warc(f"{out_dir}/roundtrip_{tag}.warc.gz", records)

    ds = read_warc(path)

    def project(b: pa.Table) -> pa.Table:
        def epoch(col):
            return pc.divide(pc.cast(b[col].cast(pa.timestamp("us")), pa.int64()), 1_000_000)

        return pa.table(
            {
                "url": b["url"],
                "ts_epoch": epoch("warc_ts"),
                "status": pc.cast(b["status"], pa.int64()),
                "mime": b["mime"],
                "digest": b["digest"],
                "etag": b["etag"],
                "is_revisit": b["is_revisit"],
                "original_url": b["original_url"],
                "original_epoch": epoch("original_ts"),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


_SQL_WARC_ROUNDTRIP = f"""
SELECT 'https://warc.example/d/' || doc_id AS url,
       CAST({_WARC_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       CAST(200 AS BIGINT) AS status,
       'text/html' AS mime,
       'md5:' || md5(text) AS digest,
       CASE WHEN doc_id % 5 = 0 AND doc_id > 0 AND doc_id % 10 <> 0
            THEN NULL ELSE 'W/"' || doc_id || '"' END AS etag,
       doc_id % 5 = 0 AND doc_id > 0 AS is_revisit,
       CASE WHEN doc_id % 5 = 0 AND doc_id > 0
            THEN 'https://warc.example/d/' || doc_id END AS original_url,
       CASE WHEN doc_id % 5 = 0 AND doc_id > 0
            THEN CAST({_WARC_EPOCH0} + doc_id - 1000 AS BIGINT) END AS original_epoch
FROM documents WHERE doc_id < {_WARC_N_DOCS}
"""

def q_arc_roundtrip(sf_dir: str):
    """Synthesize a deterministic legacy ARC v2 file from the documents
    table (HTTP payloads, md5 checksums in the URL-record line), read it
    back through the ARC source (sources/arc.py), and emit the parsed
    rows — filedesc skip, http filter, 14-digit date parse, v2
    result-code/checksum extraction, ETag-from-HTTP, byte-exact payload
    lengths.  The oracle recomputes every expected row directly from
    ``documents`` (payload length = fixed HTTP header bytes +
    octet_length(text)); the v1/sha1-fallback path is pytest-covered
    (DuckDB has no sha1)."""
    import datetime as _dt
    import hashlib as _hl
    import os as _os

    import pyarrow.parquet as pq

    from deduplicator_ray.sources.arc import read_arc, write_arc

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
    )
    docs = docs[docs["doc_id"] < _WARC_N_DOCS].sort_values("doc_id")
    records = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        body = text.encode("utf-8")
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + b'ETag: W/"%d"\r\n\r\n' % doc_id
            + body
        )
        records.append({
            "url": f"https://arc.example/d/{doc_id}",
            "date14": _dt.datetime.fromtimestamp(
                _WARC_EPOCH0 + doc_id, _dt.timezone.utc
            ).strftime("%Y%m%d%H%M%S"),
            "mime": "text/html",
            "status": 200,
            "checksum": _hl.md5(body).hexdigest(),
            "payload": payload,
        })
    # a non-http record proves the url filter (the writer's filedesc
    # version block proves the metadata skip)
    records.append({"url": "dns:arc.example", "date14": "20231114221320",
                    "payload": b"x"})
    out_dir = "/tmp/graft_arc"
    _os.makedirs(out_dir, exist_ok=True)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = write_arc(f"{out_dir}/roundtrip_{tag}.arc.gz", records)

    ds = read_arc(path)

    def project(b: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(b["warc_ts"].cast(pa.timestamp("us")), pa.int64()),
            1_000_000)
        return pa.table({
            "url": b["url"],
            "ts_epoch": epoch,
            "status": pc.cast(b["status"], pa.int64()),
            "mime": b["mime"],
            "digest": b["digest"],
            "etag": b["etag"],
            "n_payload_bytes": pc.cast(b["content_length"], pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


# fixed HTTP header bytes before the body: "HTTP/1.1 200 OK\r\n" (17) +
# "Content-Type: text/html\r\n" (25) + 'ETag: W/"<id>"\r\n' (12 +
# len(id)) + "\r\n" (2) = 56 + len(doc_id as string)
_SQL_ARC_ROUNDTRIP = f"""
SELECT 'https://arc.example/d/' || doc_id AS url,
       CAST({_WARC_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       CAST(200 AS BIGINT) AS status,
       'text/html' AS mime,
       md5(text) AS digest,
       'W/"' || doc_id || '"' AS etag,
       CAST(56 + length(doc_id::VARCHAR) + octet_length(text::BLOB)
            AS BIGINT) AS n_payload_bytes
FROM documents WHERE doc_id < {_WARC_N_DOCS}
"""


def q_wet_roundtrip(sf_dir: str):
    """Synthesize a deterministic WET file (Common Crawl extracted-text
    format) from the documents table, read it back through the WET
    source (sources/wet.py), and emit the parsed rows — conversion-only
    filtering, utf-8 text body, byte-exact content length.  Oracle
    recomputes every row directly from ``documents``."""
    import datetime as _dt
    import hashlib as _hl
    import os as _os

    import pyarrow.parquet as pq

    from deduplicator_ray.sources.wet import read_wet, write_wet

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
    )
    docs = docs[docs["doc_id"] < _WARC_N_DOCS].sort_values("doc_id")
    records = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        iso = _dt.datetime.fromtimestamp(
            _WARC_EPOCH0 + doc_id, _dt.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        records.append({"url": f"https://wet.example/d/{doc_id}",
                        "date": iso, "text": text})
    # warcinfo header + a non-http conversion record prove the filters
    records.insert(0, {"type": "warcinfo", "url": "https://wet.example/x",
                       "date": "2023-11-14T22:13:20Z", "text": "software: x"})
    records.append({"type": "conversion", "url": "dns:wet.example",
                    "date": "2023-11-14T22:13:20Z", "text": "skip"})
    out_dir = "/tmp/graft_wet"
    _os.makedirs(out_dir, exist_ok=True)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = write_wet(f"{out_dir}/roundtrip_{tag}.warc.wet.gz", records)

    ds = read_wet(path)

    def project(b: pa.Table) -> pa.Table:
        ts = pc.divide(pc.cast(b["warc_ts"].cast(pa.timestamp("us")),
                               pa.int64()), 1_000_000)
        return pa.table({
            "url": b["url"],
            "ts_epoch": ts,
            "text": b["text"],
            "content_length": pc.cast(b["content_length"], pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


_SQL_WET_ROUNDTRIP = f"""
SELECT 'https://wet.example/d/' || doc_id AS url,
       CAST({_WARC_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       text,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length
FROM documents WHERE doc_id < {_WARC_N_DOCS}
"""


def q_mixed_roundtrip(sf_dir: str):
    """Synthesize ONE directory holding an ARC v2, a WARC and a WET file
    (documents partitioned across the three container families by
    ``doc_id % 3``), read it back through the ``mixed`` source registry
    entry (sources/__init__.py `_mixed_source`) in a single pass, and
    emit the unified superset-schema rows — proving the per-file family
    dispatch, the container/WET conform rules (null ``text`` +
    ``content_bytes=content_length`` for container rows; synthesized
    status/mime/md5-of-text digest + utf-8 byte count for WET rows) and
    the three-way union, end to end.  The oracle recomputes every
    expected row per family directly from ``documents`` (the WARC/ARC
    HTTP envelope is 56 bytes + len(doc_id) before the body, see
    `_SQL_ARC_ROUNDTRIP`).  Non-http records in the ARC and WARC files
    prove the url filters fire inside a mixed run too."""
    import datetime as _dt
    import hashlib as _hl
    import os as _os

    import pyarrow.parquet as pq

    from deduplicator_ray.sources import get_source
    from deduplicator_ray.sources.arc import write_arc
    from deduplicator_ray.sources.warc import write_warc
    from deduplicator_ray.sources.wet import write_wet

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
    )
    docs = docs[docs["doc_id"] < _WARC_N_DOCS].sort_values("doc_id")

    def iso(doc_id: int) -> str:
        return _dt.datetime.fromtimestamp(
            _WARC_EPOCH0 + doc_id, _dt.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")

    arc_recs, warc_recs, wet_recs = [], [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        body = text.encode("utf-8")
        fam = doc_id % 3
        if fam == 0:
            arc_recs.append({
                "url": f"https://mixed.example/arc/{doc_id}",
                "date14": _dt.datetime.fromtimestamp(
                    _WARC_EPOCH0 + doc_id, _dt.timezone.utc
                ).strftime("%Y%m%d%H%M%S"),
                "mime": "text/html",
                "status": 200,
                "checksum": _hl.md5(body).hexdigest(),
                "payload": (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + b'ETag: W/"%d"\r\n\r\n' % doc_id
                    + body
                ),
            })
        elif fam == 1:
            warc_recs.append({
                "type": "response",
                "url": f"https://mixed.example/warc/{doc_id}",
                "date": iso(doc_id),
                "digest": "md5:" + _hl.md5(body).hexdigest(),
                "record_id": f"<urn:uuid:{doc_id}>",
                "http_status": 200,
                "mime": "text/html",
                "etag": f'W/"{doc_id}"',
                "payload": body,
            })
        else:
            wet_recs.append({"url": f"https://mixed.example/wet/{doc_id}",
                             "date": iso(doc_id), "text": text})
    # per-family filter provers: skipped inside the mixed dispatch too
    arc_recs.append({"url": "dns:mixed.example", "date14": "20231114221320",
                     "payload": b"x"})
    warc_recs.append({"type": "metadata", "url": "https://mixed.example/meta",
                      "date": "2023-11-14T22:13:20Z", "payload": b"x"})

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = f"/tmp/graft_mixed/{tag}"
    _os.makedirs(out_dir, exist_ok=True)
    write_arc(f"{out_dir}/part-arc.arc.gz", arc_recs)
    write_warc(f"{out_dir}/part-warc.warc.gz", warc_recs)
    write_wet(f"{out_dir}/part-wet.warc.wet.gz", wet_recs)

    ds = get_source("mixed")(out_dir)

    def project(b: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(b["warc_ts"].cast(pa.timestamp("us")), pa.int64()),
            1_000_000)
        return pa.table({
            "url": b["url"],
            "ts_epoch": epoch,
            "status": pc.cast(b["status"], pa.int64()),
            "mime": b["mime"],
            "digest": b["digest"],
            "etag": b["etag"],
            "content_bytes": pc.cast(b["content_bytes"], pa.int64()),
            "text": pc.cast(b["text"], pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


# One SELECT per container family over the same documents partition the
# pipeline wrote, unioned — the mixed source's conform rules verbatim:
# container rows carry NULL text and the HTTP-envelope byte count
# (56 + len(doc_id) header bytes + body, see _SQL_ARC_ROUNDTRIP); WET
# rows carry the text, a synthesized 200/text-plain envelope, the
# md5-of-text digest and the utf-8 byte count.
_SQL_MIXED_ROUNDTRIP = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_WARC_N_DOCS}
)
SELECT 'https://mixed.example/arc/' || doc_id AS url,
       CAST({_WARC_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       CAST(200 AS BIGINT) AS status,
       'text/html' AS mime,
       md5(text) AS digest,
       'W/"' || doc_id || '"' AS etag,
       CAST(56 + length(doc_id::VARCHAR) + octet_length(encode(text))
            AS BIGINT) AS content_bytes,
       CAST(NULL AS VARCHAR) AS text
FROM d WHERE doc_id % 3 = 0
UNION ALL
SELECT 'https://mixed.example/warc/' || doc_id,
       CAST({_WARC_EPOCH0} + doc_id AS BIGINT),
       CAST(200 AS BIGINT),
       'text/html',
       'md5:' || md5(text),
       'W/"' || doc_id || '"',
       CAST(56 + length(doc_id::VARCHAR) + octet_length(encode(text))
            AS BIGINT),
       CAST(NULL AS VARCHAR)
FROM d WHERE doc_id % 3 = 1
UNION ALL
SELECT 'https://mixed.example/wet/' || doc_id,
       CAST({_WARC_EPOCH0} + doc_id AS BIGINT),
       CAST(200 AS BIGINT),
       'text/plain',
       md5(text),
       CAST(NULL AS VARCHAR),
       CAST(octet_length(encode(text)) AS BIGINT),
       text
FROM d WHERE doc_id % 3 = 2
"""


def q_crawl_log_roundtrip(sf_dir: str):
    """Synthesize a deterministic Heritrix ``crawl.log`` from the
    documents table (response lines + revisit lines carrying the
    ``Revisit:IdenticalPayloadDigest`` annotation and the JSON
    extra-info block), read it back through the crawl-log source
    (sources/crawl_log.py — CrawlLogIterator.java:146-228 semantics:
    13-field whitespace split, status>0 filter, 17-digit+duration
    timestamp, revisit regex, RevisitRefersToURI/Date/Profile JSON) and
    emit the parsed rows.  Malformed-line provers (short line, status 0,
    bad timestamp, <10 fields) are dropped by the parser exactly like
    the reference's skipped counter.  The oracle recomputes every
    surviving row directly from ``documents``."""
    import datetime as _dt
    import hashlib as _hl
    import json as _json
    import os as _os

    import pyarrow.parquet as pq

    from deduplicator_ray.sources.crawl_log import read_crawl_log

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
    )
    docs = docs[docs["doc_id"] < _WARC_N_DOCS].sort_values("doc_id")
    lines = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        body = text.encode("utf-8")
        fetch17 = _dt.datetime.fromtimestamp(
            _WARC_EPOCH0 + doc_id, _dt.timezone.utc
        ).strftime("%Y%m%d%H%M%S") + "177"
        url = f"https://log.example/d/{doc_id}"
        digest = "sha1:" + _hl.md5(body).hexdigest()
        dur = doc_id % 400
        base = (f"2023-11-14T22:13:20.000Z 200 {len(body)} {url} L "
                f"https://log.example/ text/html #042 {fetch17}+{dur} "
                f"{digest} -")
        if doc_id % 5 == 0 and doc_id > 0:
            refers_iso = _dt.datetime.fromtimestamp(
                _WARC_EPOCH0 + doc_id - 1000, _dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            extra = _json.dumps({
                "RevisitProfile": "IdenticalPayloadDigest",
                "RevisitRefersToURI": url,
                "RevisitRefersToDate": refers_iso,
            }, separators=(",", ":"))
            lines.append(f"{base} duplicate:Revisit:IdenticalPayloadDigest {extra}")
        else:
            lines.append(f"{base} content-size:{len(body)}")
    # malformed provers, each a distinct parser drop rule
    lines.append("too-short")                                        # <=42 chars
    lines.append("2023-11-14T22:13:20.000Z 0 1 https://log.example/zero "
                 "L - text/html #001 20231114221320000+1 sha1:x - -")  # status<=0
    lines.append("2023-11-14T22:13:20.000Z 200 1 https://log.example/badts "
                 "L - text/html #001 NOT_A_TIMESTAMP sha1:x - -")     # bad ts
    lines.append("2023-11-14T22:13:20.000Z 200 1 https://log.example/short "
                 "L - text/html #001 x")                              # <10 fields

    out_dir = "/tmp/graft_crawl_log"
    _os.makedirs(out_dir, exist_ok=True)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{out_dir}/roundtrip_{tag}.crawl.log"
    tmp = f"{path}.tmp.{_os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    _os.replace(tmp, path)

    ds = read_crawl_log(path)

    def project(b: pa.Table) -> pa.Table:
        def epoch(col):
            return pc.divide(
                pc.cast(b[col].cast(pa.timestamp("us")), pa.int64()),
                1_000_000)

        return pa.table({
            "url": b["url"],
            "ts_epoch": epoch("warc_ts"),
            "status": pc.cast(b["status"], pa.int64()),
            "mime": b["mime"],
            "digest": b["digest"],
            "is_revisit": b["is_revisit"],
            "original_url": b["original_url"],
            "original_epoch": epoch("original_ts"),
            "revisit_profile": b["revisit_profile"],
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


_SQL_CRAWL_LOG_ROUNDTRIP = f"""
SELECT 'https://log.example/d/' || doc_id AS url,
       CAST({_WARC_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       CAST(200 AS BIGINT) AS status,
       'text/html' AS mime,
       'sha1:' || md5(text) AS digest,
       doc_id % 5 = 0 AND doc_id > 0 AS is_revisit,
       CASE WHEN doc_id % 5 = 0 AND doc_id > 0
            THEN 'https://log.example/d/' || doc_id END AS original_url,
       CASE WHEN doc_id % 5 = 0 AND doc_id > 0
            THEN CAST({_WARC_EPOCH0} + doc_id - 1000 AS BIGINT)
            END AS original_epoch,
       CASE WHEN doc_id % 5 = 0 AND doc_id > 0
            THEN 'IdenticalPayloadDigest' END AS revisit_profile
FROM documents WHERE doc_id < {_WARC_N_DOCS}
"""


def q_frame_plan(sf_dir: str):
    """Video frame-sampling plumbing with a REAL recomputation oracle:
    give every document a data-dependent fake video duration
    (200 + utf-8-byte-length mod 9800 ms), run the actual
    ``sample_frames`` actor stage (stages/multimodal.py) at fps=2, and
    explode the per-row frame-timestamp plan to (doc_id, duration_ms,
    frame_ts_ms) rows — the exact frames a real decoder would be asked
    to extract.  The oracle mirrors the plan arithmetic with DuckDB's
    stepped ``range`` unnest (timestamps 0..duration step 500,
    exclusive), so the whole list-typed plan is value-checked, not
    pinned."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import sample_frames

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_WARC_N_DOCS}")

    def prep(b: pa.Table) -> pa.Table:
        nbytes = pc.binary_length(
            pc.cast(pc.cast(b["text"], pa.large_string()), pa.large_binary())
        ).to_numpy(zero_copy_only=False)
        dur = (200 + nbytes % 9800).astype(np.int32)
        return pa.table({
            "doc_id": b["doc_id"],
            "duration_ms": pa.array(dur),
        })

    plan = sample_frames(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        fps=2.0,
    )

    def explode(b: pa.Table) -> pa.Table:
        lists = b["frame_ts_ms"]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        idx = pc.list_parent_indices(lists)
        return pa.table({
            "doc_id": pc.take(b["doc_id"], idx),
            "duration_ms": pc.cast(pc.take(b["duration_ms"], idx), pa.int64()),
            "frame_ts_ms": pc.cast(pc.list_flatten(lists), pa.int64()),
        })

    return plan.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)


_SQL_FRAME_PLAN = f"""
WITH d AS (
  SELECT doc_id,
         200 + (octet_length(encode(text)) % 9800) AS duration_ms
  FROM documents WHERE doc_id < {_WARC_N_DOCS}
)
SELECT doc_id,
       CAST(duration_ms AS BIGINT) AS duration_ms,
       CAST(t.ts AS BIGINT) AS frame_ts_ms
FROM d, unnest(range(0, duration_ms, 500)) AS t(ts)
"""


def q_resize_plan(sf_dir: str):
    """Image resize planning with a REAL recomputation oracle: give
    every document data-dependent fake image dimensions (spanning both
    the no-op regime long-side <= 256 and the downscale regime), run the
    actual ``resize_plan`` stage (stages/multimodal.py — aspect-ratio
    preserving, long side clamped to max_side, numpy banker's rounding)
    and emit the planned target dimensions.  The oracle mirrors the
    arithmetic exactly in DuckDB doubles — ``round_even`` IS numpy's
    half-to-even rule, and both engines evaluate the same IEEE-double
    ``w * (256 / long_side)`` product — so the plan is value-checked."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.stages.multimodal import resize_plan

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_WARC_N_DOCS}")

    def prep(b: pa.Table) -> pa.Table:
        nbytes = pc.binary_length(
            pc.cast(pc.cast(b["text"], pa.large_string()), pa.large_binary())
        ).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "width": pa.array((16 + nbytes * 13 % 4000).astype(np.int32)),
            "height": pa.array((16 + nbytes * 7 % 3000).astype(np.int32)),
        })

    plan = resize_plan(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        max_side=256,
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "width": pc.cast(b["width"], pa.int64()),
            "height": pc.cast(b["height"], pa.int64()),
            "target_width": pc.cast(b["target_width"], pa.int64()),
            "target_height": pc.cast(b["target_height"], pa.int64()),
        })

    return plan.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True)


_SQL_RESIZE_PLAN = f"""
WITH d AS (
  SELECT doc_id,
         16 + (octet_length(encode(text)) * 13) % 4000 AS width,
         16 + (octet_length(encode(text)) * 7) % 3000 AS height
  FROM documents WHERE doc_id < {_WARC_N_DOCS}
), s AS (
  SELECT doc_id, width, height,
         LEAST(1.0, 256.0 / GREATEST(1, GREATEST(width, height))) AS scale
  FROM d
)
SELECT doc_id,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(GREATEST(1, round_even(width * scale, 0)) AS BIGINT)
           AS target_width,
       CAST(GREATEST(1, round_even(height * scale, 0)) AS BIGINT)
           AS target_height
FROM s
"""


def q_simhash_md5_sigs(sf_dir: str):
    """SimHash signatures with the WHOLE vote kernel independently
    recomputed in SQL: the ``token_hash="md5"`` variant of the SimHash
    stage (stages/simhash.py) hashes each token to DuckDB's
    ``md5_number_lower`` (little-endian int of md5 digest bytes 8..16)
    over the RE2-whitespace tokenization, so the oracle rebuilds every
    64-bit signature from scratch — per-bit majority votes across all
    token occurrences, tie -> 0, empty doc -> 0 — with no pinned
    values.  This graduates the simhash KERNEL semantics (tokenize ->
    per-token 64-bit hash -> bit votes -> sign pack) to a real
    recomputation; the production siphash path (`simhash_dups`) shares
    everything but the hash function."""
    import ray.data as rd

    from deduplicator_ray.stages.simhash import simhash_signatures

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_WARC_N_DOCS}")
    sigs = simhash_signatures(ds, token_hash="md5")

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "simhash": pc.cast(b["simhash"], pa.int64()),
        })

    return sigs.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True)


# Full from-scratch SimHash recomputation: tokenize on the same RE2 \s
# class the stage uses, hash every token occurrence with
# md5_number_lower, majority-vote each of the 64 bit positions
# (2*ones > n; ties 0), pack to a signed 64-bit int (two's complement
# via HUGEINT), empty/whitespace-only docs -> 0 through the LEFT JOIN.
_SQL_SIMHASH_MD5_SIGS = f"""
WITH d AS (
  SELECT doc_id, lower(text) AS t
  FROM documents WHERE doc_id < {_WARC_N_DOCS}
), tok AS (
  SELECT doc_id, tk
  FROM d, unnest(string_split_regex(t, '[ \t\n\r\f]+')) AS u(tk)
  WHERE tk <> ''
), th AS (
  SELECT doc_id, md5_number_lower(tk) AS h FROM tok
), votes AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
         COUNT(*) AS n
  FROM th, generate_series(0, 63) AS g(i)
  GROUP BY doc_id, i
), bits AS (
  SELECT doc_id,
         SUM(CASE WHEN 2 * ones > n THEN CAST(1 AS HUGEINT) << i
                  ELSE CAST(0 AS HUGEINT) END) AS s
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN b.s IS NULL THEN 0
                 WHEN b.s >= CAST('9223372036854775808' AS HUGEINT)
                 THEN b.s - CAST('18446744073709551616' AS HUGEINT)
                 ELSE b.s END AS BIGINT) AS simhash
FROM d LEFT JOIN bits b USING (doc_id)
"""

_SIMHASH_MD5_PAIRS_N = 1000


def q_minhash_md5_sigs(sf_dir: str):
    """MinHash signatures with the WHOLE pipeline independently
    recomputed in SQL: the ``word_hash="md5"`` variant of the MinHash
    stage (stages/minhash.py MinHasher) — ASCII ``\\w`` tokenization,
    md5_number_lower word hashes, the position-sensitive multiply-xor
    k-shingle combine mod 2^64, reduction mod the Mersenne prime
    2^31-1, distinct shingles, and the seeded affine permutation mins
    ((a*h+b) mod P per perm, empty doc -> P) — exploded to
    (doc_id, perm, sig) rows.  The oracle rebuilds every signature from
    the raw text: tokens via the same RE2 class, the rolling combine
    via lead() windows with UHUGEINT modular products, and the 16
    (a, b) permutation constants inlined as the operator's published
    config literals (np.default_rng(seed=42), exactly `_perm_tables`).
    This graduates the MinHash KERNEL semantics — the production
    siphash path (`neardup_clusters_minhash` et al.) shares everything
    but the word hash."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.minhash import _blob_matrix, signatures

    cfg = MinHashConfig(shingle_words=3, num_perms=16, bands=4,
                        rows_per_band=4)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_WARC_N_DOCS}")
    sigs = signatures(ds, cfg, word_hash="md5")

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        m8 = _blob_matrix(b["minhash_sig"], 4 * cfg.num_perms)  # (n, 4P) u8
        m = np.ascontiguousarray(m8).view("<u4").reshape(n, cfg.num_perms)
        doc = np.repeat(np.asarray(b["doc_id"], dtype=np.int64),
                        cfg.num_perms)
        perm = np.tile(np.arange(cfg.num_perms, dtype=np.int64), n)
        return pa.table({
            "doc_id": pa.array(doc),
            "perm": pa.array(perm),
            "sig": pa.array(m.reshape(-1).astype(np.int64)),
        })

    return sigs.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)


# The 16 (perm, a, b) constants below ARE the operator's config: the
# affine coefficients `_perm_tables(MinHashConfig(seed=42))` publishes
# for num_perms=16 — config literals like the epoch/coef constants
# above, not pinned output.  2^64 modulus via UHUGEINT keeps the
# multiply-xor combine's wraparound arithmetic exact.
_MINHASH_MD5_PERMS = (
    "(0, 191664964, 1102145672), (1, 1662057957, 275121930), "
    "(2, 1405681632, 1803345590), (3, 942484272, 967196436), "
    "(4, 929893138, 1074497555), (5, 1843824992, 796282693), "
    "(6, 184566855, 392022359), (7, 1497586438, 1990212658), "
    "(8, 432652534, 1678403330), (9, 202244315, 1382689815), "
    "(10, 1130604997, 864178266), (11, 2095133045, 1766867109), "
    "(12, 1580016184, 1171300112), (13, 1634535062, 952224740), "
    "(14, 1540770719, 967354524), (15, 1688060240, 487991438)"
)

_MM64 = "CAST('18446744073709551616' AS UHUGEINT)"


def _sql_mulmod64(col: str, coef: int) -> str:
    return (f"CAST((CAST({col} AS UHUGEINT) * CAST({coef} AS UHUGEINT))"
            f" % {_MM64} AS UBIGINT)")


# Shared CTE chain rebuilding the md5-variant MinHash signatures from
# raw text, ending in ``msig(doc_id, perm, sig)`` — used by both
# `minhash_md5_sigs` and `bbit_md5_est`.
_MINHASH_MD5_SIG_CTE = f"""d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS toks
  FROM documents WHERE doc_id < {_WARC_N_DOCS}
), t AS (
  SELECT doc_id, len(toks) AS n, unnest(toks) AS w,
         unnest(range(1, len(toks)+1)) AS pos
  FROM d
), wh AS (
  SELECT doc_id, n, pos, md5_number_lower(w) AS h0,
         lead(md5_number_lower(w), 1)
             OVER (PARTITION BY doc_id ORDER BY pos) AS h1,
         lead(md5_number_lower(w), 2)
             OVER (PARTITION BY doc_id ORDER BY pos) AS h2
  FROM t
), sh AS (
  SELECT DISTINCT doc_id,
     (xor(xor({_sql_mulmod64('h0', 0x9E3779B97F4A7C15)},
              CASE WHEN h1 IS NULL THEN 0
                   ELSE {_sql_mulmod64('h1', 0xC2B2AE3D27D4EB4F)} END),
              CASE WHEN h2 IS NULL THEN 0
                   ELSE {_sql_mulmod64('h2', 0x165667B19E3779F9)} END)
     ) % 2147483647 AS hp
  FROM wh
  WHERE (n >= 3 AND pos <= n - 2) OR (n < 3 AND pos = 1)
), perms AS (
  SELECT * FROM (VALUES {_MINHASH_MD5_PERMS}) AS p(perm, a, b)
), mins AS (
  SELECT s.doc_id, p.perm,
         MIN((p.a * CAST(s.hp AS BIGINT) + p.b) % 2147483647) AS sig
  FROM sh s CROSS JOIN perms p GROUP BY s.doc_id, p.perm
), msig AS (
  SELECT dd.doc_id, CAST(p.perm AS BIGINT) AS perm,
         CAST(COALESCE(m.sig, 2147483647) AS BIGINT) AS sig
  FROM (SELECT doc_id FROM documents WHERE doc_id < {_WARC_N_DOCS}) dd
  CROSS JOIN perms p
  LEFT JOIN mins m ON m.doc_id = dd.doc_id AND m.perm = p.perm
)"""

_SQL_MINHASH_MD5_SIGS = f"""
WITH {_MINHASH_MD5_SIG_CTE}
SELECT doc_id, perm, sig FROM msig
"""


def q_bbit_md5_est(sf_dir: str):
    """b-bit MinHash Jaccard estimates with the WHOLE path value-checked
    in SQL: md5-variant signatures (see `minhash_md5_sigs`) through the
    REAL ``bbit_pack`` stage (b=1: lowest bit of each of 16 perms,
    np.packbits into 2-byte sketches) and ``bbit_estimate_matrix``
    (Li & Koenig 2010) for every doc pair with a positive estimate.
    At k=16, b=1 the estimator is exact integer arithmetic —
    ppm = (eq - 8) * 125000 for eq matching low bits > 8 — so the
    oracle recomputes it from scratch off the rebuilt signatures: the
    bit extraction, packing, XOR-popcount collision count and the
    bias-corrected estimate all round-trip.  The 200-doc pair set is a
    correctness bridge (the production LSH-driven scorer is
    `bbit_jaccard_est`)."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.minhash import (
        bbit_estimate_matrix,
        bbit_pack,
        signatures,
    )

    cfg = MinHashConfig(shingle_words=3, num_perms=16, bands=4,
                        rows_per_band=4)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_WARC_N_DOCS}")
    packed = bbit_pack(signatures(ds, cfg, word_hash="md5"), cfg, b=1)
    # bounded driver merge: _WARC_N_DOCS 2-byte sketches
    pdf = packed.select_columns(["doc_id", "bbit_sig"]).to_pandas()
    pdf = pdf.sort_values("doc_id", ignore_index=True)
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    mat = np.stack([np.frombuffer(x, dtype=np.uint8)
                    for x in pdf["bbit_sig"]])
    ii, jj = np.triu_indices(len(ids), 1)
    est = bbit_estimate_matrix(mat[ii], mat[jj], k=cfg.num_perms, b=1)
    keep = est > 0
    return pa.table({
        "a": pa.array(ids[ii][keep]),
        "b": pa.array(ids[jj][keep]),
        "est_ppm": pa.array(est[keep]),
    })


_SQL_BBIT_MD5_EST = f"""
WITH {_MINHASH_MD5_SIG_CTE},
lowbits AS (SELECT doc_id, perm, sig % 2 AS bit FROM msig),
eqc AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         SUM(CASE WHEN x.bit = y.bit THEN 1 ELSE 0 END) AS eq
  FROM lowbits x JOIN lowbits y
    ON x.perm = y.perm AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, CAST((eq - 8) * 125000 AS BIGINT) AS est_ppm
FROM eqc WHERE eq > 8
"""


def q_containment_md5_est(sf_dir: str):
    """Asymmetric containment estimates with the WHOLE path — LSH
    banding candidacy AND the Li-style estimator — independently
    recomputed in SQL: the ``word_hash="md5"`` variant of
    ``containment_est_pairs`` (stages/minhash.py: sig||size blobs, band
    explode, candidate pairs, signature-agreement scoring) at 16 perms
    / 4 bands.  The oracle rebuilds the signatures from raw text,
    derives band keys (4 consecutive perms), finds every band-sharing
    pair, counts exact distinct shingles per doc from the same CTE, and
    mirrors the estimator's float64 arithmetic operation for operation
    (j = eq/16 is dyadic-exact; inter = j*(|A|+|B|)/(1+j); c = inter
    over size, clipped, half-up ppm) — so candidacy and scoring are
    both value-checked with no pinned output.  The production siphash
    twin is `containment_est`."""
    import ray.data as rd

    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.stages.minhash import containment_est_pairs

    cfg = MinHashConfig(shingle_words=3, num_perms=16, bands=4,
                        rows_per_band=4)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_WARC_N_DOCS}")
    return containment_est_pairs(ds, cfg, key_col="doc_id",
                                 word_hash="md5")


_SQL_CONTAINMENT_MD5_EST = f"""
WITH {_MINHASH_MD5_SIG_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS z FROM sh GROUP BY doc_id),
bnd AS (
  SELECT doc_id, CAST(perm // 4 AS BIGINT) AS band,
         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY perm) AS bk
  FROM msig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bnd x JOIN bnd y
    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id
),
eqc AS (
  SELECT c.a, c.b,
         SUM(CASE WHEN xa.sig = xb.sig THEN 1 ELSE 0 END) AS eq
  FROM cand c
  JOIN msig xa ON xa.doc_id = c.a
  JOIN msig xb ON xb.doc_id = c.b AND xb.perm = xa.perm
  GROUP BY 1, 2
),
scored AS (
  SELECT e.a, e.b,
         CAST(e.eq AS DOUBLE) / 16.0 AS j,
         CAST(COALESCE(za.z, 0) AS DOUBLE) AS za,
         CAST(COALESCE(zb.z, 0) AS DOUBLE) AS zb
  FROM eqc e
  LEFT JOIN sizes za ON za.doc_id = e.a
  LEFT JOIN sizes zb ON zb.doc_id = e.b
),
est AS (
  SELECT a, b, j,
         (j * (za + zb)) / (1.0 + j) AS inter, za, zb
  FROM scored
)
SELECT a AS doc_a, b AS doc_b,
       CAST(FLOOR(CASE WHEN za > 0
                       THEN LEAST(GREATEST(inter / za, 0.0), 1.0)
                       ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT)
           AS c_ab_ppm,
       CAST(FLOOR(CASE WHEN zb > 0
                       THEN LEAST(GREATEST(inter / zb, 0.0), 1.0)
                       ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT)
           AS c_ba_ppm,
       CAST(FLOOR(j * 1000000.0 + 0.5) AS BIGINT) AS j_est_ppm
FROM est
"""


def q_simhash_md5_dups(sf_dir: str):
    """SimHash near-dup PAIRS checked against brute force: the banded
    candidate machinery (4 x 16-bit pigeonhole chunks -> hash-bucket
    shuffle -> vectorized pair generation -> exact popcount verify,
    stages/simhash.py + stages/lsh.py) over md5-hashed signatures, with
    ``overflow="error"`` so any silently-lossy star degradation would
    fail loudly instead of shipping an incomplete pair set.  The oracle
    recomputes every signature from scratch (see `_SQL_SIMHASH_MD5_SIGS`)
    and finds ALL pairs at hamming <= 3 by an all-pairs
    ``bit_count(xor(...))`` join — so both the LSH completeness claim
    (pigeonhole: any pair within radius 3 shares a chunk) and the
    verify kernel are value-checked with no pinned output."""
    import ray.data as rd

    from deduplicator_ray.stages.simhash import simhash_pairs, simhash_signatures

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.filter(expr=f"doc_id < {_SIMHASH_MD5_PAIRS_N}")
    sigs = simhash_signatures(ds, token_hash="md5")
    pairs = simhash_pairs(sigs, key_col="doc_id", max_hamming=3,
                          overflow="error")

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.cast(b["a"], pa.int64()),
            "b": pc.cast(b["b"], pa.int64()),
            "hamming": pc.cast(b["hamming"], pa.int64()),
        })

    return pairs.map_batches(project, batch_format="pyarrow",
                             zero_copy_batch=True)


_SQL_SIMHASH_MD5_DUPS = f"""
WITH d AS (
  SELECT doc_id, lower(text) AS t
  FROM documents WHERE doc_id < {_SIMHASH_MD5_PAIRS_N}
), tok AS (
  SELECT doc_id, tk
  FROM d, unnest(string_split_regex(t, '[ \t\n\r\f]+')) AS u(tk)
  WHERE tk <> ''
), th AS (
  SELECT doc_id, md5_number_lower(tk) AS h FROM tok
), votes AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
         COUNT(*) AS n
  FROM th, generate_series(0, 63) AS g(i)
  GROUP BY doc_id, i
), bits AS (
  SELECT doc_id,
         SUM(CASE WHEN 2 * ones > n THEN CAST(1 AS HUGEINT) << i
                  ELSE CAST(0 AS HUGEINT) END) AS s
  FROM votes GROUP BY doc_id
), sig AS (
  SELECT d.doc_id,
         CAST(CASE WHEN b.s IS NULL THEN 0
                   WHEN b.s >= CAST('9223372036854775808' AS HUGEINT)
                   THEN b.s - CAST('18446744073709551616' AS HUGEINT)
                   ELSE b.s END AS BIGINT) AS simhash
  FROM d LEFT JOIN bits b USING (doc_id)
)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       CAST(bit_count(xor(s1.simhash, s2.simhash)) AS BIGINT) AS hamming
FROM sig s1 JOIN sig s2 ON s1.doc_id < s2.doc_id
WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 3
"""

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def q_chunk_dedup(sf_dir: str):
    """C4-style global chunk dedup over documents (stages/sentdedup.py):
    keep the globally-first occurrence of every 10-word chunk, rebuild
    each doc from its kept chunks."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import chunk_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return chunk_dedup(ds, words_per_chunk=10, num_buckets=32)


# Exact SQL recomputation of chunk_dedup's semantics.  The parallel
# unnest pair is DuckDB's ordinality idiom (WITH ORDINALITY is
# unimplemented in 1.0); chunk = 10 consecutive words; rn=1 marks the
# globally-first occurrence ordered by (doc_id, chunk ordinal).
_SQL_CHUNK_DEDUP = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
), ch AS (
  SELECT doc_id, CAST((ord - 1) // 10 AS BIGINT) AS ord_c,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM w GROUP BY doc_id, ord_c
), r AS (
  SELECT doc_id, ord_c, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ord_c) AS rn
  FROM ch
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY ord_c),
                '') AS text_dedup,
       CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS removed_chunks
FROM r GROUP BY doc_id
"""


def q_boilerplate_dedup(sf_dir: str):
    """CCNet-style frequent-chunk boilerplate removal
    (stages/sentdedup.py:boilerplate_dedup): EVERY occurrence of a
    10-word chunk appearing >= 3 times globally is dropped (vs
    chunk_dedup's keep-first)."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import boilerplate_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return boilerplate_dedup(ds, words_per_chunk=10, min_count=3,
                             num_buckets=32)


# Exact SQL recomputation: count each chunk globally; a chunk occurrence
# survives iff its chunk's global count < 3.
_SQL_BOILERPLATE_DEDUP = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
), ch AS (
  SELECT doc_id, CAST((ord - 1) // 10 AS BIGINT) AS ord_c,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM w GROUP BY doc_id, ord_c
), cnt AS (
  SELECT chunk, count(*) AS n FROM ch GROUP BY chunk
)
SELECT ch.doc_id,
       COALESCE(string_agg(CASE WHEN cnt.n < 3 THEN ch.chunk END,
                           ' ' ORDER BY ch.ord_c), '') AS text_dedup,
       CAST(count(*) FILTER (WHERE cnt.n >= 3) AS BIGINT) AS removed_chunks
FROM ch JOIN cnt USING (chunk)
GROUP BY ch.doc_id
"""


def q_boilerplate_report(sf_dir: str):
    """Top frequent chunks with occurrence/document counts
    (stages/sentdedup.py:boilerplate_report) — the discovery report
    behind boilerplate_dedup's min_count knob."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import boilerplate_report

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return boilerplate_report(ds, words_per_chunk=10, min_count=3,
                              top_n=20, num_buckets=32)


_SQL_BOILERPLATE_REPORT = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
), ch AS (
  SELECT doc_id, CAST((ord - 1) // 10 AS BIGINT) AS ord_c,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM w GROUP BY doc_id, ord_c
)
SELECT chunk, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM ch GROUP BY chunk HAVING count(*) >= 3
ORDER BY n_occ DESC, chunk LIMIT 20
"""


def q_dup_gram_coverage(sf_dir: str):
    """Gopher duplicated-n-gram coverage (stages/sentdedup.py:
    dup_gram_coverage): ppm of token positions inside any within-doc
    3-gram occurring >= 2 times."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import dup_gram_coverage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dup_gram_coverage(ds, ngram=3)


_SQL_DUP_GRAM_COVERAGE = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(COALESCE(text, ''), ' ')) AS word,
         unnest(range(1, len(string_split(COALESCE(text, ''), ' ')) + 1)) AS ord
  FROM documents
), t AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM w GROUP BY doc_id
), g AS (
  SELECT doc_id, ord AS i,
         string_agg(word, ' ') OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS glen
  FROM w
), gg AS (
  SELECT doc_id, i, gram FROM g WHERE glen = 3
), d AS (
  SELECT doc_id, gram FROM gg GROUP BY doc_id, gram HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT gg.doc_id, p
  FROM gg JOIN d USING (doc_id, gram), unnest(range(gg.i, gg.i + 3)) AS t2(p)
), c AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS covered FROM cov GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(COALESCE(c.covered, 0) * 1000000 // t.n_tokens AS BIGINT)
         AS dup_gram_ppm
FROM t LEFT JOIN c USING (doc_id)
"""


_ONION_NGRAM = 3
_ONION_THRESHOLD_PPM = 500_000


def q_onion_filter(sf_dir: str):
    """Onion cross-document duplication gate (stages/sentdedup.py:
    onion_coverage): per doc, the ppm of overlapping 3-gram positions
    whose gram occurs in >= 2 distinct documents corpus-wide;
    keep = onion_ppm <= 50%.  The complement of dup_gram_coverage
    (within-doc) — together they split Gopher A1.1's signal into
    self-repetition vs corpus-level duplication."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import onion_coverage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return onion_coverage(ds, ngram=_ONION_NGRAM,
                          threshold_ppm=_ONION_THRESHOLD_PPM)


_JTOPK_NGRAM = 3
_JTOPK_K = 3
_JTOPK_MOD = 50  # query set: doc_id % 50 == 0


def q_jaccard_topk(sf_dir: str):
    """Top-k most-similar documents per QUERY doc by exact Jaccard over
    distinct 3-word shingles — the "find me documents like these" lookup
    (the lexical twin of ``embed_topk``), not the threshold all-pairs
    mining ``ngram_jaccard_pairs`` does.  Query set = doc_id % 50 == 0.

    Shape (100 TB): the query side is small by construction, so its
    distinct shingle fingerprints broadcast ONCE (``ray.put``) and every
    batch merges against them locally — intersections need no shuffle at
    all; each block emits its local top-k per query (<= k x blocks x
    queries tiny integer rows) and the driver keeps the global k.
    Deterministic tie-break (jacc_ppm desc, cand_id asc); integer ppm so
    the DuckDB mirror is bit-exact; pairs need intersection >= 1 to
    appear, and a query with fewer than 3 words has no shingles and no
    rows (both sides agree)."""
    import pandas as pd
    import ray
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import _ngram_occurrences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def shingles(b: pa.Table) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g1, g2, di, _pos = _ngram_occurrences(
            b["text"].combine_chunks(), _JTOPK_NGRAM)
        return pd.DataFrame({"doc_id": ids[di], "h1": g1.view("int64"),
                             "h2": g2.view("int64")}).drop_duplicates()

    def qfilter(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % _JTOPK_MOD == 0))

    # query-side shingle sets: tiny by construction -> broadcast
    qsh = (ds.map_batches(qfilter, batch_format="pyarrow",
                          zero_copy_batch=True)
           .map_batches(shingles, batch_format="pyarrow")
           .to_pandas())
    qsizes = qsh.groupby("doc_id").size().astype("int64")
    q_ref = ray.put((qsh.rename(columns={"doc_id": "qid"}), qsizes))

    def block_topk(b: pa.Table) -> pd.DataFrame:
        qdf, qsz = ray.get(q_ref)
        sh = shingles(b)
        sh = sh[~sh["doc_id"].isin(set(qsz.index))]  # candidates only
        if sh.empty or qdf.empty:
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "cand_id": pd.Series(dtype="int64"),
                                 "jacc_ppm": pd.Series(dtype="int64")})
        csz = sh.groupby("doc_id").size().astype("int64")
        m = sh.merge(qdf, on=["h1", "h2"])
        inter = (m.groupby(["qid", "doc_id"], as_index=False)
                 .size().rename(columns={"size": "i", "doc_id": "cand_id"}))
        union = (qsz.loc[inter["qid"]].to_numpy()
                 + csz.loc[inter["cand_id"]].to_numpy()
                 - inter["i"].to_numpy())
        inter["jacc_ppm"] = (inter["i"].to_numpy() * 1_000_000
                             // union).astype("int64")
        inter = inter.sort_values(["qid", "jacc_ppm", "cand_id"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
        top = inter.groupby("qid").head(_JTOPK_K)
        return top[["qid", "cand_id", "jacc_ppm"]].astype("int64")

    parts = ds.map_batches(block_topk, batch_format="pyarrow",
                           batch_size=4096).to_pandas()
    if parts.empty:
        return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             "cand_id": pd.Series(dtype="int64"),
                             "jacc_ppm": pd.Series(dtype="int64")})
    parts = parts.sort_values(["qid", "jacc_ppm", "cand_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
    out = parts.groupby("qid").head(_JTOPK_K).reset_index(drop=True)
    out["rank"] = out.groupby("qid").cumcount().astype("int64") + 1
    return out[["qid", "rank", "cand_id", "jacc_ppm"]]


_SQL_JACCARD_TOPK = f"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split(COALESCE(text, ''), ' ')) AS word,
         unnest(range(1, len(string_split(COALESCE(text, ''), ' ')) + 1)) AS ord
  FROM documents
), g AS (
  SELECT doc_id, string_agg(word, ' ') OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND {_JTOPK_NGRAM - 1} FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND {_JTOPK_NGRAM - 1} FOLLOWING) AS glen
  FROM w
), gg AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE glen = {_JTOPK_NGRAM}
), sz AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM gg GROUP BY doc_id
), q AS (
  SELECT doc_id AS qid, gram FROM gg WHERE doc_id % {_JTOPK_MOD} = 0
), i AS (
  SELECT q.qid, gg.doc_id AS cand_id, CAST(count(*) AS BIGINT) AS i
  FROM q JOIN gg USING (gram)
  WHERE gg.doc_id % {_JTOPK_MOD} <> 0
  GROUP BY q.qid, gg.doc_id
), j AS (
  SELECT i.qid, i.cand_id,
         i.i * 1000000 // (sq.n + sc.n - i.i) AS jacc_ppm,
         row_number() OVER (PARTITION BY i.qid
           ORDER BY i.i * 1000000 // (sq.n + sc.n - i.i) DESC,
                    i.cand_id ASC) AS rank
  FROM i JOIN sz sq ON sq.doc_id = i.qid JOIN sz sc ON sc.doc_id = i.cand_id
)
SELECT qid, CAST(rank AS BIGINT) AS rank, cand_id,
       CAST(jacc_ppm AS BIGINT) AS jacc_ppm
FROM j WHERE rank <= {_JTOPK_K}
"""


_SQL_ONION_FILTER = f"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split(COALESCE(text, ''), ' ')) AS word,
         unnest(range(1, len(string_split(COALESCE(text, ''), ' ')) + 1)) AS ord
  FROM documents
), g AS (
  SELECT doc_id, ord AS i,
         string_agg(word, ' ') OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND {_ONION_NGRAM - 1} FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND {_ONION_NGRAM - 1} FOLLOWING) AS glen
  FROM w
), gg AS (
  SELECT doc_id, gram FROM g WHERE glen = {_ONION_NGRAM}
), t AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos FROM gg GROUP BY doc_id
), s AS (
  SELECT gram FROM gg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), c AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS shared
  FROM gg JOIN s USING (gram) GROUP BY doc_id
)
SELECT t.doc_id, t.n_pos,
       CAST(COALESCE(c.shared, 0) AS BIGINT) AS shared_pos,
       CAST(COALESCE(c.shared, 0) * 1000000 // t.n_pos AS BIGINT)
         AS onion_ppm,
       CAST(COALESCE(c.shared, 0) * 1000000 // t.n_pos
            <= {_ONION_THRESHOLD_PPM} AS BOOLEAN) AS keep
FROM t LEFT JOIN c USING (doc_id)
"""


def q_dataset_card(sf_dir: str):
    """The dataset-card rollup — the summary table a corpus release
    ships: one SCAN of ``documents`` feeds every section (total /
    per-lang / per-source / lang x source) via tagged per-batch partials
    (a handful of rows each), then one tiny (section, key) exchange sums
    them.  Metrics are additive on purpose (docs, whitespace tokens,
    chars, empty docs) so partials combine exactly.  Contrast with
    running four group-bys: the corpus is read ONCE — at 100 TB the scan
    is the cost, not the aggregation."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        b = pd.DataFrame({
            "lang": b["lang"], "source": b["source"],
            "tok": (t.str.count(" ") + 1).astype("int64"),
            "chars": b["n_chars"].astype("int64"),
            "empty": (t == "").astype("int64"),
        })

        def agg(g, section, key):
            out = g.agg(n_docs=("tok", "size"), n_tokens=("tok", "sum"),
                        n_chars=("chars", "sum"), n_empty=("empty", "sum"))
            out = out.reset_index(drop=section == "total")
            out.insert(0, "section", section)
            out.insert(1, "key", key(out) if callable(key) else key)
            return out[["section", "key", "n_docs", "n_tokens",
                        "n_chars", "n_empty"]]

        rows = pd.concat([
            agg(b.assign(_k=0).groupby("_k"), "total", "all"),
            agg(b.groupby("lang"), "lang", lambda o: o["lang"]),
            agg(b.groupby("source"), "source", lambda o: o["source"]),
            agg(b.groupby(["lang", "source"]), "lang_source",
                lambda o: o["lang"] + "/" + o["source"]),
        ], ignore_index=True)
        return rows.astype({"n_docs": "int64", "n_tokens": "int64",
                            "n_chars": "int64", "n_empty": "int64"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["section", "key"], as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
            n_chars=("n_chars", "sum"), n_empty=("n_empty", "sum"))
        return out.astype({"n_docs": "int64", "n_tokens": "int64",
                           "n_chars": "int64", "n_empty": "int64"})

    return (hash_bucket(parts, "key", 8)
            .groupby("_part")
            .map_groups(lambda g: final(g.drop(columns=["_part"])),
                        batch_format="pandas"))


_SQL_DATASET_CARD = """
WITH d AS (
  SELECT lang, source,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS tok,
         CAST(n_chars AS BIGINT) AS chars,
         CAST(COALESCE(text, '') = '' AS BIGINT) AS empty
  FROM documents
)
SELECT 'total' AS section, 'all' AS key, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(sum(chars) AS BIGINT) AS n_chars,
       CAST(sum(empty) AS BIGINT) AS n_empty
FROM d
UNION ALL
SELECT 'lang', lang, CAST(count(*) AS BIGINT), CAST(sum(tok) AS BIGINT),
       CAST(sum(chars) AS BIGINT), CAST(sum(empty) AS BIGINT)
FROM d GROUP BY lang
UNION ALL
SELECT 'source', source, CAST(count(*) AS BIGINT), CAST(sum(tok) AS BIGINT),
       CAST(sum(chars) AS BIGINT), CAST(sum(empty) AS BIGINT)
FROM d GROUP BY source
UNION ALL
SELECT 'lang_source', lang || '/' || source, CAST(count(*) AS BIGINT),
       CAST(sum(tok) AS BIGINT), CAST(sum(chars) AS BIGINT),
       CAST(sum(empty) AS BIGINT)
FROM d GROUP BY lang, source
"""


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition metrics per document
    (stages/sentdedup.py:repetition_stats)."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import repetition_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_stats(ds)


_SQL_REPETITION_STATS = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
), wc AS (
  SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word
), ws AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(n) AS BIGINT) AS top_word_n
  FROM wc GROUP BY doc_id
), bc AS (
  SELECT doc_id, CAST(max(n) AS BIGINT) AS top_bigram_n FROM (
    SELECT a.doc_id, a.word || ' ' || b.word AS bg, count(*) AS n
    FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
    GROUP BY a.doc_id, bg
  ) GROUP BY doc_id
)
SELECT ws.doc_id, ws.n_words, ws.n_distinct, ws.top_word_n,
       COALESCE(bc.top_bigram_n, 0) AS top_bigram_n
FROM ws LEFT JOIN bc ON ws.doc_id = bc.doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages/sentdedup.py:decontaminate):
    docs with doc_id % 20 == 0 play the held-out benchmark; every other
    doc is flagged when it shares any 8-word n-gram with them."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import decontaminate

    def side(keep_bench: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy() % 20 == 0  # pyarrow has no mod kernel
            return b.filter(pa.array(m if keep_bench else ~m))
        return f

    read = lambda: rd.read_parquet(  # noqa: E731 - two independent scans
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = read().map_batches(side(True), batch_format="pyarrow",
                               zero_copy_batch=True)
    train = read().map_batches(side(False), batch_format="pyarrow",
                               zero_copy_batch=True)
    return decontaminate(train, bench, ngram=8)


_SQL_DECONTAMINATE = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
), g AS (
  SELECT doc_id,
         string_agg(word, ' ') OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS glen
  FROM w
), gg AS (
  SELECT doc_id, gram FROM g WHERE glen = 8
), bench AS (
  SELECT DISTINCT gram FROM gg WHERE doc_id % 20 = 0
), hits AS (
  SELECT t.doc_id, count(*) AS n_hits
  FROM gg t JOIN bench b USING (gram)
  WHERE t.doc_id % 20 <> 0
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 20 <> 0
"""


def q_decontaminate_norm(sf_dir: str):
    """Normalized-key decontamination: the same benchmark scan but over
    the CCNet-normalized text (functions/textnorm.py) on BOTH sides, so
    case/punctuation variants of a benchmark passage still match —
    PaLM-style normalization before n-gram contamination checks."""
    import ray.data as rd

    from deduplicator_ray.functions.textnorm import normalize_text_arrow
    from deduplicator_ray.stages.sentdedup import decontaminate

    def side(keep_bench: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy() % 20 == 0
            t = b.filter(pa.array(m if keep_bench else ~m))
            return pa.table({
                "doc_id": t["doc_id"],
                "text": normalize_text_arrow(pc.fill_null(t["text"], "")),
            })
        return f

    read = lambda: rd.read_parquet(  # noqa: E731 - two independent scans
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = read().map_batches(side(True), batch_format="pyarrow",
                               zero_copy_batch=True)
    train = read().map_batches(side(False), batch_format="pyarrow",
                               zero_copy_batch=True)
    return decontaminate(train, bench, ngram=8)


def _sql_decontaminate_norm() -> str:
    from deduplicator_ray.functions.textnorm import textnorm_sql_expr

    expr = textnorm_sql_expr("text")
    return _SQL_DECONTAMINATE.replace(
        "string_split(text, ' ')", f"string_split({expr}, ' ')")


def q_incremental_neardup(sf_dir: str):
    """Snapshot-over-snapshot dedup (pipelines/neardup.py:
    incremental_neardup, verify="exact"): docs with doc_id % 5 == 0 play
    the existing corpus, the rest the new crawl; one row per new doc
    near-duplicating an old doc at exact 5-gram Jaccard >= 4/5, with its
    best match (highest true Jaccard, smallest old key on ties) and the
    integer intersection/union gram counts.  Candidate pairs come from
    the MinHash-LSH bands (the scale path); verification is exact, so
    the DuckDB oracle recomputes the whole output all-pairs — this row
    GRADUATED from a pinned golden in round 5.  The estimator-verified
    variant (est_jaccard / n_agree output) stays pytest-covered in
    tests/test_neardup.py."""
    import ray.data as rd

    from deduplicator_ray.config import MinHashConfig
    from deduplicator_ray.pipelines.neardup import incremental_neardup

    def side(keep_old: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy() % 5 == 0
            t = b.filter(pa.array(m if keep_old else ~m))
            return pa.table({"doc_key": t["doc_id"], "text": t["text"]})
        return f

    read = lambda: rd.read_parquet(  # noqa: E731 - two independent scans
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    old = read().map_batches(side(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    new = read().map_batches(side(False), batch_format="pyarrow",
                             zero_copy_batch=True)
    return incremental_neardup(
        new, old, MinHashConfig(), verify="exact",
        exact_ngram=_NEARDUP_NGRAM, exact_num=_NEARDUP_NUM,
        exact_den=_NEARDUP_DEN)


_SQL_INCREMENTAL_NEARDUP = f"""
WITH {_NEARDUP_GRAMS_CTES},
xp AS (
  SELECT n.doc_id AS doc_key, o.doc_id AS dup_of,
         len(list_intersect(n.g, o.g)) AS n_inter,
         len(n.g) + len(o.g) - len(list_intersect(n.g, o.g)) AS n_union
  FROM grams n JOIN grams o
    ON n.doc_id % 5 <> 0 AND o.doc_id % 5 = 0
  WHERE len(list_intersect(n.g, o.g)) > 0
    AND {_NEARDUP_DEN} * len(list_intersect(n.g, o.g))
        >= {_NEARDUP_NUM} * (len(n.g) + len(o.g) - len(list_intersect(n.g, o.g)))
),
best AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_key
      ORDER BY n_inter::DOUBLE / n_union DESC, dup_of) AS rn
  FROM xp
)
SELECT doc_key, dup_of, n_inter::BIGINT AS n_inter, n_union::BIGINT AS n_union
FROM best WHERE rn = 1 ORDER BY doc_key
"""


_SPAN_NGRAM = 8


def q_span_dedup(sf_dir: str):
    """ExactSubstr-style duplicated-span removal over ``documents``
    (stages/sentdedup.py:span_dedup): every word covered by a
    non-globally-first occurrence of an 8-word window is removed."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import span_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return span_dedup(ds, ngram=_SPAN_NGRAM, num_buckets=32)


# Exact SQL recomputation of span_dedup: overlapping windows via the
# window-frame string_agg idiom (glen filter keeps only full windows),
# keep-first per gram string by (doc_id, position), covered words via the
# interval join, rebuild via ordered string_agg of uncovered words.
_SQL_SPAN_DEDUP = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS word,
         unnest(range(1, len(string_split(COALESCE(text, ''), ' ')) + 1)) AS ord
  FROM documents
), g AS (
  SELECT doc_id, ord,
         string_agg(word, ' ') OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND {_SPAN_NGRAM - 1} FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND {_SPAN_NGRAM - 1} FOLLOWING) AS glen
  FROM w
), occ AS (
  SELECT doc_id, ord,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, ord) AS rn
  FROM g WHERE glen = {_SPAN_NGRAM}
), cov AS (
  SELECT DISTINCT w.doc_id, w.ord
  FROM w JOIN occ m ON w.doc_id = m.doc_id
       AND w.ord BETWEEN m.ord AND m.ord + {_SPAN_NGRAM - 1}
  WHERE m.rn > 1
)
SELECT w.doc_id,
       COALESCE(string_agg(CASE WHEN c.ord IS NULL THEN w.word END,
                           ' ' ORDER BY w.ord), '') AS text_dedup,
       CAST(count(c.ord) AS BIGINT) AS removed_words
FROM w LEFT JOIN cov c ON w.doc_id = c.doc_id AND w.ord = c.ord
GROUP BY w.doc_id
"""

_HH_MIN_PPM = 1000


def q_heavy_hitters(sf_dir: str):
    """Exact corpus heavy words (count >= 0.1% of all words) via the
    two-pass Misra-Gries candidates + exact-verify shape
    (stages/freq.py:heavy_hitters) — no full-vocabulary shuffle."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return heavy_hitters(ds, min_ppm=_HH_MIN_PPM, num_buckets=16)


_SQL_HEAVY_HITTERS = f"""
WITH w AS (
  SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS word FROM documents
), tot AS (SELECT count(*) AS nt FROM w)
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM w, tot GROUP BY word, nt
HAVING count(*) * 1000000 >= nt * {_HH_MIN_PPM}
"""


def q_unigram_logloss(sf_dir: str):
    """CCNet-style LM quality score (stages/textstats.py:
    unigram_logloss): per-doc mean NLL under an add-one-smoothed unigram
    model; vocabulary = the corpus's exact heavy hitters at
    {_HH_MIN_PPM} ppm (sketch-bounded two-pass, broadcast once)."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import unigram_logloss

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return unigram_logloss(ds, min_ppm=_HH_MIN_PPM, num_buckets=16)


_SQL_UNIGRAM_LOGLOSS = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), tot AS (SELECT count(*) AS nt FROM ex),
cnt AS (SELECT w, count(*) AS c FROM ex GROUP BY w),
voc AS (
  SELECT w, c FROM cnt, tot WHERE c * 1000000 >= nt * {_HH_MIN_PPM}
),
s AS (SELECT (SELECT nt FROM tot) AS n, (SELECT count(*) FROM voc) AS v)
SELECT e.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       -avg(ln((COALESCE(voc.c, 0) + 1.0) / (s.n + s.v + 1))) AS logloss
FROM ex e LEFT JOIN voc ON e.w = voc.w, s
GROUP BY e.doc_id
"""


_BPE_TOP_K = 30


def q_bpe_merges(sf_dir: str):
    """First-round BPE merge candidates (stages/lexical.py:
    bpe_merge_candidates): corpus-wide adjacent character-pair counts
    within words, top {k} by (n DESC, a, b)."""
    import ray.data as rd

    from deduplicator_ray.stages.lexical import bpe_merge_candidates

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_merge_candidates(ds, top_k=_BPE_TOP_K)


_SQL_BPE_MERGES = f"""
WITH w AS (
  SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS word
  FROM documents
), p AS (
  SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b
  FROM w, unnest(range(1, length(word))) AS t(i)
)
SELECT a, b, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY a, b ORDER BY n DESC, a, b LIMIT {_BPE_TOP_K}
"""


def q_dsir_logratio(sf_dir: str):
    """DSIR importance weights (stages/textstats.py:dsir_logratio):
    docs with doc_id % 20 == 0 play the target domain (the decontaminate
    convention); every other doc scores its mean per-token
    target-vs-raw unigram log-ratio."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import dsir_logratio

    def side(keep_target: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy() % 20 == 0
            return b.filter(pa.array(m if keep_target else ~m))
        return f

    read = lambda: rd.read_parquet(  # noqa: E731 - two independent scans
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    target = read().map_batches(side(True), batch_format="pyarrow",
                                zero_copy_batch=True)
    raw = read().map_batches(side(False), batch_format="pyarrow",
                             zero_copy_batch=True)
    return dsir_logratio(raw, target, min_ppm=_HH_MIN_PPM, num_buckets=16)


_SQL_DSIR_LOGRATIO = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), raw AS (SELECT * FROM ex WHERE doc_id % 20 <> 0),
tgt AS (SELECT * FROM ex WHERE doc_id % 20 = 0),
totr AS (SELECT count(*) AS n FROM raw),
cntr AS (SELECT w, count(*) AS c FROM raw GROUP BY w),
voc AS (
  SELECT w, c FROM cntr, totr WHERE c * 1000000 >= n * {_HH_MIN_PPM}
),
cntt AS (
  SELECT voc.w, count(t.w) AS c FROM voc LEFT JOIN tgt t ON voc.w = t.w
  GROUP BY voc.w
),
s AS (SELECT (SELECT n FROM totr) AS nr,
             (SELECT count(*) FROM tgt) AS nt,
             (SELECT count(*) FROM voc) AS v)
SELECT r.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(floor(avg(ln((COALESCE(tt.c, 0) + 1.0) / (s.nt + s.v + 1))
                      - ln((COALESCE(voc.c, 0) + 1.0) / (s.nr + s.v + 1)))
                  * 1000000 + 0.5) AS BIGINT) AS logratio_micro
FROM raw r LEFT JOIN voc ON r.w = voc.w
           LEFT JOIN cntt tt ON r.w = tt.w, s
GROUP BY r.doc_id
"""


def q_bigram_logloss(sf_dir: str):
    """Bigram LM quality score (stages/textstats.py:bigram_logloss):
    per-doc mean -ln P(w_i | w_i-1) under an add-one-smoothed bigram
    model over the heavy-hitter-mapped token stream (OOV collapses to
    one symbol BEFORE counting, so the state space is (V+1)^2)."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import bigram_logloss

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bigram_logloss(ds, min_ppm=_HH_MIN_PPM, num_buckets=16)


# chr(1) stands in for the OOV symbol — whitespace-split tokens of the
# corpus never contain control bytes
_SQL_BIGRAM_LOGLOSS = f"""
WITH ex AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
),
pos AS (SELECT doc_id, unnest(w) AS tok,
               unnest(range(1, len(w) + 1)) AS ord
        FROM ex),
tot AS (SELECT count(*) AS nt FROM pos),
cnt1 AS (SELECT tok, count(*) AS c FROM pos GROUP BY tok),
voc AS (SELECT tok FROM cnt1, tot WHERE c * 1000000 >= nt * {_HH_MIN_PPM}),
vs AS (SELECT (SELECT count(*) FROM voc) + 1 AS vsz),
mp AS (SELECT p.doc_id, p.ord,
               CASE WHEN voc.tok IS NULL THEN chr(1) ELSE p.tok END AS m
        FROM pos p LEFT JOIN voc ON p.tok = voc.tok),
big AS (SELECT a.doc_id, a.m AS u, b.m AS v
        FROM mp a JOIN mp b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),
bc AS (SELECT u, v, count(*)::BIGINT AS c FROM big GROUP BY u, v),
ctx AS (SELECT u, sum(c)::BIGINT AS cu FROM bc GROUP BY u),
sc AS (SELECT big.doc_id, count(*)::BIGINT AS n_bigrams,
               avg(-ln((bc.c + 1.0) / (ctx.cu + s.vsz))) AS logloss
        FROM big JOIN bc USING (u, v) JOIN ctx USING (u) CROSS JOIN vs s
        GROUP BY big.doc_id)
SELECT d.doc_id, COALESCE(sc.n_bigrams, 0)::BIGINT AS n_bigrams, sc.logloss
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""


def q_length_quantiles(sf_dir: str):
    """Exact per-language length quantiles off a bounded-domain histogram
    (stages/freq.py:length_quantiles) — no sort shuffle, no sampling."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import length_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    return length_quantiles(ds, group_col="lang", value_col="n_chars",
                            qs=(25, 50, 90))


# count(n_chars) (non-null), matching quantile_disc's null handling and
# length_quantiles' notna filter
_SQL_LENGTH_QUANTILES = """
SELECT lang, CAST(count(n_chars) AS BIGINT) AS n,
       CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90
FROM documents GROUP BY lang
"""


_GOPHER_MIN_WORDS = 40      # the synthetic docs run 10-100 words
_GOPHER_MAX_WORDS = 100_000
_GOPHER_EXTRA_STOPS = frozenset({"a"})  # the corpus generator's article


def _gopher_stoplist() -> frozenset:
    from deduplicator_ray.stages.textstats import GOPHER_STOPWORDS

    return GOPHER_STOPWORDS | _GOPHER_EXTRA_STOPS


def q_gopher_filter(sf_dir: str):
    """Gopher-rule composite quality filter (stages/textstats.py:
    gopher_filter): per-doc keep/drop + first failing rule.  Thresholds
    are corpus-appropriate (min_words=40, stoplist extended with the
    generator's article 'a') so the output exercises keeps AND several
    distinct drop reasons; the operator's defaults stay at Gopher's."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import gopher_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return gopher_filter(ds, min_words=_GOPHER_MIN_WORDS,
                         max_words=_GOPHER_MAX_WORDS,
                         stopwords=_gopher_stoplist())


def _sql_gopher_filter() -> str:
    stop_sql = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(_gopher_stoplist())
    )
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS word
  FROM documents
), wc AS (
  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
), per AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(sum(c * len(word)) AS BIGINT) AS nonspace,
         CAST(COALESCE(sum(c) FILTER (WHERE regexp_matches(word, '[A-Za-z]')), 0) AS BIGINT) AS n_alpha,
         CAST(count(*) FILTER (WHERE word IN ({stop_sql})) AS BIGINT) AS n_stop,
         CAST(max(c) AS BIGINT) AS top_word
  FROM wc GROUP BY doc_id
)
SELECT doc_id, fail_reason IS NULL AS keep, fail_reason FROM (
  SELECT doc_id,
         CASE WHEN n_words < {_GOPHER_MIN_WORDS} THEN 'too_few_words'
              WHEN n_words > {_GOPHER_MAX_WORDS} THEN 'too_many_words'
              WHEN nonspace < 3 * n_words OR nonspace > 10 * n_words THEN 'word_length'
              WHEN 5 * n_alpha < 4 * n_words THEN 'non_alpha'
              WHEN n_stop < 2 THEN 'stopwords'
              WHEN 5 * top_word > n_words THEN 'repetition'
         END AS fail_reason
  FROM per
)
"""


def q_quality_ablation_grid(sf_dir: str):
    """Filter-interaction census (stages/textstats.py: gopher_filter
    ``output='flags'``): doc and token counts per combination of the
    five INDEPENDENT Gopher rule bits — the ablation grid a recipe reads
    to see which rules overlap and what each rule removes at the margin
    (first-fail reporting, as in ``gopher_filter``/``quality_by_source``,
    hides the interactions).  Partial-combine inside every block: at
    most 2^5 rows leave any block, and the final reduce is driver-tiny."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import gopher_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    flags = gopher_filter(ds, min_words=_GOPHER_MIN_WORDS,
                          max_words=_GOPHER_MAX_WORDS,
                          stopwords=_gopher_stoplist(), output="flags")
    bits = ["len_ok", "wordlen_ok", "alpha_ok", "stop_ok", "rep_ok"]

    def partial(b: pa.Table):
        import pandas as pd

        df = b.to_pandas()
        out = df.groupby(bits, as_index=False).agg(
            n_docs=("doc_id", "size"), n_tokens=("n_words", "sum"))
        return out

    parts = flags.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    out = parts.groupby(bits, as_index=False).agg(
        n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out


def _sql_quality_ablation_grid() -> str:
    stop_sql = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(_gopher_stoplist())
    )
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS word
  FROM documents
), wc AS (
  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
), per AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(sum(c * len(word)) AS BIGINT) AS nonspace,
         CAST(COALESCE(sum(c) FILTER (WHERE regexp_matches(word, '[A-Za-z]')), 0) AS BIGINT) AS n_alpha,
         CAST(count(*) FILTER (WHERE word IN ({stop_sql})) AS BIGINT) AS n_stop,
         CAST(max(c) AS BIGINT) AS top_word
  FROM wc GROUP BY doc_id
)
SELECT n_words >= {_GOPHER_MIN_WORDS} AND n_words <= {_GOPHER_MAX_WORDS} AS len_ok,
       nonspace >= 3 * n_words AND nonspace <= 10 * n_words AS wordlen_ok,
       5 * n_alpha >= 4 * n_words AS alpha_ok,
       n_stop >= 2 AS stop_ok,
       5 * top_word <= n_words AS rep_ok,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_tokens
FROM per GROUP BY 1, 2, 3, 4, 5
"""


def q_soft_dedup_weights(sf_dir: str):
    """SoftDeDup reweighting (He et al. 2024, arXiv:2407.06654: keep
    duplicated documents but DOWNWEIGHT them by data commonness instead
    of hard removal): per doc, the size of its exact
    normalized-text group (the ``dedup_exact_norm`` key — CCNet-style
    accent/case/punct-folded md5) and the sampling weight
    ``weight_ppm = round(1e6 / group_size)`` — integer-exact as
    ``(2e6 + size) // (2 * size)``.  Every group's total weight is ~1e6,
    so the corpus's effective size is its distinct-content size while no
    document is dropped.  Same hash-bucket shape as dedup_exact_norm:
    only (doc_id, digest, n_tokens) ride the shuffle, never text."""
    import ray.data as rd

    from deduplicator_ray.functions.textnorm import normalize_text_arrow
    from deduplicator_ray.stages.exact import hash_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def dig(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        norm = normalize_text_arrow(text)
        digests = md5_hex_arrow(norm)
        n_tok = pc.list_value_length(
            pc.split_pattern(pc.fill_null(text, ""), " "))
        return pa.table({"doc_id": b["doc_id"],
                         "digest": digests,
                         "n_tokens": pc.cast(n_tok, pa.int64())})

    def weigh(g):
        g = g.drop(columns=["_part"]).copy()
        size = g.groupby("digest")["doc_id"].transform("size").astype("int64")
        g["group_size"] = size
        g["weight_ppm"] = ((2_000_000 + size) // (2 * size)).astype("int64")
        return g[["doc_id", "n_tokens", "group_size", "weight_ppm"]]

    return (hash_bucket(
        ds.map_batches(dig, batch_format="pyarrow", zero_copy_batch=True),
        "digest", 64)
        .groupby("_part").map_groups(weigh, batch_format="pandas"))


def _sql_soft_dedup_weights() -> str:
    from deduplicator_ray.functions.textnorm import textnorm_sql_expr

    expr = textnorm_sql_expr("text")
    return f"""
WITH k AS (
  SELECT doc_id, md5({expr}) AS digest,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(count(*) OVER (PARTITION BY digest) AS BIGINT) AS group_size,
       CAST((2000000 + count(*) OVER (PARTITION BY digest))
            // (2 * count(*) OVER (PARTITION BY digest)) AS BIGINT) AS weight_ppm
FROM k
"""


# (bands, rows_per_band) layouts of a 128-hash MinHash signature
_LSH_LAYOUTS = ((8, 16), (16, 8), (32, 4), (64, 2))


def q_lsh_tuning_curve(sf_dir: str):
    """LSH banding-plan census: for each (bands b, rows r) layout of a
    128-hash MinHash signature, the EXPECTED candidate-generation
    outcome on THIS corpus's exact pair-similarity distribution (the
    prefix-filter Jaccard pipeline at the J >= {_CURVE_NUM}/{_CURVE_DEN}
    census floor): Sum over pairs of the S-curve probability
    p(J) = 1 - (1 - J^r)^b (Leskovec/Rajaraman/Ullman, MMDS ch.3), the
    expected mass MISSED among pairs at/above the 0.8 dedup threshold
    (Sum of 1 - p), and the layout's characteristic threshold
    (1/b)^(1/r) — the table a recipe reads to pick banding before paying
    for a signature pass.  Pair enumeration never leaves the cluster:
    each block collapses to one partial row per layout."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    pairs = ngram_jaccard_pairs(ds, num=_CURVE_NUM, den=_CURVE_DEN,
                                ngram=_NGRAM_N)

    def partial(b: pa.Table) -> pa.Table:
        inter = np.asarray(b["n_inter"], dtype=np.float64)
        union = np.asarray(b["n_union"], dtype=np.float64)
        j = inter / union
        hi = 5.0 * inter >= 4.0 * union  # J >= 0.8, integer-exact
        rows = []
        for bands, r in _LSH_LAYOUTS:
            p = 1.0 - (1.0 - j ** r) ** bands
            rows.append((bands, r, float(p.sum()),
                         float((1.0 - p[hi]).sum()),
                         int(len(j)), int(hi.sum())))
        cols = list(zip(*rows))
        return pa.table({
            "n_bands": pa.array(cols[0], type=pa.int64()),
            "rows_per_band": pa.array(cols[1], type=pa.int64()),
            "sum_p": pa.array(cols[2], type=pa.float64()),
            "sum_miss": pa.array(cols[3], type=pa.float64()),
            "n_pairs": pa.array(cols[4], type=pa.int64()),
            "n_pairs_high": pa.array(cols[5], type=pa.int64()),
        })

    parts = pairs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    base = [(b, r) for b, r in _LSH_LAYOUTS]
    import pandas as pd

    if parts.empty:
        agg = pd.DataFrame({"n_bands": [b for b, _ in base],
                            "rows_per_band": [r for _, r in base],
                            "sum_p": 0.0, "sum_miss": 0.0,
                            "n_pairs": 0, "n_pairs_high": 0})
    else:
        agg = parts.groupby(["n_bands", "rows_per_band"], as_index=False).agg(
            sum_p=("sum_p", "sum"), sum_miss=("sum_miss", "sum"),
            n_pairs=("n_pairs", "sum"), n_pairs_high=("n_pairs_high", "sum"))
    agg["thresh_pm"] = np.floor(
        (1.0 / agg["n_bands"]) ** (1.0 / agg["rows_per_band"]) * 1e6 + 0.5
    ).astype("int64")
    agg["exp_candidates_milli"] = np.floor(
        agg["sum_p"] * 1e3 + 0.5).astype("int64")
    agg["exp_missed_milli"] = np.floor(
        agg["sum_miss"] * 1e3 + 0.5).astype("int64")
    agg["n_pairs"] = agg["n_pairs"].astype("int64")
    agg["n_pairs_high"] = agg["n_pairs_high"].astype("int64")
    return agg[["n_bands", "rows_per_band", "thresh_pm",
                "exp_candidates_milli", "exp_missed_milli",
                "n_pairs", "n_pairs_high"]]


_SQL_LSH_TUNING_CURVE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         CASE WHEN len(w) >= {_NGRAM_N}
              THEN list_distinct(list_transform(range(1, len(w) - {_NGRAM_N - 2}),
                                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [] END AS g
  FROM toks
),
p AS (
  SELECT len(list_intersect(a.g, b.g))::BIGINT AS n_inter,
         (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))::BIGINT AS n_union
  FROM grams a JOIN grams b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.g, b.g)) > 0
    AND {_CURVE_DEN} * len(list_intersect(a.g, b.g))
        >= {_CURVE_NUM} * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
),
lay(b, r) AS (VALUES {", ".join(f"({b}, {r})" for b, r in _LSH_LAYOUTS)}),
pp AS (
  SELECT lay.b, lay.r,
         1 - POWER(1 - POWER(CAST(n_inter AS DOUBLE) / n_union, lay.r), lay.b) AS prob,
         5 * n_inter >= 4 * n_union AS hi
  FROM p CROSS JOIN lay
)
SELECT CAST(b AS BIGINT) AS n_bands, CAST(r AS BIGINT) AS rows_per_band,
       CAST(floor(POWER(1.0 / b, 1.0 / r) * 1000000 + 0.5) AS BIGINT) AS thresh_pm,
       CAST(floor(COALESCE(sum(prob), 0) * 1000 + 0.5) AS BIGINT) AS exp_candidates_milli,
       CAST(floor(COALESCE(sum(1 - prob) FILTER (WHERE hi), 0) * 1000 + 0.5) AS BIGINT) AS exp_missed_milli,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE hi) AS BIGINT) AS n_pairs_high
FROM pp GROUP BY b, r
"""


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail buckets (stages/textstats.py:
    ccnet_buckets): per-language third-mass perplexity buckets over the
    corpus-trained unigram LM, integer milli-nat thresholds."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import ccnet_buckets

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    return ccnet_buckets(ds, min_ppm=_HH_MIN_PPM, num_buckets=16)


_SQL_CCNET_BUCKETS = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
), tot AS (SELECT count(*) AS nt FROM ex),
cnt AS (SELECT w, count(*) AS c FROM ex GROUP BY w),
voc AS (
  SELECT w, c FROM cnt, tot WHERE c * 1000000 >= nt * {_HH_MIN_PPM}
),
s AS (SELECT (SELECT nt FROM tot) AS n, (SELECT count(*) FROM voc) AS v),
ll AS (
  SELECT e.doc_id,
         CAST(floor(-avg(ln((COALESCE(voc.c, 0) + 1.0) / (s.n + s.v + 1)))
                    * 1000 + 0.5) AS BIGINT) AS llm
  FROM ex e LEFT JOIN voc ON e.w = voc.w, s
  GROUP BY e.doc_id
),
ld AS (
  SELECT d.doc_id, d.lang, ll.llm FROM documents d
  JOIN ll ON d.doc_id = ll.doc_id
),
h AS (SELECT lang, llm, count(*) AS c FROM ld GROUP BY 1, 2),
cum AS (
  SELECT lang, llm,
         sum(c) OVER (PARTITION BY lang ORDER BY llm) AS cc,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM h
),
cuts AS (
  SELECT lang,
         min(llm) FILTER (WHERE 3 * cc >= n) AS c1,
         min(llm) FILTER (WHERE 3 * cc >= 2 * n) AS c2
  FROM cum GROUP BY lang
)
SELECT ld.doc_id, ld.lang, ld.llm,
       CASE WHEN ld.llm <= cuts.c1 THEN 'head'
            WHEN ld.llm <= cuts.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ld JOIN cuts ON ld.lang = cuts.lang
"""


# ppm multipliers per CCNet bucket: keep the fluent third at full weight,
# halve the middle, quarter the tail (CCNet itself trains on head+middle)
_POLICY_BUCKET_PPM = {"head": 1_000_000, "middle": 500_000, "tail": 250_000}


def q_curation_policy(sf_dir: str):
    """The composed curation policy — the per-doc sampling weight a
    training-data recipe actually consumes, built from three of the
    engine's signals in one pipeline: the Gopher quality gate
    (``gopher_filter``, hard 0 on drop), SoftDeDup duplicate
    downweighting (``soft_dedup_weights``, 1e6/group over the
    normalized-text exact groups) and CCNet fluency bucketing
    (``ccnet_buckets``; head/middle/tail multipliers 1.0/0.5/0.25 as
    ppm).  ``final_weight_ppm = keep ? soft_ppm *
    bucket_ppm // 1e6 : 0`` — pure integer arithmetic, so the DuckDB
    mirror (the three oracle chains joined on doc_id) is bit-exact.

    Scale shape: each leg is the already-bounded pipeline it reuses;
    the composition is two hash joins on doc_id over NARROW frames
    (ids + small ints + a bucket tag — text never enters the join)."""
    import ray.data as rd

    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.stages.textstats import gopher_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    gate = gopher_filter(ds, min_words=_GOPHER_MIN_WORDS,
                         max_words=_GOPHER_MAX_WORDS,
                         stopwords=_gopher_stoplist()).drop_columns(
                             ["fail_reason"])
    soft = q_soft_dedup_weights(sf_dir)
    buck = q_ccnet_buckets(sf_dir).drop_columns(["lang", "llm"])

    j1 = hash_join(gate, soft, on=("doc_id",), num_partitions=16,
                   out_schema={"doc_id": pa.int64(), "keep": pa.bool_(),
                               "n_tokens": pa.int64(),
                               "group_size": pa.int64(),
                               "weight_ppm": pa.int64()})
    # chained-hash-join barrier (house rule, see cluster_cohesion): keep
    # exactly one join shuffle per executing plan — narrow frame, no text
    j1 = j1.materialize()
    j2 = hash_join(j1, buck, on=("doc_id",), num_partitions=16,
                   out_schema={"doc_id": pa.int64(), "keep": pa.bool_(),
                               "n_tokens": pa.int64(),
                               "group_size": pa.int64(),
                               "weight_ppm": pa.int64(),
                               "bucket": pa.string()})

    mult = _POLICY_BUCKET_PPM

    def fin(b: pa.Table) -> pa.Table:
        keep = np.asarray(b["keep"], dtype=bool)
        w = np.asarray(b["weight_ppm"], dtype=np.int64)
        m = np.array([mult[x] for x in b["bucket"].to_pylist()],
                     dtype=np.int64)
        final = np.where(keep, (w * m) // 1_000_000, 0)
        return pa.table({"doc_id": b["doc_id"], "keep": b["keep"],
                         "bucket": b["bucket"],
                         "group_size": b["group_size"],
                         "n_tokens": b["n_tokens"],
                         "final_weight_ppm": pa.array(final)})

    return j2.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def _sql_curation_policy() -> str:
    mult_case = " ".join(f"WHEN '{k}' THEN {v}"
                         for k, v in _POLICY_BUCKET_PPM.items())
    return f"""
WITH g AS ({_sql_gopher_filter()}),
s AS ({_sql_soft_dedup_weights()}),
c AS ({_SQL_CCNET_BUCKETS})
SELECT g.doc_id, g.keep, c.bucket, s.group_size, s.n_tokens,
       CASE WHEN g.keep
            THEN s.weight_ppm * (CASE c.bucket {mult_case} END) // 1000000
            ELSE 0 END AS final_weight_ppm
FROM g JOIN s ON g.doc_id = s.doc_id JOIN c ON g.doc_id = c.doc_id
"""


_POLICY_SAMPLE_SEED = 77


def q_policy_sample(sf_dir: str):
    """Materialize ``curation_policy`` into the actual training subset:
    keep each doc with probability final_weight_ppm / 1e6 via the same
    bijective Weyl key the global shuffle uses — keep iff
    ``shuffle_key(doc_id, seed) % 1e6 < final_weight_ppm``.  Map-only
    over the policy frame (no extra shuffle), bit-reproducible across
    runs/workers/cluster sizes, and MONOTONE in the weight under a fixed
    seed: raising a doc's weight can only add it to the sample, so
    policy tweaks churn exactly the margin, never the core."""
    from deduplicator_ray.stages.shuffle import shuffle_key

    pol = q_curation_policy(sf_dir)

    def pick(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        draw = (shuffle_key(ids, _POLICY_SAMPLE_SEED)
                % np.uint64(1_000_000)).astype(np.int64)
        keep = draw < np.asarray(b["final_weight_ppm"], dtype=np.int64)
        t = pa.table({"doc_id": b["doc_id"], "bucket": b["bucket"],
                      "final_weight_ppm": b["final_weight_ppm"]})
        return t.filter(pa.array(keep))

    return pol.map_batches(pick, batch_format="pyarrow",
                           zero_copy_batch=True)


def _sql_policy_sample() -> str:
    from deduplicator_ray.stages.shuffle import SHUFFLE_MULT

    return f"""
WITH p AS ({_sql_curation_policy()})
SELECT doc_id, bucket, final_weight_ppm FROM p
WHERE (CAST(doc_id AS HUGEINT) + {_POLICY_SAMPLE_SEED}) * {SHUFFLE_MULT}
      % 18446744073709551616 % 1000000 < final_weight_ppm
"""


_SHUFFLE_SEED = 42


def q_corpus_shuffle(sf_dir: str):
    """Deterministic global training shuffle (stages/shuffle.py:
    deterministic_shuffle): a seeded exact permutation of the corpus via
    order-preserving key-range buckets — distributed rank with no global
    sort shuffle and no per-row Python."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import deterministic_shuffle

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return deterministic_shuffle(ds, seed=_SHUFFLE_SEED, num_buckets=64)


def _sql_corpus_shuffle() -> str:
    from deduplicator_ray.stages.shuffle import SHUFFLE_MULT

    # HUGEINT arithmetic reproduces numpy uint64 wraparound bit-exactly
    return f"""
SELECT doc_id, CAST(row_number() OVER (
  ORDER BY (CAST(doc_id AS HUGEINT) + {_SHUFFLE_SEED}) * {SHUFFLE_MULT}
           % 18446744073709551616
) - 1 AS BIGINT) AS position
FROM documents
"""


_SAMPLE_SEED = 77
_SAMPLE_RATES = {"en": 0.5, "de": 0.25, "zh": 1.0}
_SAMPLE_DEFAULT = 0.125


def q_corpus_sample(sf_dir: str):
    """Deterministic stratified sampling (stages/shuffle.py:
    stratified_sample): per-language Bernoulli rates via the bijective
    Weyl key — map-only, zero shuffle, bit-reproducible."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import stratified_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return stratified_sample(ds, _SAMPLE_RATES, seed=_SAMPLE_SEED,
                             group_col="lang",
                             default_rate=_SAMPLE_DEFAULT)


def _sql_corpus_sample() -> str:
    from deduplicator_ray.stages.shuffle import sample_sql_predicate

    cases = " ".join(
        f"WHEN '{g}' THEN {sample_sql_predicate(r, _SAMPLE_SEED)}"
        for g, r in _SAMPLE_RATES.items()
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE CASE lang {cases}
  ELSE {sample_sql_predicate(_SAMPLE_DEFAULT, _SAMPLE_SEED)} END
"""


_BUDGET_SEED = 21
_BUDGETS = {"en": 6000, "de": 2500, "zh": 1500}
_BUDGET_DEFAULT = 800


def q_token_budget(sf_dir: str):
    """Per-language token-budget selection (stages/shuffle.py:
    token_budget_select): fill each language's token budget with a
    seeded-random prefix of the shuffle order."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import token_budget_select

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return token_budget_select(ds, _BUDGETS, seed=_BUDGET_SEED,
                               default_budget=_BUDGET_DEFAULT,
                               num_buckets=64)


def _sql_token_budget() -> str:
    from deduplicator_ray.stages.shuffle import SHUFFLE_MULT

    cases = " ".join(f"WHEN '{g}' THEN {b}" for g, b in _BUDGETS.items())
    return f"""
SELECT doc_id, lang, n_tokens FROM (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY key
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM (
    SELECT doc_id, lang,
           CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
             AS n_tokens,
           (CAST(doc_id AS HUGEINT) + {_BUDGET_SEED}) * {SHUFFLE_MULT}
             % 18446744073709551616 AS key
    FROM documents
  )
) WHERE cum <= CASE lang {cases} ELSE {_BUDGET_DEFAULT} END
"""


_SPLIT_SEED = 31
_SPLIT_FRACTIONS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment (stages/shuffle.py:
    split_assign): Weyl-key interval per doc — map-only, zero shuffle,
    consistent with stratified_sample at the same seed."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import split_assign

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return split_assign(ds, _SPLIT_FRACTIONS, seed=_SPLIT_SEED)


def _sql_split_assign() -> str:
    from deduplicator_ray.stages.shuffle import split_sql_expr

    return (f"SELECT doc_id, {split_sql_expr(_SPLIT_FRACTIONS, _SPLIT_SEED)}"
            f" AS split FROM documents")


def q_split_leakage(sf_dir: str):
    """Train/val/test leakage audit: assign splits
    (stages/shuffle.split_assign, same fractions/seed as split_assign)
    and count DISTINCT 8-word grams shared across every split pair
    (stages/sentdedup.source_overlap_matrix with group_col='split') —
    the contamination check a release gate runs before shipping a
    split.  A nonzero train/test row is exactly the leakage that
    decontaminate() exists to remove."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import source_overlap_matrix
    from deduplicator_ray.stages.shuffle import split_assign

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    labeled = split_assign(ds, _SPLIT_FRACTIONS, seed=_SPLIT_SEED,
                           keep_cols=("text",))
    out = source_overlap_matrix(labeled, ngram=8, group_col="split")
    return out.rename(columns={"source_a": "split_a", "source_b": "split_b"})


def _sql_split_leakage() -> str:
    from deduplicator_ray.stages.shuffle import split_sql_expr

    expr = split_sql_expr(_SPLIT_FRACTIONS, _SPLIT_SEED)
    return f"""
WITH s AS (
  SELECT {expr} AS split, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT split, array_to_string(w[p:p + 7], ' ') AS gram
  FROM s, unnest(range(1, len(w) - 6)) AS t(p)
),
dg AS (SELECT DISTINCT split, gram FROM g)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM dg a JOIN dg b ON a.gram = b.gram AND a.split < b.split
GROUP BY 1, 2
"""


_ILV_SEED = 123


def q_interleave_sources(sf_dir: str):
    """Anti-clumping training order (stages/shuffle.py:
    interleave_by_group): round-robin across sources — round r holds the
    r-th seeded-random doc of every surviving source; two key-only
    order-preserving-bucket rankings, no global sort shuffle."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import interleave_by_group

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return interleave_by_group(ds, group_col="source", seed=_ILV_SEED,
                               num_buckets=64, round_buckets=64)


def _sql_interleave_sources() -> str:
    from deduplicator_ray.stages.shuffle import SHUFFLE_MULT

    return f"""
SELECT doc_id, source,
       CAST(row_number() OVER (ORDER BY r, key) - 1 AS BIGINT) AS position
FROM (
  SELECT doc_id, source, key,
         row_number() OVER (PARTITION BY source ORDER BY key) - 1 AS r
  FROM (
    SELECT doc_id, source,
           (CAST(doc_id AS HUGEINT) + {_ILV_SEED}) * {SHUFFLE_MULT}
             % 18446744073709551616 AS key
    FROM documents
  )
)
"""


_CAP_SEED = 55
_CAP_N = 7


def q_cap_per_group(sf_dir: str):
    """Per-source document cap (stages/freq.py:cap_per_group): keep at
    most N seeded-random docs per source — the hub-domain damper."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import cap_per_group

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return cap_per_group(ds, group_col="source", max_per_group=_CAP_N,
                         seed=_CAP_SEED, num_buckets=16)


def _sql_cap_per_group() -> str:
    from deduplicator_ray.stages.shuffle import SHUFFLE_MULT

    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source
    ORDER BY (CAST(doc_id AS HUGEINT) + {_CAP_SEED}) * {SHUFFLE_MULT}
             % 18446744073709551616
  ) AS rn
  FROM documents
) WHERE rn <= {_CAP_N}
"""


def q_freq_spectrum(sf_dir: str):
    """Corpus word frequency-of-frequencies spectrum
    (stages/freq.py:freq_spectrum): distinct words per exact occurrence
    count — the Good-Turing / Zipf-tail shape."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import freq_spectrum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return freq_spectrum(ds, num_buckets=16)


_SQL_FREQ_SPECTRUM = """
WITH ex AS (
  SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS w FROM documents
),
wc AS (SELECT w, count(*)::BIGINT AS n_occurrences FROM ex GROUP BY w)
SELECT n_occurrences, count(*)::BIGINT AS n_words FROM wc GROUP BY 1
"""


_KMV_K = 64


def q_vocab_overlap_kmv(sf_dir: str):
    """Sketch-side vocabulary overlap between the src0 and src1 corpora
    (stages/freq.py:kmv_overlap, Beyer et al. 2007): distinct-word
    union/intersection ESTIMATES from two k-minimum-values sketches —
    no vocabulary ever shuffles or joins (the 100 TB path where the
    exact source_overlap matrix would).  Deterministic integer
    estimator (same siphash word identity as the exact operators), so
    the output is golden-pinnable."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import kmv_overlap

    def src(name):
        return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["source", "text"])
                .filter(expr=f"source == '{name}'"))

    # word BIGRAMS: high enough cardinality (~900 on the shared
    # word-salad vocabulary) that the sketches fill and the estimator
    # actually estimates, with genuine partial overlap between sources
    est = kmv_overlap(src("src0"), src("src1"), k=_KMV_K, ngram=2)
    return pa.table({c: pa.array([v], type=pa.int64())
                     for c, v in est.items()})


_KMV_MD5_K = 64


def q_kmv_md5_overlap(sf_dir: str):
    """KMV vocabulary-overlap estimates with the WHOLE estimator
    independently recomputed in SQL: the ``hash_fn="md5"`` variant of
    the KMV sketch (stages/freq.kmv_sketch — same local-k partial /
    bounded driver merge, row hash swapped to ``md5_number_lower``)
    over the src0/src1 word BIGRAMS at k=64 (the ~900-gram cardinality
    fills the sketches, so the (k-1)*2^64//th estimator branch — not
    the exact-count shortcut — is what the oracle checks).  The oracle
    rebuilds both sketches from raw text (per-doc lead() bigrams,
    distinct md5 hashes, ORDER BY LIMIT k), the
    union sketch, and the exact integer estimators —
    ``(k-1) * 2^64 // (kth_min + 1)`` via HUGEINT division and the
    multiset intersection rule — so sketch construction AND estimation
    are value-checked with no pinned output (the production siphash
    twin is `vocab_overlap_kmv`)."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import kmv_overlap

    def src(name):
        return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["source", "text"])
                .filter(expr=f"source == '{name}'"))

    est = kmv_overlap(src("src0"), src("src1"), k=_KMV_MD5_K, ngram=2,
                      hash_fn="md5")
    return pa.table({c: pa.array([v], type=pa.int64())
                     for c, v in est.items()})


def _kmv_md5_sql() -> str:
    k = _KMV_MD5_K
    two64 = "CAST('18446744073709551616' AS UHUGEINT)"

    def sketch(src: str, name: str) -> str:
        # per-doc word BIGRAMS: lead() within the doc partition mirrors
        # the stage's row_of window guard (grams never cross documents)
        return (
            f"{name}_tok AS (SELECT DISTINCT md5_number_lower(g) AS h "
            f"FROM (SELECT w || ' ' || lead(w) OVER "
            f"(PARTITION BY doc_id ORDER BY pos) AS g "
            f"FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w, "
            f"unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos "
            f"FROM documents WHERE source = '{src}')) "
            f"WHERE g IS NOT NULL), "
            f"{name}_sk AS (SELECT h FROM {name}_tok ORDER BY h LIMIT {k})"
        )

    def est(name: str) -> str:
        # exact count when the sketch isn't full, else the unbiased
        # (k-1) * 2^64 // (kth_min + 1) — HUGEINT division = python //
        return (
            f"(SELECT CASE WHEN COUNT(*) < {k} THEN COUNT(*) "
            f"ELSE CAST((CAST({k - 1} AS UHUGEINT) * {two64}) "
            f"// (CAST(MAX(h) AS UHUGEINT) + 1) AS BIGINT) END "
            f"FROM {name}_sk)"
        )

    return f"""
WITH {sketch('src0', 'a')}, {sketch('src1', 'b')},
u_sk AS (
  SELECT h FROM (SELECT h FROM a_sk UNION SELECT h FROM b_sk)
  ORDER BY h LIMIT {k}
),
nboth AS (
  SELECT COUNT(*) AS n FROM u_sk
  WHERE h IN (SELECT h FROM a_sk) AND h IN (SELECT h FROM b_sk)
),
uk AS (SELECT COUNT(*) AS kk FROM u_sk)
SELECT CAST({k} AS BIGINT) AS k,
       CAST({est('a')} AS BIGINT) AS est_distinct_a,
       CAST({est('b')} AS BIGINT) AS est_distinct_b,
       CAST({est('u')} AS BIGINT) AS est_union,
       CAST(CAST((SELECT n FROM nboth) AS HUGEINT) * {est('u')}
            // GREATEST((SELECT kk FROM uk), 1) AS BIGINT)
           AS est_intersection
"""


_OOV_K = 16


def q_oov_rate(sf_dir: str):
    """Per-source out-of-vocabulary rate against the corpus's exact
    top-{k} words (stages/freq.py:oov_rate) — the tokenizer-coverage
    diagnostic; vocabulary election is exact (count desc, word asc) and
    broadcast, never shuffle-joined."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import oov_rate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    return oov_rate(ds, vocab_k=_OOV_K, num_buckets=16)


_SQL_OOV_RATE = f"""
WITH ex AS (
  SELECT source, unnest(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
),
wc AS (SELECT w, count(*)::BIGINT AS n FROM ex GROUP BY w),
vocab AS (SELECT w FROM wc ORDER BY n DESC, w LIMIT {_OOV_K})
SELECT source,
       count(*)::BIGINT AS n_tokens,
       (count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab)))::BIGINT
         AS n_oov,
       ((count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab)) * 1000000)
        // count(*))::BIGINT AS oov_ppm
FROM ex GROUP BY source
"""


def q_vocabulary_stats(sf_dir: str):
    """Per-source vocabulary stats (stages/freq.py:vocabulary_stats):
    exact distinct-word count, token count, integer TTR ppm — distinct
    counted via one word-hash shuffle of 8-byte marker rows."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import vocabulary_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    return vocabulary_stats(ds, group_col="source", num_buckets=16)


_SQL_VOCABULARY_STATS = """
WITH ex AS (
  SELECT source, unnest(string_split(COALESCE(text, ''), ' ')) AS w
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
       CAST(count(DISTINCT w) * 1000000 // count(*) AS BIGINT) AS ttr_ppm
FROM ex GROUP BY source
"""


_IDX_MAX_POSTINGS = 390


def q_inverted_index(sf_dir: str):
    """Term -> posting-list index (stages/freq.py:inverted_index):
    exact df per term, comma-joined ascending postings, hub terms past
    {_IDX_MAX_POSTINGS} docs get NULL postings (skew guard, df stays
    exact)."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import inverted_index

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return inverted_index(ds, num_buckets=32,
                          max_postings=_IDX_MAX_POSTINGS)


_SQL_INVERTED_INDEX = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
  FROM documents
), d AS (SELECT DISTINCT doc_id, term FROM ex)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CASE WHEN count(*) <= {_IDX_MAX_POSTINGS}
            THEN string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
       END AS postings
FROM d GROUP BY term
"""


_TERMS_K = 4


def q_distinctive_terms(sf_dir: str):
    """Per-doc keyword extraction (stages/freq.py:distinctive_terms):
    integer-exact tf-idf-style rank (tf DESC, df ASC, term ASC), top k
    per doc — candidate-pruned tf shuffle + exact partial-df rows."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import distinctive_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return distinctive_terms(ds, k=_TERMS_K, num_buckets=32)


_SQL_DISTINCTIVE_TERMS = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT doc_id, term, tf, df, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
  FROM tf JOIN df USING (term)
) WHERE rank <= {_TERMS_K}
"""


_PACK_SEED = 99
_PACK_LEN = 256


def q_pack_sequences(sf_dir: str):
    """Fixed-capacity sequence packing (stages/shuffle.py:pack_sequences):
    concat-then-chunk over the deterministic-shuffle order — global token
    cumsum with NO global sort shuffle."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import pack_sequences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=_PACK_LEN, seed=_PACK_SEED,
                          num_buckets=64)


def _sql_pack_sequences() -> str:
    from deduplicator_ray.stages.shuffle import SHUFFLE_MULT

    return f"""
SELECT doc_id, n_tokens,
       CAST(cum // {_PACK_LEN} AS BIGINT) AS seq_id,
       CAST(cum % {_PACK_LEN} AS BIGINT) AS seq_offset
FROM (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY key
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM (
    SELECT doc_id,
           CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
             AS n_tokens,
           (CAST(doc_id AS HUGEINT) + {_PACK_SEED}) * {SHUFFLE_MULT}
             % 18446744073709551616 AS key
    FROM documents
  )
)
"""


_SPLIT_W = 32
_SPLIT_S = 24  # overlapping windows (stride < width), the packing case


def q_split_documents(sf_dir: str):
    """Context-window packing (stages/sentdedup.py:split_documents):
    32-word samples every 24 words, final window reaching the last word."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import split_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return split_documents(ds, words_per_chunk=_SPLIT_W, stride=_SPLIT_S)


# window starts p (0-based): p % stride == 0 AND (p == 0 OR p < n-w+stride)
# — i.e. stop once a window reaches the last word (docstring rule)
_SQL_SPLIT_DOCUMENTS = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS word,
         unnest(range(1, len(string_split(COALESCE(text, ''), ' ')) + 1)) AS ord,
         len(string_split(COALESCE(text, ''), ' ')) AS nw
  FROM documents
), starts AS (
  SELECT doc_id, ord - 1 AS p, nw FROM w
  WHERE (ord - 1) % {_SPLIT_S} = 0
    AND (ord = 1 OR ord - 1 < nw - {_SPLIT_W} + {_SPLIT_S})
)
SELECT s.doc_id,
       CAST(s.p / {_SPLIT_S} AS BIGINT) AS chunk_ord,
       string_agg(w.word, ' ' ORDER BY w.ord) AS chunk,
       CAST(count(*) AS BIGINT) AS n_words
FROM starts s JOIN w ON w.doc_id = s.doc_id
     AND w.ord BETWEEN s.p + 1 AND s.p + {_SPLIT_W}
GROUP BY s.doc_id, s.p
"""


def q_corpus_overlap(sf_dir: str):
    """Corpus-overlap aggregate (stages/sentdedup.py:corpus_overlap):
    even-doc_id docs play snapshot A, odd docs snapshot B; distinct
    8-word grams per side + intersection size."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import corpus_overlap

    def side(keep_even: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy() % 2 == 0
            return b.filter(pa.array(m if keep_even else ~m))
        return f

    read = lambda: rd.read_parquet(  # noqa: E731 - two independent scans
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    a = read().map_batches(side(True), batch_format="pyarrow",
                           zero_copy_batch=True)
    b = read().map_batches(side(False), batch_format="pyarrow",
                           zero_copy_batch=True)
    return corpus_overlap(a, b, ngram=8)


_SQL_CORPUS_OVERLAP = """
WITH w AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS word,
         unnest(range(1, len(string_split(COALESCE(text, ''), ' ')) + 1)) AS ord
  FROM documents
), g AS (
  SELECT doc_id,
         string_agg(word, ' ') OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS gram,
         count(*) OVER (PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS glen
  FROM w
), a AS (SELECT DISTINCT gram FROM g WHERE glen = 8 AND doc_id % 2 = 0),
   b AS (SELECT DISTINCT gram FROM g WHERE glen = 8 AND doc_id % 2 = 1)
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_grams_a,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS n_grams_b,
       CAST((SELECT count(*) FROM a JOIN b USING (gram)) AS BIGINT) AS n_common
"""


def q_redact_pii(sf_dir: str):
    """PII redaction (stages/textstats.py:redact_pii).  The synthetic
    corpus carries no PII, so every doc_id % 3 == 0 row is augmented with
    a deterministic e-mail + IPv4 literal — the SAME expression on both
    sides — before redaction, proving the scrub on real matches while the
    other rows prove the no-op path."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import redact_pii

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def augment(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        suffix = pc.binary_join_element_wise(
            " contact user", pc.cast(b["doc_id"], pa.string()),
            "@example.com from 10.0.0.",
            pa.array((ids % 250).astype(str), type=pa.string()), "",
        )
        base = pc.fill_null(b["text"], "")
        aug = pc.binary_join_element_wise(base, suffix, "")
        t = pc.if_else(pa.array(ids % 3 == 0), aug, base)
        return pa.table({"doc_id": b["doc_id"], "text": t})

    out = redact_pii(
        ds.map_batches(augment, batch_format="pyarrow", zero_copy_batch=True)
    )
    return out.select_columns(["doc_id", "text_redacted", "n_emails", "n_ips"])


def _sql_redact_pii() -> str:
    from deduplicator_ray.stages.textstats import PII_EMAIL_PAT, PII_IP_PAT

    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN COALESCE(text, '') || ' contact user' || doc_id ||
                   '@example.com from 10.0.0.' || (doc_id % 250)
              ELSE COALESCE(text, '') END AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{PII_EMAIL_PAT}', '<EMAIL>', 'g'),
                      '{PII_IP_PAT}', '<IP>', 'g') AS text_redacted,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL_PAT}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(
            regexp_replace(t, '{PII_EMAIL_PAT}', '<EMAIL>', 'g'),
            '{PII_IP_PAT}')) AS BIGINT) AS n_ips
FROM aug
"""


def q_neardup_keep(sf_dir: str):
    """The cleaned-corpus selection — keep ONE representative per
    near-duplicate cluster (the min doc_id), flag every other member for
    removal; singletons keep.  Clusters are the exact-Jaccard north-star
    definition (q_neardup_clusters).  The duplicate-id set is small by
    construction (only clustered non-representatives), so it broadcasts
    once and the corpus pass is map-only."""
    import ray

    import ray.data as rd

    asg = q_neardup_clusters(sf_dir)  # pandas (doc_key, cluster_id)
    dup_ids = np.sort(
        asg.loc[asg["doc_key"] != asg["cluster_id"], "doc_key"].to_numpy(np.int64)
    )
    dup_ref = ray.put(dup_ids)

    def flag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        dups = ray.get(dup_ref)
        pos = np.searchsorted(dups, ids)
        is_dup = (pos < len(dups)) & (dups[np.minimum(pos, max(len(dups) - 1, 0))] == ids) \
            if len(dups) else np.zeros(len(ids), dtype=bool)
        return pa.table({"doc_id": pa.array(ids), "keep": pa.array(~is_dup)})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def q_neardup_keep_best(sf_dir: str):
    """Quality-aware cleaned-corpus selection: per near-dup cluster keep
    the LONGEST member (n_chars DESC, doc_id ASC tie-break) — the copy a
    curator would keep — instead of an arbitrary representative;
    singletons keep.  Clusters are the exact north-star definition
    (q_neardup_clusters).  Clustered docs are a small set by
    construction: their (doc_id, n_chars) rows broadcast once, election
    happens driver-side, and the corpus pass is map-only."""
    import ray

    import ray.data as rd

    asg = q_neardup_clusters(sf_dir)  # pandas (doc_key, cluster_id)
    clustered = np.sort(asg["doc_key"].to_numpy(np.int64))
    cl_ref = ray.put(clustered)

    def pick(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        cl = ray.get(cl_ref)
        pos = np.searchsorted(cl, ids)
        hit = (pos < len(cl)) & (cl[np.minimum(pos, max(len(cl) - 1, 0))] == ids) \
            if len(cl) else np.zeros(len(ids), dtype=bool)
        return b.filter(pa.array(hit))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    quality = docs.map_batches(pick, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    j = asg.merge(quality, left_on="doc_key", right_on="doc_id")
    j = j.sort_values(["cluster_id", "n_chars", "doc_key"],
                      ascending=[True, False, True], kind="stable")
    best = j.groupby("cluster_id", sort=False).head(1)["doc_key"]
    removals = np.sort(np.setdiff1d(clustered, best.to_numpy(np.int64)))
    rem_ref = ray.put(removals)

    def flag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        rem = ray.get(rem_ref)
        if len(rem):
            pos = np.searchsorted(rem, ids)
            is_dup = (pos < len(rem)) & (rem[np.minimum(pos, len(rem) - 1)] == ids)
        else:
            is_dup = np.zeros(len(ids), dtype=bool)
        return pa.table({"doc_id": pa.array(ids), "keep": pa.array(~is_dup)})

    ids_only = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return ids_only.map_batches(flag, batch_format="pyarrow",
                                zero_copy_batch=True)


_SQL_NEARDUP_KEEP_BEST = _SQL_NEARDUP_CLUSTERS.replace(
    ")\nSELECT node AS doc_key, least(node, min(r)) AS cluster_id\n"
    "FROM reach GROUP BY node ORDER BY doc_key",
    "),\nasg AS (\n"
    "  SELECT node AS doc_key, least(node, min(r)) AS cluster_id\n"
    "  FROM reach GROUP BY node\n"
    "),\nbest AS (\n"
    "  SELECT cluster_id, doc_key AS best_id FROM (\n"
    "    SELECT a.cluster_id, a.doc_key,\n"
    "           row_number() OVER (PARTITION BY a.cluster_id\n"
    "             ORDER BY d.n_chars DESC, a.doc_key ASC) AS rn\n"
    "    FROM asg a JOIN documents d ON d.doc_id = a.doc_key\n"
    "  ) WHERE rn = 1\n"
    ")\n"
    "SELECT d.doc_id, COALESCE(d.doc_id = b.best_id, TRUE) AS keep\n"
    "FROM documents d\n"
    "LEFT JOIN asg a ON d.doc_id = a.doc_key\n"
    "LEFT JOIN best b ON a.cluster_id = b.cluster_id",
)
assert "best AS" in _SQL_NEARDUP_KEEP_BEST  # replace target must keep matching


# keep = not a clustered non-representative, derived from the SAME
# recursive-CTE cluster assignment the north-star oracle uses (the final
# SELECT of _SQL_NEARDUP_CLUSTERS becomes an `asg` CTE here).
_SQL_NEARDUP_KEEP = _SQL_NEARDUP_CLUSTERS.replace(
    ")\nSELECT node AS doc_key, least(node, min(r)) AS cluster_id\n"
    "FROM reach GROUP BY node ORDER BY doc_key",
    "),\nasg AS (\n"
    "  SELECT node AS doc_key, least(node, min(r)) AS cluster_id\n"
    "  FROM reach GROUP BY node\n"
    ")\n"
    "SELECT d.doc_id, COALESCE(a.cluster_id = d.doc_id, TRUE) AS keep\n"
    "FROM documents d LEFT JOIN asg a ON d.doc_id = a.doc_key",
)
assert "asg AS" in _SQL_NEARDUP_KEEP  # the replace target must keep matching


_BM25_TERMS = ["dup", "scan", "join"]
_BM25_K, _BM25_K1, _BM25_B = 15, 1.2, 0.75


def q_bm25_topk(sf_dir: str):
    """Free-text BM25 ranking (stages/lexical.py:bm25_topk) — the Ray
    re-expression of Lucene's default ranked lookup
    (deduplicator-heritrix/.../LuceneIndexSearcher.java scores hits):
    top {_BM25_K} docs for the query {_BM25_TERMS}, Lucene idf variant,
    partial-combined corpus stats + per-block local top-k (no shuffle)."""
    import ray.data as rd

    from deduplicator_ray.stages.lexical import bm25_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bm25_topk(ds, _BM25_TERMS, k=_BM25_K, k1=_BM25_K1, b=_BM25_B)


_SQL_BM25_TOPK = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
q(term) AS (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}),
tf AS (SELECT t.doc_id, t.term, count(*)::BIGINT AS tf
       FROM toks t JOIN q USING (term) GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
score AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))
            ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM score ORDER BY score DESC, doc_id LIMIT {_BM25_K}
"""

_TFIDF_THRESHOLD, _TFIDF_MAX_DF = 0.5, 1000


def q_tfidf_cosine(sf_dir: str):
    """tf-idf cosine near-dup pairs over word {_NGRAM_N}-gram shingles
    (stages/lexical.py:tfidf_cosine_pairs): exact vector-space cosine
    (Lucene ClassicSimilarity shape) with the df <= {_TFIDF_MAX_DF}
    hub-gram guard; gram-partitioned postings shuffle + vectorized
    triangular pair expansion, weights normalized map-side."""
    import ray.data as rd

    from deduplicator_ray.stages.lexical import tfidf_cosine_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return tfidf_cosine_pairs(ds, threshold=_TFIDF_THRESHOLD,
                              ngram=_NGRAM_N, max_df=_TFIDF_MAX_DF)


_SQL_TFIDF_COSINE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_NGRAM_N}
              THEN list_transform(range(1, len(w) - {_NGRAM_N - 2}),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              ELSE [] END AS g
  FROM toks
),
ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
tf AS (SELECT doc_id, gram, count(*)::BIGINT AS tf FROM ex GROUP BY 1, 2),
df AS (SELECT gram, count(*)::BIGINT AS df FROM tf GROUP BY gram),
n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
w AS (SELECT t.doc_id, t.gram, t.tf * ln(nd / df.df) AS w
      FROM tf t JOIN df USING (gram) CROSS JOIN n
      WHERE df.df <= {_TFIDF_MAX_DF}),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w GROUP BY doc_id),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
         FROM w a JOIN w b ON a.gram = b.gram AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT d.doc_a, d.doc_b, d.dot / (na.nn * nb.nn) AS cosine
FROM dots d JOIN nrm na ON d.doc_a = na.doc_id
            JOIN nrm nb ON d.doc_b = nb.doc_id
WHERE d.dot / (na.nn * nb.nn) >= {_TFIDF_THRESHOLD}
"""


_KM_K, _KM_ITERS = 8, 3


def q_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means assignments
    (stages/embed.py:kmeans_assign): k={_KM_K}, {_KM_ITERS} rounds,
    deterministic init (vectors of the k smallest ids), broadcast
    centroids + per-block partial sums — zero shuffles."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import kmeans_assign

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return kmeans_assign(ds, k=_KM_K, iters=_KM_ITERS)


def _kmeans_sql_chain() -> tuple[str, str]:
    """The shared Lloyd-round CTE chain: returns (cte_body, final_cent)
    — the text after WITH, and the name of the final centroid CTE —
    so _sql_kmeans and _sql_semdedup mirror ONE centroid computation."""
    k, iters = _KM_K, _KM_ITERS
    sql = f"""emb AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             FROM embeddings),
ex AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS dim
       FROM emb),
cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS vec
          FROM emb ORDER BY vec_id LIMIT {k})"""
    prev = "cent0"
    for i in range(1, iters + 1):
        sql += f""",
asg{i} AS (SELECT e.vec_id,
                  (SELECT c.cl FROM {prev} c
                   ORDER BY list_distance(e.v, c.vec), c.cl LIMIT 1) AS cl
           FROM emb e),
cagg{i} AS (SELECT a.cl, ex.dim, avg(ex.x) AS m
            FROM asg{i} a JOIN ex ON a.vec_id = ex.vec_id
            GROUP BY a.cl, ex.dim),
cent{i} AS (SELECT p.cl, COALESCE(n.vec, p.vec) AS vec
            FROM {prev} p LEFT JOIN
                 (SELECT cl, list(m ORDER BY dim) AS vec
                  FROM cagg{i} GROUP BY cl) n USING (cl))"""
        prev = f"cent{i}"
    return sql, prev


def _sql_kmeans() -> str:
    """Iterated-CTE mirror of kmeans_assign: the Lloyd rounds written
    out as chained CTEs (assignment via correlated nearest-centroid
    subquery ordered (distance, label), centroid update via the
    parallel-unnest ordinality idiom, empty clusters COALESCE to the
    previous round's centroid)."""
    chain, prev = _kmeans_sql_chain()
    return f"""
WITH {chain}
SELECT e.vec_id,
       (SELECT c.cl FROM {prev} c
        ORDER BY list_distance(e.v, c.vec), c.cl LIMIT 1)::BIGINT AS cluster
FROM emb e"""


def q_kmeans_quality(sf_dir: str):
    """Cluster-quality census for the k-means blocking that SemDeDup /
    D4 rely on: per cluster, size, mean cosine to the own centroid
    (cohesion) and mean margin over the best OTHER centroid
    (separation) — the read that says whether the semantic-dedup blocks
    are real clusters or arbitrary cuts.  Same k/iters/seeding as
    kmeans_clusters, so this oracle pins the same centroid contract;
    float means compare under the driver's 9-dp rounding."""
    import pandas as pd

    import ray.data as rd

    from deduplicator_ray.stages.embed import kmeans_centroids

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cent = kmeans_centroids(ds, k=_KM_K, iters=_KM_ITERS)
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    def partial(b: pa.Table) -> pd.DataFrame:
        m = np.stack(b["embedding"].to_pylist()).astype(np.float64)
        d2 = ((m ** 2).sum(1)[:, None] - 2.0 * (m @ cent.T)
              + (cent ** 2).sum(1)[None, :])
        cl = np.argmin(d2, axis=1)              # ties -> lowest label
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = mn @ cn.T
        own = cos[np.arange(len(m)), cl]
        cos[np.arange(len(m)), cl] = -np.inf
        other = cos.max(axis=1)
        return (pd.DataFrame({"cluster": cl.astype("int64"), "own": own,
                              "margin": own - other})
                .groupby("cluster", as_index=False)
                .agg(n_vecs=("own", "size"), s_own=("own", "sum"),
                     s_margin=("margin", "sum")))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    g = parts.groupby("cluster", as_index=False).sum()
    out = pd.DataFrame({
        "cluster": g["cluster"].astype("int64"),
        "n_vecs": g["n_vecs"].astype("int64"),
        "mean_cos": g["s_own"] / g["n_vecs"],
        "mean_margin": g["s_margin"] / g["n_vecs"],
    })
    return out


def _sql_kmeans_quality() -> str:
    chain, prev = _kmeans_sql_chain()
    return f"""
WITH {chain},
asgf AS (SELECT e.vec_id, e.v,
                (SELECT c.cl FROM {prev} c
                 ORDER BY list_distance(e.v, c.vec), c.cl LIMIT 1)::BIGINT
                AS cluster
         FROM emb e),
sc AS (SELECT a.cluster,
              (SELECT list_cosine_similarity(a.v, c.vec) FROM {prev} c
               WHERE c.cl = a.cluster) AS cos_own,
              (SELECT max(list_cosine_similarity(a.v, c.vec))
               FROM {prev} c WHERE c.cl <> a.cluster) AS cos_other
       FROM asgf a)
SELECT cluster, count(*)::BIGINT AS n_vecs,
       avg(cos_own) AS mean_cos,
       avg(cos_own - cos_other) AS mean_margin
FROM sc GROUP BY cluster
"""


_SEMDEDUP_THRESHOLD = 0.4


def q_semdedup(sf_dir: str):
    """SemDeDup (stages/embed.py:semdedup_keep): k-means-blocked
    semantic dedup — duplicate iff a lower-id vector in the SAME
    cluster has cosine >= {t}. Same k/iters/seeding as kmeans_clusters,
    so the two oracles share one centroid contract."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import semdedup_keep

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return semdedup_keep(ds, k=_KM_K, iters=_KM_ITERS,
                         threshold=_SEMDEDUP_THRESHOLD)


def _sql_semdedup() -> str:
    chain, prev = _kmeans_sql_chain()
    return f"""
WITH {chain},
asgf AS (SELECT e.vec_id, e.v,
                (SELECT c.cl FROM {prev} c
                 ORDER BY list_distance(e.v, c.vec), c.cl LIMIT 1)::BIGINT
                AS cluster
         FROM emb e)
SELECT a.vec_id, a.cluster,
       EXISTS (SELECT 1 FROM asgf b
               WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
                 AND list_cosine_similarity(a.v, b.v) >= {_SEMDEDUP_THRESHOLD})
       AS is_duplicate
FROM asgf a"""


_D4_PRUNE_FRAC = 0.25


def q_d4_keep(sf_dir: str):
    """D4 selection (stages/embed.py:d4_keep): SemDeDup then prune the
    most prototypical 25% of each cluster's survivors — same
    k/iters/threshold as semdedup_keep, same micro scoring as
    prototypicality, so all three oracles pin one centroid contract."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import d4_keep

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return d4_keep(ds, k=_KM_K, iters=_KM_ITERS,
                   threshold=_SEMDEDUP_THRESHOLD,
                   prune_frac=_D4_PRUNE_FRAC)


def _sql_d4_keep() -> str:
    chain, prev = _kmeans_sql_chain()
    return f"""
WITH {chain},
asgf AS (SELECT e.vec_id, e.v,
                (SELECT c.cl FROM {prev} c
                 ORDER BY list_distance(e.v, c.vec), c.cl LIMIT 1)::BIGINT
                AS cluster
         FROM emb e),
sc AS (SELECT a.vec_id, a.cluster,
              EXISTS (SELECT 1 FROM asgf b
                      WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
                        AND list_cosine_similarity(a.v, b.v)
                            >= {_SEMDEDUP_THRESHOLD}) AS is_dup,
              CAST(floor(list_cosine_similarity(a.v, c.vec) * 1000000 + 0.5)
                   AS BIGINT) AS pm
       FROM asgf a JOIN {prev} c ON a.cluster = c.cl),
surv AS (SELECT vec_id, cluster, pm,
                row_number() OVER (PARTITION BY cluster
                                   ORDER BY pm DESC, vec_id) AS r,
                count(*) OVER (PARTITION BY cluster) AS nc
         FROM sc WHERE NOT is_dup)
SELECT vec_id, cluster,
       r > CAST(floor(nc * {_D4_PRUNE_FRAC}) AS BIGINT) AS keep
FROM surv
UNION ALL
SELECT vec_id, cluster, FALSE AS keep FROM sc WHERE is_dup
"""


def q_prototypicality(sf_dir: str):
    """SSL-prototype pruning scores (stages/embed.py:prototypicality):
    per vector, cosine to its k-means centroid as integer micros —
    same k/iters/seeding as kmeans_clusters."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import prototypicality

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return prototypicality(ds, k=_KM_K, iters=_KM_ITERS)


def _sql_prototypicality() -> str:
    chain, prev = _kmeans_sql_chain()
    return f"""
WITH {chain},
asgf AS (SELECT e.vec_id, e.v,
                (SELECT c.cl FROM {prev} c
                 ORDER BY list_distance(e.v, c.vec), c.cl LIMIT 1)::BIGINT
                AS cluster
         FROM emb e)
SELECT a.vec_id, a.cluster,
       CAST(floor(list_cosine_similarity(a.v, c.vec) * 1000000 + 0.5)
            AS BIGINT) AS proto_micro
FROM asgf a JOIN {prev} c ON a.cluster = c.cl
"""



# -------------------------------------------------- saturation curves

_CURVE_STOPS = 10
_SHARD_BUDGET = 4096
_PMI_TOP_K = 30
_PMI_MIN_COUNT = 5


def _doc_max_id(sf_dir: str) -> int:
    """max(doc_id) from parquet row-group statistics — metadata only,
    zero data read (the 100-TB way to learn the id span); falls back to
    a single-column scan when a writer omitted stats."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().names.index("doc_id")
    mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or st.max is None:
            mx = None
            break
        mx = st.max if mx is None else max(mx, st.max)
    if mx is None:  # stats absent: one pruned-column scan
        import pyarrow.compute as _pc

        mx = _pc.max(pq.read_table(path, columns=["doc_id"])["doc_id"]).as_py()
    return int(mx)


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary-saturation curve (stages/freq.py:vocab_growth):
    distinct words in the doc_id-ordered corpus prefix at 10 equal
    id-range stops."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import vocab_growth

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return vocab_growth(ds, max_id=_doc_max_id(sf_dir),
                        num_stops=_CURVE_STOPS)


_SQL_VOCAB_GROWTH = f"""
WITH m AS (SELECT max(doc_id) + 1 AS span FROM documents),
tok AS (SELECT (doc_id * {_CURVE_STOPS}) // m.span AS s,
               unnest(string_split(COALESCE(text, ''), ' ')) AS w
        FROM documents, m),
fs AS (SELECT w, min(s) AS s FROM tok GROUP BY w),
h AS (SELECT s, count(*)::BIGINT AS new_words FROM fs GROUP BY s),
stops AS (SELECT unnest(range({_CURVE_STOPS})) AS stop)
SELECT stop,
       COALESCE(h.new_words, 0)::BIGINT AS new_words,
       CAST(sum(COALESCE(h.new_words, 0)) OVER (ORDER BY stop)
            AS BIGINT) AS cum_words
FROM stops LEFT JOIN h ON stops.stop = h.s
"""


def q_dup_growth(sf_dir: str):
    """Dedup-saturation curve (stages/freq.py:dup_growth): exact-dup rate
    of the doc_id-ordered corpus prefix at 10 equal id-range stops."""
    import ray.data as rd

    from deduplicator_ray.stages.freq import dup_growth

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return dup_growth(ds, max_id=_doc_max_id(sf_dir),
                      num_stops=_CURVE_STOPS)


_SQL_DUP_GROWTH = f"""
WITH m AS (SELECT max(doc_id) + 1 AS span FROM documents),
d AS (SELECT (doc_id * {_CURVE_STOPS}) // m.span AS s,
             doc_id > min(doc_id) OVER (PARTITION BY COALESCE(text, ''))
               AS dup
      FROM documents, m),
h AS (SELECT s, count(*)::BIGINT AS n_docs,
             sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS n_dups
      FROM d GROUP BY s),
stops AS (SELECT unnest(range({_CURVE_STOPS})) AS stop),
c AS (SELECT stop,
             COALESCE(h.n_docs, 0)::BIGINT AS n_docs,
             COALESCE(h.n_dups, 0)::BIGINT AS n_dups,
             CAST(sum(COALESCE(h.n_docs, 0)) OVER (ORDER BY stop)
                  AS BIGINT) AS cum_docs,
             CAST(sum(COALESCE(h.n_dups, 0)) OVER (ORDER BY stop)
                  AS BIGINT) AS cum_dups
      FROM stops LEFT JOIN h ON stops.stop = h.s)
SELECT stop, n_docs, n_dups, cum_docs, cum_dups,
       CAST(CASE WHEN cum_docs = 0 THEN 0
                 ELSE (cum_dups * 1000000) // cum_docs END
            AS BIGINT) AS cum_dup_ppm
FROM c
"""


def q_shard_manifest(sf_dir: str):
    """Token-budgeted output-shard plan (stages/shuffle.py:shard_manifest):
    one manifest row per {_SHARD_BUDGET}-token output shard in doc_id
    order — what a resumable partitioned writer consumes."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import shard_manifest

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return shard_manifest(ds, budget_tokens=_SHARD_BUDGET)


_SQL_SHARD_MANIFEST = f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(COALESCE(text, ''), ' '))::BIGINT AS nt
  FROM documents
),
c AS (
  SELECT doc_id, nt,
         COALESCE(sum(nt) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS before
  FROM t
)
SELECT CAST(before // {_SHARD_BUDGET} AS BIGINT) AS shard_id,
       count(*)::BIGINT AS n_docs,
       sum(nt)::BIGINT AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1
"""


def q_collocations_pmi(sf_dir: str):
    """Top-{_PMI_TOP_K} adjacent-bigram collocations by PMI
    (stages/lexical.py:pmi_collocations), min bigram count
    {_PMI_MIN_COUNT}, integer-micro PMI."""
    import ray.data as rd

    from deduplicator_ray.stages.lexical import pmi_collocations

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return pmi_collocations(ds, top_k=_PMI_TOP_K,
                            min_count=_PMI_MIN_COUNT)


_SQL_COLLOCATIONS_PMI = f"""
WITH ex AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
),
pos AS (SELECT doc_id, unnest(w) AS tok,
               unnest(range(1, len(w) + 1)) AS ord
        FROM ex),
big AS (SELECT x.tok AS a, y.tok AS b
        FROM pos x JOIN pos y
          ON x.doc_id = y.doc_id AND y.ord = x.ord + 1),
bc AS (SELECT a, b, count(*)::BIGINT AS n FROM big GROUP BY a, b),
la AS (SELECT a, sum(n)::BIGINT AS ca FROM bc GROUP BY a),
rb AS (SELECT b, sum(n)::BIGINT AS cb FROM bc GROUP BY b),
tot AS (SELECT sum(n)::BIGINT AS nn FROM bc)
SELECT bc.a, bc.b, bc.n,
       CAST(floor(ln((CAST(bc.n AS DOUBLE) * tot.nn)
                     / (CAST(la.ca AS DOUBLE) * rb.cb))
                  * 1000000 + 0.5) AS BIGINT) AS pmi_micro
FROM bc JOIN la USING (a) JOIN rb USING (b) CROSS JOIN tot
WHERE bc.n >= {_PMI_MIN_COUNT}
ORDER BY pmi_micro DESC, bc.a, bc.b LIMIT {_PMI_TOP_K}
"""



_RRF_POOL, _RRF_TOP, _RRF_CONST = 20, 10, 60


def q_ttr_stats(sf_dir: str):
    """Per-doc type-token ratio (stages/textstats.py:ttr_stats):
    lexical-diversity ppm, map-only zero-shuffle."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import ttr_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ttr_stats(ds)


_SQL_TTR_STATS = """
WITH w AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
)
SELECT doc_id, len(w)::BIGINT AS n_tokens,
       len(list_distinct(w))::BIGINT AS n_types,
       CAST((len(list_distinct(w)) * 1000000) // len(w) AS BIGINT)
         AS ttr_ppm
FROM w
"""


def q_rank_fusion_rrf(sf_dir: str):
    """Reciprocal-rank fusion (stages/lexical.py:rank_fusion_rrf) of the
    BM25 and raw term-frequency rankings for the query {_BM25_TERMS}:
    top {_RRF_TOP} fused from two top-{_RRF_POOL} lists, integer
    1e6 // (60 + rank) scoring."""
    import ray.data as rd

    from deduplicator_ray.stages.lexical import rank_fusion_rrf

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return rank_fusion_rrf(ds, _BM25_TERMS, k=_RRF_TOP, pool=_RRF_POOL,
                           rrf_k=_RRF_CONST, k1=_BM25_K1, b=_BM25_B)


_SQL_RANK_FUSION_RRF = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
q(term) AS (VALUES {", ".join(f"('{t}')" for t in _BM25_TERMS)}),
tf AS (SELECT t.doc_id, t.term, count(*)::BIGINT AS tf
       FROM toks t JOIN q USING (term) GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
score AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))
            ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
       FROM score ORDER BY score DESC, doc_id LIMIT {_RRF_POOL}),
tfc AS (SELECT doc_id, sum(tf)::BIGINT AS c FROM tf GROUP BY doc_id),
tt AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r
       FROM tfc ORDER BY c DESC, doc_id LIMIT {_RRF_POOL}),
u AS (SELECT doc_id FROM bm UNION SELECT doc_id FROM tt)
SELECT u.doc_id,
       CAST(COALESCE(1000000 // ({_RRF_CONST} + bm.r), 0)
            + COALESCE(1000000 // ({_RRF_CONST} + tt.r), 0)
            AS BIGINT) AS rrf_micro
FROM u LEFT JOIN bm ON u.doc_id = bm.doc_id
       LEFT JOIN tt ON u.doc_id = tt.doc_id
ORDER BY rrf_micro DESC, u.doc_id LIMIT {_RRF_TOP}
"""



def q_label_token_stats(sf_dir: str):
    """Cross-table rollup: documents ⋈ embeddings on doc_id = vec_id,
    token statistics per embedding label — the "how do my clusters read
    as text?" join a curation recipe runs between the dense and lexical
    views of the corpus.

    Shape: BOTH sides collapse before the join — documents to
    (doc_id, n_tokens, n_types) map-side via ttr_stats (text never rides
    the join shuffle), embeddings pruned to (vec_id, label) at the read
    (vector payloads never move) — then ONE hash-shuffle join on the 8 B
    key (stages/joins.py:hash_join) and a per-label partial combine
    (<= |labels| rows per block reach the driver)."""
    import ray.data as rd

    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.stages.textstats import ttr_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = ttr_stats(docs).select_columns(["doc_id", "n_tokens", "n_types"])

    def emb_side(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["vec_id"],
                         "label": pc.cast(b["label"], pa.int64())})

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"]).map_batches(
        emb_side, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(tok, emb, on=("doc_id",), num_partitions=16,
                  out_schema={"doc_id": pa.int64(), "n_tokens": pa.int64(),
                              "n_types": pa.int64(), "label": pa.int64()})

    def partial(b: pa.Table) -> pa.Table:
        df = (b.select(["label", "n_tokens", "n_types"]).to_pandas()
              .groupby("label", as_index=False)
              .agg(n_docs=("n_tokens", "size"),
                   sum_tokens=("n_tokens", "sum"),
                   sum_types=("n_types", "sum")))
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (j.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
           .to_pandas())
    if out.empty:
        return pa.table({c: pa.array([], type=pa.int64()) for c in
                         ("label", "n_docs", "sum_tokens", "sum_types",
                          "ttr_ppm")})
    g = (out.groupby("label", as_index=False)
         .agg(n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum"),
              sum_types=("sum_types", "sum")))
    g["ttr_ppm"] = g["sum_types"] * 1_000_000 // g["sum_tokens"]
    return pa.Table.from_pandas(
        g.astype({c: "int64" for c in g.columns}), preserve_index=False)


_SQL_LABEL_TOKEN_STATS = """
WITH t AS (
  SELECT doc_id,
         len(string_split(COALESCE(text, ''), ' '))::BIGINT AS nt,
         len(list_distinct(string_split(COALESCE(text, ''), ' ')))::BIGINT
           AS ny
  FROM documents
)
SELECT CAST(label AS BIGINT) AS label, count(*)::BIGINT AS n_docs,
       sum(nt)::BIGINT AS sum_tokens, sum(ny)::BIGINT AS sum_types,
       CAST((sum(ny) * 1000000) // sum(nt) AS BIGINT) AS ttr_ppm
FROM t JOIN embeddings e ON t.doc_id = e.vec_id
GROUP BY label
"""



def q_event_transitions(sf_dir: str):
    """Within-session Markov transition census of the event stream:
    (from_type, to_type, n) counts of consecutive same-user event pairs
    at most {_SESSION_GAP_S} s apart (the events_sessions gap rule) — the
    behavioral-sequence profile a funnel/recommendation recipe reads.

    Same partitioning contract as events_sessions: ONE user-id shuffle
    of 24 B rows gives each bucket complete per-user timelines; inside a
    bucket the pass is vectorized (sort + shift + mask + groupby), never
    per-user Python.  Output is bounded by |event_type|^2 rows per
    bucket, so the driver merge is tiny."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import hash_bucket

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def to_epoch(b: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()),
            1_000_000)
        return pa.table({"user_id": b["user_id"], "tse": epoch,
                         "event_id": b["event_id"],
                         "event_type": b["event_type"]})

    def per_bucket(g):
        import pandas as pd

        if g.empty or "user_id" not in g.columns:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "tse", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["tse"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy(object)
        ok = ((u[1:] == u[:-1]) & (t[1:] - t[:-1] <= _SESSION_GAP_S))
        out = (pd.DataFrame({"from_type": ty[:-1][ok],
                             "to_type": ty[1:][ok]})
               .groupby(["from_type", "to_type"], as_index=False,
                        sort=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    parts = (hash_bucket(
        ds.map_batches(to_epoch, batch_format="pyarrow",
                       zero_copy_batch=True), "user_id", 64)
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    if parts.empty:
        return pa.table({"from_type": pa.array([], type=pa.string()),
                         "to_type": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    g = (parts.groupby(["from_type", "to_type"], as_index=False)["n"]
         .sum())
    g["n"] = g["n"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


_SQL_EVENT_TRANSITIONS = f"""
WITH o AS (
  SELECT user_id, event_type AS a,
         lead(event_type) OVER w AS b,
         epoch_ms(ts) // 1000 AS t,
         lead(epoch_ms(ts) // 1000) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) // 1000,
               event_id)
)
SELECT a AS from_type, b AS to_type, count(*)::BIGINT AS n
FROM o WHERE b IS NOT NULL AND t2 - t <= {_SESSION_GAP_S}
GROUP BY 1, 2
"""



def _interchange_roundtrip(sf_dir: str, fmt: str):
    """Shared body of the jsonl/csv round-trip queries: documents + an
    ISO-Z timestamp column -> format shards under a /tmp scratch dir
    (one file per block, the resumable layout) -> back through the
    registered source (exercising its warc_ts normalization path) ->
    projected rows, materialized so the scratch dir can be removed
    before returning.

    CSV cannot represent the empty string (an empty field reads back as
    NULL), so the csv path coalesces text/lang back to '' — mirrored by
    COALESCE in its oracle; JSONL distinguishes '' from null natively.
    """
    import shutil
    import tempfile

    import ray.data as rd

    from deduplicator_ray.sources import get_source

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def enrich(b: pa.Table) -> pa.Table:
        import pandas as pd

        ids = b["doc_id"].to_numpy().astype(np.int64)
        iso = pd.to_datetime(_WARC_EPOCH0 + ids, unit="s", utc=True
                             ).strftime("%Y-%m-%dT%H:%M:%SZ")
        return pa.table({"doc_id": b["doc_id"], "text": b["text"],
                         "lang": b["lang"],
                         "warc_ts": pa.array(iso, type=pa.string())})

    out = tempfile.mkdtemp(prefix=f"{fmt}_roundtrip_", dir="/tmp")
    enriched = ds.map_batches(enrich, batch_format="pyarrow",
                              zero_copy_batch=True)
    if fmt == "jsonl":
        enriched.write_json(out)
    else:
        enriched.write_csv(out)
    back = get_source(fmt)(out)

    def proj(b: pa.Table) -> pa.Table:
        ts = b["warc_ts"]
        if not pa.types.is_timestamp(ts.type):  # loud: norm path broken
            raise TypeError(f"{fmt} source left warc_ts as {ts.type}")
        epoch = pc.divide(pc.cast(ts.cast(pa.timestamp("us", tz="UTC")),
                                  pa.int64()), 1_000_000)
        text, lang = b["text"], b["lang"]
        if fmt == "csv":  # '' went out, NULL came back: restore
            text = pc.fill_null(text, "")
            lang = pc.fill_null(lang, "")
        return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                         "ts_epoch": epoch, "text": text, "lang": lang})

    res = back.map_batches(proj, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    shutil.rmtree(out, ignore_errors=True)
    return res


def q_jsonl_roundtrip(sf_dir: str):
    """Round-trip the corpus through the JSONL interchange format (the
    one-object-per-line dump format LLM data pipelines exchange) via the
    registered ``jsonl`` source (sources/__init__.py:_jsonl_source).
    Oracle recomputes every row from ``documents``."""
    return _interchange_roundtrip(sf_dir, "jsonl")


_SQL_JSONL_ROUNDTRIP = f"""
SELECT doc_id, CAST({_WARC_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       text, lang
FROM documents
"""


def q_csv_roundtrip(sf_dir: str):
    """Round-trip the corpus through header-CSV via the registered
    ``csv`` source (sources/__init__.py:_csv_source).  CSV collapses ''
    to NULL on read; the query coalesces back and the oracle mirrors
    with COALESCE.  Oracle recomputes every row from ``documents``."""
    return _interchange_roundtrip(sf_dir, "csv")


_SQL_CSV_ROUNDTRIP = f"""
SELECT doc_id, CAST({_WARC_EPOCH0} + doc_id AS BIGINT) AS ts_epoch,
       COALESCE(text, '') AS text, COALESCE(lang, '') AS lang
FROM documents
"""


_DUPMAT_FANIN = 8


def _dupmat_host_pat() -> str:
    """The shared host regex (stages/graph.py:HOST_PAT) — one rule, every
    host-keyed query agrees on it."""
    from deduplicator_ray.stages.graph import HOST_PAT

    return HOST_PAT


def q_dup_host_matrix(sf_dir: str):
    """Cross-host duplicate-pair attribution over the captures corpus:
    for every unordered host pair (host_a <= host_b), the number of
    capture PAIRS sharing a content digest — the multiplicity-weighted
    complement of content_mirrors (which counts DISTINCT shared digests):
    "how much fetch budget went to re-downloading whose bytes?".

    Digests served by more than {_DUPMAT_FANIN} distinct hosts are
    excluded by contract (the soft-404 / empty page every host serves
    would otherwise dominate every cell) — same fan-in rule as
    content_mirrors, mirrored in the oracle.

    Shape: per-batch partial (digest, host) counts, ONE digest-key
    shuffle; per bucket the per-digest host histograms yield pair counts
    in closed form (c_a*c_b across hosts, C(c,2) within), output bounded
    by fanin^2 rows per digest."""
    from deduplicator_ray.sources.corpus import captures_dataset
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def keyed(b: pa.Table) -> pa.Table:
        import pandas as pd

        m = pc.extract_regex(b["url"], _dupmat_host_pat())
        host = pc.fill_null(pc.struct_field(m, "host"), "")
        g = (pd.DataFrame({"digest": b["digest"].to_pandas(),
                           "host": host.to_pandas()})
             .groupby(["digest", "host"], as_index=False, sort=False)
             .size())
        return pa.table({"digest": pa.array(g["digest"], type=pa.string()),
                         "host": pa.array(g["host"], type=pa.string()),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    def per_bucket(df):
        import pandas as pd

        empty = pd.DataFrame({"host_a": pd.Series([], dtype=object),
                              "host_b": pd.Series([], dtype=object),
                              "n_pairs": pd.Series([], dtype="int64")})
        if df.empty or "digest" not in df.columns:
            return empty
        c = df.groupby(["digest", "host"], as_index=False)["c"].sum()
        fan = c.groupby("digest")["host"].transform("size")
        c = c[fan <= _DUPMAT_FANIN]
        if c.empty:
            return empty
        m = c.merge(c, on="digest")
        m = m[m["host_x"] <= m["host_y"]]
        same = (m["host_x"] == m["host_y"]).to_numpy()
        cx = m["c_x"].to_numpy(np.int64)
        cy = m["c_y"].to_numpy(np.int64)
        n = np.where(same, cx * (cx - 1) // 2, cx * cy)
        out = (pd.DataFrame({"host_a": m["host_x"], "host_b": m["host_y"],
                             "n_pairs": n})
               .groupby(["host_a", "host_b"], as_index=False)["n_pairs"]
               .sum())
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out[out["n_pairs"] > 0]

    parts = (hash_bucket(
        caps.map_batches(keyed, batch_format="pyarrow",
                         zero_copy_batch=True), "digest", 64)
        .groupby("_part")
        .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())
    if parts.empty:
        return pa.table({"host_a": pa.array([], type=pa.string()),
                         "host_b": pa.array([], type=pa.string()),
                         "n_pairs": pa.array([], type=pa.int64())})
    g = (parts.groupby(["host_a", "host_b"], as_index=False)["n_pairs"]
         .sum())
    g["n_pairs"] = g["n_pairs"].astype("int64")
    return pa.Table.from_pandas(g[g["n_pairs"] > 0],
                                preserve_index=False)


def _sql_dup_host_matrix() -> str:
    from deduplicator_ray.sources.corpus import CAPTURES_CTE

    return f"""
WITH {CAPTURES_CTE},
c AS (
  SELECT md5(text) AS digest,
         regexp_extract(url, '{_dupmat_host_pat()}', 1) AS host,
         count(*)::BIGINT AS c
  FROM captures GROUP BY 1, 2
),
keep AS (
  SELECT * FROM c
  WHERE digest IN (SELECT digest FROM c GROUP BY digest
                   HAVING count(*) <= {_DUPMAT_FANIN})
)
SELECT a.host AS host_a, b.host AS host_b,
       sum(CASE WHEN a.host = b.host THEN a.c * (a.c - 1) // 2
                ELSE a.c * b.c END)::BIGINT AS n_pairs
FROM keep a JOIN keep b ON a.digest = b.digest AND a.host <= b.host
GROUP BY 1, 2
HAVING sum(CASE WHEN a.host = b.host THEN a.c * (a.c - 1) // 2
                ELSE a.c * b.c END) > 0
"""



def q_quality_classifier(sf_dir: str):
    """Learned quality filter — the CCNet (Wenzek et al. 2020) / GPT-3
    (Brown et al. 2020, App. A) pattern: a linear classifier scores
    documents instead of hand rules.  Here it DISTILLS the Gopher rule
    filter: labels come from ``gopher_filter`` (same thresholds as the
    ``gopher_filter`` row), features are 256 hashed token-TF buckets +
    3 dense stats, training is distributed IRLS (one map-only pass per
    Newton round emitting integer-quantized gradient+Hessian block
    partials — bit-deterministic at any parallelism; see
    stages/classifier.py).  Output: (doc_id, label, prob_micro, pred).
    Measured at sf0.01: accuracy 0.888 vs 0.532 majority baseline.
    Iterative training has no SQL mirror -> reviewed golden pin."""
    import ray.data as rd

    from deduplicator_ray.stages.classifier import logreg_quality
    from deduplicator_ray.stages.textstats import gopher_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    lab = gopher_filter(ds, min_words=_GOPHER_MIN_WORDS,
                        max_words=_GOPHER_MAX_WORDS,
                        stopwords=_gopher_stoplist(), output="annotate")
    lab = lab.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "text": b["text"],
                            "label": b["keep"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    out = logreg_quality(lab)
    # label/pred as 0/1 BIGINT: the golden-pin VALUES tables carry int
    # and str columns only
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "label": pc.cast(b["label"], pa.int64()),
            "prob_micro": b["prob_micro"],
            "pred": pc.cast(b["pred"], pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True)


def q_quality_by_source(sf_dir: str):
    """Per-source quality profile: how many docs each source keeps and
    which Gopher rule fails the rest — the feed-level health dashboard a
    mixing recipe reads before setting per-source rates (composes
    stages/textstats.py:gopher_filter output="annotate" with a per-batch
    histogram partial; <= |sources| x |rules| rows per block, tiny
    driver merge)."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import gopher_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    ann = gopher_filter(ds, min_words=_GOPHER_MIN_WORDS,
                        max_words=_GOPHER_MAX_WORDS,
                        stopwords=_gopher_stoplist(), output="annotate")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            # '' for a NULL source: pandas groupby drops NaN keys while
            # the oracle's GROUP BY keeps them — coalesce on BOTH sides
            "source": b["source"].to_pandas().fillna(""),
            "fail_reason": b["fail_reason"].to_pandas().fillna("")})
        g = (df.groupby(["source", "fail_reason"], as_index=False,
                        sort=False).size())
        return pa.table({
            "source": pa.array(g["source"], type=pa.string()),
            "fail_reason": pa.array(g["fail_reason"], type=pa.string()),
            "n_docs": pa.array(g["size"].to_numpy(np.int64))})

    parts = ann.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    if parts.empty:
        return pa.table({"source": pa.array([], type=pa.string()),
                         "fail_reason": pa.array([], type=pa.string()),
                         "n_docs": pa.array([], type=pa.int64())})
    g = (parts.groupby(["source", "fail_reason"], as_index=False)
         ["n_docs"].sum())
    g["n_docs"] = g["n_docs"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


def _sql_quality_by_source() -> str:
    base = _sql_gopher_filter().strip()
    return f"""
WITH g AS ({base})
SELECT COALESCE(d.source, '') AS source,
       COALESCE(g.fail_reason, '') AS fail_reason,
       count(*)::BIGINT AS n_docs
FROM g JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""



_HARDNEG_SKIP, _HARDNEG_M = 10, 10


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training (Robinson et al.
    2021, "Contrastive Learning with Hard Negative Samples"): for each
    query vector, the cosine-rank band ({_HARDNEG_SKIP},
    {_HARDNEG_SKIP + _HARDNEG_M}] — the near-misses ranking just below
    the positive band, which carry the most training signal.  Reuses the
    exact cosine_topk kernel at k = skip + m (same per-block local
    top-k pruning), then keeps the tail band."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import cosine_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = cosine_topk(ds, _topk_query_matrix(sf_dir),
                      k=_HARDNEG_SKIP + _HARDNEG_M)
    out = out.filter(pc.greater(out["rank"], _HARDNEG_SKIP))
    return out.select(["query_id", "vec_id", "rank"])


_SQL_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {_TOPK_NQ}
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS c
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, rank FROM r
WHERE rank > {_HARDNEG_SKIP} AND rank <= {_HARDNEG_SKIP + _HARDNEG_M}
"""



def q_dup_rate_timeline(sf_dir: str):
    """Operational crawl-dedup monitor: per capture-hour, how many
    fetches were duplicates of content already seen EARLIER IN TIME
    (digest first seen at a smaller warc_ts), plus the running
    cumulative dup rate in ppm — the live "is this crawl still finding
    new bytes?" gauge (the time-ordered twin of dup_growth's
    id-ordered curve, over captures instead of documents).

    Shape: ONE digest-hash shuffle of (hash, ts, hour) rows — 24 B/row,
    text never moves (freq_spectrum's 64-bit collision contract);
    per-bucket min-ts election is globally correct because a digest's
    every capture lands in one bucket; hour histograms (bounded by the
    crawl's wall-clock span) merge on the driver.  Capture timestamps
    are unique by construction, so the election needs no tie-break.
    """
    import ray.data as rd  # noqa: F401 - captures_dataset returns one

    from deduplicator_ray.sources.corpus import captures_dataset
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def keyed(b: pa.Table) -> pa.Table:
        import pandas as pd

        txt = b["text"].to_pandas().fillna("").to_numpy(object)
        h = pd.util.hash_array(txt).astype(np.int64)
        ts = b["ts_epoch"].to_numpy().astype(np.int64)
        return pa.table({"h": pa.array(h), "ts": pa.array(ts),
                         "hour": pa.array(ts // 3600)})

    def dup_hist(df):
        import pandas as pd

        if df.empty or "h" not in df.columns:
            return pd.DataFrame({"hour": pd.Series([], dtype="int64"),
                                 "n_dups": pd.Series([], dtype="int64")})
        dup = df["ts"] != df.groupby("h")["ts"].transform("min")
        k, c = np.unique(df.loc[dup, "hour"].to_numpy(dtype=np.int64),
                         return_counts=True)
        return pd.DataFrame({"hour": k, "n_dups": c.astype("int64")})

    dups = (hash_bucket(
        caps.map_batches(keyed, batch_format="pyarrow",
                         zero_copy_batch=True), "h", 64)
        .groupby("_part")
        .map_groups(lambda g: dup_hist(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas())

    def cap_hist(b: pa.Table) -> pa.Table:
        ts = b["ts_epoch"].to_numpy().astype(np.int64)
        k, c = np.unique(ts // 3600, return_counts=True)
        return pa.table({"hour": pa.array(k.astype(np.int64)),
                         "n_captures": pa.array(c.astype(np.int64))})

    caps2 = captures_dataset(sf_dir)
    tot = caps2.map_batches(cap_hist, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    if tot.empty or "hour" not in tot.columns:
        return pa.table({c: pa.array([], type=pa.int64()) for c in
                         ("hour", "n_captures", "n_dups",
                          "cum_dup_ppm")})
    nt = tot.groupby("hour")["n_captures"].sum().sort_index()
    nd = (dups.groupby("hour")["n_dups"].sum()
          if (not dups.empty and "hour" in dups.columns) else None)
    out = nt.to_frame()
    out["n_dups"] = (nd.reindex(nt.index).fillna(0).astype("int64")
                     if nd is not None else 0)
    cum_c = out["n_captures"].cumsum()
    cum_d = out["n_dups"].cumsum()
    out["cum_dup_ppm"] = (cum_d * 1_000_000 // cum_c).astype("int64")
    out = out.reset_index()
    return pa.table({
        "hour": pa.array(out["hour"].to_numpy(np.int64)),
        "n_captures": pa.array(out["n_captures"].to_numpy(np.int64)),
        "n_dups": pa.array(out["n_dups"].to_numpy(np.int64)),
        "cum_dup_ppm": pa.array(out["cum_dup_ppm"].to_numpy(np.int64)),
    })


def _sql_dup_rate_timeline() -> str:
    from deduplicator_ray.sources.corpus import CAPTURES_CTE

    return f"""
WITH {CAPTURES_CTE},
d AS (
  SELECT ts_epoch // 3600 AS hour,
         ts_epoch > min(ts_epoch) OVER (PARTITION BY text) AS dup
  FROM captures
),
h AS (
  SELECT hour, count(*)::BIGINT AS n_captures,
         sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS n_dups
  FROM d GROUP BY hour
)
SELECT hour, n_captures, n_dups,
       CAST((sum(n_dups) OVER w * 1000000)
            // sum(n_captures) OVER w AS BIGINT) AS cum_dup_ppm
FROM h
WINDOW w AS (ORDER BY hour ROWS UNBOUNDED PRECEDING)
"""



def q_cluster_size_census(sf_dir: str):
    """Near-dup cluster-size histogram over the north-star assignment
    (q_neardup_clusters): how many clusters of each size the corpus
    carries — the "is near-dup mass a few mega-clusters or a long tail?"
    read that sizes dedup savings and flags template explosions.
    Clustered docs only (singletons are not cluster members by the
    north-star definition).  The assignment is driver-small by the
    north-star contract; the census is a trivial fold over it."""
    asg = q_neardup_clusters(sf_dir)  # pandas (doc_key, cluster_id)
    sizes = asg.groupby("cluster_id").size().to_numpy(dtype=np.int64)
    k, c = np.unique(sizes, return_counts=True)
    return pa.table({"cluster_size": pa.array(k),
                     "n_clusters": pa.array(c.astype(np.int64))})


_SQL_CLUSTER_SIZE_CENSUS = f"""
SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM (
  SELECT cluster_id, count(*)::BIGINT AS cluster_size
  FROM ({_SQL_NEARDUP_CLUSTERS}) GROUP BY cluster_id
) GROUP BY cluster_size
"""


def q_capture_depth_census(sf_dir: str):
    """Crawl structure profile: capture counts per url PATH DEPTH and
    crawl ('/'-separated segments below the host; depth 0 = the root) —
    the "how deep is the crawler wandering?" read next to trap_patterns.
    Map-only partial histograms (<= depths x 2 rows per block), tiny
    driver merge; integer slash-count arithmetic identical in SQL."""
    import ray.data as rd  # noqa: F401

    from deduplicator_ray.sources.corpus import captures_dataset

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        depth = pc.subtract(pc.count_substring(b["url"], "/"),
                            2).to_pandas()
        df = (pd.DataFrame({"crawl": b["crawl"].to_pandas(),
                            "depth": depth.astype("int64")})
              .groupby(["crawl", "depth"], as_index=False, sort=False)
              .size())
        return pa.table({
            "crawl": pa.array(df["crawl"], type=pa.string()),
            "depth": pa.array(df["depth"].to_numpy(np.int64)),
            "n_captures": pa.array(df["size"].to_numpy(np.int64))})

    parts = caps.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if parts.empty:
        return pa.table({"crawl": pa.array([], type=pa.string()),
                         "depth": pa.array([], type=pa.int64()),
                         "n_captures": pa.array([], type=pa.int64())})
    g = (parts.groupby(["crawl", "depth"], as_index=False)
         ["n_captures"].sum())
    g["n_captures"] = g["n_captures"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


def _sql_capture_depth_census() -> str:
    from deduplicator_ray.sources.corpus import CAPTURES_CTE

    return f"""
WITH {CAPTURES_CTE}
SELECT crawl,
       CAST(length(url) - length(replace(url, '/', '')) - 2 AS BIGINT)
         AS depth,
       count(*)::BIGINT AS n_captures
FROM captures GROUP BY 1, 2
"""


def q_bbit_jaccard_est(sf_dir: str):
    """Near-dup pair scoring from b=1 b-bit minhash sketches (Li &
    Koenig 2010; stages/minhash.bbit_jaccard_pairs): LSH candidates
    scored by the bias-corrected collision estimate from 16-byte
    sketches — the retention/transport shape when keeping full
    512-byte signatures of every doc is too heavy.  Deterministic
    (seeded permutations), so the driver oracle is a golden pin;
    estimator accuracy is pytest-gated against planted agreement."""
    import ray.data as rd

    from deduplicator_ray.stages.minhash import bbit_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bbit_jaccard_pairs(ds, b=1, key_col="doc_id",
                              min_est_ppm=300_000)


def q_containment_est(sf_dir: str):
    """Asymmetric containment estimates for LSH near-dup candidates
    (stages/minhash.containment_est_pairs): c(A->B) = |A∩B|/|A| from
    minhash sketches + exact distinct-shingle sizes — the quote /
    partial-mirror signal symmetric Jaccard flattens.  Deterministic
    (seeded permutations) -> golden-pinned; the subset-geometry
    estimator is pytest-gated.  Exact completeness-critical alternative:
    ``ngram_containment_pairs`` (oracle-checked)."""
    import ray.data as rd

    from deduplicator_ray.stages.minhash import containment_est_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return containment_est_pairs(ds, key_col="doc_id",
                                 min_c_ppm=500_000)


def q_winnow_pairs(sf_dir: str):
    """MOSS-style local-similarity pairs over ``documents``
    (stages/textstats.winnow_pairs): docs sharing >= 10 winnow
    fingerprints (df-capped at 50) — the lifted-paragraph / quote
    detector global near-dup misses.  GRADUATED from its golden pin in
    round 5: the oracle rebuilds the fingerprint sets from raw text
    (see `_winnow_fps_cte`) and recomputes the df-capped pair counts
    from scratch."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import winnow_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return winnow_pairs(ds, min_shared=10)


_SAMPLE_K, _SAMPLE_K_SEED = 7, 13


def q_sample_k_stratified(sf_dir: str):
    """Exact-k deterministic per-language sample
    (stages/shuffle.sample_k_stratified): the k smallest Weyl keys per
    group, ranked — fixed-size eval-set draws where Bernoulli sampling's
    binomial variance is unacceptable.  Zero shuffle; bijective keys
    make the rank total with no tie-break."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    from deduplicator_ray.stages.shuffle import sample_k_stratified

    return sample_k_stratified(ds, _SAMPLE_K, seed=_SAMPLE_K_SEED)


def q_containment_ensemble(sf_dir: str):
    """LSH-Ensemble containment pair mining (Zhu et al. VLDB 2016;
    stages/minhash.containment_pairs_ensemble): size-stratified banding
    engineers >= 0.95 candidate recall for contained pairs up to an 8x
    size ratio — the high-containment/low-J regime plain Jaccard
    banding misses — with exact set verification (precision 1).
    Deterministic -> golden-pinned; full-recall + exact-values vs brute
    force is pytest-gated."""
    import ray.data as rd

    from deduplicator_ray.stages.minhash import containment_pairs_ensemble

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return containment_pairs_ensemble(ds, num=4, den=5, key_col="doc_id")


# Real recomputation mirror for containment_ensemble (graduated from a
# golden pin): brute-force exact containment over the SAME shingle
# definition (5-word shingles of lowercased \w+ tokens; short docs
# collapse to ONE all-words shingle, matching shingle_hashes).  The
# engine's candidate recall is engineered >= 0.95 only up to an 8x size
# ratio, but its full-recall-at-test-scale property is pytest-gated and
# holds at the driver's sf0.01, where this mirror is value-exact.
_SQL_CONTAINMENT_ENSEMBLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^0-9a-z_]+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 5
              THEN list_distinct(list_transform(range(1, len(w) - 3),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4]))
              WHEN len(w) >= 1 THEN [array_to_string(w, ' ')]
              ELSE [] END AS g
  FROM toks
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.g, b.g))::BIGINT AS n_inter,
       len(a.g)::BIGINT AS size_a, len(b.g)::BIGINT AS size_b
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE len(a.g) > 0 AND len(b.g) > 0
  AND 5 * len(list_intersect(a.g, b.g)) >= 4 * least(len(a.g), len(b.g))
"""


def _sql_detector_overlap() -> str:
    """Semi-graduated oracle for detector_overlap: the Jaccard pair set
    and ALL the set arithmetic are real recomputation (the same pairs
    CTE the north-star neardup_clusters oracle uses); only the SimHash
    pair set comes from its existing golden pin (siphash signatures are
    not SQL-expressible) — no new pin surface."""
    from deduplicator_ray.pipelines.golden_sql import GOLDEN_SQL

    sim = GOLDEN_SQL["simhash_dups"]
    return f"""
WITH RECURSIVE {_NEARDUP_CC_CTES},
jp AS (SELECT a AS doc_a, b AS doc_b FROM pairs),
sp AS (SELECT a, b FROM ({sim}) s)
SELECT (SELECT count(*) FROM jp)::BIGINT AS n_jaccard,
       (SELECT count(*) FROM sp)::BIGINT AS n_simhash,
       (SELECT count(*) FROM jp JOIN sp
          ON jp.doc_a = sp.a AND jp.doc_b = sp.b)::BIGINT AS n_both,
       ((SELECT count(*) FROM jp) - (SELECT count(*) FROM jp JOIN sp
          ON jp.doc_a = sp.a AND jp.doc_b = sp.b))::BIGINT AS n_jaccard_only,
       ((SELECT count(*) FROM sp) - (SELECT count(*) FROM jp JOIN sp
          ON jp.doc_a = sp.a AND jp.doc_b = sp.b))::BIGINT AS n_simhash_only
"""


def q_detector_overlap(sf_dir: str):
    """Detector-agreement census: the exact 5-gram Jaccard >= 0.8 pair
    set vs the SimHash hamming<=3 pair set over ``documents`` — one row
    (n_jaccard, n_simhash, n_both, n_jaccard_only, n_simhash_only).
    The evaluation read that decides which near-dup tier catches what
    (SimHash favors long-doc token-frequency similarity; shingle
    Jaccard favors ordered phrase overlap).  Both inputs deterministic
    -> golden-pinned; each side's own pipeline is independently
    oracle/golden-checked elsewhere."""
    import pandas as pd

    jp = _to_pandas_result(q_neardup_clusters_pairs(sf_dir))
    sp = _to_pandas_result(q_simhash_dups(sf_dir))
    a = set(zip(jp["doc_a"], jp["doc_b"]))
    b = set(zip(sp["a"], sp["b"]))
    return pd.DataFrame([{
        "n_jaccard": len(a), "n_simhash": len(b),
        "n_both": len(a & b),
        "n_jaccard_only": len(a - b), "n_simhash_only": len(b - a),
    }]).astype("int64")


def _to_pandas_result(res):
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def q_neardup_clusters_pairs(sf_dir: str):
    """The exact Jaccard pair set at the north-star config (helper for
    detector_overlap; same pipeline the neardup_clusters oracle
    checks)."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, num=_NEARDUP_NUM, den=_NEARDUP_DEN,
                               ngram=_NEARDUP_NGRAM, lang_col=None)


def q_script_mix(sf_dir: str):
    """Unicode-script census per language: doc counts, per-script char
    sums (Latin/Cyrillic/Han/Arabic), digit/letter totals, and the
    mixed-script doc count (non-dominant script mass >= 10% of letters
    and >= 5 chars — the spam/mojibake anomaly flag).  Per-doc counts
    are RE2 unicode-script classes (stages/textstats.script_counts),
    identical kernels in pyarrow and DuckDB; rollup is a per-block
    partial combine (<= #langs rows leave each block), zero shuffle."""
    import pandas as pd

    import ray.data as rd

    from deduplicator_ray.stages.textstats import script_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    per = script_counts(ds)

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        df["n_mixed"] = df.pop("is_mixed").astype("int64")
        df["n_docs"] = 1
        return df.drop(columns=["doc_id"]).groupby(
            "lang", as_index=False).sum()

    parts = per.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    cols = ["n_docs", "n_latin", "n_cyrillic", "n_han", "n_arabic",
            "n_digits", "n_letters", "n_mixed"]
    if parts.empty:
        return pd.DataFrame({"lang": pd.Series([], dtype="string"),
                             **{c: pd.Series([], dtype="int64")
                                for c in cols}})
    out = parts.groupby("lang", as_index=False).sum()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[["lang"] + cols]


_SQL_SCRIPT_MIX = r"""
WITH s AS (
  SELECT lang,
         len(regexp_extract_all(text, '\p{Latin}'))    AS n_latin,
         len(regexp_extract_all(text, '\p{Cyrillic}')) AS n_cyrillic,
         len(regexp_extract_all(text, '\p{Han}'))      AS n_han,
         len(regexp_extract_all(text, '\p{Arabic}'))   AS n_arabic,
         len(regexp_extract_all(text, '\p{Nd}'))       AS n_digits,
         len(regexp_extract_all(text, '\p{L}'))        AS n_letters
  FROM documents
),
m AS (
  SELECT *,
         n_latin + n_cyrillic + n_han + n_arabic
           - greatest(n_latin, n_cyrillic, n_han, n_arabic) AS nondom
  FROM s
)
SELECT lang,
       count(*)::BIGINT        AS n_docs,
       sum(n_latin)::BIGINT    AS n_latin,
       sum(n_cyrillic)::BIGINT AS n_cyrillic,
       sum(n_han)::BIGINT      AS n_han,
       sum(n_arabic)::BIGINT   AS n_arabic,
       sum(n_digits)::BIGINT   AS n_digits,
       sum(n_letters)::BIGINT  AS n_letters,
       sum(CASE WHEN 10 * nondom >= n_letters AND nondom >= 5
                THEN 1 ELSE 0 END)::BIGINT AS n_mixed
FROM m GROUP BY lang
"""


def q_mojibake_stats(sf_dir: str):
    """Encoding-damage census per source: counts of the classic
    UTF-8-decoded-as-cp1252 artifacts ('Ã' + continuation char for
    damaged Latin-1 letters, 'â€' for damaged punctuation, stray 'Â'
    before spaces/symbols, and U+FFFD replacement chars) plus the
    affected-doc count — the data-cleaning read (ftfy-style) a crawl
    ingest runs before trusting its text extraction.  Map-only RE2
    substring counts with a per-block partial combine (<= #sources rows
    leave each block); patterns evaluate identically in DuckDB."""
    import pandas as pd

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def partial(b: pa.Table) -> pd.DataFrame:
        t = pc.fill_null(b["text"], "")

        def cnt(pat: str) -> np.ndarray:
            return (pc.count_substring(t, pat)
                    .to_numpy(zero_copy_only=False).astype(np.int64))

        at = cnt("Ã")      # Ã : mangled Latin-1 letter lead byte
        ac = cnt("â€")  # â€ : mangled punctuation lead pair
        st = cnt("Â")      # Â : stray NBSP/symbol lead byte
        rc = cnt("�")      # U+FFFD replacement char
        df = pd.DataFrame({
            "source": b["source"].to_pandas(),
            "n_atilde": at, "n_apunct": ac, "n_stray_a": st, "n_fffd": rc,
            "n_affected": ((at + ac + st + rc) > 0).astype("int64"),
            "n_docs": 1,
        })
        return df.groupby("source", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    cols = ["n_docs", "n_affected", "n_atilde", "n_apunct",
            "n_stray_a", "n_fffd"]
    if parts.empty:
        return pd.DataFrame({"source": pd.Series([], dtype="string"),
                             **{c: pd.Series([], dtype="int64")
                                for c in cols}})
    out = parts.groupby("source", as_index=False).sum()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[["source"] + cols]


_SQL_MOJIBAKE_STATS = """
WITH s AS (
  SELECT source,
         (length(text) - length(replace(text, 'Ã', ''))) AS n_atilde,
         (length(text) - length(replace(text, 'â€', ''))) / 2 AS n_apunct,
         (length(text) - length(replace(text, 'Â', ''))) AS n_stray_a,
         (length(text) - length(replace(text, '�', ''))) AS n_fffd
  FROM documents
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN n_atilde + n_apunct + n_stray_a + n_fffd > 0
                THEN 1 ELSE 0 END)::BIGINT AS n_affected,
       sum(n_atilde)::BIGINT AS n_atilde,
       sum(n_apunct)::BIGINT AS n_apunct,
       sum(n_stray_a)::BIGINT AS n_stray_a,
       sum(n_fffd)::BIGINT AS n_fffd
FROM s GROUP BY source
"""


def _sql_sample_k_stratified() -> str:
    from deduplicator_ray.stages.shuffle import sample_k_sql

    return sample_k_sql(_SAMPLE_K, _SAMPLE_K_SEED)


def registry_ext():
    """name -> (callable(sf_dir), oracle_sql | None).

    Oracle kinds: most are independent DuckDB RECOMPUTATIONS of the
    operator's semantics; the entries drawn from ``GOLDEN_SQL`` are
    pinned-golden VALUES tables (deterministic pipelines whose semantics
    have no feasible SQL mirror — see tools/pin_golden.py)."""
    from deduplicator_ray.pipelines.golden_sql import GOLDEN_SQL

    return {
        "dedup_exact_text": (q_dedup_exact_text, _SQL_DEDUP_EXACT_TEXT),
        "vocab_growth": (q_vocab_growth, _SQL_VOCAB_GROWTH),
        "dup_growth": (q_dup_growth, _SQL_DUP_GROWTH),
        "shard_manifest": (q_shard_manifest, _SQL_SHARD_MANIFEST),
        "collocations_pmi": (q_collocations_pmi, _SQL_COLLOCATIONS_PMI),
        "ttr_stats": (q_ttr_stats, _SQL_TTR_STATS),
        "rank_fusion_rrf": (q_rank_fusion_rrf, _SQL_RANK_FUSION_RRF),
        "label_token_stats": (q_label_token_stats, _SQL_LABEL_TOKEN_STATS),
        "event_transitions": (q_event_transitions, _SQL_EVENT_TRANSITIONS),
        "jsonl_roundtrip": (q_jsonl_roundtrip, _SQL_JSONL_ROUNDTRIP),
        "csv_roundtrip": (q_csv_roundtrip, _SQL_CSV_ROUNDTRIP),
        "quality_by_source": (q_quality_by_source, _sql_quality_by_source()),
        "quality_classifier": (q_quality_classifier,
                               GOLDEN_SQL.get("quality_classifier")),
        "weighted_jaccard_pairs": (q_weighted_jaccard_pairs,
                                   _SQL_WEIGHTED_JACCARD),
        "cws_jaccard_pairs": (q_cws_jaccard_pairs, _SQL_WEIGHTED_JACCARD),
        "script_mix": (q_script_mix, _SQL_SCRIPT_MIX),
        "bbit_jaccard_est": (q_bbit_jaccard_est,
                             GOLDEN_SQL.get("bbit_jaccard_est")),
        "split_by_cluster": (q_split_by_cluster, _sql_split_by_cluster()),
        "cluster_cohesion": (q_cluster_cohesion, _SQL_CLUSTER_COHESION),
        "mojibake_stats": (q_mojibake_stats, _SQL_MOJIBAKE_STATS),
        "containment_est": (q_containment_est,
                            GOLDEN_SQL.get("containment_est")),
        "winnow_pairs": (q_winnow_pairs, _sql_winnow_pairs()),
        "sample_k_stratified": (q_sample_k_stratified,
                                _sql_sample_k_stratified()),
        "embed_covariance": (q_embed_covariance, _SQL_EMB_COVARIANCE),
        "hard_negatives": (q_hard_negatives, _SQL_HARD_NEGATIVES),
        "dup_rate_timeline": (q_dup_rate_timeline,
                              _sql_dup_rate_timeline()),
        "cluster_size_census": (q_cluster_size_census,
                                _SQL_CLUSTER_SIZE_CENSUS),
        "capture_depth_census": (q_capture_depth_census,
                                 _sql_capture_depth_census()),
        "dup_host_matrix": (q_dup_host_matrix, _sql_dup_host_matrix()),
        "dup_rate_by_length": (q_dup_rate_by_length, _SQL_DUP_RATE_BY_LENGTH),
        "dedup_exact_norm": (q_dedup_exact_norm, _sql_dedup_exact_norm()),
        "tier_census": (q_tier_census, _sql_tier_census()),
        "ngram_jaccard_pairs": (q_ngram_jaccard, _SQL_NGRAM_JACCARD),
        "jaccard_curve": (q_jaccard_curve, _SQL_JACCARD_CURVE),
        "embed_dup_pairs": (q_embed_dup_pairs, _SQL_EMB_DUP_PAIRS),
        "embed_topk": (q_embed_topk, _SQL_EMB_TOPK),
        "token_stats": (q_token_stats, _SQL_TOKEN_STATS),
        "quality_stats": (q_quality_stats, _SQL_QUALITY_STATS),
        "warc_roundtrip": (q_warc_roundtrip, _SQL_WARC_ROUNDTRIP),
        "arc_roundtrip": (q_arc_roundtrip, _SQL_ARC_ROUNDTRIP),
        "wet_roundtrip": (q_wet_roundtrip, _SQL_WET_ROUNDTRIP),
        "mixed_roundtrip": (q_mixed_roundtrip, _SQL_MIXED_ROUNDTRIP),
        "crawl_log_roundtrip": (q_crawl_log_roundtrip, _SQL_CRAWL_LOG_ROUNDTRIP),
        "frame_plan": (q_frame_plan, _SQL_FRAME_PLAN),
        "resize_plan": (q_resize_plan, _SQL_RESIZE_PLAN),
        "simhash_md5_sigs": (q_simhash_md5_sigs, _SQL_SIMHASH_MD5_SIGS),
        "simhash_md5_dups": (q_simhash_md5_dups, _SQL_SIMHASH_MD5_DUPS),
        "minhash_md5_sigs": (q_minhash_md5_sigs, _SQL_MINHASH_MD5_SIGS),
        "kmv_md5_overlap": (q_kmv_md5_overlap, _kmv_md5_sql()),
        "bbit_md5_est": (q_bbit_md5_est, _SQL_BBIT_MD5_EST),
        "containment_md5_est": (q_containment_md5_est,
                                _SQL_CONTAINMENT_MD5_EST),
        "self_similarity_short": (q_self_similarity_short,
                                  _SQL_SELF_SIMILARITY_SHORT),
        "pair_lcs_short": (q_pair_lcs_short, _SQL_PAIR_LCS_SHORT),
        "media_ahash_docs": (q_media_ahash_docs, _SQL_MEDIA_AHASH_DOCS),
        "media_ahash_png_docs": (q_media_ahash_png_docs,
                                 _SQL_MEDIA_AHASH_PNG_DOCS),
        "events_sessions": (q_events_sessions, _SQL_EVENTS_SESSIONS),
        "orders_asof": (q_orders_asof, _SQL_ORDERS_ASOF),
        "embed_topk_ivf": (q_embed_topk_ivf, _SQL_EMB_TOPK),
        "embed_topk_pq": (q_embed_topk_pq, _SQL_EMB_TOPK),
        "embed_topk_ivfpq": (q_embed_topk_ivfpq, _SQL_EMB_TOPK),
        "quality_ablation_grid": (q_quality_ablation_grid,
                                  _sql_quality_ablation_grid()),
        "curation_policy": (q_curation_policy, _sql_curation_policy()),
        "policy_sample": (q_policy_sample, _sql_policy_sample()),
        "onion_filter": (q_onion_filter, _SQL_ONION_FILTER),
        "dataset_card": (q_dataset_card, _SQL_DATASET_CARD),
        "jaccard_topk": (q_jaccard_topk, _SQL_JACCARD_TOPK),
        "soft_dedup_weights": (q_soft_dedup_weights,
                               _sql_soft_dedup_weights()),
        "lsh_tuning_curve": (q_lsh_tuning_curve, _SQL_LSH_TUNING_CURVE),
        "ccnet_buckets": (q_ccnet_buckets, _SQL_CCNET_BUCKETS),
        "adc_recall_curve": (q_adc_recall_curve,
                             GOLDEN_SQL.get("adc_recall_curve")),
        "containment_ensemble": (q_containment_ensemble,
                                 _SQL_CONTAINMENT_ENSEMBLE),
        "detector_overlap": (q_detector_overlap,
                             _sql_detector_overlap()),
        "neardup_clusters": (q_neardup_clusters, _SQL_NEARDUP_CLUSTERS),
        # graduated from a golden pin: the MinHash->LSH->verify->CC scale
        # path agrees value-for-value with the exact-Jaccard recursive-CTE
        # oracle at the driver's sf0.01 (verified pairs make precision 1;
        # the >=0.99 recall gate in tests/test_queries.py covers the
        # general case, and at this scale recall is exactly 1)
        "neardup_clusters_minhash": (q_neardup_clusters_minhash,
                                     _SQL_NEARDUP_CLUSTERS),
        "pair_lcs": (q_pair_lcs, GOLDEN_SQL["pair_lcs"]),
        "simhash_dups": (q_simhash_dups, GOLDEN_SQL["simhash_dups"]),
        "self_similarity": (q_self_similarity, GOLDEN_SQL["self_similarity"]),
        "fingerprint_sketch": (q_fingerprint_sketch, _sql_fingerprint_sketch()),
        "lang_id_pred": (q_lang_id_pred, _sql_lang_id_pred()),
        "media_features": (q_media_features, GOLDEN_SQL["media_features"]),
        "media_ppm_features": (q_media_ppm_features,
                               GOLDEN_SQL.get("media_ppm_features")),
        "media_phash_dups": (q_media_phash_dups,
                             GOLDEN_SQL.get("media_phash_dups")),
        "media_phash_dups_png": (q_media_phash_dups_png,
                                 GOLDEN_SQL.get("media_phash_dups_png")),
        "media_phash_dups_jpeg": (q_media_phash_dups_jpeg,
                                  GOLDEN_SQL.get("media_phash_dups_jpeg")),
        "chunk_dedup": (q_chunk_dedup, _SQL_CHUNK_DEDUP),
        "boilerplate_dedup": (q_boilerplate_dedup, _SQL_BOILERPLATE_DEDUP),
        "boilerplate_report": (q_boilerplate_report, _SQL_BOILERPLATE_REPORT),
        "repetition_stats": (q_repetition_stats, _SQL_REPETITION_STATS),
        "dup_gram_coverage": (q_dup_gram_coverage, _SQL_DUP_GRAM_COVERAGE),
        "decontaminate": (q_decontaminate, _SQL_DECONTAMINATE),
        "decontaminate_norm": (q_decontaminate_norm, _sql_decontaminate_norm()),
        "incremental_neardup": (q_incremental_neardup,
                                _SQL_INCREMENTAL_NEARDUP),
        "span_dedup": (q_span_dedup, _SQL_SPAN_DEDUP),
        "heavy_hitters": (q_heavy_hitters, _SQL_HEAVY_HITTERS),
        "length_quantiles": (q_length_quantiles, _SQL_LENGTH_QUANTILES),
        "neardup_keep": (q_neardup_keep, _SQL_NEARDUP_KEEP),
        "gopher_filter": (q_gopher_filter, _sql_gopher_filter()),
        "corpus_shuffle": (q_corpus_shuffle, _sql_corpus_shuffle()),
        "redact_pii": (q_redact_pii, _sql_redact_pii()),
        "split_documents": (q_split_documents, _SQL_SPLIT_DOCUMENTS),
        "corpus_overlap": (q_corpus_overlap, _SQL_CORPUS_OVERLAP),
        "corpus_sample": (q_corpus_sample, _sql_corpus_sample()),
        "pack_sequences": (q_pack_sequences, _sql_pack_sequences()),
        "cap_per_group": (q_cap_per_group, _sql_cap_per_group()),
        "token_budget": (q_token_budget, _sql_token_budget()),
        "distinctive_terms": (q_distinctive_terms, _SQL_DISTINCTIVE_TERMS),
        "embed_dedup_keep": (q_embed_dedup_keep, _SQL_EMB_DEDUP_KEEP),
        "incremental_embed_dedup": (q_incremental_embed_dedup,
                                    _SQL_INCREMENTAL_EMBED_DEDUP),
        "unigram_logloss": (q_unigram_logloss, _SQL_UNIGRAM_LOGLOSS),
        "inverted_index": (q_inverted_index, _SQL_INVERTED_INDEX),
        "ngram_containment_pairs": (q_ngram_containment,
                                    _SQL_NGRAM_CONTAINMENT),
        "interleave_sources": (q_interleave_sources,
                               _sql_interleave_sources()),
        "split_assign": (q_split_assign, _sql_split_assign()),
        "split_leakage": (q_split_leakage, _sql_split_leakage()),
        "neardup_keep_best": (q_neardup_keep_best,
                              _SQL_NEARDUP_KEEP_BEST),
        "freq_spectrum": (q_freq_spectrum, _SQL_FREQ_SPECTRUM),
        "oov_rate": (q_oov_rate, _SQL_OOV_RATE),
        "vocab_overlap_kmv": (q_vocab_overlap_kmv,
                              GOLDEN_SQL.get("vocab_overlap_kmv")),
        "vocabulary_stats": (q_vocabulary_stats,
                             _SQL_VOCABULARY_STATS),
        "bm25_topk": (q_bm25_topk, _SQL_BM25_TOPK),
        "bigram_logloss": (q_bigram_logloss, _SQL_BIGRAM_LOGLOSS),
        "dsir_logratio": (q_dsir_logratio, _SQL_DSIR_LOGRATIO),
        "bpe_merge_candidates": (q_bpe_merges, _SQL_BPE_MERGES),
        "kmeans_clusters": (q_kmeans, _sql_kmeans()),
        "kmeans_quality": (q_kmeans_quality, _sql_kmeans_quality()),
        "semdedup_keep": (q_semdedup, _sql_semdedup()),
        "prototypicality": (q_prototypicality, _sql_prototypicality()),
        "d4_keep": (q_d4_keep, _sql_d4_keep()),
        "tfidf_cosine_pairs": (q_tfidf_cosine, _SQL_TFIDF_COSINE),
    }
