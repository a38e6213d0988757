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
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
        digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "digest": pa.array(digests, pa.string())})

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

# ---------------------------------------------------------------------------
# D2: n-gram Jaccard dedup (exact, lang-blocked; LSH is the scale path)
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[a-z0-9]+")
_NGRAM_N = 3
_JACCARD_NUM = 1  # threshold = _JACCARD_NUM / _JACCARD_DEN (integer compare)
_JACCARD_DEN = 2


def _gram_set(text: str) -> set[str]:
    w = _WORD_RE.findall(text.lower())
    return {" ".join(w[i : i + _NGRAM_N]) for i in range(len(w) - _NGRAM_N + 1)}


def q_ngram_jaccard(sf_dir: str):
    """Pairs (doc_a < doc_b) within a ``lang`` block whose word-3-gram
    Jaccard is >= 0.5, with integer intersection/union sizes.

    Exact variant for the oracle: all-pairs within the blocking key via
    an inverted gram index (cost is O(co-occurring pairs), not O(n^2)).
    At corpus scale the same verify runs behind MinHash/LSH candidates
    (``neardup_clusters``); this query IS the verification kernel."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def pairs(g):
        import collections

        import pandas as pd

        ids = g["doc_id"].to_numpy()
        gsets = [_gram_set(t) for t in g["text"]]
        sizes = [len(s) for s in gsets]
        # inverted index: only docs sharing >=1 gram ever meet
        inv: dict[str, list[int]] = collections.defaultdict(list)
        for i, s in enumerate(gsets):
            for gm in s:
                inv[gm].append(i)
        co: dict[tuple[int, int], int] = collections.Counter()
        for members in inv.values():
            if len(members) < 2:
                continue
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    co[(members[x], members[y])] += 1
        rows = []
        for (i, j), inter in co.items():
            union = sizes[i] + sizes[j] - inter
            if _JACCARD_DEN * inter >= _JACCARD_NUM * union and union > 0:
                a, b = int(ids[i]), int(ids[j])
                if a > b:
                    a, b = b, a
                rows.append((a, b, inter, union))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "n_inter", "n_union"]).astype(
            "int64"
        )

    return ds.groupby("lang").map_groups(pairs, batch_format="pandas")


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

# ---------------------------------------------------------------------------
# D4: similarity search — brute-force cosine top-k
# ---------------------------------------------------------------------------

_TOPK_K = 10
_TOPK_NQ = 8


def q_embed_topk(sf_dir: str):
    """ANN baseline: top-{_TOPK_K} by cosine for the first {_TOPK_NQ}
    vectors as queries; rank ties broken by vec_id (both sides). The
    query matrix is ray.put once; per-batch matmuls prune to local top-k
    so only k * n_blocks * n_queries rows reach the final merge."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from deduplicator_ray.stages.embed import cosine_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qtbl = (
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(pc.less(pc.field("vec_id"), _TOPK_NQ))
        .sort_by("vec_id")
    )
    q = np.stack(qtbl["embedding"].to_pylist()).astype(np.float64)
    out = cosine_topk(ds, q, k=_TOPK_K)
    # query_id is the row index into q == vec_id (sorted 0..NQ-1)
    return out.select(["query_id", "vec_id", "rank"])


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

_WS_CLASS = r"[^ \t\n\r\f\v]+"
# GPT-2-style pre-tokenizer, simplified; RE2-safe (no lookarounds)
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


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


def q_neardup_clusters(sf_dir: str):
    """MinHash -> LSH banding -> verified edges -> connected components
    over ``documents``; cluster id = min doc_id in the cluster.
    Deterministic at fixed MinHashConfig; recall vs the exact-Jaccard
    oracle is pytest-gated (tests/test_neardup.py)."""
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


def q_fingerprint_sketch(sf_dir: str):
    """Winnowing sketch summary per document (fp_count distinct window
    minima + fp_min)."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = fingerprints(ds)
    return out.select_columns(["doc_id", "fp_min", "fp_count"])


def q_lang_id_pred(sf_dir: str):
    """Heuristic language ID vs the table's labeled lang: confusion
    counts (pred, label, n)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from deduplicator_ray.stages.textstats import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    ds = lang_id(ds)
    return ds.groupby(["lang", "lang_pred"]).aggregate(Count(alias_name="n"))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def registry_ext():
    """name -> (callable(sf_dir), oracle_sql | None)."""
    return {
        "dedup_exact_text": (q_dedup_exact_text, _SQL_DEDUP_EXACT_TEXT),
        "ngram_jaccard_pairs": (q_ngram_jaccard, _SQL_NGRAM_JACCARD),
        "embed_dup_pairs": (q_embed_dup_pairs, _SQL_EMB_DUP_PAIRS),
        "embed_topk": (q_embed_topk, _SQL_EMB_TOPK),
        "token_stats": (q_token_stats, _SQL_TOKEN_STATS),
        "quality_stats": (q_quality_stats, _SQL_QUALITY_STATS),
        "neardup_clusters": (q_neardup_clusters, None),
        "simhash_dups": (q_simhash_dups, None),
        "self_similarity": (q_self_similarity, None),
        "fingerprint_sketch": (q_fingerprint_sketch, None),
        "lang_id_pred": (q_lang_id_pred, None),
    }
