"""Similarity-analysis queries: partition agreement, edit similarity.

Extensions beyond the reference surface (SURVEY.md §2.11): analytic
operators a dedup-pipeline operator needs to *evaluate* dedup strategies
against each other — which the reference leaves to offline scripts.
Every query here follows the repo's scale contract: partial combine in
``map_batches``, ONE ``hash_bucket`` shuffle per marginal, vectorized
per-bucket reduce, tiny per-bucket partials to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deduplicator_ray.functions.canonical import canonical_sql_expr
from deduplicator_ray.sources.corpus import CAPTURES_CTE, captures_dataset

# ---------------------------------------------------------------------------
# cluster_agreement: pairwise agreement between two dedup partitions
# ---------------------------------------------------------------------------


def _pairs2(n: np.ndarray) -> int:
    """sum of n-choose-2 over an int64 count vector (python int, exact)."""
    n = n.astype(object)
    return int(((n * (n - 1)) // 2).sum()) if len(n) else 0


def q_cluster_agreement(sf_dir: str):
    """Pairwise agreement between the two exact-dedup partitions the
    engine supports on captures: content identity (``digest``) vs
    canonical-URL identity (``url_canonical``).

    The Rand-style metrics need only cluster SIZES, never materialized
    pairs: pairs_same(P) = sum nC2 over P's cluster sizes.  The joint
    contingency cells are counted with one batch-local partial combine +
    one ``hash_bucket(digest)`` shuffle; because a digest's cells all
    land in one bucket, the digest marginal is computed in the SAME
    reduce.  The url marginal takes a second (pre-combined, narrow)
    shuffle.  Only one tiny partial row per bucket reaches the driver,
    so the shape holds at 10^12 captures.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def cells_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "digest": b["digest"].to_pandas(),
                "url_canonical": b["url_canonical"].to_pandas(),
            }
        )
        g = df.groupby(["digest", "url_canonical"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = caps.map_batches(
        cells_partial, batch_format="pyarrow", batch_size=65536, zero_copy_batch=True
    )

    def digest_final(g: pd.DataFrame) -> pd.DataFrame:
        joint = g.groupby(["digest", "url_canonical"])["n"].sum()
        dsum = joint.groupby(level=0).sum()
        return pd.DataFrame(
            {
                "n_caps": [int(dsum.sum())],
                "pairs_both": [_pairs2(joint.to_numpy())],
                "pairs_digest": [_pairs2(dsum.to_numpy())],
                "n_digest_clusters": [int(len(dsum))],
            }
        )

    dparts = (
        hash_bucket(cells, "digest", 32)
        .groupby("_part")
        .map_groups(digest_final, batch_format="pandas")
        .to_pandas()
    )

    def url_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"url_canonical": b["url_canonical"].to_pandas()})
        g = df.groupby("url_canonical", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    ucounts = caps.map_batches(
        url_partial, batch_format="pyarrow", batch_size=65536, zero_copy_batch=True
    )

    def url_final(g: pd.DataFrame) -> pd.DataFrame:
        usum = g.groupby("url_canonical")["n"].sum()
        return pd.DataFrame(
            {
                "pairs_url": [_pairs2(usum.to_numpy())],
                "n_url_clusters": [int(len(usum))],
            }
        )

    uparts = (
        hash_bucket(ucounts, "url_canonical", 32)
        .groupby("_part")
        .map_groups(url_final, batch_format="pandas")
        .to_pandas()
    )

    n_caps = int(dparts["n_caps"].sum())
    pairs_both = int(dparts["pairs_both"].sum())
    pairs_digest = int(dparts["pairs_digest"].sum())
    pairs_url = int(uparts["pairs_url"].sum())
    pairs_total = n_caps * (n_caps - 1) // 2
    # agreement: pairs co-clustered in both + pairs separated in both
    agree = pairs_total - pairs_digest - pairs_url + 2 * pairs_both
    mk = 1_000_000
    out = pd.DataFrame(
        {
            "n_caps": [n_caps],
            "n_digest_clusters": [int(dparts["n_digest_clusters"].sum())],
            "n_url_clusters": [int(uparts["n_url_clusters"].sum())],
            "pairs_total": [pairs_total],
            "pairs_digest": [pairs_digest],
            "pairs_url": [pairs_url],
            "pairs_both": [pairs_both],
            "rand_micro": [agree * mk // pairs_total if pairs_total else 0],
            "precision_micro": [pairs_both * mk // pairs_url if pairs_url else 0],
            "recall_micro": [pairs_both * mk // pairs_digest if pairs_digest else 0],
        }
    )
    return out.astype("int64")


def _sql_cluster_agreement() -> str:
    uc = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT md5(text) AS dg, {uc} AS ucanon FROM captures),
joint AS (SELECT dg, ucanon, count(*)::BIGINT AS n FROM c GROUP BY 1, 2),
dm AS (SELECT dg, sum(n)::BIGINT AS n FROM joint GROUP BY 1),
um AS (SELECT ucanon, sum(n)::BIGINT AS n FROM joint GROUP BY 1),
agg AS (
  SELECT
    (SELECT sum(n) FROM dm)::BIGINT AS n_caps,
    (SELECT count(*) FROM dm)::BIGINT AS n_digest_clusters,
    (SELECT count(*) FROM um)::BIGINT AS n_url_clusters,
    (SELECT sum((n * (n - 1)) // 2) FROM joint)::BIGINT AS pairs_both,
    (SELECT sum((n * (n - 1)) // 2) FROM dm)::BIGINT AS pairs_digest,
    (SELECT sum((n * (n - 1)) // 2) FROM um)::BIGINT AS pairs_url
)
SELECT n_caps, n_digest_clusters, n_url_clusters,
       (n_caps * (n_caps - 1)) // 2 AS pairs_total,
       pairs_digest, pairs_url, pairs_both,
       CASE WHEN n_caps < 2 THEN 0
            ELSE (((n_caps * (n_caps - 1)) // 2 - pairs_digest - pairs_url
                   + 2 * pairs_both) * 1000000)
                 // ((n_caps * (n_caps - 1)) // 2) END AS rand_micro,
       CASE WHEN pairs_url = 0 THEN 0
            ELSE (pairs_both * 1000000) // pairs_url END AS precision_micro,
       CASE WHEN pairs_digest = 0 THEN 0
            ELSE (pairs_both * 1000000) // pairs_digest END AS recall_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# edit_similarity_pairs: byte-level edit similarity over candidate pairs
# ---------------------------------------------------------------------------

_ES_NGRAM = 3
_ES_NUM, _ES_DEN = 1, 2  # candidate gate: word-3-gram Jaccard >= 1/2


def q_edit_similarity(sf_dir: str):
    """Byte-level Levenshtein similarity for every candidate near-dup
    pair (word-{_ES_NGRAM}-gram Jaccard >= {_ES_NUM}/{_ES_DEN}, the
    provably-complete prefix-filter stage) — the edit-similarity
    verification used by suffix-array dedup pipelines (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" §4).

    Shape: O(n·m) DP runs ONLY on candidate pairs (never all-pairs);
    texts attach via two hash joins where the pair list is the small
    side. sim_micro = (maxlen - dist) * 1e6 // maxlen over UTF-8 byte
    lengths, matching DuckDB levenshtein/strlen semantics exactly."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_jaccard_pairs
    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.stages.substr import levenshtein_bytes

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    # Materialize the candidate pair list (tiny by construction — the
    # prefix filter's output) before the joins: Ray 2.49's hash-join
    # actor pools deadlock against a deep lazy upstream on small CPU
    # counts, and two joins would re-execute the whole jaccard pipeline.
    pairs = (
        ngram_jaccard_pairs(ds, num=_ES_NUM, den=_ES_DEN, ngram=_ES_NGRAM)
        .select_columns(["doc_a", "doc_b"])
        .materialize()
    )

    texts = ds.select_columns(["doc_id", "text"])
    txt = pa.large_string()

    def _ren(new_key: str, new_text: str):
        def g(t: pa.Table) -> pa.Table:
            return pa.table({new_key: t["doc_id"], new_text: t["text"]})

        return texts.map_batches(g, batch_format="pyarrow", zero_copy_batch=True)

    e = hash_join(
        pairs, _ren("doc_a", "text_a"),
        on=("doc_a",), num_partitions=8,
        out_schema={"doc_a": pa.int64(), "doc_b": pa.int64(), "text_a": txt},
    )
    e = hash_join(
        e, _ren("doc_b", "text_b"), on=("doc_b",), num_partitions=8,
        out_schema={"doc_a": pa.int64(), "doc_b": pa.int64(), "text_a": txt, "text_b": txt},
    )

    def f(b: pa.Table) -> pa.Table:
        sa = b["text_a"].to_pylist()
        sb = b["text_b"].to_pylist()
        dist = np.zeros(len(sa), dtype=np.int64)
        sim = np.zeros(len(sa), dtype=np.int64)
        for i, (x, y) in enumerate(zip(sa, sb)):
            xb = (x or "").encode()
            yb = (y or "").encode()
            d = levenshtein_bytes(xb, yb)
            m = max(len(xb), len(yb))
            dist[i] = d
            sim[i] = (m - d) * 1_000_000 // m if m else 1_000_000
        return pa.table(
            {
                "doc_a": b["doc_a"],
                "doc_b": b["doc_b"],
                "lev_dist": pa.array(dist),
                "sim_micro": pa.array(sim),
            }
        )

    return e.map_batches(f, batch_format="pyarrow", batch_size=256)


_SQL_EDIT_SIMILARITY = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         CASE WHEN len(w) >= {_ES_NGRAM}
              THEN list_distinct(list_transform(range(1, len(w) - {_ES_NGRAM - 2}),
                                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [] END AS g
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM grams a JOIN grams b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.g, b.g)) > 0
    AND {_ES_DEN} * len(list_intersect(a.g, b.g))
        >= {_ES_NUM} * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
)
SELECT p.doc_a, p.doc_b,
       levenshtein(da.text, db.text)::BIGINT AS lev_dist,
       CASE WHEN greatest(strlen(da.text), strlen(db.text)) = 0 THEN 1000000
            ELSE ((greatest(strlen(da.text), strlen(db.text))
                   - levenshtein(da.text, db.text)) * 1000000)
                 // greatest(strlen(da.text), strlen(db.text)) END AS sim_micro
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
"""


# ---------------------------------------------------------------------------
# outlier_docs: per-lang robust (median/MAD) length outliers, zero-shuffle
# ---------------------------------------------------------------------------


def _disc_median(vals: np.ndarray, counts: np.ndarray) -> int:
    """DuckDB quantile_disc(x, 0.5) over a value-count histogram:
    sorted[(n-1)//2] (lower median), found by cumulative count."""
    order = np.argsort(vals, kind="stable")
    v, c = vals[order], counts[order]
    n = int(c.sum())
    target = (n - 1) // 2 + 1
    pos = int(np.searchsorted(np.cumsum(c), target))
    return int(v[pos])


def q_outlier_docs(sf_dir: str):
    """Per-language robust length outliers: |n_chars - median| > 3.5 x
    MAD (median absolute deviation), the standard robust z-score gate
    for corpus-anomaly triage.

    ZERO shuffles: exact per-lang median and MAD come from value-count
    histograms — per-batch (lang, n_chars) partial counts merge on the
    driver (cardinality is bounded by #langs x #distinct lengths, tiny
    even at 10^12 docs), then one stateless flagging pass over the
    stream with the per-lang thresholds captured in the task closure
    (broadcast once, not per batch). The outlier gate compares integers
    (10*|dev| > 35*mad), no float drift vs the SQL oracle."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])

    def hist_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": b["lang"].to_pandas(), "n_chars": b["n_chars"].to_pandas()}
        )
        g = df.groupby(["lang", "n_chars"], as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", batch_size=65536,
                       zero_copy_batch=True)
        .to_pandas()
        .groupby(["lang", "n_chars"], as_index=False)["n"].sum()
    )

    stats: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        vals = g["n_chars"].to_numpy(dtype=np.int64)
        cnts = g["n"].to_numpy(dtype=np.int64)
        med = _disc_median(vals, cnts)
        # MAD from the SAME histogram: |value - med| keyed counts
        dev = np.abs(vals - med)
        dd = pd.DataFrame({"d": dev, "n": cnts}).groupby("d", as_index=False)["n"].sum()
        mad = _disc_median(dd["d"].to_numpy(dtype=np.int64), dd["n"].to_numpy(dtype=np.int64))
        stats[str(lang)] = (med, mad)

    def flag(b: pa.Table) -> pa.Table:
        langs = b["lang"].to_pandas()
        nch = b["n_chars"].to_pandas().to_numpy(dtype=np.int64)
        # factorize + integer take instead of a per-row dict .map(lambda)
        codes, uniq = pd.factorize(langs)
        med = np.array([stats[u][0] for u in uniq], dtype=np.int64)[codes]
        mad = np.array([stats[u][1] for u in uniq], dtype=np.int64)[codes]
        dev = nch - med
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "n_chars": b["n_chars"],
                "med_chars": pa.array(med),
                "mad_chars": pa.array(mad),
                "dev": pa.array(dev),
                "is_outlier": pa.array((10 * np.abs(dev) > 35 * mad).astype(np.int64)),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=65536, zero_copy_batch=True)


_SQL_OUTLIER_DOCS = """
WITH st AS (
  SELECT lang, quantile_disc(n_chars, 0.5)::BIGINT AS med FROM documents GROUP BY 1
),
md AS (
  SELECT d.lang, quantile_disc(abs(d.n_chars - s.med), 0.5)::BIGINT AS mad
  FROM documents d JOIN st s USING (lang) GROUP BY 1
)
SELECT d.doc_id, d.lang, d.n_chars,
       s.med AS med_chars, m.mad AS mad_chars,
       (d.n_chars - s.med)::BIGINT AS dev,
       CASE WHEN 10 * abs(d.n_chars - s.med) > 35 * m.mad THEN 1 ELSE 0 END AS is_outlier
FROM documents d JOIN st s USING (lang) JOIN md m ON m.lang = d.lang
"""


def registry_sim():
    return {
        "cluster_agreement": (q_cluster_agreement, _sql_cluster_agreement()),
        "edit_similarity_pairs": (q_edit_similarity, _SQL_EDIT_SIMILARITY),
        "outlier_docs": (q_outlier_docs, _SQL_OUTLIER_DOCS),
    }
