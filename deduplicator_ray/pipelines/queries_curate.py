"""Corpus-curation queries: multilingual temperature sampling and
host/section boilerplate templates.

Extensions beyond the reference surface (SURVEY.md §2.11), continuing
the LLM-training-data family in ``queries_ext.py``:

- ``lang_alpha_weights`` — XLM-R / mC4-style temperature rebalancing
  (Conneau et al. 2020, "Unsupervised Cross-lingual Representation
  Learning at Scale", §3: sample languages with p_l ∝ share_l^alpha).
- ``section_template`` — per (host, first-path-segment) common
  prefix/suffix template detection using the order-statistics LCP
  identity: the longest common prefix of a GROUP equals the LCP of its
  lexicographic min and max (any mismatch between min and max bounds
  every middle string).  The group reduce therefore only needs min/max
  — a classic partial-combinable aggregate, no pairwise work.
- ``template_strip`` — boilerplate removal using those templates: the
  template table is tiny (≤ hosts x sections), so it broadcasts via
  ``ray.put`` into a ``map_batches`` lookup instead of shuffling the
  corpus (the reference strips per-record boilerplate in its indexing
  pass; here it is a first-class two-pass operator).

Scale contract: per-block partial combine -> tiny per-key partial rows
-> small driver/broadcast finalize.  No corpus-wide shuffle anywhere in
this module; the only full-corpus pass is the map-side strip.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.functions.textnorm import nfc_arrow
from deduplicator_ray.sources.corpus import CAPTURES_CTE, captures_dataset

_HOST_PAT = r"^https?://(?P<host>[^/]+)"
_SECTION_PAT = r"^https?://[^/]+/(?P<section>[^/?#]+)"

# ---------------------------------------------------------------------------
# lang_alpha_weights: temperature-rebalanced multilingual sampling
# ---------------------------------------------------------------------------

_ALPHA = 0.3  # XLM-R's low-resource-upweighting temperature


def q_lang_alpha_weights(sf_dir: str):
    """Per-language sampling weights for temperature alpha=0.3 over the
    documents table: w_l = share_l^alpha / sum(share_m^alpha), where
    share_l is the language's fraction of corpus characters.

    Shape: one per-block groupby(lang) partial (≤ #langs rows per
    block), driver finalize on the ≤ #langs aggregate — zero shuffle.
    Floats use libm ``pow`` on doubles, the same kernel DuckDB's
    ``pow()`` calls, so the oracle comparison is stable at the value
    hash's 9-decimal rounding."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": b["lang"].to_pandas(),
                           "n_chars": b["n_chars"].to_pandas()})
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        g["n_docs"] = g["n_docs"].astype("int64")
        g["sum_chars"] = g["sum_chars"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    agg = parts.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
    total = float(agg["sum_chars"].sum())
    agg["char_share"] = agg["sum_chars"].astype(float) / total
    pw = agg["char_share"].map(lambda s: math.pow(s, _ALPHA))
    agg["sample_weight"] = pw / pw.sum()
    # how much the policy up/downsamples each language vs natural share
    agg["upsample_factor"] = agg["sample_weight"] / agg["char_share"]
    return agg.astype({"n_docs": "int64", "sum_chars": "int64"})


def _sql_lang_alpha_weights() -> str:
    return f"""
WITH agg AS (
  SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
  FROM documents GROUP BY lang
),
t AS (
  SELECT *,
         sum_chars / (SELECT sum(sum_chars)::DOUBLE FROM agg) AS char_share,
         pow(sum_chars / (SELECT sum(sum_chars)::DOUBLE FROM agg), {_ALPHA})
           AS pw
  FROM agg
)
SELECT lang, n_docs, sum_chars, char_share,
       pw / (SELECT sum(pw) FROM t) AS sample_weight,
       (pw / (SELECT sum(pw) FROM t)) / char_share AS upsample_factor
FROM t
"""


# ---------------------------------------------------------------------------
# section_template: per (host, section) common prefix/suffix templates
# ---------------------------------------------------------------------------


def _lcp_len(a: str, b: str) -> int:
    """Character LCP of two strings (numpy codepoint compare)."""
    n = min(len(a), len(b))
    if n == 0:
        return 0
    xa = np.frombuffer(a[:n].encode("utf-32-le"), dtype=np.uint32)
    xb = np.frombuffer(b[:n].encode("utf-32-le"), dtype=np.uint32)
    neq = np.nonzero(xa != xb)[0]
    return int(neq[0]) if len(neq) else n


_TEMPLATE_COLS = ["host", "section", "n_pages", "prefix_len", "suffix_len",
                  "template_prefix"]


def _template_partials(caps):
    """Per-block partial: groupby (host, section) -> min/max of text and
    of reversed text (+count).  min/max are the only state the LCP
    identity needs, so each block emits ≤ #groups tiny rows."""

    def partial(b: pa.Table) -> pa.Table:
        host = pc.fill_null(
            pc.struct_field(pc.extract_regex(b["url"], _HOST_PAT), "host"), "")
        section = pc.fill_null(
            pc.struct_field(pc.extract_regex(b["url"], _SECTION_PAT),
                            "section"), "")
        text = nfc_arrow(b["text"])
        df = pd.DataFrame({
            "host": host.to_pandas(),
            "section": section.to_pandas(),
            "tmin": text.to_pandas(),
            "rmin": pc.utf8_reverse(text).to_pandas(),
        })
        df["tmax"] = df["tmin"]
        df["rmax"] = df["rmin"]
        g = df.groupby(["host", "section"], as_index=False).agg(
            n_pages=("tmin", "size"), tmin=("tmin", "min"),
            tmax=("tmax", "max"), rmin=("rmin", "min"), rmax=("rmax", "max"))
        g["n_pages"] = g["n_pages"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return caps.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()


def _template_table(sf_dir: str) -> pd.DataFrame:
    """(host, section) template table: n_pages, prefix/suffix lengths,
    and the first 24 chars of the common prefix.  Final combine + the
    O(#groups) LCP pass run on the pre-aggregated ≤ hosts x sections
    rows (two strings per group), mirroring the repo's host_stats
    driver-finalize shape.

    Unicode semantics: text is NFC-normalized FIRST on both engines
    (``functions.textnorm.nfc_arrow`` here — pyarrow's own
    ``utf8_normalize`` cannot recompose — and ``nfc_normalize`` in the
    DuckDB oracle), so combining sequences with a precomposed form
    collapse to one codepoint and prefix/suffix lengths count NFC
    codepoints — ``'xe\\u0301'`` and ``'ye\\u0301'`` share a 1-codepoint
    suffix (``'é'``), matching DuckDB's grapheme-aware ``reverse()`` on
    normalized text (asserted by
    tests/test_curate2.py::test_template_suffix_combining_chars).
    Sequences with no precomposed form (rare) still count their
    combining marks as codepoints."""
    caps = captures_dataset(sf_dir)
    parts = _template_partials(caps)
    agg = parts.groupby(["host", "section"], as_index=False).agg(
        n_pages=("n_pages", "sum"), tmin=("tmin", "min"),
        tmax=("tmax", "max"), rmin=("rmin", "min"), rmax=("rmax", "max"))
    agg["prefix_len"] = [
        _lcp_len(a, b) for a, b in zip(agg["tmin"], agg["tmax"])]
    agg["suffix_len"] = [
        _lcp_len(a, b) for a, b in zip(agg["rmin"], agg["rmax"])]
    agg["template_prefix"] = [
        t[:min(p, 24)] for t, p in zip(agg["tmin"], agg["prefix_len"])]
    out = agg[_TEMPLATE_COLS].copy()
    out["prefix_len"] = out["prefix_len"].astype("int64")
    out["suffix_len"] = out["suffix_len"].astype("int64")
    return out


def q_section_template(sf_dir: str):
    return _template_table(sf_dir)


_SQL_TEMPLATE_CTE = f"""
k AS (
  SELECT regexp_extract(url, '{_HOST_PAT}', 1) AS host,
         regexp_extract(url, '{_SECTION_PAT}', 1) AS section,
         nfc_normalize(text) AS text,
         reverse(nfc_normalize(text)) AS rtext
  FROM captures
),
g AS (
  SELECT host, section, count(*) AS n_pages,
         min(text) AS tmin, max(text) AS tmax,
         min(rtext) AS rmin, max(rtext) AS rmax
  FROM k GROUP BY 1, 2
),
mx AS (
  SELECT coalesce(max(least(length(tmin), length(tmax))), 0) AS m FROM g
),
-- DuckDB's range() cannot take correlated (per-row) bounds or
-- subquery bounds, so probe every position up to a 1e6-char cap
-- (>= any real page; the engine side has no such cap), restricted to
-- the global max comparable length and then per group in the aggregate
probe AS (
  SELECT g.host, g.section,
         min(CASE WHEN t.i <= least(length(g.tmin), length(g.tmax))
                   AND substring(g.tmin, t.i::INT, 1)
                       <> substring(g.tmax, t.i::INT, 1)
                  THEN t.i END) AS pmis,
         min(CASE WHEN t.i <= least(length(g.rmin), length(g.rmax))
                   AND substring(g.rmin, t.i::INT, 1)
                       <> substring(g.rmax, t.i::INT, 1)
                  THEN t.i END) AS smis
  FROM g, mx, (SELECT range AS i FROM range(1, 1000001)) t
  WHERE t.i <= mx.m
  GROUP BY 1, 2
),
tpl AS (
  SELECT g.host, g.section, g.n_pages,
         CAST(coalesce(p.pmis - 1,
                       least(length(g.tmin), length(g.tmax))) AS BIGINT)
           AS prefix_len,
         CAST(coalesce(p.smis - 1,
                       least(length(g.rmin), length(g.rmax))) AS BIGINT)
           AS suffix_len,
         g.tmin
  FROM g LEFT JOIN probe p USING (host, section)
)"""


def _sql_section_template() -> str:
    return f"""
WITH {CAPTURES_CTE},
{_SQL_TEMPLATE_CTE}
SELECT host, section, n_pages, prefix_len, suffix_len,
       substring(tmin, 1, least(prefix_len, 24)::INT) AS template_prefix
FROM tpl
"""


# ---------------------------------------------------------------------------
# template_strip: remove detected templates from every page
# ---------------------------------------------------------------------------


def q_template_strip(sf_dir: str):
    """Per-capture boilerplate strip using the (host, section) template
    table: pages in a multi-page group lose prefix_len + suffix_len
    chars (clamped at 0 for pages the template covers entirely);
    singleton groups are left untouched (their 'template' is the whole
    page).  The template table broadcasts once via ``ray.put``; the
    corpus pass is map-only — no shuffle."""
    import ray

    tpl = _template_table(sf_dir)
    tpl = tpl[tpl["n_pages"] >= 2]
    strip_of = {(h, s): int(p + x) for h, s, p, x in zip(
        tpl["host"], tpl["section"], tpl["prefix_len"], tpl["suffix_len"])}
    ref = ray.put(strip_of)

    caps = captures_dataset(sf_dir)

    def f(b: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        host = pc.fill_null(
            pc.struct_field(pc.extract_regex(b["url"], _HOST_PAT), "host"), "")
        section = pc.fill_null(
            pc.struct_field(pc.extract_regex(b["url"], _SECTION_PAT),
                            "section"), "")
        orig_len = pc.utf8_length(
            nfc_arrow(b["text"])).to_numpy(zero_copy_only=False)
        keys = list(zip(host.to_pylist(), section.to_pylist()))
        strip = np.fromiter((lookup.get(k, 0) for k in keys),
                            dtype=np.int64, count=len(keys))
        cleaned = np.maximum(orig_len.astype(np.int64) - strip, 0)
        return pa.table({
            "doc_id": b["doc_id"],
            "rep": b["rep"],
            "host": pa.array([k[0] for k in keys], pa.string()),
            "section": pa.array([k[1] for k in keys], pa.string()),
            "orig_len": pa.array(orig_len.astype(np.int64)),
            "cleaned_len": pa.array(cleaned),
        })

    return caps.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_template_strip() -> str:
    return f"""
WITH {CAPTURES_CTE},
{_SQL_TEMPLATE_CTE}
SELECT c.doc_id, c.rep,
       regexp_extract(c.url, '{_HOST_PAT}', 1) AS host,
       regexp_extract(c.url, '{_SECTION_PAT}', 1) AS section,
       length(nfc_normalize(c.text))::BIGINT AS orig_len,
       greatest(length(nfc_normalize(c.text))
                - CASE WHEN t.n_pages >= 2
                       THEN t.prefix_len + t.suffix_len ELSE 0 END,
                0)::BIGINT AS cleaned_len
FROM captures c
LEFT JOIN tpl t
  ON t.host = regexp_extract(c.url, '{_HOST_PAT}', 1)
 AND t.section = regexp_extract(c.url, '{_SECTION_PAT}', 1)
"""


# ---------------------------------------------------------------------------
# kcenter_sample: greedy farthest-point diversity coreset
# ---------------------------------------------------------------------------

_KC_K = 8


def q_kcenter_sample(sf_dir: str):
    """Greedy k-center diversity sample over the embeddings table
    (stages/embed.py:kcenter_sample): k={k} farthest-point picks,
    euclidean, ties to the smallest vec_id."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import kcenter_sample

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return kcenter_sample(ds, k=_KC_K)


def _sql_kcenter_sample() -> str:
    """The greedy rounds unrolled as MATERIALIZED chained CTEs: round i
    scans emb for the point (not yet chosen) with max min-distance to
    the previous chosen set."""
    sql = """
WITH emb AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT 0 AS rnd, vec_id, v, CAST(0 AS BIGINT) AS radius_micro
  FROM emb WHERE vec_id = (SELECT min(vec_id) FROM emb)
)"""
    prev_all = "c0"
    for i in range(1, _KC_K):
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT e.vec_id, e.v,
         (SELECT min(list_distance(e.v, c.v)) FROM {prev_all} c) AS d
  FROM emb e
  WHERE e.vec_id NOT IN (SELECT vec_id FROM {prev_all})
),
p{i} AS MATERIALIZED (
  SELECT {i} AS rnd, vec_id, v,
         CAST(floor(d * 1000000 + 0.5) AS BIGINT) AS radius_micro
  FROM d{i} ORDER BY d DESC, vec_id LIMIT 1
),
c{i} AS MATERIALIZED (
  SELECT * FROM {prev_all} UNION ALL SELECT * FROM p{i}
)"""
        prev_all = f"c{i}"
    sql += f"""
SELECT rnd AS round, vec_id, radius_micro FROM {prev_all}"""
    return sql


# ---------------------------------------------------------------------------
# knn_label_noise: k-NN label-disagreement audit (confident-learning lite)
# ---------------------------------------------------------------------------

_KNN_NOISE_K = 5


def q_knn_label_noise(sf_dir: str):
    """Label-quality audit over the embeddings table: each vector's
    label vs the majority label of its {k} exact cosine nearest
    neighbors (self excluded; neighbor ties to the smaller vec_id,
    majority ties to the smaller label) — the k-NN disagreement signal
    confident-learning pipelines use to rank suspect labels.

    Shape: the corpus-as-query broadcast top-k (stages/embed.py:
    cosine_topk, per-block local prune) gives the 5n edge list; labels
    attach via hash joins (never a broadcast of the corpus-sized label
    column); majority is a tiny per-query reduce."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from deduplicator_ray.stages.embed import cosine_topk
    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.util import auto_partitions

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).sort_by("vec_id")
    q = np.stack(qtbl["embedding"].to_pylist()).astype(np.float64)
    edges = cosine_topk(ds, q, k=_KNN_NOISE_K + 1).to_pandas()
    # cosine_topk's query_id is the 0-based row index into q, NOT a
    # vec_id; map it through the sorted qtbl ids BEFORE the self-filter
    # so non-contiguous vec_id spaces stay correct
    qids = qtbl["vec_id"].to_numpy().astype(np.int64)
    edges["query_id"] = qids[edges["query_id"].to_numpy(np.int64)]
    edges = edges[edges["query_id"] != edges["vec_id"]]
    edges = edges.sort_values(["query_id", "rank"], ignore_index=True)
    edges["rank"] = edges.groupby("query_id").cumcount() + 1
    edges = edges[edges["rank"] <= _KNN_NOISE_K]

    P = auto_partitions()
    labels = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "label"])
    e = rd.from_pandas(edges[["query_id", "vec_id"]].astype("int64"))
    j = hash_join(e, labels, on=("vec_id",), num_partitions=P,
                  out_schema={"query_id": pa.int64(), "vec_id": pa.int64(),
                              "label": pa.int32()}).to_pandas()
    votes = j.groupby(["query_id", "label"], as_index=False).size()
    votes = votes.sort_values(["query_id", "size", "label"],
                              ascending=[True, False, True])
    knn = votes.drop_duplicates("query_id")[["query_id", "label"]]
    knn = knn.rename(columns={"query_id": "vec_id", "label": "knn_label"})
    own = labels.to_pandas()
    out = own.merge(knn, on="vec_id", how="inner")
    out["label"] = out["label"].astype("int64")
    out["knn_label"] = out["knn_label"].astype("int64")
    out["agree"] = (out["label"] == out["knn_label"]).astype("int64")
    return out[["vec_id", "label", "knn_label", "agree"]].astype("int64")


def _sql_knn_label_noise() -> str:
    return f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS v
  FROM embeddings
),
nn AS MATERIALIZED (
  SELECT a.vec_id AS q, b.label AS nb_label,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id) AS rn
  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id
),
votes AS (
  SELECT q, nb_label, count(*) AS c FROM nn
  WHERE rn <= {_KNN_NOISE_K} GROUP BY 1, 2
),
mv AS (
  SELECT q, nb_label AS knn_label FROM (
    SELECT q, nb_label,
           row_number() OVER (PARTITION BY q
                              ORDER BY c DESC, nb_label) AS rn
    FROM votes) WHERE rn = 1
)
SELECT e.vec_id, e.label, m.knn_label,
       CAST(e.label = m.knn_label AS BIGINT) AS agree
FROM emb e JOIN mv m ON m.q = e.vec_id
"""


# ---------------------------------------------------------------------------
# decontaminate_embed: semantic (embedding-space) benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_EMB_THRESHOLD = 0.85


def q_decontaminate_embed(sf_dir: str):
    """Semantic decontamination over the embeddings table: vectors with
    vec_id % 20 == 0 play the held-out benchmark; every other vector is
    flagged when its max cosine to ANY benchmark vector reaches
    {threshold} — the embedding-space complement of the n-gram
    ``decontaminate`` (same 1-in-20 split convention).

    Shape: the benchmark side is the small side by construction, so it
    broadcasts once via ``ray.put`` and the train corpus streams through
    one map-only matmul pass — no shuffle, no corpus materialization.
    Reports the nearest benchmark id (ties to the smaller id) and the
    cosine in 1e-6 integer units so the DuckDB mirror compares exactly."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    # sorted bench ids: np.argmax's first-occurrence rule then IS the
    # smallest-id tie break the SQL mirror uses
    bench_tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"]
                              ).sort_by("vec_id")
    bm = bench_tbl["vec_id"].to_numpy() % 20 == 0
    bench_ids = bench_tbl["vec_id"].to_numpy()[bm].astype(np.int64)
    B = np.stack(bench_tbl["embedding"].to_pylist()).astype(np.float64)[bm]
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    ref = ray.put((bench_ids, Bn))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def f(b: pa.Table) -> pa.Table:
        ids_b, bn = ray.get(ref)
        ids = np.asarray(b["vec_id"], dtype=np.int64)
        keep = ids % 20 != 0
        ids = ids[keep]
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "nn_bench_id": pa.array([], pa.int64()),
                             "cos_micro": pa.array([], pa.int64()),
                             "is_contaminated": pa.array([], pa.int64())})
        m = np.stack(b["embedding"].to_pylist()).astype(np.float64)[keep]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = mn @ bn.T
        best = np.argmax(cos, axis=1)  # ties -> lowest index = lowest id
        bc = cos[np.arange(len(ids)), best]
        return pa.table({
            "vec_id": pa.array(ids),
            "nn_bench_id": pa.array(ids_b[best]),
            "cos_micro": pa.array(np.floor(bc * 1e6 + 0.5).astype(np.int64)),
            "is_contaminated": pa.array(
                (bc >= _DECON_EMB_THRESHOLD).astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_decontaminate_embed() -> str:
    return f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
bench AS MATERIALIZED (SELECT * FROM emb WHERE vec_id % 20 = 0),
train AS (SELECT * FROM emb WHERE vec_id % 20 <> 0),
nn AS (
  SELECT t.vec_id, b.vec_id AS nn_bench_id,
         list_cosine_similarity(t.v, b.v) AS c,
         row_number() OVER (PARTITION BY t.vec_id
                            ORDER BY list_cosine_similarity(t.v, b.v) DESC,
                                     b.vec_id) AS rn
  FROM train t JOIN bench b ON true
)
SELECT vec_id, nn_bench_id,
       CAST(floor(c * 1000000 + 0.5) AS BIGINT) AS cos_micro,
       CAST(c >= {_DECON_EMB_THRESHOLD} AS BIGINT) AS is_contaminated
FROM nn WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# greedy_coverage_sample: submodular (max-coverage) document selection
# ---------------------------------------------------------------------------

_COV_K = 6


def q_greedy_coverage_sample(sf_dir: str):
    """Greedy maximum-coverage document selection (the classic (1-1/e)
    submodular greedy; cf. Nemhauser, Wolsey & Fisher 1978): {k} rounds,
    each picking the document with the most distinct words NOT yet
    covered by previous picks (ties to the smaller doc_id) — the
    vocabulary-coverage flavor of data-subset selection.

    Coverage units are word BIGRAMS (the unigram vocabulary of this
    corpus saturates after one pick; bigrams keep the marginal-gain
    structure non-trivial).  The greedy stops early once the best
    marginal gain is zero, the standard max-coverage termination.

    Shape per round: the covered-bigram set (bigrams of ≤ {k} docs,
    tiny) ships in the task closure; each block computes per-doc
    uncovered-distinct counts vectorized (split -> explode -> shift ->
    isin) and emits ONE winner row carrying its uncovered bigrams, so
    the driver only compares #blocks candidates.  ≤ k passes, no
    shuffle.  Returns (round, doc_id, gain)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    covered: set[str] = set()
    out = []
    for rnd in range(_COV_K):
        cov = frozenset(covered)
        taken = frozenset(r[1] for r in out)

        def win_partial(b: pa.Table, *, _cov=cov, _t=taken) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], pa.int64()),
                "gain": pa.array([], pa.int64()),
                "words": pa.array([], pa.list_(pa.string()))})
            df = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                               "text": b["text"].to_pandas()})
            if _t:
                df = df[~df["doc_id"].isin(_t)]
            if not len(df):
                return empty
            w = df.assign(word=df["text"].fillna("").str.split(" ")
                          ).explode("word")
            nxt = w["word"].shift(-1)
            same = w["doc_id"] == w["doc_id"].shift(-1)
            w = w.assign(word=w["word"] + "\x1f" + nxt)[same]
            w = w[["doc_id", "word"]].drop_duplicates()
            if _cov:
                w = w[~w["word"].isin(_cov)]
            if not len(w):
                return empty
            gain = w.groupby("doc_id").size()
            g = gain.sort_index().reset_index(name="gain")
            g = g.sort_values(["gain", "doc_id"], ascending=[False, True])
            top = int(g["doc_id"].iloc[0])
            words = w.loc[w["doc_id"] == top, "word"].tolist()
            return pa.table({
                "doc_id": pa.array([top], pa.int64()),
                "gain": pa.array([int(g["gain"].iloc[0])], pa.int64()),
                "words": pa.array([words], pa.list_(pa.string())),
            })

        cand = ds.map_batches(win_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
        if not len(cand):
            break
        cand = cand.sort_values(["gain", "doc_id"],
                                ascending=[False, True], ignore_index=True)
        doc, gain = int(cand["doc_id"][0]), int(cand["gain"][0])
        if gain <= 0:
            break
        covered.update(cand["words"][0])
        out.append((rnd, doc, gain))
    return pd.DataFrame(out, columns=["round", "doc_id", "gain"]
                        ).astype("int64")


def _sql_greedy_coverage_sample() -> str:
    sql = """
WITH ex AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
),
pos AS (SELECT doc_id, unnest(w) AS tok,
               unnest(range(1, len(w) + 1)) AS ord FROM ex),
wd AS MATERIALIZED (
  SELECT DISTINCT a.doc_id, a.tok || chr(31) || b.tok AS word
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
)"""
    chosen: list[str] = []
    prev_cov = None
    for i in range(_COV_K):
        not_chosen = (f"WHERE doc_id NOT IN (SELECT doc_id FROM chosen{i - 1})"
                      if chosen else "")
        not_cov = (f"AND word NOT IN (SELECT word FROM cov{i - 1})"
                   if prev_cov else "")
        sql += f""",
g{i} AS MATERIALIZED (
  SELECT doc_id, count(*) AS gain FROM wd
  {not_chosen} {not_cov}
  GROUP BY doc_id),
p{i} AS MATERIALIZED (
  SELECT {i} AS rnd, doc_id, gain FROM g{i}
  ORDER BY gain DESC, doc_id LIMIT 1),
chosen{i} AS MATERIALIZED (
  {"SELECT doc_id FROM chosen" + str(i - 1) + " UNION ALL " if chosen else ""}
  SELECT doc_id FROM p{i}),
cov{i} AS MATERIALIZED (
  SELECT DISTINCT word FROM wd
  WHERE doc_id IN (SELECT doc_id FROM chosen{i}))"""
        chosen.append(f"p{i}")
        prev_cov = f"cov{i}"
    union = " UNION ALL ".join(f"SELECT * FROM {p}" for p in chosen)
    sql += f"""
SELECT rnd AS round, doc_id, gain FROM ({union})"""
    return sql


# ---------------------------------------------------------------------------
# closest_capture: Wayback-style closest-timestamp lookup per url
# ---------------------------------------------------------------------------

_CLOSEST_EPOCH = 1_700_025_000  # mid-corpus probe instant


def q_closest_capture(sf_dir: str):
    """The Wayback Machine's 'closest' lookup as a corpus-wide operator:
    for every url, the capture whose warc_ts is nearest to the probe
    instant (ties to the EARLIER capture) — per-block partial winner +
    one hash-bucket final reduce (argmin under a total order decomposes
    over partitions)."""
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        ts = b["warc_ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        sec = ts // 1_000_000
        dist = np.abs(sec - _CLOSEST_EPOCH)
        df = pd.DataFrame({"url": b["url"].to_pandas(), "ts_epoch": sec,
                           "dist_s": dist})
        df = df.sort_values(["url", "dist_s", "ts_epoch"],
                            ignore_index=True)
        return pa.Table.from_pandas(df.drop_duplicates("url"),
                                    preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "dist_s", "ts_epoch"], ignore_index=True)
        g = g.drop_duplicates("url")
        return g[["url", "ts_epoch", "dist_s"]].astype(
            {"ts_epoch": "int64", "dist_s": "int64"})

    parts = caps.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (hash_bucket(parts, "url", 32).groupby("_part")
            .map_groups(final, batch_format="pandas"))


def _sql_closest_capture() -> str:
    return f"""
WITH {CAPTURES_CTE},
d AS (
  SELECT url, ts_epoch,
         abs(ts_epoch - {_CLOSEST_EPOCH}) AS dist_s
  FROM captures
)
SELECT url, ts_epoch, dist_s FROM (
  SELECT *, row_number() OVER (PARTITION BY url
                               ORDER BY dist_s, ts_epoch) AS rn
  FROM d) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# url_template_census: URL templating (digit-run collapse) census
# ---------------------------------------------------------------------------


def q_url_template_census(sf_dir: str):
    """Crawler-side URL templating: collapse digit runs to 'N'
    (``/p/123`` and ``/p/456`` share a template) and census each
    template's traffic — the blocking key crawl planners use to spot
    parameterized page families.  Distinct-url counts are NOT additive
    across blocks, so the partial keeps (template, url) granularity
    (pre-summed per block) and one hash-bucket reduce per template
    finishes both counts exactly."""
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        tpl = pc.replace_substring_regex(b["url"], r"[0-9]+", "N")
        df = pd.DataFrame({"url_template": tpl.to_pandas(),
                           "url": b["url"].to_pandas()})
        g = df.groupby(["url_template", "url"], as_index=False).size()
        g = g.rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("url_template", as_index=False).agg(
            n_captures=("c", "sum"), n_urls=("url", "nunique"))
        return h.astype({"n_captures": "int64", "n_urls": "int64"})

    parts = caps.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (hash_bucket(parts, "url_template", 32).groupby("_part")
            .map_groups(final, batch_format="pandas"))


def _sql_url_template_census() -> str:
    return f"""
WITH {CAPTURES_CTE}
SELECT regexp_replace(url, '[0-9]+', 'N', 'g') AS url_template,
       count(*) AS n_captures,
       count(DISTINCT url) AS n_urls
FROM captures GROUP BY 1
"""


# ---------------------------------------------------------------------------
# host_trend: per-host capture-rate trend (integer-exact regression)
# ---------------------------------------------------------------------------


def q_host_trend(sf_dir: str):
    """Per-host crawl-activity trend: least-squares slope of captures
    per day over the host's observed days (the crawl-budget forecasting
    signal).  Sufficient statistics (n, Σx, Σy, Σxy, Σx²) are exact
    int64 partials combined per block and reduced once per host, so the
    ONLY float op is the final num/den division — the same two integers
    divide on the DuckDB side, making slope_ppm bit-stable.  Hosts seen
    on a single day are excluded (slope undefined)."""
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], _HOST_PAT)
        host = pc.fill_null(pc.struct_field(m, "host"), "")
        ts = b["warc_ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        day = (ts // 1_000_000) // 86_400
        df = pd.DataFrame({"host": host.to_pandas(), "day": day})
        g = df.groupby(["host", "day"], as_index=False).size()
        g = g.rename(columns={"size": "y"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for host, sub in g.groupby("host"):
            d = sub.groupby("day")["y"].sum()
            if len(d) < 2:
                continue
            x = d.index.to_numpy(dtype=object)  # python ints: exact
            y = d.to_numpy(dtype=object)
            n = len(d)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            slope_ppm = int(np.floor(1e6 * float(num) / float(den) + 0.5))
            rows.append((host, n, int(sy), slope_ppm))
        return pd.DataFrame(rows, columns=["host", "n_days", "n_captures",
                                           "slope_ppm"]).astype(
            {"n_days": "int64", "n_captures": "int64", "slope_ppm": "int64"})

    parts = caps.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (hash_bucket(parts, "host", 32).groupby("_part")
            .map_groups(final, batch_format="pandas"))


def _sql_host_trend() -> str:
    return f"""
WITH {CAPTURES_CTE},
d AS (
  SELECT regexp_extract(url, '{_HOST_PAT}', 1) AS host,
         ts_epoch // 86400 AS day, count(*)::BIGINT AS y
  FROM captures GROUP BY 1, 2
),
s AS (
  SELECT host, count(*)::BIGINT AS n, sum(day)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(day * y)::BIGINT AS sxy,
         sum(day * day)::BIGINT AS sxx
  FROM d GROUP BY host
)
SELECT host, n AS n_days, sy AS n_captures,
       CAST(floor(1000000.0 * (n * sxy - sx * sy)
                  / (n * sxx - sx * sx) + 0.5) AS BIGINT) AS slope_ppm
FROM s WHERE n >= 2
"""


def q_template_dup_rate(sf_dir: str):
    """Content staleness per URL template: for each digit-collapsed url
    family, how many captures vs how many DISTINCT content digests —
    dup_ppm near 1e6 marks parameterized families that serve identical
    content (crawler skip / canonicalization candidates).  Same
    (template, key) partial + one hash-bucket reduce shape as
    ``url_template_census``; distinct digests are exact, never
    sketched."""
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        tpl = pc.replace_substring_regex(b["url"], r"[0-9]+", "N")
        df = pd.DataFrame({"url_template": tpl.to_pandas(),
                           "digest": b["digest"].to_pandas()})
        g = df.groupby(["url_template", "digest"], as_index=False).size()
        g = g.rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("url_template", as_index=False).agg(
            n_captures=("c", "sum"), n_digests=("digest", "nunique"))
        h["dup_ppm"] = ((h["n_captures"] - h["n_digests"]) * 1_000_000
                        // h["n_captures"])
        return h.astype({"n_captures": "int64", "n_digests": "int64",
                         "dup_ppm": "int64"})

    parts = caps.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (hash_bucket(parts, "url_template", 32).groupby("_part")
            .map_groups(final, batch_format="pandas"))


def _sql_template_dup_rate() -> str:
    return f"""
WITH {CAPTURES_CTE}
SELECT regexp_replace(url, '[0-9]+', 'N', 'g') AS url_template,
       count(*) AS n_captures,
       count(DISTINCT md5(text)) AS n_digests,
       (count(*) - count(DISTINCT md5(text))) * 1000000 // count(*)
         AS dup_ppm
FROM captures GROUP BY 1
"""


# ---------------------------------------------------------------------------
# c4_filter: the C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2)
# ---------------------------------------------------------------------------
#
# The documents table is single-line word soup, so BOTH engines first
# derive the same deterministic multi-line view (the CAPTURES_CTE
# pattern): words chunk into lines of (doc_id % 5 + 3) words; every 4th
# line is left without terminal punctuation (plants the punctuation
# rule); doc_id % 13 injects 'javascript' into line 1, % 19 'lorem
# ipsum' into line 0, % 17 a '{' into line 2.  Then the C4 rules:
#
#   line kept  iff it ends in a terminal mark (. ! ? ") AND has >= 5
#              whitespace words AND does not contain 'javascript' (ci);
#   page kept  iff >= 3 kept lines AND the page contains neither
#              'lorem ipsum' (ci) nor '{'.
#
# Output: per doc (n_lines, n_kept, keep, reason, cleaned_md5) where
# cleaned_md5 is md5 of the kept lines joined by \n (DuckDB md5() on
# the oracle side), reason precedence lorem_ipsum > brace >
# too_few_sentences > kept.


def q_c4_filter(sf_dir: str):
    """C4 cleaning filter over the derived multi-line view (module
    comment above).  Map-only: one pass, per-batch pandas line table
    (explode by word position // k), vectorized .str rules, groupby-doc
    reduce — no shuffle; the oracle recomputes the identical derivation
    + rules in SQL."""
    import hashlib

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": b["doc_id"].to_pandas(),
                           "text": b["text"].to_pandas().fillna("")})
        df["words"] = df["text"].str.split(" ")  # C-level split
        ex = df[["doc_id"]].copy()
        ex["k"] = (ex["doc_id"] % 5 + 3).astype("int64")
        ex = ex.join(df["words"]).explode("words", ignore_index=True)
        # empty tokens (double spaces / empty text) drop AFTER the
        # explode — vectorized, and positions then match the SQL
        # list_filter-before-slice ordering
        ex = ex[ex["words"].notna() & (ex["words"] != "")]
        docs_out = df[["doc_id"]].copy()
        if len(ex):
            ex["pos"] = ex.groupby("doc_id").cumcount()
            ex["line"] = ex["pos"] // ex["k"]
            lines = (ex.groupby(["doc_id", "line"], sort=True)["words"]
                     .agg(" ".join).reset_index(name="core"))
            d = lines["doc_id"]
            i = lines["line"]
            lines.loc[(d % 13 == 0) & (i == 1), "core"] += " javascript"
            lines.loc[(d % 19 == 0) & (i == 0), "core"] += " lorem ipsum"
            lines.loc[(d % 17 == 0) & (i == 2), "core"] += " {x}"
            term = (i % 4) != 3
            lines["out"] = np.where(term, lines["core"] + ".", lines["core"])
            nwords = lines["out"].str.split().str.len()
            kept = (lines["out"].str.endswith((".", "!", "?", '"'))
                    & (nwords >= 5)
                    & ~lines["out"].str.lower().str.contains("javascript",
                                                             regex=False))
            lines["kept"] = kept
            agg = lines.groupby("doc_id").agg(
                n_lines=("out", "size"), n_kept=("kept", "sum"))
            ktext = (lines[lines["kept"]]
                     .groupby("doc_id")["out"].agg("\n".join))
            page = lines.groupby("doc_id")["out"].agg("\n".join)
            docs_out = docs_out.merge(agg, on="doc_id", how="left")
            docs_out["page_text"] = docs_out["doc_id"].map(page).fillna("")
            docs_out["ktext"] = docs_out["doc_id"].map(ktext).fillna("")
        else:
            docs_out["n_lines"] = 0
            docs_out["n_kept"] = 0
            docs_out["page_text"] = ""
            docs_out["ktext"] = ""
        docs_out["n_lines"] = docs_out["n_lines"].fillna(0).astype("int64")
        docs_out["n_kept"] = docs_out["n_kept"].fillna(0).astype("int64")
        low = docs_out["page_text"].str.lower()
        lorem = low.str.contains("lorem ipsum", regex=False)
        brace = docs_out["page_text"].str.contains("{", regex=False)
        few = docs_out["n_kept"] < 3
        docs_out["reason"] = np.select(
            [lorem, brace, few], ["lorem_ipsum", "brace", "too_few_sentences"],
            default="kept")
        docs_out["keep"] = (docs_out["reason"] == "kept").astype("int64")
        docs_out["cleaned_md5"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in docs_out["ktext"]]
        out = docs_out[["doc_id", "n_lines", "n_kept", "keep", "reason",
                        "cleaned_md5"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_c4_filter() -> str:
    return """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w,
         doc_id % 5 + 3 AS k
  FROM documents
),
ln AS (
  SELECT doc_id, k, i.i AS line,
         array_to_string(list_slice(w, i.i * k + 1,
                                    least((i.i + 1) * k, len(w))), ' ') AS core
  FROM d, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(w)::DOUBLE / k) AS BIGINT))) AS i
  ) i
  WHERE len(w) > 0
),
dec AS (
  SELECT doc_id, line,
         core
         || CASE WHEN doc_id % 13 = 0 AND line = 1 THEN ' javascript' ELSE '' END
         || CASE WHEN doc_id % 19 = 0 AND line = 0 THEN ' lorem ipsum' ELSE '' END
         || CASE WHEN doc_id % 17 = 0 AND line = 2 THEN ' {x}' ELSE '' END
           AS core2
  FROM ln
),
o AS (
  SELECT doc_id, line,
         CASE WHEN line % 4 <> 3 THEN core2 || '.' ELSE core2 END AS out
  FROM dec
),
r AS (
  SELECT doc_id, line, out,
         (regexp_matches(out, '[.!?\"]$')
          AND len(list_filter(string_split_regex(out, '\\s+'), x -> x <> '')) >= 5
          AND NOT contains(lower(out), 'javascript')) AS kept
  FROM o
),
agg AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_lines,
         sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         contains(lower(string_agg(out, chr(10) ORDER BY line)),
                  'lorem ipsum') AS lorem,
         contains(string_agg(out, chr(10) ORDER BY line), '{') AS brace,
         md5(COALESCE(string_agg(CASE WHEN kept THEN out END, chr(10)
                                 ORDER BY line), '')) AS cleaned_md5
  FROM r GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_lines, 0) AS n_lines,
       COALESCE(a.n_kept, 0) AS n_kept,
       CASE WHEN COALESCE(a.lorem, false) THEN 'lorem_ipsum'
            WHEN COALESCE(a.brace, false) THEN 'brace'
            WHEN COALESCE(a.n_kept, 0) < 3 THEN 'too_few_sentences'
            ELSE 'kept' END AS reason,
       CASE WHEN NOT COALESCE(a.lorem, false) AND NOT COALESCE(a.brace, false)
                 AND COALESCE(a.n_kept, 0) >= 3
            THEN 1 ELSE 0 END::BIGINT AS keep,
       COALESCE(a.cleaned_md5, md5('')) AS cleaned_md5
FROM d LEFT JOIN agg a USING (doc_id)
"""


def registry_curate():
    """name -> (callable(sf_dir) -> result, oracle_sql | None)."""
    return {
        "lang_alpha_weights": (q_lang_alpha_weights,
                               _sql_lang_alpha_weights()),
        "section_template": (q_section_template, _sql_section_template()),
        "template_strip": (q_template_strip, _sql_template_strip()),
        "kcenter_sample": (q_kcenter_sample, _sql_kcenter_sample()),
        "knn_label_noise": (q_knn_label_noise, _sql_knn_label_noise()),
        "decontaminate_embed": (q_decontaminate_embed,
                                _sql_decontaminate_embed()),
        "greedy_coverage_sample": (q_greedy_coverage_sample,
                                   _sql_greedy_coverage_sample()),
        "closest_capture": (q_closest_capture, _sql_closest_capture()),
        "url_template_census": (q_url_template_census,
                                _sql_url_template_census()),
        "host_trend": (q_host_trend, _sql_host_trend()),
        "template_dup_rate": (q_template_dup_rate, _sql_template_dup_rate()),
        "c4_filter": (q_c4_filter, _sql_c4_filter()),
    }
