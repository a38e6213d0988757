"""Driver-contract conformance for the training-data-pipeline queries
(pipelines/queries_ext.py): oracle parity for the SQL-checked entries and
semantic checks (dup-pair recall, pair symmetry) for the rows-only ones.
"""

from __future__ import annotations

import collections
import itertools

import pandas as pd
import pytest

SQL_CHECKED = [
    "neardup_clusters",
    "dup_rate_by_length",
    "wet_roundtrip",
    "mixed_roundtrip",
    "crawl_log_roundtrip",
    "frame_plan",
    "resize_plan",
    "simhash_md5_sigs",
    "simhash_md5_dups",
    "minhash_md5_sigs",
    "kmv_md5_overlap",
    "fingerprint_sketch",
    "winnow_pairs",
    "bbit_md5_est",
    "containment_md5_est",
    "self_similarity_short",
    "pair_lcs_short",
    "incremental_neardup",
    "incremental_embed_dedup",
    "lang_id_pred",
    "media_ahash_docs",
    "media_ahash_png_docs",
    "freq_spectrum",
    "events_sessions",
    "orders_asof",
    "dedup_exact_text",
    "dedup_exact_norm",
    "ngram_jaccard_pairs",
    "embed_dup_pairs",
    "embed_topk",
    "token_stats",
    "quality_stats",
    "span_dedup",
    "boilerplate_dedup",
    "dup_gram_coverage",
    "boilerplate_report",
    "heavy_hitters",
    "length_quantiles",
    "neardup_keep",
    "gopher_filter",
    "corpus_shuffle",
    "redact_pii",
    "split_documents",
    "corpus_overlap",
    "corpus_sample",
    "pack_sequences",
    "cap_per_group",
    "token_budget",
    "distinctive_terms",
    "embed_dedup_keep",
    "unigram_logloss",
    "inverted_index",
    "ngram_containment_pairs",
    "interleave_sources",
    "split_assign",
    "split_leakage",
    "decontaminate_norm",
    "dsir_logratio",
    "bpe_merge_candidates",
    "neardup_keep_best",
    "vocabulary_stats",
    "bm25_topk",
    "tfidf_cosine_pairs",
    "bigram_logloss",
    "kmeans_clusters",
    "semdedup_keep",
    "prototypicality",
    "d4_keep",
    "vocab_growth",
    "dup_growth",
    "shard_manifest",
    "collocations_pmi",
    "ttr_stats",
    "rank_fusion_rrf",
    "label_token_stats",
    "event_transitions",
    "jsonl_roundtrip",
    "csv_roundtrip",
    "dup_host_matrix",
    "quality_by_source",
    "hard_negatives",
    "dup_rate_timeline",
    "cluster_size_census",
    "capture_depth_census",
]

SQL_CHECKED_REL = [
    "events_hopping",
    "orders_range_join",
    "grouped_topk",
    "host_stats",
    "host_gini",
    "order_revenue_topk",
    "supplier_balance_by_region",
    "brand_stats",
    "segment_activity",
    "lineitem_agg",
]

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == bool or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_parity(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_ext import registry_ext

    fn, sql = registry_ext()[name]
    got = _norm(_to_pandas(fn(sf_dir)))
    want = _norm(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("name", SQL_CHECKED_REL)
def test_oracle_parity_rel(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_rel import registry_rel

    fn, sql = registry_rel()[name]
    got = _norm(_to_pandas(fn(sf_dir)))
    want = _norm(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# SQL-checked entries living in OTHER query registries (delta, ...);
# resolved through the merged driver registry.
SQL_CHECKED_FULL_REGISTRY = [
    "hll_md5_registers",
    "cms_md5_freq",
]


@pytest.mark.parametrize("name", SQL_CHECKED_FULL_REGISTRY)
def test_oracle_parity_full_registry(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    got = _norm(_to_pandas(fn(sf_dir)))
    want = _norm(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_oracle_parity_warc_roundtrip(ray_session, sf_dir, duck):
    from deduplicator_ray.pipelines.queries_ext import registry_ext

    fn, sql = registry_ext()["warc_roundtrip"]
    got = _norm(_to_pandas(fn(sf_dir)))
    want = _norm(duck.execute(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestNearDupRecall:
    """north_rule: dup-pair recall >= 0.99 vs the exact-Jaccard oracle at
    the same shingle/signature config."""

    def test_recall_vs_exact_jaccard(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        import ray.data as rd

        from deduplicator_ray.config import MinHashConfig
        from deduplicator_ray.pipelines.neardup import cluster_near_duplicates
        import re

        from deduplicator_ray.stages.minhash import shingle_hashes

        token_re = re.compile(r"\w+", re.UNICODE)  # MinHasher.__init__'s tokenizer
        cfg = MinHashConfig()
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = tbl["doc_id"].to_pylist()
        texts = tbl["text"].to_pylist()

        # exact-oracle ground truth on the SAME shingle definition
        sets = [set(shingle_hashes(t, cfg.shingle_words, token_re).tolist()) for t in texts]
        inv = collections.defaultdict(list)
        for i, s in enumerate(sets):
            for h in s:
                inv[h].append(i)
        co = collections.Counter()
        for members in inv.values():
            if 1 < len(members) <= 50:
                for x, y in itertools.combinations(members, 2):
                    co[(x, y)] += 1
        truth = set()
        for (i, j), inter in co.items():
            union = len(sets[i]) + len(sets[j]) - inter
            # margin above the LSH/estimator threshold: these pairs MUST
            # be found for recall >= 0.99 at this config
            if union and inter / union >= cfg.jaccard_threshold + 0.05:
                truth.add((ids[i], ids[j]))
        assert truth, "fixture should contain planted near-dup pairs"

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ds = ds.map_batches(
            lambda b: b.rename_columns(["doc_key", "text"]), batch_format="pyarrow"
        )
        _edges, asg = cluster_near_duplicates(ds, cfg)
        df = asg if isinstance(asg, pd.DataFrame) else asg.to_pandas()
        cm = dict(zip(df["doc_key"], df["cluster_id"]))
        found = sum(
            1 for a, b in truth if cm.get(a) is not None and cm.get(a) == cm.get(b)
        )
        assert found / len(truth) >= 0.99


class TestNearDupScalePath:
    """north_rule acceptance: the MinHash->LSH->CC scale path must agree
    with the exact 5-gram-Jaccard>=0.8 cluster definition — dup-pair
    recall >= 0.99 and cluster-membership agreement on recalled pairs."""

    def test_minhash_agrees_with_exact(self, ray_session, sf_dir):
        from deduplicator_ray.pipelines.queries_ext import (
            q_neardup_clusters,
            q_neardup_clusters_minhash,
        )

        exact = _to_pandas(q_neardup_clusters(sf_dir))
        approx = _to_pandas(q_neardup_clusters_minhash(sf_dir))
        exact_cm = dict(zip(exact["doc_key"], exact["cluster_id"]))
        approx_cm = dict(zip(approx["doc_key"], approx["cluster_id"]))

        # ground-truth dup pairs = same exact cluster
        by_cluster = collections.defaultdict(list)
        for k, c in exact_cm.items():
            by_cluster[c].append(k)
        truth = set()
        for members in by_cluster.values():
            for a, b in itertools.combinations(sorted(members), 2):
                truth.add((a, b))
        assert truth, "fixture should contain exact near-dup clusters"

        found = sum(
            1
            for a, b in truth
            if approx_cm.get(a) is not None and approx_cm.get(a) == approx_cm.get(b)
        )
        assert found / len(truth) >= 0.99


class TestRowsOnly:
    def test_simhash_pairs_sane(self, ray_session, sf_dir):
        from deduplicator_ray.pipelines.queries_ext import q_simhash_dups

        df = _to_pandas(q_simhash_dups(sf_dir))
        assert set(["a", "b", "hamming"]) <= set(df.columns)
        assert (df["a"] < df["b"]).all()
        assert (df["hamming"] <= 3).all()

    def test_self_similarity_rows(self, ray_session, sf_dir):
        from deduplicator_ray.pipelines.queries_ext import q_self_similarity

        df = _to_pandas(q_self_similarity(sf_dir))
        assert len(df) == 500
        assert (df["lrs_len"] >= 0).all()

    def test_fingerprint_sketch(self, ray_session, sf_dir):
        from deduplicator_ray.pipelines.queries_ext import q_fingerprint_sketch

        df = _to_pandas(q_fingerprint_sketch(sf_dir))
        assert len(df) == 500
        assert (df["fp_count"] > 0).all()

    # Committed golden value-hashes (computed from the deterministic
    # kernels at sf0.001): pins the rows-only queries' exact outputs so a
    # refactor can't silently change their semantics.
    GOLDEN = {
        "self_similarity": ("36a0a817506d51c3", ["doc_id", "lrs_len"]),
        "fingerprint_sketch": ("5a1f3d3ae733b732", ["doc_id", "fp_min", "fp_count"]),
        "simhash_dups": ("40c487692c50745c", ["a", "b", "hamming"]),
        "media_phash_dups": ("9cf8dd0200ea447f", ["a", "b", "hamming"]),
    }

    @pytest.mark.parametrize("name", sorted(GOLDEN))
    def test_golden_value_hash(self, ray_session, name):
        import hashlib

        from deduplicator_ray.pipelines.queries import registry

        want, cols = self.GOLDEN[name]
        df = _to_pandas(registry()[name][0]("/root/testdata/sf0.001"))
        df = df.sort_values(cols, ignore_index=True)
        blob = "\n".join(
            "\x1f".join(str(v) for v in row) for row in df[cols].itertuples(index=False)
        )
        assert hashlib.sha1(blob.encode()).hexdigest()[:16] == want

    def test_registry_names_unique_and_callable(self):
        from deduplicator_ray.pipelines.queries import registry

        reg = registry()
        assert len(reg) >= 20
        for name, (fn, sql) in reg.items():
            assert callable(fn), name
            assert sql is None or isinstance(sql, str), name


def test_tier_census_all_tiers_fire(ray_session, tmp_path):
    """Crafted corpus where each tier catches something: an exact copy,
    a case/punct variant (norm tier), a one-word near-dup (Jaccard
    tier), and a unique doc; dup_any is the distinct union."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_ext import q_tier_census

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": [
            base,                      # canonical
            base,                      # exact dup (also norm + near)
            base.upper() + "!",        # norm dup (near too)
            # last word changed: damages only the final 5-shingle,
            # J = 13/15 = 0.867 >= 0.8 -> near tier only
            base.replace("romeo", "zulu"),
            "totally different words here nothing shared at all",
        ],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_tier_census(str(tmp_path)).to_pydict()
    assert out["n_docs"] == [5]
    assert out["dup_exact"] == [1]          # doc 1
    assert out["dup_norm"] == [2]           # docs 1, 2
    assert out["dup_near"] == [3]           # docs 1, 2, 3
    assert out["dup_any"] == [3]


def test_cluster_cohesion_chain_vs_clique(ray_session, tmp_path):
    """A 3-clique of exact dups reports full density and j = 1e6; a
    2-doc near pair reports 1 edge with min_j inside the (threshold, 1)
    band — the per-cluster evidence the census exists to surface."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_ext import q_cluster_cohesion

    words = [f"tok{i}" for i in range(40)]
    base = " ".join(words)                       # docs 10,11,12: clique
    # near pair: one appended word -> J = 20/21 (in-band, not 1.0)
    a = " ".join(words[:24])
    b_ = " ".join(words[:24] + ["xx"])
    docs = pa.table({
        "doc_id": pa.array([10, 11, 12, 20, 21], type=pa.int64()),
        "text": [base, base, base, a, b_],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (q_cluster_cohesion(str(tmp_path))
           .sort_values("cluster_id", ignore_index=True))
    cl = out.set_index("cluster_id")
    assert cl.loc[10, "n_docs"] == 3 and cl.loc[10, "n_edges"] == 3
    assert cl.loc[10, "min_j_ppm"] == 1_000_000
    assert cl.loc[10, "sum_j_ppm"] == 3_000_000
    assert cl.loc[20, "n_docs"] == 2 and cl.loc[20, "n_edges"] == 1
    assert 800_000 <= cl.loc[20, "min_j_ppm"] < 1_000_000


def test_mojibake_stats_planted(ray_session, tmp_path):
    """Planted encoding damage: per-source artifact counts and the
    affected-doc census match hand counts; clean docs contribute zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_ext import q_mojibake_stats

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "source": ["feedA", "feedA", "feedB", "feedB"],
        "text": [
            "clean ascii text",
            "cafÃ© naÃ¯ve rÃ©sumÃ©",            # 4x Ã
            "donâ€™t â€œquoteâ€ me Â here",  # 3x â€ + 1x Â
            "lost bytes �� here",       # 2x U+FFFD
        ],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_mojibake_stats(str(tmp_path)).set_index("source").sort_index()
    a, b = out.loc["feedA"], out.loc["feedB"]
    assert a["n_docs"] == 2 and a["n_affected"] == 1 and a["n_atilde"] == 4
    assert a[["n_apunct", "n_stray_a", "n_fffd"]].sum() == 0
    assert b["n_docs"] == 2 and b["n_affected"] == 2
    assert b["n_apunct"] == 3 and b["n_stray_a"] == 1 and b["n_fffd"] == 2
    assert b["n_atilde"] == 0
