"""Tests for simhash, textstats, substr and embed stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from deduplicator_ray.stages.simhash import simhash64, simhash_signatures, simhash_pairs
from deduplicator_ray.stages.substr import (
    longest_common_substring,
    longest_repeated_substring,
    pair_common_substrings,
    self_similarity,
)
from deduplicator_ray.stages.textstats import (
    LangId,
    fingerprints,
    quality_metrics,
    token_counts,
    winnow_fingerprints,
)
from deduplicator_ray.stages.embed import (
    cosine_topk,
    embedding_dup_pairs,
    hyperplane_bucket,
)


class TestSimhash:
    def test_identical_and_perturbed(self):
        t = "the quick brown fox jumps over the lazy dog " * 10
        a = simhash64(t)
        assert a == simhash64(t)
        b = simhash64(t + " extra token here")
        ham = bin(a ^ b).count("1")
        assert ham <= 8  # near-identical text -> small hamming
        c = simhash64("completely different content about databases and sharding")
        assert bin(a ^ c).count("1") > 10

    def test_pairs_pipeline(self, ray_session):
        import ray.data as rd

        base = "alpha beta gamma delta epsilon zeta eta theta " * 8
        pdf = pd.DataFrame(
            {
                "doc_key": np.arange(4, dtype=np.int64),
                "text": [base, base + " tail", "unrelated words entirely " * 9, base],
            }
        )
        sigs = simhash_signatures(rd.from_pandas(pdf))
        pairs = simhash_pairs(sigs, max_hamming=3).to_pandas()
        found = set(zip(pairs["a"], pairs["b"]))
        assert (0, 3) in found  # identical docs
        assert all((a, b) != (0, 2) for a, b in found)

    def test_empty_text(self):
        assert simhash64("") == 0
        assert simhash64(None) == 0


class TestTextstats:
    def test_token_counts(self, ray_session):
        import ray.data as rd

        pdf = pd.DataFrame({"text": ["one two three", "", "don't stop", None]})
        out = token_counts(rd.from_pandas(pdf)).to_pandas()
        assert out["n_ws_tokens"].tolist() == [3, 0, 2, 0]
        assert out["n_bpe_tokens"].tolist()[0] == 3
        assert out["n_bpe_tokens"].tolist()[2] >= 3  # don ' t stop-ish

    def test_quality_metrics(self, ray_session):
        import ray.data as rd

        pdf = pd.DataFrame({"text": ["Hello, World! 123", ""]})
        out = quality_metrics(rd.from_pandas(pdf)).to_pandas()
        r = out.iloc[0]
        assert r["n_punct"] == 2 and r["n_digits"] == 3 and r["n_upper"] == 2
        assert 0.0 <= r["quality_score"] <= 1.0
        assert out.iloc[1]["quality_score"] == 0.0

    def test_langid(self):
        lid = LangId()
        assert lid.detect("the cat sat on the mat and it was happy to be there") == "en"
        assert lid.detect("der Hund ist mit den Kindern im Garten und das ist gut") == "de"
        assert lid.detect("le chat est dans la maison et il est pour le moment") == "fr"
        assert lid.detect("el perro es un animal que vive en la casa con su amo") == "es"
        assert lid.detect("þetta er íslenska og það er gott að vera hér með þér í dag") == "is"
        assert lid.detect("这是一个中文句子，用来测试语言识别功能。") == "zh"
        assert lid.detect("") == "und"

    def test_fingerprints(self, ray_session):
        import ray.data as rd

        t = "some repeated boilerplate text for fingerprinting tests " * 4
        pdf = pd.DataFrame({"text": [t, t, "different content entirely here today"]})
        out = fingerprints(rd.from_pandas(pdf)).to_pandas()
        assert out["fp_min"].iloc[0] == out["fp_min"].iloc[1]  # identical docs
        assert out["fp_count"].iloc[0] > 0
        # deterministic
        fp1 = winnow_fingerprints(t)
        fp2 = winnow_fingerprints(t)
        assert np.array_equal(fp1, fp2)


class TestSubstr:
    def test_self_similarity_stage(self, ray_session):
        import ray.data as rd

        pdf = pd.DataFrame(
            {"text": ["nav nav nav unique middle nav nav nav", "abcdefg", ""]}
        )
        out = self_similarity(rd.from_pandas(pdf), min_len=3).to_pandas()
        assert out["lrs_len"].iloc[0] >= 7  # "nav nav nav" repeats
        assert out["lrs_len"].iloc[1] == 0
        assert out["lrs_len"].iloc[2] == 0

    def test_pair_lcs_stage(self, ray_session):
        import ray.data as rd

        corpus = pd.DataFrame(
            {
                "doc_key": np.arange(3, dtype=np.int64),
                "text": [
                    "HEADER common boilerplate block TRAILER one",
                    "HEADER common boilerplate block TRAILER two",
                    "nothing shared here",
                ],
            }
        )
        edges = pd.DataFrame({"a": [0], "b": [1]})
        out = pair_common_substrings(
            rd.from_pandas(edges), rd.from_pandas(corpus)
        ).to_pandas()
        assert len(out) == 1
        assert out["lcs_len"].iloc[0] == len("HEADER common boilerplate block TRAILER ")
        assert "boilerplate" in out["lcs_snippet"].iloc[0]


class TestEmbed:
    @pytest.fixture(scope="class")
    def emb(self, sf_dir):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        pdf = t.to_pandas()
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return pdf, m

    def test_cosine_topk_vs_numpy(self, ray_session, sf_dir, emb):
        import ray.data as rd

        pdf, m = emb
        q = m[:2]
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        got = cosine_topk(ds, q, k=10).to_pandas()
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        scores = mn @ qn.T
        for qi in range(2):
            order = np.lexsort((pdf["vec_id"].to_numpy(), -scores[:, qi]))[:10]
            want_ids = pdf["vec_id"].to_numpy()[order].tolist()
            got_ids = got[got["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
            assert got_ids == want_ids

    def test_dup_pairs_vs_numpy(self, ray_session, sf_dir, emb):
        import ray.data as rd

        pdf, m = emb
        # test embeddings are near-orthogonal (max pairwise cosine ~0.48),
        # so pick a threshold that yields a non-trivial pair set
        thr = 0.35
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        got = embedding_dup_pairs(ds, thr).to_pandas()
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = mn @ mn.T
        iu = np.triu_indices(len(m), k=1)
        mask = s[iu] >= thr
        ids = pdf["vec_id"].to_numpy()
        want = set(zip(ids[iu[0][mask]].tolist(), ids[iu[1][mask]].tolist()))
        assert len(want) > 0
        assert set(zip(got["a"], got["b"])) == want

    def test_bucketed_path_recall(self, ray_session):
        """Past the broadcast guard the automatic banded-LSH path must
        recover >= 0.99 of the true threshold pairs (and, being
        exact-verified, emit no false positives)."""
        import ray.data as rd

        rng = np.random.default_rng(7)
        n_base, dim, thr = 600, 32, 0.8
        base = rng.standard_normal((n_base, dim))
        # plant near-dup partners for a third of the vectors: cosine ~0.95
        partners = base[:200] + 0.3 * rng.standard_normal((200, dim))
        m = np.concatenate([base, partners])
        pdf = pd.DataFrame(
            {"vec_id": np.arange(len(m), dtype=np.int64), "embedding": list(m)}
        )
        ds = rd.from_pandas(pdf)
        # max_broadcast=0 forces the bucketed scale path
        got = embedding_dup_pairs(ds, thr, max_broadcast=0).to_pandas()
        found = set(zip(got["a"].tolist(), got["b"].tolist()))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = mn @ mn.T
        iu = np.triu_indices(len(m), k=1)
        mask = s[iu] >= thr
        want = set(zip(iu[0][mask].tolist(), iu[1][mask].tolist()))
        assert len(want) >= 150
        assert found <= want  # exact verify -> no false positives
        recall = len(found & want) / len(want)
        assert recall >= 0.99, f"recall {recall}: {len(found)}/{len(want)}"

    def test_bucketed_equals_broadcast_on_sf(self, ray_session, sf_dir, emb):
        """On the sf embeddings both paths must agree pair-for-pair at a
        threshold where banding recall is ~1."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import embedding_dup_pairs_bucketed

        thr = 0.35
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        broad = embedding_dup_pairs(ds, thr).to_pandas()
        # n_tables=64 pushes banding recall to ~0.9999 even at the
        # threshold boundary, so the small sf pair set matches exactly
        buck = embedding_dup_pairs_bucketed(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), thr, n_tables=64
        ).to_pandas()
        want = set(zip(broad["a"].tolist(), broad["b"].tolist()))
        got = set(zip(buck["a"].tolist(), buck["b"].tolist()))
        assert got == want

    def test_ivf_topk_full_probe_is_exact(self, ray_session, sf_dir, emb):
        """Probing every list must reproduce the exact brute-force
        ranking; fewer probes must keep high top-10 recall."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import ivf_topk

        pdf, m = emb
        q = m[:4]
        exact = cosine_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10
        ).to_pandas()
        full = ivf_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10,
            n_lists=8, n_probe=8,
        ).to_pandas()
        assert full[["query_id", "vec_id", "rank"]].values.tolist() == \
            exact[["query_id", "vec_id", "rank"]].values.tolist()
        approx = ivf_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10,
            n_lists=8, n_probe=4,
        ).to_pandas()
        want = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
        got = set(map(tuple, approx[["query_id", "vec_id"]].values.tolist()))
        assert len(got & want) / len(want) >= 0.7  # half the lists probed

    def test_ivf_recall_on_sorted_corpus(self, ray_session):
        """Adversarial input ORDER: a cluster-sorted corpus with a
        training sample smaller than the first cluster.  A first-N
        (limit) sample would train the quantizer on one cluster and
        collapse partial-probe recall; the hash-based sample must keep
        it high."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import ivf_topk

        rng = np.random.default_rng(11)
        n_clusters, per_cluster, dim = 12, 120, 24
        centers = rng.standard_normal((n_clusters, dim)) * 4
        vecs = np.concatenate([
            centers[c] + 0.3 * rng.standard_normal((per_cluster, dim))
            for c in range(n_clusters)
        ])  # SORTED by cluster: rows 0..119 are cluster 0, etc.
        pdf = pd.DataFrame(
            {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)}
        )
        q = vecs[::per_cluster][:6]  # one query per of the first 6 clusters
        exact = cosine_topk(rd.from_pandas(pdf), q, k=10).to_pandas()
        approx = ivf_topk(
            rd.from_pandas(pdf), q, k=10, n_lists=12, n_probe=4,
            train_sample=100,  # < one cluster: limit() would see cluster 0 only
        ).to_pandas()
        want = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
        got = set(map(tuple, approx[["query_id", "vec_id"]].values.tolist()))
        recall = len(got & want) / len(want)
        assert recall >= 0.9, f"recall {recall}"

    def test_pq_rerank_equals_exact(self, ray_session, sf_dir, emb):
        """The driver regime: PQ-ADC shortlist (rerank=128, >= 4x margin
        over the measured worst-case true-neighbor ADC position) + exact
        cosine rerank must EQUAL brute force row for row."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import pq_topk

        pdf, m = emb
        q = m[:4]
        exact = cosine_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10
        ).to_pandas()
        got = pq_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10,
            n_subspaces=16, rerank=128,
        ).to_pandas()
        assert got[["query_id", "vec_id", "rank"]].values.tolist() == \
            exact[["query_id", "vec_id", "rank"]].values.tolist()
        # reranked scores are the exact cosines
        ex = exact.set_index(["query_id", "vec_id"])["cosine"]
        gt = got.set_index(["query_id", "vec_id"])["cosine"]
        assert np.allclose(gt.to_numpy(), ex[gt.index].to_numpy(), atol=1e-9)

    def test_pq_adc_recall_no_rerank(self, ray_session, sf_dir, emb):
        """Pure ADC (no rerank): 16-byte codes over near-orthogonal
        random vectors — PQ's hardest regime — must still place most of
        the true top-10 in the ADC top-10, and be deterministic."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import pq_topk

        pdf, m = emb
        q = m[:4]
        exact = cosine_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10
        ).to_pandas()
        adc = pq_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10,
            n_subspaces=16,
        ).to_pandas()
        want = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
        got = set(map(tuple, adc[["query_id", "vec_id"]].values.tolist()))
        assert len(got & want) / len(want) >= 0.6
        adc2 = pq_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), q, k=10,
            n_subspaces=16,
        ).to_pandas()
        assert adc[["query_id", "vec_id", "rank"]].values.tolist() == \
            adc2[["query_id", "vec_id", "rank"]].values.tolist()

    def test_pq_rerank_recall_on_clustered_corpus(self, ray_session):
        """Clustered data, adversarially SORTED, training sample smaller
        than one cluster.  Within a tight cluster every cosine is ~0.96+
        and pure ADC cannot resolve the fine order (measured here: ADC-
        only recall@10 ~0.1 — the regime reranking exists for), but the
        ADC shortlist ranks the right CLUSTER on top, so rerank at the
        cluster size recovers the exact answer (measured shortlist
        recall 1.0 at L=120)."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import pq_topk

        rng = np.random.default_rng(13)
        n_clusters, per_cluster, dim = 12, 120, 32
        centers = rng.standard_normal((n_clusters, dim)) * 4
        vecs = np.concatenate([
            centers[c] + 0.3 * rng.standard_normal((per_cluster, dim))
            for c in range(n_clusters)
        ])
        pdf = pd.DataFrame(
            {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)}
        )
        q = vecs[::per_cluster][:6]
        exact = cosine_topk(rd.from_pandas(pdf), q, k=10).to_pandas()
        got = pq_topk(rd.from_pandas(pdf), q, k=10, n_subspaces=16,
                      train_sample=100, rerank=per_cluster).to_pandas()
        want = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
        have = set(map(tuple, got[["query_id", "vec_id"]].values.tolist()))
        recall = len(have & want) / len(want)
        assert recall >= 0.9, f"recall {recall}"
        # the query vector itself must rank first after the exact rerank
        r1 = got[got["rank"] == 1].sort_values("query_id")
        assert r1["vec_id"].tolist() == [qi * per_cluster for qi in range(6)]

    def test_pq_encode_shape_and_compression(self, ray_session, sf_dir, emb):
        """Codes are m bytes/vector (the 32x at-rest compression claim vs
        the float64 corpus), decode zero-copy, and are deterministic."""
        import pyarrow as pa
        import ray.data as rd

        from deduplicator_ray.stages.embed import (_blob_codes, _hash_sample,
                                                   _normalize, pq_encode,
                                                   pq_train)

        pdf, m = emb
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        sample = _normalize(_hash_sample(ds, "vec_id", "embedding", 10_000))
        books = pq_train(sample, n_subspaces=16)
        assert books.shape == (16, min(256, len(m)), m.shape[1] // 16)
        enc = pq_encode(ds, books).to_pandas().sort_values("vec_id")
        assert len(enc) == len(pdf)
        blobs = enc["pqcode"].to_numpy()
        assert all(len(b) == 16 for b in blobs)  # 16 B vs 512 B float64
        codes = _blob_codes(
            pa.chunked_array([pa.array(list(blobs), pa.binary())]), 16)
        assert codes.shape == (len(pdf), 16)
        assert codes.dtype == np.uint8

    def test_embedding_covariance(self, ray_session, sf_dir, emb):
        """Integer-exact distributed covariance: matches numpy's float
        covariance to quantization precision, and cov_num is EXACTLY
        partition-invariant (pure int64 reduction)."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import embedding_covariance

        pdf, m = emb
        mean, cov, n, cov_num = embedding_covariance(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"))
        assert n == len(m)
        want_mean = m.mean(axis=0)
        want_cov = (m - want_mean).T @ (m - want_mean) / len(m)
        assert np.allclose(mean, want_mean, atol=1e-3)
        assert np.allclose(cov, want_cov, atol=2e-3)
        # exact partition invariance of the integer numerators
        ds7 = rd.from_pandas(pdf[["vec_id", "embedding"]]).repartition(7)
        _, _, _, cov_num7 = embedding_covariance(ds7)
        assert np.array_equal(cov_num, cov_num7)

    def test_embedding_covariance_empty_raises(self, ray_session):
        import ray.data as rd

        from deduplicator_ray.stages.embed import embedding_covariance

        pdf = pd.DataFrame({"embedding": pd.Series([], dtype=object)})
        with pytest.raises(ValueError, match="empty"):
            embedding_covariance(rd.from_pandas(pdf))

    def test_hyperplane_bucket(self, ray_session, sf_dir):
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        out = hyperplane_bucket(ds).to_pandas()
        assert out["hp_bucket"].between(0, 2**16 - 1).all()
        out2 = hyperplane_bucket(rd.read_parquet(f"{sf_dir}/embeddings.parquet")).to_pandas()
        assert out["hp_bucket"].tolist() == out2["hp_bucket"].tolist()  # deterministic


class TestEmbedDedupKeep:
    @pytest.fixture
    def emb(self, sf_dir):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        pdf = t.to_pandas()
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return pdf, m

    def _want(self, pdf, m, thr):
        # brute force: cosine graph -> CC -> keep min vec_id per component
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = mn @ mn.T
        ids = pdf["vec_id"].to_numpy(np.int64)
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        iu = np.triu_indices(len(m), k=1)
        for i, j in zip(iu[0][s[iu] >= thr], iu[1][s[iu] >= thr]):
            a, b = find(int(ids[i])), find(int(ids[j]))
            if a != b:
                parent[max(a, b)] = min(a, b)
        keep = {int(i): find(int(i)) == int(i) for i in ids}
        return keep

    def test_broadcast_path_vs_bruteforce(self, ray_session, sf_dir, emb):
        import ray.data as rd

        from deduplicator_ray.stages.embed import embedding_dedup_keep

        pdf, m = emb
        thr = 0.35
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        got = embedding_dedup_keep(ds, thr).to_pandas()
        want = self._want(pdf, m, thr)
        assert len(got) == len(pdf)
        assert {int(r.vec_id): bool(r.keep) for r in got.itertuples()} == want
        assert (~got["keep"]).sum() > 0  # the threshold yields real dups

    def test_copartition_path_agrees(self, ray_session, sf_dir, emb):
        import ray.data as rd

        from deduplicator_ray.stages.embed import embedding_dedup_keep

        pdf, m = emb
        thr = 0.35
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        got = (embedding_dedup_keep(ds, thr, max_broadcast_removals=0,
                                    num_buckets=4)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        want = self._want(pdf, m, thr)
        assert {int(r.vec_id): bool(r.keep) for r in got.itertuples()} == want


def test_semdedup_keep_bruteforce(ray_session):
    """semdedup_keep vs a brute-force mirror of its contract: duplicate
    iff some lower-id SAME-CLUSTER vector has cosine >= t; also pins
    that cross-cluster near-dups are NOT flagged (the blocking trade)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.embed import (
        _kmeans_argmin,
        kmeans_centroids,
        semdedup_keep,
    )

    rng = np.random.default_rng(17)
    centers = np.eye(4, 8) * 10.0
    vecs, ids = [], []
    for i in range(60):
        c = centers[i % 4] + rng.normal(0, 0.05, 8)
        vecs.append(c.astype(np.float64))
        ids.append(i)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [list(v) for v in vecs]})
    K, IT, T = 4, 2, 0.999
    got = (semdedup_keep(rd.from_pandas(pdf).repartition(4), k=K, iters=IT,
                         threshold=T, sim_chunk=7)   # force tile boundaries
           .to_pandas().sort_values("vec_id", ignore_index=True))

    ds = rd.from_pandas(pdf)
    cent = kmeans_centroids(ds, k=K, iters=IT)
    X = np.stack(vecs)
    cl = _kmeans_argmin(X, cent)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    want_dup = [
        any(cl[j] == cl[i] and S[j, i] >= T for j in range(i))
        for i in range(len(ids))
    ]
    assert got["cluster"].tolist() == cl.astype(int).tolist()
    assert got["is_duplicate"].tolist() == want_dup
    assert sum(want_dup) > 0  # the planted tight clusters actually fire


def test_hamming_pairs_over_int64_hashes(ray_session):
    """hash64_signatures + hamming_pairs: pigeonhole-complete pairs over
    an arbitrary int64 hash column (the phash dedup path)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.simhash import hamming_pairs

    base = np.int64(0x123456789ABCDEF0 - 2**63)  # negative: bit-cast path
    hashes = {
        0: base,
        1: base,                                  # hamming 0
        2: base ^ np.int64(0b101),                # hamming 2
        3: base ^ np.int64((1 << 17) | (1 << 48) | 1),  # hamming 3, 3 chunks
        4: ~base,                                 # hamming 64
        5: np.int64(42),
    }
    pdf = pd.DataFrame({"media_id": list(hashes),
                        "phash": np.array(list(hashes.values()),
                                          dtype=np.int64)})
    got = (hamming_pairs(rd.from_pandas(pdf).repartition(3),
                         id_col="media_id", hash_col="phash", max_hamming=3)
           .to_pandas().sort_values(["a", "b"], ignore_index=True))
    want = {(0, 1): 0, (0, 2): 2, (1, 2): 2, (0, 3): 3, (1, 3): 3,
            (2, 3): 3}  # xor bits {2,17,48}; chunk 2 shared -> banded
    assert {(r.a, r.b): r.hamming for r in got.itertuples(index=False)} == want
    # (4,*) and (5,*) never pair (far in every chunk)


def test_prototypicality_bruteforce(ray_session):
    """prototypicality vs direct recompute: assignment matches
    kmeans_centroids + argmin, score is cos(x, centroid) micros, and the
    planted tight-cluster members outscore a planted outlier."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.embed import (
        _kmeans_argmin,
        kmeans_centroids,
        prototypicality,
    )

    rng = np.random.default_rng(31)
    centers = np.eye(3, 6) * 8.0
    vecs = [centers[i % 3] + rng.normal(0, 0.05, 6) for i in range(30)]
    vecs.append(np.ones(6) * 3.0)       # off-center outlier
    pdf = pd.DataFrame({"vec_id": range(len(vecs)),
                        "embedding": [list(v) for v in vecs]})
    K, IT = 3, 2
    got = (prototypicality(rd.from_pandas(pdf).repartition(3), k=K, iters=IT)
           .to_pandas().sort_values("vec_id", ignore_index=True))
    cent = kmeans_centroids(rd.from_pandas(pdf), k=K, iters=IT)
    X = np.stack(vecs)
    a = _kmeans_argmin(X, cent)
    cos = np.einsum("ij,ij->i", X, cent[a]) / (
        np.linalg.norm(X, axis=1) * np.linalg.norm(cent[a], axis=1))
    assert got["cluster"].tolist() == a.astype(int).tolist()
    assert got["proto_micro"].tolist() == np.floor(
        cos * 1e6 + 0.5).astype(int).tolist()
    # the outlier is the least prototypical row
    assert got["proto_micro"].idxmin() == 30
    assert (got.loc[:29, "proto_micro"] > 990_000).all()


def test_d4_keep_bruteforce(ray_session):
    """d4_keep vs direct recompute: semdedup dups dropped, then the top
    prune_frac most-prototypical survivors per cluster dropped."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.embed import (
        _greedy_dup_flags,
        _kmeans_argmin,
        d4_keep,
        kmeans_centroids,
    )

    rng = np.random.default_rng(13)
    centers = np.eye(2, 6) * 8.0
    vecs = [centers[i % 2] + rng.normal(0, 0.4, 6) for i in range(24)]
    vecs.append(vecs[0])                 # exact dup -> semdedup drop
    pdf = pd.DataFrame({"vec_id": range(len(vecs)),
                        "embedding": [list(v) for v in vecs]})
    K, IT, T, F = 2, 2, 0.9999, 0.25
    got = (d4_keep(rd.from_pandas(pdf).repartition(3), k=K, iters=IT,
                   threshold=T, prune_frac=F, sim_chunk=5)
           .to_pandas().sort_values("vec_id", ignore_index=True))

    cent = kmeans_centroids(rd.from_pandas(pdf), k=K, iters=IT)
    X = np.stack(vecs)
    cl = _kmeans_argmin(X, cent)
    keep = np.ones(len(X), dtype=bool)
    for c in range(K):
        idx = np.flatnonzero(cl == c)
        dup = _greedy_dup_flags(X[idx], T, 4096)
        keep[idx[dup]] = False
        surv = idx[~dup]
        cos = (X[surv] @ cent[c]) / (
            np.linalg.norm(X[surv], axis=1) * np.linalg.norm(cent[c]))
        pm = np.floor(cos * 1e6 + 0.5).astype(np.int64)
        order = surv[np.lexsort((surv, -pm))]
        keep[order[:int(np.floor(len(surv) * F))]] = False
    assert got["cluster"].tolist() == cl.astype(int).tolist()
    assert got["keep"].tolist() == keep.tolist()
    assert not got.loc[24, "keep"]          # the planted dup went
    assert 0 < got["keep"].sum() < len(X)   # pruning actually fired


def test_script_counts_unicode(ray_session):
    """Unicode-script census: per-class counts and the mixed-script flag
    on hand-computed fixtures (pure-latin, latin+cyrillic spam mix, CJK,
    arabic-with-digits, empty/null)."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import script_counts

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "lang": ["en", "ru", "zh", "ar", "en"],
        "text": [
            "plain ascii words only",
            "пример text пример text пример",   # 18 cyr + 8 latin letters
            "汉字文本测试",                        # 6 han
            "نص عربي ١٢٣",                       # arabic + arabic-indic digits
            None,
        ],
    })
    got = (script_counts(rd.from_pandas(pdf)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert got["n_latin"].tolist()[0] == 19          # "plainasciiwordsonly"
    r1 = got.iloc[1]
    assert r1["n_cyrillic"] == 18 and r1["n_latin"] == 8
    assert bool(r1["is_mixed"])                      # 8 >= 10% of 26, >= 5
    r2 = got.iloc[2]
    assert r2["n_han"] == 6 and not bool(r2["is_mixed"])
    r3 = got.iloc[3]
    assert r3["n_arabic"] > 0 and r3["n_digits"] == 3
    assert not bool(r3["is_mixed"])
    r4 = got.iloc[4]
    assert r4["n_letters"] == 0 and not bool(r4["is_mixed"])
    # doc 0: single-script, nondom = 0 -> not mixed
    assert not bool(got.iloc[0]["is_mixed"])


def test_winnow_pairs_bruteforce_and_lifted_paragraph(ray_session):
    """winnow_pairs == brute-force |fp(A) ∩ fp(B)| (same df cap), and a
    paragraph lifted into an otherwise-unrelated doc surfaces even
    though whole-doc similarity is low."""
    import collections
    import itertools

    import ray.data as rd

    from deduplicator_ray.stages.textstats import (winnow_fingerprints,
                                                   winnow_pairs)

    rng = np.random.default_rng(31)
    vocab = [f"w{i:03d}" for i in range(600)]
    para = " ".join(rng.choice(vocab, size=40))      # the lifted paragraph
    rows = []
    for i in range(25):
        body = " ".join(rng.choice(vocab, size=150))
        rows.append((i, body))
    rows.append((100, rows[0][1]))                    # exact dup of doc 0
    rows.append((101, " ".join(rng.choice(vocab, size=150)) + " " + para))
    rows.append((102, para + " " + " ".join(rng.choice(vocab, size=150))))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    MIN_SHARED, MAX_DF = 3, 10
    got = (winnow_pairs(rd.from_pandas(pdf), min_shared=MIN_SHARED,
                        max_df=MAX_DF).to_pandas())
    found = {(a, b): n for a, b, n in
             zip(got["doc_a"], got["doc_b"], got["n_shared"])}

    fps = {r.doc_id: set(winnow_fingerprints(r.text).tolist())
           for r in pdf.itertuples()}
    df_cnt = collections.Counter(f for s in fps.values() for f in s)
    keep = {f for f, c in df_cnt.items() if c <= MAX_DF}
    want = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        n = len(fps[a] & fps[b] & keep)
        if n >= MIN_SHARED:
            want[(a, b)] = n
    assert found == want
    assert (101, 102) in found          # paragraph-level hit, low global J
    assert (0, 100) in found            # exact dup


class TestIvfPq:
    def test_full_probe_equals_bruteforce(self, ray_session):
        """n_probe = n_lists + shortlist >= corpus: exact output."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import cosine_topk, ivfpq_topk

        rng = np.random.default_rng(3)
        m = rng.standard_normal((300, 16))
        pdf = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                            "embedding": list(m)})
        q = m[:3] + 0.01
        ds = rd.from_pandas(pdf)
        exact = cosine_topk(rd.from_pandas(pdf), q, k=5).to_pandas()
        got = ivfpq_topk(ds, q, k=5, n_lists=4, n_probe=4,
                         rerank=300, n_subspaces=4).to_pandas()
        pd.testing.assert_frame_equal(
            got[["query_id", "vec_id", "rank"]],
            exact[["query_id", "vec_id", "rank"]], check_dtype=False)
        np.testing.assert_allclose(got["cosine"], exact["cosine"],
                                   atol=1e-12)

    def test_partial_probe_recall_on_clusters(self, ray_session):
        """Clustered corpus (adversarially SORTED by cluster so a
        first-N training sample would bias the quantizer): probing 2/8
        lists still recovers >= 0.9 of each query's true top-10."""
        import ray.data as rd

        from deduplicator_ray.stages.embed import cosine_topk, ivfpq_topk

        rng = np.random.default_rng(11)
        centers = rng.standard_normal((8, 24)) * 4.0
        vecs = np.concatenate(
            [c + 0.3 * rng.standard_normal((150, 24)) for c in centers])
        pdf = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64),
                            "embedding": list(vecs)})        # sorted order
        q = centers[:4] + 0.1 * rng.standard_normal((4, 24))
        ds = rd.from_pandas(pdf).repartition(6)
        exact = cosine_topk(rd.from_pandas(pdf), q, k=10).to_pandas()
        # rerank shortlist must cover the near-tie set: cluster members
        # sit within ~0.005 cosine of each other, the same order as ADC
        # noise, so a 50-deep shortlist misses true top-10 entries — the
        # classic IVFPQ shortlist-sizing effect, not an implementation bug
        got = ivfpq_topk(ds, q, k=10, n_lists=8, n_probe=2,
                         rerank=200, n_subspaces=6).to_pandas()
        rec = []
        for qi in range(4):
            want = set(exact.loc[exact["query_id"] == qi, "vec_id"])
            have = set(got.loc[got["query_id"] == qi, "vec_id"])
            rec.append(len(want & have) / len(want))
        assert min(rec) >= 0.9, rec


def test_incremental_embed_dedup_paths_agree(ray_session):
    """stages/embed.py::incremental_embed_dedup — the broadcast path and
    the beyond-cap bucketed-LSH path must produce the same
    (vec_id, dup_of, cos_micro) table on a planted corpus, and find
    every planted cross-snapshot semantic dup."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.stages.embed import incremental_embed_dedup

    rng = np.random.default_rng(7)
    dim = 32
    old_v = rng.normal(size=(40, dim))
    new_v = rng.normal(size=(60, dim))
    planted = {}
    for i in range(10):  # new vec 3*i duplicates old vec 4*i
        src = old_v[4 * i]
        new_v[3 * i] = src + rng.normal(scale=0.02, size=dim)
        planted[3 * i * 2 + 1] = 4 * i  # engine ids are raw vec_ids below

    def tbl(ids, vecs):
        return pa.table({
            "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                  type=pa.list_(pa.float32())),
        })

    old = rd.from_arrow(tbl(np.arange(40) * 2, old_v))       # even ids
    new = rd.from_arrow(tbl(np.arange(60) * 2 + 1, new_v))   # odd ids

    a = (incremental_embed_dedup(new, old, threshold=0.9,
                                 max_broadcast=10_000)
         .to_pandas().sort_values("vec_id", ignore_index=True))
    b = (incremental_embed_dedup(new, old, threshold=0.9, max_broadcast=0)
         .to_pandas().sort_values("vec_id", ignore_index=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a[["vec_id", "dup_of", "cos_micro"]],
                                  b[["vec_id", "dup_of", "cos_micro"]])
    got = dict(zip(a["vec_id"], a["dup_of"]))
    for i in range(10):
        assert got.get(3 * i * 2 + 1) == 4 * i * 2, (i, got)
    assert (a["cos_micro"] >= 900_000).all()
