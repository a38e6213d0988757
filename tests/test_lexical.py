"""Unit tests for stages/lexical.py: the triangular pair decode, BM25
edge cases, and tf-idf semantics (hub-gram guard, df=1 norm
contribution).  Oracle parity at corpus scale is covered by
tests/test_queries.py (bm25_topk / tfidf_cosine_pairs in SQL_CHECKED).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from deduplicator_ray.stages.lexical import (
    _tri_pair_indices,
    bm25_topk,
    tfidf_cosine_pairs,
)


class TestTriPairIndices:
    @pytest.mark.parametrize("sizes", [
        [0], [1], [2], [3], [5], [0, 0], [1, 1], [4, 0, 2, 1, 7],
        [2, 3, 2], [100], [1, 63, 2, 0, 9],
    ])
    def test_matches_itertools(self, sizes):
        gid, i, j = _tri_pair_indices(np.asarray(sizes, dtype=np.int64))
        want = [
            (g, a, b)
            for g, s in enumerate(sizes)
            for a, b in itertools.combinations(range(s), 2)
        ]
        got = list(zip(gid.tolist(), i.tolist(), j.tolist()))
        assert got == want

    def test_empty(self):
        gid, i, j = _tri_pair_indices(np.asarray([], dtype=np.int64))
        assert len(gid) == len(i) == len(j) == 0


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


class TestBM25:
    def test_scores_and_order(self, ray_session):
        # hand corpus: 'x' rare, 'y' common; doc 1 repeats x
        ds = _docs_ds([
            {"doc_id": 1, "text": "x x y a b"},
            {"doc_id": 2, "text": "y a b c d e f g h i"},
            {"doc_id": 3, "text": "a b c"},
            {"doc_id": 4, "text": "x y"},
        ])
        out = bm25_topk(ds, ["x", "y"], k=10, k1=1.2, b=0.75)
        assert list(out.columns) == ["doc_id", "score"]
        assert set(out["doc_id"]) == {1, 2, 4}  # doc 3 has no query term
        # brute-force reference
        texts = {1: "x x y a b", 2: "y a b c d e f g h i", 3: "a b c",
                 4: "x y"}
        dls = {d: len(t.split(" ")) for d, t in texts.items()}
        avgdl = sum(dls.values()) / 4
        n = 4.0
        want = {}
        for d, t in texts.items():
            toks = t.split(" ")
            s = 0.0
            for term in ("x", "y"):
                tf = toks.count(term)
                if tf == 0:
                    continue
                dft = sum(term in tt.split(" ") for tt in texts.values())
                idf = np.log(1 + (n - dft + 0.5) / (dft + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            if s > 0:
                want[d] = s
        got = dict(zip(out["doc_id"], out["score"]))
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-12)
        # descending by score, ties (none here) by id
        assert list(out["score"]) == sorted(out["score"], reverse=True)

    def test_k_truncates(self, ray_session):
        ds = _docs_ds([{"doc_id": i, "text": "x"} for i in range(10)])
        out = bm25_topk(ds, ["x"], k=3)
        # all scores identical -> tie-break on ascending doc_id
        assert list(out["doc_id"]) == [0, 1, 2]

    def test_no_candidates(self, ray_session):
        ds = _docs_ds([{"doc_id": 1, "text": "a b"}])
        out = bm25_topk(ds, ["zzz"], k=5)
        assert len(out) == 0

    def test_null_text_is_single_token(self, ray_session):
        ds = _docs_ds([{"doc_id": 1, "text": None},
                       {"doc_id": 2, "text": "q"}])
        out = bm25_topk(ds, ["q"], k=5)
        assert list(out["doc_id"]) == [2]

    def test_rejects_bad_terms(self, ray_session):
        ds = _docs_ds([{"doc_id": 1, "text": "a"}])
        with pytest.raises(ValueError):
            bm25_topk(ds, [])
        with pytest.raises(ValueError):
            bm25_topk(ds, ["a", "a"])
        with pytest.raises(ValueError):
            bm25_topk(ds, ["two words"])


class TestTfidfCosine:
    def test_exact_duplicates_score_one(self, ray_session):
        ds = _docs_ds([
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon"},
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon"},
            {"doc_id": 3, "text": "one two three four five"},
        ])
        out = tfidf_cosine_pairs(ds, threshold=0.9, ngram=3).to_pandas()
        assert len(out) == 1
        assert (int(out["doc_a"][0]), int(out["doc_b"][0])) == (1, 2)
        assert out["cosine"][0] == pytest.approx(1.0)

    def test_hub_gram_guard_drops_pairs(self, ray_session):
        # the only shared gram sits in 3 of 4 docs (df=3 < N, so its
        # idf is positive); max_df=2 evicts it from the space
        rows = [{"doc_id": i, "text": f"common gram here tail{i}"}
                for i in range(3)]
        rows.append({"doc_id": 9, "text": "totally different words now"})
        ds = _docs_ds(rows)
        assert tfidf_cosine_pairs(ds, threshold=0.01, ngram=3,
                                  max_df=2).to_pandas().empty
        assert len(tfidf_cosine_pairs(ds, threshold=0.01, ngram=3,
                                      max_df=3).to_pandas()) == 3

    def test_df1_grams_dilute_norms(self, ray_session):
        # docs share one gram but each carries a unique df=1 gram whose
        # weight (idf = ln N) must stay in the norm
        ds = _docs_ds([
            {"doc_id": 1, "text": "s h a r e d uniq1 x1 y1"},
            {"doc_id": 2, "text": "s h a r e d uniq2 x2 y2"},
            # third doc keeps df(shared grams)=2 < N so idf stays > 0
            {"doc_id": 3, "text": "unrelated filler content here"},
        ])
        out = tfidf_cosine_pairs(ds, threshold=0.0, ngram=3).to_pandas()
        assert len(out) == 1
        assert 0 < out["cosine"][0] < 1  # diluted: NOT a perfect match

    def test_short_and_null_docs(self, ray_session):
        ds = _docs_ds([
            {"doc_id": 1, "text": "ab"},        # < ngram words
            {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": "p q r s"},
            {"doc_id": 4, "text": "p q r s"},
        ])
        out = tfidf_cosine_pairs(ds, threshold=0.5, ngram=3).to_pandas()
        assert len(out) == 1
        assert (int(out["doc_a"][0]), int(out["doc_b"][0])) == (3, 4)

    def test_max_broadcast_guard(self, ray_session):
        ds = _docs_ds([
            {"doc_id": 1, "text": "a b c d"},
            {"doc_id": 2, "text": "a b c d"},
        ])
        with pytest.raises(ValueError, match="max_broadcast"):
            tfidf_cosine_pairs(ds, max_broadcast=1).to_pandas()


class TestBigramLogloss:
    def test_hand_computed(self, ray_session):
        import numpy as np

        from deduplicator_ray.stages.textstats import bigram_logloss

        # min_ppm=0 -> every word is in-vocab; tiny corpus, check by hand
        ds = _docs_ds([
            {"doc_id": 1, "text": "a b a b"},
            {"doc_id": 2, "text": "a b"},
            {"doc_id": 3, "text": "c"},       # 1 token: no bigram
        ])
        out = (bigram_logloss(ds, min_ppm=0).to_pandas()
               .sort_values("doc_id", ignore_index=True))
        assert list(out["n_bigrams"]) == [3, 1, 0]
        assert np.isnan(out["logloss"][2])
        # corpus bigrams: (a,b)x3, (b,a)x1; V=3, V+1=4
        # C(a,.)=3, C(b,.)=1; P(b|a)=(3+1)/(3+4)=4/7; P(a|b)=(1+1)/(1+4)=2/5
        import math
        p_ab, p_ba = 4 / 7, 2 / 5
        want1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
        want2 = -math.log(p_ab)
        assert out["logloss"][0] == pytest.approx(want1, rel=1e-12)
        assert out["logloss"][1] == pytest.approx(want2, rel=1e-12)

    def test_oov_collapse(self, ray_session):
        from deduplicator_ray.stages.textstats import bigram_logloss

        # min_ppm so high that NOTHING is in-vocab: all tokens collapse
        # to OOV, every bigram is (OOV, OOV) -> all docs score equally
        ds = _docs_ds([
            {"doc_id": 1, "text": "x y z"},
            {"doc_id": 2, "text": "p q r"},
        ])
        out = bigram_logloss(ds, min_ppm=1_000_000).to_pandas()
        assert out["logloss"].nunique() == 1

    def test_no_cross_doc_bigrams(self, ray_session):
        import math

        from deduplicator_ray.stages.textstats import bigram_logloss

        # if the (b, a) bigram leaked across the doc boundary, C(b,.)
        # would be nonzero and doc 1's score would change
        ds = _docs_ds([
            {"doc_id": 1, "text": "a b"},
            {"doc_id": 2, "text": "a b"},
        ])
        out = (bigram_logloss(ds, min_ppm=0).to_pandas()
               .sort_values("doc_id", ignore_index=True))
        # V=2: only bigram is (a,b)x2 -> P(b|a)=(2+1)/(2+3)=3/5
        want = -math.log(3 / 5)
        assert out["logloss"][0] == pytest.approx(want, rel=1e-12)
        assert out["logloss"][1] == pytest.approx(want, rel=1e-12)


class TestKMeans:
    def _ds(self, X, ids=None):
        import ray.data as rd

        ids = ids if ids is not None else list(range(len(X)))
        return rd.from_pandas(pd.DataFrame({
            "vec_id": np.asarray(ids, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in X],
        }))

    def test_separated_clusters(self, ray_session):
        from deduplicator_ray.stages.embed import kmeans_assign

        rng = np.random.default_rng(7)
        a = rng.normal(0, 0.05, (20, 4)) + np.array([5, 0, 0, 0])
        b = rng.normal(0, 0.05, (20, 4)) + np.array([0, 5, 0, 0])
        X = np.concatenate([a, b])
        out = (kmeans_assign(self._ds(X), k=2, iters=3).to_pandas()
               .sort_values("vec_id", ignore_index=True))
        c = out["cluster"].to_numpy()
        assert len(set(c[:20])) == 1 and len(set(c[20:])) == 1
        assert c[0] != c[20]
        # init = vectors of the 2 smallest ids (both in cluster a) but
        # Lloyd must still separate them after the first update? No —
        # both seeds in one blob CAN split that blob; this seed setup
        # has id 0 in a and id 20 in b only if ids interleave. Keep the
        # deterministic contract check instead: same input -> same out.
        out2 = (kmeans_assign(self._ds(X), k=2, iters=3).to_pandas()
                .sort_values("vec_id", ignore_index=True))
        assert (out2["cluster"].to_numpy() == c).all()

    def test_zero_iters_is_seed_assignment(self, ray_session):
        from deduplicator_ray.stages.embed import kmeans_assign

        X = np.array([[0.0, 0], [10, 10], [0.1, 0], [9.9, 10]])
        out = (kmeans_assign(self._ds(X), k=2, iters=0).to_pandas()
               .sort_values("vec_id", ignore_index=True))
        # seeds = ids 0,1 -> clusters 0,1; nearest-seed assignment
        assert list(out["cluster"]) == [0, 1, 0, 1]

    def test_k_exceeds_corpus(self, ray_session):
        from deduplicator_ray.stages.embed import kmeans_assign

        with pytest.raises(ValueError, match="exceeds"):
            kmeans_assign(self._ds(np.zeros((3, 2))), k=5).to_pandas()

    def test_empty_cluster_keeps_centroid(self, ray_session):
        from deduplicator_ray.stages.embed import kmeans_assign

        # seed 1 (id=1) is a far outlier that captures nothing after
        # round 1 re-centers seed 0 onto the blob: the outlier centroid
        # must persist (not NaN out), and the far point keeps cluster 1
        X = np.array([[0.0, 0], [100, 100], [0.2, 0], [0.3, 0]])
        out = (kmeans_assign(self._ds(X), k=2, iters=4).to_pandas()
               .sort_values("vec_id", ignore_index=True))
        assert list(out["cluster"]) == [0, 1, 0, 0]


def test_dsir_logratio_prefers_target_like_docs(ray_session):
    """DSIR importance weights: a raw doc written in the target domain's
    vocabulary outscores one written in raw-only vocabulary; OOV-only
    docs score the constant unseen-mass ratio."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.textstats import dsir_logratio

    tgt_words = "med health dose trial patient"
    raw_words = "sport goal match team score"
    target = pd.DataFrame({
        "doc_id": range(5), "text": [tgt_words] * 5})
    raw = pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [tgt_words,                  # target-like
                 raw_words,                  # raw-typical
                 "zz1 zz2 zz3 zz4 zz5"],     # OOV everywhere
    })
    # raw corpus must contain enough raw_words mass for the vocab
    filler = pd.DataFrame({
        "doc_id": range(100, 120), "text": [raw_words] * 20})
    raw_all = pd.concat([raw, filler], ignore_index=True)
    got = (dsir_logratio(rd.from_pandas(raw_all), rd.from_pandas(target),
                         min_ppm=1000, num_buckets=4)
           .to_pandas().set_index("doc_id"))
    s = got["logratio_micro"]
    assert s.loc[10] > s.loc[12] > s.loc[11]  # target-like > rare > raw-like
    assert s.loc[10] > 0 and s.loc[11] < 0
    # doc 12's exact score from the model parameters: at this scale every
    # word passes 1000 ppm, so V = 15 (tgt + raw + zz families), n_raw =
    # 115, n_tgt = 25, and each zz word has c_raw = 1, c_tgt = 0
    expected = np.log((0 + 1) / (25 + 15 + 1)) - np.log((1 + 1) / (115 + 15 + 1))
    assert s.loc[12] == int(np.floor(expected * 1e6 + 0.5))


def test_bpe_merge_candidates_bruteforce(ray_session):
    import collections

    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.lexical import bpe_merge_candidates

    docs = ["low lower lowest", "new newer newest", "wide wider", "", "a"]
    got = bpe_merge_candidates(
        rd.from_pandas(pd.DataFrame({"text": docs})).repartition(3), top_k=50)
    cnt = collections.Counter()
    for d in docs:
        for w in d.split(" "):
            for x, y in zip(w, w[1:]):
                cnt[(x, y)] += 1
    want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))
    assert [((r.a, r.b), r.n) for r in got.itertuples(index=False)] == want
    # 'lo' appears 3x, never across the space boundary
    assert cnt[("l", "o")] == 3 and ("w", "l") not in cnt
    # unicode pairs survive the codepoint path
    g2 = bpe_merge_candidates(
        rd.from_pandas(pd.DataFrame({"text": ["héé héé", None]})), top_k=5)
    assert [(r.a, r.b, r.n) for r in g2.itertuples(index=False)] == [
        ("h", "é", 2), ("é", "é", 2)]


def test_pmi_collocations_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.lexical import pmi_collocations

    rng = np.random.default_rng(7)
    base = ["the", "of", "a", "data", "york"]
    texts = []
    for _ in range(60):
        toks = list(rng.choice(base, size=8))
        toks[2:4] = ["new", "york"]          # planted collocation
        texts.append(" ".join(toks))
    texts.append("")                          # empty doc: 1 token, no bigram
    docs = pd.DataFrame({"text": texts})

    got = pmi_collocations(rd.from_pandas(docs).repartition(4), top_k=5,
                           min_count=3, num_buckets=4)

    # brute force over the same bigram event space
    from collections import Counter
    bc = Counter()
    for t in texts:
        w = t.split(" ")
        bc.update(zip(w, w[1:]))
    n_total = sum(bc.values())
    ca, cb = Counter(), Counter()
    for (a, b), n in bc.items():
        ca[a] += n
        cb[b] += n
    rows = [(a, b, n,
             int(np.floor(np.log((np.float64(n) * n_total)
                                 / (np.float64(ca[a]) * cb[b]))
                          * 1_000_000 + 0.5)))
            for (a, b), n in bc.items() if n >= 3]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = pd.DataFrame(rows[:5], columns=["a", "b", "n", "pmi_micro"])
    want["n"] = want["n"].astype("int64")
    want["pmi_micro"] = want["pmi_micro"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert got.iloc[0][["a", "b"]].tolist() == ["new", "york"]


def test_pmi_collocations_guards(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.lexical import pmi_collocations

    docs = pd.DataFrame({"text": ["a b a b a b", "a b"]})
    with pytest.raises(ValueError, match="top_k"):
        pmi_collocations(rd.from_pandas(docs), top_k=0)
    with pytest.raises(ValueError, match="max_candidates"):
        pmi_collocations(rd.from_pandas(docs), min_count=1,
                         max_candidates=1)
    empty = pmi_collocations(rd.from_pandas(
        pd.DataFrame({"text": pd.Series([], dtype=object)})))
    assert len(empty) == 0
    assert list(empty.columns) == ["a", "b", "n", "pmi_micro"]
