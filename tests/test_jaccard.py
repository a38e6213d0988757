"""Prefix-filter exact Jaccard stage (stages/jaccard.py): completeness vs
a brute-force all-pairs oracle, lang blocking, and loud mega-group
failure instead of silent O(n^2)."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest

from deduplicator_ray.stages.jaccard import _gram_hashes, ngram_jaccard_pairs

NGRAM = 3


def _brute_pairs(pdf: pd.DataFrame, num: int, den: int) -> set[tuple]:
    """All-pairs exact Jaccard over hashed gram sets (the SQL oracle's
    semantics, modulo 64-bit hash collisions)."""
    grams = [set(_gram_hashes(t, NGRAM).tolist()) for t in pdf["text"]]
    out = set()
    for i in range(len(pdf)):
        for j in range(i + 1, len(pdf)):
            if pdf["lang"].iloc[i] != pdf["lang"].iloc[j]:
                continue
            inter = len(grams[i] & grams[j])
            union = len(grams[i]) + len(grams[j]) - inter
            if inter > 0 and den * inter >= num * union:
                a, b = int(pdf["doc_id"].iloc[i]), int(pdf["doc_id"].iloc[j])
                out.add((min(a, b), max(a, b), inter, union))
    return out


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(120):
        base = " ".join(rng.choice(vocab, size=30))
        rows.append((2 * i, rng.choice(["en", "de"]), base))
        # half the docs get a close variant (high Jaccard partner)
        if i % 2 == 0:
            words = base.split()
            words[rng.integers(len(words))] = "zz"
            rows.append((2 * i + 1, rows[-1][1], " ".join(words)))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_matches_brute_force_exactly(ray_session, docs):
    import ray.data as rd

    got = ngram_jaccard_pairs(rd.from_pandas(docs)).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"], got["n_inter"], got["n_union"]))
    want = _brute_pairs(docs, 1, 2)
    assert len(want) > 20
    assert found == want


def test_lang_blocking(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "de"],
            "text": ["a b c d e f", "a b c d e f"],  # identical, different lang
        }
    )
    got = ngram_jaccard_pairs(rd.from_pandas(pdf)).to_pandas()
    assert len(got) == 0
    # without lang blocking the pair appears
    got2 = ngram_jaccard_pairs(rd.from_pandas(pdf), lang_col=None).to_pandas()
    assert len(got2) == 1


def test_mega_group_fails_loudly(ray_session):
    """A gram present in every doc's prefix must raise (completeness
    cannot be silently degraded), not explode O(n^2)."""
    import ray.data as rd

    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "lang": ["en"] * 30,
            # all docs share all grams -> one bucket holds all 30 docs
            "text": ["common shared gram text here always"] * 30,
        }
    )
    with pytest.raises(Exception, match="max_band_group"):
        ngram_jaccard_pairs(rd.from_pandas(pdf), max_group=10).to_pandas()


def test_short_and_empty_texts(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["en"] * 3,
            "text": ["", "one two", "one two three one two three"],
        }
    )
    got = ngram_jaccard_pairs(rd.from_pandas(pdf)).to_pandas()
    assert len(got) == 0  # <3-word docs have no grams; no pairs


def test_containment_pairs_vs_bruteforce(ray_session):
    import itertools
    import re as _re

    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_containment_pairs

    rng = np.random.default_rng(41)
    vocab = [f"v{i}" for i in range(200)]
    boiler = "site nav footer"  # appears in EVERY doc -> df > stop_df
    docs = []
    for i in range(30):
        body = " ".join(rng.choice(vocab, size=25))
        docs.append(f"{boiler} {body}")
    # plant: doc 30 is a short quote fully contained in doc 5's text
    quote = " ".join(docs[5].split()[8:16])
    docs.append(f"{boiler} {quote}")
    pdf = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                        "text": docs})
    num, den, ngram, stop_df = 7, 10, 3, 5

    got = (ngram_containment_pairs(rd.from_pandas(pdf).repartition(4),
                                   num=num, den=den, ngram=ngram,
                                   stop_df=stop_df, num_partitions=8)
           .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    # brute force on string grams
    def gramset(t):
        w = _re.findall(r"[a-z0-9]+", t.lower())
        return {" ".join(w[i:i + ngram]) for i in range(len(w) - ngram + 1)}

    gs = [gramset(t) for t in docs]
    dfc = collections.Counter(g for s in gs for g in s)
    rare = [{g for g in s if dfc[g] <= stop_df} for s in gs]
    want = []
    for a, b in itertools.combinations(range(len(docs)), 2):
        i = len(rare[a] & rare[b])
        m = min(len(rare[a]), len(rare[b]))
        if i > 0 and den * i >= num * m:
            want.append((a, b, i, m))
    wdf = pd.DataFrame(want, columns=["doc_a", "doc_b", "n_inter", "n_min"])
    pd.testing.assert_frame_equal(
        got, wdf.astype(got.dtypes.to_dict()).sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True))
    # the planted quote pair is found, and the boilerplate alone isn't a pair
    assert ((got["doc_a"] == 5) & (got["doc_b"] == 30)).any()


def test_containment_rejects_bad_args(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import ngram_containment_pairs

    pdf = pd.DataFrame({"doc_id": [1], "text": ["a b c d"]})
    with pytest.raises(ValueError, match="stop_df"):
        ngram_containment_pairs(rd.from_pandas(pdf), stop_df=1)
    with pytest.raises(ValueError, match="num"):
        ngram_containment_pairs(rd.from_pandas(pdf), num=0)


# ---------------------------------------------------------------------------
# weighted (multiset) Jaccard
# ---------------------------------------------------------------------------

def _brute_weighted(pdf: pd.DataFrame, num: int, den: int,
                    ngram: int = NGRAM) -> set[tuple]:
    """All-pairs exact weighted Jaccard over hashed gram COUNTS."""
    from deduplicator_ray.stages.jaccard import _gram_tf

    tfs = []
    for t in pdf["text"]:
        arr = _gram_tf(t, ngram).reshape(-1, 2)
        tfs.append(dict(zip(arr[:, 0].tolist(), arr[:, 1].tolist())))
    out = set()
    for i in range(len(pdf)):
        for j in range(i + 1, len(pdf)):
            if pdf["lang"].iloc[i] != pdf["lang"].iloc[j]:
                continue
            a, b = tfs[i], tfs[j]
            inter = sum(min(c, b[g]) for g, c in a.items() if g in b)
            union = sum(a.values()) + sum(b.values()) - inter
            if inter > 0 and den * inter >= num * union:
                da, db = int(pdf["doc_id"].iloc[i]), int(pdf["doc_id"].iloc[j])
                out.add((min(da, db), max(da, db), inter, union))
    return out


def test_weighted_matches_brute_force(ray_session, docs):
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import weighted_jaccard_pairs

    got = weighted_jaccard_pairs(rd.from_pandas(docs)).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"], got["w_inter"], got["w_union"]))
    want = _brute_weighted(docs, 1, 2)
    assert len(want) > 20
    assert found == want


def test_weighted_separates_repeated_boilerplate(ray_session):
    """The operator's point: doc B repeats doc A's text 5x.  The
    DISTINCT-gram Jaccard is ~1 (same gram set), but the weighted
    Jaccard is ~1/5 — the multiset view sees the repetition."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import weighted_jaccard_pairs

    base = " ".join(f"tok{i}" for i in range(30))
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "lang": ["en", "en"],
        "text": [base, " ".join([base] * 5)],
    })
    # set-Jaccard accepts the pair at t=1/2
    set_pairs = ngram_jaccard_pairs(rd.from_pandas(pdf)).to_pandas()
    assert len(set_pairs) == 1
    # weighted Jaccard rejects it at t=1/2 ...
    wj = weighted_jaccard_pairs(rd.from_pandas(pdf)).to_pandas()
    assert len(wj) == 0
    # ... and accepts at t<=1/6 (J_w is just under 1/5: the 5x doc also
    # gains bridge grams across the repeat seams)
    wj6 = weighted_jaccard_pairs(rd.from_pandas(pdf), num=1, den=6).to_pandas()
    assert len(wj6) == 1
    r = wj6.iloc[0]
    assert r["w_inter"] * 6 >= r["w_union"]


def test_weighted_prefix_completeness_randomized(ray_session):
    """Randomized check of the weighted prefix-filter bound: skewed
    multisets (Zipf-ish counts), several thresholds — the pipeline must
    find exactly the brute-force pair set every time."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import weighted_jaccard_pairs

    rng = np.random.default_rng(23)
    vocab = [f"v{i}" for i in range(12)]
    rows = []
    for i in range(60):
        n = int(rng.integers(4, 25))
        words = rng.choice(vocab, size=n, p=None).tolist()
        # heavy repetition: double a random word several times
        words += [words[0]] * int(rng.integers(0, 6))
        rows.append((i, "en", " ".join(words)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    for num, den in ((1, 2), (2, 5), (7, 10)):
        got = weighted_jaccard_pairs(rd.from_pandas(pdf), num=num, den=den,
                                     ngram=1).to_pandas()
        found = set(zip(got["doc_a"], got["doc_b"],
                        got["w_inter"], got["w_union"]))
        want = _brute_weighted(pdf, num, den, ngram=1)
        assert found == want, f"t={num}/{den}: {len(found)} vs {len(want)}"


def test_cws_estimator_collision_probability():
    """Ioffe CWS property: P(sample_k(A) == sample_k(B)) = J_w(A, B).
    Pure-numpy check of the sketch kernel, no Ray."""
    from deduplicator_ray.stages.jaccard import _cws_samples

    rng = np.random.default_rng(7)
    gh = rng.integers(0, 2**63, size=40).astype(np.uint64)
    ca = rng.integers(1, 9, size=40).astype(np.uint64)
    cb = ca.copy()
    cb[:20] = rng.integers(1, 9, size=20)  # perturb half the counts
    jw = np.minimum(ca, cb).sum() / np.maximum(ca, cb).sum()
    K = 4096
    sa = _cws_samples(gh, ca, K, seed=42)
    sb = _cws_samples(gh, cb, K, seed=42)
    est = float((sa == sb).mean())
    # K=4096 -> stderr ~ sqrt(j(1-j)/K) ~ 0.008; allow 5 sigma
    assert abs(est - jw) < 0.04, (est, jw)


def test_cws_pipeline_matches_exact_weighted(ray_session, docs):
    """The CWS sketch path (sketch -> band -> candidate -> exact verify)
    must reproduce the exact prefix-filter path's pair set: precision 1
    by construction (shared verify kernel), recall gated here.  Seeded,
    so the assertion is deterministic."""
    import ray.data as rd

    from deduplicator_ray.stages.jaccard import (cws_jaccard_pairs,
                                                 weighted_jaccard_pairs)

    exact = weighted_jaccard_pairs(rd.from_pandas(docs)).to_pandas()
    want = set(zip(exact["doc_a"], exact["doc_b"],
                   exact["w_inter"], exact["w_union"]))
    got_t = cws_jaccard_pairs(rd.from_pandas(docs)).to_pandas()
    got = set(zip(got_t["doc_a"], got_t["doc_b"],
                  got_t["w_inter"], got_t["w_union"]))
    assert len(want) > 20
    assert got <= want          # exact verify => no false positives
    assert len(got) / len(want) >= 0.99


def test_cws_samples_permutation_invariant():
    """Ioffe samples are a pure function of the MULTISET: permuting the
    (gram, count) entry order never changes a single sample id (the
    property that makes the sketch partitioning-independent).  Property
    test over random multisets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from deduplicator_ray.stages.jaccard import _cws_samples

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 2**32), st.integers(2, 30), st.integers(0, 999))
    def check(seed, m, perm_seed):
        rng = np.random.default_rng(seed)
        gh = np.unique(rng.integers(0, 2**63, size=m).astype(np.uint64))
        cnt = rng.integers(1, 50, size=len(gh)).astype(np.uint64)
        base = _cws_samples(gh, cnt, 32, seed=7)
        p = np.random.default_rng(perm_seed).permutation(len(gh))
        again = _cws_samples(gh[p], cnt[p], 32, seed=7)
        np.testing.assert_array_equal(base, again)

    check()
