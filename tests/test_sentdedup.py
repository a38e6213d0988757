"""chunk_dedup (C4-style global chunk dedup) + repetition_stats (Gopher
A1.1 metrics) vs brute-force mirrors of the documented semantics."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest

from deduplicator_ray.stages.sentdedup import chunk_dedup, repetition_stats

W = 10


def _chunks(text: str, w: int = W) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[i:i + w]) for i in range(0, len(words), w)]


def _brute_dedup(docs: dict[int, str], w: int = W) -> pd.DataFrame:
    seen: set[str] = set()
    rows = []
    for doc_id in sorted(docs):
        kept, removed = [], 0
        for ch in _chunks(docs[doc_id], w):
            if ch in seen:
                removed += 1
            else:
                seen.add(ch)
                kept.append(ch)
        rows.append({"doc_id": doc_id, "text_dedup": " ".join(kept),
                     "removed_chunks": removed})
    return pd.DataFrame(rows)


def _mk_docs(rng: np.random.Generator, n: int = 40) -> dict[int, str]:
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for i in range(n):
        nw = int(rng.integers(1, 45))
        docs[i] = " ".join(rng.choice(vocab, nw))
    # planted duplications
    docs[n] = docs[0]                                   # full copy
    docs[n + 1] = docs[1] + " " + docs[2]               # concatenation
    shared = " ".join(f"s{j}" for j in range(W))        # one exact chunk,
    docs[n + 2] = shared + " tailA tailB"               # twice, aligned
    docs[n + 3] = shared + " other words here"
    return docs


def test_chunk_dedup_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    docs = _mk_docs(rng)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs]}
    ))
    got = (chunk_dedup(ds, words_per_chunk=W, num_buckets=8)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    want = _brute_dedup(docs).sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["removed_chunks"].tolist() == want["removed_chunks"].tolist()
    assert got["text_dedup"].tolist() == want["text_dedup"].tolist()
    # planted expectations really fired
    assert want.loc[want.doc_id == len(docs) - 4, "removed_chunks"].iloc[0] > 0
    assert (want.loc[want.doc_id == len(docs) - 4, "text_dedup"].iloc[0] == "")


def test_chunk_dedup_unique_roundtrip(ray_session):
    """No duplicate chunks -> byte-exact round trip (split/join inverse)."""
    import ray.data as rd

    docs = {i: " ".join(f"u{i}_{j}" for j in range(1 + (i * 7) % 23))
            for i in range(30)}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs]}
    ))
    got = (chunk_dedup(ds, words_per_chunk=W, num_buckets=4)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert got["text_dedup"].tolist() == [docs[k] for k in sorted(docs)]
    assert got["removed_chunks"].sum() == 0


def test_chunk_dedup_shuffle_path_equals_broadcast(ray_session):
    """max_broadcast=0 forces the co-partition rebuild; output must be
    row-identical to the broadcast map-side rebuild (default path)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    docs = _mk_docs(rng, n=30)
    pdf = pd.DataFrame({"doc_id": list(docs), "text": [docs[k] for k in docs]})
    a = (chunk_dedup(rd.from_pandas(pdf), words_per_chunk=W, num_buckets=8)
         .to_pandas().sort_values("doc_id", ignore_index=True))
    b = (chunk_dedup(rd.from_pandas(pdf), words_per_chunk=W, num_buckets=8,
                     max_broadcast=0)
         .to_pandas().sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)


def test_decontaminate_matches_bruteforce(ray_session):
    """Hash-fingerprint membership must agree with exact-string n-gram
    overlap (the DuckDB oracle's semantics) on planted contamination."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import decontaminate

    N = 8
    rng = np.random.default_rng(5)
    docs = _mk_docs(rng, n=30)
    secret = " ".join(f"k{j}" for j in range(N + 3))
    docs[100] = "prefix " + secret + " suffix words"       # bench doc
    docs[101] = "other " + secret                          # contaminated
    docs[103] = secret + " " + secret                      # multi-hit
    bench_ids = {i for i in docs if i % 2 == 0}

    def grams(t):
        w = t.split(" ")
        return [" ".join(w[i:i + N]) for i in range(len(w) - N + 1)]

    bench_set = set()
    for i in bench_ids:
        bench_set.update(grams(docs[i]))
    want = {}
    for i in sorted(set(docs) - bench_ids):
        hits = sum(g in bench_set for g in grams(docs[i]))
        want[i] = hits

    pdf = pd.DataFrame({"doc_id": list(docs), "text": [docs[k] for k in docs]})
    bench = rd.from_pandas(pdf[pdf.doc_id.isin(bench_ids)])
    train = rd.from_pandas(pdf[~pdf.doc_id.isin(bench_ids)])
    got = (decontaminate(train, bench, ngram=N)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert got["doc_id"].tolist() == sorted(want)
    assert got["n_hits"].tolist() == [want[i] for i in sorted(want)]
    assert got["contaminated"].tolist() == [want[i] > 0 for i in sorted(want)]
    assert want[101] > 0 and want[103] > want[101]  # plants actually fired


def test_decontaminate_empty_benchmark(ray_session):
    """A benchmark with zero n-grams (empty, or every doc shorter than
    the n-gram) must yield all n_hits=0, not an IndexError."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import decontaminate

    train = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": [" ".join(f"x{i}" for i in range(20)),
                                    "short doc"]}
    ))
    bench = rd.from_pandas(pd.DataFrame(
        {"doc_id": [9], "text": ["only three words"]}  # < 8 words: no grams
    ))
    got = decontaminate(train, bench, ngram=8).to_pandas()
    assert got["n_hits"].tolist() == [0, 0]
    assert got["contaminated"].tolist() == [False, False]


def test_null_text_handling(ray_session):
    """Null text counts as '' everywhere (crash regression: factorize on
    an all-null batch made codes.max() reduce over an empty array)."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import repetition_stats

    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": pd.array([None, "a b a", None], dtype="string")})
    ds = rd.from_pandas(pdf)
    rep = repetition_stats(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    assert rep["n_words"].tolist() == [1, 3, 1]  # "" splits to one empty word
    assert rep["top_word_n"].tolist() == [1, 2, 1]
    ded = (chunk_dedup(ds, words_per_chunk=2, num_buckets=4)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert ded["doc_id"].tolist() == [1, 2, 3]  # null-text docs keep a row
    # the two null docs share the "" chunk: second occurrence removed
    assert ded["removed_chunks"].tolist() == [0, 0, 1]


def test_repetition_stats_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    docs = _mk_docs(rng, n=25)
    docs[999] = "solo"  # single word: no bigrams -> top_bigram_n == 0
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs]}
    ))
    got = (repetition_stats(ds).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    for _, row in got.iterrows():
        words = docs[row.doc_id].split(" ")
        wc = collections.Counter(words)
        bc = collections.Counter(zip(words, words[1:]))
        assert row.n_words == len(words)
        assert row.n_distinct == len(wc)
        assert row.top_word_n == max(wc.values())
        assert row.top_bigram_n == (max(bc.values()) if bc else 0)


def test_doc_novelty_ownership_and_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import doc_novelty

    a = "w1 w2 w3 w4"          # doc 0: grams (w1..w3), (w2..w4) — owns both
    b = "w2 w3 w4 w5"          # doc 1: (w2..w4) owned by 0; (w3 w4 w5) novel
    c = "w1 w2 w3 w4"          # doc 2: all grams owned by 0 -> novelty 0
    d = "x y"                  # doc 3: < 3 words -> no row
    pdf = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                        "text": [a, b, c, d]})
    got = (doc_novelty(rd.from_pandas(pdf).repartition(3), ngram=3,
                       num_buckets=4)
           .to_pandas().set_index("doc_id").sort_index())
    assert list(got.index) == [0, 1, 2]
    assert got.loc[0].tolist() == [2, 2]
    assert got.loc[1].tolist() == [2, 1]
    assert got.loc[2].tolist() == [2, 0]
    # within-doc repeated grams count once
    e = pd.DataFrame({"doc_id": [7], "text": ["z z z z z"]})
    ge = doc_novelty(rd.from_pandas(e), ngram=3, num_buckets=2).to_pandas()
    assert ge.loc[0, "n_grams"] == 1 and ge.loc[0, "n_novel"] == 1


def test_source_overlap_matrix_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import source_overlap_matrix

    pdf = pd.DataFrame({
        "doc_id": range(4),
        "source": ["A", "A", "B", "C"],
        "text": [
            "w1 w2 w3 w4",       # A: grams g1=(w1..w3), g2=(w2..w4)
            "w2 w3 w4 w5",       # A: g2, g3
            "w2 w3 w4 x",        # B: g2, (w3 w4 x)
            "w9 w8 w7",          # C: disjoint
        ],
    })
    got = (source_overlap_matrix(rd.from_pandas(pdf).repartition(3),
                                 ngram=3, num_buckets=4)
           .set_index(["source_a", "source_b"]).sort_index())
    # A∩B share exactly gram g2 (w2 w3 w4); C shares nothing
    assert got.loc[("A", "B"), "n_shared"] == 1
    assert ("A", "C") not in got.index and ("B", "C") not in got.index
    # symmetric duplicates never emitted (only a < b)
    assert ("B", "A") not in got.index


def _brute_boilerplate(docs: dict[int, str], k: int, w: int = W) -> pd.DataFrame:
    cnt = collections.Counter(
        ch for d in docs.values() for ch in _chunks(d, w))
    rows = []
    for doc_id in sorted(docs):
        kept, removed = [], 0
        for ch in _chunks(docs[doc_id], w):
            if cnt[ch] >= k:
                removed += 1
            else:
                kept.append(ch)
        rows.append({"doc_id": doc_id, "text_dedup": " ".join(kept),
                     "removed_chunks": removed})
    return pd.DataFrame(rows)


def test_boilerplate_dedup_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import boilerplate_dedup

    rng = np.random.default_rng(11)
    docs = _mk_docs(rng)
    # plant a 3x boilerplate chunk across three docs
    nav = " ".join(f"nav{j}" for j in range(W))
    for i in (0, 5, 9):
        docs[i] = nav + " " + docs[i]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[kk] for kk in docs]}
    )).repartition(4)
    got = (boilerplate_dedup(ds, words_per_chunk=W, min_count=3, num_buckets=8)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    want = _brute_boilerplate(docs, 3).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # all three planted occurrences went (not keep-first)
    assert want["removed_chunks"].sum() >= 3


def test_boilerplate_dedup_below_threshold_roundtrip(ray_session):
    """Chunks appearing < min_count survive untouched — a corpus of
    pairwise duplicates round-trips byte-exact at min_count=3."""
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import boilerplate_dedup

    docs = {i: " ".join(f"p{i // 2}_{j}" for j in range(15)) for i in range(8)}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[kk] for kk in docs]}
    ))
    got = (boilerplate_dedup(ds, words_per_chunk=W, min_count=3, num_buckets=4)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert got["text_dedup"].tolist() == [docs[kk] for kk in sorted(docs)]
    assert got["removed_chunks"].sum() == 0


def test_boilerplate_report_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import boilerplate_report

    rng = np.random.default_rng(23)
    docs = _mk_docs(rng, n=30)
    nav = " ".join(f"nav{j}" for j in range(W))
    foot = " ".join(f"ft{j}" for j in range(W))
    for i in (0, 3, 6, 12):
        docs[i] = nav + " " + docs[i]
    docs[3] = nav + " " + docs[3]          # nav twice in one doc
    for i in (1, 4, 7):
        docs[i] = docs[i] + " " + foot
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[kk] for kk in docs]}
    )).repartition(5)
    got = boilerplate_report(ds, words_per_chunk=W, min_count=3, top_n=10,
                             num_buckets=8).to_pandas()
    cnt = collections.Counter(
        ch for d in docs.values() for ch in _chunks(d, W))
    dcnt = collections.Counter()
    for d in docs.values():
        for ch in set(_chunks(d, W)):
            dcnt[ch] += 1
    want = sorted(((c, n) for c, n in cnt.items() if n >= 3),
                  key=lambda t: (-t[1], t[0]))[:10]
    assert list(zip(got["chunk"], got["n_occ"])) == want
    assert got.set_index("chunk")["n_docs"].to_dict() == {
        c: dcnt[c] for c, _ in want}
    # nav appears 5x across 4 docs: occurrence vs doc count differ
    assert got.set_index("chunk").loc[nav, "n_occ"] == 5
    assert got.set_index("chunk").loc[nav, "n_docs"] == 4


def test_decontaminate_norm_catches_case_variants(ray_session):
    """Normalized decontamination flags a doc whose contamination is
    hidden behind case/punctuation; raw decontamination misses it."""
    import ray.data as rd

    from deduplicator_ray.functions.textnorm import normalize_text_arrow
    from deduplicator_ray.stages.sentdedup import decontaminate
    import pyarrow as pa
    import pyarrow.compute as pc

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    bench = pd.DataFrame({"doc_id": [0], "text": [passage]})
    train = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [passage.upper() + "!!",        # variant-contaminated
                 "unrelated words " * 5],
    })

    def normed(pdf):
        ds = rd.from_pandas(pdf)
        return ds.map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "text": normalize_text_arrow(pc.fill_null(b["text"], "")),
            }), batch_format="pyarrow", zero_copy_batch=True)

    raw = (decontaminate(rd.from_pandas(train), rd.from_pandas(bench),
                         ngram=8)
           .to_pandas().set_index("doc_id"))
    assert not raw["contaminated"].any()   # case hides it from raw scan

    nrm = (decontaminate(normed(train), normed(bench), ngram=8)
           .to_pandas().set_index("doc_id"))
    assert bool(nrm.loc[1, "contaminated"]) and nrm.loc[1, "n_hits"] >= 1
    assert not nrm.loc[2, "contaminated"]


def test_dup_gram_coverage_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import dup_gram_coverage

    docs = {
        0: "a b c a b c x",         # 'a b c' twice: covers [0..2]+[3..5]=6/7
        1: "q q q q",               # 'q q q' at 0 and 1: covers all 4
        2: "u v w x y z",           # no repeats
        3: "",                      # one empty token, no gram
        4: "r s r s r s r s",      # 'r s r' x3, 's r s' x3: covers all 8
    }
    got = (dup_gram_coverage(
        rd.from_pandas(pd.DataFrame(
            {"doc_id": list(docs), "text": [docs[k] for k in docs]}
        )).repartition(3), ngram=3)
        .to_pandas().set_index("doc_id").sort_index())

    def brute(t, n=3):
        w = t.split(" ")
        grams = [tuple(w[i:i + n]) for i in range(len(w) - n + 1)]
        dup = {g for g in grams if grams.count(g) >= 2}
        cov = set()
        for i, g in enumerate(grams):
            if g in dup:
                cov.update(range(i, i + n))
        return len(w), len(cov)

    for d, t in docs.items():
        n_tok, cov = brute(t)
        assert got.loc[d, "n_tokens"] == n_tok, d
        assert got.loc[d, "covered_tokens"] == cov, d
        assert got.loc[d, "dup_gram_ppm"] == cov * 1_000_000 // n_tok, d
    assert got.loc[0, "covered_tokens"] == 6
    assert got.loc[1, "covered_tokens"] == 4
    assert got.loc[2, "covered_tokens"] == 0


def test_onion_coverage_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import onion_coverage

    rng = np.random.default_rng(11)
    docs = _mk_docs(rng, n=30)
    # plant a doc that is pure copy of another and a short (<n) doc
    docs[900] = docs[sorted(docs)[0]]
    docs[901] = "only two"
    pdf = pd.DataFrame({"doc_id": sorted(docs),
                        "text": [docs[k] for k in sorted(docs)]})
    out = (onion_coverage(rd.from_pandas(pdf).repartition(5),
                          ngram=3, num_buckets=7, threshold_ppm=500_000)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # brute force: gram -> set of docs; positions per doc
    gram_docs: dict[tuple, set] = collections.defaultdict(set)
    per_doc: dict[int, list] = {}
    for did in sorted(docs):
        words = docs[did].split(" ")
        grams = [tuple(words[i:i + 3]) for i in range(len(words) - 2)]
        per_doc[did] = grams
        for g in grams:
            gram_docs[g].add(did)
    rows = []
    for did in sorted(docs):
        grams = per_doc[did]
        if not grams:
            continue  # <n words: no row
        shared = sum(1 for g in grams if len(gram_docs[g]) >= 2)
        ppm = shared * 1_000_000 // len(grams)
        rows.append({"doc_id": did, "n_pos": len(grams),
                     "shared_pos": shared, "onion_ppm": ppm,
                     "keep": ppm <= 500_000})
    want = pd.DataFrame(rows)
    assert 901 not in set(out["doc_id"])  # short doc emits no row
    pd.testing.assert_frame_equal(
        out.astype(want.dtypes.to_dict()), want)
    # the planted copy must be fully shared on both members
    assert int(out.loc[out["doc_id"] == 900, "onion_ppm"].iloc[0]) == 1_000_000
