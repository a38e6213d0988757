"""span_dedup (ExactSubstr-style overlapping-span removal), heavy_hitters
(Misra-Gries candidates + exact verify) and length_quantiles (histogram
quantiles) vs brute-force mirrors of the documented semantics."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from deduplicator_ray.stages.freq import heavy_hitters, length_quantiles
from deduplicator_ray.stages.sentdedup import span_dedup

N = 8


def _brute_span_dedup(docs: dict[int, str], n: int = N) -> pd.DataFrame:
    """Reference implementation straight off the docstring: globally-first
    occurrence per gram string by (doc_id, pos); later occurrences mark
    their whole window for removal."""
    first: set[tuple[str, ...]] = set()
    marked: dict[int, set[int]] = {d: set() for d in docs}
    for doc_id in sorted(docs):
        words = docs[doc_id].split(" ")
        for pos in range(max(0, len(words) - n + 1)):
            gram = tuple(words[pos:pos + n])
            if gram in first:
                marked[doc_id].update(range(pos, pos + n))
            else:
                first.add(gram)
    rows = []
    for doc_id in sorted(docs):
        words = docs[doc_id].split(" ")
        kept = [w for i, w in enumerate(words) if i not in marked[doc_id]]
        rows.append({"doc_id": doc_id, "text_dedup": " ".join(kept),
                     "removed_words": len(marked[doc_id])})
    return pd.DataFrame(rows)


def _mk_docs(rng: np.random.Generator, n_docs: int = 40) -> dict[int, str]:
    vocab = [f"w{i}" for i in range(25)]
    docs = {}
    for i in range(n_docs):
        nw = int(rng.integers(1, 40))
        docs[i] = " ".join(rng.choice(vocab, nw))
    span = " ".join(f"s{j}" for j in range(12))          # 12-word span
    docs[n_docs] = "pre amble " + span + " post fix"     # shared, offset 2
    docs[n_docs + 1] = span + " completely different tail here"
    docs[n_docs + 2] = docs[0]                           # full copy
    docs[n_docs + 3] = span + " " + span                 # self-repeat
    docs[n_docs + 4] = ""                                # empty
    return docs


def test_span_dedup_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    docs = _mk_docs(rng)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs]}
    ))
    got = (span_dedup(ds, ngram=N, num_buckets=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _brute_span_dedup(docs)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted cross-doc span really was removed from the later doc
    assert int(got.loc[got["doc_id"] == len(docs) - 4, "removed_words"].iloc[0]) >= 12


def test_span_dedup_shuffle_path_equals_broadcast(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(13)
    docs = _mk_docs(rng, n_docs=25)
    pdf = pd.DataFrame({"doc_id": list(docs), "text": [docs[k] for k in docs]})
    a = (span_dedup(rd.from_pandas(pdf), ngram=N, num_buckets=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (span_dedup(rd.from_pandas(pdf), ngram=N, num_buckets=4, max_broadcast=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_span_dedup_unique_roundtrip(ray_session):
    import ray.data as rd

    docs = {i: " ".join(f"u{i}x{j}" for j in range(20)) for i in range(10)}
    pdf = pd.DataFrame({"doc_id": list(docs), "text": [docs[k] for k in docs]})
    got = (span_dedup(rd.from_pandas(pdf), ngram=N, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got["removed_words"] == 0).all()
    assert list(got["text_dedup"]) == [docs[k] for k in sorted(docs)]


def _brute_heavy(texts: list[str], min_ppm: int) -> pd.DataFrame:
    cnt = collections.Counter()
    for t in texts:
        cnt.update((t or "").split(" "))
    total = sum(cnt.values())
    thr = -(-total * min_ppm // 1_000_000)
    rows = [(w, c) for w, c in cnt.items() if c >= thr]
    return (pd.DataFrame(rows, columns=["word", "n"])
            .sort_values("word").reset_index(drop=True))


def test_heavy_hitters_exact_even_with_tiny_sketch(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    # zipf-ish: head words dominate, long tail of rare words
    head = [f"h{i}" for i in range(10)]
    tail = [f"t{i}" for i in range(500)]
    texts = []
    for _ in range(120):
        nw = int(rng.integers(20, 60))
        ws = list(rng.choice(head, nw // 2)) + list(rng.choice(tail, nw - nw // 2))
        rng.shuffle(ws)
        texts.append(" ".join(ws))
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(6)
    # sketch_size=16 << vocab: truncation is exercised hard, result must
    # STILL be exact — the sketch only proposes candidates
    got = (heavy_hitters(ds, min_ppm=5000, sketch_size=16, num_buckets=4)
           .to_pandas().sort_values("word").reset_index(drop=True))
    want = _brute_heavy(texts, 5000)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 0  # the test actually asserts something


def _brute_gopher(docs: dict[int, str], *, min_words: int, stops: frozenset,
                  min_stop: int = 2) -> pd.DataFrame:
    import re

    rows = []
    for doc_id in sorted(docs):
        words = (docs[doc_id] or "").split(" ")
        nw = len(words)
        nonspace = sum(len(w) for w in words)
        n_alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
        n_stop = len({w for w in words if w in stops})
        top = max(collections.Counter(words).values())
        reason = None
        if nw < min_words:
            reason = "too_few_words"
        elif nw > 100_000:
            reason = "too_many_words"
        elif nonspace < 3 * nw or nonspace > 10 * nw:
            reason = "word_length"
        elif 5 * n_alpha < 4 * nw:
            reason = "non_alpha"
        elif n_stop < min_stop:
            reason = "stopwords"
        elif 5 * top > nw:
            reason = "repetition"
        rows.append({"doc_id": doc_id, "keep": reason is None,
                     "fail_reason": reason})
    return pd.DataFrame(rows)


def test_gopher_filter_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.textstats import gopher_filter

    rng = np.random.default_rng(17)
    stops = frozenset({"the", "and", "of"})
    vocab = [f"w{i}" for i in range(40)] + ["the", "and", "of", "99", "!!"]
    docs = {}
    for i in range(60):
        nw = int(rng.integers(3, 30))
        docs[i] = " ".join(rng.choice(vocab, nw))
    docs[60] = "and " + " ".join(["the"] * 11)            # repetition (stops ok)
    docs[61] = " ".join(["aaaaaaaaaaaaaaaa"] * 10)        # word_length
    docs[62] = " ".join(["123", "456", "789"] * 5)        # non_alpha (len ok)
    docs[63] = ""                                         # empty
    docs[64] = "the and " + " ".join(f"word{j}" for j in range(20))  # keeper
    pdf = pd.DataFrame({"doc_id": list(docs), "text": [docs[k] for k in docs]})
    got = (gopher_filter(rd.from_pandas(pdf), min_words=5, stopwords=stops)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute_gopher(docs, min_words=5, stops=stops)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["fail_reason"].dropna()) >= {"too_few_words", "word_length",
                                                "non_alpha", "repetition"}
    assert bool(got.loc[got["doc_id"] == 64, "keep"].iloc[0])


def test_heavy_hitters_fallback_when_sketch_cannot_guarantee(ray_session):
    """A word truncated to zero in EVERY block is invisible to the merged
    sketch; when summed error >= threshold the operator must fall back to
    exact counting rather than silently dropping it."""
    import warnings

    import ray.data as rd

    texts = [" ".join(["z1"] * 10 + ["w"] * 5),
             " ".join(["z2"] * 10 + ["w"] * 5)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the documented fallback warning
        got = (heavy_hitters(ds, min_ppm=1000, sketch_size=1, num_buckets=2)
               .to_pandas().sort_values("word").reset_index(drop=True))
    want = _brute_heavy(texts, 1000)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert "w" in set(got["word"])  # the sketch-invisible heavy hitter


def test_deterministic_shuffle_is_seeded_permutation(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import (
        deterministic_shuffle,
        shuffle_key,
    )

    ids = np.array([0, 1, 5, 7, 100, 2**40, 12345, 9, 8, 77], dtype=np.int64)
    pdf = pd.DataFrame({"doc_id": ids})
    got = (deterministic_shuffle(rd.from_pandas(pdf).repartition(3), seed=7,
                                 num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # brute force: rank of the Weyl key
    keys = shuffle_key(ids, 7)
    want = pd.DataFrame({"doc_id": np.sort(ids)})
    rank = np.empty(len(ids), dtype=np.int64)
    rank[np.argsort(keys, kind="stable")] = np.arange(len(ids))
    want["position"] = rank[np.argsort(ids, kind="stable")]
    pd.testing.assert_frame_equal(got, want)
    # a permutation: every position exactly once
    assert sorted(got["position"]) == list(range(len(ids)))
    # different seed -> different permutation (overwhelmingly)
    got2 = (deterministic_shuffle(rd.from_pandas(pdf), seed=8, num_buckets=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert not got2["position"].equals(got["position"])
    # same seed reproduces bit-exactly at a different bucket count
    got3 = (deterministic_shuffle(rd.from_pandas(pdf), seed=7, num_buckets=32)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got3, got)


def test_deterministic_shuffle_rejects_duplicate_ids(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.shuffle import deterministic_shuffle

    pdf = pd.DataFrame({"doc_id": [1, 2, 2, 3]})
    with pytest.raises(Exception, match="duplicate doc id"):
        deterministic_shuffle(rd.from_pandas(pdf), seed=0,
                              num_buckets=8).materialize()


def _brute_split(docs: dict[int, str], w: int, s: int):
    rows = []
    for doc_id in sorted(docs):
        words = docs[doc_id].split(" ")
        n = len(words)
        count = 1 if n <= w else -(-(n - w) // s) + 1
        for i in range(count):
            win = words[i * s: i * s + w]
            rows.append({"doc_id": doc_id, "chunk_ord": i,
                         "chunk": " ".join(win), "n_words": len(win)})
    return pd.DataFrame(rows)


def test_split_documents_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import split_documents

    rng = np.random.default_rng(23)
    docs = {i: " ".join(f"w{int(x)}" for x in rng.integers(0, 30, int(rng.integers(1, 60))))
            for i in range(40)}
    docs[40] = ""                      # empty doc -> one empty window
    docs[41] = "single"                # n < w
    docs[42] = " ".join(["x"] * 32)    # n == w exactly -> one window
    docs[43] = " ".join(["y"] * 33)    # n == w+1 -> two windows
    pdf = pd.DataFrame({"doc_id": list(docs), "text": [docs[k] for k in docs]})
    for w, s in [(32, 24), (8, 8), (8, 3)]:
        got = (split_documents(rd.from_pandas(pdf), words_per_chunk=w, stride=s)
               .to_pandas().sort_values(["doc_id", "chunk_ord"])
               .reset_index(drop=True))
        want = _brute_split(docs, w, s)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # overlap property: with stride < width, consecutive windows share words
    got = (split_documents(rd.from_pandas(pdf), words_per_chunk=8, stride=3)
           .to_pandas())
    g = got[got["doc_id"] == 42].sort_values("chunk_ord")
    assert len(g) > 1 and all(g["n_words"].iloc[:-1] == 8)


def test_redact_pii_replaces_and_counts(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.textstats import redact_pii

    pdf = pd.DataFrame({"text": [
        "write to alice.b+tag@sub.example.org or 192.168.0.1 today",
        "no pii at all",
        "two mails x@y.io z@w.co and ips 8.8.8.8 1.1.1.1",
        None,
        "version 1.2.3 is not an ip, nor is 1.2.3.4.5 fully safe",
    ]})
    got = redact_pii(rd.from_pandas(pdf)).to_pandas()
    assert got["text_redacted"].tolist()[0] == \
        "write to <EMAIL> or <IP> today"
    assert got["text_redacted"].tolist()[1] == "no pii at all"
    assert got["text_redacted"].tolist()[2] == \
        "two mails <EMAIL> <EMAIL> and ips <IP> <IP>"
    assert got["text_redacted"].tolist()[3] == ""
    assert got["n_emails"].tolist() == [1, 0, 2, 0, 0]
    assert got["n_ips"].tolist()[:4] == [1, 0, 2, 0]


def test_length_quantiles_matches_sorted_pick(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "lang": rng.choice(["en", "de", "zh"], 500),
        "n_chars": rng.integers(1, 300, 500),
    })
    got = length_quantiles(rd.from_pandas(pdf).repartition(5),
                           qs=(25, 50, 90)).reset_index(drop=True)
    rows = []
    for g, sub in pdf.groupby("lang"):
        v = np.sort(sub["n_chars"].to_numpy())
        n = len(v)
        row = {"lang": g, "n": n}
        for q in (25, 50, 90):
            row[f"p{q}"] = int(v[-(-q * n // 100) - 1])
        rows.append(row)
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_length_quantiles_ignores_nulls(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame({
        "lang": ["en"] * 6,
        "n_chars": pd.array([10, None, 20, 30, None, 40], dtype="Int64"),
    })
    got = length_quantiles(rd.from_pandas(pdf), qs=(50,)).reset_index(drop=True)
    # 4 non-null values; p50 = ceil(0.5*4)-1 = idx 1 -> 20
    assert got["n"].tolist() == [4]
    assert got["p50"].tolist() == [20]


def test_corpus_overlap_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import corpus_overlap

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(12)]
    mk = lambda n: " ".join(rng.choice(vocab, n))  # noqa: E731
    a_docs = [mk(int(rng.integers(8, 30))) for _ in range(15)]
    b_docs = [mk(int(rng.integers(8, 30))) for _ in range(15)]
    b_docs.append(a_docs[0])  # guarantee overlap
    n = 5

    def grams(docs):
        out = set()
        for t in docs:
            ws = t.split(" ")
            out.update(tuple(ws[i:i + n]) for i in range(len(ws) - n + 1))
        return out

    ga, gb = grams(a_docs), grams(b_docs)
    got = corpus_overlap(
        rd.from_pandas(pd.DataFrame({"text": a_docs})).repartition(3),
        rd.from_pandas(pd.DataFrame({"text": b_docs})).repartition(3),
        ngram=n, num_buckets=4,
    )
    assert got["n_grams_a"].iloc[0] == len(ga)
    assert got["n_grams_b"].iloc[0] == len(gb)
    assert got["n_common"].iloc[0] == len(ga & gb)
    assert len(ga & gb) > 0


def test_stratified_sample_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import (
        shuffle_key,
        stratified_sample,
    )

    n = 4000
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.array(["en", "de", "zh", "fr"])[np.arange(n) % 4],
    })
    rates = {"en": 0.5, "de": 0.25, "zh": 1.0}
    got = (stratified_sample(rd.from_pandas(pdf).repartition(4), rates,
                             seed=77, group_col="lang", default_rate=0.125)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    keys = shuffle_key(pdf["doc_id"].to_numpy(), 77)
    t = pdf["lang"].map(rates).fillna(0.125).to_numpy(np.float64)
    want_mask = np.array([
        r >= 1.0 or int(k) < int(r * 2**64) for k, r in zip(keys, t)
    ])
    want = pdf[want_mask].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # rate-1.0 group fully kept; rates roughly honored elsewhere
    assert (got["lang"] == "zh").sum() == n // 4
    en = (got["lang"] == "en").sum() / (n / 4)
    assert 0.42 < en < 0.58
    # nested property: lower rate with the same seed is a subset
    sub = (stratified_sample(rd.from_pandas(pdf), 0.1, seed=77)
           .to_pandas()["doc_id"])
    sup = (stratified_sample(rd.from_pandas(pdf), 0.3, seed=77)
           .to_pandas()["doc_id"])
    assert set(sub).issubset(set(sup))


def test_stratified_sample_rejects_bad_args(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.shuffle import stratified_sample

    pdf = pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "de"]})
    with pytest.raises(ValueError, match="group_col"):
        stratified_sample(rd.from_pandas(pdf), {"en": 0.5})
    with pytest.raises(ValueError, match="outside"):
        stratified_sample(rd.from_pandas(pdf), 1.5)
    with pytest.raises(ValueError, match="non-negative"):
        stratified_sample(rd.from_pandas(pdf), {"en": 0.5}, seed=-1,
                          group_col="lang")
    neg = pd.DataFrame({"doc_id": [-1, 2], "lang": ["en", "de"]})
    with pytest.raises(Exception, match="non-negative"):
        stratified_sample(rd.from_pandas(neg), 0.5).materialize()


def test_pack_sequences_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import pack_sequences, shuffle_key

    rng = np.random.default_rng(31)
    n = 200
    texts = [" ".join(f"w{j}" for j in range(int(rng.integers(1, 40))))
             for _ in range(n)]
    texts[5] = ""          # empty text still counts 1 token (split semantics)
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "text": texts})
    L = 64
    got = (pack_sequences(rd.from_pandas(pdf).repartition(5), seq_len=L,
                          seed=9, num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # brute force: sort by key, running token offset
    ntok = np.array([t.count(" ") + 1 for t in texts], dtype=np.int64)
    order = np.argsort(shuffle_key(pdf["doc_id"].to_numpy(), 9))
    start = np.zeros(n, dtype=np.int64)
    start[order[1:]] = np.cumsum(ntok[order])[:-1]
    want = pd.DataFrame({
        "doc_id": pdf["doc_id"], "n_tokens": ntok,
        "seq_id": start // L, "seq_offset": start % L,
    })
    pd.testing.assert_frame_equal(got, want)
    # packing invariants: sequence ids are dense from 0; every doc fits
    # the stream (total tokens == last start + last n_tokens)
    total = ntok.sum()
    assert got["seq_id"].max() == (total - ntok[order[-1]]) // L
    assert (got["seq_offset"] < L).all()
    # reproducible at a different bucket count
    got2 = (pack_sequences(rd.from_pandas(pdf), seq_len=L, seed=9,
                           num_buckets=32)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, got)


def test_pack_sequences_rejects_bad_args(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.shuffle import pack_sequences

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]})
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(rd.from_pandas(pdf), seq_len=0)
    with pytest.raises(Exception, match="duplicate doc id"):
        pack_sequences(rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 1], "text": ["a", "b"]})), seq_len=8).materialize()


def test_cap_per_group_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.freq import cap_per_group
    from deduplicator_ray.stages.shuffle import shuffle_key

    rng = np.random.default_rng(13)
    n = 600
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["hub", "s1", "s2", "tiny"],
                             p=[0.7, 0.15, 0.12, 0.03], size=n),
    })
    got = (cap_per_group(rd.from_pandas(pdf).repartition(6),
                         group_col="source", max_per_group=5, seed=3,
                         num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    keys = shuffle_key(pdf["doc_id"].to_numpy(), 3)
    want = (pdf.assign(_k=keys).sort_values("_k").groupby("source")
            .head(5)[["doc_id", "source"]]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # the hub is capped, the tiny group survives whole
    assert (got["source"] == "hub").sum() == 5
    tiny_n = (pdf["source"] == "tiny").sum()
    assert (got["source"] == "tiny").sum() == min(5, tiny_n)


def test_cap_per_group_rejects_bad_args(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.freq import cap_per_group

    pdf = pd.DataFrame({"doc_id": [1], "source": ["a"]})
    with pytest.raises(ValueError, match="positive"):
        cap_per_group(rd.from_pandas(pdf), group_col="source",
                      max_per_group=0)


def test_token_budget_select_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import (
        shuffle_key,
        token_budget_select,
    )

    rng = np.random.default_rng(17)
    n = 500
    texts = [" ".join("w" for _ in range(int(rng.integers(1, 30))))
             for _ in range(n)]
    langs = np.array(["en", "de", "xx"])[np.arange(n) % 3]
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "text": texts, "lang": langs})
    budgets = {"en": 400, "de": 150}
    got = (token_budget_select(rd.from_pandas(pdf).repartition(5), budgets,
                               seed=4, default_budget=60, num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # brute force: per lang, order by key, keep while inclusive cumsum fits
    ntok = np.array([t.count(" ") + 1 for t in texts], dtype=np.int64)
    keys = shuffle_key(pdf["doc_id"].to_numpy(), 4)
    bf = pdf.assign(n_tokens=ntok, _k=keys).sort_values("_k")
    bf["cum"] = bf.groupby("lang")["n_tokens"].cumsum()
    lim = bf["lang"].map(budgets).fillna(60)
    want = (bf[bf["cum"] <= lim][["doc_id", "lang", "n_tokens"]]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # budgets honored and reasonably filled
    used = got.groupby("lang")["n_tokens"].sum()
    assert used["en"] <= 400 and used["en"] > 300
    assert used["de"] <= 150 and used["xx"] <= 60
    # prefix/nesting property: a smaller budget selects a subset
    got2 = (token_budget_select(rd.from_pandas(pdf), {"en": 200}, seed=4,
                                default_budget=0, num_buckets=8)
            .to_pandas())
    assert set(got2["doc_id"]) <= set(got[got["lang"] == "en"]["doc_id"])


def test_distinctive_terms_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.freq import distinctive_terms

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(40)]
    n = 120
    texts = [
        " ".join(rng.choice(vocab[: int(rng.integers(3, 40))],
                            size=int(rng.integers(1, 60))))
        for _ in range(n - 2)
    ] + ["", "solo"]  # empty text and a one-word doc
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "text": texts})
    k = 4
    got = (distinctive_terms(rd.from_pandas(pdf).repartition(7), k=k,
                             num_buckets=8)
           .to_pandas().sort_values(["doc_id", "rank"])
           .reset_index(drop=True))

    # brute force: explode, tf per (doc, term), df per term, rank
    rows = []
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        for w in t.split(" "):
            rows.append((d, w))
    ex = pd.DataFrame(rows, columns=["doc_id", "term"])
    tf = ex.groupby(["doc_id", "term"]).size().reset_index(name="tf")
    df = tf.groupby("term").size().reset_index(name="df")
    j = tf.merge(df, on="term").sort_values(
        ["doc_id", "tf", "df", "term"], ascending=[True, False, True, True],
        kind="stable")
    j["rank"] = j.groupby("doc_id").cumcount() + 1
    want = (j[j["rank"] <= k]
            .astype({"tf": np.int64, "df": np.int64, "rank": np.int64})
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want[["doc_id", "term", "tf", "df", "rank"]])
    # every doc appears (empty text yields the "" term)
    assert set(got["doc_id"]) == set(pdf["doc_id"])


def test_distinctive_terms_rejects_bad_k(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.freq import distinctive_terms

    pdf = pd.DataFrame({"doc_id": [1], "text": ["a"]})
    with pytest.raises(ValueError, match="positive"):
        distinctive_terms(rd.from_pandas(pdf), k=0)


def test_unigram_logloss_matches_bruteforce(ray_session):
    import collections

    import ray.data as rd

    from deduplicator_ray.stages.textstats import unigram_logloss

    rng = np.random.default_rng(31)
    # zipf-ish corpus: a few very common words, a long tail, empty doc
    vocab = [f"t{i}" for i in range(60)]
    p = 1.0 / np.arange(1, 61)
    p /= p.sum()
    n = 150
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 50)), p=p))
        for _ in range(n - 1)
    ] + [""]
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "text": texts})
    min_ppm = 20_000  # 2% of tokens — a real vocab/OOV split
    got = (unigram_logloss(rd.from_pandas(pdf).repartition(6),
                           min_ppm=min_ppm, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    toks = [t.split(" ") for t in texts]
    cnt = collections.Counter(w for ws in toks for w in ws)
    N = sum(cnt.values())
    thr = -(-N * min_ppm // 1_000_000)
    voc = {w: c for w, c in cnt.items() if c >= thr}
    assert 0 < len(voc) < len(cnt)  # both vocab and OOV paths exercised
    D = N + len(voc) + 1
    want_ll = np.array([
        -np.mean([np.log((voc.get(w, 0) + 1.0) / D) for w in ws])
        for ws in toks
    ])
    assert (got["n_tokens"].to_numpy() ==
            np.array([len(ws) for ws in toks])).all()
    np.testing.assert_allclose(got["logloss"].to_numpy(), want_ll,
                               rtol=1e-12)
    # common-word docs must score lower loss than rare-word docs
    lo = " ".join(["t0"] * 10)
    hi = " ".join([f"t{i}" for i in range(50, 60)])
    pdf2 = pd.DataFrame({"doc_id": [0, 1], "text": [lo, hi]})
    both = pd.concat([pdf, pdf2.assign(doc_id=[1000, 1001])],
                     ignore_index=True)
    g2 = (unigram_logloss(rd.from_pandas(both), min_ppm=min_ppm,
                          num_buckets=4)
          .to_pandas().set_index("doc_id"))
    assert g2.loc[1000, "logloss"] < g2.loc[1001, "logloss"]


def test_heavy_hitters_return_total(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.freq import heavy_hitters

    pdf = pd.DataFrame({"text": ["a a b", "a c", ""]})
    hits, n_total = heavy_hitters(rd.from_pandas(pdf), min_ppm=1,
                                  num_buckets=2, return_total=True)
    assert n_total == 6  # 3 + 2 + 1 ('' splits to [''])
    got = hits.to_pandas().set_index("word")["n"].to_dict()
    assert got == {"a": 3, "b": 1, "c": 1, "": 1}


def test_inverted_index_matches_bruteforce(ray_session):
    import collections

    import ray.data as rd

    from deduplicator_ray.stages.freq import inverted_index

    rng = np.random.default_rng(37)
    vocab = [f"w{i}" for i in range(15)]
    n = 80
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 20))))
        for _ in range(n - 1)
    ] + [""]
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "text": texts})
    cap = 30  # common words exceed it, rare ones don't
    got = (inverted_index(rd.from_pandas(pdf).repartition(5),
                          num_buckets=4, max_postings=cap)
           .to_pandas().sort_values("term").reset_index(drop=True))

    posting = collections.defaultdict(set)
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        for w in t.split(" "):
            posting[w].add(int(d))
    assert set(got["term"]) == set(posting)
    capped = uncapped = 0
    for r in got.itertuples():
        want = sorted(posting[r.term])
        assert r.df == len(want)
        if len(want) > cap:
            assert r.postings is None
            capped += 1
        else:
            assert r.postings == ",".join(str(i) for i in want)
            uncapped += 1
    assert capped > 0 and uncapped > 0  # both branches exercised


def test_inverted_index_rejects_bad_cap(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.freq import inverted_index

    pdf = pd.DataFrame({"doc_id": [1], "text": ["a"]})
    with pytest.raises(ValueError, match="positive"):
        inverted_index(rd.from_pandas(pdf), max_postings=0)


def test_interleave_by_group_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import (
        interleave_by_group,
        shuffle_key,
    )

    rng = np.random.default_rng(43)
    n = 400
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["big", "mid", "s3", "tiny"],
                             p=[0.6, 0.25, 0.12, 0.03], size=n),
    })
    got = (interleave_by_group(rd.from_pandas(pdf).repartition(6),
                               group_col="source", seed=9,
                               num_buckets=16, round_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    keys = shuffle_key(pdf["doc_id"].to_numpy(), 9)
    bf = pdf.assign(key=keys)
    bf["r"] = bf.sort_values("key").groupby("source").cumcount()
    bf = bf.sort_values(["r", "key"]).reset_index(drop=True)
    bf["position"] = np.arange(len(bf), dtype=np.int64)
    want = (bf[["doc_id", "source", "position"]]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # interleaving property: every group appears in the first |groups| rows
    head = bf.head(bf["source"].nunique())
    assert set(head["source"]) == set(pdf["source"])


def test_interleave_by_group_rejects_bad_args(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.shuffle import interleave_by_group

    pdf = pd.DataFrame({"doc_id": [1], "source": ["a"]})
    with pytest.raises(ValueError, match="power of two"):
        interleave_by_group(rd.from_pandas(pdf), num_buckets=100)
    with pytest.raises(ValueError, match="round_buckets"):
        interleave_by_group(rd.from_pandas(pdf), round_buckets=1)
    with pytest.raises(Exception, match="duplicate doc id"):
        interleave_by_group(rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 1], "source": ["a", "b"]}))).materialize()


def test_split_assign_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import (
        shuffle_key,
        split_assign,
        stratified_sample,
    )

    n = 2000
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    fr = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    got = (split_assign(rd.from_pandas(pdf).repartition(5), fr, seed=6)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    k = shuffle_key(pdf["doc_id"].to_numpy(), 6)
    cuts = np.array([int(0.8 * 2**64), int(0.9 * 2**64)], dtype=np.uint64)
    names = np.array(["train", "val", "test"], dtype=object)
    want = names[np.searchsorted(cuts, k, side="right")]
    assert (got["split"].to_numpy() == want).all()
    # every split non-empty, counts near fractions
    vc = got["split"].value_counts()
    assert set(vc.index) == {"train", "val", "test"}
    assert abs(vc["train"] / n - 0.8) < 0.05
    # consistency with stratified_sample at the same seed: an 0.8-rate
    # sample is EXACTLY the train split
    samp = (stratified_sample(rd.from_pandas(pdf), 0.8, seed=6)
            .to_pandas()["doc_id"].to_numpy())
    assert set(samp) == set(got.loc[got["split"] == "train", "doc_id"])


def test_split_assign_rejects_bad_fractions(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.shuffle import split_assign

    pdf = pd.DataFrame({"doc_id": [1]})
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(rd.from_pandas(pdf), [("a", 0.5), ("b", 0.4)])
    with pytest.raises(ValueError, match="non-empty"):
        split_assign(rd.from_pandas(pdf), [])


def test_vocabulary_stats_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.freq import vocabulary_stats

    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(120)]
    n = 200
    pdf = pd.DataFrame({
        "source": rng.choice(["a", "b", "c"], size=n),
        "text": [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(1, 30))))
                 for _ in range(n - 1)] + [""],
    })
    got = (vocabulary_stats(rd.from_pandas(pdf).repartition(7),
                            group_col="source", num_buckets=4)
           .to_pandas().sort_values("source").reset_index(drop=True))

    rows = []
    for g, sub in pdf.groupby("source"):
        toks = [w for t in sub["text"] for w in t.split(" ")]
        rows.append((g, len(toks), len(set(toks)),
                     len(set(toks)) * 1_000_000 // len(toks)))
    want = pd.DataFrame(rows, columns=["source", "n_tokens", "n_distinct",
                                       "ttr_ppm"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # distinct < tokens for every group (repetition exists)
    assert (got["n_distinct"] < got["n_tokens"]).all()


class TestGroupedHeavyHitters:
    def test_matches_bruteforce_and_ppm_threshold(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deduplicator_ray.stages.freq import grouped_heavy_hitters

        rows = []
        for i in range(40):
            rows.append(("en", "the cat " + f"rare{i}"))   # 'the','cat' heavy
        for i in range(10):
            rows.append(("de", "der hund der " + f"selten{i}"))
        pdf = pd.DataFrame(rows, columns=["lang", "text"])
        got = (grouped_heavy_hitters(rd.from_pandas(pdf).repartition(4),
                                     group_col="lang", min_ppm=100_000,
                                     sketch_size=64)
               .to_pandas().sort_values(["lang", "word"]).reset_index(drop=True))
        # brute force: per-lang counts, keep >= ceil(n_g * 0.1)
        w = (pdf.assign(word=pdf["text"].str.split(" "))
             .explode("word"))
        want = []
        for g, sub in w.groupby("lang"):
            vc = sub["word"].value_counts()
            thr = -(-len(sub) * 100_000 // 1_000_000)
            for word, n in vc[vc >= thr].items():
                want.append((g, word, n))
        want = (pd.DataFrame(want, columns=["lang", "word", "n"])
                .sort_values(["lang", "word"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert ("en", "the") in set(zip(got["lang"], got["word"]))
        assert not got["word"].str.startswith("rare").any()

    def test_tiny_sketch_falls_back_per_group_and_stays_exact(self, ray_session):
        import warnings

        import pandas as pd
        import ray.data as rd

        from deduplicator_ray.stages.freq import grouped_heavy_hitters

        # sketch_size=1 forces MG error >= threshold for the diverse group
        rows = [("en", f"w{i} w{i} filler{i}") for i in range(30)]
        rows += [("de", "der der der")] * 3
        pdf = pd.DataFrame(rows, columns=["lang", "text"])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = (grouped_heavy_hitters(
                rd.from_pandas(pdf).repartition(6), group_col="lang",
                min_ppm=50_000, sketch_size=1)
                .to_pandas().sort_values(["lang", "word"]).reset_index(drop=True))
        w = (pdf.assign(word=pdf["text"].str.split(" ")).explode("word"))
        want = []
        for g, sub in w.groupby("lang"):
            vc = sub["word"].value_counts()
            thr = -(-len(sub) * 50_000 // 1_000_000)
            for word, n in vc[vc >= thr].items():
                want.append((g, word, n))
        want = (pd.DataFrame(want, columns=["lang", "word", "n"])
                .sort_values(["lang", "word"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestHll:
    def test_estimate_within_tolerance(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deduplicator_ray.stages.freq import distinct_count_hll

        # 20k distinct values, each duplicated 3x, split across blocks
        vals = [f"url-{i}" for i in range(20_000)] * 3
        ds = rd.from_pandas(pd.DataFrame({"u": vals})).repartition(8)
        r = distinct_count_hll(ds, "u", p=12)
        err = abs(r["estimate"] - 20_000) / 20_000
        assert err < 0.05, (r, err)  # 3 sigma of the 1.6% std error
        # duplication/blocking invariance: same registers -> same estimate
        r2 = distinct_count_hll(
            rd.from_pandas(pd.DataFrame({"u": vals * 2})).repartition(3),
            "u", p=12)
        assert r2["estimate"] == r["estimate"]

    def test_small_range_linear_counting(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deduplicator_ray.stages.freq import distinct_count_hll

        ds = rd.from_pandas(pd.DataFrame({"u": [f"v{i}" for i in range(50)]}))
        r = distinct_count_hll(ds, "u", p=12)
        assert abs(r["estimate"] - 50) <= 2  # linear-counting regime


class TestCountMin:
    def test_overestimate_only_and_exactness_when_sparse(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deduplicator_ray.stages.freq import cms_query, count_min_sketch

        vals = (["hub"] * 500 + ["mid"] * 50
                + [f"tail{i}" for i in range(200)])
        ds = rd.from_pandas(pd.DataFrame({"k": vals})).repartition(6)
        sk = count_min_sketch(ds, "k", width=4096, depth=4)
        est = cms_query(sk, ["hub", "mid", "tail0", "never-seen"])
        # never an underestimate
        assert est[0] >= 500 and est[1] >= 50 and est[2] >= 1
        # sparse regime (250 keys << 4096 slots): collisions are rare
        # enough that the hub estimate is exact with these fixed hashes
        assert est[0] == 500
        assert est[3] <= 2  # unseen key collides with at most tiny mass
        # merge correctness: doubling the corpus doubles every estimate
        sk2 = count_min_sketch(
            rd.from_pandas(pd.DataFrame({"k": vals * 2})).repartition(4),
            "k", width=4096, depth=4)
        assert (cms_query(sk2, ["hub", "mid"]) ==
                2 * cms_query(sk, ["hub", "mid"])).all()


class TestLogHistQuantiles:
    def test_bracket_contains_exact_quantile(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deduplicator_ray.stages.freq import log_histogram_quantiles

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 1_000_000, size=5000).astype("int64")
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
        got = log_histogram_quantiles(ds, "v", qs=(50, 90, 99)).set_index("q")
        sv = np.sort(vals)
        for q in (50, 90, 99):
            rank = -(-q * len(sv) // 100) - 1
            exact = sv[rank]
            lo, hi = got.loc[q, "lo"], got.loc[q, "hi"]
            assert lo <= exact <= hi
            assert hi <= 2 * max(lo, 1)  # factor-2 bracket

    def test_zeros_and_empty(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deduplicator_ray.stages.freq import log_histogram_quantiles

        ds = rd.from_pandas(pd.DataFrame({"v": [0, 0, 0, 1]}))
        got = log_histogram_quantiles(ds, "v", qs=(50,)).set_index("q")
        assert got.loc[50, "lo"] == 0 and got.loc[50, "hi"] == 0


def test_split_assign_keep_cols_and_leakage(ray_session):
    """keep_cols passes payload through unchanged, and the split_leakage
    composition catches a planted cross-split duplicate."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.sentdedup import source_overlap_matrix
    from deduplicator_ray.stages.shuffle import split_assign

    body = " ".join(f"w{j}" for j in range(8))
    pdf = pd.DataFrame({
        "doc_id": range(40),
        # every doc shares one 8-gram -> leaks across whatever splits
        # the Weyl keys land on
        "text": [body + f" tail{i}" for i in range(40)],
    })
    fr = [("train", 0.5), ("test", 0.5)]
    labeled = split_assign(rd.from_pandas(pdf).repartition(4), fr, seed=3,
                           keep_cols=("text",))
    ldf = labeled.to_pandas().sort_values("doc_id", ignore_index=True)
    assert ldf["text"].tolist() == pdf["text"].tolist()  # payload intact
    assert set(ldf["split"]) == {"train", "test"}
    got = source_overlap_matrix(labeled, ngram=8, group_col="split")
    got = got.set_index(["source_a", "source_b"])
    assert got.loc[("test", "train"), "n_shared"] == 1  # the planted gram


def test_split_assign_grouped_coherence(ray_session):
    """Every row of one group gets the SAME split; fractions shape the
    group-level distribution; nulls key as ''."""
    import collections

    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import (
        group_split_key,
        split_assign_grouped,
    )

    sites = [f"s{i}.example" for i in range(200)]
    pdf = pd.DataFrame({
        "site": [s for s in sites for _ in range(3)] + [None, None],
        "payload": range(len(sites) * 3 + 2),
    })
    fr = [("train", 0.8), ("test", 0.2)]
    got = (split_assign_grouped(rd.from_pandas(pdf).repartition(5), fr,
                                seed=9, group_col="site",
                                keep_cols=("payload",))
           .to_pandas())
    assert got["payload"].sort_values().tolist() == list(range(len(pdf)))
    per_site = got.groupby(got["site"].fillna(""))["split"].nunique()
    assert (per_site == 1).all()            # group coherence
    dist = collections.Counter(
        got.groupby(got["site"].fillna(""))["split"].first())
    assert 120 < dist["train"] < 190 and dist["test"] > 10  # ~80/20
    # null rows got a split via the '' key
    assert got.loc[got["site"].isna(), "split"].nunique() == 1
    # key function is stable and distinct-hashing
    import numpy as np

    k = group_split_key(np.array(["a", "b", "a", None], dtype=object))
    assert k[0] == k[2] and k[0] != k[1] and (k >= 0).all()


def test_freq_spectrum_exact(ray_session):
    """'a a a b b c' across two docs: one word x3, one x2, one x1 ->
    spectrum rows (1,1) (2,1) (3,1); split blocks must merge counts."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.freq import freq_spectrum

    docs = pd.DataFrame({"text": ["a a b", "a b c"]})
    out = (freq_spectrum(rd.from_pandas(docs).repartition(2), num_buckets=4)
           .to_pandas().set_index("n_occurrences")["n_words"].to_dict())
    assert out == {1: 1, 2: 1, 3: 1}


def test_oov_rate_exact_vocab_election(ray_session):
    """vocab_k=2 over 'a'x4, 'b'x3, tie c/d at 2: vocab = {a, b};
    tie-break (count desc, word asc) keeps determinism when k cuts a
    tie; per-group token/oov counts exact across split blocks."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.freq import oov_rate

    docs = pd.DataFrame({
        "source": ["s1", "s1", "s2"],
        "text": ["a a b c", "a b d", "a b c d"],
    })
    out = (oov_rate(rd.from_pandas(docs).repartition(2), vocab_k=2,
                    num_buckets=4)
           .to_pandas().set_index("source"))
    # global counts: a=4 b=3 c=2 d=2 -> vocab {a, b}
    assert out.loc["s1", "n_tokens"] == 7 and out.loc["s1", "n_oov"] == 2
    assert out.loc["s2", "n_tokens"] == 4 and out.loc["s2", "n_oov"] == 2
    assert out.loc["s2", "oov_ppm"] == 500_000
    # vocab_k=3 cuts the c/d tie: word-asc keeps c, d stays OOV
    out3 = (oov_rate(rd.from_pandas(docs), vocab_k=3, num_buckets=4)
            .to_pandas().set_index("source"))
    assert out3.loc["s2", "n_oov"] == 1


def test_kmv_overlap_regimes(ray_session):
    """Sketch-not-full regime is exact; identical corpora give
    intersection == union; disjoint vocabularies give intersection 0;
    results are deterministic across repartitions."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.freq import kmv_overlap

    a = pd.DataFrame({"text": ["w0 w1 w2 w3", "w2 w3 w4"]})
    b = pd.DataFrame({"text": ["w3 w4 w5", "w6"]})
    est = kmv_overlap(rd.from_pandas(a), rd.from_pandas(b), k=64)
    # not-full regime: everything exact. |A|=5, |B|=4, union 7, inter 2
    assert est["est_distinct_a"] == 5 and est["est_distinct_b"] == 4
    assert est["est_union"] == 7 and est["est_intersection"] == 2

    same = kmv_overlap(rd.from_pandas(a).repartition(2),
                       rd.from_pandas(a), k=64)
    assert same["est_intersection"] == same["est_union"] == 5

    disj = kmv_overlap(rd.from_pandas(pd.DataFrame({"text": ["x y z"]})),
                       rd.from_pandas(pd.DataFrame({"text": ["p q r"]})),
                       k=64)
    assert disj["est_intersection"] == 0 and disj["est_union"] == 6


def test_kmv_estimator_accuracy(ray_session):
    """Full-sketch regime: the (k-1)/th estimator lands within the
    ~1/sqrt(k) KMV error band on a 2000-word universe, deterministically
    across block splits."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.freq import kmv_overlap

    words_a = [f"t{i}" for i in range(1500)]          # 0..1499
    words_b = [f"t{i}" for i in range(1000, 2500)]    # 1000..2499
    docs_a = pd.DataFrame({"text": [" ".join(words_a[i:i + 50])
                                    for i in range(0, 1500, 50)]})
    docs_b = pd.DataFrame({"text": [" ".join(words_b[i:i + 50])
                                    for i in range(0, 1500, 50)]})
    est = kmv_overlap(rd.from_pandas(docs_a).repartition(3),
                      rd.from_pandas(docs_b).repartition(2), k=256)
    # truth: |A|=1500 |B|=1500 union=2500 inter=500; 1/sqrt(256)=6.25%
    assert abs(est["est_union"] - 2500) <= 2500 * 0.2
    assert abs(est["est_distinct_a"] - 1500) <= 1500 * 0.2
    assert abs(est["est_intersection"] - 500) <= 500 * 0.5
    est2 = kmv_overlap(rd.from_pandas(docs_a),
                       rd.from_pandas(docs_b).repartition(5), k=256)
    assert est == est2  # block layout must not change the sketch


def test_vocab_growth_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.freq import vocab_growth

    # ids 0..9, num_stops=5 over span 10 -> stop = doc_id // 2
    docs = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": ["a b", "a", "c", "a c", "d", "", "e d", "a", "f", "f"],
    })
    out = (vocab_growth(rd.from_pandas(docs).repartition(3), max_id=9,
                        num_stops=5, num_buckets=4)
           .to_pandas())
    # first-seen stops: a->0 b->0 c->1 d->2 ''->2(doc 5) e->3 f->4
    assert out["stop"].tolist() == [0, 1, 2, 3, 4]
    assert out["new_words"].tolist() == [2, 1, 2, 1, 1]
    assert out["cum_words"].tolist() == [2, 3, 5, 6, 7]


def test_vocab_growth_guards(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.freq import vocab_growth

    docs = pd.DataFrame({"doc_id": [0, 5], "text": ["a", "b"]})
    with pytest.raises(ValueError, match="num_stops"):
        vocab_growth(rd.from_pandas(docs), max_id=5, num_stops=0)
    with pytest.raises(Exception, match="lie in"):
        vocab_growth(rd.from_pandas(docs), max_id=3, num_stops=2)


def test_dup_growth_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.freq import dup_growth

    # stops of width 2; dups planted forward: docs 4 and 9 repeat doc 0,
    # doc 7 repeats doc 6 (same stop), doc 3 is null -> '' unique
    docs = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": ["x", "y", "z", None, "x", "q", "r", "r", "s", "x"],
    })
    out = (dup_growth(rd.from_pandas(docs).repartition(3), max_id=9,
                      num_stops=5, num_buckets=4)
           .to_pandas())
    assert out["n_docs"].tolist() == [2, 2, 2, 2, 2]
    assert out["n_dups"].tolist() == [0, 0, 1, 1, 1]
    assert out["cum_dups"].tolist() == [0, 0, 1, 2, 3]
    assert out["cum_dup_ppm"].tolist() == [
        0, 0, 1_000_000 // 6, 2_000_000 // 8, 3_000_000 // 10]


def test_shard_manifest_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import shard_manifest

    # token counts 3,4,5,1,6,2 in id order; budget 6 ->
    # before: 0,3,7,12,13,19 -> shards 0,0,1,2,2,3
    docs = pd.DataFrame({
        "doc_id": np.array([10, 20, 30, 40, 50, 60], dtype=np.int64),
        "text": ["a b c", "a b c d", "a b c d e", "a", "a b c d e f",
                 "a b"],
    })
    out = (shard_manifest(rd.from_pandas(docs).repartition(3),
                          budget_tokens=6, num_buckets=4)
           .to_pandas().sort_values("shard_id").reset_index(drop=True))
    want = pd.DataFrame({
        "shard_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "n_docs": np.array([2, 1, 2, 1], dtype=np.int64),
        "n_tokens": np.array([7, 5, 7, 2], dtype=np.int64),
        "first_doc": np.array([10, 30, 40, 60], dtype=np.int64),
        "last_doc": np.array([20, 30, 50, 60], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(out, want)
    # invariant under bucket count (boundary-straddling merge exercised)
    out2 = (shard_manifest(rd.from_pandas(docs), budget_tokens=6,
                           num_buckets=2)
            .to_pandas().sort_values("shard_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out2, want)


def test_shard_manifest_guards(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.shuffle import shard_manifest

    with pytest.raises(ValueError, match="budget_tokens"):
        shard_manifest(rd.from_pandas(pd.DataFrame(
            {"doc_id": [1], "text": ["a"]})), budget_tokens=0)
    with pytest.raises(Exception, match="duplicate doc id"):
        shard_manifest(rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 1], "text": ["a", "b"]})),
            budget_tokens=8).materialize()
    empty = shard_manifest(rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype=object)})), budget_tokens=8)
    assert empty.count() == 0


def test_ttr_stats_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.textstats import ttr_stats

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b a c", None, "x x x", "lone"],
    })
    out = (ttr_stats(rd.from_pandas(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [4, 1, 3, 1]
    assert out["n_types"].tolist() == [3, 1, 1, 1]
    assert out["ttr_ppm"].tolist() == [750000, 1000000, 333333, 1000000]


def test_rank_fusion_rrf_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.lexical import bm25_topk, rank_fusion_rrf

    rng = np.random.default_rng(11)
    vocab = ["dup", "scan", "x", "y", "z"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 20))))
             for _ in range(40)]
    docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                         "text": texts})
    ds = rd.from_pandas(docs).repartition(4)
    got = rank_fusion_rrf(ds, ["dup", "scan"], k=6, pool=8, rrf_k=60)

    # brute force both rankings + integer fusion
    bm = bm25_topk(rd.from_pandas(docs), ["dup", "scan"], k=8)
    tf = [(i, t.split(" ").count("dup") + t.split(" ").count("scan"))
          for i, t in enumerate(texts)]
    tf = [(i, c) for i, c in tf if c > 0]
    tf.sort(key=lambda p: (-p[1], p[0]))
    score = {}
    for ranked in (bm["doc_id"].tolist(), [i for i, _ in tf[:8]]):
        for r, d in enumerate(ranked, start=1):
            score[d] = score.get(d, 0) + 1_000_000 // (60 + r)
    rows = sorted(score.items(), key=lambda p: (-p[1], p[0]))[:6]
    want = pd.DataFrame(rows, columns=["doc_id", "rrf_micro"]).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_rank_fusion_rrf_guards(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.lexical import rank_fusion_rrf

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError, match="1 <= k <= pool"):
        rank_fusion_rrf(ds, ["a"], k=5, pool=3)
    # no doc contains a query term -> empty fusion
    out = rank_fusion_rrf(ds, ["zz"], k=2, pool=4)
    assert len(out) == 0


def test_split_by_cluster_no_straddle(ray_session):
    """Cluster-aware split: a planted near-dup pair whose doc-level
    splits DIFFER must land in the same split (keyed on the cluster id
    = min member), and singletons must match plain split_assign
    exactly."""
    import ray.data as rd

    from deduplicator_ray.pipelines.queries_ext import split_by_cluster
    from deduplicator_ray.stages.shuffle import shuffle_key, split_assign

    fr = [("train", 0.5), ("val", 0.25), ("test", 0.25)]
    seed = 6
    # find a doc-id pair whose Weyl keys fall in different intervals
    keys = shuffle_key(np.arange(200, dtype=np.int64), seed)
    cuts = np.array([int(0.5 * 2**64), int(0.75 * 2**64)], dtype=np.uint64)
    iv = np.searchsorted(cuts, keys, side="right")
    a = 0
    b = next(int(j) for j in range(1, 200) if iv[j] != iv[a])

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(300)]
    base = " ".join(rng.choice(vocab, size=80))
    rows = []
    for i in range(60):
        if i == a or i == b:
            rows.append((i, base))              # exact dup pair (a, b)
        else:
            rows.append((i, " ".join(rng.choice(vocab, size=60))))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    got = (split_by_cluster(rd.from_pandas(pdf), fr, seed=seed,
                            num=4, den=5, ngram=5)
           .to_pandas().set_index("doc_key").sort_index())
    # the planted pair coheres, on the min-member's split
    assert got.loc[a, "split"] == got.loc[b, "split"]
    plain = (split_assign(rd.from_pandas(pdf[["doc_id"]]), fr, seed=seed)
             .to_pandas().set_index("doc_id")["split"])
    assert plain.loc[a] != plain.loc[b]          # the leak split_assign has
    assert got.loc[a, "split"] == plain.loc[min(a, b)]
    # singletons (no edges) degrade to exactly split_assign
    singles = [i for i in range(60) if i not in (a, b)]
    same = [got.loc[i, "split"] == plain.loc[i] for i in singles
            if got.loc[i, "cluster_id"] == i]
    assert same and all(same)


def test_sample_k_stratified_partition_invariant(ray_session):
    """Exact-k per group: partition-count invariance, exact sizes, rank
    = key order, consistency with the Bernoulli sampler's key space
    (the k smallest keys are a prefix of any rate's accepted set)."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import (sample_k_stratified,
                                                 shuffle_key)

    n = 500
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.repeat(["en", "de", "fr", "is", "es"], n // 5),
    })
    a = sample_k_stratified(rd.from_pandas(pdf).repartition(7), 9, seed=3)
    b = sample_k_stratified(rd.from_pandas(pdf).repartition(2), 9, seed=3)
    pd.testing.assert_frame_equal(
        a.sort_values(["lang", "sample_rank"], ignore_index=True),
        b.sort_values(["lang", "sample_rank"], ignore_index=True))
    assert (a.groupby("lang").size() == 9).all()
    # rank order == key order, per group
    for lang, g in a.groupby("lang"):
        keys = shuffle_key(g.sort_values("sample_rank")["doc_id"]
                           .to_numpy(), 3)
        assert (np.diff(keys.astype(np.uint64)) > 0).all()
        # brute-force: these ARE the k smallest keys of the group
        allk = shuffle_key(pdf.loc[pdf["lang"] == lang, "doc_id"]
                           .to_numpy(), 3)
        assert set(keys.tolist()) == set(np.sort(allk)[:9].tolist())
