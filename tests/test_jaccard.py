"""Prefix-filter exact Jaccard stage (stages/jaccard.py): completeness vs
a brute-force all-pairs oracle, lang blocking, and loud mega-group
failure instead of silent O(n^2)."""

from __future__ import annotations

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
