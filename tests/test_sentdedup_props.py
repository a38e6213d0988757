"""Property-based tests for sentdedup's pure vectorized kernels (no Ray):
the Arrow offset arithmetic in _chunk_frame / _ngram_hashes and the
_rebuild_docs round-trip are the fiddly parts — hypothesis hunts the
boundary cases (empty strings, repeated spaces, single-word docs, chunk
boundaries) a planted-case test can miss."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplicator_ray.stages.sentdedup import (
    _chunk_frame,
    _ngram_hashes,
    _rebuild_docs,
    _word_hashes,
)

# words over a tiny alphabet force cross-doc collisions; "" exercises the
# split-of-empty path (one empty word, same as DuckDB string_split)
word = st.text(alphabet="abc", min_size=0, max_size=3)
doc = st.lists(word, min_size=1, max_size=30).map(" ".join)
docs_strategy = st.lists(doc, min_size=1, max_size=12)
w_strategy = st.integers(min_value=1, max_value=7)


@settings(max_examples=60, deadline=None)
@given(docs_strategy, w_strategy)
def test_chunk_frame_matches_python_split(docs, w):
    ids = np.arange(len(docs), dtype=np.int64)
    f = _chunk_frame(ids, pa.array(docs, type=pa.string()), w)
    want = []
    for i, t in enumerate(docs):
        words = t.split(" ")
        for j in range(0, len(words), w):
            want.append((i, j // w, " ".join(words[j:j + w])))
    got = list(zip(f["doc_id"], f["ord"], f["chunk"]))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(docs_strategy, w_strategy)
def test_rebuild_roundtrip_no_removals(docs, w):
    ids = np.arange(len(docs), dtype=np.int64)
    rem = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                        "ord": pd.Series(dtype="int64")})
    out = _rebuild_docs(ids, pa.array(docs, type=pa.string()), rem, w)
    assert out["doc_id"].tolist() == list(range(len(docs)))
    assert out["text_dedup"].tolist() == docs  # split/join inverse
    assert out["removed_chunks"].sum() == 0


@settings(max_examples=60, deadline=None)
@given(docs_strategy, st.integers(min_value=1, max_value=4))
def test_ngram_window_counts_and_determinism(docs, n):
    h, offs = _word_hashes(pa.array(docs, type=pa.string()))
    grams, doc_idx = _ngram_hashes(h, offs, n)
    n_words = np.diff(offs)
    want_counts = np.maximum(0, n_words - n + 1)
    got_counts = np.bincount(doc_idx, minlength=len(docs))
    assert got_counts.tolist() == want_counts.tolist()
    # same input -> identical fingerprints (fixed keys, no RNG)
    h2, offs2 = _word_hashes(pa.array(docs, type=pa.string()))
    grams2, _ = _ngram_hashes(h2, offs2, n)
    assert np.array_equal(grams, grams2)
    # equal word windows hash equal: duplicate every doc and compare
    dup = docs + docs
    h3, offs3 = _word_hashes(pa.array(dup, type=pa.string()))
    grams3, idx3 = _ngram_hashes(h3, offs3, n)
    half = len(grams)
    assert np.array_equal(grams3[:half], grams3[half:])


@settings(max_examples=40, deadline=None)
@given(docs_strategy, w_strategy, st.randoms(use_true_random=False))
def test_rebuild_with_random_removals(docs, w, rnd):
    """Removing a random subset of (doc, ord) chunk slots rebuilds exactly
    the kept chunks in order, with exact removed counts."""
    ids = np.arange(len(docs), dtype=np.int64)
    f = _chunk_frame(ids, pa.array(docs, type=pa.string()), w)
    take = [i for i in range(len(f)) if rnd.random() < 0.3]
    rem = f.iloc[take][["doc_id", "ord"]].reset_index(drop=True)
    out = _rebuild_docs(ids, pa.array(docs, type=pa.string()), rem, w)
    removed_set = set(zip(rem["doc_id"], rem["ord"]))
    for i, t in enumerate(docs):
        words = t.split(" ")
        kept = [" ".join(words[j:j + w]) for j in range(0, len(words), w)
                if (i, j // w) not in removed_set]
        row = out[out.doc_id == i].iloc[0]
        assert row["text_dedup"] == " ".join(kept)
        n_ch = -(-len(words) // w)
        assert row["removed_chunks"] == sum(
            1 for j in range(n_ch) if (i, j) in removed_set
        )
