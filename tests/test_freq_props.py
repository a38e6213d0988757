"""Property-based tests for the pure vectorized kernels behind span dedup
(_ngram_occurrences, _rebuild_span_docs), the shuffle key, and the
quantile index arithmetic — hypothesis hunts offset/boundary cases
(empty docs, repeated spaces, windows straddling doc boundaries, ties)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplicator_ray.stages.sentdedup import (
    _ngram_occurrences,
    _rebuild_span_docs,
)
from deduplicator_ray.stages.shuffle import shuffle_key

word = st.text(alphabet="abc", min_size=0, max_size=3)
doc = st.lists(word, min_size=1, max_size=30).map(" ".join)
docs_strategy = st.lists(doc, min_size=1, max_size=12)
n_strategy = st.integers(min_value=1, max_value=5)


@settings(max_examples=60, deadline=None)
@given(docs_strategy, n_strategy)
def test_ngram_occurrences_match_python_windows(docs, n):
    g1, g2, didx, pos = _ngram_occurrences(pa.array(docs, type=pa.string()), n)
    # occurrence positions == every in-doc window, in order
    want = []
    for i, t in enumerate(docs):
        nw = len(t.split(" "))
        want.extend((i, p) for p in range(nw - n + 1))
    assert list(zip(didx.tolist(), pos.tolist())) == want
    # hash equality == gram string equality on this tiny alphabet
    grams = {}
    for (i, p), a, b in zip(want, g1.tolist(), g2.tolist()):
        gram = " ".join(docs[i].split(" ")[p:p + n])
        grams.setdefault((a, b), set()).add(gram)
    assert all(len(v) == 1 for v in grams.values())  # no 128-bit collision
    # same string -> same hash (injectivity of the map gram -> (h1,h2))
    by_gram = {}
    for (i, p), a, b in zip(want, g1.tolist(), g2.tolist()):
        gram = " ".join(docs[i].split(" ")[p:p + n])
        by_gram.setdefault(gram, set()).add((a, b))
    assert all(len(v) == 1 for v in by_gram.values())


@settings(max_examples=60, deadline=None)
@given(docs_strategy, n_strategy)
def test_span_rebuild_roundtrip_no_removals(docs, n):
    ids = np.arange(len(docs), dtype=np.int64)
    rem = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                        "pos": pd.Series(dtype="int64")})
    out = _rebuild_span_docs(ids, pa.array(docs, type=pa.string()), rem, n)
    assert out["doc_id"].tolist() == list(range(len(docs)))
    assert out["text_dedup"].tolist() == docs
    assert out["removed_words"].sum() == 0


@settings(max_examples=60, deadline=None)
@given(docs_strategy, n_strategy, st.data())
def test_span_rebuild_removal_accounting(docs, n, data):
    """For any removal set: removed_words + words(text_dedup) == n_words,
    and the kept words are exactly the uncovered positions in order."""
    ids = np.arange(len(docs), dtype=np.int64)
    rem_rows = []
    for i, t in enumerate(docs):
        nw = len(t.split(" "))
        if nw >= n:
            k = data.draw(st.integers(min_value=0, max_value=min(3, nw - n + 1)))
            ps = data.draw(st.lists(
                st.integers(min_value=0, max_value=nw - n),
                min_size=k, max_size=k, unique=True,
            ))
            rem_rows.extend((i, p) for p in ps)
    rem = pd.DataFrame(rem_rows, columns=["doc_id", "pos"]).astype("int64") \
        if rem_rows else pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                       "pos": pd.Series(dtype="int64")})
    out = _rebuild_span_docs(ids, pa.array(docs, type=pa.string()), rem, n)
    for i, t in enumerate(docs):
        words = t.split(" ")
        covered = set()
        for _, r in rem[rem["doc_id"] == i].iterrows():
            covered.update(range(int(r["pos"]), min(int(r["pos"]) + n, len(words))))
        kept = [w for j, w in enumerate(words) if j not in covered]
        row = out[out["doc_id"] == i].iloc[0]
        assert row["text_dedup"] == " ".join(kept)
        assert int(row["removed_words"]) == len(covered)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=50, unique=True),
       st.integers(min_value=0, max_value=2**31))
def test_shuffle_key_bijective_and_seeded(ids, seed):
    a = shuffle_key(np.array(ids, dtype=np.int64), seed)
    assert len(np.unique(a)) == len(ids)  # bijection: distinct ids -> distinct keys
    b = shuffle_key(np.array(ids, dtype=np.int64), seed)
    assert np.array_equal(a, b)  # deterministic


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=200),
       st.sampled_from([25, 50, 90]))
def test_quantile_index_matches_duckdb_rule(vals, q):
    """idx = ceil(q/100 * n) - 1 into the sorted values — the exact
    quantile_disc rule length_quantiles implements."""
    v = np.sort(np.array(vals, dtype=np.int64))
    n = len(v)
    idx = -(-q * n // 100) - 1
    assert 0 <= idx < n
    # cumulative-count pick (the histogram path) equals direct indexing
    uniq, cnt = np.unique(v, return_counts=True)
    cum = np.cumsum(cnt)
    assert uniq[np.searchsorted(cum, idx + 1)] == v[idx]


def test_pps_sample_proportional_and_nested(ray_session):
    """PPS inclusion tracks weight/w_ref and same-seed samples nest
    across w_ref (smaller w_ref keeps a superset at equal weights)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import pps_sample

    rng = np.random.default_rng(2)
    n = 30_000
    pdf = pd.DataFrame({
        "doc_id": np.arange(n),
        "n_chars": rng.integers(1, 4000, n),
    })
    ds = rd.from_pandas(pdf).repartition(5)
    kept = pps_sample(ds, weight_col="n_chars", w_ref=2000,
                      seed=3).to_pandas()
    # docs at/above w_ref always kept
    heavy = pdf[pdf["n_chars"] >= 2000]
    assert heavy["doc_id"].isin(kept["doc_id"]).all()
    # inclusion rate of a light band ~= band_weight / w_ref
    band = pdf[(pdf["n_chars"] >= 400) & (pdf["n_chars"] < 600)]
    rate = band["doc_id"].isin(kept["doc_id"]).mean()
    assert abs(rate - 0.25) < 0.05  # mean weight 500 / 2000
    # nesting: raising w_ref only removes docs (same seed)
    kept_hi = pps_sample(ds, weight_col="n_chars", w_ref=4000,
                         seed=3).to_pandas()
    assert set(kept_hi["doc_id"]) <= set(kept["doc_id"])


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1,
                max_size=60))
@settings(max_examples=80, deadline=None)
def test_gini_spectrum_matches_sorted_formula(counts):
    import numpy as np

    from deduplicator_ray.pipelines.queries_rel import (
        gini_micro_from_spectrum,
    )

    arr = np.sort(np.asarray(counts, dtype=np.int64))
    xs, cs = np.unique(arr, return_counts=True)
    n, s, gini = gini_micro_from_spectrum(xs.tolist(), cs.tolist())
    assert (n, s) == (len(arr), int(arr.sum()))
    # brute force: G = (2*sum(i*x_i) - (n+1)*sum x) / (n*sum x), i 1-based
    s1 = int(sum((i + 1) * int(x) for i, x in enumerate(arr)))
    num = 2 * s1 - (n + 1) * s
    den = n * s
    assert gini == (2 * num * 1_000_000 + den) // (2 * den)
    assert 0 <= gini < 1_000_000


def test_gini_spectrum_edges():
    from deduplicator_ray.pipelines.queries_rel import (
        gini_micro_from_spectrum,
    )

    assert gini_micro_from_spectrum([], []) == (0, 0, 0)
    # perfectly equal distribution -> 0
    assert gini_micro_from_spectrum([7], [5])[2] == 0
    # one host owns everything except n-1 single-capture hosts
    n, s, g = gini_micro_from_spectrum([1, 1_000_000], [99, 1])
    assert g > 950_000


@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                max_size=40, unique=True),
       st.integers(min_value=1, max_value=50))
@settings(max_examples=25, deadline=None)
def test_shard_manifest_matches_window_cumsum(ray_session, ids, budget):
    """shard_manifest == the SQL-window-function reference on random
    corpora: shard(doc) = tokens-before // budget in id order."""
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import shard_manifest

    rng = np.random.default_rng(sum(ids) + budget)
    texts = [" ".join("w" for _ in range(int(rng.integers(1, 9))))
             for _ in ids]
    df = pd.DataFrame({"doc_id": np.array(sorted(ids), dtype=np.int64),
                       "text": texts})
    got = (shard_manifest(rd.from_pandas(df).repartition(3),
                          budget_tokens=budget, num_buckets=4)
           .to_pandas().sort_values("shard_id").reset_index(drop=True))
    ntok = np.array([t.count(" ") + 1 for t in texts], dtype=np.int64)
    before = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    ref = (pd.DataFrame({"shard_id": before // budget,
                         "d": df["doc_id"], "t": ntok})
           .groupby("shard_id", as_index=False)
           .agg(n_docs=("d", "size"), n_tokens=("t", "sum"),
                first_doc=("d", "min"), last_doc=("d", "max")))
    ref = ref.astype({c: "int64" for c in ref.columns})
    pd.testing.assert_frame_equal(got, ref)


def test_event_transitions_planted(ray_session):
    """Planted sequences: same-user adjacent pairs within the gap count;
    pairs across users or across a > 30-min gap do not."""
    import ray.data as rd

    from deduplicator_ray.pipelines.queries_ext import q_event_transitions  # noqa: F401 - import check

    from deduplicator_ray.stages.exact import hash_bucket  # noqa: F401

    # drive the registry callable through a synthetic parquet dir
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="evtx_", dir="/tmp")
    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "ts": pa.array(
            pd.to_datetime([0, 60, 60 + 3600, 0, 30, 90], unit="s")),
        "user_id": pa.array([7, 7, 7, 8, 8, 8], type=pa.int64()),
        "event_type": pa.array(["a", "b", "c", "a", "b", "a"]),
        "value": pa.array([0.0] * 6),
        "props": pa.array([""] * 6),
    })
    pq.write_table(ev, f"{tmp}/events.parquet")
    out = (q_event_transitions(tmp).to_pandas()
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    # user 7: a->b counts; b->c is 3600s apart -> dropped
    # user 8: a->b, b->a count
    want = pd.DataFrame({"from_type": ["a", "b"],
                         "to_type": ["b", "a"],
                         "n": np.array([2, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(out, want)
