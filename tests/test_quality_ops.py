"""Tests for the quality/reweighting operator family: gopher rule flags,
the filter-ablation grid, SoftDeDup weights, the LSH banding-plan census
and CCNet perplexity buckets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _mixed_docs():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)] + ["the", "and", "of", "99"]
    docs = {}
    for i in range(40):
        nw = int(rng.integers(3, 30))
        docs[i] = " ".join(rng.choice(vocab, nw))
    docs[40] = "and " + " ".join(["the"] * 11)          # repetitive
    docs[41] = " ".join(["aaaaaaaaaaaaaaaa"] * 10)      # long words
    docs[42] = " ".join(["123", "456", "789"] * 5)      # non-alpha
    docs[43] = ""                                       # empty
    docs[44] = "the and " + " ".join(f"word{j}" for j in range(20))
    return docs


def test_gopher_flags_consistent_with_project(ray_session):
    """keep (first-fail mode) must equal the AND of the five independent
    rule bits (flags mode) — same kernels, two reporting shapes."""
    import ray.data as rd

    from deduplicator_ray.stages.textstats import gopher_filter

    docs = _mixed_docs()
    stops = frozenset({"the", "and", "of"})
    pdf = pd.DataFrame({"doc_id": list(docs), "text": [docs[k] for k in docs]})
    proj = (gopher_filter(rd.from_pandas(pdf), min_words=5, stopwords=stops)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    flags = (gopher_filter(rd.from_pandas(pdf), min_words=5, stopwords=stops,
                           output="flags")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    bits = ["len_ok", "wordlen_ok", "alpha_ok", "stop_ok", "rep_ok"]
    assert (flags[bits].all(axis=1) == proj["keep"]).all()
    # n_words matches the single-space-split convention
    assert (flags["n_words"].to_numpy()
            == np.array([len(docs[k].split(" ")) for k in sorted(docs)])).all()
    # all five bits are exercised in both directions on this corpus
    for c in bits:
        assert flags[c].nunique() == 2, c


def test_gopher_flags_rejects_bad_output(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.textstats import gopher_filter

    with pytest.raises(ValueError):
        gopher_filter(rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]})),
                      output="nope")


def test_soft_dedup_weights_groups_and_rounding(ray_session):
    """Case/punct variants share a normalized group; weight_ppm is
    round-half-up of 1e6/size via pure integer arithmetic."""
    import ray.data as rd

    from deduplicator_ray.pipelines.queries_ext import q_soft_dedup_weights

    # build via the query path on a temp parquet table
    import os
    import tempfile

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["Hello World", "hello, world!", "HELLO world",
                 "unique one", "another doc", "another doc"],
    })
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"), index=False)
        out = (q_soft_dedup_weights(td).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    assert list(out.columns) == ["doc_id", "n_tokens", "group_size",
                                 "weight_ppm"]
    size = dict(zip(out["doc_id"], out["group_size"]))
    assert size[1] == size[2] == size[3] == 3
    assert size[4] == 1 and size[5] == size[6] == 2
    w = dict(zip(out["doc_id"], out["weight_ppm"]))
    assert w[4] == 1_000_000 and w[5] == 500_000
    assert w[1] == 333_333  # floor(1e6/3 + 0.5)
    ntok = dict(zip(out["doc_id"], out["n_tokens"]))
    assert ntok[1] == 2 and ntok[4] == 2


def test_lsh_tuning_curve_monotone(ray_session, sf_dir):
    """More rows per band -> higher characteristic threshold -> fewer
    expected candidates and more expected misses; the closed-form
    thresholds match (1/b)^(1/r)."""
    from deduplicator_ray.pipelines.queries_ext import (_LSH_LAYOUTS,
                                                        q_lsh_tuning_curve)

    out = q_lsh_tuning_curve(sf_dir).sort_values(
        "rows_per_band").reset_index(drop=True)
    assert len(out) == len(_LSH_LAYOUTS)
    # one n_pairs census, identical across layouts
    assert out["n_pairs"].nunique() == 1 and int(out["n_pairs"].iloc[0]) > 0
    for _, row in out.iterrows():
        want = int(np.floor((1.0 / row["n_bands"])
                            ** (1.0 / row["rows_per_band"]) * 1e6 + 0.5))
        assert int(row["thresh_pm"]) == want
    # sorted by rows_per_band ascending = threshold ascending
    assert out["thresh_pm"].is_monotonic_increasing
    assert out["exp_candidates_milli"].is_monotonic_decreasing
    assert out["exp_missed_milli"].is_monotonic_increasing
    # candidates are bounded by the pair census; misses by the high pairs
    assert (out["exp_candidates_milli"] <= out["n_pairs"] * 1000).all()
    assert (out["exp_missed_milli"] <= out["n_pairs_high"] * 1000).all()


def _brute_ccnet(docs: pd.DataFrame, quant: int = 1000) -> pd.DataFrame:
    """Reference CCNet bucketing: add-one unigram model over the full
    vocabulary (min_ppm low enough that every word qualifies), per-lang
    third-mass thresholds on quantized scores, ties to the lower bucket."""
    toks = [(r.doc_id, r.lang, w)
            for r in docs.itertuples() for w in (r.text or "").split(" ")]
    tf = pd.DataFrame(toks, columns=["doc_id", "lang", "w"])
    n = len(tf)
    cnt = tf["w"].value_counts()
    v = len(cnt)
    logp = np.log((cnt + 1.0) / (n + v + 1))
    tf["lp"] = tf["w"].map(logp)
    per = tf.groupby(["doc_id", "lang"], as_index=False)["lp"].mean()
    per["llm"] = np.floor(-per["lp"] * quant + 0.5).astype("int64")
    rows = []
    for lang, g in per.groupby("lang"):
        h = g.groupby("llm").size().sort_index()
        cc = h.cumsum()
        nn = int(cc.iloc[-1])
        c1 = int(cc.index[np.searchsorted(3 * cc.to_numpy(), nn)])
        c2 = int(cc.index[np.searchsorted(3 * cc.to_numpy(), 2 * nn)])
        for r in g.itertuples():
            b = ("head" if r.llm <= c1
                 else "middle" if r.llm <= c2 else "tail")
            rows.append({"doc_id": r.doc_id, "lang": lang,
                         "llm": int(r.llm), "bucket": b})
    return (pd.DataFrame(rows).sort_values("doc_id")
            .reset_index(drop=True))


def test_ccnet_buckets_matches_bruteforce(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.textstats import ccnet_buckets

    rng = np.random.default_rng(7)
    # Zipf-ish vocab so docs get genuinely different mean NLL
    vocab = np.array([f"t{i}" for i in range(50)])
    weights = 1.0 / np.arange(1, 51)
    weights /= weights.sum()
    rows = []
    for i in range(90):
        lang = ["en", "de", "zh"][i % 3]
        nw = int(rng.integers(4, 40))
        rows.append({"doc_id": i, "lang": lang,
                     "text": " ".join(rng.choice(vocab, nw, p=weights))})
    # exact ties: three identical docs in one language must share a bucket
    for j, i in enumerate(range(90, 93)):
        rows.append({"doc_id": i, "lang": "en", "text": "t0 t1 t2 t3 t4"})
    docs = pd.DataFrame(rows)
    got = (ccnet_buckets(rd.from_pandas(docs), min_ppm=1, quant=1000)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute_ccnet(docs)
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "llm", "bucket"]], want, check_dtype=False)
    tied = got[got["doc_id"].isin([90, 91, 92])]["bucket"]
    assert tied.nunique() == 1
    # every language fills all three buckets on this spread
    full = got.groupby("lang")["bucket"].nunique()
    assert (full == 3).all()
    # per-lang head mass reaches at least ceil(n/3)
    for lang, g in got.groupby("lang"):
        nn = len(g)
        assert (g["bucket"] == "head").sum() >= -(-nn // 3)


def test_quality_ablation_grid_totals(ray_session, sf_dir):
    """Grid cells partition the corpus: doc and token totals must equal
    the corpus totals, and the all-True cell must equal gopher keeps."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from deduplicator_ray.pipelines.queries_ext import (
        _GOPHER_MAX_WORDS, _GOPHER_MIN_WORDS, _gopher_stoplist,
        q_quality_ablation_grid)
    from deduplicator_ray.stages.textstats import gopher_filter

    out = q_quality_ablation_grid(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert int(out["n_docs"].sum()) == n_docs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    keeps = (gopher_filter(ds, min_words=_GOPHER_MIN_WORDS,
                           max_words=_GOPHER_MAX_WORDS,
                           stopwords=_gopher_stoplist())
             .to_pandas()["keep"].sum())
    bits = ["len_ok", "wordlen_ok", "alpha_ok", "stop_ok", "rep_ok"]
    cell = out[out[bits].all(axis=1)]
    assert int(cell["n_docs"].sum()) == int(keeps)


def test_curation_policy_arithmetic(ray_session, sf_dir):
    """final_weight_ppm must be reconstructible from the row's own
    (keep, bucket, group_size) via the documented integer formula, and
    dropped docs must carry exactly 0."""
    from deduplicator_ray.pipelines.queries_ext import (_POLICY_BUCKET_PPM,
                                                        q_curation_policy)

    out = q_curation_policy(sf_dir).to_pandas()
    gs = out["group_size"].to_numpy(np.int64)
    soft = (2_000_000 + gs) // (2 * gs)
    mult = out["bucket"].map(_POLICY_BUCKET_PPM).to_numpy(np.int64)
    want = np.where(out["keep"].to_numpy(bool),
                    (soft * mult) // 1_000_000, 0)
    assert (out["final_weight_ppm"].to_numpy(np.int64) == want).all()
    assert (out.loc[~out["keep"], "final_weight_ppm"] == 0).all()
    # the policy must be non-degenerate on the test corpus
    assert out["keep"].any() and (~out["keep"]).any()
    assert out["bucket"].nunique() == 3


def test_policy_sample_membership_and_monotonicity(ray_session, sf_dir):
    """Sample membership must be exactly the documented Weyl predicate
    over the policy frame, and nested: every sampled doc would also be
    sampled at any higher weight (draw < ppm is monotone in ppm)."""
    from deduplicator_ray.pipelines.queries_ext import (_POLICY_SAMPLE_SEED,
                                                        q_curation_policy,
                                                        q_policy_sample)
    from deduplicator_ray.stages.shuffle import shuffle_key

    pol = q_curation_policy(sf_dir).to_pandas()
    got = set(q_policy_sample(sf_dir).to_pandas()["doc_id"])
    ids = pol["doc_id"].to_numpy(np.int64)
    draw = (shuffle_key(ids, _POLICY_SAMPLE_SEED)
            % np.uint64(1_000_000)).astype(np.int64)
    want = set(ids[draw < pol["final_weight_ppm"].to_numpy(np.int64)])
    assert got == want
    assert got  # non-empty on the test corpus
    # dropped docs (weight 0) can never be sampled
    assert not got & set(pol.loc[~pol["keep"], "doc_id"])


def test_dataset_card_sections_consistent(ray_session, sf_dir):
    """Every section is a partition of the corpus: lang, source and
    lang_source rows must each sum to the total row, metric by metric;
    lang_source keys must refine the lang section."""
    from deduplicator_ray.pipelines.queries_ext import q_dataset_card

    out = q_dataset_card(sf_dir).to_pandas()
    tot = out[out["section"] == "total"].iloc[0]
    for sec in ["lang", "source", "lang_source"]:
        sub = out[out["section"] == sec]
        for c in ["n_docs", "n_tokens", "n_chars", "n_empty"]:
            assert int(sub[c].sum()) == int(tot[c]), (sec, c)
    ls = out[out["section"] == "lang_source"]
    per_lang = (ls.assign(lang=ls["key"].str.split("/").str[0])
                .groupby("lang")["n_docs"].sum())
    lang = out[out["section"] == "lang"].set_index("key")["n_docs"]
    assert per_lang.sort_index().equals(lang.sort_index())


def test_jaccard_topk_bruteforce(ray_session, tmp_path):
    """Top-k rows must equal a brute-force exact-Jaccard ranking with the
    documented (ppm desc, cand_id asc) tie-break, on a planted corpus
    where doc 0 and 50 are queries."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_ext import (_JTOPK_K,
                                                        _JTOPK_MOD,
                                                        _JTOPK_NGRAM,
                                                        q_jaccard_topk)

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(12)]
    docs = {i: " ".join(rng.choice(vocab, int(rng.integers(4, 16))))
            for i in range(1, 120) if i % _JTOPK_MOD != 0}
    docs[0] = " ".join(vocab[:8])
    docs[_JTOPK_MOD] = " ".join(vocab[4:12])
    docs[3] = docs[0]                       # exact copy of query 0
    ids = sorted(docs)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": [docs[i] for i in ids],
                             "lang": ["en"] * len(ids),
                             "source": ["s"] * len(ids),
                             "n_chars": [len(docs[i]) for i in ids]}),
                   tmp_path / "documents.parquet")
    got = q_jaccard_topk(str(tmp_path)).reset_index(drop=True)

    def sh(t):
        w = t.split(" ")
        return {tuple(w[i:i + _JTOPK_NGRAM])
                for i in range(len(w) - _JTOPK_NGRAM + 1)}

    rows = []
    for q in (0, _JTOPK_MOD):
        qs = sh(docs[q])
        scored = []
        for c in ids:
            if c % _JTOPK_MOD == 0:
                continue
            cs = sh(docs[c])
            i = len(qs & cs)
            if i:
                scored.append((i * 1_000_000 // len(qs | cs), -c))
        scored.sort(reverse=True)
        for r, (ppm, negc) in enumerate(scored[:_JTOPK_K], 1):
            rows.append({"qid": q, "rank": r, "cand_id": -negc,
                         "jacc_ppm": ppm})
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    assert ((got["qid"] == 0) & (got["cand_id"] == 3)
            & (got["jacc_ppm"] == 1_000_000)).any()
