"""Curation queries (pipelines/queries_curate.py): oracle parity plus
property tests for the order-statistics LCP identity the template
operators rely on."""

from __future__ import annotations

import os.path

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "name", ["lang_alpha_weights", "section_template", "template_strip"])
def test_oracle_parity(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_curate import registry_curate

    fn, sql = registry_curate()[name]
    got = fn(sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = duck.execute(sql).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


# ---------------------------------------------------------------------------
# the LCP order-statistics identity: LCP(group) == LCP(min, max)
# ---------------------------------------------------------------------------

_words = st.text(alphabet="abcxyz é", min_size=0, max_size=12)


@settings(max_examples=300, deadline=None)
@given(st.lists(_words, min_size=1, max_size=8))
def test_lcp_identity_matches_bruteforce(strings):
    from deduplicator_ray.pipelines.queries_curate import _lcp_len

    got = _lcp_len(min(strings), max(strings))
    want = len(os.path.commonprefix(strings))
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.lists(_words, min_size=1, max_size=8))
def test_common_suffix_via_reversal(strings):
    from deduplicator_ray.pipelines.queries_curate import _lcp_len

    rev = [s[::-1] for s in strings]
    got = _lcp_len(min(rev), max(rev))
    want = len(os.path.commonprefix(rev))
    assert got == want


def test_lcp_len_edges():
    from deduplicator_ray.pipelines.queries_curate import _lcp_len

    assert _lcp_len("", "") == 0
    assert _lcp_len("", "abc") == 0
    assert _lcp_len("abc", "abc") == 3
    assert _lcp_len("abcd", "abce") == 3
    assert _lcp_len("héllo world", "héllo there") == 6  # codepoints, not bytes


def test_template_strip_planted(ray_session, sf_dir):
    """A multi-page (host, section) group's pages lose exactly the
    group's prefix_len + suffix_len; singleton groups are untouched."""
    from deduplicator_ray.pipelines.queries_curate import (
        q_section_template,
        q_template_strip,
    )

    tpl = q_section_template(sf_dir).set_index(["host", "section"])
    out = q_template_strip(sf_dir).to_pandas()
    for (_, row) in out.iterrows():
        t = tpl.loc[(row["host"], row["section"])]
        strip = int(t["prefix_len"] + t["suffix_len"]) if t["n_pages"] >= 2 else 0
        assert row["cleaned_len"] == max(int(row["orig_len"]) - strip, 0)
    # the synthetic corpus's v2 section shares the ' v2' suffix
    v2 = tpl[tpl.index.get_level_values("section") == "v2"]
    if len(v2) and (v2["n_pages"] >= 2).any():
        assert (v2.loc[v2["n_pages"] >= 2, "suffix_len"] >= 3).all()


def test_kcenter_sample_planted(ray_session):
    """Three well-separated clusters + k=3: the greedy picks hit all
    three clusters (the 2-approximation's whole point), seed is the
    smallest id, radii are non-increasing after round 1."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.stages.embed import kcenter_sample

    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    rows = []
    for ci, c in enumerate(centers):
        for j in range(20):
            rows.append({"vec_id": ci * 100 + j,
                         "embedding": (c + rng.normal(0, .1, 2)).tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = kcenter_sample(ds, k=3)
    assert out["round"].tolist() == [0, 1, 2]
    assert out["vec_id"][0] == 0  # seed = min id
    picked_clusters = sorted(out["vec_id"] // 100)
    assert picked_clusters == [0, 1, 2]
    assert out["radius_micro"][1] >= out["radius_micro"][2] >= 0


def test_kcenter_sample_k_exceeds_n(ray_session):
    """k > #points returns the n points found (no IndexError)."""
    import ray.data as rd

    from deduplicator_ray.stages.embed import kcenter_sample

    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": [3, 7], "embedding": [[0.0, 0.0], [1.0, 0.0]]}))
    out = kcenter_sample(ds, k=5)
    assert out["vec_id"].tolist() == [3, 7]
    assert out["round"].tolist() == [0, 1]


def test_knn_label_noise_noncontiguous_ids(ray_session, tmp_path):
    """vec_ids 10,20,...  (non-contiguous): self-exclusion and the
    knn_label ids must still be correct — pins the query_id→vec_id
    mapping (cosine_topk's query_id is a row index, not an id)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_curate import (
        _KNN_NOISE_K, q_knn_label_noise)

    rng = np.random.default_rng(11)
    n = 24
    ids = (np.arange(n) + 1) * 10  # 10, 20, ..., non-contiguous
    V = rng.normal(size=(n, 4))
    labels = (np.arange(n) % 3).astype(np.int32)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in V],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))

    out = q_knn_label_noise(str(tmp_path))
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.set_index("vec_id").sort_index()
    assert sorted(out.index) == sorted(ids)  # every id audited once

    # brute-force reference with float32-exact cosines
    Vf = V.astype(np.float32).astype(np.float64)
    Vn = Vf / np.linalg.norm(Vf, axis=1, keepdims=True)
    cos = Vn @ Vn.T
    for qi, qid in enumerate(ids):
        order = sorted((j for j in range(n) if j != qi),
                       key=lambda j: (-cos[qi, j], ids[j]))
        nb = order[:_KNN_NOISE_K]
        votes = {}
        for j in nb:
            votes[labels[j]] = votes.get(labels[j], 0) + 1
        maj = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert out.loc[qid, "knn_label"] == maj, qid
        assert out.loc[qid, "agree"] == int(labels[qi] == maj)


@pytest.mark.parametrize(
    "name", ["kcenter_sample", "knn_label_noise", "decontaminate_embed"])
def test_oracle_parity_embed_ops(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_curate import registry_curate

    fn, sql = registry_curate()[name]
    got = fn(sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = duck.execute(sql).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_decontaminate_embed_planted(ray_session, tmp_path):
    """A train vector identical to a benchmark vector is flagged; an
    orthogonal one is not."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_curate import q_decontaminate_embed

    d = 8
    rows = {
        0: np.eye(d)[0],                      # benchmark (id % 20 == 0)
        20: np.eye(d)[1],                     # benchmark
        1: np.eye(d)[0],                      # exact copy of bench 0
        2: np.eye(d)[2],                      # orthogonal to both
    }
    tbl = pa.table({
        "vec_id": pa.array(list(rows), pa.int64()),
        "embedding": pa.array([v.tolist() for v in rows.values()],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = q_decontaminate_embed(str(tmp_path)).to_pandas().set_index("vec_id")
    assert out.loc[1, "is_contaminated"] == 1
    assert out.loc[1, "nn_bench_id"] == 0
    assert out.loc[2, "is_contaminated"] == 0


@pytest.mark.parametrize(
    "name", ["greedy_coverage_sample", "closest_capture"])
def test_oracle_parity_round2(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_curate import registry_curate

    fn, sql = registry_curate()[name]
    got = fn(sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = duck.execute(sql).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_greedy_coverage_monotone_gains(ray_session, sf_dir):
    """Submodularity: the greedy's marginal gains never increase."""
    from deduplicator_ray.pipelines.queries_curate import (
        q_greedy_coverage_sample,
    )

    out = q_greedy_coverage_sample(sf_dir)
    gains = out["gain"].tolist()
    assert gains == sorted(gains, reverse=True)
    assert out["doc_id"].is_unique
