"""Near-dup clustering conformance (north_rule: dup-pair recall >= 0.99
vs the oracle clustering at the same shingle/signature config).

Oracle = single-threaded all-pairs estimated-Jaccard over signatures from
the SAME MinHasher config (same seed -> same permutations), clustered by
union-find.  The engine's LSH path must recover >= 99% of oracle pairs
and reproduce the cluster labels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deduplicator_ray.config import MinHashConfig
from deduplicator_ray.sources.corpus import synth_corpus
from deduplicator_ray.stages.cc import (
    _unionfind,
    connected_components_auto,
    connected_components_distributed,
    connected_components_driver,
)
from deduplicator_ray.stages.minhash import MinHasher
from deduplicator_ray.pipelines.neardup import cluster_near_duplicates, ensure_doc_key

CFG = MinHashConfig(bands=32, rows_per_band=4)


@pytest.fixture(scope="module")
def corpus():
    pdf = synth_corpus(400, 42).to_pandas()
    pdf["doc_key"] = np.arange(len(pdf), dtype=np.int64)
    return pdf


@pytest.fixture(scope="module")
def oracle(corpus):
    mh = MinHasher(CFG)
    sigs = mh.signature_matrix(corpus["text"].tolist())
    n = len(corpus)
    eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    iu = np.triu_indices(n, k=1)
    mask = eq[iu] >= CFG.jaccard_threshold
    pairs = set(zip(iu[0][mask].tolist(), iu[1][mask].tolist()))
    roots = _unionfind(
        np.array([p[0] for p in pairs], dtype=np.int64),
        np.array([p[1] for p in pairs], dtype=np.int64),
    )
    return pairs, roots


@pytest.fixture(scope="module")
def engine_result(ray_session, corpus):
    import ray.data as rd

    ds = rd.from_pandas(corpus[["doc_key", "text"]])
    edges, asg = cluster_near_duplicates(ds, CFG)
    return edges.to_pandas(), asg.to_pandas()


def test_pair_recall(engine_result, oracle):
    e, _ = engine_result
    true_pairs, _ = oracle
    found = set(zip(e["a"].tolist(), e["b"].tolist()))
    missing = true_pairs - found
    recall = 1 - len(missing) / max(1, len(true_pairs))
    assert recall >= 0.99, f"recall {recall}: missing {len(missing)} of {len(true_pairs)}"
    # precision against the oracle criterion: every found edge satisfies
    # the same threshold (verification uses the same estimator)
    assert found <= true_pairs


def test_cluster_assignments_match_oracle(engine_result, oracle):
    _, asg = engine_result
    _, roots = oracle
    got = dict(zip(asg["doc_key"].tolist(), asg["cluster_id"].tolist()))
    nodes = set(roots)
    agree = sum(got.get(v, v) == roots.get(v, v) for v in nodes)
    assert agree == len(nodes)


def test_planted_clusters_recovered(engine_result, corpus):
    """Docs planted in the same true_cluster with low mutation must land
    in the same engine cluster (sanity beyond the estimator oracle)."""
    _, asg = engine_result
    got = dict(zip(asg["doc_key"].tolist(), asg["cluster_id"].tolist()))
    hub = corpus[corpus["true_cluster"] == -2]
    # all hub (empty) docs form one cluster
    labels = {got.get(int(k), int(k)) for k in hub["doc_key"]}
    assert len(labels) == 1


def test_mega_bucket_star_preserves_connectivity(ray_session, corpus, oracle):
    """With a tiny bucket cap the hub bucket degrades to star pairs; the
    resulting components must be identical."""
    import ray.data as rd

    cfg = MinHashConfig(bands=32, rows_per_band=4, max_band_group=5)
    ds = rd.from_pandas(corpus[["doc_key", "text"]])
    _, asg = cluster_near_duplicates(ds, cfg)
    asg = asg.to_pandas()
    _, roots = oracle
    got = dict(zip(asg["doc_key"].tolist(), asg["cluster_id"].tolist()))
    # same partition: every oracle component still maps to one engine label
    from collections import defaultdict

    comp_labels = defaultdict(set)
    for v, r in roots.items():
        comp_labels[r].add(got.get(v, v))
    assert all(len(ls) == 1 for ls in comp_labels.values())


def test_verified_edges_paths_agree(ray_session, corpus):
    """The driver-merge fast path and the join-based scale path must
    produce identical edge sets."""
    import ray.data as rd

    from deduplicator_ray.stages.lsh import band_explode, candidate_pairs, verified_edges
    from deduplicator_ray.stages.minhash import signatures

    ds = rd.from_pandas(corpus[["doc_key", "text"]])
    sigs = signatures(ds, CFG).materialize()
    pairs = candidate_pairs(band_explode(sigs, CFG), CFG).materialize()
    fast = verified_edges(pairs, sigs, CFG).to_pandas()
    joined = verified_edges(pairs, sigs, CFG, max_driver_pairs=0).to_pandas()
    f = set(zip(fast["a"], fast["b"]))
    j = set(zip(joined["a"], joined["b"]))
    assert f == j and len(f) > 0


def test_distributed_cc_equals_driver(ray_session, engine_result):
    import ray.data as rd

    e, asg_driver = engine_result
    if len(e) == 0:
        pytest.skip("no edges")
    edges_ds = rd.from_pandas(e)
    asg_dist = connected_components_distributed(edges_ds).to_pandas()
    a = asg_driver.sort_values("doc_key", ignore_index=True)
    b = asg_dist.sort_values("doc_key", ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_distributed_cc_nonconvergence_raises(ray_session):
    """A chain graph needs ~diameter hash-min rounds; an exhausted round
    budget must raise, not return silently-wrong labels."""
    import ray.data as rd

    chain = pd.DataFrame({"a": np.arange(12, dtype=np.int64),
                          "b": np.arange(1, 13, dtype=np.int64)})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(rd.from_pandas(chain), max_rounds=2)


def test_cc_auto_guard_switches_paths(ray_session):
    """Above the edge cap the auto wrapper must take the distributed path
    and produce the same labels as the driver union-find."""
    import ray.data as rd

    edges = pd.DataFrame({"a": np.array([1, 2, 10], dtype=np.int64),
                          "b": np.array([2, 3, 11], dtype=np.int64)})
    ds = rd.from_pandas(edges)
    small = connected_components_auto(ds, driver_edge_limit=100)
    big = connected_components_auto(ds, driver_edge_limit=1)  # forces distributed
    a = small.to_pandas() if hasattr(small, "to_pandas") else small
    b = big.to_pandas() if hasattr(big, "to_pandas") else big
    a = pd.DataFrame(a).sort_values("doc_key", ignore_index=True)
    b = pd.DataFrame(b).sort_values("doc_key", ignore_index=True)
    assert a["doc_key"].tolist() == b["doc_key"].tolist() == [1, 2, 3, 10, 11]
    assert a["cluster_id"].tolist() == b["cluster_id"].tolist() == [1, 1, 1, 10, 10]


def test_empty_corpus(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame({"doc_key": pd.Series(dtype="int64"), "text": pd.Series(dtype=str)})
    )
    edges, asg = cluster_near_duplicates(ds, CFG)
    assert edges.count() == 0
    assert len(asg.to_pandas()) == 0


def test_ensure_doc_key(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame(
        {
            "url": ["http://a", "http://b", "http://a"],
            "warc_ts": pd.to_datetime([1, 2, 3], unit="s"),
            "text": ["x", "y", "z"],
        }
    )
    keyed = ensure_doc_key(rd.from_pandas(pdf)).to_pandas()
    assert keyed["doc_key"].nunique() == 3  # (url, ts) unique -> unique keys
    # deterministic across calls
    keyed2 = ensure_doc_key(rd.from_pandas(pdf)).to_pandas()
    assert keyed["doc_key"].tolist() == keyed2["doc_key"].tolist()


# ---------------------------------------------------------------------------
# incremental (snapshot-over-snapshot) dedup
# ---------------------------------------------------------------------------


def test_incremental_neardup_vs_oracle(ray_session, corpus, oracle):
    """Split the synthetic corpus old/new; incremental_neardup must find
    >= 99% of the oracle's CROSS (old x new) pairs' new docs, report only
    cross matches, and pick each new doc's best old match (max estimated
    Jaccard, min old key on ties) — same estimator, same config."""
    import ray.data as rd

    from deduplicator_ray.pipelines.neardup import incremental_neardup
    from deduplicator_ray.stages.minhash import MinHasher

    old_mask = corpus["doc_key"] % 3 == 0
    old_pdf = corpus[old_mask][["doc_key", "text"]]
    new_pdf = corpus[~old_mask][["doc_key", "text"]]

    got = (
        incremental_neardup(rd.from_pandas(new_pdf), rd.from_pandas(old_pdf), CFG)
        .to_pandas().sort_values("doc_key", ignore_index=True)
    )
    # outputs reference the correct sides only
    assert (got["doc_key"] % 3 != 0).all()
    assert (got["dup_of"] % 3 == 0).all()

    # oracle: all-pairs estimated Jaccard, cross pairs only, best per new
    mh = MinHasher(CFG)
    sigs = mh.signature_matrix(corpus["text"].tolist())
    keys = corpus["doc_key"].to_numpy()
    old_idx = np.flatnonzero(old_mask.to_numpy())
    new_idx = np.flatnonzero(~old_mask.to_numpy())
    eq = (sigs[new_idx][:, None, :] == sigs[old_idx][None, :, :]).mean(axis=2)
    want = {}
    for i, ni in enumerate(new_idx):
        m = eq[i] >= CFG.jaccard_threshold
        if m.any():
            j = eq[i][m]
            cand_keys = keys[old_idx][m]
            order = np.lexsort((cand_keys, -j))
            want[int(keys[ni])] = (int(cand_keys[order[0]]), float(j[order[0]]))
    assert want, "oracle found no cross near-dups; corpus split is degenerate"

    got_map = {int(r.doc_key): (int(r.dup_of), float(r.est_jaccard))
               for r in got.itertuples()}
    missing = set(want) - set(got_map)
    recall = 1 - len(missing) / len(want)
    assert recall >= 0.99, f"recall {recall}: missing {sorted(missing)[:5]}"
    # found rows are exact: same best match + same estimate
    for k, (dup, j) in got_map.items():
        assert k in want, f"new doc {k} reported but not an oracle dup"
        assert (dup, round(j, 9)) == (want[k][0], round(want[k][1], 9)), k


def test_incremental_neardup_precomputed_signatures(ray_session, corpus):
    """old_is_signatures=True over a persisted (doc_key, minhash_sig)
    table must equal the from-text path row for row."""
    import ray.data as rd

    from deduplicator_ray.pipelines.neardup import incremental_neardup
    from deduplicator_ray.stages.minhash import signatures

    old_mask = corpus["doc_key"] % 3 == 0
    old_pdf = corpus[old_mask][["doc_key", "text"]]
    new_pdf = corpus[~old_mask][["doc_key", "text"]]
    old_sigs = signatures(rd.from_pandas(old_pdf), CFG).materialize()

    a = (incremental_neardup(rd.from_pandas(new_pdf), rd.from_pandas(old_pdf), CFG)
         .to_pandas().sort_values("doc_key", ignore_index=True))
    b = (incremental_neardup(rd.from_pandas(new_pdf), old_sigs, CFG,
                             old_is_signatures=True)
         .to_pandas().sort_values("doc_key", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)


def test_incremental_neardup_exact_verify(ray_session, corpus):
    """verify="exact": LSH candidates + exact 5-gram Jaccard (4/5).
    Output must equal the all-pairs exact cross-join oracle (best match
    per new doc by true Jaccard, ties to smallest old key)."""
    import ray.data as rd

    from deduplicator_ray.pipelines.neardup import incremental_neardup
    from deduplicator_ray.stages.jaccard import _gram_hashes

    old_mask = corpus["doc_key"] % 3 == 0
    old_pdf = corpus[old_mask][["doc_key", "text"]]
    new_pdf = corpus[~old_mask][["doc_key", "text"]]

    got = (incremental_neardup(rd.from_pandas(new_pdf), rd.from_pandas(old_pdf),
                               CFG, verify="exact", exact_ngram=5,
                               exact_num=4, exact_den=5)
           .to_pandas().sort_values("doc_key", ignore_index=True))

    grams = {int(k): _gram_hashes(t, 5)
             for k, t in zip(corpus["doc_key"], corpus["text"])}
    want = {}
    for nk in new_pdf["doc_key"]:
        best = None
        for ok in old_pdf["doc_key"]:
            ga, gb = grams[int(nk)], grams[int(ok)]
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            if inter > 0 and 5 * inter >= 4 * union:
                j = inter / union
                cand = (-j, int(ok), inter, union)
                if best is None or cand < best:
                    best = cand
        if best is not None:
            want[int(nk)] = (best[1], best[2], best[3])
    assert want, "degenerate split: no exact cross near-dups"

    got_map = {int(r.doc_key): (int(r.dup_of), int(r.n_inter), int(r.n_union))
               for r in got.itertuples()}
    assert got_map == want

    with pytest.raises(ValueError, match="old_is_signatures"):
        incremental_neardup(rd.from_pandas(new_pdf),
                            rd.from_pandas(old_pdf), CFG,
                            verify="exact", old_is_signatures=True)
    with pytest.raises(ValueError, match="verify"):
        incremental_neardup(rd.from_pandas(new_pdf),
                            rd.from_pandas(old_pdf), CFG, verify="bogus")
