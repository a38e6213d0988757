"""b-bit minhash (stages/minhash.py: bbit_pack / bbit_estimate_matrix /
bbit_jaccard_pairs): packing round-trip, estimator unbiasedness, and the
pipeline against exact duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deduplicator_ray.config import MinHashConfig
from deduplicator_ray.stages.minhash import (bbit_estimate_matrix, bbit_pack,
                                             _blob_matrix)


def _sig_table(sigs: np.ndarray) -> pa.Table:
    """(n, k) uint32 -> table with the MinHasher blob encoding."""
    n, k = sigs.shape
    blob = sigs.astype("<u4").tobytes()
    offsets = np.arange(n + 1, dtype=np.int32) * (4 * k)
    arr = pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)])
    return pa.table({"doc_key": pa.array(np.arange(n, dtype=np.int64)),
                     "minhash_sig": arr})


@pytest.mark.parametrize("b", [1, 2, 4, 8])
def test_bbit_pack_roundtrip(ray_session, b):
    import ray.data as rd

    rng = np.random.default_rng(3)
    k = 128
    sigs = rng.integers(0, 2**32, size=(40, k), dtype=np.uint32)
    ds = rd.from_arrow(_sig_table(sigs))
    out = bbit_pack(ds, MinHashConfig(), b=b).to_pandas()
    W = (k * b + 7) // 8
    got = np.stack([np.frombuffer(x, dtype=np.uint8)
                    for x in out.sort_values("doc_key")["bbit_sig"]])
    bits = np.unpackbits(got, axis=1)[:, : k * b].reshape(len(sigs), k, b)
    vals = (bits * (1 << np.arange(b - 1, -1, -1))).sum(axis=2)
    np.testing.assert_array_equal(vals, sigs & ((1 << b) - 1))


@pytest.mark.parametrize("b,f", [(1, 0.5), (2, 0.5), (1, 0.9), (4, 0.2)])
def test_bbit_estimator_unbiased(b, f):
    """Plant an exact agreement fraction f between two signature rows;
    the corrected estimate must recover f within the binomial bound."""
    rng = np.random.default_rng(int(f * 100) + b)
    k = 4096
    sa = rng.integers(0, 2**32, size=k, dtype=np.uint32)
    sb = rng.integers(0, 2**32, size=k, dtype=np.uint32)
    same = rng.random(k) < f
    sb[same] = sa[same]
    f_true = same.mean()

    def pack(s):
        low = (s & ((1 << b) - 1)).astype(np.uint8)
        bits = np.unpackbits(low[:, None], axis=1)[:, 8 - b:]
        return np.packbits(bits.ravel())[None, :]

    est = bbit_estimate_matrix(pack(sa), pack(sb), k=k, b=b)[0] / 1e6
    C = 2.0 ** -b
    stderr = np.sqrt(0.25 / k) / (1 - C)
    assert abs(est - f_true) < 5 * stderr, (est, f_true)


def test_bbit_pipeline_exact_dup(ray_session):
    """An exact duplicate estimates J=1 exactly; a planted near-dup
    estimates within the k=128, b=1 confidence band of its signature
    agreement; unrelated docs never surface."""
    import ray.data as rd

    from deduplicator_ray.stages.minhash import MinHasher, bbit_jaccard_pairs

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(400)]
    base = " ".join(rng.choice(vocab, size=120))
    near = base.rsplit(" ", 5)[0] + " " + " ".join(rng.choice(vocab, 5))
    rows = [(0, base), (1, base), (2, near)]
    rows += [(i, " ".join(rng.choice(vocab, size=100))) for i in range(3, 40)]
    pdf = pd.DataFrame(rows, columns=["doc_key", "text"])
    got = (bbit_jaccard_pairs(rd.from_pandas(pdf)).to_pandas()
           .set_index(["doc_a", "doc_b"])["j_est_ppm"])
    assert got.loc[(0, 1)] == 1_000_000
    # signature-level agreement for the near pair
    mh = MinHasher(MinHashConfig())
    sigs = mh.signature_matrix([base, near])
    f_sig = (sigs[0] == sigs[1]).mean()
    est = got.loc[(0, 2)] / 1e6
    assert abs(est - f_sig) <= 5 * np.sqrt(0.25 / 128) / 0.5
    # nothing pairs the random docs with the planted cluster
    idx = got.index.to_frame(index=False)
    assert set(idx["doc_a"]).issubset({0, 1, 2}) and set(idx["doc_b"]).issubset({0, 1, 2})


def test_containment_est_subset(ray_session):
    """A doc fully contained in a 2x bigger doc: c(A->B) ~ 1.0,
    c(B->A) ~ 0.5, J ~ 0.5 (so LSH candidacy holds); an exact dup pair
    estimates 1.0/1.0 exactly; unrelated docs never pair with them."""
    import ray.data as rd

    from deduplicator_ray.stages.minhash import containment_est_pairs

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(500)]
    half = " ".join(rng.choice(vocab, size=100))
    full = half + " " + " ".join(rng.choice(vocab, size=100))
    rows = [(0, half), (1, full), (2, full)]
    rows += [(i, " ".join(rng.choice(vocab, size=80))) for i in range(3, 30)]
    pdf = pd.DataFrame(rows, columns=["doc_key", "text"])
    # 32x4 banding: candidate threshold ~ (1/32)^(1/4) = 0.42, so the
    # J ~ 0.5 subset pair reliably surfaces (default 16x8 is keyed ~0.8
    # — exactly the documented high-c/low-J recall caveat)
    cfg = MinHashConfig(num_perms=128, bands=32, rows_per_band=4)
    got = (containment_est_pairs(rd.from_pandas(pdf), cfg).to_pandas()
           .set_index(["doc_a", "doc_b"]))
    d = got.loc[(1, 2)]
    assert d["c_ab_ppm"] == 1_000_000 and d["c_ba_ppm"] == 1_000_000
    s = got.loc[(0, 1)] if (0, 1) in got.index else got.loc[(0, 2)]
    assert s["c_ab_ppm"] > 850_000          # A inside B
    assert 350_000 < s["c_ba_ppm"] < 650_000
    assert 350_000 < s["j_est_ppm"] < 650_000
    idx = got.index.to_frame(index=False)
    assert set(idx["doc_a"]) <= {0, 1, 2} and set(idx["doc_b"]) <= {0, 1, 2}


def test_containment_ensemble_finds_high_ratio_pairs(ray_session):
    """The ensemble's raison d'etre: a doc fully contained in a ~4x
    bigger doc (J ~ 0.25, far below the default 16x8 banding threshold
    ~0.8) must surface, with EXACT intersection counts; output equals
    the brute-force containment pair set on this corpus (seeded,
    deterministic)."""
    import itertools

    import ray.data as rd

    from deduplicator_ray.stages.minhash import (containment_pairs_ensemble,
                                                 shingle_hashes)
    import re

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(800)]
    small = " ".join(rng.choice(vocab, size=60))
    big = small + " " + " ".join(rng.choice(vocab, size=180))   # ratio ~4
    rows = [(0, small), (1, big), (2, big)]
    rows += [(i, " ".join(rng.choice(vocab, size=100))) for i in range(3, 40)]
    pdf = pd.DataFrame(rows, columns=["doc_key", "text"])

    NUM, DEN = 4, 5
    got = containment_pairs_ensemble(
        rd.from_pandas(pdf), num=NUM, den=DEN).to_pandas()
    found = {(a, b): (i, sa, sb) for a, b, i, sa, sb in
             zip(got["doc_a"], got["doc_b"], got["n_inter"],
                 got["size_a"], got["size_b"])}

    token_re = re.compile(r"\w+", re.UNICODE)
    sets = {r.doc_key: set(shingle_hashes(r.text, 5, token_re).tolist())
            for r in pdf.itertuples()}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter > 0 and DEN * inter >= NUM * min(len(sets[a]), len(sets[b])):
            want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert (0, 1) in want                   # the planted high-ratio pair
    assert found == want                    # exact values, full recall here
