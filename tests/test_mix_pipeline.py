"""End-to-end data-mixing CLI tests (pipelines/mix_pipeline.py): funnel
correctness vs a pandas brute-force mirror of the Weyl-key rules, stage
resume, late-knob recompute scoping, and keep_ids path equivalence."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from deduplicator_ray.pipelines.mix_pipeline import build_parser, keep_ids, run
from deduplicator_ray.stages.shuffle import shuffle_key

SF = "/root/testdata/sf0.001"

ARGS = [
    "--rates", "en=0.9,de=0.8", "--default-rate", "0.5",
    "--seed-sample", "7",
    "--max-per-source", "60", "--seed-cap", "5",
    "--budgets", "en=4000,de=2000", "--default-budget", "800",
    "--seed-budget", "21",
    "--seed-order", "9", "--seq-len", "64",
    "--splits", "train=0.8,val=0.1,test=0.1", "--seed-split", "3",
]


def _run(out, extra=()):
    args = build_parser().parse_args([
        "--corpus", f"{SF}/documents.parquet", "--out", str(out),
        *ARGS, *extra,
    ])
    return run(args)


def _brute(seq_len=64):
    """The whole recipe in pandas, straight off the Weyl-key rules."""
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "lang", "source", "text"]).to_pandas()
    # sample
    k = shuffle_key(df["doc_id"].to_numpy(), 7)
    rate = df["lang"].map({"en": 0.9, "de": 0.8}).fillna(0.5)
    df = df[k < (rate * 2**64).astype(np.uint64)]
    # cap per source
    kc = shuffle_key(df["doc_id"].to_numpy(), 5)
    df = df.assign(_kc=kc).sort_values("_kc").groupby("source").head(60)
    # token budget per lang
    ntok = df["text"].fillna("").str.count(" ").to_numpy() + 1
    kb = shuffle_key(df["doc_id"].to_numpy(), 21)
    df = df.assign(n_tokens=ntok, _kb=kb).sort_values("_kb")
    df["_cum"] = df.groupby("lang")["n_tokens"].cumsum()
    lim = df["lang"].map({"en": 4000, "de": 2000}).fillna(800)
    df = df[df["_cum"] <= lim]
    # interleave by source
    ko = shuffle_key(df["doc_id"].to_numpy(), 9)
    df = df.assign(_ko=ko)
    df["_r"] = df.sort_values("_ko").groupby("source").cumcount()
    df = df.sort_values(["_r", "_ko"]).reset_index(drop=True)
    df["position"] = np.arange(len(df), dtype=np.int64)
    # split FIRST, then pack within each split over position order (a
    # sequence must never straddle a train/val/test boundary)
    ks = shuffle_key(df["doc_id"].to_numpy(), 3)
    cuts = np.array([int(0.8 * 2**64), int(0.9 * 2**64)], dtype=np.uint64)
    names = np.array(["train", "val", "test"], dtype=object)
    df["split"] = names[np.searchsorted(cuts, ks, side="right")]
    df = df.sort_values("position")
    cum = df.groupby("split", sort=False)["n_tokens"].cumsum().to_numpy()
    start = cum - df["n_tokens"].to_numpy()
    df["seq_id"] = start // seq_len
    df["seq_offset"] = start % seq_len
    return df[["doc_id", "lang", "source", "text", "n_tokens",
               "position", "seq_id", "seq_offset", "split"]]


def _read_out(rep):
    files = [os.path.join(rep["output_dir"], f)
             for f in os.listdir(rep["output_dir"]) if f.endswith(".parquet")]
    return pd.concat([pq.read_table(f).to_pandas() for f in files])


def test_mix_pipeline_matches_bruteforce(ray_session, tmp_path):
    rep = _run(tmp_path / "mix")
    want = _brute()
    assert rep["input_docs"] == 500
    assert rep["after_sample"] < rep["input_docs"]
    assert rep["after_budget"] == len(want)
    assert rep["output_docs"] == len(want)

    got = (_read_out(rep).sort_values("doc_id").reset_index(drop=True))
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)
    # every split present; interleave head covers every surviving source
    assert set(got["split"]) == {"train", "val", "test"}
    head = want.sort_values("position").head(want["source"].nunique())
    assert set(head["source"]) == set(want["source"])


def test_mix_pipeline_resume_and_late_knob(ray_session, tmp_path):
    out = tmp_path / "mix"
    rep1 = _run(out)
    assert rep1["resumed_stages"] == []
    # full rerun: every stage resumes
    rep2 = _run(out)
    assert rep2["resumed_stages"] == ["sampled", "capped", "budgeted", "mixed"]
    assert rep2["output_docs"] == rep1["output_docs"]
    # late knob (--seed-order) invalidates ONLY the mixed stage
    rep3 = _run(out, extra=("--seed-order", "10"))
    assert rep3["resumed_stages"] == ["sampled", "capped", "budgeted"]
    assert rep3["output_docs"] == rep1["output_docs"]  # reorder, same docs
    # REPORT.json on disk matches the last run
    with open(out / "REPORT.json") as f:
        assert json.load(f)["output_docs"] == rep3["output_docs"]


def test_keep_ids_paths_agree(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                        "x": np.arange(200) * 2})
    ids = np.array([3, 7, 150, 199, 1000], dtype=np.int64)
    a = (keep_ids(rd.from_pandas(pdf).repartition(4), ids)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (keep_ids(rd.from_pandas(pdf).repartition(4), ids, max_broadcast=0,
                  num_buckets=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = (pdf[pdf["doc_id"].isin(ids)]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, want)
    pd.testing.assert_frame_equal(b, want)


def test_mix_pipeline_sequences_never_straddle_splits(ray_session, tmp_path):
    rep = _run(tmp_path / "mix")
    got = _read_out(rep)
    # each (split, seq_id) pair must be token-contiguous within its split:
    # per split, consecutive docs in position order chain offsets exactly
    for split, g in got.groupby("split"):
        g = g.sort_values("position")
        start = g["seq_id"].to_numpy() * 64 + g["seq_offset"].to_numpy()
        want = np.concatenate(([0], np.cumsum(g["n_tokens"].to_numpy())[:-1]))
        assert (start == want).all(), split
        assert g["seq_id"].iloc[0] == 0  # each split numbers from 0


def test_mix_pipeline_rejects_bad_splits(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        _run(tmp_path / "mix", extra=("--splits", "train=0.9,val=0.05"))


def test_split_assign_trailing_zero_fraction(ray_session):
    import ray.data as rd

    from deduplicator_ray.stages.shuffle import split_assign

    pdf = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)})
    got = (split_assign(rd.from_pandas(pdf),
                        [("train", 1.0), ("test", 0.0)], seed=2)
           .to_pandas())
    assert (got["split"] == "train").all()  # no OverflowError, no 'test'


def test_interleave_duplicate_id_across_groups_detected(ray_session):
    import pytest

    import ray.data as rd

    from deduplicator_ray.stages.shuffle import interleave_by_group

    # same doc_id in two different groups, with enough same-group rows
    # that the duplicates are NOT adjacent in (grp, key) order
    pdf = pd.DataFrame({
        "doc_id": np.concatenate([np.arange(300, dtype=np.int64),
                                  np.array([7], dtype=np.int64)]),
        "source": ["a"] * 300 + ["b"],
    })
    with pytest.raises(Exception, match="duplicate doc id"):
        interleave_by_group(rd.from_pandas(pdf), group_col="source",
                            num_buckets=4).materialize()


def test_keep_ids_dataset_side_no_driver_collect(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                        "x": np.arange(100) * 3})
    id_ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([2, 5, 99], dtype=np.int64)}))
    # Dataset id side, forced past the broadcast cap -> co-partition path
    got = (keep_ids(rd.from_pandas(pdf).repartition(3), id_ds,
                    max_broadcast=0, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = (pdf[pdf["doc_id"].isin([2, 5, 99])]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # and under the cap it matches too
    got2 = (keep_ids(rd.from_pandas(pdf).repartition(3), id_ds)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, want)
