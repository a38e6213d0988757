"""End-to-end corpus-cleaning CLI tests (pipelines/clean_pipeline.py):
funnel correctness, output permutation, stage resume, and the drop_ids
broadcast/co-partition path equivalence."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from deduplicator_ray.pipelines.clean_pipeline import build_parser, drop_ids, run

SF = "/root/testdata/sf0.001"


def _run(out, extra=()):
    args = build_parser().parse_args([
        "--corpus", f"{SF}/documents.parquet", "--out", str(out),
        "--min-words", "40", "--extra-stopwords", "a", *extra,
    ])
    return run(args)


def test_clean_pipeline_end_to_end(ray_session, tmp_path):
    out = tmp_path / "clean"
    rep = _run(out)
    # funnel: monotone non-increasing, all stages accounted for
    assert rep["input_docs"] == 500
    assert rep["after_filter"] == rep["input_docs"] - sum(
        rep["drop_reasons"].values()
    )
    assert rep["after_neardup"] == rep["after_filter"] - rep["neardup_removed"]
    assert rep["after_span"] == rep["after_neardup"] - rep["span_docs_dropped"]
    assert rep["output_docs"] == rep["after_span"]
    assert rep["neardup_removed"] > 0  # the corpus plants near-dups

    # the written output IS the cleaned corpus with a permutation position
    files = [os.path.join(rep["output_dir"], f)
             for f in os.listdir(rep["output_dir"]) if f.endswith(".parquet")]
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert sorted(df.columns) == ["doc_key", "position", "text"]
    assert len(df) == rep["output_docs"]
    assert sorted(df["position"]) == list(range(len(df)))  # exact permutation
    assert df["doc_key"].is_unique

    # REPORT.json persisted
    with open(out / "REPORT.json") as f:
        assert json.load(f)["output_docs"] == rep["output_docs"]


def test_clean_pipeline_resume_skips_stages(ray_session, tmp_path, capsys):
    out = tmp_path / "clean"
    first = _run(out)
    capsys.readouterr()
    second = _run(out)
    logs = capsys.readouterr().out
    assert logs.count("[resume]") == 4  # all four stages skipped
    assert second["output_docs"] == first["output_docs"]
    assert second["drop_reasons"] == first["drop_reasons"]


def test_clean_pipeline_seed_change_resumes_upstream(ray_session, tmp_path, capsys):
    """Chained per-stage hashes: changing only --seed must reshuffle
    WITHOUT recomputing filter/neardup/span."""
    out = tmp_path / "clean"
    first = _run(out)
    capsys.readouterr()
    second = _run(out, extra=("--seed", "7"))
    logs = capsys.readouterr().out
    assert logs.count("[resume]") == 3      # filter, survivors, spandedup
    assert "[stage] 'shuffled'" in logs     # only the shuffle re-ran
    assert second["output_docs"] == first["output_docs"]


def test_clean_pipeline_span_catches_spans_without_neardup(ray_session, tmp_path):
    rep = _run(tmp_path / "c1", extra=("--no-neardup",))
    # near-dup docs stay in, so their shared spans must be span-deduped
    assert rep["after_neardup"] == rep["after_filter"]
    assert rep["span_words_removed"] > 0


def test_clean_pipeline_jsonl_source_matches_parquet(ray_session, tmp_path):
    """The jsonl registered source feeds the same pipeline to the same
    funnel as the parquet read of the same rows."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    jl = tmp_path / "docs.jsonl"
    with open(jl, "w") as f:
        for row in tbl.to_pylist():
            f.write(json.dumps(row) + "\n")
    rep_j = run(build_parser().parse_args([
        "--corpus", str(jl), "--corpus-format", "jsonl",
        "--out", str(tmp_path / "cj"), "--min-words", "40",
        "--extra-stopwords", "a",
    ]))
    rep_p = _run(tmp_path / "cp")
    for k in ("input_docs", "after_filter", "after_neardup", "output_docs",
              "drop_reasons"):
        assert rep_j[k] == rep_p[k]


def test_jsonl_warc_ts_keys_match_parquet(ray_session, tmp_path):
    """Arrow's JSON reader infers ISO-Z strings as timestamp[s]; the jsonl
    source must normalize to timestamp[us] so url|warc_ts doc keys hash
    identically across formats (else cross-format dedup silently finds
    nothing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.neardup import ensure_doc_key
    from deduplicator_ray.sources import get_source

    rows = [{"url": f"https://ex.org/{i}",
             "warc_ts": f"2013-01-01T00:00:0{i}Z",
             "text": f"doc {i}"} for i in range(5)]
    jl = tmp_path / "d.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    pqf = tmp_path / "d.parquet"
    tbl = pa.table({
        "url": [r["url"] for r in rows],
        "warc_ts": pa.array(
            [pd.Timestamp(r["warc_ts"]) for r in rows],
            type=pa.timestamp("us", tz="UTC"),
        ),
        "text": [r["text"] for r in rows],
    })
    pq.write_table(tbl, pqf)

    import ray.data as rd

    kj = ensure_doc_key(get_source("jsonl")(str(jl))).to_pandas()
    kp = ensure_doc_key(rd.read_parquet(str(pqf))).to_pandas()
    assert sorted(kj["doc_key"]) == sorted(kp["doc_key"])

    # fractional-second Z strings defeat Arrow's timestamp inference (the
    # column arrives as string) — the string branch must parse them too
    jl2 = tmp_path / "d2.jsonl"
    with open(jl2, "w") as f:
        for i, r in enumerate(rows):
            r2 = dict(r, warc_ts=r["warc_ts"].replace("Z", f".{i}00Z"))
            f.write(json.dumps(r2) + "\n")
    got = get_source("jsonl")(str(jl2)).to_pandas()
    import pyarrow as pa2

    assert str(got["warc_ts"].dtype).startswith("datetime64")
    assert got["warc_ts"].iloc[1].microsecond == 100_000


def test_split_documents_rejects_gapped_stride(ray_session):
    import pytest

    from deduplicator_ray.stages.sentdedup import split_documents

    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a b c d"]}))
    with pytest.raises(ValueError, match="stride"):
        split_documents(ds, words_per_chunk=2, stride=5)


def test_drop_ids_paths_agree(ray_session):
    import ray.data as rd

    pdf = pd.DataFrame({"doc_key": np.arange(100, dtype=np.int64),
                        "text": [f"t{i}" for i in range(100)]})
    ids = np.array([3, 7, 50, 99], dtype=np.int64)
    ds = rd.from_pandas(pdf).repartition(4)
    a = (drop_ids(ds, ids, max_broadcast=1000).to_pandas()
         .sort_values("doc_key").reset_index(drop=True))
    b = (drop_ids(ds, ids, max_broadcast=0).to_pandas()
         .sort_values("doc_key").reset_index(drop=True))
    want = (pdf[~pdf["doc_key"].isin(ids)]
            .sort_values("doc_key").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, want)
    pd.testing.assert_frame_equal(b[["doc_key", "text"]], want)


def test_drop_ids_dataset_side(ray_session):
    """ids may arrive as a single-column Dataset (the distributed
    semantic-stage producer): both the collect-and-broadcast branch and
    the beyond-cap hash-join branch must agree with the numpy path,
    including when the id column is named differently (vec_id)."""
    import ray.data as rd

    pdf = pd.DataFrame({"doc_key": np.arange(100, dtype=np.int64),
                        "text": [f"t{i}" for i in range(100)]})
    ids = np.array([3, 7, 50, 99], dtype=np.int64)
    ds = rd.from_pandas(pdf).repartition(4)
    id_ds = rd.from_pandas(pd.DataFrame({"vec_id": ids})).repartition(2)
    want = (pdf[~pdf["doc_key"].isin(ids)]
            .sort_values("doc_key").reset_index(drop=True))
    a = (drop_ids(ds, id_ds, max_broadcast=1000).to_pandas()
         .sort_values("doc_key").reset_index(drop=True))
    b = (drop_ids(ds, id_ds, max_broadcast=0).to_pandas()
         .sort_values("doc_key").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, want)
    pd.testing.assert_frame_equal(b[["doc_key", "text"]], want)

    empty = rd.from_pandas(pd.DataFrame({"vec_id": np.empty(0, np.int64)}))
    c = drop_ids(ds, empty, max_broadcast=1000).to_pandas()
    assert len(c) == 100


def test_drop_ids_copartition_keeps_int_dtypes(ray_session):
    """The union null-pads the id rows' doc columns; the Arrow-native
    anti reduce must NOT promote int64 payload columns to float64."""
    import ray.data as rd

    pdf = pd.DataFrame({
        "doc_key": np.arange(20, dtype=np.int64),
        "n_chars": np.arange(20, dtype=np.int64) * 10,
    })
    ids = np.array([1, 5], dtype=np.int64)
    out = drop_ids(rd.from_pandas(pdf).repartition(2), ids,
                   max_broadcast=0)
    schema = out.schema()
    got = dict(zip(schema.names, (str(t) for t in schema.types)))
    assert got["n_chars"] == "int64", got
    assert sorted(out.to_pandas()["doc_key"]) == [
        k for k in range(20) if k not in (1, 5)
    ]


def test_clean_pipeline_wet_source(ray_session, tmp_path):
    """A WET corpus drives the full cleaning pipeline: url|warc_ts doc
    keys, an exact dup collapses, distinct docs survive."""
    from deduplicator_ray.sources.wet import write_wet

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")
    recs = [
        {"url": f"https://w.example/p/{i}",
         "date": f"2024-03-{i + 1:02d}T00:00:00Z",
         "text": f"doc{i} " * 3 + base + f" tail{i} " * 5}
        for i in range(4)
    ]
    recs.append({"url": "https://w.example/dup",
                 "date": "2024-03-09T00:00:00Z", "text": recs[0]["text"]})
    d = tmp_path / "wet"
    d.mkdir()
    write_wet(str(d / "c.warc.wet.gz"), recs)
    args = build_parser().parse_args([
        "--corpus", str(d / "c.warc.wet.gz"), "--corpus-format", "wet",
        "--out", str(tmp_path / "out"), "--min-words", "5",
        "--no-span", "--extra-stopwords", "alpha,bravo",
    ])
    rep = run(args)
    assert rep["input_docs"] == 5
    assert rep["neardup_removed"] >= 1  # the planted exact dup collapses
    assert rep["output_docs"] == rep["after_neardup"]


def _write_sem_fixture(tmp_path):
    """12 long docs; doc 1/2 near-dup texts (2 removed by neardup);
    embeddings where vec 2 ≡ vec 3 (semantic pair) and vec 6 ≡ vec 7."""
    import pyarrow as pa

    base = [
        "doc %d body %s tail%d" % (
            i, " ".join(f"w{i}x{j} y{i * 31 + j}" for j in range(40)), i)
        for i in range(12)
    ]  # per-doc distinct filler: no accidental near-dups
    base[2] = base[1] + " x"  # near-dup pair (1, 2): 2 removed (min keeps 1)
    docs = pa.table({
        "doc_id": pa.array(np.arange(12, dtype=np.int64)),
        "text": pa.array(base),
    })
    pq.write_table(docs, str(tmp_path / "docs.parquet"))

    rng = np.random.default_rng(5)
    V = rng.normal(size=(12, 8))
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    V[3] = V[2]          # semantic dup pair (2, 3) — but 2 dies in neardup
    V[7] = V[6] * 1.0    # semantic dup pair (6, 7): 7 must be removed
    emb = pa.table({
        "vec_id": pa.array(np.arange(12, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in V],
                              pa.list_(pa.float32())),
    })
    pq.write_table(emb, str(tmp_path / "emb.parquet"))


def test_clean_pipeline_semantic_stage(ray_session, tmp_path):
    """--semantic-dedup semdedup: drops within-cluster cosine dups of
    SURVIVORS only — a doc whose semantic twin died in near-dup keeps
    living (the twin can't act as the kept representative)."""
    _write_sem_fixture(tmp_path)
    out = tmp_path / "clean"
    args = build_parser().parse_args([
        "--corpus", str(tmp_path / "docs.parquet"), "--out", str(out),
        "--no-filter", "--no-span",
        "--semantic-dedup", "semdedup",
        "--embeddings", str(tmp_path / "emb.parquet"),
        "--sem-k", "2", "--sem-threshold", "0.95",
    ])
    rep = run(args)
    assert rep["after_neardup"] == 11          # near-dup removed doc 2
    assert rep["semantic_judged"] == 11        # survivors only
    assert rep["semantic_removed"] == 1        # exactly doc 7
    assert rep["after_semantic"] == 10
    assert rep["output_docs"] == 10

    files = [os.path.join(rep["output_dir"], f)
             for f in os.listdir(rep["output_dir"]) if f.endswith(".parquet")]
    keys = set(pd.concat([pq.read_table(f).to_pandas() for f in files])["doc_key"])
    assert 7 not in keys     # semantic dup of 6 removed
    assert 3 in keys         # twin-of-removed-doc survives (semi-filter)
    assert 2 not in keys     # near-dup removal upstream

    # resume: identical rerun skips every stage and reproduces the report
    rep2 = run(args)
    assert rep2["semantic_removed"] == 1
    assert rep2["after_semantic"] == 10
    assert rep2["output_docs"] == 10


def test_clean_pipeline_semantic_d4(ray_session, tmp_path):
    """--semantic-dedup d4 additionally prunes prototypical survivors;
    with prune_frac 0 it reduces to SemDeDup's removal set."""
    _write_sem_fixture(tmp_path)
    out = tmp_path / "d4"
    args = build_parser().parse_args([
        "--corpus", str(tmp_path / "docs.parquet"), "--out", str(out),
        "--no-filter", "--no-span",
        "--semantic-dedup", "d4",
        "--embeddings", str(tmp_path / "emb.parquet"),
        "--sem-k", "2", "--sem-threshold", "0.95",
        "--sem-prune-frac", "0.0",
    ])
    rep = run(args)
    assert rep["semantic_removed"] == 1
    assert rep["after_semantic"] == rep["after_neardup"] - 1

    # a nonzero prune_frac removes MORE (prototypical pruning) and its
    # config hash invalidates only the semantic stage forward
    args2 = build_parser().parse_args([
        "--corpus", str(tmp_path / "docs.parquet"), "--out", str(out),
        "--no-filter", "--no-span",
        "--semantic-dedup", "d4",
        "--embeddings", str(tmp_path / "emb.parquet"),
        "--sem-k", "2", "--sem-threshold", "0.95",
        "--sem-prune-frac", "0.4",
    ])
    rep2 = run(args2)
    assert rep2["semantic_removed"] > rep["semantic_removed"]
    assert rep2["output_docs"] == rep2["after_semantic"]


def test_clean_pipeline_semantic_off_hash_compat(ray_session, tmp_path):
    """semantic-dedup off leaves the span/shuffle config hashes exactly
    as before the knob existed: a pre-knob checkpoint tree resumes."""
    _write_sem_fixture(tmp_path)
    out = tmp_path / "compat"
    args = build_parser().parse_args([
        "--corpus", str(tmp_path / "docs.parquet"), "--out", str(out),
        "--no-filter",
    ])
    rep1 = run(args)
    rep2 = run(args)  # full resume, nothing recomputed
    assert rep1["config_hash"] == rep2["config_hash"]
    assert "semantic|" not in rep1["config_hash"]
    assert rep1["output_docs"] == rep2["output_docs"]


def test_clean_pipeline_semantic_beyond_broadcast(ray_session, tmp_path):
    """--max-broadcast 1 forces BOTH beyond-cap branches at once: the
    embeddings semi-filter becomes the hash-bucket co-partition (Acero
    joins reject list-typed payload columns, so the vector must ride a
    plain data shuffle — the r256 drill exposed two stacked latent bugs
    here) and the dropped-id anti-join becomes the shuffle path.  The
    funnel must match the broadcast run exactly."""
    _write_sem_fixture(tmp_path)
    out = tmp_path / "clean_cap"
    args = build_parser().parse_args([
        "--corpus", str(tmp_path / "docs.parquet"), "--out", str(out),
        "--no-filter", "--no-span",
        "--semantic-dedup", "semdedup",
        "--embeddings", str(tmp_path / "emb.parquet"),
        "--sem-k", "2", "--sem-threshold", "0.95",
        "--max-broadcast", "1",
    ])
    rep = run(args)
    assert rep["semantic_judged"] == 11
    assert rep["semantic_removed"] == 1
    assert rep["after_semantic"] == 10
    assert rep["output_docs"] == 10
    files = [os.path.join(rep["output_dir"], f)
             for f in os.listdir(rep["output_dir"]) if f.endswith(".parquet")]
    keys = set(pd.concat([pq.read_table(f).to_pandas() for f in files])["doc_key"])
    assert 7 not in keys and 3 in keys and 2 not in keys
