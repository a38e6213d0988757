"""corpus_report CLI: the training-corpus card — planted duplicates
(raw + normalization-payoff), boilerplate, language mix, and resume."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from deduplicator_ray.pipelines.corpus_report import build_parser, run


@pytest.fixture()
def docs_parquet(tmp_path):
    body = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 3
    nav = " ".join(f"nav{j}" for j in range(10))
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "lang": "en" if i % 3 else "fr",
                     "text": f"{nav} doc{i} " + body[0]})
    # raw exact duplicate pair
    rows.append({"doc_id": 30, "lang": "en", "text": rows[0]["text"]})
    # normalization-payoff duplicate: differs only in case + punctuation
    rows.append({"doc_id": 31, "lang": "en",
                 "text": rows[1]["text"].upper() + "!!"})
    p = tmp_path / "documents.parquet"
    pd.DataFrame(rows).to_parquet(p)
    return str(p)


def test_corpus_report_end_to_end(ray_session, docs_parquet, tmp_path):
    out = str(tmp_path / "card")
    args = build_parser().parse_args(
        ["--docs", docs_parquet, "--out", out, "--top-n", "5"])
    r = run(args)

    assert r["totals"]["n_docs"] == 32
    assert r["totals"]["ws_tokens"] > 0
    assert r["totals"]["chars"] > 0

    # one raw duplicate; normalization catches one more
    assert r["dedup"]["n_docs"] == 32
    assert r["dedup"]["distinct_texts"] == 31
    assert r["dedup"]["distinct_normalized"] == 30
    assert (r["dedup"]["normalized_duplicate_ppm"]
            > r["dedup"]["duplicate_ppm"] > 0)

    # language mix sorted by volume, en first
    assert r["languages"][0]["lang"] == "en"
    assert sum(row["n_docs"] for row in r["languages"]) == 32

    # the planted nav chunk is in the boilerplate table with full count
    assert len(r["boilerplate"]) <= 5
    nav_rows = [row for row in r["boilerplate"]
                if row["chunk"].startswith("nav0 ")]
    assert nav_rows and nav_rows[0]["n_occ"] >= 31

    # gopher funnel covers every doc
    assert sum(r["gopher"].values()) == 32

    # quantiles: one row per lang with ordered percentiles
    langs = {row["lang"] for row in r["length_quantiles"]}
    assert langs == {"en", "fr"}
    for row in r["length_quantiles"]:
        assert row["p25"] <= row["p50"] <= row["p90"]

    # REPORT.json written and loadable
    with open(os.path.join(out, "REPORT.json")) as f:
        on_disk = json.load(f)
    assert on_disk["totals"] == r["totals"]

    # rerun resumes every checkpointed stage
    r2 = run(build_parser().parse_args(
        ["--docs", docs_parquet, "--out", out, "--top-n", "5"]))
    assert all(s["resumed"] for s in r2["stages"].values())
    assert r2["dedup"] == r["dedup"]


def test_corpus_report_no_lang_column(ray_session, tmp_path):
    pdf = pd.DataFrame({
        "doc_id": range(10),
        "text": [f"word{i} alpha beta gamma delta" for i in range(10)],
    })
    p = tmp_path / "docs.parquet"
    pdf.to_parquet(p)
    r = run(build_parser().parse_args(
        ["--docs", str(p), "--out", str(tmp_path / "card"), "--top-n", "3"]))
    assert r["totals"]["n_docs"] == 10
    assert "languages" not in r
    assert [row["lang"] for row in r["length_quantiles"]] == ["?"]
    assert r["dedup"]["duplicate_ppm"] == 0
