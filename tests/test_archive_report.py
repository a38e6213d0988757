"""archive_report CLI: stage outputs, REPORT rollups, resume."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from deduplicator_ray.pipelines.archive_report import main
from deduplicator_ray.sources.corpus import captures_table

SF = "/root/testdata/sf0.001"


def _write_corpus(tmp_path, drop=()):
    t = captures_table(SF)
    t = t.drop_columns([c for c in drop if c in t.column_names])
    p = str(tmp_path / "caps")
    os.makedirs(p, exist_ok=True)
    pq.write_table(t, f"{p}/captures.parquet")
    return p


def test_archive_report_end_to_end_and_resume(ray_session, tmp_path):
    corpus = _write_corpus(tmp_path)
    out = str(tmp_path / "out")
    rep = main(["--corpus", corpus, "--out", out])

    # stage outputs exist and REPORT totals are internally consistent
    for st in ["timeline", "gaps", "change", "savings", "delta", "aliases"]:
        assert rep["stages"][st]["rows"] > 0
        assert os.path.isdir(os.path.join(out, st, "data"))
    s = rep["storage"]
    assert s["captures"] == s["stored_versions"] + s["unchanged_revisits"]
    assert 0 < s["duplicate_ppm"] < 1_000_000
    assert s["chars_saved"] <= s["chars_total"]
    # delta census covers every page exactly once
    delta_rows = rep["stages"]["delta"]["rows"]
    assert sum(rep["delta"].values()) == delta_rows
    assert set(rep["delta"]) <= {"new", "gone", "changed", "unchanged"}
    assert len(rep["top_changing_sites"]) > 0
    assert len(rep["top_churn_sites"]) > 0
    a = rep["aliases"]
    assert a["n_raw_urls"] == a["n_pages"] + a["n_alias_urls"]
    assert a["n_alias_urls"] > 0  # the corpus plants session-id aliases
    assert rep["recrawl"]["sites_with_gaps"] > 0
    assert os.path.exists(os.path.join(out, "REPORT.json"))

    # rerun: every stage resumes from its checkpoint
    rep2 = main(["--corpus", corpus, "--out", out])
    assert all(v["resumed"] for v in rep2["stages"].values())
    assert rep2["storage"] == rep["storage"]
    assert rep2["delta"] == rep["delta"]


def test_archive_report_optional_columns(ray_session, tmp_path):
    # no crawl column -> no delta stage; no text -> no savings stage
    corpus = _write_corpus(tmp_path, drop=["crawl", "text"])
    out = str(tmp_path / "out2")
    rep = main(["--corpus", corpus, "--out", out])
    assert "delta" not in rep["stages"] and "delta" not in rep
    assert "savings" not in rep["stages"]
    assert "chars_saved" not in rep["storage"]
    assert rep["storage"]["captures"] > 0


def test_archive_report_requires_digest_or_text(ray_session, tmp_path):
    import pytest

    corpus = _write_corpus(tmp_path, drop=["digest", "text"])
    out = str(tmp_path / "out3")
    with pytest.raises(ValueError, match="digest or a text column"):
        main(["--corpus", corpus, "--out", out])
