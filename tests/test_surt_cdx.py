"""SURT keys (functions/surt.py) and the CDX source/sink (sources/cdx.py)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from deduplicator_ray.functions.surt import surt, surt_arrow, surt_sql_expr
from deduplicator_ray.sources.cdx import parse_batch, parse_line, write_cdx

_EDGE_URLS = [
    "https://www.site3.example/p/5?q=1",
    "http://EXAMPLE.com:80/Path/To?x=1",
    "https://www2.a.b.c.example/",
    "https://mirror.example/d/9",
    "no-scheme-host/only",
    "justhost",
    "http://h:8080/p",
    None,
    "  https://www.x.y/ padded ",
    "",
]


def test_surt_three_way_lockstep():
    import duckdb

    py = [surt(u) for u in _EDGE_URLS]
    ar = surt_arrow(pa.array(_EDGE_URLS, type=pa.string())).to_pylist()
    con = duckdb.connect()
    sqlv = [r[0] for r in con.execute(
        f"SELECT {surt_sql_expr('u')} FROM (SELECT unnest(?) AS u)",
        [_EDGE_URLS]).fetchall()]
    assert py == ar == sqlv
    assert surt("https://www.site3.example/p/5?q=1") == "example,site3)/p/5?q=1"
    assert surt("http://EXAMPLE.com:80/Path/To") == "com,example)/path/to"
    assert surt("justhost") == "justhost)"


def test_cdx_parse_line_fields_and_dashes():
    ln = ("example,site3)/d/5 20231114221320 https://www.site3.example/d/5 "
          "text/html 200 abcd1234 - - 512 5000 part-1.warc.gz")
    r = parse_line(ln)
    assert r["urlkey"] == "example,site3)/d/5"
    assert r["url"] == "https://www.site3.example/d/5"
    assert r["status"] == 200 and r["length"] == 512 and r["offset"] == 5000
    assert r["warc_ts"].year == 2023
    # '-' -> None in every optional column
    ln2 = ("k)/x 20231114221320 http://k/x - - - - - - - -")
    r2 = parse_line(ln2)
    assert r2["mime"] is None and r2["status"] is None
    assert r2["digest"] is None and r2["length"] is None
    assert r2["filename"] is None
    # header, wrong field count, bad timestamp, bad int -> rejected
    assert parse_line(" CDX N b a m s k r M S V g") is None
    assert parse_line("too few fields") is None
    assert parse_line("k)/x 2023111422132Z http://k/x - - - - - - - -") is None
    assert parse_line("k)/x 20231114221320 http://k/x - 2xx - - - - - -") is None


def test_cdx_parse_batch_metrics_convention():
    good = "k)/x 20231114221320 http://k/x - 200 - - - - - -"
    bad = "malformed"
    hdr = " CDX N b a m s k r M S V g"
    t = parse_batch([hdr, good, bad, bad])
    assert t.num_rows == 1
    assert t["parse_dropped"].to_pylist() == [2]  # header NOT counted
    # all-malformed batch -> one metrics-only row with null status
    t2 = parse_batch([bad, bad, bad])
    assert t2.num_rows == 1
    assert t2["parse_dropped"].to_pylist() == [3]
    assert t2["status"].to_pylist() == [None]
    # empty batch -> empty table, full schema
    t3 = parse_batch([])
    assert t3.num_rows == 0 and "urlkey" in t3.column_names


def test_cdx_write_read_roundtrip(ray_session, tmp_path):
    from deduplicator_ray.sources import get_source

    rec = pd.DataFrame({
        "urlkey": ["b)/2", "a)/1", "a)/1"],
        "ts_epoch": [1_700_000_100, 1_700_000_000, 1_699_999_000],
        "url": ["http://b/2", "http://a/1", "http://a/1"],
        "mime": ["text/html", None, "text/html"],
        "status": [200, 404, 200],
        "digest": ["d2", None, "d1"],
        "length": [10, None, 20],
        "offset": [0, 1000, 2000],
        "filename": ["f.warc.gz", "f.warc.gz", "f.warc.gz"],
    })
    path = write_cdx(str(tmp_path / "t.cdx"), rec)
    raw = open(path).read().splitlines()
    assert raw[0] == " CDX N b a m s k r M S V g"
    # sorted by (urlkey, ts): a)/1@1699999000, a)/1@1700000000, b)/2
    assert raw[1].startswith("a)/1 20231114") and raw[3].startswith("b)/2")
    got = (get_source("cdx")(path).to_pandas()
           .sort_values(["urlkey", "warc_ts"]).reset_index(drop=True))
    assert len(got) == 3
    assert got.loc[0, "urlkey"] == "a)/1"
    assert pd.isna(got.loc[2 if got.loc[2, "status"] == 404 else 1, "digest"]) or True
    row404 = got[got["status"] == 404].iloc[0]
    assert pd.isna(row404["mime"]) and pd.isna(row404["digest"])
    assert row404["length"] is pd.NA or pd.isna(row404["length"])
    assert int(got["parse_dropped"].sum()) == 0
    # byte-determinism: rewriting the same records yields identical bytes
    path2 = write_cdx(str(tmp_path / "t2.cdx"), rec.sample(frac=1, random_state=7))
    assert open(path).read() == open(path2).read()


def test_dedup_pipeline_from_cdx(ray_session, tmp_path):
    """CDX feeds the core dedup pipeline directly (--corpus-format cdx):
    index build applies the ==200 index-side status rule and the mime
    whitelist; the match run classifies a digest hit vs a novel row."""
    import json

    from deduplicator_ray.pipelines.dedup_pipeline import build_parser, run

    def dedup_main(argv):
        return run(build_parser().parse_args(argv))

    hist = pd.DataFrame({
        "urlkey": ["a)/1", "a)/1", "b)/1", "c)/1", "d)/1"],
        "ts_epoch": [1_700_000_000, 1_700_000_100, 1_700_000_000,
                     1_700_000_000, 1_700_000_000],
        "url": ["http://a/1", "http://a/1", "http://b/1", "http://c/1",
                "http://d/1"],
        "mime": ["text/html"] * 3 + ["text/html", "image/png"],
        "status": [200, 200, 200, 404, 200],
        "digest": ["d1", "d1b", "d2", "d3", "d4"],
        "length": [1, 1, 1, 1, 1],
        "offset": [0, 1, 2, 3, 4],
        "filename": ["f"] * 5,
    })
    cur = pd.DataFrame({
        "urlkey": ["e)/1", "f)/1"],
        "ts_epoch": [1_700_001_000, 1_700_001_000],
        "url": ["http://e/1", "http://f/1"],
        "mime": ["text/html", "text/html"],
        "status": [200, 200],
        "digest": ["d2", "dX"],
        "length": [1, 1],
        "offset": [0, 1],
        "filename": ["g"] * 2,
    })
    hist_path = write_cdx(str(tmp_path / "hist.cdx"), hist)
    cur_path = write_cdx(str(tmp_path / "cur.cdx"), cur)

    out1 = str(tmp_path / "idx")
    r1 = dedup_main(["--corpus", hist_path, "--corpus-format", "cdx",
                     "--build-index", "--out", out1,
                     "--mime-filter", "^text/.*", "--whitelist"])
    # 404 and image/png rows filtered; 3 distinct digests survive
    assert r1["counters"]["status_skipped"] == 1
    assert r1["counters"]["mime_skipped"] == 1
    assert r1["index"]["total_rows"] == 3

    out2 = str(tmp_path / "match")
    r2 = dedup_main(["--corpus", cur_path, "--corpus-format", "cdx",
                     "--history", os.path.join(out1, "index", "data"),
                     "--out", out2, "--write-revisits",
                     "--mime-filter", "^text/.*", "--whitelist"])
    rep = json.load(open(os.path.join(out2, "REPORT.json")))
    assert rep["handled"] == 2
    assert rep["duplicates"] == 1
    # the duplicate surfaced as a WARC revisit record
    from deduplicator_ray.sources.warc import read_warc
    assert r2["revisits"]["records"] == 1
    rev = read_warc(r2["revisits"]["path"]).to_pandas()
    assert len(rev) == 1 and bool(rev.loc[0, "is_revisit"])
    assert rev.loc[0, "url"] == "http://e/1"


def test_surt_canonicalizer_in_match(ray_session):
    """URL_CANONICAL with canonicalizer='surt': a current capture whose
    url differs from the original's in scheme/www ONLY still matches at
    the Canonical tier, and url_canonical carries the SURT form."""
    import ray.data as rd

    from deduplicator_ray.config import PipelineConfig, SearchStrategy
    from deduplicator_ray.stages.exact import build_index, match_shuffle
    from deduplicator_ray.stages.normalize import normalize

    cfg = PipelineConfig(strategy=SearchStrategy.URL_CANONICAL,
                         canonicalizer="surt")
    hist = pd.DataFrame({
        "url": ["https://www.a.example/p/1", "https://b.example/q/2"],
        "warc_ts": pd.to_datetime([1_700_000_000, 1_700_000_000], unit="s"),
        "text": ["hello world", "other text"],
    })
    cur = pd.DataFrame({
        # same page as hist[0] modulo scheme+www; same content
        "url": ["http://a.example/p/1", "https://new.example/x"],
        "warc_ts": pd.to_datetime([1_700_000_500, 1_700_000_500], unit="s"),
        "text": ["hello world", "novel page"],
    })
    idx = build_index(normalize(rd.from_pandas(hist), cfg,
                                digest_mode="md5_text", side="index"), cfg)
    got = (match_shuffle(normalize(rd.from_pandas(cur), cfg,
                                   digest_mode="md5_text"), idx, cfg)
           .to_pandas().set_index("url").sort_index())
    hit = got.loc["http://a.example/p/1"]
    assert bool(hit["is_duplicate"])
    assert hit["url_canonical"] == "example,a)/p/1"  # SURT form
    assert hit["match_tier"] == "canonical_url"
    assert not bool(got.loc["https://new.example/x", "is_duplicate"])


def test_unknown_canonicalizer_raises():
    import pytest

    from deduplicator_ray.functions.canonical import get_canonicalizer

    assert get_canonicalizer("surt")[0]("https://www.a.b/c") == "b,a)/c"
    with pytest.raises(ValueError, match="unknown canonicalizer"):
        get_canonicalizer("nope")


def test_export_cdx_sorted_shards_and_manifest(ray_session, tmp_path):
    import json

    import numpy as np
    import ray.data as rd

    from deduplicator_ray.sources.cdx import export_cdx, read_cdx

    rng = np.random.default_rng(7)
    n = 500
    keys = [f"example,s{rng.integers(0, 50)})/p/{i}" for i in range(n)]
    rec = pd.DataFrame({
        "urlkey": keys,
        "ts_epoch": 1_700_000_000 + np.arange(n),
        "url": [f"http://x/{i}" for i in range(n)],
        "status": 200,
        "digest": [f"d{i}" for i in range(n)],
        "length": 1, "offset": 0, "filename": "f",
    })
    out = str(tmp_path / "cdx_out")
    man = export_cdx(rd.from_pandas(rec).repartition(8), out, num_shards=5)
    assert man["total_rows"] == n
    assert 1 <= man["num_shards"] <= 5
    # concatenation in shard order is globally sorted; ranges disjoint
    all_keys = []
    for sh in man["shards"]:
        lines = open(sh["path"]).read().splitlines()[1:]  # skip header
        ks = [ln.split(" ", 1)[0] for ln in lines]
        assert ks == sorted(ks)
        assert len(ks) == sh["rows"]
        all_keys.extend(ks)
    assert all_keys == sorted(all_keys)
    assert json.load(open(f"{out}/manifest.json"))["total_rows"] == n
    # round-trips through the reader
    back = read_cdx([sh["path"] for sh in man["shards"]]).to_pandas()
    assert len(back) == n and int(back["parse_dropped"].sum()) == 0


def test_dedup_pipeline_export_cdx(ray_session, tmp_path):
    """--build-index --export-cdx writes sorted CDX shards + manifest
    mirroring the parquet index."""
    import json

    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.dedup_pipeline import build_parser, run
    from deduplicator_ray.sources.cdx import read_cdx
    from deduplicator_ray.sources.corpus import captures_table

    caps = captures_table("/root/testdata/sf0.001")
    corpus = str(tmp_path / "caps")
    os.makedirs(corpus, exist_ok=True)
    pq.write_table(caps, f"{corpus}/captures.parquet")

    out = str(tmp_path / "idx")
    r = run(build_parser().parse_args(
        ["--corpus", corpus, "--build-index", "--export-cdx",
         "--cdx-shards", "4", "--out", out]))
    man = r["cdx_export"]
    assert man["total_rows"] == r["index"]["total_rows"]
    assert os.path.exists(os.path.join(out, "index_cdx", "manifest.json"))
    back = read_cdx([sh["path"] for sh in man["shards"]]).to_pandas()
    assert len(back) == man["total_rows"]
    assert int(back["parse_dropped"].sum()) == 0
    assert back["urlkey"].str.contains(r"\)").all()  # SURT keys
