"""The captures derivation must match its SQL mirror row-for-row — this is
the foundation every oracle-checked dedup query stands on."""

from __future__ import annotations

import duckdb
import pandas as pd

from deduplicator_ray.sources.corpus import CAPTURES_CTE, captures_table


def _sql_captures(sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(
        f"WITH {CAPTURES_CTE} SELECT doc_id, rep, url, text, lang, crawl, ts_epoch, "
        "md5(text) AS digest FROM captures ORDER BY doc_id, rep"
    ).df()


def test_python_mirror_equals_sql(sf_dir):
    py = captures_table(sf_dir).to_pandas()
    sql = _sql_captures(sf_dir)
    assert len(py) == len(sql)
    py = py.sort_values(["doc_id", "rep"], ignore_index=True)
    for col in ["doc_id", "rep", "url", "text", "lang", "crawl", "ts_epoch", "digest"]:
        pd.testing.assert_series_equal(py[col], sql[col], check_names=False, check_dtype=False, obj=col)


def test_planted_structure(sf_dir):
    t = captures_table(sf_dir).to_pandas()
    cur = t[t.crawl == "current"]
    hist = t[t.crawl == "history"]
    assert len(hist) > 0 and len(cur) > 0
    # rep1 rows are exact (url, digest) dups of a history row
    rep1 = cur[cur.rep == 1].merge(hist, on=["url", "digest"], suffixes=("", "_h"))
    assert len(rep1) == len(cur[cur.rep == 1])
    # rep2 rows match history on (url_canonical, digest) but NOT raw url
    rep2 = cur[cur.rep == 2]
    m = rep2.merge(hist, on=["url_canonical", "digest"], suffixes=("", "_h"))
    assert len(m) == len(rep2) and (m.url != m.url_h).all()
    # rep3 rows match on digest only
    rep3 = cur[cur.rep == 3]
    assert rep3.digest.isin(set(hist.digest)).all()
    assert ~rep3.url.isin(set(hist.url)).any()
    # rep4 rows are novel digests
    assert ~cur[cur.rep == 4].digest.isin(set(hist.digest)).any()
    # rep5 hub: one shared digest, many rows
    hub = cur[cur.rep == 5]
    assert hub.digest.nunique() == 1 and len(hub) > 50


def test_captures_dataset_matches_table(ray_session, sf_dir):
    ds = __import__("deduplicator_ray.sources.corpus", fromlist=["captures_dataset"]).captures_dataset(sf_dir)
    got = ds.to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
    want = captures_table(sf_dir).to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "rep", "url", "digest", "crawl"]],
        want[["doc_id", "rep", "url", "digest", "crawl"]],
    )
