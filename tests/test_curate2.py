"""Second batch of curation queries: oracle parity + planted semantics."""

from __future__ import annotations

import pandas as pd
import pytest

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


@pytest.mark.parametrize("name", ["url_template_census", "host_trend"])
def test_oracle_parity(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_curate import registry_curate

    fn, sql = registry_curate()[name]
    got = fn(sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = duck.execute(sql).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_url_template_collapses_families(ray_session, sf_dir):
    """All /p/<id> pages fold into one template with n_urls > 1."""
    from deduplicator_ray.pipelines.queries_curate import q_url_template_census

    out = q_url_template_census(sf_dir).to_pandas()
    p = out[out["url_template"].str.contains("/p/N", regex=False)]
    assert len(p) >= 1
    assert (p["n_urls"] > 1).all()
    # templates partition captures: counts add up to the corpus size
    from deduplicator_ray.sources.corpus import captures_dataset

    assert out["n_captures"].sum() == captures_dataset(sf_dir).count()


def test_host_trend_exact_on_planted_counts(ray_session, tmp_path):
    """Drive q_host_trend end-to-end on a crafted documents table whose
    captures derivation lands hand-checkable daily counts.

    doc_ids {20, 80, 100, 940, 1000, 1040} are all ≡0 (mod 20) and none
    is divisible by 3 or 7, so per doc the captures CTE emits exactly:
    rep0+rep5 on host www.site0.example and rep2 on www2.site0.example.
    ts_epoch = 1700000000 + 100·doc_id (+rep≤5) puts them on days
    19675 / 19676 / 19677 as 1, 2, 3 docs respectively — so
    www2.site0.example sees daily counts 1,2,3 (slope exactly 1 →
    1_000_000 ppm) and www.site0.example sees 2,4,6 (slope 2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_curate import q_host_trend

    ids = [20, 80, 100, 940, 1000, 1040]
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"planted doc {i}" for i in ids]),
        "lang": pa.array(["en"] * len(ids)),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    out = q_host_trend(str(tmp_path))
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.set_index("host")

    w2 = out.loc["www2.site0.example"]
    assert int(w2["n_days"]) == 3
    assert int(w2["n_captures"]) == 6
    assert int(w2["slope_ppm"]) == 1_000_000

    w = out.loc["www.site0.example"]
    assert int(w["n_days"]) == 3
    assert int(w["n_captures"]) == 12
    assert int(w["slope_ppm"]) == 2_000_000


def test_template_suffix_combining_chars(ray_session, tmp_path):
    """Assert the NFC-normalize-first suffix semantics on combining
    characters (see _template_table docstring).

    Two pages on one (host, section) end in 'xe' + COMBINING ACUTE
    (U+0301) vs 'ye' + COMBINING ACUTE, written DECOMPOSED.  NFC
    collapses each to the precomposed U+00E9 (one codepoint), so the
    common suffix is exactly 1 codepoint -- matching what DuckDB's
    nfc_normalize + reverse() computes.  The pre-round-5
    codepoint-level semantics reported 2 (e, U+0301)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_curate import _template_table

    # rep-0 urls land both docs on host www.site0.example, section 'p'
    docs = pa.table({
        "doc_id": pa.array([0, 20], pa.int64()),
        "text": pa.array(["AA xe\u0301", "BB ye\u0301"]),
        "lang": pa.array(["en", "en"]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    tpl = _template_table(str(tmp_path)).set_index(["host", "section"])
    row = tpl.loc[("www.site0.example", "p")]
    # 2 planted pages (+ the doc_id==0 empty pages join other sections)
    assert int(row["suffix_len"]) == 1  # NFC U+00E9, one codepoint
    assert int(row["prefix_len"]) == 0  # 'A...' vs 'B...'


def test_template_dup_rate_oracle(ray_session, sf_dir, duck):
    from deduplicator_ray.pipelines.queries_curate import registry_curate

    fn, sql = registry_curate()["template_dup_rate"]
    got = fn(sf_dir).to_pandas()
    want = duck.execute(sql).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    # the /empty/N family serves ONE digest -> dup_ppm > 0; sanity bound
    emp = got[got["url_template"].str.contains("/empty/N", regex=False)]
    if len(emp):
        assert (emp["n_digests"] == 1).all()
        assert (emp["dup_ppm"] > 0).all()


def test_c4_filter_oracle(ray_session, sf_dir, duck):
    from deduplicator_ray.pipelines.queries_curate import registry_curate

    fn, sql = registry_curate()["c4_filter"]
    got = fn(sf_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = duck.execute(sql).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    # every planted rule fires somewhere at this scale
    assert set(got["reason"]) == {"kept", "too_few_sentences", "brace",
                                  "lorem_ipsum"}


def test_c4_filter_planted_semantics(ray_session, tmp_path):
    """Hand-checkable doc: doc_id 22 -> k = 22%5+3 = 5 words/line; 20
    words -> 4 lines of 5; line 3 (index 3) gets no terminal '.', so 3
    kept lines -> page kept.  doc_id 21 -> k=4 -> every line under 5
    words -> too_few_sentences."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray.pipelines.queries_curate import q_c4_filter

    words20 = " ".join(f"w{j}" for j in range(20))
    docs = pa.table({
        "doc_id": pa.array([21, 22], pa.int64()),
        "text": pa.array([words20, words20]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_c4_filter(str(tmp_path))
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.set_index("doc_id")
    assert int(out.loc[22, "n_lines"]) == 4
    assert int(out.loc[22, "n_kept"]) == 3      # line 3 lacks the '.'
    assert out.loc[22, "reason"] == "kept"
    assert int(out.loc[22, "keep"]) == 1
    assert int(out.loc[21, "n_lines"]) == 5     # k=4 -> 5 lines
    assert int(out.loc[21, "n_kept"]) == 0      # 4-word lines < 5-word rule
    assert out.loc[21, "reason"] == "too_few_sentences"
