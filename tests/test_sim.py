"""Oracle parity + invariants for the similarity-analysis queries
(pipelines/queries_sim.py)."""

from __future__ import annotations

import pandas as pd
import pytest

SQL_CHECKED_SIM = [
    "cluster_agreement",
    "edit_similarity_pairs",
    "outlier_docs",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == bool or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "orders", "lineitem"]:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", SQL_CHECKED_SIM)
def test_oracle_parity_sim(ray_session, sf_dir, duck, name):
    from deduplicator_ray.pipelines.queries_sim import registry_sim

    fn, sql = registry_sim()[name]
    got = _norm(_to_pandas(fn(sf_dir)))
    want = _norm(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_levenshtein_bytes_matches_duckdb(duck):
    """The numpy DP uses UTF-8 BYTE units — pin that it agrees with
    DuckDB's levenshtein on multibyte input (the oracle's semantics)."""
    import random

    from deduplicator_ray.stages.substr import levenshtein_bytes

    rng = random.Random(7)
    alphabet = "abc日é "
    for _ in range(60):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))
        want = duck.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein_bytes(a.encode(), b.encode()) == want, (a, b)
    assert levenshtein_bytes(b"", b"") == 0
    assert levenshtein_bytes(b"", b"abc") == 3
    assert levenshtein_bytes(b"kitten", b"sitting") == 3


def test_cluster_agreement_invariants(ray_session, sf_dir):
    from deduplicator_ray.pipelines.queries_sim import q_cluster_agreement

    row = _to_pandas(q_cluster_agreement(sf_dir)).iloc[0]
    assert row["pairs_both"] <= min(row["pairs_digest"], row["pairs_url"])
    assert max(row["pairs_digest"], row["pairs_url"]) <= row["pairs_total"]
    assert 0 <= row["rand_micro"] <= 1_000_000
    assert 0 <= row["precision_micro"] <= 1_000_000
    assert 0 <= row["recall_micro"] <= 1_000_000
    # every capture is in exactly one cluster of each partition
    assert row["n_digest_clusters"] <= row["n_caps"]
    assert row["n_url_clusters"] <= row["n_caps"]
