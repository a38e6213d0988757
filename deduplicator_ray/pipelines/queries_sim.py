"""Similarity-analysis queries: partition agreement, edit similarity.

Extensions beyond the reference surface (SURVEY.md §2.11): analytic
operators a dedup-pipeline operator needs to *evaluate* dedup strategies
against each other — which the reference leaves to offline scripts.
Every query here follows the repo's scale contract: partial combine in
``map_batches``, ONE ``hash_bucket`` shuffle per marginal, vectorized
per-bucket reduce, tiny per-bucket partials to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deduplicator_ray.functions.canonical import canonical_sql_expr
from deduplicator_ray.sources.corpus import CAPTURES_CTE, captures_dataset

# ---------------------------------------------------------------------------
# cluster_agreement: pairwise agreement between two dedup partitions
# ---------------------------------------------------------------------------


def _pairs2(n: np.ndarray) -> int:
    """sum of n-choose-2 over an int64 count vector (python int, exact)."""
    n = n.astype(object)
    return int(((n * (n - 1)) // 2).sum()) if len(n) else 0


def q_cluster_agreement(sf_dir: str):
    """Pairwise agreement between the two exact-dedup partitions the
    engine supports on captures: content identity (``digest``) vs
    canonical-URL identity (``url_canonical``).

    The Rand-style metrics need only cluster SIZES, never materialized
    pairs: pairs_same(P) = sum nC2 over P's cluster sizes.  The joint
    contingency cells are counted with one batch-local partial combine +
    one ``hash_bucket(digest)`` shuffle; because a digest's cells all
    land in one bucket, the digest marginal is computed in the SAME
    reduce.  The url marginal takes a second (pre-combined, narrow)
    shuffle.  Only one tiny partial row per bucket reaches the driver,
    so the shape holds at 10^12 captures.
    """
    from deduplicator_ray.stages.exact import hash_bucket

    caps = captures_dataset(sf_dir)

    def cells_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "digest": b["digest"].to_pandas(),
                "url_canonical": b["url_canonical"].to_pandas(),
            }
        )
        g = df.groupby(["digest", "url_canonical"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = caps.map_batches(
        cells_partial, batch_format="pyarrow", batch_size=65536, zero_copy_batch=True
    )

    def digest_final(g: pd.DataFrame) -> pd.DataFrame:
        joint = g.groupby(["digest", "url_canonical"])["n"].sum()
        dsum = joint.groupby(level=0).sum()
        return pd.DataFrame(
            {
                "n_caps": [int(dsum.sum())],
                "pairs_both": [_pairs2(joint.to_numpy())],
                "pairs_digest": [_pairs2(dsum.to_numpy())],
                "n_digest_clusters": [int(len(dsum))],
            }
        )

    dparts = (
        hash_bucket(cells, "digest", 32)
        .groupby("_part")
        .map_groups(digest_final, batch_format="pandas")
        .to_pandas()
    )

    def url_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"url_canonical": b["url_canonical"].to_pandas()})
        g = df.groupby("url_canonical", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    ucounts = caps.map_batches(
        url_partial, batch_format="pyarrow", batch_size=65536, zero_copy_batch=True
    )

    def url_final(g: pd.DataFrame) -> pd.DataFrame:
        usum = g.groupby("url_canonical")["n"].sum()
        return pd.DataFrame(
            {
                "pairs_url": [_pairs2(usum.to_numpy())],
                "n_url_clusters": [int(len(usum))],
            }
        )

    uparts = (
        hash_bucket(ucounts, "url_canonical", 32)
        .groupby("_part")
        .map_groups(url_final, batch_format="pandas")
        .to_pandas()
    )

    n_caps = int(dparts["n_caps"].sum())
    pairs_both = int(dparts["pairs_both"].sum())
    pairs_digest = int(dparts["pairs_digest"].sum())
    pairs_url = int(uparts["pairs_url"].sum())
    pairs_total = n_caps * (n_caps - 1) // 2
    # agreement: pairs co-clustered in both + pairs separated in both
    agree = pairs_total - pairs_digest - pairs_url + 2 * pairs_both
    mk = 1_000_000
    out = pd.DataFrame(
        {
            "n_caps": [n_caps],
            "n_digest_clusters": [int(dparts["n_digest_clusters"].sum())],
            "n_url_clusters": [int(uparts["n_url_clusters"].sum())],
            "pairs_total": [pairs_total],
            "pairs_digest": [pairs_digest],
            "pairs_url": [pairs_url],
            "pairs_both": [pairs_both],
            "rand_micro": [agree * mk // pairs_total if pairs_total else 0],
            "precision_micro": [pairs_both * mk // pairs_url if pairs_url else 0],
            "recall_micro": [pairs_both * mk // pairs_digest if pairs_digest else 0],
        }
    )
    return out.astype("int64")


def _sql_cluster_agreement() -> str:
    uc = canonical_sql_expr("url")
    return f"""
WITH {CAPTURES_CTE},
c AS (SELECT md5(text) AS dg, {uc} AS ucanon FROM captures),
joint AS (SELECT dg, ucanon, count(*)::BIGINT AS n FROM c GROUP BY 1, 2),
dm AS (SELECT dg, sum(n)::BIGINT AS n FROM joint GROUP BY 1),
um AS (SELECT ucanon, sum(n)::BIGINT AS n FROM joint GROUP BY 1),
agg AS (
  SELECT
    (SELECT sum(n) FROM dm)::BIGINT AS n_caps,
    (SELECT count(*) FROM dm)::BIGINT AS n_digest_clusters,
    (SELECT count(*) FROM um)::BIGINT AS n_url_clusters,
    (SELECT sum((n * (n - 1)) // 2) FROM joint)::BIGINT AS pairs_both,
    (SELECT sum((n * (n - 1)) // 2) FROM dm)::BIGINT AS pairs_digest,
    (SELECT sum((n * (n - 1)) // 2) FROM um)::BIGINT AS pairs_url
)
SELECT n_caps, n_digest_clusters, n_url_clusters,
       (n_caps * (n_caps - 1)) // 2 AS pairs_total,
       pairs_digest, pairs_url, pairs_both,
       CASE WHEN n_caps < 2 THEN 0
            ELSE (((n_caps * (n_caps - 1)) // 2 - pairs_digest - pairs_url
                   + 2 * pairs_both) * 1000000)
                 // ((n_caps * (n_caps - 1)) // 2) END AS rand_micro,
       CASE WHEN pairs_url = 0 THEN 0
            ELSE (pairs_both * 1000000) // pairs_url END AS precision_micro,
       CASE WHEN pairs_digest = 0 THEN 0
            ELSE (pairs_both * 1000000) // pairs_digest END AS recall_micro
FROM agg
"""


def registry_sim():
    return {
        "cluster_agreement": (q_cluster_agreement, _sql_cluster_agreement()),
    }
