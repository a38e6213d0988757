"""URL structure mining over a captures corpus.

``query_param_stats`` surfaces, per site, every query-parameter key with
its use count and exact distinct-value count — the discovery tool behind
the M5 canonicalization rule list (functions/canonical.py): a parameter
whose distinct-value count tracks its use count one-to-one (phpsessid,
jsessionid, sid...) is a session id polluting page identity, exactly the
keys the reference's canonicalizer strips
(deduplicator-heritrix/.../Canonicalizer cite in canonical.py).

Scale shape: map-only Arrow extraction (regex + split kernels + one
list-offset flatten, no per-row Python), within-batch partial reduce to
distinct (site, key, value) rows with counts, ONE hash-bucket shuffle on
(site, key).  The RAW url is mined (canonicalization would strip the
very parameters this op exists to find).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deduplicator_ray.stages.exact import hash_bucket
from deduplicator_ray.stages.graph import HOST_PAT
from deduplicator_ray.util import auto_partitions


def query_param_stats(caps, *, url_col: str = "url",
                      num_partitions: int | None = None):
    """-> Dataset (site, param, n_uses BIGINT, n_values BIGINT).

    One output row per (url host, query-parameter key): ``n_uses`` =
    capture urls carrying the key, ``n_values`` = exact distinct values
    it took.  ``n_values == n_uses`` (at volume) flags a session id;
    ``n_values == 1`` flags a constant tracking tag.
    """
    P = num_partitions or auto_partitions()

    def extract(b: pa.Table) -> pd.DataFrame:
        u = b[url_col].combine_chunks().cast(pa.string())
        hm = pc.extract_regex(u, HOST_PAT)
        site = pc.fill_null(pc.struct_field(hm, "host"), "")
        qm = pc.extract_regex(u, r"\?(?P<q>.*)$")
        q = pc.struct_field(qm, "q")
        keep = pc.is_valid(q)
        site = site.filter(keep)
        frags = pc.split_pattern(q.filter(keep), "&")
        if isinstance(frags, pa.ChunkedArray):
            frags = frags.combine_chunks()
        # flatten: repeat each url's site over its fragment count
        off = frags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(frags)), np.diff(off))
        kv = frags.values
        km = pc.extract_regex(kv, r"^(?P<k>[^=]*)(?:=(?P<v>.*))?$")
        df = pd.DataFrame({
            "site": site.take(pa.array(parent)).to_pandas(),
            "param": pc.fill_null(pc.struct_field(km, "k"), "").to_pandas(),
            "value": pc.fill_null(pc.struct_field(km, "v"), "").to_pandas(),
        })
        g = df.groupby(["site", "param", "value"], as_index=False,
                       sort=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    pruned = caps.map_batches(extract, batch_format="pyarrow",
                              batch_size=8192)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["site", "param", "value"], as_index=False,
                       sort=False).agg(n=("n", "sum"))
        out = g.groupby(["site", "param"], sort=False).agg(
            n_uses=("n", "sum"), n_values=("value", "size")).reset_index()
        return out.astype({"n_uses": "int64", "n_values": "int64"})

    return (hash_bucket(pruned, "site", P)
            .groupby("_part")
            .map_groups(lambda g: per_bucket(g.drop(columns=["_part"])),
                        batch_format="pandas"))
