"""Incremental lookup mode: sharded digest-index actors + bloom precheck.

This is the Ray analogue of the reference's stateful searcher (T1:
``LuceneIndexSearcher`` opened once per JVM and shared by all toe
threads, LuceneIndexSearcher.java:109-129; T2: bloom precheck :221-224)
for the case the shuffle formulation doesn't cover: an INCREMENTAL
workload where lookups and index updates interleave (the shuffle mode is
snapshot-only, like the reference's read-only searcher).

Topology:
- N ``DigestIndexShard`` actors, shard = hash(digest) % N, each holding
  the per-key best-row tables for its digest slice (pandas, pre-renamed
  for ``resolve_with_best_tables``);
- a driver-built ``BloomFilter`` over all digests, ``ray.put`` once and
  read by every matcher worker to skip shard RPCs for novel digests;
- ``ActorIndexMatcher``: map_batches actor that fans each batch's
  maybe-present digests out to the owning shards, concatenates the
  returned slices, and resolves exactly like the broadcast matcher.

Partitioning assumption (documented per SURVEY.md): shard count is fixed
for the life of the index; rebalancing = rebuild. ``add`` upserts follow
the reference's last-write-wins on (url, digest) (IndexBuilder.java:
227-236).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

import ray

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.exact import resolve_with_best_tables
from deduplicator_ray.state.bloom import BloomFilter


def _shard_of(digests, n_shards: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32((d or "").encode()) % n_shards for d in digests),
        dtype=np.int64,
        count=len(digests),
    )


@ray.remote(num_cpus=0.5)
class DigestIndexShard:
    """One shard of the dedup index, held as the three best-row lookup
    tables (mirrors the Lucene fields; IndexFields.java:22-40)."""

    def __init__(self):
        cols_d = ["digest", "url_m", "ts_m", "rid_m"]
        cols_u = ["digest", "url", "ts_e", "rid_e"]
        cols_c = ["digest", "url_canonical", "url_c", "ts_c", "rid_c"]
        self.d = pd.DataFrame(columns=cols_d)
        self.u = pd.DataFrame(columns=cols_u)
        self.c = pd.DataFrame(columns=cols_c)
        self._raw = pd.DataFrame(
            columns=["digest", "url", "url_canonical", "ts", "record_id"]
        )

    def load(self, rows: pd.DataFrame) -> int:
        """Bulk-load (url, url_canonical, digest, ts, record_id) rows."""
        self._raw = pd.concat([self._raw, rows], ignore_index=True)
        self._rebuild()
        return len(self._raw)

    def add(self, rows: pd.DataFrame) -> int:
        """Incremental upsert: last-write-wins on (url, digest)
        (IndexBuilder.java:227-236)."""
        allr = pd.concat([self._raw, rows], ignore_index=True)
        allr = allr.sort_values(["ts", "url"], ascending=[False, True], kind="mergesort")
        self._raw = allr.drop_duplicates(["url", "digest"], keep="first")
        self._rebuild()
        return len(self._raw)

    def _rebuild(self) -> None:
        r = self._raw.sort_values(["ts", "url", "record_id"], na_position="last", kind="mergesort")
        self.d = r.drop_duplicates("digest").rename(
            columns={"url": "url_m", "ts": "ts_m", "record_id": "rid_m"}
        )[["digest", "url_m", "ts_m", "rid_m"]]
        self.u = r.drop_duplicates(["digest", "url"]).rename(
            columns={"ts": "ts_e", "record_id": "rid_e"}
        )[["digest", "url", "ts_e", "rid_e"]]
        self.c = r.drop_duplicates(["digest", "url_canonical"]).rename(
            columns={"url": "url_c", "ts": "ts_c", "record_id": "rid_c"}
        )[["digest", "url_canonical", "url_c", "ts_c", "rid_c"]]

    def lookup(self, digests: list[str]):
        """Return the three lookup-table slices for the given digests."""
        ds = set(digests)
        return (
            self.d[self.d["digest"].isin(ds)],
            self.u[self.u["digest"].isin(ds)],
            self.c[self.c["digest"].isin(ds)],
        )

    def stats(self) -> dict:
        return {"rows": int(len(self._raw)), "digests": int(self.d["digest"].nunique())}


class ShardedDigestIndex:
    """Driver-side handle: builds shards from a history Dataset and a
    bloom filter over all digests."""

    def __init__(self, history_ds, n_shards: int = 4, *, strip_digest_scheme: bool = True):
        self.n_shards = n_shards
        # the matcher must conform lookups to HOW THIS INDEX was built —
        # recorded here so mismatched configs can't silently zero out hits
        self.strip_digest_scheme = strip_digest_scheme
        self.shards = [DigestIndexShard.remote() for _ in range(n_shards)]
        cols = [c for c in ["digest", "url", "url_canonical", "date", "original_record_id"]
                if c in history_ds.schema().names]
        bloom: BloomFilter | None = None
        digest_total = 0
        loads = []
        for batch in history_ds.select_columns(cols).iter_batches(
            batch_size=65536, batch_format="pandas"
        ):
            pdf = batch.rename(columns={"date": "ts", "original_record_id": "record_id"})
            if strip_digest_scheme:
                # match-time scheme conformance, same rule as the shuffle/
                # broadcast matchers (LuceneIndexSearcher.java:217-220)
                from deduplicator_ray.functions.digesting import strip_scheme_series

                pdf["digest"] = strip_scheme_series(pdf["digest"])
            for c in ["url", "url_canonical", "ts", "record_id"]:
                if c not in pdf.columns:
                    pdf[c] = None
            if bloom is None:
                bloom = BloomFilter(max(1024, len(pdf) * 64))
            bloom.add_many(pdf["digest"].tolist())
            digest_total += len(pdf)
            shard_ids = _shard_of(pdf["digest"].tolist(), n_shards)
            for sid in range(n_shards):
                part = pdf[shard_ids == sid]
                if len(part):
                    loads.append(self.shards[sid].load.remote(part))
        ray.get(loads)
        self.bloom_ref = ray.put(bloom or BloomFilter(1024))
        self.shard_refs = self.shards

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])


class _ActorMatcher:
    """map_batches actor: bloom precheck, then shard fan-out + local
    resolve (same semantics as the broadcast matcher)."""

    def __init__(self, shards, bloom_ref, cfg: PipelineConfig, strip_digest_scheme: bool):
        self.shards = shards
        self.bloom: BloomFilter = ray.get(bloom_ref)
        self.cfg = cfg
        # follow the INDEX's convention, not cfg: the index decides what
        # form its digests are stored in
        self.strip = strip_digest_scheme
        self.bloom_skipped = 0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strip:
            from deduplicator_ray.functions.digesting import strip_scheme_series

            batch = batch.assign(digest=strip_scheme_series(batch["digest"]))
        digests = batch["digest"].tolist()
        maybe = self.bloom.contains_many(digests)
        self.bloom_skipped += int((~maybe).sum())
        wanted = sorted({d for d, m in zip(digests, maybe) if m})
        if wanted:
            sid = _shard_of(wanted, len(self.shards))
            futs = []
            for s in range(len(self.shards)):
                part = [w for w, i in zip(wanted, sid) if i == s]
                if part:
                    futs.append(self.shards[s].lookup.remote(part))
            slices = ray.get(futs)
            d = pd.concat([x[0] for x in slices], ignore_index=True)
            u = pd.concat([x[1] for x in slices], ignore_index=True)
            c = pd.concat([x[2] for x in slices], ignore_index=True)
        else:
            d = pd.DataFrame(columns=["digest", "url_m", "ts_m", "rid_m"])
            u = pd.DataFrame(columns=["digest", "url", "ts_e", "rid_e"])
            c = pd.DataFrame(columns=["digest", "url_canonical", "url_c", "ts_c", "rid_c"])
        return resolve_with_best_tables(batch, d, u, c, self.cfg)


def match_actor_index(current, index: ShardedDigestIndex, cfg: PipelineConfig | None = None,
                      *, concurrency: int | tuple[int, int] = (2, 4), batch_size: int = 4096):
    """Incremental-mode matcher over a ShardedDigestIndex."""
    cfg = cfg or PipelineConfig()
    return current.map_batches(
        _ActorMatcher,
        fn_constructor_args=(index.shard_refs, index.bloom_ref, cfg,
                             getattr(index, "strip_digest_scheme", True)),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
