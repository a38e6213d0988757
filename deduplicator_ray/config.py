"""Pipeline configuration — the one dataclass that replaces the
reference's ``deduplicator.properties`` keys + CLI flags
(deduplicator-indexer/src/main/resources/deduplicator.properties:10-37,
IndexingLauncher.java:35-43,95-125, CommandLineParser.java:66-101) and the
Spring bean knobs of the crawl-side processor
(profile-crawler-beans.cxml:280-289).
"""

from __future__ import annotations

import enum
import hashlib
import json
from dataclasses import asdict, dataclass, field


class SearchStrategy(str, enum.Enum):
    """Lookup strategies — SearchStrategy.java:3-30 /
    LuceneIndexSearcher.java:226-239."""

    URL_EXACT = "URL_EXACT"
    URL_CANONICAL = "URL_CANONICAL"
    DIGEST_URL_PREFERRED = "DIGEST_URL_PREFERRED"
    DIGEST_ANY = "DIGEST_ANY"  # recommended default (manual.md:181-186)


@dataclass(frozen=True)
class MinHashConfig:
    """Shingle/signature config; defaults follow FIXTURES.md §5
    (5-word shingles, 128 perms, 16 bands x 8 rows)."""

    shingle_words: int = 5
    num_perms: int = 128
    bands: int = 16
    rows_per_band: int = 8
    jaccard_threshold: float = 0.8
    seed: int = 42
    max_band_group: int = 2000  # skew cap: pairs per LSH bucket before sampling

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError("bands * rows_per_band must equal num_perms")


@dataclass(frozen=True)
class PipelineConfig:
    # --- reference knobs ---
    strategy: SearchStrategy = SearchStrategy.DIGEST_ANY
    index_url: bool = True          # properties 'index-url' / CLI -u
    include_canonical: bool = True  # 'canonicalize-url'
    include_etag: bool = False      # 'include-etag' / -e
    index_digest_scheme: bool = False  # 'index-digest-scheme'
    # crawl-side twin of index_digest_scheme (LuceneIndexSearcher.java:
    # 217-220 useDigestScheme): False = strip any 'algo:' prefix on BOTH
    # sides at match time, so an index built with schemes still matches a
    # current crawl without them (and vice versa); True = query with the
    # scheme-qualified digest verbatim.
    use_digest_scheme: bool = False
    # url_canonical key function: 'default' = the M5 rule list
    # (functions/canonical.py), 'surt' = CDX-style SURT keys
    # (functions/surt.py); register_canonicalizer admits user rules.
    # Must match between index build and match (both sides key on it).
    canonicalizer: str = "default"
    mime_filter: str = "^text/.*"   # IndexingLauncher.java:101-102 default
    mime_whitelist: bool = False    # blacklist by default (-w flips)
    # --- semantics flags (SURVEY.md §2.9) ---
    within_batch: bool = False      # False = reference snapshot semantics
    # --- near-dup extension ---
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    # --- execution ---
    batch_size: int = 4096
    # --- hot-key skew handling (match shuffle) ---
    # A hub digest (e.g. the empty document: every crawl has thousands of
    # captures of "") lands all its rows in ONE hash bucket, making one
    # reduce task the straggler that caps shuffle scalability.  The match
    # shuffle samples digest frequencies on a bounded row prefix; a key
    # is HOT when its sampled count exceeds BOTH hot_key_min_count and a
    # bucket's average share of the sample (count * shuffle_buckets >=
    # sampled rows).  A hot key's CURRENT rows spread over salt_buckets
    # consecutive buckets while its (per-key small) history best-rows
    # are replicated into each — output is row-for-row identical to the
    # unsalted shuffle (pytest-pinned).
    salt_buckets: int = 16          # skew: sub-buckets for hub digests
    hot_key_min_count: int = 5_000  # floor: never salt below this sampled count
    # Detection scan bound (0 = full scan).  The pre-pass is pure FIXED
    # cost per job (a separate bounded executor run before the shuffle);
    # 512k rows is the smallest sample where a hub that just fills one of
    # 64 buckets (share 1/64) still clears the 5000-row floor — halving
    # the round-2 default cut ~0.5s/job with identical detection on every
    # corpus tested.
    hot_key_sample_rows: int = 524_288
    # Ingest-time hub statistics: when set (possibly empty = "analyzed,
    # none hot"), the per-job detection pre-pass is skipped entirely and
    # these digests are salted.  Compute once when writing a corpus
    # (ANALYZE-style) and reuse across every job over it; stale stats can
    # only cost speed, never correctness.
    hot_keys: tuple[str, ...] | None = None
    # Hash-bucket count for the match/index shuffles. Keys are bucketed
    # by hash(digest) % shuffle_buckets and each bucket is reduced by ONE
    # vectorized pandas call (never per-key Python). Size it so a bucket
    # (rows/buckets) fits a worker's heap; at cluster scale raise it to
    # ~2-4x total cores.
    shuffle_buckets: int = 64
    checkpoint_dir: str | None = None

    def config_hash(self) -> str:
        """Stable hash used to key checkpoint/lineage entries — a resumed
        run only reuses partitions produced under the identical config."""
        d = asdict(self)
        d["strategy"] = self.strategy.value
        # hot_keys is pinned performance-only (salting never changes the
        # output — tests/test_exact.py), so refreshed table statistics
        # must NOT invalidate resumable stage checkpoints
        d.pop("hot_keys", None)
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.sha1(blob).hexdigest()[:16]
