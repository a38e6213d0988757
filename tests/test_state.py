"""Tests for bloom, sharded digest-index actors, and checkpoint/resume."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from deduplicator_ray.config import PipelineConfig, SearchStrategy
from deduplicator_ray.sources.corpus import captures_table
from deduplicator_ray.state.bloom import BloomFilter
from deduplicator_ray.state.checkpoint import StageCheckpoint, input_fingerprint, run_stage


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(1000)
        keys = [f"digest{i:05d}" for i in range(1000)]
        bf.add_many(keys)
        assert bf.contains_many(keys).all()

    def test_low_false_positive_rate(self):
        bf = BloomFilter(1000)
        bf.add_many([f"digest{i:05d}" for i in range(1000)])
        probes = [f"other{i:05d}" for i in range(10000)]
        fp = bf.contains_many(probes).mean()
        assert fp < 0.01, fp


@pytest.fixture(scope="module")
def small_corpus(sf_dir):
    t = captures_table(sf_dir).to_pandas()
    hist = t[t.crawl == "history"]
    cur = t[t.crawl == "current"].assign(
        content_bytes=t[t.crawl == "current"].text.str.len().astype("int64")
    )
    return hist, cur


class TestActorIndex:
    @pytest.mark.parametrize(
        "strategy", [SearchStrategy.DIGEST_ANY, SearchStrategy.DIGEST_URL_PREFERRED]
    )
    def test_matches_broadcast(self, ray_session, small_corpus, strategy):
        import ray.data as rd

        from deduplicator_ray.stages.exact import build_index, match_broadcast
        from deduplicator_ray.state.index_actor import ShardedDigestIndex, match_actor_index

        hist, cur = small_corpus
        index_ds = build_index(rd.from_pandas(hist), PipelineConfig()).materialize()
        cfg = PipelineConfig(strategy=strategy)
        cur_ds = rd.from_pandas(cur[["doc_id", "rep", "url", "url_canonical", "digest", "warc_ts", "content_bytes"]])
        a = match_broadcast(cur_ds, index_ds, cfg).to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
        idx = ShardedDigestIndex(index_ds, n_shards=3)
        b = match_actor_index(cur_ds, idx, cfg).to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
        for col in ["is_duplicate", "match_tier", "refers_to_url"]:
            assert a[col].tolist() == b[col].tolist(), col

    def test_incremental_add(self, ray_session, small_corpus):
        import ray

        from deduplicator_ray.state.index_actor import DigestIndexShard

        shard = DigestIndexShard.remote()
        r1 = pd.DataFrame(
            {"digest": ["X"], "url": ["u1"], "url_canonical": ["u1"],
             "ts": [pd.Timestamp("2024-01-01")], "record_id": [None]}
        )
        ray.get(shard.load.remote(r1))
        # newer capture of same (url, digest) replaces it
        r2 = r1.assign(ts=[pd.Timestamp("2024-06-01")])
        ray.get(shard.add.remote(r2))
        d, u, c = ray.get(shard.lookup.remote(["X"]))
        assert len(u) == 1 and u["ts_e"].iloc[0] == pd.Timestamp("2024-06-01")
        stats = ray.get(shard.stats.remote())
        assert stats["rows"] == 1


class TestCheckpoint:
    def test_write_resume_invalidate(self, ray_session, tmp_path):
        import ray.data as rd

        root = str(tmp_path / "ckpt")
        calls = {"n": 0}

        def build():
            calls["n"] += 1
            return rd.from_pandas(pd.DataFrame({"x": np.arange(100)}))

        ck = StageCheckpoint(root, "s1", config_hash="abc", input_fingerprint="f1")
        ds, m, skipped = run_stage(ck, build)
        assert not skipped and calls["n"] == 1 and m["total_rows"] == 100
        assert m["n_parts"] >= 1

        # resume: same config -> skipped, no rebuild
        ck2 = StageCheckpoint(root, "s1", config_hash="abc", input_fingerprint="f1")
        ds2, m2, skipped2 = run_stage(ck2, build)
        assert skipped2 and calls["n"] == 1
        assert ds2.count() == 100

        # config change -> recompute
        ck3 = StageCheckpoint(root, "s1", config_hash="DIFFERENT", input_fingerprint="f1")
        _, _, skipped3 = run_stage(ck3, build)
        assert not skipped3 and calls["n"] == 2

        # input change -> recompute
        ck4 = StageCheckpoint(root, "s1", config_hash="DIFFERENT", input_fingerprint="f2")
        _, _, skipped4 = run_stage(ck4, build)
        assert not skipped4 and calls["n"] == 3

    def test_partial_write_not_complete(self, tmp_path):
        root = str(tmp_path / "ckpt2")
        os.makedirs(os.path.join(root, ".tmp.s1", "data"), exist_ok=True)
        ck = StageCheckpoint(root, "s1", config_hash="abc")
        assert not ck.is_complete()

    def test_lineage_parts(self, ray_session, tmp_path):
        import ray.data as rd

        root = str(tmp_path / "ckpt3")
        ck = StageCheckpoint(root, "s1", config_hash="abc")
        ck.write(rd.from_pandas(pd.DataFrame({"x": np.arange(10)})))
        with open(os.path.join(root, "s1", "_lineage", "parts.json")) as f:
            parts = json.load(f)
        assert sum(p["rows"] for p in parts) == 10
        assert all(p["bytes"] > 0 for p in parts)

    def test_input_fingerprint(self, tmp_path):
        p = tmp_path / "f.txt"
        p.write_text("hello")
        f1 = input_fingerprint(str(p))
        f2 = input_fingerprint(str(p))
        assert f1 == f2
        p.write_text("hello world")
        assert input_fingerprint(str(p)) != f1
