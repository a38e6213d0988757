"""Exact-dedup conformance: shuffle matcher vs broadcast matcher vs an
independent single-threaded Python oracle implementing the reference's
strategy predicates (LuceneIndexSearcher.java:247-276), deterministic
selection order, tier classification (DeDuplicator.java:194-205) and
keep-latest index upsert (IndexBuilder.java:227-236)."""

from __future__ import annotations

import pandas as pd
import pytest

from deduplicator_ray.config import PipelineConfig, SearchStrategy
from deduplicator_ray.functions.canonical import canonicalize
from deduplicator_ray.sources.corpus import captures_table
from deduplicator_ray.stages.exact import (
    build_index,
    match_broadcast,
    match_shuffle,
    report_aggregates,
    verify_strategy,
)

STRATEGIES = list(SearchStrategy)


# ---------------------------------------------------------------------------
# naive oracle (no pandas vectorization, no Ray — deliberately dumb)
# ---------------------------------------------------------------------------

def oracle_index(history_rows: list[dict], index_url: bool) -> list[dict]:
    """Keep-latest distinct on (url, digest) or digest (A4)."""
    best: dict = {}
    for r in history_rows:
        k = (r["url"], r["digest"]) if index_url else r["digest"]
        b = best.get(k)
        # newest wins; deterministic tie-break on url asc
        if b is None or (r["warc_ts"], _neg_url(r["url"])) > (b["warc_ts"], _neg_url(b["url"])):
            best[k] = r
    return list(best.values())


class _neg_url(str):
    """Order helper: ts desc is 'bigger wins'; for equal ts, url ASC must
    win, so invert url comparison."""

    def __lt__(self, other):  # noqa: ANN001
        return str.__gt__(self, other)

    def __gt__(self, other):  # noqa: ANN001
        return str.__lt__(self, other)


def oracle_match(cur: dict, index: list[dict], strategy: SearchStrategy) -> dict:
    can = canonicalize(cur["url"])
    hits = [h for h in index if h["digest"] == cur["digest"]]
    if strategy == SearchStrategy.URL_EXACT:
        hits = [h for h in hits if h["url"] == cur["url"]]
    elif strategy == SearchStrategy.URL_CANONICAL:
        hits = [h for h in hits if canonicalize(h["url"]) == can]
    order = lambda h: (h["warc_ts"], h["url"])  # noqa: E731
    chosen = None
    if hits:
        if strategy == SearchStrategy.DIGEST_URL_PREFERRED:
            exact = sorted([h for h in hits if h["url"] == cur["url"]], key=order)
            canon = sorted([h for h in hits if canonicalize(h["url"]) == can], key=order)
            chosen = (exact or canon or sorted(hits, key=order))[0]
        else:
            chosen = sorted(hits, key=order)[0]
    if chosen is None:
        return {"is_duplicate": False, "match_tier": "none", "refers_to_url": None}
    if chosen["url"] == cur["url"]:
        tier = "exact_url"
    elif canonicalize(chosen["url"]) == can:
        tier = "canonical_url"
    else:
        tier = "digest"
    return {
        "is_duplicate": True,
        "match_tier": tier,
        "refers_to_url": chosen["url"],
    }


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(sf_dir):
    t = captures_table(sf_dir).to_pandas()
    hist = t[t.crawl == "history"].reset_index(drop=True)
    cur = t[t.crawl == "current"].reset_index(drop=True)
    return hist, cur


@pytest.fixture(scope="module")
def ray_tables(ray_session, corpus):
    import ray.data as rd

    hist, cur = corpus
    hist_ds = rd.from_pandas(hist)
    # index build over history captures
    idx_rows = oracle_index(hist.to_dict("records"), index_url=True)
    index_pdf = pd.DataFrame(idx_rows)[["url", "url_canonical", "digest", "warc_ts"]].rename(
        columns={"warc_ts": "date"}
    )
    index_ds = rd.from_pandas(index_pdf)
    cur_ds = rd.from_pandas(
        cur[["doc_id", "rep", "url", "url_canonical", "digest", "warc_ts"]].assign(
            content_bytes=cur["text"].str.len().astype("int64")
        )
    )
    return hist_ds, index_ds, cur_ds, idx_rows


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_match_shuffle_vs_oracle(ray_tables, corpus, strategy):
    _, index_ds, cur_ds, idx_rows = ray_tables
    _, cur = corpus
    cfg = PipelineConfig(strategy=strategy)
    got = (
        match_shuffle(cur_ds, index_ds, cfg, id_cols=("doc_id", "rep"))
        .to_pandas()
        .sort_values(["doc_id", "rep"], ignore_index=True)
    )
    assert len(got) == len(cur)
    want = [
        oracle_match(r, idx_rows, strategy)
        for r in cur.sort_values(["doc_id", "rep"]).to_dict("records")
    ]
    for col in ["is_duplicate", "match_tier", "refers_to_url"]:
        got_v = got[col].tolist()
        want_v = [w[col] for w in want]
        assert got_v == want_v, f"{strategy} mismatch on {col}"


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_match_broadcast_equals_shuffle(ray_tables, strategy):
    _, index_ds, cur_ds, _ = ray_tables
    cfg = PipelineConfig(strategy=strategy)
    a = (
        match_shuffle(cur_ds, index_ds, cfg, id_cols=("doc_id", "rep"))
        .to_pandas()
        .sort_values(["doc_id", "rep"], ignore_index=True)
    )
    b = (
        match_broadcast(cur_ds, index_ds, cfg)
        .to_pandas()
        .sort_values(["doc_id", "rep"], ignore_index=True)
    )
    for col in ["is_duplicate", "match_tier", "refers_to_url", "refers_to_date"]:
        assert a[col].tolist() == b[col].tolist(), f"{strategy}: {col}"


def test_build_index_keep_latest(ray_session, corpus):
    import ray.data as rd

    hist, _ = corpus
    # duplicate the history with older timestamps: index must keep newest
    older = hist.copy()
    older["warc_ts"] = older["warc_ts"] - pd.Timedelta(days=365)
    both = pd.concat([older, hist], ignore_index=True)
    ds = rd.from_pandas(both.sample(frac=1.0, random_state=7))  # shuffle input order
    idx = build_index(ds, PipelineConfig()).to_pandas()
    want = pd.DataFrame(oracle_index(both.to_dict("records"), index_url=True))
    assert len(idx) == len(want)
    got = idx.sort_values(["url", "digest"], ignore_index=True)
    want = want.sort_values(["url", "digest"], ignore_index=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["date"].tolist() == want["warc_ts"].tolist()


def test_build_index_digest_only(ray_session, corpus):
    import ray.data as rd

    hist, _ = corpus
    ds = rd.from_pandas(hist)
    idx = build_index(ds, PipelineConfig(index_url=False)).to_pandas()
    assert idx["digest"].is_unique
    assert len(idx) == hist["digest"].nunique()


def test_report_counts(ray_tables, corpus, sf_dir):
    _, index_ds, cur_ds, idx_rows = ray_tables
    _, cur = corpus
    cfg = PipelineConfig(strategy=SearchStrategy.DIGEST_ANY)
    matches = match_shuffle(cur_ds, index_ds, cfg, id_cols=("doc_id", "rep"))
    agg = report_aggregates(matches)
    want = [oracle_match(r, idx_rows, SearchStrategy.DIGEST_ANY) for r in cur.to_dict("records")]
    assert agg["handled"] == len(cur)
    assert agg["duplicates"] == sum(w["is_duplicate"] for w in want)
    from collections import Counter

    tiers = Counter(w["match_tier"] for w in want)
    for t, n in tiers.items():
        assert agg["by_tier"].get(t, {}).get("hits", 0) == n, t


def test_report_counts_rows_without_content_bytes(ray_session):
    """handled counts ROWS (reference 'Total handled'), not non-null
    content sizes — a current table without content_bytes still reports
    every record."""
    import ray.data as rd

    cur = pd.DataFrame(
        {
            "url": ["a", "b"],
            "url_canonical": ["a", "b"],
            "digest": ["X", "Z"],
            "warc_ts": pd.to_datetime([5, 6], unit="s"),
        }
    )
    idx = pd.DataFrame(
        {
            "url": ["a0"],
            "url_canonical": ["a0"],
            "digest": ["X"],
            "date": pd.to_datetime([1], unit="s").astype("datetime64[us]"),
        }
    )
    cfg = PipelineConfig(strategy=SearchStrategy.DIGEST_ANY)
    m = match_shuffle(rd.from_pandas(cur), rd.from_pandas(idx), cfg)
    agg = report_aggregates(m)
    assert agg["handled"] == 2
    assert agg["duplicates"] == 1
    assert agg["total_bytes"] == 0


def test_within_batch_tie_elects_one_original(ray_session):
    """Two current rows tying on (ts, url) within one strategy key: only
    the elected row (record_id tiebreak) is the original."""
    import ray.data as rd

    cur = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "rep": [0, 0],
            "url": ["a", "a"],
            "url_canonical": ["a", "a"],
            "digest": ["X", "X"],
            "record_id": ["r1", "r2"],
            "warc_ts": pd.to_datetime([1, 1], unit="s"),
            "content_bytes": [10, 10],
        }
    )
    empty_idx = rd.from_pandas(
        pd.DataFrame({"url": pd.Series(dtype=str), "url_canonical": pd.Series(dtype=str),
                      "digest": pd.Series(dtype=str), "date": pd.Series(dtype="datetime64[us]")})
    )
    cfg = PipelineConfig(within_batch=True)
    got = (
        match_shuffle(rd.from_pandas(cur), empty_idx, cfg, id_cols=("doc_id", "rep"))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["is_duplicate"].tolist() == [False, True]
    assert got.loc[1, "refers_to_record_id"] == "r1"


def test_digest_scheme_mismatch_still_matches(ray_session):
    """History indexed WITH 'sha1:' prefixes vs a current crawl without
    them (or vice versa): the default strip-at-match rule
    (LuceneIndexSearcher.java:217-220) still finds the duplicates;
    use_digest_scheme=True queries verbatim and finds nothing."""
    import ray.data as rd

    idx = pd.DataFrame(
        {"url": ["h"], "url_canonical": ["h"], "digest": ["sha1:ABC"],
         "date": pd.to_datetime([1], unit="s").astype("datetime64[us]")}
    )
    cur = pd.DataFrame(
        {"url": ["c"], "url_canonical": ["c"], "digest": ["ABC"],
         "warc_ts": pd.to_datetime([5], unit="s")}
    )
    for a, b in [(idx, cur), (
        idx.assign(digest=["ABC"]), cur.assign(digest=["sha1:ABC"])
    )]:
        got = match_shuffle(
            rd.from_pandas(b), rd.from_pandas(a), PipelineConfig()
        ).to_pandas()
        assert got["is_duplicate"].tolist() == [True]
        bc = match_broadcast(
            rd.from_pandas(b), rd.from_pandas(a), PipelineConfig()
        ).to_pandas()
        assert bc["is_duplicate"].tolist() == [True]
    strict = match_shuffle(
        rd.from_pandas(cur), rd.from_pandas(idx),
        PipelineConfig(use_digest_scheme=True),
    ).to_pandas()
    assert strict["is_duplicate"].tolist() == [False]


def test_verify_strategy():
    import pyarrow as pa

    with pytest.raises(ValueError):
        verify_strategy(pa.schema([("url", pa.string())]), PipelineConfig())
    with pytest.raises(ValueError):
        verify_strategy(
            pa.schema([("digest", pa.string())]),
            PipelineConfig(strategy=SearchStrategy.URL_EXACT),
        )


def test_within_batch_mode(ray_session):
    """within_batch=True also catches intra-crawl duplicates (§2.9)."""
    import ray.data as rd

    cur = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "rep": [0, 0, 0],
            "url": ["a", "b", "c"],
            "url_canonical": ["a", "b", "c"],
            "digest": ["X", "X", "Y"],
            "warc_ts": pd.to_datetime([1, 2, 3], unit="s"),
            "content_bytes": [10, 10, 10],
        }
    )
    empty_idx = rd.from_pandas(
        pd.DataFrame({"url": pd.Series(dtype=str), "url_canonical": pd.Series(dtype=str),
                      "digest": pd.Series(dtype=str), "date": pd.Series(dtype="datetime64[us]")})
    )
    cfg = PipelineConfig(within_batch=True)
    got = (
        match_shuffle(rd.from_pandas(cur), empty_idx, cfg, id_cols=("doc_id", "rep"))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["is_duplicate"].tolist() == [False, True, False]
    assert got.loc[1, "refers_to_url"] == "a"
    # snapshot mode finds nothing (reference parity)
    cfg2 = PipelineConfig(within_batch=False)
    got2 = match_shuffle(rd.from_pandas(cur), empty_idx, cfg2, id_cols=("doc_id",)).to_pandas()
    assert (~got2["is_duplicate"]).all()


def test_fused_equals_two_stage_on_revisit_history(ray_session):
    """M7 on the fused path: a raw history with revisit records (resolved
    AND unresolved) must produce the same matches through
    match_shuffle(history_is_raw=True) as through the explicit
    build_index -> match_shuffle pipeline."""
    import ray.data as rd

    ts = pd.Timestamp("2023-01-01")
    hist = pd.DataFrame(
        [
            # plain capture
            {"url": "https://a.example/p1", "digest": "d1", "warc_ts": ts,
             "record_id": "r1", "is_revisit": False, "original_url": None,
             "original_ts": None},
            # resolved revisit: must remap to the original's url+ts
            {"url": "https://a.example/p1", "digest": "d2",
             "warc_ts": ts + pd.Timedelta(days=9), "record_id": "r2",
             "is_revisit": True, "original_url": "https://orig.example/first",
             "original_ts": ts - pd.Timedelta(days=30)},
            # unresolved revisit: must be dropped entirely
            {"url": "https://a.example/p3", "digest": "d3",
             "warc_ts": ts + pd.Timedelta(days=2), "record_id": "r3",
             "is_revisit": True, "original_url": None, "original_ts": None},
            # newer plain capture of the same (url, digest): keep-latest
            {"url": "https://b.example/p4", "digest": "d4", "warc_ts": ts,
             "record_id": "r4", "is_revisit": False, "original_url": None,
             "original_ts": None},
            {"url": "https://b.example/p4", "digest": "d4",
             "warc_ts": ts + pd.Timedelta(days=5), "record_id": "r5",
             "is_revisit": False, "original_url": None, "original_ts": None},
        ]
    )
    hist["url_canonical"] = hist["url"].map(canonicalize)
    cur = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "rep": [0, 0, 0, 0],
            "url": ["https://a.example/p1", "https://x.example/q",
                    "https://a.example/p3", "https://b.example/p4"],
            "digest": ["d1", "d2", "d3", "d4"],
            "warc_ts": [ts + pd.Timedelta(days=100)] * 4,
        }
    )
    cur["url_canonical"] = cur["url"].map(canonicalize)
    cur["content_bytes"] = 10

    for strategy in STRATEGIES:
        cfg = PipelineConfig(strategy=strategy)
        hist_ds = rd.from_pandas(hist)
        cur_ds = rd.from_pandas(cur)
        fused = (
            match_shuffle(cur_ds, hist_ds, cfg, id_cols=("doc_id", "rep"),
                          history_is_raw=True)
            .to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
        )
        index_ds = build_index(rd.from_pandas(hist), cfg)
        two = (
            match_shuffle(rd.from_pandas(cur), index_ds, cfg,
                          id_cols=("doc_id", "rep"))
            .to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
        )
        for col in ["is_duplicate", "match_tier", "refers_to_url", "refers_to_date"]:
            assert fused[col].tolist() == two[col].tolist(), f"{strategy}: {col}"
        # semantics spot-checks (not just path equality):
        by_doc = dict(zip(fused["doc_id"], fused["refers_to_url"]))
        # d2's only history row is the resolved revisit -> original's url
        # (its current url differs, so only the digest strategies hit)
        if strategy in (SearchStrategy.DIGEST_ANY, SearchStrategy.DIGEST_URL_PREFERRED):
            assert fused.loc[fused.doc_id == 2, "is_duplicate"].item()
            assert by_doc[2] == "https://orig.example/first"
        # d3's only history row was an unresolved revisit -> no match
        assert not fused.loc[fused.doc_id == 3, "is_duplicate"].item()


# ---------------------------------------------------------------------------
# hub-key salting + tagged single-pass matcher
# ---------------------------------------------------------------------------


def _hub_corpus():
    """A corpus with one hub digest ('HUB': 600 current rows + 3 history
    rows) and a long tail of singleton digests, tagged with a 'crawl'
    column so the same frame drives both the separate-dataset and the
    tagged single-pass paths."""
    ts = pd.Timestamp("2023-06-01")
    rows = []
    for i in range(600):
        rows.append({"crawl": "current", "doc_id": i, "rep": 0,
                     "url": f"https://hub.example/{i % 7}", "digest": "HUB",
                     "warc_ts": ts + pd.Timedelta(seconds=i)})
    for i in range(200):
        rows.append({"crawl": "current", "doc_id": 1000 + i, "rep": 0,
                     "url": f"https://tail.example/{i}", "digest": f"T{i}",
                     "warc_ts": ts + pd.Timedelta(seconds=i)})
    for j in range(3):
        rows.append({"crawl": "history", "doc_id": -1, "rep": 0,
                     "url": f"https://hub.example/{j}", "digest": "HUB",
                     "warc_ts": ts - pd.Timedelta(days=j + 1)})
    for i in range(0, 200, 2):  # half the tail digests have history
        rows.append({"crawl": "history", "doc_id": -1, "rep": 0,
                     "url": f"https://tail.example/{i}", "digest": f"T{i}",
                     "warc_ts": ts - pd.Timedelta(days=1)})
    pdf = pd.DataFrame(rows)
    pdf["url_canonical"] = pdf["url"].map(canonicalize)
    pdf["record_id"] = "r" + pdf.index.astype(str)
    pdf["content_bytes"] = 10
    return pdf


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_salted_shuffle_equals_unsalted(ray_session, strategy):
    """Hub-digest salting is a pure performance measure: with the
    detection floor forced low enough to salt 'HUB', the matcher output
    is row-for-row identical to the unsalted shuffle."""
    import ray.data as rd

    pdf = _hub_corpus()
    hist = pdf[pdf.crawl == "history"].drop(columns=["crawl"])
    cur = pdf[pdf.crawl == "current"].drop(columns=["crawl"])

    base_cfg = dict(strategy=strategy, shuffle_buckets=8)
    plain = PipelineConfig(**base_cfg, salt_buckets=1)
    salted = PipelineConfig(**base_cfg, salt_buckets=4, hot_key_min_count=100,
                            hot_key_sample_rows=0)

    from deduplicator_ray.stages.exact import find_hot_keys

    hot = find_hot_keys(rd.from_pandas(cur), "digest", num_buckets=8,
                        min_count=100, sample_rows=0)
    assert hot == frozenset({"HUB"})

    outs = []
    for cfg in (plain, salted):
        outs.append(
            match_shuffle(rd.from_pandas(cur), rd.from_pandas(hist), cfg,
                          id_cols=("doc_id", "rep"), history_is_raw=True)
            .to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
        )
    a, b = outs
    assert len(a) == len(b) == len(cur)
    for col in ["doc_id", "is_duplicate", "match_tier", "refers_to_url",
                "refers_to_date", "refers_to_record_id"]:
        assert a[col].tolist() == b[col].tolist(), f"{strategy}: {col}"


def test_precomputed_hot_keys_equal_detection(ray_session):
    """cfg.hot_keys (ingest-time table statistics) must short-circuit the
    detection pre-pass and produce row-identical output; an empty tuple
    means "analyzed, none hot" and must also skip detection."""
    import ray.data as rd

    from deduplicator_ray.stages import exact as ex
    from deduplicator_ray.stages.exact import match_shuffle_tagged

    pdf = _hub_corpus()
    base = dict(strategy=SearchStrategy.DIGEST_URL_PREFERRED,
                shuffle_buckets=8, salt_buckets=4)
    detected = PipelineConfig(**base, hot_key_min_count=100,
                              hot_key_sample_rows=0)
    precomp = PipelineConfig(**base, hot_keys=("HUB",))
    analyzed_clean = PipelineConfig(**base, hot_keys=())

    # the override path must never invoke the sampling scan
    def boom(*a, **k):  # pragma: no cover - fails the test if called
        raise AssertionError("detection ran despite precomputed stats")

    outs = {}
    for name, cfg in [("detected", detected), ("precomp", precomp),
                      ("clean", analyzed_clean)]:
        orig = ex.find_hot_keys
        if name != "detected":
            ex.find_hot_keys = boom
        try:
            outs[name] = (
                match_shuffle_tagged(rd.from_pandas(pdf), cfg,
                                     id_cols=("doc_id", "rep"))
                .to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
            )
        finally:
            ex.find_hot_keys = orig
    for col in ["doc_id", "is_duplicate", "match_tier", "refers_to_url",
                "refers_to_date", "refers_to_record_id"]:
        assert outs["detected"][col].tolist() == outs["precomp"][col].tolist(), col
        assert outs["detected"][col].tolist() == outs["clean"][col].tolist(), col


def test_hot_key_off_switch_beats_stats():
    """hot_key_min_count <= 0 is the explicit salting OFF switch and must
    win over precomputed stats (an auto-discovered sidecar must not
    silently re-enable salting a user disabled)."""
    from deduplicator_ray.stages.exact import _match_hot_keys

    cfg = PipelineConfig(hot_key_min_count=0, hot_keys=("HUB",))
    assert _match_hot_keys(None, cfg, strip=False) == frozenset()
    cfg2 = PipelineConfig(hot_keys=("HUB",))
    assert _match_hot_keys(None, cfg2, strip=False) == frozenset({"HUB"})


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_tagged_matcher_equals_separate(ray_session, strategy):
    """match_shuffle_tagged (one read, one conform pass) must equal the
    two-dataset fused path on the same tagged corpus — including with
    salting active on the hub digest."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import match_shuffle_tagged

    pdf = _hub_corpus()
    hist = pdf[pdf.crawl == "history"].drop(columns=["crawl"])
    cur = pdf[pdf.crawl == "current"].drop(columns=["crawl"])
    cfg = PipelineConfig(strategy=strategy, shuffle_buckets=8, salt_buckets=4,
                         hot_key_min_count=100, hot_key_sample_rows=0)

    tagged = (
        match_shuffle_tagged(rd.from_pandas(pdf), cfg, id_cols=("doc_id", "rep"))
        .to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
    )
    sep = (
        match_shuffle(rd.from_pandas(cur), rd.from_pandas(hist), cfg,
                      id_cols=("doc_id", "rep"), history_is_raw=True)
        .to_pandas().sort_values(["doc_id", "rep"], ignore_index=True)
    )
    assert len(tagged) == len(cur)
    for col in ["doc_id", "is_duplicate", "match_tier", "refers_to_url",
                "refers_to_date", "refers_to_record_id"]:
        assert tagged[col].tolist() == sep[col].tolist(), f"{strategy}: {col}"


def test_tagged_matcher_remaps_revisits(ray_session):
    """The tagged path applies the M7 revisit remap on the history side
    (conform_tagged passes remap_revisits=True)."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import match_shuffle_tagged

    ts = pd.Timestamp("2023-01-01")
    pdf = pd.DataFrame([
        {"crawl": "history", "url": "https://a.example/p", "digest": "d2",
         "warc_ts": ts, "record_id": "r1", "is_revisit": True,
         "original_url": "https://orig.example/first",
         "original_ts": ts - pd.Timedelta(days=30)},
        {"crawl": "current", "url": "https://x.example/q", "digest": "d2",
         "warc_ts": ts + pd.Timedelta(days=10), "record_id": "r2",
         "is_revisit": False, "original_url": None, "original_ts": None},
    ])
    pdf["url_canonical"] = pdf["url"].map(canonicalize)
    pdf["content_bytes"] = 10
    got = match_shuffle_tagged(
        rd.from_pandas(pdf), PipelineConfig(strategy=SearchStrategy.DIGEST_ANY)
    ).to_pandas()
    assert got["is_duplicate"].tolist() == [True]
    assert got["refers_to_url"].tolist() == ["https://orig.example/first"]


def test_find_hot_keys_detection(ray_session):
    """Detection respects the min_count floor, the bucket-share bar, and
    skip_col filtering."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import find_hot_keys

    pdf = _hub_corpus()
    ds = rd.from_pandas(pdf)
    # history rows excluded via skip_col: 600 HUB rows remain -> hot
    hot = find_hot_keys(ds, "digest", num_buckets=8, min_count=100,
                        skip_col="crawl", skip_value="history", sample_rows=0)
    assert hot == frozenset({"HUB"})
    # floor above the hub count -> nothing is hot
    assert find_hot_keys(ds, "digest", num_buckets=8, min_count=10_000,
                         sample_rows=0) == frozenset()
    # bucket-share bar: with 2 buckets the sampled corpus (~1100 rows)
    # requires ~550 rows per key; the 603 HUB rows still qualify, the
    # tail never does
    hot2 = find_hot_keys(ds, "digest", num_buckets=2, min_count=10, sample_rows=0)
    assert hot2 == frozenset({"HUB"})
    tails = find_hot_keys(ds, "digest", num_buckets=8, min_count=10, sample_rows=0)
    assert "T0" not in tails


def test_tagged_matcher_null_tag_rows_are_current(ray_session):
    """Rows whose tag column is NULL must be treated as current, not
    silently dropped from both halves (Arrow's filter drops null-masked
    rows from a mask AND its inversion)."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import match_shuffle_tagged

    ts = pd.Timestamp("2023-01-01")
    pdf = pd.DataFrame([
        {"crawl": "history", "url": "https://a.example/p", "digest": "d1",
         "warc_ts": ts, "record_id": "r1"},
        {"crawl": None, "url": "https://b.example/q", "digest": "d1",
         "warc_ts": ts + pd.Timedelta(days=1), "record_id": "r2"},
        {"crawl": "current", "url": "https://c.example/r", "digest": "d9",
         "warc_ts": ts + pd.Timedelta(days=2), "record_id": "r3"},
    ])
    pdf["url_canonical"] = pdf["url"].map(canonicalize)
    pdf["content_bytes"] = 10
    got = match_shuffle_tagged(
        rd.from_pandas(pdf), PipelineConfig(strategy=SearchStrategy.DIGEST_ANY)
    ).to_pandas().sort_values("url", ignore_index=True)
    # both non-history rows survive as current; the null-tag one matches d1
    assert got["url"].tolist() == ["https://b.example/q", "https://c.example/r"]
    assert got["is_duplicate"].tolist() == [True, False]


def test_build_index_revisit_without_original_columns(ray_session):
    """A corpus carrying is_revisit but NO original_url/original_ts
    columns must not crash build_index: every revisit is unresolved and
    dropped (same rule as _conform_table / skip_counters)."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import build_index

    ts = pd.Timestamp("2023-01-01")
    pdf = pd.DataFrame([
        {"url": "https://a.example/p", "digest": "d1", "warc_ts": ts,
         "record_id": "r1", "is_revisit": False},
        {"url": "https://a.example/rev", "digest": "d1", "warc_ts": ts,
         "record_id": "r2", "is_revisit": True},
    ])
    pdf["url_canonical"] = pdf["url"].map(canonicalize)
    idx = build_index(rd.from_pandas(pdf), PipelineConfig()).to_pandas()
    assert idx["url"].tolist() == ["https://a.example/p"]


def test_build_index_documents_corpus_no_url_no_ts(ray_session):
    """build_index over a documents-style corpus (digest only — no url,
    no warc_ts): distinct on digest, null url/date columns, no crash
    (exercised by the CLI --build-index path on documents.parquet)."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import build_index

    pdf = pd.DataFrame({
        "doc_key": [1, 2, 3, 4],
        "digest": ["d1", "d2", "d1", "d3"],
    })
    idx = build_index(rd.from_pandas(pdf), PipelineConfig()).to_pandas()
    assert sorted(idx["digest"].tolist()) == ["d1", "d2", "d3"]
    assert idx["url"].isna().all() and idx["date"].isna().all()


def _mk_index_pdf(rows):
    """rows: (url, digest, date_iso, orid)."""
    return pd.DataFrame({
        "url": [r[0] for r in rows],
        "url_canonical": [r[0] for r in rows],
        "digest": [r[1] for r in rows],
        "date": pd.to_datetime([r[2] for r in rows]),
        "etag": [None] * len(rows),
        "original_record_id": [r[3] for r in rows],
    })


def test_merge_index_split_equals_full(ray_session):
    """prefer='newest' associativity: merge(build(A), build(B)) ==
    build(A ∪ B) — the CREATE_OR_APPEND driver-oracle property."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.stages.exact import build_index, merge_index

    rng = np.random.default_rng(5)
    n = 60
    # lcm(6, 4) = 12 << n: every (url, digest) key repeats ~5x, so the
    # even/odd halves CONFLICT on most keys and the merge election
    # (date desc, url, record_id) is genuinely exercised
    pdf = pd.DataFrame({
        "record_id": [f"r{i:03d}" for i in range(n)],
        "url": [f"http://s.example/p/{i % 6}" for i in range(n)],
        "url_canonical": [f"s.example/p/{i % 6}" for i in range(n)],
        "digest": [f"d{i % 4}" for i in range(n)],
        "warc_ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10, n), unit="D"),
    })
    cfg = PipelineConfig()
    full = build_index(rd.from_pandas(pdf), cfg).to_pandas()
    a = build_index(rd.from_pandas(pdf.iloc[::2]), cfg)
    b = build_index(rd.from_pandas(pdf.iloc[1::2]), cfg)
    merged = merge_index(a, b, cfg, prefer="newest").to_pandas()
    # original_record_id included: the election must pick the SAME record
    # as the one-shot build, not just an equal-dated one
    cols = ["url", "url_canonical", "digest", "date", "original_record_id"]
    lhs = merged[cols].sort_values(cols, ignore_index=True)
    rhs = full[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(lhs, rhs)
    assert full["url"].duplicated().any()  # conflicts actually occurred


def test_merge_index_prefer_modes(ray_session):
    """incoming = Lucene updateDocument last-write-wins even when the
    incoming capture is OLDER; newest = timestamp election."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import merge_index

    existing = _mk_index_pdf([("http://a", "d1", "2024-06-01", "r1"),
                              ("http://b", "d2", "2024-06-01", "r2")])
    incoming = _mk_index_pdf([("http://a", "d1", "2024-01-01", "r9")])
    cfg = PipelineConfig()
    newest = (merge_index(rd.from_pandas(existing), rd.from_pandas(incoming),
                          cfg, prefer="newest")
              .to_pandas().set_index("digest").sort_index())
    assert newest.loc["d1", "original_record_id"] == "r1"  # newer existing won
    last = (merge_index(rd.from_pandas(existing), rd.from_pandas(incoming),
                        cfg, prefer="incoming")
            .to_pandas().set_index("digest").sort_index())
    assert last.loc["d1", "original_record_id"] == "r9"   # incoming replaced
    assert last.loc["d2", "original_record_id"] == "r2"   # untouched key kept
    assert len(newest) == 2 and len(last) == 2


def test_merge_index_digest_only_key(ray_session):
    """index_url=False: key is digest alone (updateDocument on the DIGEST
    term) — distinct urls with one digest collapse to the newest."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import merge_index

    existing = _mk_index_pdf([("http://a", "d1", "2024-03-01", "r1")])
    incoming = _mk_index_pdf([("http://z", "d1", "2024-05-01", "r2")])
    cfg = PipelineConfig(index_url=False, include_canonical=False)
    got = merge_index(rd.from_pandas(existing), rd.from_pandas(incoming),
                      cfg, prefer="newest").to_pandas()
    assert len(got) == 1 and got["url"].iloc[0] == "http://z"


def test_merge_index_schema_drift(ray_session):
    """Appending to an index built WITHOUT --include-etag: the missing
    column nulls in rather than failing (upgrade path for old indexes)."""
    import ray.data as rd

    from deduplicator_ray.stages.exact import merge_index

    old = pd.DataFrame({"url": ["http://a"], "url_canonical": ["a"],
                        "digest": ["d1"],
                        "date": pd.to_datetime(["2024-01-01"]),
                        "original_record_id": ["r1"]})  # no etag column
    new = pd.DataFrame({"url": ["http://b"], "url_canonical": ["b"],
                        "digest": ["d2"],
                        "date": pd.to_datetime(["2024-02-01"]),
                        "etag": ['W/"1"'],
                        "original_record_id": ["r2"]})
    got = (merge_index(rd.from_pandas(old), rd.from_pandas(new),
                       PipelineConfig())
           .to_pandas().set_index("digest").sort_index())
    assert len(got) == 2
    assert pd.isna(got.loc["d1", "etag"]) and got.loc["d2", "etag"] == 'W/"1"'
    assert got.loc["d1", "original_record_id"] == "r1"


def test_match_mixed_digest_formats_roundtrip(ray_session):
    """Mixed digest formats in ONE corpus (lowercase hex, UPPERCASE hex,
    Base32-SHA1, scheme-prefixed) through the packed-binary shuffle:
    equal digests must still match, distinct ones must not, and the
    output digest strings must be byte-identical to the input — pins
    the value-level injectivity of _pack_digests at pipeline level."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.functions.digesting import md5_hex, sha1_base32
    from deduplicator_ray.stages.exact import match_shuffle_tagged

    hx = md5_hex("same")
    b32 = sha1_base32(b"same")
    rows = []
    # history rows: one per digest flavor
    for i, dg in enumerate([hx, hx.upper(), b32, "md5:" + hx]):
        rows.append({"doc_id": i, "rep": 0, "crawl": "history",
                     "url": f"https://h.example/{i}", "digest": dg,
                     "url_canonical": f"https://h.example/{i}",
                     "warc_ts": pd.Timestamp("2023-01-01") + pd.Timedelta(i, "s"),
                     "content_bytes": 10})
    # current rows: same digests (must hit) + a fresh one (must miss)
    cur_digests = [hx, hx.upper(), b32, "md5:" + hx, md5_hex("novel")]
    for i, dg in enumerate(cur_digests):
        rows.append({"doc_id": 100 + i, "rep": 1, "crawl": "current",
                     "url": f"https://c.example/{i}", "digest": dg,
                     "url_canonical": f"https://c.example/{i}",
                     "warc_ts": pd.Timestamp("2023-06-01"),
                     "content_bytes": 10})
    pdf = pd.DataFrame(rows)
    cfg = PipelineConfig(strategy=SearchStrategy.DIGEST_ANY,
                         use_digest_scheme=True,  # keep formats distinct
                         shuffle_buckets=4)
    out = (match_shuffle_tagged(rd.from_pandas(pdf), cfg,
                                id_cols=("doc_id", "rep"))
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert len(out) == 5
    # with the scheme kept, each flavor only matches its own exact bytes
    assert out["is_duplicate"].tolist() == [True, True, True, True, False]
    assert out.loc[0, "refers_to_url"] == "https://h.example/0"
    assert out.loc[1, "refers_to_url"] == "https://h.example/1"
    assert out.loc[2, "refers_to_url"] == "https://h.example/2"
    assert out.loc[3, "refers_to_url"] == "https://h.example/3"
    # output digests are byte-identical to the input strings (unpack
    # restored every flavor exactly)
    assert out["digest"].tolist() == cur_digests
