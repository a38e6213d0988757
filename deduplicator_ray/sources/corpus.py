"""Corpus sources.

Two kinds of deterministic corpus, both with NO external data:

1. ``captures_*`` — a crawl-captures table derived 1:1 from the driver's
   ``documents`` parquet table (doc_id, text, lang, source, n_chars), with
   planted exact-duplicate structure: re-crawls (exact-url tier),
   session-id url variants (canonical tier), cross-host mirrors (digest
   tier), novel revisions, and a hub "empty page" digest shared by ~25% of
   docs (skew exercise).  The SAME derivation exists as a DuckDB SQL CTE
   (``CAPTURES_CTE``) so every downstream dedup query is oracle-checkable
   value-for-value.  The planted structure mirrors FIXTURES.md §1.

2. ``synth_corpus`` — a fully synthetic seeded Common-Crawl-style corpus
   in the input_hint schema (url, warc_ts, html, text, lang) with planted
   NEAR-duplicate clusters (controlled word-level mutation rates) and
   boilerplate-heavy pages sharing long substrings, plus ground-truth
   cluster ids, used by the MinHash/LSH/CC recall tests and the bench.

Replication of rep-rows per doc (the crawl structure):

    rep | crawl   | condition        | url shape                        | text
    ----+---------+------------------+----------------------------------+---------
    0   | history | always           | https://www.site{h}.example/p/{i}| text
    1   | current | doc_id % 3 == 0  | same as rep 0                    | text
    2   | current | doc_id % 5 == 0  | https://www2.site{h}.example/p/{i}?phpsessid=s{i} | text
    3   | current | doc_id % 7 == 0  | https://mirror.example/d/{i}     | text
    4   | current | doc_id % 2 == 1  | https://www.site{h}.example/v2/{i}| text + ' v2'
    5   | current | doc_id % 4 == 0  | https://www.site{h}.example/empty/{i} | ''
    6   | history | doc_id == 0      | https://www.site0.example/empty-original | ''

with h = doc_id % 20, warc_ts = epoch 1700000000 + doc_id*100 + rep.
"""

from __future__ import annotations

import datetime as _dt
import random

import numpy as np
import pandas as pd
import pyarrow as pa

from deduplicator_ray.functions.canonical import canonicalize_arrow
from deduplicator_ray.functions.digesting import md5_hex_many

EPOCH0 = 1_700_000_000  # 2023-11-14T22:13:20Z

# ---------------------------------------------------------------------------
# 1. captures derived from the documents table (oracle-mirrored)
# ---------------------------------------------------------------------------

# The authoritative SQL derivation. Any change here MUST be reflected in
# _captures_pdf below (and vice versa); tests/test_captures.py diffs them.
CAPTURES_CTE = """
captures AS (
  SELECT
    d.doc_id,
    r.rep,
    CASE r.rep
      WHEN 0 THEN 'https://www.site' || (d.doc_id % 20) || '.example/p/' || d.doc_id
      WHEN 1 THEN 'https://www.site' || (d.doc_id % 20) || '.example/p/' || d.doc_id
      WHEN 2 THEN 'https://www2.site' || (d.doc_id % 20) || '.example/p/' || d.doc_id || '?phpsessid=s' || d.doc_id
      WHEN 3 THEN 'https://mirror.example/d/' || d.doc_id
      WHEN 4 THEN 'https://www.site' || (d.doc_id % 20) || '.example/v2/' || d.doc_id
      WHEN 5 THEN 'https://www.site' || (d.doc_id % 20) || '.example/empty/' || d.doc_id
      ELSE 'https://www.site0.example/empty-original'
    END AS url,
    CASE
      WHEN r.rep IN (5, 6) THEN ''
      WHEN r.rep = 4 THEN d.text || ' v2'
      ELSE d.text
    END AS text,
    d.lang,
    CASE WHEN r.rep IN (0, 6) THEN 'history' ELSE 'current' END AS crawl,
    CAST(1700000000 + d.doc_id * 100 + r.rep AS BIGINT) AS ts_epoch
  FROM documents d
  JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS rep) r
    ON (r.rep = 0
        OR (r.rep = 1 AND d.doc_id % 3 = 0)
        OR (r.rep = 2 AND d.doc_id % 5 = 0)
        OR (r.rep = 3 AND d.doc_id % 7 = 0)
        OR (r.rep = 4 AND d.doc_id % 2 = 1)
        OR (r.rep = 5 AND d.doc_id % 4 = 0)
        OR (r.rep = 6 AND d.doc_id = 0))
)
"""


def _captures_pdf(docs: pd.DataFrame) -> pd.DataFrame:
    """Python mirror of CAPTURES_CTE over a documents dataframe."""
    ids = docs["doc_id"].to_numpy()
    conds = {
        0: np.ones(len(ids), dtype=bool),
        1: ids % 3 == 0,
        2: ids % 5 == 0,
        3: ids % 7 == 0,
        4: ids % 2 == 1,
        5: ids % 4 == 0,
        6: ids == 0,
    }
    frames = []
    for rep, mask in conds.items():
        sub = docs.loc[mask, ["doc_id", "text", "lang"]].copy()
        if sub.empty:
            continue
        i = sub["doc_id"].astype("int64")
        h = (i % 20).astype(str)
        s = i.astype(str)
        if rep in (0, 1):
            url = "https://www.site" + h + ".example/p/" + s
        elif rep == 2:
            url = "https://www2.site" + h + ".example/p/" + s + "?phpsessid=s" + s
        elif rep == 3:
            url = "https://mirror.example/d/" + s
        elif rep == 4:
            url = "https://www.site" + h + ".example/v2/" + s
        elif rep == 5:
            url = "https://www.site" + h + ".example/empty/" + s
        else:
            url = pd.Series(["https://www.site0.example/empty-original"] * len(sub), index=sub.index)
        sub["rep"] = rep
        sub["url"] = url
        if rep in (5, 6):
            sub["text"] = ""
        elif rep == 4:
            sub["text"] = sub["text"] + " v2"
        sub["crawl"] = "history" if rep in (0, 6) else "current"
        sub["ts_epoch"] = (EPOCH0 + i * 100 + rep).astype("int64")
        frames.append(sub)
    out = pd.concat(frames, ignore_index=True)
    out = out[["doc_id", "rep", "url", "text", "lang", "crawl", "ts_epoch"]]
    return out.sort_values(["doc_id", "rep"], ignore_index=True)


def captures_table(sf_dir: str) -> pa.Table:
    """Captures derived from ``{sf_dir}/documents.parquet`` with digest,
    canonical url and warc_ts columns attached (the Python/Ray side of the
    oracle comparison)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]).to_pandas()
    pdf = _captures_pdf(docs)
    pdf["digest"] = md5_hex_many(pdf["text"].tolist())
    pdf["url_canonical"] = canonicalize_arrow(
        pa.array(pdf["url"], type=pa.string())
    ).to_numpy(zero_copy_only=False)
    pdf["warc_ts"] = pd.to_datetime(pdf["ts_epoch"], unit="s")
    return pa.Table.from_pandas(pdf, preserve_index=False)


def captures_dataset(sf_dir: str, *, repeat: int = 1):
    """Ray-native captures derivation: documents stream through one
    vectorized ``map_batches`` expansion (no driver materialization), so
    the same code path scales to the full corpus.

    ``repeat`` > 1 tiles the document space with shifted doc_ids for
    bench-scale corpora (oracle queries always use repeat=1).
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    # offset stride: keeps tiled doc_ids disjoint while ts_epoch
    # (EPOCH0 + doc_id*100) stays inside datetime64[ns] range
    n_docs_hint = 1_000_000

    def expand(batch: pa.Table) -> pa.Table:
        docs = batch.to_pandas()
        tiles = []
        for r in range(repeat):
            d = docs if r == 0 else docs.copy()
            if r:
                d["doc_id"] = d["doc_id"] + r * n_docs_hint
                # perturb replicated text so tiles aren't global duplicates
                d["text"] = d["text"] + f" tile{r}"
            tiles.append(d)
        # ONE _captures_pdf over all tiles: its pandas per-call overhead
        # (~250 column ops) amortizes over batch x repeat rows instead of
        # being paid once per tile (measured 8x per-row cost at x16 rows)
        pdf = _captures_pdf(pd.concat(tiles, ignore_index=True))
        # undo the doc_id-stride leak into ts (keeps warc_ts inside
        # datetime64[ns] at any repeat); tile r gets a +r s offset
        r_of = (pdf["doc_id"] // n_docs_hint).to_numpy()
        pdf["ts_epoch"] = pdf["ts_epoch"] - r_of * (n_docs_hint * 100) + r_of
        pdf["digest"] = md5_hex_many(pdf["text"].tolist())
        pdf["url_canonical"] = canonicalize_arrow(
            pa.array(pdf["url"], type=pa.string())
        ).to_numpy(zero_copy_only=False)
        pdf["warc_ts"] = pd.to_datetime(pdf["ts_epoch"], unit="s")
        return pa.Table.from_pandas(pdf, preserve_index=False)

    # batch size targets ~4k doc-tiles (~10k captures) per output block
    # regardless of the tiling factor: large enough to amortize the
    # per-call pandas overhead, small enough for dozens of parallel tasks
    bs = max(32, min(2048, 4096 // max(1, repeat)))
    return ds.map_batches(expand, batch_format="pyarrow", batch_size=bs)


# ---------------------------------------------------------------------------
# 2. fully synthetic corpus with planted near-dup clusters
# ---------------------------------------------------------------------------

_VOCAB = [
    f"w{i:03d}" for i in range(400)
] + "the of and a to in is was for on as with by at from".split()

_BOILER_HEAD = " ".join(f"nav{i}" for i in range(60)) + " cookie banner accept terms "
_BOILER_TAIL = " footer " + " ".join(f"link{i}" for i in range(60))


def _make_text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n_words))


def _mutate(rng: random.Random, text: str, rate: float) -> str:
    """Replace ~rate of words — controlled shingle overlap for near-dup
    planting (FIXTURES.md §1: 80-99% shared shingles)."""
    words = text.split()
    n_mut = max(1, int(len(words) * rate))
    for _ in range(n_mut):
        i = rng.randrange(len(words))
        words[i] = rng.choice(_VOCAB)
    return " ".join(words)


def _wrap_html(text: str) -> bytes:
    # extract_text() over this html returns exactly `text` (generated text
    # is single-space-joined words with no markup characters).
    return (
        "<html><head><title></title><style>body{margin:0}</style>"
        "<script>var t=1;</script></head><body><p>" + text + "</p></body></html>"
    ).encode("utf-8")


def synth_corpus(
    n_docs: int = 1000,
    seed: int = 42,
    *,
    near_frac: float = 0.15,
    boiler_frac: float = 0.1,
    hub_frac: float = 0.05,
) -> pa.Table:
    """Seeded synthetic corpus in the input_hint schema + ground truth.

    Returns columns (url, warc_ts, html, text, lang, true_cluster):
    ``true_cluster`` >= 0 marks planted near-dup clusters (exact dups get
    the same id as their original); -1 means unique content.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    cluster_id = 0
    base_ts = _dt.datetime(2024, 1, 1)

    def add(url: str, text: str, true_cluster: int, i: int) -> None:
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + _dt.timedelta(seconds=len(rows) * 7 + i),
                "html": _wrap_html(text),
                "text": text,
                "lang": rng.choice(["en", "is", "de"]),
                "true_cluster": true_cluster,
            }
        )

    hub_text = ""  # the empty/soft-404 hub page
    for i in range(n_docs):
        host = f"site{rng.randrange(40)}.example"
        r = rng.random()
        if r < hub_frac:
            add(f"https://www.{host}/gone/{i}", hub_text, -2, i)  # hub digest group
            continue
        n_words = rng.randrange(80, 300)
        if r < hub_frac + boiler_frac:
            body = _make_text(rng, n_words)
            text = _BOILER_HEAD + body + _BOILER_TAIL
        else:
            text = _make_text(rng, n_words)
        if rng.random() < near_frac:
            cid = cluster_id
            cluster_id += 1
            add(f"https://www.{host}/a/{i}", text, cid, i)
            for v in range(rng.randrange(1, 4)):
                rate = rng.uniform(0.01, 0.12)  # 88-99% word overlap
                add(f"https://www.{host}/a/{i}v{v}", _mutate(rng, text, rate), cid, i)
        else:
            add(f"https://www.{host}/u/{i}", text, -1, i)

    pdf = pd.DataFrame(rows)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.large_string()),
            ("lang", pa.string()),
            ("true_cluster", pa.int64()),
        ]
    )
    return pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)


# ---------------------------------------------------------------------------
# 3. linked web pages derived from documents (oracle-mirrored link graph)
# ---------------------------------------------------------------------------

N_HOSTS = 40  # hosts www.site0.example .. www.site39.example

# The authoritative SQL derivation of the planted link structure: page i
# (one per document) carries 1 + (i % 4) outbound anchors; the j-th
# (j = 0-based) points at page t = (i*7 + 11*(j+1) + 3) mod n with anchor
# text 'go {t}'.  The Ray side EXTRACTS links from real html bytes
# (stages/graph.py) — agreement with this arithmetic mirror is what the
# oracle checks, so a broken href parser shows up as a value mismatch.
LINKED_PAGES_CTE = f"""
nn AS (SELECT count(*) AS n FROM documents),
pages AS (
  SELECT d.doc_id,
         'https://www.site' || (d.doc_id % {N_HOSTS}) || '.example/p/' || d.doc_id AS url,
         'www.site' || (d.doc_id % {N_HOSTS}) || '.example' AS host
  FROM documents d
),
linkdst AS (
  SELECT p.doc_id, p.host AS src_host, j.j,
         ((p.doc_id * 7 + 11 * (j.j + 1) + 3) % nn.n) AS dst_doc
  FROM pages p, nn, (SELECT unnest(range(0, 4)) AS j) j
  WHERE j.j < 1 + (p.doc_id % 4)
),
links AS (
  SELECT l.doc_id, l.src_host, l.j,
         'www.site' || (l.dst_doc % {N_HOSTS}) || '.example' AS dst_host,
         'https://www.site' || (l.dst_doc % {N_HOSTS}) || '.example/p/' || l.dst_doc AS dst_url,
         'go ' || l.dst_doc AS anchor
  FROM linkdst l
)
"""


def linked_pages_dataset(sf_dir: str, *, repeat: int = 1):
    """Ray-native linked-pages derivation: one html page per document,
    built by a vectorized ``map_batches`` expansion (no driver
    materialization).  Columns (doc_id, url, html:binary).

    The html embeds the planted anchors of ``LINKED_PAGES_CTE`` as real
    ``<a href="...">`` markup — downstream queries must PARSE it back
    out, so the oracle genuinely exercises the extraction kernel.

    ``repeat`` > 1 tiles the page space with shifted doc_ids for
    bench-scale corpora (oracle queries always use repeat=1); the modulo
    target arithmetic stays over the base-universe size so tiled pages
    link into the same host universe.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = ds.count()  # parquet metadata read — no scan
    stride = 1_000_000

    def expand(batch: pa.Table) -> pa.Table:
        ids0 = np.asarray(batch["doc_id"], dtype=np.int64)
        ids = (
            np.concatenate([ids0 + r * stride for r in range(repeat)])
            if repeat > 1 else ids0
        )
        host = ids % N_HOSTS
        s_id = pd.Series(ids).astype(str)
        s_host = pd.Series(host).astype(str)
        url = "https://www.site" + s_host + ".example/p/" + s_id
        body = pd.Series(np.full(len(ids), "", dtype=object))
        k = 1 + (ids % 4)
        for j in range(4):
            t = (ids * 7 + 11 * (j + 1) + 3) % n
            st = pd.Series(t).astype(str)
            link = (
                '<a href="https://www.site' + pd.Series(t % N_HOSTS).astype(str)
                + ".example/p/" + st + '">go ' + st + "</a>"
            )
            body = body + link.where(pd.Series(k > j), "")
        html = (
            '<html><head><title>p' + s_id
            + '</title></head><body><p>page ' + s_id + "</p>" + body
            + "</body></html>"
        )
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "url": pa.array(url, type=pa.string()),
            "html": pc_cast_binary(html),
        })

    bs = max(64, min(4096, 8192 // max(1, repeat)))
    return ds.map_batches(expand, batch_format="pyarrow", batch_size=bs)


def pc_cast_binary(s: pd.Series) -> pa.Array:
    """utf-8 pandas string Series -> Arrow binary column (html bytes)."""
    return pa.array(s, type=pa.string()).cast(pa.binary())
