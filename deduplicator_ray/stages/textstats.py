"""Text analysis stages for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting (first-class
extensions alongside SURVEY.md §2).

All stages are vectorized ``map_batches`` transforms; the language
profiles and compiled regexes live in an actor (built once per worker).
"""

from __future__ import annotations

import re
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# shared RE2 token patterns (same strings feed the DuckDB oracle mirrors
# in pipelines/queries_ext.py — keep in lockstep)
WS_TOKEN_PAT = r"[^ \t\n\r\f\v]+"
# BPE-ish pre-tokenizer (GPT-2 style, simplified): contractions, words,
# non-space punctuation runs; RE2-safe (no lookarounds)
BPE_TOKEN_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_counts(ds, *, text_col: str = "text"):
    """Adds ``n_ws_tokens`` (whitespace tokens; SQL-mirrorable) and
    ``n_bpe_tokens`` (regex pre-tokenizer count).  Both are RE2 kernels
    (``pc.count_substring_regex``) over the whole column — no Python rows."""

    def f(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")
        ws = pc.cast(pc.count_substring_regex(t, WS_TOKEN_PAT), pa.int64())
        bpe = pc.cast(pc.count_substring_regex(t, BPE_TOKEN_PAT), pa.int64())
        return b.append_column("n_ws_tokens", ws).append_column("n_bpe_tokens", bpe)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quality metrics
# ---------------------------------------------------------------------------


def quality_metrics(ds, *, text_col: str = "text"):
    """Adds integer quality counters (SQL-mirrorable): n_chars, n_punct,
    n_digits, n_upper, n_spaces — plus a float ``quality_score`` in [0,1]
    combining length, punctuation balance and word-length sanity.

    Fully vectorized: counters are RE2 kernels
    (``pc.count_substring_regex``); mean word length is derived as
    (non-whitespace chars) / (whitespace-token count) — identical to the
    mean over ``str.split()`` word lengths, without touching Python."""

    def f(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")

        def cnt(pat: str) -> np.ndarray:
            return pc.count_substring_regex(t, pat).to_numpy(zero_copy_only=False).astype(np.int64)

        n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
        punct = cnt(r"[^\pL\pN\s]")
        digits = cnt(r"\pN")
        upper = cnt(r"\p{Lu}")
        spaces = cnt(" ")
        n_words = cnt(r"\S+")
        n_ws = cnt(r"\s")
        nonspace = n_chars - n_ws
        mwl = np.where(n_words > 0, nonspace / np.maximum(1, n_words), 0.0)
        len_ok = np.minimum(1.0, n_chars / 200.0) * np.where(n_chars < 20000, 1.0, 0.5)
        punct_ok = 1.0 - np.minimum(1.0, (punct / np.maximum(1, n_chars)) * 4.0)
        word_ok = np.where((mwl >= 2.0) & (mwl <= 12.0), 1.0, 0.3)
        score = np.round(len_ok * 0.4 + punct_ok * 0.3 + word_ok * 0.3, 6)
        empty = n_chars == 0
        score = np.where(empty, 0.0, score)
        out = b.append_column("n_chars_q", pa.array(n_chars))
        for name, arr in [
            ("n_punct", punct),
            ("n_digits", digits),
            ("n_upper", upper),
            ("n_spaces", spaces),
        ]:
            out = out.append_column(name, pa.array(arr))
        return out.append_column("quality_score", pa.array(score))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# language identification (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is was for on that with as it at by from this be are".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf des ein eine nicht als".split()),
    "fr": frozenset("le la les de des et en un une du est pour que dans qui au sur pas".split()),
    "es": frozenset("el la los las de y en un una del es por que con para su al como".split()),
    "is": frozenset("og að í á er um við sem af fyrir það til en ekki hann hún með".split()),
}


class LangId:
    """Actor-pool stage: heuristic language ID.

    Scoring: stopword hit-rate per language profile; CJK codepoint ratio
    short-circuits to 'zh'. Unknown -> 'und'."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.profiles = _PROFILES

    def detect(self, text: str | None) -> str:
        if not text:
            return "und"
        sample = text[:2000]
        cjk = sum(1 for c in sample if "一" <= c <= "鿿")
        if cjk > 0.2 * max(1, len(sample.replace(" ", ""))):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(sample)]
        if not words:
            return "und"
        best, best_rate = "und", 0.04  # minimum confidence
        for lang, prof in self.profiles.items():
            rate = sum(w in prof for w in words) / len(words)
            if rate > best_rate:
                best, best_rate = lang, rate
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.detect(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


_LANGID_CACHE: dict[str, LangId] = {}


def lang_id(ds, *, text_col: str = "text"):
    """Task-pool stage with per-PROCESS cached state: LangId's state (a
    compiled regex + frozen stopword sets) is microseconds to build, so an
    actor pool buys nothing but spin-up latency — Ray reuses worker
    processes across tasks, and the module-level cache gives the same
    build-once-per-worker behavior without actor scheduling."""

    def f(b: pa.Table) -> pa.Table:
        li = _LANGID_CACHE.get(text_col)
        if li is None:
            li = _LANGID_CACHE.setdefault(text_col, LangId(text_col))
        return li(b)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=2048, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2 on BOTH sides (pyarrow replace/count kernels and DuckDB
# regexp_replace/regexp_extract_all are all RE2) — keep these strings in
# lockstep with the SQL mirror in pipelines/queries_ext.py
PII_EMAIL_PAT = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IP_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(ds, *, text_col: str = "text"):
    """Training-data PII scrub, map-only and fully vectorized: replaces
    e-mail addresses with ``<EMAIL>`` and IPv4 literals with ``<IP>``
    (emails first, so a dotted host inside an address never half-matches
    as an IP), and counts the replacements per document.

    Adds ``text_redacted``, ``n_emails``, ``n_ips``.  Whole-column RE2
    kernels — no per-row Python; at 100 TB this is a pure scan stage
    with zero shuffle."""

    def f(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")
        n_emails = pc.cast(pc.count_substring_regex(t, PII_EMAIL_PAT),
                           pa.int64())
        red = pc.replace_substring_regex(t, PII_EMAIL_PAT, "<EMAIL>")
        n_ips = pc.cast(pc.count_substring_regex(red, PII_IP_PAT), pa.int64())
        red = pc.replace_substring_regex(red, PII_IP_PAT, "<IP>")
        return (b.append_column("text_redacted", red)
                 .append_column("n_emails", n_emails)
                 .append_column("n_ips", n_ips))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096,
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Gopher-rule composite quality filter
# ---------------------------------------------------------------------------

# the stopword list the filter checks against: union of the language
# profiles above (single source of truth — the DuckDB oracle mirror in
# pipelines/queries_ext.py interpolates THIS set, sorted)
GOPHER_STOPWORDS: frozenset[str] = frozenset().union(*_PROFILES.values())

# rule names in evaluation order (first failure wins)
GOPHER_RULES = ("too_few_words", "too_many_words", "word_length",
                "non_alpha", "stopwords", "repetition")


def gopher_filter(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  min_words: int = 50, max_words: int = 100_000,
                  stopwords: frozenset[str] = GOPHER_STOPWORDS,
                  min_stop: int = 2, output: str = "project"):
    """Composite document-quality filter after Gopher (Rae et al. 2021,
    appendix A1.1), map-only and fully SQL-mirrorable: every rule is an
    integer comparison over per-word aggregates (no float ratios), so the
    DuckDB oracle reproduces it bit-exactly.

    Rules, in order (first failing rule is reported):
    - ``too_few_words`` / ``too_many_words``: word count outside
      [min_words, max_words] (words = single-space split, like the dedup
      stages; Gopher's 50..100k defaults);
    - ``word_length``: mean word length outside [3, 10] chars, checked as
      3*n_words <= total_word_chars <= 10*n_words;
    - ``non_alpha``: fewer than 80% of words contain an alphabetic
      character (5*n_alpha_words < 4*n_words);
    - ``stopwords``: fewer than ``min_stop`` DISTINCT stopwords from the
      ``stopwords`` list present (default: ``GOPHER_STOPWORDS``);
    - ``repetition``: the most frequent word covers more than 20% of the
      doc (5*top_word_count > n_words) — the word-level analog of
      Gopher's duplicate-line fractions for unpunctuated corpora.

    ``output="project"`` returns (doc_id, keep, fail_reason) —
    ``fail_reason`` null when kept; ``output="annotate"`` keeps the input
    columns and appends keep/fail_reason (for in-pipeline filtering);
    ``output="flags"`` returns every rule's independent pass/fail bit
    (doc_id, len_ok, wordlen_ok, alpha_ok, stop_ok, rep_ok, n_words) —
    the input to filter-ablation censuses, where first-fail masking
    would hide rule interactions.
    """
    import pandas as pd

    if output not in ("project", "annotate", "flags"):
        raise ValueError("output must be 'project', 'annotate' or 'flags'")

    def f(b: pa.Table) -> pa.Table:
        # annotate mode never emits ids, so it has no int64-id
        # precondition (raw url-keyed corpora pass through untouched)
        n = b.num_rows
        if not n:
            empty_keep = pa.array([], type=pa.bool_())
            empty_reason = pa.array([], type=pa.string())
            if output == "annotate":
                return b.append_column("keep", empty_keep).append_column(
                    "fail_reason", empty_reason)
            if output == "flags":
                eb = pa.array([], type=pa.bool_())
                return pa.table({"doc_id": pa.array([], type=pa.int64()),
                                 "len_ok": eb, "wordlen_ok": eb,
                                 "alpha_ok": eb, "stop_ok": eb,
                                 "rep_ok": eb,
                                 "n_words": pa.array([], type=pa.int64())})
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "keep": empty_keep,
                             "fail_reason": empty_reason})
        words = pc.split_pattern(pc.fill_null(b[text_col].combine_chunks(), ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offsets = words.offsets.to_numpy()
        n_words = np.diff(offsets).astype(np.int64)
        flat = words.values
        doc_idx = np.repeat(np.arange(n), n_words)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        nonspace = np.bincount(doc_idx, weights=wlen, minlength=n).astype(np.int64)
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        )
        n_alpha = np.bincount(doc_idx[alpha], minlength=n).astype(np.int64)
        fw = flat.to_pandas()
        is_stop = fw.isin(stopwords).to_numpy()
        sdf = pd.DataFrame({"d": doc_idx[is_stop], "w": fw[is_stop]})
        n_stop = np.zeros(n, dtype=np.int64)
        if len(sdf):
            per = sdf.drop_duplicates().groupby("d").size()
            n_stop[per.index.to_numpy()] = per.to_numpy()
        codes, _ = pd.factorize(fw, sort=False)
        per_wc = pd.DataFrame({"d": doc_idx, "c": codes}).groupby(
            ["d", "c"], sort=False
        ).size().groupby(level=0).max()
        top_word = np.zeros(n, dtype=np.int64)
        top_word[per_wc.index.to_numpy()] = per_wc.to_numpy()

        if output == "flags":
            return pa.table({
                "doc_id": pa.array(b[id_col].to_numpy().astype(np.int64)),
                "len_ok": pa.array((n_words >= min_words)
                                   & (n_words <= max_words)),
                "wordlen_ok": pa.array((nonspace >= 3 * n_words)
                                       & (nonspace <= 10 * n_words)),
                "alpha_ok": pa.array(5 * n_alpha >= 4 * n_words),
                "stop_ok": pa.array(n_stop >= min_stop),
                "rep_ok": pa.array(5 * top_word <= n_words),
                "n_words": pa.array(n_words),
            })
        reason = np.full(n, None, dtype=object)
        checks = [
            ("too_few_words", n_words < min_words),
            ("too_many_words", n_words > max_words),
            ("word_length", (nonspace < 3 * n_words) | (nonspace > 10 * n_words)),
            ("non_alpha", 5 * n_alpha < 4 * n_words),
            ("stopwords", n_stop < min_stop),
            ("repetition", 5 * top_word > n_words),
        ]
        for name, bad in checks:
            hit = bad & (reason == None)  # noqa: E711 - elementwise
            reason[hit] = name
        keep_arr = pa.array(reason == None)  # noqa: E711
        reason_arr = pa.array(reason, type=pa.string())
        if output == "annotate":
            return b.append_column("keep", keep_arr).append_column(
                "fail_reason", reason_arr)
        return pa.table({
            "doc_id": pa.array(b[id_col].to_numpy().astype(np.int64)),
            "keep": keep_arr,
            "fail_reason": reason_arr,
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing)
# ---------------------------------------------------------------------------


_WINNOW_BASE = np.uint64(0x100000001B3)  # FNV64 prime as the poly base
_WINNOW_MASK = np.uint64((1 << 62) - 1)  # keep int64-positive


def winnow_fingerprints(text: str, *, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD'03): rolling k-gram polynomial
    hashes over the UTF-8 bytes, minimum per sliding window,
    deduplicated.  Fully vectorized (k shift-multiply passes over one
    byte array — no Python per gram). Deterministic across processes."""
    s = (text or "").encode("utf-8")
    if len(s) < k:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    with np.errstate(over="ignore"):
        grams = b[:n] + np.uint64(1)
        for j in range(1, k):
            grams = grams * _WINNOW_BASE + b[j : n + j]
    grams = (grams & _WINNOW_MASK).astype(np.int64)
    if len(grams) <= window:
        return np.unique(grams[[int(np.argmin(grams))]])
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(grams, window).min(axis=1)
    return np.unique(mins)


def fingerprints(ds, *, text_col: str = "text", k: int = 8, window: int = 16):
    """Adds ``fp_min`` (the smallest winnow fingerprint, an int64 doc
    sketch) and ``fp_count`` (number of distinct window minima)."""

    def f(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        n = len(texts)
        fmin = np.zeros(n, dtype=np.int64)
        fcnt = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            fp = winnow_fingerprints(t or "", k=k, window=window)
            fcnt[i] = len(fp)
            fmin[i] = int(fp.min()) if len(fp) else -1
        return b.append_column("fp_min", pa.array(fmin)).append_column(
            "fp_count", pa.array(fcnt)
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True)


def unigram_logloss(ds, *, min_ppm: int = 1000, id_col: str = "doc_id",
                    text_col: str = "text", sketch_size: int = 4096,
                    num_buckets: int = 16,
                    passthrough: tuple = ()):
    """CCNet-style LM quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359 scores pages with a pretrained KenLM; here the
    unigram LM is trained on the corpus itself in the same job, which
    keeps the operator self-contained and the oracle exact): per-doc
    mean negative log-likelihood under an add-one-smoothed unigram model
    whose vocabulary is the corpus's EXACT heavy hitters (count >=
    ``min_ppm`` ppm of all tokens).  In-vocab token probability is
    (c+1)/(N+V+1); out-of-vocabulary tokens share the unseen mass
    1/(N+V+1), with N = corpus token count, V = vocabulary size.

    Scale shape: vocabulary selection reuses the sketch-bounded two-pass
    ``heavy_hitters`` (no full-vocabulary shuffle; N rides along free),
    the (word, log-prob) table is bounded by 1e6/min_ppm entries and is
    ``ray.put`` ONCE, and scoring is a single map-only pass (hash-table
    token lookup + per-doc ``reduceat``) — no shuffle at all.

    Returns (id_col, n_tokens, logloss); every doc scores (empty/null
    text tokenizes to the single token '').  ``passthrough`` names extra
    input columns to carry into the output unchanged (e.g. ``lang`` for
    per-language bucketing downstream).
    """
    import pandas as pd
    import ray

    from deduplicator_ray.stages.freq import heavy_hitters

    vocab_ds, n_total = heavy_hitters(
        ds, min_ppm=min_ppm, sketch_size=sketch_size,
        num_buckets=num_buckets, text_col=text_col, return_total=True,
    )
    vdf = vocab_ds.to_pandas()
    if vdf.empty:  # empty vocab loses its schema through to_pandas()
        import pandas as _pd

        vdf = _pd.DataFrame({"word": _pd.Series([], dtype=object),
                             "n": _pd.Series([], dtype="int64")})
    V = len(vdf)
    denom = float(n_total + V + 1)
    vocab_idx = pd.Index(vdf["word"].to_numpy(object))
    logp = np.log((vdf["n"].to_numpy(np.int64) + 1.0) / denom)
    log_oov = float(np.log(1.0 / denom))
    ref = ray.put((vocab_idx, logp))

    def score(b: pa.Table) -> pa.Table:
        vocab, lp_vocab = ray.get(ref)
        text = pc.coalesce(b[text_col], pa.scalar("", b[text_col].type))
        lists = pc.split_pattern(text, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy()
        offsets = offsets - offsets[0]  # flatten() is slice-relative
        lens = np.diff(offsets).astype(np.int64)
        toks = lists.flatten().to_pandas().to_numpy(object)
        if len(toks) and len(vocab):
            hit = vocab.get_indexer(toks)  # hash lookup, -1 = OOV
            lp = np.where(hit >= 0, lp_vocab[np.maximum(hit, 0)], log_oov)
        else:
            lp = np.full(len(toks), log_oov)
        # every doc has >= 1 token, so reduceat sees no empty segments
        sums = (np.add.reduceat(lp, offsets[:-1])
                if len(toks) else np.zeros(0))
        cols = {
            id_col: b[id_col],
            "n_tokens": pa.array(lens),
            "logloss": pa.array((-sums / lens).astype(np.float64)),
        }
        for c in passthrough:
            cols[c] = b[c]
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ccnet_buckets(ds, *, min_ppm: int = 1000, id_col: str = "doc_id",
                  text_col: str = "text", lang_col: str = "lang",
                  quant: int = 1000, sketch_size: int = 4096,
                  num_buckets: int = 16):
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §4.4: pages are split per language into three
    equal-mass buckets by LM perplexity; 'head' is the most fluent
    third).  Scores come from :func:`unigram_logloss` (the same
    corpus-trained add-one unigram model), quantized to integer
    milli-nats ``llm = floor(logloss * quant + 0.5)`` so the bucket
    boundary is integer-exact and SQL-mirrorable.

    Boundary semantics (exactly what the DuckDB oracle computes): per
    language with n docs, ``cut1`` is the smallest llm whose running
    count reaches ceil(n/3) (``3*cc >= n`` over the per-llm histogram)
    and ``cut2`` the smallest reaching ceil(2n/3); a doc is 'head' if
    ``llm <= cut1``, 'middle' if ``llm <= cut2``, else 'tail' — ties on
    the quantized score all land in the lower bucket (threshold
    semantics, like CCNet's percentile cutoffs, NOT NTILE row-splitting,
    which would need a doc-level total order).

    Scale shape: scoring is the map-only logloss pass; the cutoff pass
    shuffles only the per-(lang, llm) HISTOGRAM — bounded by languages x
    distinct quantized scores (~15k values for logloss in [0, 15] nats at
    quant=1000) regardless of corpus size — and the driver reduces it;
    assignment is a second map over the materialized (id, lang, llm)
    projection with the tiny cutoff table broadcast once.

    Returns (id_col, lang, llm BIGINT, bucket in {'head','middle','tail'}).
    """
    import pandas as pd
    import ray

    scored = unigram_logloss(
        ds, min_ppm=min_ppm, id_col=id_col, text_col=text_col,
        sketch_size=sketch_size, num_buckets=num_buckets,
        passthrough=(lang_col,),
    )

    def to_llm(b: pa.Table) -> pa.Table:
        ll = np.asarray(b["logloss"], dtype=np.float64)
        llm = np.floor(ll * quant + 0.5).astype(np.int64)
        return pa.table({id_col: b[id_col], lang_col: b[lang_col],
                         "llm": pa.array(llm)})

    # materialized: consumed twice (histogram pass + assignment pass);
    # 3 narrow columns, never the text
    proj = scored.map_batches(to_llm, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def hist_partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({lang_col: b[lang_col].to_pandas(),
                           "llm": np.asarray(b["llm"], dtype=np.int64)})
        out = df.groupby([lang_col, "llm"], sort=False).size()
        return out.rename("c").reset_index()

    hist = (proj.map_batches(hist_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .to_pandas()
            .groupby([lang_col, "llm"], as_index=False)["c"].sum()
            .sort_values([lang_col, "llm"], kind="mergesort"))
    cuts: dict = {}
    for lang, g in hist.groupby(lang_col, sort=False):
        cc = g["c"].to_numpy(np.int64).cumsum()
        n = int(cc[-1])
        vals = g["llm"].to_numpy(np.int64)
        cut1 = int(vals[np.searchsorted(3 * cc, n, side="left")])
        cut2 = int(vals[np.searchsorted(3 * cc, 2 * n, side="left")])
        cuts[lang] = (cut1, cut2)
    ref = ray.put(cuts)

    def assign(b: pa.Table) -> pa.Table:
        table = ray.get(ref)
        langs = b[lang_col].to_pandas()
        llm = np.asarray(b["llm"], dtype=np.int64)
        # vectorized lookup: one factorize pass + two integer takes
        # (the per-row dict .map(lambda) was the batch's only Python loop)
        codes, uniq = pd.factorize(langs)
        cut1 = np.array([table[u][0] for u in uniq], dtype=np.int64)
        cut2 = np.array([table[u][1] for u in uniq], dtype=np.int64)
        c1 = cut1[codes]
        c2 = cut2[codes]
        bucket = np.where(llm <= c1, "head",
                          np.where(llm <= c2, "middle", "tail"))
        return pa.table({id_col: b[id_col], lang_col: b[lang_col],
                         "llm": b["llm"],
                         "bucket": pa.array(bucket, type=pa.string())})

    return proj.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True)


def bigram_logloss(ds, *, min_ppm: int = 1000, id_col: str = "doc_id",
                   text_col: str = "text", sketch_size: int = 4096,
                   num_buckets: int = 16):
    """Bigram LM quality scoring — ``unigram_logloss``'s context-aware
    sibling (CCNet, Wenzek et al. 2020, arXiv:1911.00359 uses a 5-gram
    KenLM; a corpus-trained bigram is the first rung of that ladder and
    keeps the oracle exact): per-doc mean -ln P(w_i | w_{i-1}) under an
    add-one-smoothed bigram model over the vocabulary-mapped token
    stream.  Tokens outside the exact heavy-hitter vocabulary (count >=
    ``min_ppm`` ppm) collapse to a single OOV symbol BEFORE the bigram
    counts, so the model's state space is (V+1)^2 regardless of corpus
    size.  P(v | u) = (C(u,v) + 1) / (C(u,.) + V + 1); the model is
    trained on the corpus being scored, so every scored bigram has an
    observed count.

    Scale shape: vocabulary rides the sketch-bounded ``heavy_hitters``
    pass; bigram counts partial-combine inside each block (at most
    min(block_bigrams, (V+1)^2) rows leave any block) and the summed
    table — bounded by (V+1)^2, in practice its sparse support — is
    ``ray.put`` ONCE as (sorted code, log-prob) arrays; scoring is one
    map-only pass (searchsorted lookup + per-doc ``reduceat``).

    Returns (id_col, n_bigrams, logloss); docs with < 2 tokens score
    NULL (they have no bigram to predict).
    """
    import pandas as pd
    import ray

    from deduplicator_ray.stages.freq import heavy_hitters

    vocab_ds, _n_total = heavy_hitters(
        ds, min_ppm=min_ppm, sketch_size=sketch_size,
        num_buckets=num_buckets, text_col=text_col, return_total=True,
    )
    vdf = vocab_ds.to_pandas()
    if vdf.empty:  # empty vocab loses its schema through to_pandas()
        import pandas as _pd

        vdf = _pd.DataFrame({"word": _pd.Series([], dtype=object),
                             "n": _pd.Series([], dtype="int64")})
    V = len(vdf)
    vocab_idx = pd.Index(vdf["word"].to_numpy(object))
    width = np.uint64(V + 1)  # mapped-id range: 0..V-1 vocab, V = OOV
    vref = ray.put(vocab_idx)

    def _codes(b: pa.Table):
        """Per-batch mapped bigram codes u*(V+1)+v and per-doc bigram
        counts, excluding cross-doc positions."""
        vocab = ray.get(vref)
        text = pc.coalesce(b[text_col], pa.scalar("", b[text_col].type))
        lists = pc.split_pattern(text, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy()
        offsets = offsets - offsets[0]  # flatten() is slice-relative
        lens = np.diff(offsets).astype(np.int64)
        toks = lists.flatten().to_pandas().to_numpy(object)
        if len(toks) and V:
            ids = vocab.get_indexer(toks).astype(np.int64)
            ids[ids < 0] = V
        else:
            ids = np.full(len(toks), V, dtype=np.int64)
        ids = ids.astype(np.uint64)
        # every doc has >= 1 token, so position i pairs with i+1 unless
        # i+1 starts the next doc
        valid = np.ones(max(len(toks) - 1, 0), dtype=bool)
        valid[offsets[1:-1] - 1] = False  # last token of each doc
        with np.errstate(over="ignore"):
            codes = (ids[:-1] * width + ids[1:])[valid]
        n_big = np.maximum(lens - 1, 0)
        return codes, n_big

    def count_pass(b: pa.Table) -> pa.Table:
        codes, _ = _codes(b)
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(u, pa.uint64()),
                         "c": pa.array(c.astype(np.int64))})

    cdf = ds.map_batches(count_pass, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if cdf.empty:  # no doc has 2 tokens; empty to_pandas drops schema
        cdf = pd.DataFrame({"code": pd.Series([], dtype="uint64"),
                            "c": pd.Series([], dtype="int64")})
    cnt = cdf.groupby("code", sort=True)["c"].sum()
    codes_sorted = cnt.index.to_numpy(np.uint64)
    c_arr = cnt.to_numpy(np.int64)
    # context marginals C(u,.) over the same mapped stream
    cu = np.zeros(V + 1, dtype=np.int64)
    np.add.at(cu, (codes_sorted // width).astype(np.int64), c_arr)
    logp = np.log((c_arr + 1.0) / (cu[(codes_sorted // width).astype(np.int64)]
                                   + float(V + 1)))
    pref = ray.put((codes_sorted, logp))

    def score(b: pa.Table) -> pa.Table:
        table, lp = ray.get(pref)
        codes, n_big = _codes(b)
        if len(codes):
            # trained on this corpus: every scored code is in the table
            lpv = lp[np.searchsorted(table, codes)]
        else:
            lpv = np.zeros(0)
        boundaries = np.concatenate(([0], np.cumsum(n_big)))[:-1]
        has = n_big > 0
        means = np.full(len(n_big), np.nan)
        if len(lpv):
            sums = np.add.reduceat(lpv, np.minimum(boundaries, len(lpv) - 1))
            means[has] = -sums[has] / n_big[has]
        return pa.table({
            id_col: b[id_col],
            "n_bigrams": pa.array(n_big),
            "logloss": pa.array(means, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def compression_stats(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      level: int = 6):
    """Per-doc gzip-compressibility -> Dataset (doc_id, n_chars BIGINT,
    n_gzip BIGINT, ratio_ppm BIGINT): DEFLATE size of the utf-8 text and
    the compressed/raw ratio in ppm — the classic boilerplate/spam
    signal (highly repetitive pages compress far below prose; cf. the
    compression-ratio filters in public web-corpus pipelines).  Map-only
    zero shuffle; zlib does the per-row work in C so the Python loop is
    call overhead only, not the hot path.  Deterministic given the zlib
    build, so the driver check is a golden pin, not a recomputation
    (tools/pin_golden.py).
    """
    import zlib

    import pyarrow as pa
    import pyarrow.compute as pc

    def kern(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b[text_col], "").to_pylist()
        ngz = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), level)) for t in texts),
            dtype=np.int64, count=len(texts))
        nch = pc.cast(pc.utf8_length(pc.fill_null(b[text_col], "")),
                      pa.int64()).to_numpy(zero_copy_only=False)
        ratio = np.where(nch > 0, (ngz * 1_000_000) // np.maximum(nch, 1),
                         0).astype(np.int64)
        return pa.table({
            "doc_id": b[id_col].cast(pa.int64()),
            "n_chars": pa.array(nch),
            "n_gzip": pa.array(ngz),
            "ratio_ppm": pa.array(ratio),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def dsir_logratio(raw_ds, target_ds, *, min_ppm: int = 1000,
                  id_col: str = "doc_id", text_col: str = "text",
                  sketch_size: int = 4096, num_buckets: int = 16):
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169
    "Data Selection for Language Models via Importance Resampling"):
    per RAW doc, the mean per-token log-ratio of target-domain vs
    raw-corpus unigram likelihood — positive means the doc reads more
    target-like than the raw average, the score DSIR resamples on.

    DSIR proper hashes n-grams into buckets; here the feature is the
    exact word over a shared heavy-hitter vocabulary (a perfect hash at
    this vocabulary size — the estimator is the same and the DuckDB
    oracle stays an exact recomputation).  Vocabulary: heavy hitters
    of the RAW corpus (the big side, where ppm bounding is meaningful);
    both models add-one-smooth over it: p_side(w) = (c_side(w) + 1) /
    (N_side + V + 1), OOV words share each side's unseen mass, so an
    OOV token contributes the constant ln((N_raw+V+1)/(N_tgt+V+1)).

    Scale shape: vocab via the sketch-bounded two-pass heavy_hitters
    (no full-vocab shuffle), ONE bounded map pass over the target
    corpus (per-batch vocab-hit bincount partials, V+1 ints to the
    driver), both log-prob tables ``ray.put`` once, then a single
    map-only scoring pass over the raw corpus.  No shuffle anywhere.

    Returns (id_col, n_tokens BIGINT, logratio_micro BIGINT — the\n    mean log-ratio in integer micros) per raw doc.
    """
    import pandas as pd
    import ray

    from deduplicator_ray.stages.freq import heavy_hitters

    vocab_ds, n_raw = heavy_hitters(
        raw_ds, min_ppm=min_ppm, sketch_size=sketch_size,
        num_buckets=num_buckets, text_col=text_col, return_total=True,
    )
    vdf = vocab_ds.to_pandas()
    if vdf.empty:  # empty vocab loses its schema through to_pandas()
        vdf = pd.DataFrame({"word": pd.Series([], dtype=object),
                            "n": pd.Series([], dtype="int64")})
    V = len(vdf)
    vocab_idx = pd.Index(vdf["word"].to_numpy(object))
    vref = ray.put(vocab_idx)

    def _tokens(b: pa.Table):
        text = pc.coalesce(b[text_col], pa.scalar("", b[text_col].type))
        lists = pc.split_pattern(text, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy()
        offsets = offsets - offsets[0]
        return lists.flatten().to_pandas().to_numpy(object), offsets

    def tcount(b: pa.Table) -> pa.Table:
        vocab = ray.get(vref)
        toks, _ = _tokens(b)
        if len(toks) and len(vocab):
            hit = vocab.get_indexer(toks)
            c = np.bincount(hit[hit >= 0], minlength=len(vocab)).astype(np.int64)
        else:
            c = np.zeros(len(vocab), dtype=np.int64)
        # i == V carries this batch's total token count (N_target partial)
        return pa.table({"i": pa.array(np.arange(len(vocab) + 1, dtype=np.int64)),
                         "c": pa.array(np.append(c, len(toks)))})

    tc = (target_ds.map_batches(tcount, batch_format="pyarrow",
                                zero_copy_batch=True)
          .to_pandas().groupby("i")["c"].sum())
    c_t = np.zeros(V, dtype=np.int64)
    got = tc.reindex(range(V)).fillna(0).to_numpy(np.int64)
    c_t[:len(got)] = got
    n_tgt = int(tc.get(V, 0))

    denom_r = float(n_raw + V + 1)
    denom_t = float(n_tgt + V + 1)
    lp_diff = (np.log((c_t + 1.0) / denom_t)
               - np.log((vdf["n"].to_numpy(np.int64) + 1.0) / denom_r))
    oov_diff = float(np.log(1.0 / denom_t) - np.log(1.0 / denom_r))
    ref = ray.put((vocab_idx, lp_diff))

    def score(b: pa.Table) -> pa.Table:
        vocab, diffs = ray.get(ref)
        toks, offsets = _tokens(b)
        lens = np.diff(offsets).astype(np.int64)
        if len(toks) and len(vocab):
            hit = vocab.get_indexer(toks)
            d = np.where(hit >= 0, diffs[np.maximum(hit, 0)], oov_diff)
        else:
            d = np.full(len(toks), oov_diff)
        sums = (np.add.reduceat(d, offsets[:-1])
                if len(toks) else np.zeros(0))
        # integer micros, half-up via floor(x*1e6 + 0.5): the two engines'
        # avg() summation orders differ in the last ulp, so the raw
        # double cannot be value-hash-compared — micros can
        ratio = sums / lens
        micro = np.floor(ratio * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pa.array(lens),
            "logratio_micro": pa.array(micro),
        })

    return raw_ds.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)


def ttr_stats(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document type-token ratio -> Dataset (id_col, n_tokens,
    n_types, ttr_ppm — all BIGINT): lexical-diversity signal (distinct
    whitespace tokens / total tokens, integer ppm) — the cheap
    repetitiveness read a quality filter takes alongside gopher_filter's
    stopword/punct ratios (machine-generated and keyword-stuffed pages
    sit at the ttr extremes).

    Map-only, ZERO shuffle: types are counted per doc inside the block
    via 64-bit token hashes (same siphash identity contract as
    freq.freq_spectrum — a collision undercounts one type).  Null text
    tokenizes to the single token '' (split semantics), so n_tokens >= 1
    and the ppm division is total.
    """
    def f(b: pa.Table) -> pa.Table:
        import pandas as pd

        text = pc.coalesce(b[text_col], pa.scalar("", b[text_col].type))
        lists = pc.split_pattern(text, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy()
        lens = np.diff(offs).astype(np.int64)
        toks = lists.flatten().to_pandas().to_numpy(object)
        h = pd.util.hash_array(toks).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(lens):
            types = (pd.DataFrame({"d": doc_idx, "h": h})
                     .groupby("d")["h"].nunique()
                     .to_numpy(np.int64))  # every doc has >= 1 token
        else:
            types = np.zeros(0, dtype=np.int64)
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pa.array(lens),
            "n_types": pa.array(types),
            "ttr_ppm": pa.array(types * 1_000_000 // lens),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# unicode-script census (multilingual routing / mixed-script anomaly)
# ---------------------------------------------------------------------------

SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", r"\p{Latin}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("han", r"\p{Han}"),
    ("arabic", r"\p{Arabic}"),
)


def script_counts(ds, *, id_col: str = "doc_id", lang_col: str | None = "lang",
                  text_col: str = "text"):
    """Per-document unicode-script census -> (id_col, [lang], n_latin,
    n_cyrillic, n_han, n_arabic, n_digits, n_letters, is_mixed): the
    routing signal a multilingual pipeline reads before tokenizer /
    lang-model choice, and the mixed-script anomaly flag spam and
    encoding-mojibake detectors key on.

    ``is_mixed``: non-dominant script mass (total of the four classes
    minus the largest) is >= 10% of all letters AND >= 5 chars — an
    integer rule (10*nondom >= n_letters) so the DuckDB oracle matches
    exactly.  Map-only, zero shuffle; RE2 unicode-script classes
    (\\p{Latin}...) evaluate identically in pyarrow and DuckDB."""

    def f(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")

        def cnt(pat: str) -> np.ndarray:
            return (pc.count_substring_regex(t, pat)
                    .to_numpy(zero_copy_only=False).astype(np.int64))

        cols: dict = {id_col: b[id_col]}
        if lang_col:
            cols[lang_col] = b[lang_col]
        per = np.column_stack([cnt(p) for _, p in SCRIPT_CLASSES]) \
            if b.num_rows else np.zeros((0, len(SCRIPT_CLASSES)), np.int64)
        n_letters = cnt(r"\p{L}")
        nondom = per.sum(axis=1) - (per.max(axis=1) if b.num_rows
                                    else np.zeros(0, np.int64))
        for (name, _), j in zip(SCRIPT_CLASSES, range(per.shape[1])):
            cols[f"n_{name}"] = pa.array(per[:, j])
        cols["n_digits"] = pa.array(cnt(r"\p{Nd}"))
        cols["n_letters"] = pa.array(n_letters)
        cols["is_mixed"] = pa.array((10 * nondom >= n_letters) & (nondom >= 5))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096,
                          zero_copy_batch=True)


def winnow_pairs(ds, *, k: int = 8, window: int = 16, min_shared: int = 3,
                 max_df: int = 50, id_col: str = "doc_id",
                 text_col: str = "text", num_partitions: int = 32):
    """MOSS-style LOCAL-similarity pairs (Schleimer et al., SIGMOD'03):
    documents sharing >= ``min_shared`` winnow fingerprints -> (doc_a,
    doc_b, n_shared).  Winnowing guarantees any shared run of >=
    window + k - 1 bytes leaves at least one common fingerprint, so a
    lifted PARAGRAPH surfaces even when whole-doc Jaccard/minhash is
    far below any global threshold — the plagiarism/quote complement to
    the global near-dup family.

    Fingerprints with document frequency > ``max_df`` are dropped on
    both sides of every comparison (standard MOSS practice: ubiquitous
    boilerplate carries no locality signal) — this also bounds every
    fingerprint group, so pair fan-out per group is <= max_df^2 and the
    shuffles stay balanced by construction.  Exactness modulo that df
    cap; the pytest oracle recomputes |fp(A) ∩ fp(B)| brute-force with
    the same cap.

    Shape: explode (16-byte fp rows) -> fp-keyed hash-bucket shuffle ->
    in-bucket vectorized pair fan-out with per-bucket partial counts ->
    pair-keyed hash-bucket sum.  Text never rides a shuffle."""
    import pandas as pd

    from deduplicator_ray.stages.exact import hash_bucket
    from deduplicator_ray.util import auto_partitions

    P = num_partitions or auto_partitions()

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b[text_col].to_pylist()
        fps, docs = [], []
        for i, t in enumerate(texts):
            fp = winnow_fingerprints(t or "", k=k, window=window)
            if len(fp):
                fps.append(fp)
                docs.append(np.full(len(fp), ids[i], dtype=np.int64))
        if not fps:
            return pa.table({"fp": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64())})
        return pa.table({"fp": np.concatenate(fps),
                         "doc": np.concatenate(docs)})

    rows = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=1024,
        zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fp", "doc"], kind="mergesort",
                            ignore_index=True)
        # df cap: drop ubiquitous fingerprints BEFORE fan-out
        sizes = df.groupby("fp")["doc"].transform("size")
        df = df[sizes <= max_df]
        if df.empty:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        f = df["fp"].to_numpy()
        d = df["doc"].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], f[1:] != f[:-1])))
        lens = np.diff(np.append(starts, len(f)))
        out_a, out_b = [], []
        for s, L in zip(starts, lens):           # L <= max_df by the cap
            if L < 2:
                continue
            g = d[s: s + L]
            ii, jj = np.triu_indices(L, 1)
            out_a.append(g[ii])
            out_b.append(g[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return (pd.DataFrame({"a": lo, "b": hi})
                .groupby(["a", "b"], as_index=False).size()
                .rename(columns={"size": "n"}))

    partials = (hash_bucket(rows, "fp", P)
                .groupby("_part")
                .map_groups(lambda g: bucket_pairs(g.drop(columns=["_part"])),
                            batch_format="pandas"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], as_index=False)["n"].sum()
        out = out[out["n"] >= min_shared]
        return pd.DataFrame({"doc_a": out["a"].astype("int64"),
                             "doc_b": out["b"].astype("int64"),
                             "n_shared": out["n"].astype("int64")})

    return (hash_bucket(partials, "a", P)
            .groupby("_part")
            .map_groups(lambda g: final(g.drop(columns=["_part"])),
                        batch_format="pandas"))
