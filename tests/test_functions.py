"""Unit tests for the pure function layer (SURVEY.md §5 item 1)."""

from __future__ import annotations

import duckdb
import pytest

from deduplicator_ray.functions.canonical import (
    canonical_sql_expr,
    canonicalize,
    canonicalize_arrow,
    canonicalize_many,
)
from deduplicator_ray.functions.digesting import (
    md5_hex,
    sha1_base32,
    sha1_base32_many,
    strip_scheme,
)
from deduplicator_ray.functions.timestamps import (
    format_bytes,
    get_percentage,
    heritrix17_to_iso,
    iso_to_datetime,
)

URLS = [
    "http://www.Example.COM/Path/",
    "https://www2.example.com:80/a/b?phpsessid=abc123&x=1",
    "http://example.com/a;jsessionid=deadbeef?x=1",
    "http://example.com/?sid=42",
    "http://example.com/p?a=1&sid=9&b=2",
    "http://example.com/p?classid=5",  # must NOT be stripped
    "http://sub.example.com:80",
    "example.com/no/scheme/",
    None,
]


class TestCanonicalize:
    def test_rules(self):
        assert canonicalize("http://www.Example.COM/Path/") == "example.com/path"
        assert (
            canonicalize("https://www2.example.com:80/a/b?phpsessid=abc&x=1")
            == "example.com/a/b?x=1"
        )
        assert canonicalize("http://example.com/a;jsessionid=dead?x=1") == "example.com/a?x=1"
        assert canonicalize("http://example.com/?sid=42") == "example.com"
        assert canonicalize("http://example.com/p?a=1&sid=9&b=2") == "example.com/p?a=1&b=2"
        assert canonicalize("http://example.com/p?classid=5") == "example.com/p?classid=5"
        assert canonicalize("http://sub.example.com:80") == "sub.example.com"
        assert canonicalize(None) is None

    def test_idempotent(self):
        for u in URLS:
            c = canonicalize(u)
            assert canonicalize(c) == c

    def test_many_matches_scalar(self):
        assert canonicalize_many(URLS) == [canonicalize(u) for u in URLS]

    def test_arrow_kernel_matches_scalar(self):
        """The vectorized RE2 kernel chain (the hot-path implementation)
        must agree value-for-value with the Python reference impl."""
        import pyarrow as pa

        got = canonicalize_arrow(pa.array(URLS, type=pa.string())).to_pylist()
        assert got == [canonicalize(u) for u in URLS]
        # chunked arrays too (what map_batches actually hands over)
        chunked = pa.chunked_array([URLS[:4], URLS[4:]], type=pa.string())
        assert canonicalize_arrow(chunked).to_pylist() == got

    def test_sql_mirror_matches_python(self):
        """The DuckDB expression must agree value-for-value with Python —
        this is what makes the oracle queries trustworthy."""
        con = duckdb.connect()
        expr = canonical_sql_expr("u")
        got = con.execute(
            f"SELECT {expr} FROM (SELECT unnest(?::VARCHAR[]) AS u)",
            [[u for u in URLS if u is not None]],
        ).fetchall()
        want = [canonicalize(u) for u in URLS if u is not None]
        assert [g[0] for g in got] == want


class TestDigest:
    def test_sha1_base32_known_vector(self):
        # sha1("") = da39a3ee5e6b4b0d3255bfef95601890afd80709
        # base32 of those 20 bytes:
        assert sha1_base32(b"") == "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"
        assert sha1_base32(b"", with_scheme=True) == "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"
        assert len(sha1_base32(b"abc")) == 32

    def test_strip_scheme_last_colon(self):
        # IndexBuilder.java:203-207 uses lastIndexOf(':')
        assert strip_scheme("sha1:ABC") == "ABC"
        assert strip_scheme("x:y:ABC") == "ABC"
        assert strip_scheme("ABC") == "ABC"
        assert strip_scheme(None) is None

    def test_many(self):
        ps = [b"", b"abc", None]
        assert sha1_base32_many(ps) == [sha1_base32(p) for p in ps]

    def test_md5_matches_duckdb(self):
        con = duckdb.connect()
        for s in ["", "hello", "ünïcødé"]:
            assert md5_hex(s) == con.execute("select md5(?)", [s]).fetchone()[0]


class TestTimestamps:
    def test_heritrix17(self):
        # CrawlLogIterator.java:182-189 semantics
        assert heritrix17_to_iso("20130522141637177+564") == "2013-05-22T14:16:37Z"
        assert heritrix17_to_iso("20130522141637177") == "2013-05-22T14:16:37Z"
        assert heritrix17_to_iso("garbage") is None
        assert heritrix17_to_iso(None) is None

    def test_iso_roundtrip(self):
        d = iso_to_datetime("2013-05-22T14:16:37Z")
        assert d is not None and d.year == 2013 and d.tzinfo is None

    def test_get_percentage(self):
        # DeDuplicatorTest.java:7-9 golden assertion, ported
        assert get_percentage(5, 200) == "2.5%"
        assert get_percentage(0, 0) == "0.0%"

    def test_format_bytes(self):
        assert format_bytes(512) == "512 B"
        assert format_bytes(2048) == "2.0 KiB"


class TestTextNorm:
    """functions/textnorm.py: the Arrow kernel and the DuckDB SQL mirror
    must agree byte-for-byte (the dedup_exact_norm oracle rides on it)."""

    CASES = [
        "Hello,  WORLD!!",
        "café vs café",          # NFC é vs NFD e+combining
        "“curly” — quotes… and (parens)",
        "tabs\tand\nnewlines  collapse",
        "under_score 123 stays-ish",
        "", "   leading and trailing   ",
        "naïve NAÏVE ümlaut ÜMLAUT ß ł",
        "中文，测试。mixed ENGLISH！",
        "русский, Текст! $5 + €3 = …",
        "a nbsp stays",            # NBSP: not \s on either engine
    ]

    def _duck(self, cases, **kw):
        import duckdb

        from deduplicator_ray.functions.textnorm import textnorm_sql_expr

        con = duckdb.connect()
        expr = textnorm_sql_expr("s", **kw)
        return [con.execute(f"select {expr} from (select ? as s)", [c]).fetchone()[0]
                for c in cases]

    def test_lockstep_battery(self):
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import normalize_text_arrow

        got = normalize_text_arrow(pa.array(self.CASES, type=pa.string())).to_pylist()
        want = self._duck(self.CASES)
        assert got == want

    def test_lockstep_each_rule_alone(self):
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import normalize_text_arrow

        for rule in ["fold_accents", "lower", "strip_punct", "collapse_ws"]:
            kw = {k: False for k in
                  ["fold_accents", "lower", "strip_punct", "collapse_ws"]}
            kw[rule] = True
            got = normalize_text_arrow(pa.array(self.CASES, type=pa.string()),
                                       **kw).to_pylist()
            assert got == self._duck(self.CASES, **kw), rule

    def test_lockstep_random_unicode(self):
        import random

        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import normalize_text_arrow

        rng = random.Random(42)
        pool = ("abcXYZ 0123_-.,!?“”…éüłßﬁ中文русский\t\ń $€"
                "​ ")
        cases = ["".join(rng.choice(pool) for _ in range(rng.randint(0, 40)))
                 for _ in range(300)]
        got = normalize_text_arrow(pa.array(cases, type=pa.string())).to_pylist()
        assert got == self._duck(cases)

    def test_null_and_equivalence_classes(self):
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import normalize_text_arrow

        out = normalize_text_arrow(pa.array([None, "A  b!", "a b"])).to_pylist()
        assert out[0] is None
        assert out[1] == out[2] == "a b"   # the dedup-key collapse


class TestNfcArrow:
    """functions/textnorm.py::nfc_arrow -- real NFC recomposition (pyarrow
    16.1's utf8_normalize cannot recompose), DuckDB mirror nfc_normalize."""

    def test_recomposes_and_matches_duckdb(self):
        import duckdb
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import nfc_arrow

        cases = ["plain ascii", "xe\u0301", "cafe\u0301", "", None,
                 "mixed \u00e9 and e\u0301", "\u212b"]  # ANGSTROM SIGN
        got = nfc_arrow(pa.array(cases, type=pa.string())).to_pylist()
        con = duckdb.connect()
        want = [None if c is None else
                con.execute("select nfc_normalize(?)", [c]).fetchone()[0]
                for c in cases]
        assert got == want
        assert got[1] == "x\u00e9"            # recomposed to one codepoint
        assert got[6] == "\u00c5"             # ANGSTROM -> A WITH RING

    def test_ascii_fast_path_zero_copy(self):
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import nfc_arrow

        arr = pa.array(["abc", "def", None], type=pa.string())
        assert nfc_arrow(arr) is arr  # fast path: input array untouched

    def test_all_null_column(self):
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import nfc_arrow

        arr = pa.array([None, None], type=pa.string())
        assert nfc_arrow(arr).to_pylist() == [None, None]

    def test_chunked_input(self):
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import nfc_arrow

        ch = pa.chunked_array([pa.array(["xe\u0301"]), pa.array(["ok"])])
        assert nfc_arrow(ch).to_pylist() == ["x\u00e9", "ok"]


    def test_large_string_type_preserved(self):
        import pyarrow as pa

        from deduplicator_ray.functions.textnorm import nfc_arrow

        arr = pa.array(["xe\u0301", "plain"], type=pa.large_string())
        out = nfc_arrow(arr)
        assert out.type == pa.large_string()
        assert out.to_pylist() == ["x\u00e9", "plain"]
        fast = nfc_arrow(pa.array(["ascii"], type=pa.large_string()))
        assert fast.type == pa.large_string()


def test_isin_sorted_edges():
    """Shared broadcast-semi-join primitive: empty id set, empty batch,
    and beyond-max keys must all be safe (the clean_pipeline semantic
    stage hits the empty-want case when every doc was removed)."""
    import numpy as np

    from deduplicator_ray.util import isin_sorted

    want = np.array([2, 5, 9], dtype=np.int64)
    assert isin_sorted(want, np.array([1, 2, 9, 10])).tolist() == [
        False, True, True, False]
    assert isin_sorted(np.array([], dtype=np.int64),
                       np.array([1, 2])).tolist() == [False, False]
    assert isin_sorted(want, np.array([], dtype=np.int64)).tolist() == []
