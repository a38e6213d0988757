"""Content digests + digest-scheme handling (operators M6, and the digest
computation the reference delegates to Heritrix's FetchHTTP
``digestContent=sha1`` — profile-crawler-beans.cxml:257-258).

The reference carries digests as Base32(SHA-1) strings optionally prefixed
with a scheme, e.g. ``sha1:YA3G7O6TNMHXA5WWDSIZJDNXV56WDRCA``
(CrawlLogIteratorTest.java:37-38); ``IndexBuilder.java:203-207`` strips the
prefix up to the LAST ':' unless ``indexDigestScheme`` is set, and
``LuceneIndexSearcher.java:217-220`` picks which form to query.  We
reproduce exactly that: ``sha1_base32`` computes the canonical digest of the
raw ``html`` bytes; ``strip_scheme`` implements the last-colon rule.

``md5_hex`` exists only so oracle-checkable queries can use a digest DuckDB
also implements (DuckDB 1.0 has ``md5`` but no ``sha1``); the engine-native
digest is Base32(SHA-1) everywhere else.
"""

from __future__ import annotations

import base64
import hashlib
from collections.abc import Iterable

SCHEME_SHA1 = "sha1"


def sha1_base32(payload: bytes | None, *, with_scheme: bool = False) -> str | None:
    """Base32(SHA-1) digest of raw payload bytes, Heritrix-style."""
    if payload is None:
        return None
    d = base64.b32encode(hashlib.sha1(payload).digest()).decode("ascii")
    return f"{SCHEME_SHA1}:{d}" if with_scheme else d


def sha1_base32_many(payloads: Iterable[bytes | None], *, with_scheme: bool = False) -> list[str | None]:
    """Batch form for ``map_batches`` bodies (hashlib releases the GIL-heavy
    work to C; the Python loop is not the bottleneck)."""
    b32 = base64.b32encode
    sha1 = hashlib.sha1
    if with_scheme:
        return [
            None if p is None else SCHEME_SHA1 + ":" + b32(sha1(p).digest()).decode("ascii")
            for p in payloads
        ]
    return [None if p is None else b32(sha1(p).digest()).decode("ascii") for p in payloads]


def strip_scheme(digest: str | None) -> str | None:
    """Strip any ``algo:`` prefix up to the LAST ':', per
    IndexBuilder.java:203-207 (``lastIndexOf(':')``)."""
    if digest is None:
        return None
    i = digest.rfind(":")
    return digest[i + 1 :] if i >= 0 else digest


# vectorized twins of strip_scheme — ONE place owns the last-colon rule
# (greedy ^.*: == strip up to the LAST ':', matching lastIndexOf above)
_SCHEME_RE = r"^.*:"


def strip_scheme_arrow(col):
    """Arrow string array/chunked array -> scheme-stripped digests."""
    import pyarrow.compute as pc

    return pc.replace_substring_regex(col, _SCHEME_RE, "")


def strip_scheme_series(s):
    """pandas Series -> scheme-stripped digests."""
    return s.str.replace(_SCHEME_RE, "", regex=True)


def md5_hex(text: str | None) -> str | None:
    """Hex MD5 of a unicode string's UTF-8 bytes (oracle-parity digest;
    matches DuckDB ``md5(col)``)."""
    if text is None:
        return None
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def md5_hex_many(texts: Iterable[str | None]) -> list[str | None]:
    md5 = hashlib.md5
    return [None if t is None else md5(t.encode("utf-8")).hexdigest() for t in texts]
