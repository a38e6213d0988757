"""URL canonicalization (operator M5 in SURVEY.md §2.2).

The reference canonicalizes URLs with OpenWayback's
``AggressiveUrlCanonicalizer`` on BOTH the index-build side
(``IndexBuilder.java:194-199``) and the lookup side
(``DeDuplicator.java:158``); the two sides must agree byte-for-byte or the
``URL_CANONICAL`` strategy silently finds nothing.  We therefore define ONE
ordered rule list, applied identically everywhere, and additionally expose
the same rules as a DuckDB SQL expression (``canonical_sql_expr``) so the
driver's oracle can verify the Ray implementation value-for-value.

Rule set (a documented, deterministic subset of the wayback "aggressive"
rules — lowercase, scheme strip, ``www\\d*.`` strip, session-id stripping,
default-port strip, trailing-slash/query cleanup).  The rules use only
regex features shared by Python ``re`` and DuckDB's RE2 (no lookarounds, no
backreferences) so the SQL mirror is mechanical.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# Ordered (pattern, replacement) rules applied to the lowercased URL.
# Every regex must be valid in BOTH Python `re` and RE2 with identical
# semantics: character classes, alternation, non-capturing groups only.
_RULES: list[tuple[str, str]] = [
    (r"^https?://", ""),                       # strip scheme
    (r"^www[0-9]*\.", ""),                     # strip www / www2. host prefix
    (r";jsessionid=[0-9a-z]*", ""),            # strip path-parameter session id
    # strip common session-id query parameters (value included); anchored on
    # the '?' / '&' delimiter so e.g. 'classid=5' is never touched
    (
        r"\?(?:jsessionid|phpsessid|aspsessionid[0-9a-z]*|sessionid|cfid|cftoken|sid)=[^&]*",
        "?",
    ),
    (
        r"&(?:jsessionid|phpsessid|aspsessionid[0-9a-z]*|sessionid|cfid|cftoken|sid)=[^&]*",
        "",
    ),
    (r"\?&+", "?"),                            # cleanup: '?&&' -> '?'
    (r"&&+", "&"),                             # cleanup: duplicate '&'
    (r"[?&]+$", ""),                           # cleanup: trailing '?' / '&'
    (r":80/", "/"),                            # default http port, mid-url
    (r":80$", ""),                             # default http port, trailing
    (r"/$", ""),                               # trailing slash
]

_COMPILED: list[tuple[re.Pattern[str], str]] = [(re.compile(p), r) for p, r in _RULES]


def canonicalize(url: str | None) -> str | None:
    """Canonical form of ``url``; None-safe. Deterministic, pure."""
    if url is None:
        return None
    u = url.strip().lower()
    for pat, rep in _COMPILED:
        u = pat.sub(rep, u)
    return u


def canonicalize_many(urls: Iterable[str | None]) -> list[str | None]:
    """Vectorized-ish helper used inside ``map_batches`` bodies."""
    # Compiled patterns + a tight loop: regex work dominates, and Python-level
    # overhead here is small relative to the sub() calls themselves.
    out = []
    comp = _COMPILED
    for url in urls:
        if url is None:
            out.append(None)
            continue
        u = url.strip().lower()
        for pat, rep in comp:
            u = pat.sub(rep, u)
        out.append(u)
    return out


def canonicalize_arrow(arr):
    """Vectorized canonicalization of an Arrow string array/chunked array:
    the SAME ordered rule list as ``canonicalize``, run as chained RE2
    kernels (``pc.replace_substring_regex``) over the whole column — no
    Python per row.  Null-safe (Arrow kernels propagate nulls).

    The rules are deliberately RE2-compatible (no lookarounds / backrefs),
    so Python ``re``, DuckDB and Arrow RE2 agree byte-for-byte;
    tests/test_functions.py diffs this against ``canonicalize`` per-URL.
    """
    import pyarrow.compute as pc

    u = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    for pat, rep in _RULES:
        u = pc.replace_substring_regex(u, pat, rep)
    return u


def canonical_sql_expr(col: str) -> str:
    """DuckDB SQL expression computing exactly ``canonicalize(col)``.

    Used by the oracle queries so DuckDB verifies the Ray-side values.
    """
    expr = f"lower(trim({col}))"
    for pat, rep in _RULES:
        # Escape single quotes for SQL literals (none present today).
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


# ---------------------------------------------------------------------------
# pluggable canonicalizer registry (§2.10 extension surface) — the M5
# rules are the reference default; 'surt' keys pages the way the CDX
# index format does (functions/surt.py); register_canonicalizer admits
# user rules.  Each entry is (scalar_fn, arrow_fn, sql_expr_fn) kept in
# lockstep like the two built-ins.
# ---------------------------------------------------------------------------

_CANONICALIZERS: dict[str, tuple] = {
    "default": (canonicalize, canonicalize_arrow, canonical_sql_expr),
}


def register_canonicalizer(name: str, scalar_fn, arrow_fn, sql_expr_fn=None) -> None:
    _CANONICALIZERS[name] = (scalar_fn, arrow_fn, sql_expr_fn)


def get_canonicalizer(name: str) -> tuple:
    """-> (scalar_fn, arrow_fn, sql_expr_fn)."""
    if name not in _CANONICALIZERS and name == "surt":
        from deduplicator_ray.functions.surt import surt, surt_arrow, surt_sql_expr

        _CANONICALIZERS["surt"] = (surt, surt_arrow, surt_sql_expr)
    try:
        return _CANONICALIZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown canonicalizer {name!r}; registered: "
            f"{sorted(_CANONICALIZERS) + ['surt']}") from None
