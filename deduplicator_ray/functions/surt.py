"""SURT keys (Sort-friendly URI Reordering Transform).

The public web-archive index format (CDX, sources/cdx.py) keys every
capture by its SURT form so one site's pages sort together:

    https://www.site3.example/p/5?q=1  ->  example,site3)/p/5?q=1

This module implements a documented SUBSET of the IA SURT spec — the
rules below, nothing else — kept in lockstep across three impls exactly
like functions/canonical.py (M5): a scalar Python reference
(``surt``), a vectorized Arrow kernel (``surt_arrow``, the hot path —
the host reversal is pure list-offset arithmetic, no per-row Python),
and a DuckDB SQL mirror (``surt_sql_expr``) for the oracle queries.

Rules, applied in order:
1. trim whitespace, lowercase;
2. strip the scheme (``^https?://``);
3. strip a leading ``www`` / ``www2`` ... host prefix (``^www[0-9]*\\.``,
   the same rule canonicalization uses);
4. split host[:port] from path at the FIRST ``/`` (no slash: the whole
   string is the host, the path is empty);
5. strip a trailing ``:80`` default port from the host;
6. emit ``<host dot-segments reversed, comma-joined>`` + ``)`` + path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCHEME = re.compile(r"^https?://")
_WWW = re.compile(r"^www[0-9]*\.")
_PORT80 = re.compile(r":80$")


def surt(url: str | None) -> str | None:
    """Scalar reference implementation; None-safe, deterministic."""
    if url is None:
        return None
    u = _WWW.sub("", _SCHEME.sub("", url.strip().lower()))
    slash = u.find("/")
    host, path = (u, "") if slash < 0 else (u[:slash], u[slash:])
    host = _PORT80.sub("", host)
    return ",".join(reversed(host.split("."))) + ")" + path


def _reverse_lists(lst: pa.ListArray) -> pa.ListArray:
    """Reverse every sub-list of a ListArray in one gather (no Python
    loop): element k of list i moves to offsets[i] + offsets[i+1]-1-k."""
    off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(off)
    starts = np.repeat(off[:-1], lens)
    ends = np.repeat(off[1:], lens)
    k = np.arange(len(lst.values), dtype=np.int64)
    rev = starts + ends - 1 - k
    return pa.ListArray.from_arrays(pa.array(off, type=pa.int32()),
                                    lst.values.take(pa.array(rev)))


def surt_arrow(arr) -> pa.Array:
    """Vectorized SURT of a string array/chunked array (null-safe)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    u = pc.utf8_lower(pc.utf8_trim_whitespace(arr.cast(pa.string())))
    u = pc.replace_substring_regex(u, r"^https?://", "")
    u = pc.replace_substring_regex(u, r"^www[0-9]*\.", "")
    m = pc.extract_regex(u, r"^(?P<host>[^/]*)(?P<path>/.*)?$")
    host = pc.replace_substring_regex(
        pc.fill_null(pc.struct_field(m, "host"), ""), r":80$", "")
    path = pc.fill_null(pc.struct_field(m, "path"), "")
    segs = pc.split_pattern(host, ".")
    if isinstance(segs, pa.ChunkedArray):
        segs = segs.combine_chunks()
    rev = _reverse_lists(segs)
    out = pc.binary_join_element_wise(
        pc.binary_join(rev, ","), ")", path, "")
    # propagate input nulls (the regex/fill chain above replaced them)
    return pc.if_else(pc.is_valid(arr), out, pa.nulls(len(arr), pa.string()))


def surt_sql_expr(col: str) -> str:
    """DuckDB SQL expression computing exactly ``surt(col)`` (the oracle
    mirror; identical rule order)."""
    u = (f"regexp_replace(regexp_replace(lower(trim({col})), "
         f"'^https?://', ''), '^www[0-9]*\\.', '')")
    host = f"regexp_replace(regexp_extract({u}, '^[^/]*'), ':80$', '')"
    path = (f"CASE WHEN strpos({u}, '/') > 0 "
            f"THEN substr({u}, strpos({u}, '/')) ELSE '' END")
    return (f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
            f" || ')' || {path}")
