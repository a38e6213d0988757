"""CCNet-style text normalization for dedup keys.

Wenzek et al. 2020 ("CCNet", §3.2) hash a NORMALIZED form of each
paragraph — case-folded, accent/punctuation-stripped — so trivial
presentation variants (curly vs straight quotes, case, doubled spaces)
collapse onto one dedup key while the stored text stays verbatim.  The
reference engine has no text normalizer (its keys are URL + content
digest), so this layer is a training-data extension, not S/M parity.

ONE rule list, two lockstep implementations (the canonical.py pattern):
``normalize_text_arrow`` (RE2 kernels on Arrow arrays — the hot path)
and ``textnorm_sql_expr`` (the DuckDB mirror the driver oracle runs).
Both engines are RE2, so regex semantics are identical by construction.

Rules, in application order (each individually switchable):
1. ``fold_accents``  NFD decompose + delete combining marks
   (``\\p{M}+``) — café/café(NFD) -> cafe on both sides.  The Arrow
   side calls ``utf8_normalize(form="NFD")`` EXPLICITLY: pyarrow
   16.1's "NFC" form does not recompose (it behaves as NFD), so
   pinning NFD keeps the kernel stable if that ever changes.  The
   DuckDB mirror is ``strip_accents`` (verified equivalent on
   accents, ł/ß/ligature non-decompositions, CJK and Cyrillic).
2. ``lower``         unicode case fold (utf8_lower / lower())
3. ``strip_punct``   delete unicode punctuation+symbol runs
   (``[\\p{P}\\p{S}]+``) — script-safe: CJK/Cyrillic LETTERS survive,
   unlike an ASCII ``[^\\w\\s]`` class.
4. ``collapse_ws``   ``\\s+`` -> single space, then trim (ASCII
   whitespace on both engines; NBSP intentionally untouched).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_MARKS_PAT = r"\p{M}+"
_PUNCT_PAT = r"[\p{P}\p{S}]+"
_WS_PAT = r"\s+"


def normalize_text_arrow(arr: pa.Array | pa.ChunkedArray, *,
                         fold_accents: bool = True, lower: bool = True,
                         strip_punct: bool = True,
                         collapse_ws: bool = True) -> pa.Array:
    """Vectorized normalizer: Arrow string array in, normalized string
    array out.  Null in, null out (both engines agree on null
    propagation)."""
    out = arr
    if fold_accents:
        out = pc.utf8_normalize(out, form="NFD")
        out = pc.replace_substring_regex(out, _MARKS_PAT, "")
    if lower:
        out = pc.utf8_lower(out)
    if strip_punct:
        out = pc.replace_substring_regex(out, _PUNCT_PAT, "")
    if collapse_ws:
        out = pc.replace_substring_regex(out, _WS_PAT, " ")
        # ASCII-space trim, NOT utf8_trim_whitespace: DuckDB's trim()
        # only strips ' ', and after the \s+ collapse the edges hold at
        # most one ASCII space — unicode spaces (U+2028 etc.) are not
        # RE2 \s and must survive on BOTH sides
        out = pc.utf8_trim(out, characters=" ")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def nfc_arrow(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Real NFC normalization of an Arrow string array (DuckDB mirror:
    ``nfc_normalize``).

    pyarrow 16.1's ``utf8_normalize`` does NOT recompose — every form
    it offers behaves as decomposition (see module docstring) — so
    composition must go through ``unicodedata``.  Cost discipline for
    the hot path: a vectorized whole-column ASCII check
    (binary_length == utf8_length ⇒ pure ASCII ⇒ already NFC)
    short-circuits the overwhelmingly common web-text batch for free;
    only batches containing non-ASCII pay the per-string C-level
    ``unicodedata.is_normalized`` probe, and only the rare
    non-normalized string is actually rewritten."""
    import unicodedata

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ascii_only = pc.all(
        pc.equal(pc.binary_length(arr), pc.utf8_length(arr))).as_py()
    if ascii_only is not False:  # True, or None for all-null columns
        return arr
    out = [s if s is None or unicodedata.is_normalized("NFC", s)
           else unicodedata.normalize("NFC", s)
           for s in arr.to_pylist()]
    # preserve the input's string type: a large_string column must not
    # flip to string only on the batches that happen to contain
    # non-ASCII (per-batch schema divergence breaks block unification)
    return pa.array(out, type=arr.type)


def textnorm_sql_expr(col: str, *, fold_accents: bool = True,
                      lower: bool = True, strip_punct: bool = True,
                      collapse_ws: bool = True) -> str:
    """The DuckDB mirror: an SQL expression applying the SAME rules in
    the SAME order to ``col``."""
    expr = col
    if fold_accents:
        expr = f"strip_accents({expr})"
    if lower:
        expr = f"lower({expr})"
    if strip_punct:
        expr = f"regexp_replace({expr}, '{_PUNCT_PAT}', '', 'g')"
    if collapse_ws:
        # explicit ' ' char set: DuckDB's default trim also strips
        # unicode spaces (NBSP), which RE2 \s never matched — the Arrow
        # side trims ASCII space only, so the mirror must too
        expr = f"trim(regexp_replace({expr}, '{_WS_PAT}', ' ', 'g'), ' ')"
    return expr
