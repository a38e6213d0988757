"""Deterministic html(binary) -> text extraction (north_rule per-row
invariant; see SURVEY.md §2.2 note).

The reference never extracts text (it digests raw payload bytes upstream);
our engine adds extraction as a first-class stage whose output must be
byte-identical per url across workers, runs and versions.  Hence:

- decoding is pinned: UTF-8 with ``errors="replace"`` — no charset
  sniffing, no locale dependence;
- parsing uses only the stdlib ``html.parser`` (no version-drifting
  third-party parser);
- whitespace normalization is a single fixed rule: collapse every run of
  unicode whitespace to one ASCII space, strip both ends.

Tested byte-for-byte against committed golden fixtures in
``tests/golden/text/`` (pytest ``test_textextract.py``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+", re.UNICODE)

# Elements whose character data is never document text.
_SKIP_CONTENT = frozenset({"script", "style", "noscript", "template"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs=True (default) decodes &amp; / &#x41; style
        # entities in .handle_data deterministically.
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self.parts.append(data)


def extract_text(html: bytes | str | None) -> str | None:
    """Extract visible text from raw html bytes; deterministic and
    byte-stable (fixed UTF-8/replace decode, fixed whitespace collapse)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = html
    p = _TextExtractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        # html.parser is tolerant; if it ever throws, fall back to a bare
        # tag-strip so the invariant "some deterministic text per input"
        # still holds.
        stripped = re.sub(r"<[^>]*>", " ", raw)
        return _WS.sub(" ", stripped).strip()
    return _WS.sub(" ", " ".join(p.parts)).strip()


def extract_text_many(htmls) -> list[str | None]:  # noqa: ANN001
    """Batch form for ``map_batches`` bodies."""
    return [extract_text(h) for h in htmls]
