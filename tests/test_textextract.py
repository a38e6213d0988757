"""Byte-identical text extraction vs committed golden fixtures
(north_rule per-row invariant; SURVEY.md §5 item 2).

Each ``tests/golden/text/<name>.html`` must extract to exactly the bytes
of ``<name>.txt`` (UTF-8).  Fixtures cover plain ASCII, UTF-8 multibyte,
entities, script/style/noscript stripping, malformed markup, empty body,
whitespace collapse, and invalid byte sequences.
"""

from __future__ import annotations

import glob
import os

import pytest

from deduplicator_ray.functions.textextract import extract_text, extract_text_many

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "text")
CASES = sorted(os.path.splitext(os.path.basename(p))[0] for p in glob.glob(GOLDEN + "/*.html"))


@pytest.mark.parametrize("name", CASES)
def test_golden_byte_identical(name: str):
    with open(os.path.join(GOLDEN, name + ".html"), "rb") as f:
        html = f.read()
    with open(os.path.join(GOLDEN, name + ".txt"), "rb") as f:
        expected = f.read()
    got = extract_text(html)
    assert got is not None
    assert got.encode("utf-8") == expected


def test_fixture_count():
    # keep the suite honest: all six required classes of input present
    assert len(CASES) >= 6


def test_determinism_across_calls():
    htmls = []
    for name in CASES:
        with open(os.path.join(GOLDEN, name + ".html"), "rb") as f:
            htmls.append(f.read())
    a = extract_text_many(htmls)
    b = extract_text_many(list(reversed(htmls)))[::-1]
    assert a == b


def test_none_and_str_inputs():
    assert extract_text(None) is None
    assert extract_text("<p>str input</p>") == "str input"
