"""Properties-file configuration layered under CLI flags (§2.10 knob
parity with the reference's ``deduplicator.properties``).

The reference loads a java-properties file first and lets command-line
options override it (IndexingLauncher.java:45-73,95-125); this module
mirrors that precedence for the pipeline CLI: built-in defaults <
properties file (``--config``) < explicit flags.  The key names are the
reference's own (IndexingLauncher.java:35-43), so an existing
``deduplicator.properties`` drops in unchanged; booleans follow the
reference's rule of ``equalsIgnoreCase("true")`` (anything else is
false, IndexingLauncher.java:76-82).
"""

from __future__ import annotations

# reference property key -> (argparse dest, type)
PROPERTY_MAP: dict[str, tuple[str, type]] = {
    "deduplicator.indexurl": ("index_url", bool),
    "deduplicator.canonicalurl": ("include_canonical", bool),
    "deduplicator.etag": ("include_etag", bool),
    "deduplicator.mime": ("mime_filter", str),
    "deduplicator.whitelist": ("whitelist", bool),
    "deduplicator.crawldataiterator": ("corpus_format", str),
    "deduplicator.indexdigestscheme": ("use_digest_scheme", bool),
}

# reference CrawlDataIterator class names -> registered source names, so a
# properties file written for the Java indexer resolves without edits
_ITERATOR_CLASSES = {
    "is.landsbokasafn.deduplicator.indexer.WarcIterator": "warc",
    "is.landsbokasafn.deduplicator.indexer.CrawlLogIterator": "crawl_log",
}


def parse_properties(text: str) -> dict[str, str]:
    """Minimal java-properties parse: ``key=value`` / ``key: value``
    lines, ``#``/``!`` comments, surrounding whitespace stripped.  (No
    line continuations or unicode escapes — none appear in the
    reference's shipped config.)"""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line[0] in "#!":
            continue
        # java.util.Properties splits at the FIRST unescaped '=' OR ':',
        # whichever comes first — trying '=' before ':' would mis-split a
        # "key: value" line whose value contains '='
        cuts = [i for i in (line.find("="), line.find(":")) if i >= 0]
        if cuts:
            i = min(cuts)
            out[line[:i].strip()] = line[i + 1:].strip()
    return out


def file_defaults(path: str) -> tuple[dict, list[str]]:
    """Properties file -> (argparse-dest defaults, unknown deduplicator.*
    keys).  Unknown keys are surfaced (not fatal) — the reference
    silently tolerates extras because it reads via System.getProperty."""
    with open(path) as f:
        props = parse_properties(f.read())
    dests: dict = {}
    unknown: list[str] = []
    for key, val in props.items():
        m = PROPERTY_MAP.get(key)
        if m is None:
            if key.startswith("deduplicator."):
                unknown.append(key)
            continue
        dest, typ = m
        if typ is bool:
            dests[dest] = val.lower() == "true"  # reference bool rule
        else:
            dests[dest] = _ITERATOR_CLASSES.get(val, val) if dest == "corpus_format" else val
    return dests, unknown
