"""Crawl-scope decide rules (Heritrix DecideRuleSequence semantics).

The reference runs inside Heritrix's fetch chain, where a sequence of
decide rules determines whether a URI is in crawl scope before the
DeDuplicator processor ever sees it (the processor itself re-checks
2xx/mime via shouldProcess — operators M1/M4 in stages/normalize.py).
This stage expresses the scope step as a batch operator so a corpus can
be re-scoped offline: an ORDERED rule list, each rule (action, kind,
pattern); every rule whose pattern matches flips the running decision to
its action; the LAST matching rule wins; a URI no rule matches keeps the
default decision (reject) — the standard DecideRuleSequence contract.

Rule kinds (both sides of the oracle use the identical pattern string):

- ``prefix`` — canonical-url starts-with (the SURT-prefix scope idiom);
  Arrow ``starts_with`` / DuckDB ``starts_with``.
- ``regex``  — RE2 substring match; Arrow ``match_substring_regex`` /
  DuckDB ``regexp_matches`` (same engine, contains semantics both sides).

Distribution: map-only, ZERO shuffle.  The rule list ships inside the
task closure (rule sets are KB-sized); a million-rule blocklist would
instead be broadcast once via ``ray.put`` and matched through a prefix
trie — same stage shape, different matcher.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

Rule = tuple[str, str, str]  # (action: accept|reject, kind: prefix|regex, pattern)


def _check(rules: list[Rule]) -> None:
    for action, kind, _pat in rules:
        if action not in ("accept", "reject"):
            raise ValueError(f"bad action {action!r}")
        if kind not in ("prefix", "regex"):
            raise ValueError(f"bad rule kind {kind!r}")


def scope_annotate(ds, rules: list[Rule], *, url_col: str = "url_canonical",
                   keep_cols: tuple[str, ...] = ()):
    """Annotate every row with the scope decision.

    -> Dataset (*keep_cols, url_col, accepted BOOLEAN, decided_by BIGINT)
    where ``decided_by`` is the 0-based index of the last matching rule,
    -1 if none matched (default reject).
    """
    _check(rules)
    accept_idx = np.array(
        [i for i, (a, _k, _p) in enumerate(rules) if a == "accept"],
        dtype=np.int64)

    def annotate(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = b[url_col]
        n = len(b)
        decided = np.full(n, -1, dtype=np.int64)
        for i, (_action, kind, pat) in enumerate(rules):
            if kind == "prefix":
                m = pc.starts_with(urls, pat)
            else:
                m = pc.match_substring_regex(urls, pat)
            mask = pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            decided[mask] = i
        accepted = np.isin(decided, accept_idx)
        cols = {c: b[c] for c in (*keep_cols, url_col)}
        cols["accepted"] = pa.array(accepted)
        cols["decided_by"] = pa.array(decided, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(annotate, batch_format="pyarrow",
                          zero_copy_batch=True)


def scope_filter(ds, rules: list[Rule], *, url_col: str = "url_canonical",
                 keep_cols: tuple[str, ...] = ()):
    """Keep only in-scope rows (the fetch-chain behavior)."""
    ann = scope_annotate(ds, rules, url_col=url_col, keep_cols=keep_cols)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(b["accepted"]).drop_columns(["accepted"])

    return ann.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def scope_sql_exprs(rules: list[Rule], col: str) -> tuple[str, str]:
    """DuckDB mirrors of (accepted, decided_by) for the SAME rule list.

    decided_by = first match of the REVERSED rule list (== last match in
    order); accepted = decided_by is an accept rule's index.
    """
    _check(rules)
    whens = "".join(
        f" WHEN {_match_sql(kind, pat, col)} THEN {i}"
        for i, (_a, kind, pat) in reversed(list(enumerate(rules))))
    decided = f"(CASE{whens} ELSE -1 END)"
    accepts = [str(i) for i, (a, _k, _p) in enumerate(rules) if a == "accept"]
    accepted = (f"({decided} IN ({', '.join(accepts)}))" if accepts
                else "FALSE")
    return accepted, decided


def _match_sql(kind: str, pat: str, col: str) -> str:
    lit = pat.replace("'", "''")
    if kind == "prefix":
        return f"starts_with({col}, '{lit}')"
    return f"regexp_matches({col}, '{lit}')"
