"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in deduplicator_ray) calls ray.init()/ray.shutdown().

- ``entry()``   — flagship exact-dedup pipeline on sf0.001.
- ``queries()`` — one entry per implemented operator/pipeline
  (SURVEY.md §2 + north-star extensions), each ``f(sf_dir) -> Dataset``.
- ``oracle_sql()`` — DuckDB-runnable ANSI SQL per SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline: derive the captures corpus from sf0.001, build
    the keep-latest dedup index from the history crawl, match the current
    crawl against it (DIGEST_URL_PREFERRED), return annotated matches."""
    from deduplicator_ray.config import SearchStrategy
    from deduplicator_ray.pipelines.queries import _exact_match_query

    return _exact_match_query("/root/testdata/sf0.001", SearchStrategy.DIGEST_URL_PREFERRED)


def queries() -> dict[str, Callable[[str], Any]]:
    from deduplicator_ray.pipelines.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from deduplicator_ray.pipelines.queries import registry

    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
