"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, runs its
``oracle_sql()`` twin in DuckDB over the same parquet views, and compares
row count + column names + an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    """Order-insensitive hash over sorted columns + sorted rows."""
    import hashlib

    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints/bools to int64 strings, floats rounded
    norm = df.copy()
    for c in norm.columns:
        s = norm[c]
        if s.dtype == bool or str(s.dtype) == "boolean":
            norm[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            norm[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            norm[c] = s.astype("int64")
    rows = norm.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1)
    blob = "\n".join(sorted(rows.tolist()))
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: ray side raised {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        ray_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle — rows-only check)"
                  f"  [{ray_s:.2f}s]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif value_hash(got) != value_hash(want):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
            if "value-hash mismatch" in problems and os.environ.get("ORACLE_DEBUG"):
                _debug_diff(got, want, name)
        else:
            print(f"OK    {name}: {len(got)} rows  [{ray_s:.2f}s]")
    ray.shutdown()
    return 1 if failures else 0


def _debug_diff(got, want, name):
    import pandas as pd

    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    w = want.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    diff = g.compare(w) if len(g) == len(w) else None
    print(f"--- {name} diff (first rows) ---")
    print(diff.head(10) if diff is not None else (g.head(), w.head()))


if __name__ == "__main__":
    raise SystemExit(main())
