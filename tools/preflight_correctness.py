"""Pre-flight mirror of the driver's correctness gate: run every
``queries()`` entry AND its ``oracle_sql()`` twin at a given sf dir,
compare row count, schema (column names), and a value hash with columns
sorted by name — the same comparison shape the driver records in
CORRECTNESS_r{N}.json.  Prints one JSON line per query and a summary.

    python tools/preflight_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj):
    import pandas as pd

    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return obj.to_pandas()  # pyarrow.Table


def _value_hash(df) -> str:
    import numpy as np
    import pandas as pd

    # canonicalize FIRST (floats rounded to 6, -0.0 -> 0.0, datetimes to
    # int us, nullable ints stringified), THEN sort rows by the canonical
    # values — sorting on full-precision strings while hashing rounded
    # values would order float-rounding twins differently on the two
    # sides and report a spurious mismatch
    cols = sorted(df.columns)
    canon = {}
    for c in cols:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            v = np.round(s.to_numpy(dtype=np.float64), 6)
            v[v == 0.0] = 0.0
            canon[c] = v
        elif pd.api.types.is_datetime64_any_dtype(s):
            canon[c] = s.astype("datetime64[us]").astype("int64").to_numpy()
        elif pd.api.types.is_integer_dtype(s):
            if s.isna().any():  # nullable Int64 with NA: int64 cast raises
                canon[c] = s.astype(str).to_numpy()
            else:
                canon[c] = s.to_numpy(dtype=np.int64)
        else:
            canon[c] = s.astype(str).to_numpy()
    cd = pd.DataFrame(canon)
    cd = cd.sort_values(cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in cols:
        arr = cd[c].to_numpy()
        if arr.dtype == object:
            h.update("\x1f".join(map(str, arr)).encode())
        else:
            h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb
    import ray

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    import time

    t_all = time.time()
    results, bad = {}, []
    for name in sorted(qs):
        row: dict = {}
        t_q = time.time()
        try:
            got = _to_pandas(qs[name](SF))
            row["rows"] = len(got)
            if name not in osql:
                row["err"] = "no_oracle"
            else:
                want = con.execute(osql[name]).df()
                row["oracle_rows"] = len(want)
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = sorted(got.columns) == sorted(want.columns)
                row["hash_match"] = (
                    row["rows_match"] and row["schema_match"]
                    and _value_hash(got) == _value_hash(want)
                )
                if not row["hash_match"]:
                    bad.append(name)
        except Exception as ex:  # noqa: BLE001
            row["err"] = f"{type(ex).__name__}: {ex}"[:300]
            bad.append(name)
        row["sec"] = round(time.time() - t_q, 2)  # engine + oracle wall
        results[name] = row
        print(json.dumps({name: row}), flush=True)
    n_ok = sum(1 for r in results.values() if r.get("hash_match"))
    slow = sorted(results, key=lambda n: -results[n]["sec"])[:10]
    print(json.dumps({"summary": {"queries": len(results), "green": n_ok,
                                  "rows_only": sum(1 for r in results.values()
                                                   if r.get("err") == "no_oracle"),
                                  "bad": bad,
                                  "sweep_sec": round(time.time() - t_all, 1),
                                  "slowest": {n: results[n]["sec"]
                                              for n in slow}}}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
