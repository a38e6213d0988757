"""CDX capture-index source + sink (classic 11-field " CDX N b a m s k
r M S V g" format — the public web-archive index the reference's
ecosystem keys its collections by; see also sources/warc.py).

Fields, per the public CDX legend:
    N urlkey (SURT form, functions/surt.py)   b 14-digit timestamp
    a original url    m mimetype    s status code    k digest
    r redirect        M meta tags   S record length  V file offset
    g source filename
``-`` encodes a missing value in every column.

Reader: ``ray.data.read_text`` + one vectorized ``map_batches`` parser
(same shape as sources/crawl_log.py): header lines are recognized and
skipped, malformed lines are counted into the ``parse_dropped`` metric
column convention rather than raising.

Writer: deterministic — lines sorted by (urlkey, timestamp, url), the
format's sort contract, so re-writing the same captures yields a
byte-identical file.
"""

from __future__ import annotations

import datetime as _dt
import re

import pyarrow as pa

_HEADER_RE = re.compile(r"^ ?CDX( [A-Za-z])+$")
_TS14_RE = re.compile(r"^[0-9]{14}$")

_SCHEMA = pa.schema(
    [
        ("urlkey", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("url", pa.string()),
        ("mime", pa.string()),
        ("status", pa.int64()),
        ("digest", pa.string()),
        ("length", pa.int64()),
        ("offset", pa.int64()),
        ("filename", pa.string()),
        ("parse_dropped", pa.int64()),
    ]
)


def ts14_to_datetime(ts: str) -> _dt.datetime | None:
    """14-digit CDX timestamp (YYYYMMDDhhmmss, UTC) -> naive datetime."""
    if not _TS14_RE.match(ts):
        return None
    try:
        return _dt.datetime.strptime(ts, "%Y%m%d%H%M%S")
    except ValueError:
        return None


def datetime_to_ts14(dt) -> str:
    return dt.strftime("%Y%m%d%H%M%S")


def parse_line(line: str) -> dict | None:
    """One CDX-11 line -> record dict; None for header/malformed lines."""
    if not line or _HEADER_RE.match(line):
        return None
    parts = line.split(" ")
    if len(parts) != 11:
        return None
    (urlkey, ts, url, mime, status, digest,
     _redirect, _meta, length, offset, filename) = parts
    dt = ts14_to_datetime(ts)
    if dt is None:
        return None

    def opt(v: str) -> str | None:
        return None if v == "-" else v

    def opt_int(v: str) -> int | None:
        if v == "-":
            return None
        try:
            return int(v)
        except ValueError:
            return None

    st = opt_int(status)
    ln = opt_int(length)
    of = opt_int(offset)
    # a non-numeric status/length/offset that wasn't '-' is malformed
    if (status != "-" and st is None) or (length != "-" and ln is None) \
            or (offset != "-" and of is None):
        return None
    return {
        "urlkey": urlkey,
        "warc_ts": dt,
        "url": url,
        "mime": opt(mime),
        "status": st,
        "digest": opt(digest),
        "length": ln,
        "offset": of,
        "filename": opt(filename),
    }


def parse_batch(lines: list[str]) -> pa.Table:
    rows, dropped = [], 0
    for ln in lines:
        # header lines are format framing, not data — skipped silently,
        # not counted as malformed
        if ln is not None and _HEADER_RE.match(ln):
            continue
        r = parse_line(ln)
        if r is None:
            dropped += 1
        else:
            rows.append(r)
    names = [f.name for f in _SCHEMA if f.name != "parse_dropped"]
    if not rows:
        if dropped == 0:
            return pa.table(
                {k: pa.array([], type=_SCHEMA.field(k).type)
                 for k in _SCHEMA.names})
        # all-malformed batch: one metrics-only row (status null so any
        # record consumer's status filter drops it) — the crawl_log
        # convention (sources/crawl_log.py)
        return pa.table(
            {k: pa.array([dropped] if k == "parse_dropped" else [None],
                         type=_SCHEMA.field(k).type)
             for k in _SCHEMA.names})
    arrays = {k: pa.array([r[k] for r in rows], type=_SCHEMA.field(k).type)
              for k in names}
    arrays["parse_dropped"] = pa.array(
        [dropped] + [0] * (len(rows) - 1), type=pa.int64())
    return pa.table(arrays)


def read_cdx(paths, *, batch_size: int = 8192):
    """CDX file(s)/dir -> Dataset with the schema above."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def parse(b: pa.Table) -> pa.Table:
        return parse_batch(b["text"].to_pylist())

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=batch_size)


def write_cdx(path: str, records) -> str:
    """Records (list[dict] / pandas / Arrow table with the reader's
    columns; ``warc_ts`` may be a datetime or a ``ts_epoch`` int column)
    -> one sorted CDX-11 file.  Returns ``path``."""
    import pandas as pd

    if isinstance(records, pa.Table):
        df = records.to_pandas()
    elif isinstance(records, pd.DataFrame):
        df = records.copy()
    else:
        df = pd.DataFrame(records)
    if "warc_ts" in df.columns:
        ts14 = pd.to_datetime(df["warc_ts"]).dt.strftime("%Y%m%d%H%M%S")
    else:
        ts14 = pd.to_datetime(df["ts_epoch"], unit="s").dt.strftime(
            "%Y%m%d%H%M%S")
    def col(name, default="-"):
        if name not in df.columns:
            return pd.Series([default] * len(df))
        s = df[name]
        if s.dtype.kind in "if":
            s = s.astype("Int64")
        return s.astype(str).where(s.notna(), "-")

    out = pd.DataFrame({
        "urlkey": col("urlkey"), "ts": ts14, "url": col("url"),
        "mime": col("mime"), "status": col("status"),
        "digest": col("digest"), "redirect": col("redirect"),
        "meta": col("meta"), "length": col("length"),
        "offset": col("offset"), "filename": col("filename"),
    })
    out = out.sort_values(["urlkey", "ts", "url"], kind="mergesort")
    joined = out.iloc[:, 0].astype(str)
    for c in out.columns[1:]:
        joined = joined + " " + out[c].astype(str)
    body = " CDX N b a m s k r M S V g\n"
    if len(joined):
        body += "\n".join(joined) + "\n"
    with _open_out(path) as f:
        f.write(body.encode("utf-8"))
    return path


def _open_out(path: str):
    """Binary output stream for a local path or any pyarrow-supported
    filesystem URI (s3://, gcs://, hdfs://) — cluster workers write CDX
    shards to shared storage the same way write_parquet does."""
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.open_output_stream(p)
    return open(path, "wb")


def export_cdx(ds, out_dir: str, *, num_shards: int = 16,
               samples_per_block: int = 64):
    """Distributed SORTED CDX export: write ``num_shards`` range-
    partitioned shard files whose concatenation in shard order is a
    globally sorted CDX index (the format's contract), plus a
    ``manifest.json`` recording per-shard path/rows/key range — the
    resumable-output layout (one file per key range, a failed export
    rerun can skip complete shards by comparing the manifest).

    NO global sort shuffle: a bounded sample pass picks shard boundaries
    (order-preserving range partitioning, the deterministic_shuffle
    idiom), one range-key exchange co-locates each shard, and each shard
    sorts locally — sort work is per-shard, not all-to-all.

    ``ds`` needs the reader's columns (urlkey, warc_ts|ts_epoch, url,
    ...); rows missing ``urlkey`` raise.  Returns the manifest dict.
    """
    import json as _json
    import os as _os

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    if "://" not in out_dir:
        _os.makedirs(out_dir, exist_ok=True)

    def sample(b: pa.Table) -> pa.Table:
        if b["urlkey"].null_count:
            raise ValueError(
                "export_cdx: null urlkey rows — a CDX index is keyed by "
                "url; build the index with urls (not digest-only)")
        k = b["urlkey"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"k": pa.array([], type=pa.string())})
        idx = np.linspace(0, len(k) - 1,
                          min(samples_per_block, len(k))).astype(np.int64)
        return pa.table({"k": pa.array(k[idx], type=pa.string())})

    samples = np.sort(
        ds.map_batches(sample, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()["k"].to_numpy(object))
    if len(samples) == 0:
        bounds = np.array([], dtype=object)
    else:
        q = np.linspace(0, len(samples) - 1, num_shards + 1)[1:-1]
        bounds = np.unique(samples[q.astype(np.int64)])

    def assign(b: pa.Table) -> pa.Table:
        k = b["urlkey"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, k, side="right").astype(np.int32)
        return b.append_column("_part", pa.array(part))

    keyed = ds.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                                 "path": pd.Series([], dtype=object),
                                 "rows": pd.Series([], dtype="int64"),
                                 "min_key": pd.Series([], dtype=object),
                                 "max_key": pd.Series([], dtype=object)})
        shard = int(df["_part"].iloc[0])
        df = df.drop(columns=["_part"])
        path = _os.path.join(out_dir, f"part-{shard:05d}.cdx")
        write_cdx(path, df)  # sorts by (urlkey, ts, url) internally
        return pd.DataFrame({
            "shard": [shard], "path": [path], "rows": [len(df)],
            "min_key": [df["urlkey"].min()], "max_key": [df["urlkey"].max()],
        })

    rows = (keyed.groupby("_part")
            .map_groups(write_shard, batch_format="pandas")
            .to_pandas().sort_values("shard").reset_index(drop=True))
    manifest = {
        "format": "cdx11",
        "num_shards": int(len(rows)),
        "total_rows": int(rows["rows"].sum()) if len(rows) else 0,
        "shards": rows.to_dict(orient="records"),
    }
    # range partitioning invariant: shard key ranges must not overlap
    for a, b_ in zip(manifest["shards"], manifest["shards"][1:]):
        if a["max_key"] > b_["min_key"]:
            raise AssertionError(
                f"shard ranges overlap: {a['max_key']!r} > {b_['min_key']!r}")
    with _open_out(out_dir.rstrip("/") + "/manifest.json") as f:
        f.write(_json.dumps(manifest, indent=1).encode("utf-8"))
    return manifest
