"""Stage-boundary checkpoints with per-partition lineage + metrics
(north_rule; SURVEY.md §4 "Checkpoint / resume" row).

Layout under a pipeline output root:

    <root>/<stage>/data/part-*.parquet      (Ray write_parquet output)
    <root>/<stage>/_lineage/manifest.json   (stage-level: config hash,
                                             input fingerprint, wall time)
    <root>/<stage>/_lineage/parts.json      (per-partition: file name,
                                             rows, bytes — read back from
                                             parquet footers, i.e. ground
                                             truth, not UDF-side counters)

Write protocol is atomic-by-rename: data+lineage land in
``<root>/.tmp.<stage>`` first and the directory is renamed into place, so
a killed run can never leave a half-complete stage that ``is_complete``
accepts.  Resume = ``run_stage`` skipping any stage whose manifest
matches the current config hash + input fingerprint.

The parquet files themselves are the per-partition units: a downstream
consumer reads the directory and Ray assigns one (or more) blocks per
file, so "skip finished partitions" falls out of stage granularity plus
Ray's lineage-based re-execution within a running job.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _fsync_dir(path: str) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
        os.fsync(fd)
        os.close(fd)
    except OSError:
        pass


class StageCheckpoint:
    def __init__(self, root: str, stage: str, *, config_hash: str, input_fingerprint: str = ""):
        self.root = root
        self.stage = stage
        self.config_hash = config_hash
        self.input_fingerprint = input_fingerprint
        self.dir = os.path.join(root, stage)
        self.data_dir = os.path.join(self.dir, "data")
        self.lineage_dir = os.path.join(self.dir, "_lineage")

    # -- status ------------------------------------------------------------

    def manifest(self) -> dict | None:
        p = os.path.join(self.lineage_dir, "manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self) -> bool:
        m = self.manifest()
        return (
            m is not None
            and m.get("config_hash") == self.config_hash
            and m.get("input_fingerprint") == self.input_fingerprint
        )

    # -- io ----------------------------------------------------------------

    def write(self, ds, *, extra_metrics: dict | None = None) -> dict:
        """Consume ``ds`` into this checkpoint (streaming write_parquet),
        then record lineage. Returns the manifest."""
        import pyarrow.parquet as pq

        t0 = time.time()
        tmp = os.path.join(self.root, f".tmp.{self.stage}")
        shutil.rmtree(tmp, ignore_errors=True)
        tmp_data = os.path.join(tmp, "data")
        os.makedirs(tmp_data, exist_ok=True)
        ds.write_parquet(tmp_data)
        parts = []
        total_rows = 0
        total_bytes = 0
        for name in sorted(os.listdir(tmp_data)):
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(tmp_data, name)
            md = pq.read_metadata(fp)
            rows = md.num_rows
            nbytes = os.path.getsize(fp)
            parts.append({"file": name, "rows": rows, "bytes": nbytes})
            total_rows += rows
            total_bytes += nbytes
        manifest = {
            "stage": self.stage,
            "config_hash": self.config_hash,
            "input_fingerprint": self.input_fingerprint,
            "total_rows": total_rows,
            "total_bytes": total_bytes,
            "n_parts": len(parts),
            "wall_s": round(time.time() - t0, 3),
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **(extra_metrics or {}),
        }
        tmp_lineage = os.path.join(tmp, "_lineage")
        os.makedirs(tmp_lineage, exist_ok=True)
        with open(os.path.join(tmp_lineage, "parts.json"), "w") as f:
            json.dump(parts, f, indent=1)
        with open(os.path.join(tmp_lineage, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)
        os.rename(tmp, self.dir)
        _fsync_dir(self.root)
        return manifest

    def load(self):
        import ray.data as rd

        return rd.read_parquet(self.data_dir)


def input_fingerprint(paths) -> str:
    """Cheap input identity: path + size + mtime per file (no content
    hashing — 100 TB inputs can't be re-read to decide a resume)."""
    import glob
    import hashlib

    if isinstance(paths, str):
        paths = [paths]
    items = []
    for p in paths:
        expanded = sorted(glob.glob(os.path.join(p, "**", "*"), recursive=True)) if os.path.isdir(p) else [p]
        for f in expanded:
            if os.path.isfile(f):
                st = os.stat(f)
                items.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    return hashlib.sha1("\n".join(items).encode()).hexdigest()[:16]


def run_stage(ckpt: StageCheckpoint, build_fn, *, force: bool = False, log=print):
    """Resume-aware stage execution: returns (dataset, manifest, skipped).

    ``build_fn()`` must return the stage's output Dataset; it only runs
    when the checkpoint is missing/stale/forced."""
    if not force and ckpt.is_complete():
        m = ckpt.manifest()
        log(f"[resume] stage '{ckpt.stage}' complete ({m['total_rows']} rows) — skipping")
        return ckpt.load(), m, True
    ds = build_fn()
    m = ckpt.write(ds)
    log(f"[stage] '{ckpt.stage}': {m['total_rows']} rows, {m['n_parts']} parts, {m['wall_s']}s")
    return ckpt.load(), m, False
