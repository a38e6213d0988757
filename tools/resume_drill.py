"""Kill+resume drill at bench scale (SURVEY.md §4 checkpoint/resume row;
round-2 verdict item 10).

Runs the near-dup CLI pipeline (normalize -> edges -> clusters, each a
``StageCheckpoint``) three times over the same corpus:

1. **control** — uninterrupted run; records wall time + a value hash of
   the final cluster assignment.
2. **interrupted** — fresh output dir; the process is SIGKILLed the
   moment the ``edges`` checkpoint manifest lands (i.e. after the
   MinHash/LSH/verify work, before connected components).
3. **resume** — the same command again on the killed run's output dir;
   must SKIP the ``normalize`` and ``edges`` stages via their lineage
   manifests and produce a cluster table identical to the control's.

Prints one JSON line: timings, stages/partitions skipped, and whether
the resumed output is byte-identical to the control.  Run against the
bench's pre-tiled near-dup corpus for bench-scale numbers:

    python bench.py --prepare-only          # writes /tmp/graft_bench_cache/...
    python tools/resume_drill.py /tmp/graft_bench_cache/sf0.1_r8/neardup

The kill lands between two atomic stage renames (checkpoint.py writes to
.tmp.<stage> then renames), so the interrupted output dir can only hold
complete stages — the drill asserts the resume skips exactly those.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_cmd(corpus: str, out: str) -> list[str]:
    return [
        sys.executable, "-m", "deduplicator_ray.pipelines.dedup_pipeline",
        "--corpus", corpus, "--out", out, "--near-dup",
    ]


def _clusters_hash(out: str) -> tuple[str, int]:
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(out, "clusters", "data")).to_table()
    df = t.to_pandas().sort_values(list(t.column_names)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in sorted(df.columns):
        h.update(df[col].to_numpy().tobytes())
    return h.hexdigest()[:16], len(df)


def _run_to_completion(corpus: str, out: str) -> tuple[float, str]:
    t0 = time.time()
    p = subprocess.run(_cli_cmd(corpus, out), cwd=REPO, capture_output=True,
                       text=True)
    if p.returncode != 0:
        raise RuntimeError(f"control run failed:\n{p.stdout}\n{p.stderr}")
    return round(time.time() - t0, 2), p.stdout


def _run_and_kill_after_edges(corpus: str, out: str) -> dict:
    """Launch the CLI, SIGKILL it the instant <out>/edges/_lineage lands."""
    marker = os.path.join(out, "edges", "_lineage", "manifest.json")
    clusters_marker = os.path.join(out, "clusters", "_lineage", "manifest.json")
    t0 = time.time()
    p = subprocess.Popen(_cli_cmd(corpus, out), cwd=REPO,
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        while p.poll() is None and not os.path.exists(marker):
            time.sleep(0.05)
        killed_at = round(time.time() - t0, 2)
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
            p.wait()
    finally:
        if p.poll() is None:
            p.kill()
    return {
        "killed_after_s": killed_at,
        "edges_complete_at_kill": os.path.exists(marker),
        # if the run finished CC before the poll saw the manifest, the
        # drill didn't actually interrupt anything — flag it honestly
        "kill_too_late": os.path.exists(clusters_marker),
    }


def _resume(corpus: str, out: str) -> dict:
    t0 = time.time()
    p = subprocess.run(_cli_cmd(corpus, out), cwd=REPO, capture_output=True,
                       text=True)
    if p.returncode != 0:
        raise RuntimeError(f"resume run failed:\n{p.stdout}\n{p.stderr}")
    wall = round(time.time() - t0, 2)
    skipped = [
        line.split("'")[1]
        for line in p.stdout.splitlines()
        if line.startswith("[resume] stage ")
    ]
    parts_skipped = 0
    for stage in skipped:
        with open(os.path.join(out, stage, "_lineage", "manifest.json")) as f:
            parts_skipped += json.load(f)["n_parts"]
    return {"resume_s": wall, "stages_skipped": skipped,
            "partitions_skipped": parts_skipped}


def main() -> int:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_bench_cache/sf0.1_r8/neardup"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_resume_drill"
    shutil.rmtree(scratch, ignore_errors=True)
    out_ctl = os.path.join(scratch, "control")
    out_drill = os.path.join(scratch, "drill")

    ctl_s, _ = _run_to_completion(corpus, out_ctl)
    ctl_hash, n_rows = _clusters_hash(out_ctl)

    kill_info = _run_and_kill_after_edges(corpus, out_drill)
    res_info = _resume(corpus, out_drill)
    drill_hash, _ = _clusters_hash(out_drill)

    report = {
        "metric": "kill+resume drill (SIGKILL after edges checkpoint)",
        "corpus": corpus,
        "cluster_rows": n_rows,
        "control_s": ctl_s,
        **kill_info,
        **res_info,
        "identical_to_control": drill_hash == ctl_hash,
        "cluster_hash": ctl_hash,
    }
    ok = (
        report["identical_to_control"]
        and not report["kill_too_late"]
        and "edges" in report["stages_skipped"]
        and "normalize" in report["stages_skipped"]
    )
    report["ok"] = ok
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
