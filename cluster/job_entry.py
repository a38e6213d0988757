"""`ray job submit` / non-local entrypoint for the flagship pipelines.

Unlike the test/bench paths (which own a local session), this script
CONNECTS to an existing cluster: `ray.init(address=...)` with the
address from --address, $RAY_ADDRESS, or "auto" (the head started by
`ray start --head` / the cluster launcher).  Pipeline code itself never
calls ray.init, so the same package runs unchanged under the driver,
pytest, bench.py, or a multi-node job — only the session owner differs.

    # on a laptop against a launched cluster (cluster/cluster.yaml):
    ray job submit --working-dir . -- \
        python cluster/job_entry.py clean \
            --corpus s3://bucket/docs_parquet --out s3://bucket/clean_run1

    # on any node of a running cluster (or the smoke script):
    RAY_ADDRESS=auto python cluster/job_entry.py clean \
        --corpus /data/docs --out /data/clean_run1

Subcommands map 1:1 onto the pipeline CLIs (same flags):
    clean  -> deduplicator_ray.pipelines.clean_pipeline
    dedup  -> deduplicator_ray.pipelines.dedup_pipeline
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    top = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    top.add_argument("pipeline", choices=("clean", "dedup"))
    top.add_argument("--address", default=os.environ.get("RAY_ADDRESS", "auto"),
                     help="cluster address (default $RAY_ADDRESS or 'auto')")
    ns, rest = top.parse_known_args(argv)

    import ray

    if not ray.is_initialized():
        # NOT address="local": join the running cluster. Workers resolve
        # the package through the job's working_dir / this sys.path.
        ray.init(address=ns.address, ignore_reinit_error=True)
    try:
        if ns.pipeline == "clean":
            from deduplicator_ray.pipelines.clean_pipeline import (
                build_parser, run)
        else:
            from deduplicator_ray.pipelines.dedup_pipeline import (
                build_parser, run)
        rep = run(build_parser().parse_args(rest))
        print(json.dumps({"ok": True, "report": rep}, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
