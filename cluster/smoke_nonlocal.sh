#!/usr/bin/env bash
# Non-local smoke: prove the flagship pipeline runs UNCHANGED against a
# cluster address instead of ray.init(address="local").
#
# Starts a standalone head (`ray start --head`) — a separate GCS +
# raylet that the driver JOINS, exactly the connection path a multi-node
# job uses — runs the clean pipeline through cluster/job_entry.py with
# RAY_ADDRESS=auto, checks the report, and tears the head down.
#
#     bash cluster/smoke_nonlocal.sh [corpus_parquet_dir] [num_cpus]
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS="${1:-/root/testdata/sf0.001/documents.parquet}"
CPUS="${2:-8}"
OUT="$(mktemp -d /tmp/smoke_nonlocal.XXXXXX)"

cleanup() { ray stop --force >/dev/null 2>&1 || true; }
trap cleanup EXIT

ray stop --force >/dev/null 2>&1 || true
ray start --head --num-cpus "$CPUS" --include-dashboard=false \
    --disable-usage-stats >/dev/null

RAY_ADDRESS=auto python cluster/job_entry.py clean \
    --corpus "$CORPUS" --out "$OUT/run" \
    --min-words 40 --extra-stopwords a | tee "$OUT/job.json"

python - "$OUT" <<'EOF'
import json, sys, os
out = sys.argv[1]
line = [l for l in open(f"{out}/job.json") if l.startswith("{")][-1]
rep = json.loads(line)["report"]
assert rep["output_docs"] > 0, rep
assert os.path.isdir(rep["output_dir"]), rep["output_dir"]
print(f"SMOKE OK: {rep['input_docs']} docs in -> {rep['output_docs']} out "
      f"via non-local address (out: {rep['output_dir']})")
EOF
