#!/usr/bin/env bash
# Two-raylet exact-match drill: measure the match shuffle where bytes
# actually cross the object-transfer path (two raylets = two plasma
# stores on one box, inter-node gRPC transfers) and A/B the packed- vs
# unpacked-digest shuffle in that regime.
#
# Topologies (equal total resources: 16 cpus, 8 GiB object store):
#   1-raylet: ray start --head --num-cpus 16 --object-store-memory 8GiB
#   2-raylet: head 8 cpus/4 GiB + a second `ray start --address=` raylet
#             with 8 cpus/4 GiB
# For each topology, GRAFT_DIGEST_PACK=1/0 runs interleave TRIALS times.
#
#     bash cluster/raylet2_exact.sh [trials]    # default 3
#
# Output: one JSON line per run (tools/scale_drill.py exact_nodes) with
# n_raylets / pack / wall / caps_per_sec / loadavg; summarize into
# BASELINE.md by hand or with tools/summarize_raylet2.py.
set -euo pipefail
cd "$(dirname "$0")/.."

TRIALS="${1:-3}"
STORE_1=$((8 * 1024 * 1024 * 1024))
STORE_2=$((4 * 1024 * 1024 * 1024))
PORT=6399

cleanup() { ray stop --force >/dev/null 2>&1 || true; }
trap cleanup EXIT

run_leg() {  # topology label
    local label="$1"
    for t in $(seq 1 "$TRIALS"); do
        for pack in 1 0; do
            echo "--- $label trial=$t pack=$pack loadavg=$(cut -d' ' -f1 /proc/loadavg)" >&2
            GRAFT_RAY_ADDRESS=auto GRAFT_DIGEST_PACK=$pack \
                python tools/scale_drill.py exact_nodes 16
        done
    done
}

ray stop --force >/dev/null 2>&1 || true

echo "=== topology: 1 raylet (16 cpus, 8 GiB store) ===" >&2
ray start --head --port $PORT --num-cpus 16 \
    --object-store-memory $STORE_1 \
    --include-dashboard=false --disable-usage-stats >/dev/null
run_leg "raylets=1"
ray stop --force >/dev/null 2>&1

echo "=== topology: 2 raylets (8+8 cpus, 4+4 GiB stores) ===" >&2
ray start --head --port $PORT --num-cpus 8 \
    --object-store-memory $STORE_2 \
    --include-dashboard=false --disable-usage-stats >/dev/null
ray start --address="127.0.0.1:$PORT" --num-cpus 8 \
    --object-store-memory $STORE_2 --disable-usage-stats >/dev/null
run_leg "raylets=2"
