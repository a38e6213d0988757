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
# TOPOLOGIES AND PACK SETTINGS BOTH INTERLEAVE per trial (ambient load
# on a shared box moves on a multi-minute cadence — adjacent runs are
# the only fair comparison), and the worker raylet's registration is
# POLLED before any run (a fire-and-forget second `ray start` can lose
# the first seconds to a registration race, silently demoting the
# topology to one raylet — n_raylets in each output line is the check).
#
#     bash cluster/raylet2_exact.sh [trials]    # default 3
set -euo pipefail
cd "$(dirname "$0")/.."

TRIALS="${1:-3}"
STORE_1=$((8 * 1024 * 1024 * 1024))
STORE_2=$((4 * 1024 * 1024 * 1024))
PORT=6399
ADDR="127.0.0.1:$PORT"

cleanup() { ray stop --force >/dev/null 2>&1 || true; }
trap cleanup EXIT

wait_nodes() {  # expected-count
    local want="$1"
    for _ in $(seq 1 30); do
        # `|| got=0`: right after `ray start` returns, the GCS may not
        # accept connections yet — under errexit a failed probe would
        # kill the drill instead of retrying, the exact race this loop
        # exists to absorb
        got=$(RAY_ADDRESS= python - "$ADDR" 2>/dev/null <<'EOF'
import sys
import ray
ray.init(address=sys.argv[1], include_dashboard=False, logging_level="ERROR")
print(sum(1 for n in ray.nodes() if n.get("Alive")))
ray.shutdown()
EOF
) || got=0
        [ "$got" = "$want" ] && return 0
        sleep 1
    done
    echo "raylet registration timed out (want $want, got $got)" >&2
    return 1
}

run_pair() {  # label
    for pack in 0 1; do
        echo "--- $1 pack=$pack loadavg=$(cut -d' ' -f1 /proc/loadavg)" >&2
        GRAFT_RAY_ADDRESS="$ADDR" GRAFT_DIGEST_PACK=$pack \
            python tools/scale_drill.py exact_nodes 16 2>/dev/null
    done
}

for t in $(seq 1 "$TRIALS"); do
    ray stop --force >/dev/null 2>&1 || true
    ray start --head --port $PORT --num-cpus 16 \
        --object-store-memory $STORE_1 \
        --include-dashboard=false --disable-usage-stats >/dev/null 2>&1
    wait_nodes 1
    run_pair "trial=$t raylets=1"

    ray stop --force >/dev/null 2>&1 || true
    ray start --head --port $PORT --num-cpus 8 \
        --object-store-memory $STORE_2 \
        --include-dashboard=false --disable-usage-stats >/dev/null 2>&1
    ray start --address="$ADDR" --num-cpus 8 \
        --object-store-memory $STORE_2 --disable-usage-stats >/dev/null 2>&1
    wait_nodes 2
    run_pair "trial=$t raylets=2"
done
