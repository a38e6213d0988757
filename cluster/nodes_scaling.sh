#!/usr/bin/env bash
# NODE-count scaling (the north_rule's literal shape): the full 4-phase
# bench pipeline at 1 raylet x 4 cpus ("N nodes") vs 4 raylets x 4 cpus
# ("4N nodes") on one box — per-node resources constant (4 cpus + an
# 8 GiB object store EACH, exactly how a real cluster scales), object
# transfers between raylets cross the object-manager path.
#
# Caveat this cannot remove: all "nodes" share one box's 32 physical
# cores and memory bandwidth, and inter-node transfer is loopback gRPC
# burning those same cores — both bias efficiency DOWN vs a real
# cluster, where each node brings its own silicon and the NIC does the
# copying.  Report alongside the num_cpus-level run (bench.py
# --scaling), not instead of it.
#
#     bash cluster/nodes_scaling.sh [trials]   # default 2
set -euo pipefail
cd "$(dirname "$0")/.."

TRIALS="${1:-2}"
STORE=$((8 * 1024 * 1024 * 1024))
PORT=6399
ADDR="127.0.0.1:$PORT"

cleanup() { ray stop --force >/dev/null 2>&1 || true; }
trap cleanup EXIT

wait_nodes() {
    local want="$1"
    for _ in $(seq 1 30); do
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

leg() {  # ncpus-for-block-sizing
    GRAFT_RAY_ADDRESS="$ADDR" RAY_GRAFT_CPUS="$1" \
        GRAFT_BENCH_REPEAT=256 GRAFT_BENCH_GRAPH=0 \
        GRAFT_HEADLINE_TRIALS=1 \
        python bench.py 2>/dev/null | tail -1
}

# corpus prepared once at full local parallelism; both topologies then
# read identical parquet
GRAFT_BENCH_REPEAT=256 python bench.py --prepare-only >/dev/null 2>&1

for t in $(seq 1 "$TRIALS"); do
    ray stop --force >/dev/null 2>&1 || true
    ray start --head --port $PORT --num-cpus 4 --object-store-memory $STORE \
        --include-dashboard=false --disable-usage-stats >/dev/null 2>&1
    wait_nodes 1
    echo "--- trial=$t nodes=1 loadavg=$(cut -d' ' -f1 /proc/loadavg)" >&2
    leg 4

    ray stop --force >/dev/null 2>&1 || true
    ray start --head --port $PORT --num-cpus 4 --object-store-memory $STORE \
        --include-dashboard=false --disable-usage-stats >/dev/null 2>&1
    for i in 1 2 3; do
        ray start --address="$ADDR" --num-cpus 4 \
            --object-store-memory $STORE --disable-usage-stats >/dev/null 2>&1
    done
    wait_nodes 4
    echo "--- trial=$t nodes=4 loadavg=$(cut -d' ' -f1 /proc/loadavg)" >&2
    leg 16
done
