#!/bin/bash
# Round-4 master chip chain: mitigation arms -> stage 2 -> stage 3.
# Each stage script is resolved from disk when its turn comes, so later
# stages can be edited while earlier ones run.
# Usage: nohup bash benchmarks/r4_chain.sh > artifacts/r4/chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r4
echo "=== r4 chain start ($(date -u +%H:%M:%S)) ==="
bash benchmarks/r4_mitigation_chain.sh
echo "=== stage 1 done; starting stage 2 ==="
bash benchmarks/r4_stage2.sh
echo "=== stage 2 done; starting stage 3 ==="
bash benchmarks/r4_stage3.sh
echo "=== r4 chain complete ($(date -u +%H:%M:%S)) ==="
