#!/bin/bash
# Round-5 harvest orchestrator. Round 4 built the 4-stage measurement
# ladder but its chip budget died in stage 1; round 5's job (VERDICT r4)
# is to finish the arms and HARVEST stages 2-4, not rewrite them.
#
# Preconditions when this starts: stage 2 (r4_stage2.sh) and the relaunched
# resetsched arm are already running concurrently. This script:
#   1. waits for both to finish,
#   2. writes the stage-1 mitigation report (the round-3 #1 item's numbers),
#   3. runs stage 3 (spec decode 350m, online serving, first W4 accuracy),
#   4. runs stage 4 (GLUE baseline/random/TPE on the real-text objective),
#   5. refreshes the aggregate summary.
# Usage: nohup bash benchmarks/r5_chain.sh > artifacts/r4/r5_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "=== r5 chain start ($(date -u +%H:%M:%S)) ==="
# resetsched done when its watchdog tree is gone (pid recorded at launch)
while [ -f /tmp/resetsched.pid ] && kill -0 "$(cat /tmp/resetsched.pid)" 2>/dev/null; do
  sleep 60
done
echo "=== resetsched arm finished ($(date -u +%H:%M:%S)) ==="
while [ ! -f artifacts/r4/STAGE2_DONE ]; do sleep 60; done
echo "=== stage 2 finished ($(date -u +%H:%M:%S)) ==="

echo "=== stage 1 mitigation report ==="
nice -n 19 python benchmarks/r4_mitigation_report.py artifacts/flagship_r4 \
  > artifacts/r4/mitigation_report.md 2>&1
tail -5 artifacts/r4/mitigation_report.md

bash benchmarks/r4_stage3.sh
echo "=== stage 3 done; starting stage 4 ==="
bash benchmarks/r4_stage4.sh
nice -n 19 python benchmarks/r4_bench_summary.py > artifacts/r4/summary.md 2>&1
echo "=== r5 chain complete ($(date -u +%H:%M:%S)) ==="
touch artifacts/r4/R5_CHAIN_DONE
