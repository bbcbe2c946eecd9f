#!/bin/bash
# Wait for the (possibly concurrent) flagship arms to finish, then run the
# rest of the round-3 chip queue sequentially. The two 60m arms run in
# PARALLEL on the one chip: measured 253k + 262k tokens/s concurrently vs
# ~255k solo — per-stream throughput is host-dispatch-bound on the
# tunneled chip, so a second stream is nearly free and halves flagship
# wall-clock. (Benches below still run solo for honest numbers.)
# Usage: nohup bash benchmarks/after_flagship_queue.sh WATCHDOG_PID [PID...] &
set -u
cd "$(dirname "$0")/.."
for pid in "$@"; do
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
  echo "[after-flagship] pid $pid done ($(date -u +%H:%M:%S))"
done
echo "[after-flagship] flagship arms complete; starting conv9m + queue"
bash benchmarks/convergence_9m.sh artifacts/conv9m
bash benchmarks/round3_chip_queue.sh artifacts
echo "[after-flagship] all done ($(date -u +%H:%M:%S))"
