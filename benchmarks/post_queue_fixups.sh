#!/bin/bash
# Re-run the two benches that failed/mis-measured in the round-3 chip queue
# (mfu_1b: missing sys.path; hbm_peak: per-dispatch timing) once the main
# queue releases the chip. Usage: nohup bash benchmarks/post_queue_fixups.sh QUEUE_PID &
set -u
cd "$(dirname "$0")/.."
QPID=${1:?queue pid}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "[fixups] queue done ($(date -u +%H:%M:%S)); re-running hbm_peak + mfu_1b"
timeout 900 python benchmarks/hbm_peak.py > artifacts/hbm_peak.json 2> artifacts/hbm_peak.log
echo "hbm exit: $?"
timeout 2400 python benchmarks/mfu_1b.py 64 1 10 > artifacts/mfu_1b.json 2> artifacts/mfu_1b.log
rc=$?
if [ $rc -ne 0 ]; then
  echo "bs64 accum1 failed ($rc); retrying with grad-accum 4"
  timeout 2400 python benchmarks/mfu_1b.py 16 4 10 > artifacts/mfu_1b.json 2>> artifacts/mfu_1b.log
fi
echo "mfu exit: $?"
timeout 2400 python benchmarks/spec_breakeven.py 1 > artifacts/spec_breakeven.json 2> artifacts/spec_breakeven.log
echo "breakeven exit: $?"
# step_anatomy at bs 256 OOMs (the no-remat fwd+bwd variant needs 15.9 of
# 15.75 GB); bs 128 keeps every variant resident — attribution ratios are
# what matter here, not absolute bytes
timeout 2400 python benchmarks/step_anatomy.py llama_60m 128 256 15 \
  > artifacts/step_anatomy.json 2> artifacts/step_anatomy.log
echo "anatomy exit: $?"
echo "[fixups] done ($(date -u +%H:%M:%S))"
