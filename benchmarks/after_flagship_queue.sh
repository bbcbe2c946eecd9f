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
echo "[after-flagship] flagship arms complete; starting reports + conv9m + queue"
# reports first (cheap, and the flagship numbers are the round's headline —
# land them before the long tail in case the host re-images again)
python benchmarks/flagship_report.py artifacts/flagship \
  > artifacts/flagship/report.md 2> artifacts/flagship/report.log
for arch in linear sow; do
  timeout 1200 python benchmarks/sample_generations.py \
    "artifacts/flagship/${arch}_ckpt" "$arch" 4 \
    > "artifacts/flagship/samples_${arch}.jsonl" 2>> artifacts/flagship/report.log
done
git add artifacts/flagship/report.md artifacts/flagship/samples_*.jsonl \
  artifacts/flagship/linear.jsonl artifacts/flagship/sow.jsonl 2>/dev/null
git commit -q -m "Flagship 25k-step results: report, curves, held-out samples" \
  || true
# uniform 1000-step-resolution eval curves from the persisted checkpoints
# (fills the re-image metric gaps from each resume point onward)
for arch in linear sow; do
  timeout 3600 python benchmarks/eval_backfill.py \
    "artifacts/flagship/${arch}_ckpt" "artifacts/flagship/backfill_${arch}.jsonl" \
    2>> artifacts/flagship/report.log
done
git add artifacts/flagship/backfill_*.jsonl 2>/dev/null
git commit -q -m "Flagship eval-curve backfill at every persisted checkpoint" || true
bash benchmarks/convergence_9m.sh artifacts/conv9m
python benchmarks/conv9m_report.py artifacts/conv9m \
  > artifacts/conv9m/report.md 2>/dev/null
git add artifacts/conv9m/*.jsonl artifacts/conv9m/report.md 2>/dev/null
git commit -q -m "conv9m ablation curves + deficit-diagnosis report" || true
bash benchmarks/round3_chip_queue.sh artifacts
echo "[after-flagship] all done ($(date -u +%H:%M:%S))"
