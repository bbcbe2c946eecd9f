#!/bin/bash
# Round-5 TT-Adam rank-sensitivity arm. The stage-2 conv9m runs measured
# TT-Adam (tt_rank=16, matrix layout) converging far worse than dense
# AdamW (1.70 vs 0.20 final loss at 9m/800 steps) — before recording that
# as a bare negative, measure whether moment-compression rank is the
# knob: rank 64 and 128 on dense + the sow arm at 64, same seed/config
# as the stage-2 runs (benchmarks/r4_stage2.sh streamB).
# Usage: bash benchmarks/r5_ttadam_rank.sh   (waits for streamB to finish)
set -u
cd "$(dirname "$0")/.."

# wait for the last stage-2 conv9m run so we never run 3 streams
while ! grep -q final_step artifacts/conv9m/resetsched9m.log 2>/dev/null; do
  sleep 30
done

COMMON="--model llama_9m --batch-size 128 --max-length 256
  --num-training-steps 800 --lr 0.001 --synthetic-data
  --eval-every 0 --logging-steps 100"
SOW="--architecture sow --rank 32 --sow-accumulation 200 --sow-lr 0.001"
run() {
  name=$1; shift
  echo "=== conv9m $name ==="
  bash benchmarks/watchdog_run.sh "artifacts/conv9m/$name.jsonl" 1200 3 - -- \
    python -m sow_tpu.train.pretrain $COMMON "$@" \
    --metrics-path "artifacts/conv9m/$name.jsonl" \
    > "artifacts/conv9m/$name.log" 2>&1 \
    || echo "conv9m $name FAILED"
  tail -1 "artifacts/conv9m/$name.log"
}

run ttadam_dense_r64   --architecture linear --optimizer ttadam --tt-rank 64 --seed 42
run ttadam_dense_r128  --architecture linear --optimizer ttadam --tt-rank 128 --seed 42
run ttadam_sow_r64     $SOW --optimizer ttadam --tt-rank 64 --seed 42
echo "=== r5 ttadam rank arm done ($(date -u +%H:%M:%S)) ==="
touch artifacts/conv9m/R5_TTRANK_DONE
