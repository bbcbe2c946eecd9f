#!/bin/bash
# Round-5 TT-Adam rank arm, part 3: r128 quality parity costs ~1.06x dense
# Adam state with fp32 TT cores (36.5 vs 34.3 MiB at 9m) — bf16 cores
# (--tt-state-dtype bfloat16) halve that. Measure whether parity survives
# the storage-precision cut.
# Usage: bash benchmarks/r5_ttadam_rank3.sh
set -u
cd "$(dirname "$0")/.."

while [ ! -f artifacts/conv9m/R5_TTRANK2_DONE ]; do sleep 20; done

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

run ttadam_dense_r128bf16 --architecture linear --optimizer ttadam --tt-rank 128 --tt-state-dtype bfloat16 --seed 42
run ttadam_sow_r128bf16   $SOW --optimizer ttadam --tt-rank 128 --tt-state-dtype bfloat16 --seed 42
run ttadam_dense_r64bf16  --architecture linear --optimizer ttadam --tt-rank 64 --tt-state-dtype bfloat16 --seed 42
echo "=== r5 ttadam rank3 done ($(date -u +%H:%M:%S)) ==="
touch artifacts/conv9m/R5_TTRANK3_DONE
