#!/bin/bash
# Round-5 TT-Adam rank arm, part 2: rerun the rank-128 runs with the
# randomized-range-finder cholesky fix (sow_tpu/tt.py _rand_basis strong-
# ridge fallback). The first r128 attempt NaN'd from the first step —
# the fp32 Gram of power-iterated near-parallel sketch columns goes
# indefinite beyond the 1e-6 ridge whenever the requested rank nears the
# matrix dimension; reproduced on CPU, fixed, and pinned by
# tests/test_tt.py. Usage: bash benchmarks/r5_ttadam_rank2.sh
set -u
cd "$(dirname "$0")/.."

while [ ! -f artifacts/conv9m/R5_TTRANK_DONE ]; do sleep 20; done

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

run ttadam_dense_r128  --architecture linear --optimizer ttadam --tt-rank 128 --seed 42
run ttadam_sow_r128    $SOW --optimizer ttadam --tt-rank 128 --seed 42
echo "=== r5 ttadam rank2 done ($(date -u +%H:%M:%S)) ==="
touch artifacts/conv9m/R5_TTRANK2_DONE
