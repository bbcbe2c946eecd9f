#!/bin/bash
# Diagnose the 9m-scale SoW convergence deficit (PARITY.md "Convergence
# parity": llama-9m 800 steps r=32 acc=200 -> SoW 0.2278 vs dense 0.1940,
# ~14 sigma). Ablations target the "late-stage capacity between
# accumulations" hypothesis:
#   keep    - carry SoW Adam moments across accumulation events instead of
#             resetting them (isolates the reset cost)
#   scale   - drop factor scale to 1/rank after the first accumulation (the
#             finetune workloads' move, run_glue.py:993-1002)
#   acc100 / acc400 - accumulation cadence (more/fewer capacity injections)
#   r64     - rank (subspace capacity between accumulations)
# All runs: synthetic affine stream, bs 128, seq 256, bf16, lr 1e-3, seed 0,
# on the real chip (~3-4 min each). Usage:
#   bash benchmarks/convergence_9m.sh [outdir]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/conv9m}
mkdir -p "$OUT"

COMMON="--model llama_9m --batch-size 128 --max-length 256
  --num-training-steps 800 --lr 0.001 --synthetic-data
  --eval-every 0 --logging-steps 100"

run() {
  name=$1; shift
  echo "=== conv9m $name ==="
  # tunnel-wedge watchdog: rerun from scratch (runs are ~3-4 min) if the
  # metrics file stalls >10 min (see watchdog_run.sh)
  bash benchmarks/watchdog_run.sh "$OUT/$name.jsonl" 600 3 - -- \
    python -m sow_tpu.train.pretrain $COMMON "$@" \
    --metrics-path "$OUT/$name.jsonl" > "$OUT/$name.log" 2>&1 \
    || echo "conv9m $name FAILED"
  tail -2 "$OUT/$name.log"
}

SOW="--architecture sow --rank 32 --sow-accumulation 200 --sow-lr 0.001"
run dense    --architecture linear
run sow      $SOW
run keep     $SOW --sow-keep-moments
run scale    $SOW --sow-scale-after-first 0.03125
run acc100   --architecture sow --rank 32 --sow-accumulation 100 --sow-lr 0.001
run acc400   --architecture sow --rank 32 --sow-accumulation 400 --sow-lr 0.001
run r64      --architecture sow --rank 64 --sow-accumulation 200 --sow-lr 0.001
# seed replicas for the headline pair (the deficit claim is a seeded one)
run dense_s1 --architecture linear --seed 1
run dense_s2 --architecture linear --seed 2
run sow_s1   $SOW --seed 1
run sow_s2   $SOW --seed 2
echo "=== done; tail losses: ==="
for f in "$OUT"/*.jsonl; do
  echo "$f: $(tail -1 "$f")"
done
