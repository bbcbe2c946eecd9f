#!/bin/bash
# Round-4 stage 2 (after the mitigation arms free the chip): two concurrent
# streams — per-stream throughput at these model sizes is host-dispatch
# bound, so pairing a compute-bound 350m train with the tiny-model ablation
# ladder costs little (round-3 measured two 60m streams each holding solo
# rate, PARITY.md "Flagship run").
#
#   stream A: llama-350m pretrain on the token cache (the speculative-
#             decoding TARGET at the scale where spec is predicted to win,
#             VERDICT r3 item 4) then llama-9m draft retrain (checkpoints
#             were lost to round-3 host re-images).
#   stream B: conv9m TT-Adam convergence runs (VERDICT item 2) +
#             warm-start factor-reinit ablation (VERDICT item 6).
# Usage: bash benchmarks/r4_stage2.sh
set -u
cd "$(dirname "$0")/.."
ROOTS=/opt/venv/lib/python3.12/site-packages,/usr/lib/python3.11
TOK=artifacts/bpe32k.json
mkdir -p artifacts/conv9m artifacts/r4

streamA() {
  echo "=== [A1] llama-350m pretrain (spec target) ==="
  bash benchmarks/watchdog_run.sh artifacts/r4/350m.jsonl 2000 8 artifacts/r4/350m_ckpt -- \
    python -m sow_tpu.train.pretrain \
    --model llama_350m --architecture linear --batch-size 256 --max-length 256 \
    --num-training-steps 3000 --lr 0.001 --weight-decay 0.0 \
    --scheduler cosine --min-lr-ratio 0.03 \
    --data-dir "$ROOTS" --tokenizer-path "$TOK" \
    --token-cache-dir artifacts/tokcache \
    --steps-per-dispatch 8 \
    --eval-every 2000 --eval-tokens 2000000 --logging-steps 200 --save-every 1000 \
    --save-dir artifacts/r4/350m_ckpt --metrics-path artifacts/r4/350m.jsonl \
    > artifacts/r4/350m.log 2>&1
  echo "A1 exit: $?"
  echo "=== [A2] llama-9m draft pretrain ==="
  bash benchmarks/watchdog_run.sh artifacts/r4/draft9m.jsonl 1200 5 artifacts/r4/draft9m_ckpt -- \
    python -m sow_tpu.train.pretrain \
    --model llama_9m --architecture linear --batch-size 256 --max-length 256 \
    --num-training-steps 3000 --lr 0.001 --weight-decay 0.0 \
    --scheduler cosine --min-lr-ratio 0.03 \
    --data-dir "$ROOTS" --tokenizer-path "$TOK" \
    --token-cache-dir artifacts/tokcache \
    --steps-per-dispatch 8 \
    --eval-every 0 --logging-steps 200 --save-every 1000 \
    --save-dir artifacts/r4/draft9m_ckpt --metrics-path artifacts/r4/draft9m.jsonl \
    > artifacts/r4/draft9m.log 2>&1
  echo "A2 exit: $?"
}

streamB() {
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
  # TT-Adam trains a model (VERDICT item 2): matrix+factored default and
  # the single-decompose ema_mode=tt variant, on dense AND on SoW, 3 seeds
  # for the headline pair (baseline adamw curves: round-3 dense/sow*.jsonl)
  for s in 42 1 2; do  # same seed trio as the round-3 adamw baselines
    run "ttadam_dense_s$s"  --architecture linear --optimizer ttadam --seed "$s"
    run "ttadam_sow_s$s"    $SOW --optimizer ttadam --seed "$s"
  done
  run ttadam_dense_ematt --architecture linear --optimizer ttadam --tt-ema-mode tt
  # factor warm-start ablation (VERDICT item 6): grad-subspace reinit,
  # 3 seeds + combined-knob runs
  for s in 42 1 2; do
    run "warm_s$s" $SOW --sow-reinit grad --seed "$s"
  done
  run warm_r64      --architecture sow --rank 64 --sow-accumulation 200 --sow-lr 0.001 --sow-reinit grad
  run warm_combo    --architecture sow --rank 64 --sow-accumulation 200 --sow-lr 0.001 --sow-reinit grad --reset-scheduler
  run resetsched9m  $SOW --reset-scheduler
}

streamA > artifacts/r4/streamA.log 2>&1 &
PA=$!
sleep 30
streamB > artifacts/r4/streamB.log 2>&1 &
PB=$!
wait $PA $PB
echo "=== stage 2 done ($(date -u +%H:%M:%S)) ==="
touch artifacts/r4/STAGE2_DONE
