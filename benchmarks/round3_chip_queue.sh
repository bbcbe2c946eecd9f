#!/bin/bash
# Round-3 chip-work queue, run after the flagship + conv9m chain frees the
# (exclusive) TPU chip. Ordered most-valuable-first so a wind-down cut
# costs the least: achievable-HBM roofline ceiling, 1b compute-bound MFU
# (VERDICT r2 #3), 9m draft pretrain, speculative decoding vs the trained
# flagship targets, tiered-pool serving at 1b.
# Usage: bash benchmarks/round3_chip_queue.sh [outdir]
cd "$(dirname "$0")/.."
OUT=${1:-artifacts}
ROOTS=/opt/venv/lib/python3.12/site-packages,/usr/lib/python3.11
TOK=artifacts/bpe32k.json
mkdir -p "$OUT"

echo "=== [1/5] achievable HBM bandwidth (roofline ceiling) ==="
timeout 900 python benchmarks/hbm_peak.py > "$OUT/hbm_peak.json" 2> "$OUT/hbm_peak.log"
echo "hbm exit: $?"

echo "=== [2/5] llama-1b MFU bench ==="
timeout 2400 python benchmarks/mfu_1b.py 64 1 10 > "$OUT/mfu_1b.json" 2> "$OUT/mfu_1b.log"
if [ $? -ne 0 ]; then
  echo "bs64 accum1 failed; retrying with grad-accum 4"
  timeout 2400 python benchmarks/mfu_1b.py 64 4 10 > "$OUT/mfu_1b.json" 2>> "$OUT/mfu_1b.log"
fi
echo "mfu exit: $?"

echo "=== [3/5] draft llama-9m pretrain ==="
bash benchmarks/watchdog_run.sh "$OUT/draft9m.jsonl" 600 5 "$OUT/draft9m_ckpt" -- \
  python -m sow_tpu.train.pretrain \
  --model llama_9m --architecture linear --batch-size 256 --max-length 256 \
  --num-training-steps 3000 --lr 0.001 --weight-decay 0.0 \
  --scheduler cosine --min-lr-ratio 0.03 \
  --data-dir "$ROOTS" --tokenizer-path "$TOK" \
  --token-cache-dir artifacts/tokcache \
  --steps-per-dispatch 8 \
  --eval-every 0 --logging-steps 200 --save-every 1000 \
  --save-dir "$OUT/draft9m_ckpt" --metrics-path "$OUT/draft9m.jsonl" \
  > "$OUT/draft9m.log" 2>&1
echo "draft exit: $?"

echo "=== [4/5] speculative decoding bench ==="
for arch in sow linear; do
  timeout 2400 python benchmarks/spec_bench.py \
    --target-ckpt "artifacts/flagship/${arch}_ckpt" --target-model llama_60m \
    --target-arch "$arch" \
    --draft-ckpt "$OUT/draft9m_ckpt" --draft-model llama_9m --draft-arch linear \
    --tokenizer-path "$TOK" --server \
    > "$OUT/spec_${arch}.json" 2> "$OUT/spec_${arch}.log"
  echo "spec $arch exit: $?"
done

echo "=== [5/5] tiered serving bench (1b) ==="
timeout 2400 python benchmarks/serve_bench.py --model llama_1b --pool 16 --requests 64 \
  --tiered > "$OUT/serve_tiered.json" 2> "$OUT/serve_tiered.log"
echo "tiered exit: $?"
echo "=== chip queue done ==="

echo "=== [6/7] step anatomy (roofline attribution, 60m flagship shapes) ==="
timeout 2400 python benchmarks/step_anatomy.py llama_60m 256 256 15 \
  > "$OUT/step_anatomy.json" 2> "$OUT/step_anatomy.log"
echo "anatomy exit: $?"

echo "=== [7/8] orbax save/restore on-chip parity (transfer-integrity audit) ==="
timeout 1200 python benchmarks/orbax_chip_check.py > "$OUT/orbax_check.json" 2>&1
echo "orbax exit: $?"

echo "=== [8/8] TPE GLUE sweep end-to-end on chip (ref glue_sweep.py bayes box) ==="
timeout 2400 python -m sow_tpu.train.sweep --workload glue --tpe-trials 12 \
  --glue-model roberta-test --task cola --steps-per-run 60 \
  --ranks 4 8 16 --accumulations 20 40 --lrs 1e-5 1e-3 --sow-lrs 1e-5 1e-2 \
  --out "$OUT/glue_tpe_sweep.jsonl" > "$OUT/glue_tpe_sweep.log" 2>&1
echo "tpe sweep exit: $?"
tail -1 "$OUT/glue_tpe_sweep.log"
