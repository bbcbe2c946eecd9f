#!/bin/bash
# Round-4 stage 4: GLUE sweep with a NON-degenerate objective (VERDICT
# item 7). The flagship-pretrained 60m is the base; the task is the
# real-text pysrc classification stand-in (train/glue.py
# load_local_cls_batches) over the same corpus + BPE tokenizer.
# Three arms at equal trial budget:
#   baseline — 1 step at lr 1e-9 (≈ frozen base + random head)
#   random   — 14 random-search trials over the reference bayes box
#   tpe      — 14 TPE trials over the same box
# Done = best TPE eval metric clearly above the frozen baseline, and the
# comparison vs random at equal budget recorded on-chip.
# Usage: bash benchmarks/r4_stage4.sh
set -u
cd "$(dirname "$0")/.."
ROOTS=/opt/venv/lib/python3.12/site-packages,/usr/lib/python3.11
TOK=artifacts/bpe32k.json
OUT=artifacts/r4
mkdir -p "$OUT"

# idempotence: round 5 runs stage 4 concurrently with stage 3 to fit the
# round budget; whichever invocation comes second short-circuits here
if [ -f "$OUT/STAGE4_DONE" ] || [ -f "$OUT/STAGE4_RUNNING" ]; then
  echo "stage 4 already running/done; skipping duplicate invocation"
  exit 0
fi
touch "$OUT/STAGE4_RUNNING"
trap 'rm -f "$OUT/STAGE4_RUNNING"' EXIT

# completeness-validated pick (see pick_ckpt.py; a wedged arm's partial
# dir must not be selected — VERDICT r4 weak #4)
BASE=$(python benchmarks/pick_ckpt.py \
  artifacts/flagship_r4/resetsched_ckpt \
  artifacts/flagship_r4/nolatefold_ckpt \
  artifacts/flagship/sow_ckpt)
echo "GLUE base checkpoint: $BASE"

COMMON="--workload glue --glue-model llama_60m --glue-data local --task pysrc
  --tokenizer-path $TOK --data-dir $ROOTS
  --base-checkpoint $BASE --base-arch sow --base-rank 50
  --batch-size 32 --max-length 128 --eval-batches 16
  --ranks 4 8 16 32 --accumulations 100 200 400
  --lrs 1e-5 1e-3 --sow-lrs 1e-5 1e-3"

echo "=== [baseline] frozen base ==="
timeout 1200 python -m sow_tpu.train.sweep --workload glue \
  --glue-model llama_60m --glue-data local --task pysrc \
  --tokenizer-path "$TOK" --data-dir "$ROOTS" \
  --base-checkpoint "$BASE" --base-arch sow --base-rank 50 \
  --batch-size 32 --max-length 128 --eval-batches 16 \
  --ranks 8 --accumulations 1000 --lrs 1e-9 --sow-lrs 1e-9 \
  --steps-per-run 1 --out "$OUT/glue_baseline.jsonl" \
  > "$OUT/glue_baseline.log" 2>&1
echo "baseline exit: $?"

echo "=== [random] 14 trials ==="
timeout 3600 python -m sow_tpu.train.sweep $COMMON \
  --steps-per-run 300 --random-trials 14 \
  --out "$OUT/glue_random.jsonl" > "$OUT/glue_random.log" 2>&1
echo "random exit: $?"

echo "=== [tpe] 14 trials ==="
timeout 3600 python -m sow_tpu.train.sweep $COMMON \
  --steps-per-run 300 --tpe-trials 14 \
  --out "$OUT/glue_tpe.jsonl" > "$OUT/glue_tpe.log" 2>&1
echo "tpe exit: $?"
echo "=== stage 4 done ($(date -u +%H:%M:%S)) ==="
touch "$OUT/STAGE4_DONE"
