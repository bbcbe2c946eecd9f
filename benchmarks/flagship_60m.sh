#!/bin/bash
# The reference's flagship experiment (readme.md:6-25), end-to-end on the
# real chip: llama-60m, 25k steps, seq 256, bf16, lr 0.01 cosine (5% warmup,
# min_lr_ratio 0.03, weight_decay 0), dense AdamW vs SoW r=50 acc=5000
# sow_lr 1e-3, total batch 256.
#
# Data: real C4 is egress-blocked in this environment, so the corpus is
# ~550 MB of local text (Python sources + docs) through a 32k BPE tokenizer
# trained offline (artifacts/bpe32k.json; data/local_text.py) — same
# pipeline shape as the reference's C4+t5-base, held-out validation split
# by file-path hash. See PARITY.md "Flagship run" for the caveats.
#
# ~2h per arch at ~274 ms/step on v5e-1. Usage:
#   bash benchmarks/flagship_60m.sh [outdir]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/flagship}
ROOTS=/opt/venv/lib/python3.12/site-packages,/usr/lib/python3.11
TOK=artifacts/bpe32k.json
mkdir -p "$OUT"

COMMON="--model llama_60m --batch-size 256 --max-length 256
  --num-training-steps 25000 --weight-decay 0.0
  --scheduler cosine --min-lr-ratio 0.03
  --data-dir $ROOTS --tokenizer-path $TOK
  --token-cache-dir artifacts/tokcache
  --eval-every 2000 --eval-tokens 5000000 --logging-steps 200
  --save-every 1000 --auto-restart 3"

# The readme's lr 0.01 is the SOW command's lr (it mostly drives the
# embed/norm/head group; the factors train at sow_lr). There is no dense
# command in the readme, and measured twice here, dense at lr 0.01
# destabilizes after warmup (loss 3.0 -> 6.34 unigram plateau, grad-norm
# spikes >200 by step 1800) — so the dense BASELINE runs at the standard
# full-rank lr for this scale, 1e-3 (stable; see PARITY.md).
for arch in linear sow; do
  extra="--lr 0.001"
  if [ "$arch" = "sow" ]; then
    extra="--lr 0.01 --rank 50 --sow-accumulation 5000 --sow-lr 0.001"
  fi
  # re-runnable across round boundaries: resume from the latest checkpoint
  # when one exists (a completed arch resumes at step 25000 and exits
  # immediately, so finished arms are skipped for free)
  if ls "$OUT/${arch}_ckpt"/*/ >/dev/null 2>&1; then
    extra="$extra --continue-from $OUT/${arch}_ckpt"
  fi
  echo "=== flagship $arch ==="
  # watchdog: the tunneled chip can wedge mid-run (threads all in futex
  # wait, no exception raised) — kill + resume from the latest checkpoint
  # if the metrics file stops advancing for 15 min.
  bash benchmarks/watchdog_run.sh "$OUT/$arch.jsonl" 900 8 "$OUT/${arch}_ckpt" -- \
    python -m sow_tpu.train.pretrain $COMMON --architecture "$arch" $extra \
    --metrics-path "$OUT/$arch.jsonl" --save-dir "$OUT/${arch}_ckpt" \
    >> "$OUT/$arch.log" 2>&1 \
    || echo "=== flagship $arch FAILED (continuing) ==="
done
echo "=== done; curves in $OUT/{linear,sow}.jsonl ==="
