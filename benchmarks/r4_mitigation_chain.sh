#!/bin/bash
# Round-4 flagship mitigation runs (VERDICT r3 item 1): test the two
# candidate fixes for the SoW quality gap (ppl 5.03 vs dense 4.49) against
# the measured step-20000-fold regression (4.98 -> 5.03):
#
#   nolatefold  — resume the SoW arm from step 9000 with
#                 --sow-accum-end-frac 0.7 (no fold past 17.5k; re-runs the
#                 10k/15k folds on the original cadence, skips the 20k one)
#   resetsched  — resume from step 9000 with --reset-scheduler: the
#                 reference's own per-cycle sow_lr cosine restart
#                 (simple_train.py:516-523, training_utils.py:192-255), so
#                 the 20k fold's fresh factors get a fresh LR cycle.
#
# Both arms run CONCURRENTLY (per-stream throughput is host-dispatch-bound
# on this chip; two streams each hold near-solo rate — measured in round 3,
# PARITY.md "Flagship run"). ~1.6h wall for 16k steps/arm.
#
# Caveats recorded in the report: only the step-9000 checkpoint survived
# round 3's host re-images, so the 9000-25000 portion re-runs with the data
# stream restarted from its seed (identical for both arms and for the
# round-3 baseline resumes, which also restarted the stream on re-image).
#
# Usage: nohup bash benchmarks/r4_mitigation_chain.sh > artifacts/flagship_r4/chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/flagship_r4
ROOTS=/opt/venv/lib/python3.12/site-packages,/usr/lib/python3.11
TOK=artifacts/bpe32k.json
mkdir -p "$OUT"

PROBE='
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print("probe-ok", jax.devices(), float((x @ x)[0, 0]))
'
n=0
until timeout 240 python -c "$PROBE" 2>&1 | grep -q probe-ok; do
  n=$((n+1))
  echo "[chip-wait] probe $n failed ($(date -u +%H:%M:%S)); retrying in 120s" >&2
  sleep 120
done
echo "[chip-wait] chip is live ($(date -u +%H:%M:%S))" >&2

while [ -f /tmp/cachebuild.pid ] && kill -0 "$(cat /tmp/cachebuild.pid)" 2>/dev/null; do
  echo "[chip-wait] waiting for token-cache build" >&2; sleep 30
done

COMMON="--model llama_60m --batch-size 256 --max-length 256
  --num-training-steps 25000 --weight-decay 0.0
  --scheduler cosine --min-lr-ratio 0.03
  --lr 0.01 --rank 50 --sow-accumulation 5000 --sow-lr 0.001
  --data-dir $ROOTS --tokenizer-path $TOK
  --token-cache-dir artifacts/tokcache
  --eval-every 2000 --eval-tokens 5000000 --logging-steps 200
  --save-every 1000 --auto-restart 3"

pids=()
for arm in nolatefold resetsched; do
  if [ "$arm" = "nolatefold" ]; then
    extra="--sow-accum-end-frac 0.7"
  else
    extra="--reset-scheduler"
  fi
  echo "=== r4 mitigation arm $arm (parallel) ===" >&2
  # 2400s window: cold compile measured at 13-14 min on this host, and the
  # eval+save pause at the 2000-step cadence ran 920s when two streams
  # share the chip — 900s here is what killed the resetsched arm twice
  bash benchmarks/watchdog_run.sh "$OUT/$arm.jsonl" 2400 8 "$OUT/${arm}_ckpt" -- \
    python -m sow_tpu.train.pretrain $COMMON --architecture sow $extra \
    --continue-from "$OUT/${arm}_ckpt" \
    --metrics-path "$OUT/$arm.jsonl" --save-dir "$OUT/${arm}_ckpt" \
    >> "$OUT/$arm.log" 2>&1 &
  pids+=($!)
  sleep 20   # stagger: let the first arm claim the device + compile first
done
for p in "${pids[@]}"; do wait "$p"; done
echo "=== r4 mitigation arms done ($(date -u +%H:%M:%S)) ===" >&2
# free the chip marker for the next queue stage
touch "$OUT/DONE"
