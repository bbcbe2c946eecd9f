#!/bin/bash
# Round-3 continuation chain: wait for the tunneled TPU, then run BOTH
# flagship arms concurrently (per-stream throughput is host-dispatch-bound
# on this chip — two streams each hold their solo rate, halving wall-clock;
# measured 253k + 262k tok/s concurrent vs ~255k solo, PARITY.md
# "Flagship run"), then hand off to after_flagship_queue.sh for conv9m +
# the remaining chip benches.
#
# Usage: nohup bash benchmarks/chip_parallel_chain.sh > artifacts/chipchain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/flagship
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
echo "[chip-wait] chip is live ($(date -u +%H:%M:%S)); starting parallel arms" >&2

# wait for the pre-tokenized cache if a build is in flight (pure CPU; the
# arms would otherwise race to rebuild it after a re-image)
while [ -f /tmp/cachebuild.pid ] && kill -0 "$(cat /tmp/cachebuild.pid)" 2>/dev/null; do
  echo "[chip-wait] waiting for token-cache build" >&2; sleep 30
done

COMMON="--model llama_60m --batch-size 256 --max-length 256
  --num-training-steps 25000 --weight-decay 0.0
  --scheduler cosine --min-lr-ratio 0.03
  --data-dir $ROOTS --tokenizer-path $TOK
  --token-cache-dir artifacts/tokcache
  --eval-every 2000 --eval-tokens 5000000 --logging-steps 200
  --save-every 1000 --auto-restart 3"

pids=()
for arch in linear sow; do
  extra="--lr 0.001"
  if [ "$arch" = "sow" ]; then
    extra="--lr 0.01 --rank 50 --sow-accumulation 5000 --sow-lr 0.001"
  fi
  if ls "$OUT/${arch}_ckpt"/*/ >/dev/null 2>&1; then
    extra="$extra --continue-from $OUT/${arch}_ckpt"
  fi
  echo "=== flagship $arch (parallel) ===" >&2
  bash benchmarks/watchdog_run.sh "$OUT/$arch.jsonl" 900 8 "$OUT/${arch}_ckpt" -- \
    python -m sow_tpu.train.pretrain $COMMON --architecture "$arch" $extra \
    --metrics-path "$OUT/$arch.jsonl" --save-dir "$OUT/${arch}_ckpt" \
    >> "$OUT/$arch.log" 2>&1 &
  pids+=($!)
  sleep 20   # stagger: let the first arm claim the device + compile first
done
echo "[chain] watchdog pids: ${pids[*]}" >&2
exec bash benchmarks/after_flagship_queue.sh "${pids[@]}"
