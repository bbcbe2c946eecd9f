#!/bin/bash
# Round-5 dispatch-depth probe: the 60m headline bench is host-dispatch
# bound (r3 roofline closure); K steps/dispatch amortizes per-program
# overhead. Measure K=8 (current default) vs K=16 vs K=32 on the free
# chip after the measurement chain finishes, to decide the bench default.
# Usage: bash benchmarks/r5_k16_probe.sh
set -u
cd "$(dirname "$0")/.."
while [ ! -f artifacts/r4/STAGE3_DONE ] || [ ! -f artifacts/r4/STAGE4_DONE ]; do
  sleep 60
done
out=artifacts/r4/k_probe.jsonl
: > "$out"
for K in 8 16 32; do
  for arch in linear sow; do
    line=$(BENCH_STEPS_PER_DISPATCH=$K timeout 1500 python bench.py --child "$arch" 32 2>/dev/null | tail -1)
    echo "{\"K\": $K, \"arch\": \"$arch\", \"r\": $line}" >> "$out"
  done
done
echo done >> "$out"
