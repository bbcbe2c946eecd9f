#!/bin/bash
# Round-4 stage 3: measurement passes over the stage-1/2 artifacts.
#   1. speculative decoding MEASURED at the scale it was predicted to win
#      (9m draft -> 350m target; VERDICT item 4) — batch + server paths.
#   2. online-arrival serving benchmark (VERDICT item 5): Poisson + bursty
#      traces, TTFT + completion-latency percentiles, continuous vs
#      fixed-batch vs tiered at llama-1b.
#   3. first end-to-end ACCURACY numbers through the W4 eval harness
#      (VERDICT item 3): trained flagship 60m over the fixture eval sets,
#      fixed-batch vs server engines, greedy + beam-4.
# Usage: bash benchmarks/r4_stage3.sh
set -u
cd "$(dirname "$0")/.."
TOK=artifacts/bpe32k.json
mkdir -p artifacts/r4

echo "=== [1] spec decode 9m -> 350m ==="
timeout 2400 python benchmarks/spec_bench.py \
  --target-ckpt artifacts/r4/350m_ckpt --target-model llama_350m \
  --target-arch linear \
  --draft-ckpt artifacts/r4/draft9m_ckpt --draft-model llama_9m --draft-arch linear \
  --tokenizer-path "$TOK" --server \
  > artifacts/r4/spec_350m.json 2> artifacts/r4/spec_350m.log
echo "spec exit: $?"

echo "=== [2] online serving bench (1b) ==="
timeout 3000 python benchmarks/serve_bench.py --model llama_1b --pool 16 \
  --requests 64 --arrival-rate 2,5,10,25 --tiered \
  > artifacts/r4/serve_online.json 2> artifacts/r4/serve_online.log
echo "online exit: $?"
timeout 1800 python benchmarks/serve_bench.py --model llama_1b --pool 16 \
  --requests 64 --arrival-rate 5 --burst 8 --tiered \
  > artifacts/r4/serve_online_burst.json 2> artifacts/r4/serve_online_burst.log
echo "burst exit: $?"

echo "=== [3] W4 accuracy through the eval harness (trained 60m) ==="
# 64-record ARC-format eval set from the offline corpus (fixture format;
# harness-proof, ~chance score expected, engines must agree exactly)
python /root/repo/benchmarks/make_eval_set.py artifacts/r4/arc_easy_eval.json 64
# best available trained SoW checkpoint: the mitigation arm (or round-3
# flagship) whose latest COMPLETE checkpoint has the highest step —
# completeness-validated so a wedged arm's partial dir can't be selected
CKPT=$(python benchmarks/pick_ckpt.py \
  artifacts/flagship_r4/resetsched_ckpt \
  artifacts/flagship_r4/nolatefold_ckpt \
  artifacts/flagship/sow_ckpt)
echo "W4 accuracy base checkpoint: $CKPT"
for engine in batch server; do
  for beams in 1 4; do
    out="artifacts/r4/acc_${engine}_b${beams}.json"
    timeout 1800 python -m sow_tpu.eval.commonsense_eval \
      --dataset artifacts/r4/arc_easy_eval.json \
      --checkpoint "$CKPT" --checkpoint-arch sow --rank 50 \
      --base-model llama_60m --tokenizer "$TOK" \
      --batch-size 8 --max-new-tokens 24 --num-beams "$beams" \
      --engine "$engine" > "$out" 2> "${out%.json}.log"
    echo "acc $engine b$beams exit: $? -> $(cat "$out" 2>/dev/null)"
  done
done
echo "=== stage 3 done ($(date -u +%H:%M:%S)) ==="
touch artifacts/r4/STAGE3_DONE
