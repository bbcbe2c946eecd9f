"""Where does speculative decoding pay on this chip? Measured break-even.

The trained-pair spec bench (spec_bench.py, llama-60m target / llama-9m
draft) measured the acceptance machinery working (up to 4.1 kept
tokens/round at gamma=6) yet a 0.24-0.30x SLOWDOWN — at 60m the target's
own decode step is too close to the draft's for rounds to amortize. This
script grounds that with per-token decode latencies across the model
ladder (greedy_generate's in-program lax.scan loop — no dispatch noise)
and prints, for each draft/target pair, the predicted spec speedup at the
MEASURED acceptance profiles, plus the latency ratio each gamma needs to
break even.

Model: one spec round costs gamma draft steps + 1 target step (the
verify forward scores gamma+1 positions in one pass — same weight reads
as a single-token step; KV growth is second-order) and yields
tokens_per_round(gamma, acceptance) kept tokens, vs 1 target step per
token for plain greedy:

    speedup(gamma) = tokens_per_round * t_T / (gamma * t_D + t_T)
    break-even:      t_T / t_D  >  gamma / (tokens_per_round - 1)

Usage: python benchmarks/spec_breakeven.py [batch] — one JSON line/pair.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# kept-tokens/round measured on the real trained pair (60m/9m flagship +
# draft checkpoints, artifacts/spec_{linear,sow}.json): greedy target,
# same-corpus draft. Two profiles: the dense-target run and the (higher-
# acceptance) SoW-target run.
MEASURED_ALPHA = {
    "linear@bs1": {2: 1.69, 4: 2.02, 6: 2.31},
    "sow@bs1": {2: 1.87, 4: 2.89, 6: 4.10},
}

MODELS = ["llama_9m", "llama_60m", "llama_350m", "llama_1b"]


def per_token_ms(model: str, batch: int, prompt: int = 64, new: int = 128) -> float:
    from sow_tpu.eval.generate import greedy_generate, left_pad
    from sow_tpu.models import get_config, init_params

    cfg = get_config(model)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(2, cfg.vocab_size - 1, prompt)) for _ in range(batch)]
    ids, mask = left_pad(prompts, 0)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    def run():
        out = greedy_generate(params, ids, mask, cfg, max_new_tokens=new)
        np.asarray(out)

    run()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    del params
    return float(np.median(times)) * 1000.0 / new


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    lat = {}
    for m in MODELS:
        lat[m] = per_token_ms(m, batch)
        print(json.dumps({"metric": "decode_per_token_ms", "model": m,
                          "batch": batch, "value": round(lat[m], 3)}), flush=True)

    for draft in MODELS:
        for target in MODELS:
            if lat[target] <= lat[draft] * 1.5:
                continue
            r = lat[target] / lat[draft]
            row = {"metric": "spec_breakeven", "draft": draft, "target": target,
                   "latency_ratio": round(r, 2), "batch": batch}
            for profile, alphas in MEASURED_ALPHA.items():
                sp = {
                    f"g{g}": round(a * lat[target] / (g * lat[draft] + lat[target]), 2)
                    for g, a in alphas.items()
                }
                row[f"speedup@{profile}"] = sp
            row["breakeven_ratio_g4"] = round(
                4 / (MEASURED_ALPHA["linear@bs1"][4] - 1), 2
            )
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
