"""Decode (serving) throughput: greedy/beam generation on the real chip.

Reproduces the numbers in PARITY.md "Decode path": bf16 vs int8 KV cache at
weight-bound and cache-bound shapes.

Usage: python benchmarks/decode_bench.py [--model llama_1b] [--batch-size 32]
       [--prompt-len 896] [--new-tokens 128] [--num-beams 1]
Prints one JSON line per cache dtype.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama_1b")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=896)
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--num-beams", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from sow_tpu.eval.generate import beam_generate, greedy_generate, left_pad
    from sow_tpu.models import get_config, init_params

    cfg = get_config(args.model)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    prompts = [
        list(rng.randint(2, cfg.vocab_size - 1, args.prompt_len))
        for _ in range(args.batch_size)
    ]
    ids, mask = left_pad(prompts, 0)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    def decode(cache_dtype):
        if args.num_beams > 1:
            out = beam_generate(
                params, ids, mask, cfg, max_new_tokens=args.new_tokens,
                num_beams=args.num_beams, cache_dtype=cache_dtype,
            )
        else:
            out = greedy_generate(
                params, ids, mask, cfg, max_new_tokens=args.new_tokens,
                cache_dtype=cache_dtype,
            )
        np.asarray(out)  # hard sync

    for name, cd in [("bf16", None), ("int8", jnp.int8)]:
        decode(cd)  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            decode(cd)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        toks = args.batch_size * args.new_tokens
        print(json.dumps({
            "metric": f"decode_{name}",
            "value": round(toks / med, 1),
            "unit": "tokens/s",
            "ms": round(med * 1000, 1),
            "model": args.model,
            "batch": args.batch_size,
            "prompt": args.prompt_len,
            "new": args.new_tokens,
            "beams": args.num_beams,
        }))


if __name__ == "__main__":
    main()
