"""Continuous-batching serving throughput vs fixed-batch generation.

The reference's eval loop (``commonsense_evaluate.py:58-90``) decodes one
fixed batch at a time: every request in a batch pays for the batch's
longest completion, and the device idles between batches while the host
regroups. ``eval/serve.py`` keeps a fixed slot pool and retires/admits
per-request. This benchmark measures both on the SAME ragged workload
(mixed prompt lengths, mixed completion budgets) and reports end-to-end
generated-tokens/sec.

Usage: python benchmarks/serve_bench.py [--model llama_1b] [--pool 16]
       [--requests 64] [--int8-kv-cache]
Prints one JSON line per engine.
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


def make_workload(rng, cfg, n_requests):
    """Ragged eval-like traffic: prompt lengths 16-224, budgets 8-64."""
    reqs = []
    for _ in range(n_requests):
        plen = int(rng.choice([16, 32, 48, 64, 96, 128, 192, 224]))
        budget = int(rng.choice([8, 16, 24, 32, 48, 64]))
        prompt = list(rng.randint(2, cfg.vocab_size - 1, plen))
        reqs.append((prompt, budget))
    return reqs


def run_fixed_batch(params, cfg, reqs, pool, cache_dtype):
    """Reference-style: chunk into fixed batches, left-pad each batch to its
    longest prompt, decode every batch to the batch-max budget."""
    from sow_tpu.eval.generate import greedy_generate, left_pad

    total_new = 0
    t0 = time.perf_counter()
    for i in range(0, len(reqs), pool):
        chunk = reqs[i : i + pool]
        prompts = [p for p, _ in chunk]
        budget = max(b for _, b in chunk)  # stragglers set the pace
        ids, mask = left_pad(prompts, 0)
        out = greedy_generate(
            params, jnp.asarray(ids), jnp.asarray(mask), cfg,
            max_new_tokens=budget, cache_dtype=cache_dtype,
        )
        jax.block_until_ready(out)
        total_new += sum(b for _, b in chunk)  # tokens actually requested
    return total_new, time.perf_counter() - t0


def run_fixed_batch_beam(params, cfg, reqs, pool, cache_dtype, k):
    """Reference-style beam eval (commonsense_evaluate.py:79-85): fixed
    batches of pool/k requests (same cache rows as the server's pool),
    each batch decoded to its max budget with beam_generate."""
    from sow_tpu.eval.generate import beam_generate, left_pad

    per_batch = max(pool // k, 1)
    total_new = 0
    t0 = time.perf_counter()
    for i in range(0, len(reqs), per_batch):
        chunk = reqs[i : i + per_batch]
        budget = max(b for _, b in chunk)
        ids, mask = left_pad([p for p, _ in chunk], 0)
        out = beam_generate(
            params, jnp.asarray(ids), jnp.asarray(mask), cfg,
            max_new_tokens=budget, num_beams=k, cache_dtype=cache_dtype,
        )
        jax.block_until_ready(out)
        total_new += sum(b for _, b in chunk)
    return total_new, time.perf_counter() - t0


def run_server(params, cfg, reqs, pool, cache_dtype, max_len, decode_chunk=8,
               num_beams=1):
    from sow_tpu.eval.serve import GenerationServer

    srv = GenerationServer(
        params, cfg, max_batch=pool, max_len=max_len,
        cache_dtype=cache_dtype, prompt_buckets=(32, 64, 128, 256),
        decode_chunk=decode_chunk, num_beams=num_beams,
    )
    for prompt, budget in reqs:
        srv.submit(prompt, max_new_tokens=budget)
    t0 = time.perf_counter()
    out = srv.run()
    dt = time.perf_counter() - t0
    return sum(len(v) for v in out.values()), dt


def run_tiered(params, cfg, reqs, pool, cache_dtype, max_len, decode_chunk=8):
    """Length-tiered pools at (approximately) the single-pool slot count:
    half the slots in a short tier, half in the deep tier."""
    from sow_tpu.eval.tiered import TieredServer

    short = 128  # covers prompt<=96 + budget<=32 traffic
    srv = TieredServer(
        params, cfg,
        tiers=((pool // 2, short), (pool - pool // 2, max_len)),
        cache_dtype=cache_dtype, prompt_buckets=(32, 64, 128, 256),
        decode_chunk=decode_chunk,
    )
    for prompt, budget in reqs:
        srv.submit(prompt, max_new_tokens=budget)
    t0 = time.perf_counter()
    out = srv.run()
    dt = time.perf_counter() - t0
    return sum(len(v) for v in out.values()), dt, srv.cache_bytes()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama_1b")
    p.add_argument("--pool", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--int8-kv-cache", action="store_true")
    p.add_argument("--decode-chunk", type=int, default=16)
    p.add_argument("--num-beams", type=int, default=1,
                   help=">1: compare fixed-batch beam_generate vs the "
                        "server's grouped beam mode (same cache rows)")
    p.add_argument("--tiered", action="store_true",
                   help="also run the length-tiered pool server (greedy only)")
    args = p.parse_args()

    from sow_tpu.models import get_config, init_params

    cfg = get_config(args.model)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    reqs = make_workload(rng, cfg, args.requests)
    cache_dtype = jnp.int8 if args.int8_kv_cache else None
    max_len = 224 + 64  # workload ceiling

    k = args.num_beams
    if k > 1:
        fixed = lambda: run_fixed_batch_beam(params, cfg, reqs, args.pool, cache_dtype, k)
    else:
        fixed = lambda: run_fixed_batch(params, cfg, reqs, args.pool, cache_dtype)
    server = lambda: run_server(
        params, cfg, reqs, args.pool, cache_dtype, max_len, args.decode_chunk, k
    )

    # warm pass compiles every signature each engine will see (fixed-batch
    # recompiles per ragged (prompt_len, budget) chunk signature — running
    # the FULL workload once makes the measured pass compile-free for both)
    fixed()
    server()

    n_fixed, dt_fixed = fixed()
    n_srv, dt_srv = server()

    for name, n, dt in (("fixed_batch", n_fixed, dt_fixed), ("continuous", n_srv, dt_srv)):
        print(json.dumps({
            "engine": name, "model": args.model, "pool": args.pool,
            "requests": args.requests, "generated_tokens": n,
            "seconds": round(dt, 3), "tokens_per_s": round(n / dt, 1),
            "int8_kv": bool(args.int8_kv_cache), "num_beams": k,
        }), flush=True)

    if args.tiered and k == 1:
        tiered = lambda: run_tiered(
            params, cfg, reqs, args.pool, cache_dtype, max_len, args.decode_chunk
        )
        tiered()  # warm
        n_t, dt_t, cache_bytes = tiered()
        print(json.dumps({
            "engine": "tiered", "model": args.model, "pool": args.pool,
            "requests": args.requests, "generated_tokens": n_t,
            "seconds": round(dt_t, 3), "tokens_per_s": round(n_t / dt_t, 1),
            "cache_mib": round(cache_bytes / 2**20, 1),
            "int8_kv": bool(args.int8_kv_cache),
        }), flush=True)


if __name__ == "__main__":
    main()
