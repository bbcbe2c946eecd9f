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


def make_arrivals(rng, n, rate, burst=1):
    """Arrival offsets (seconds) for an open-loop trace. ``burst=1``:
    Poisson at ``rate`` req/s. ``burst=k``: bursty — arrival EPOCHS are
    Poisson at rate/k and each epoch delivers k back-to-back requests
    (same mean rate, k-fold burstier)."""
    epochs = []
    t = 0.0
    while len(epochs) * burst < n:
        t += rng.exponential(burst / rate)
        epochs.append(t)
    arr = [e for e in epochs for _ in range(burst)][:n]
    return arr


def _pctl(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else None


def run_server_online(params, cfg, reqs, arrivals, pool, cache_dtype, max_len,
                      decode_chunk=8, tiered=False):
    """Open-loop online serving: requests are submitted at their trace
    times while the engine runs; per-request completion latency (and, for
    the continuous engine, the admit-dispatch TTFT proxy) comes out of the
    engine's ``request_times`` / the bench's own submit/done marks."""
    from sow_tpu.eval.serve import GenerationServer
    from sow_tpu.eval.tiered import TieredServer

    if tiered:
        short = 128
        srv = TieredServer(
            params, cfg,
            tiers=((pool // 2, short), (pool - pool // 2, max_len)),
            cache_dtype=cache_dtype, prompt_buckets=(32, 64, 128, 256),
            decode_chunk=decode_chunk,
        )
    else:
        srv = GenerationServer(
            params, cfg, max_batch=pool, max_len=max_len,
            cache_dtype=cache_dtype, prompt_buckets=(32, 64, 128, 256),
            decode_chunk=decode_chunk,
        )
    # compile every (bucket, group) prefill signature up front: admission
    # groups form by arrival timing, so a bursty trace can hit a signature
    # the warm pass never formed — a cold 1b prefill compile mid-trace
    # measured as a 5x throughput collapse + 30s TTFT p95
    srv.warmup_prefills()
    def busy(s):
        subs = s.servers if hasattr(s, "servers") else [s]
        return any(
            sub.pending or any(x is not None for x in sub.slots) for sub in subs
        )

    submit_t, done_t, rid_of = {}, {}, {}
    t0 = time.perf_counter()
    i = 0
    n_tok = 0
    while i < len(reqs) or busy(srv):
        now = time.perf_counter() - t0
        while i < len(reqs) and arrivals[i] <= now:
            rid = srv.submit(reqs[i][0], max_new_tokens=reqs[i][1])
            rid_of[i], submit_t[rid] = rid, now
            i += 1
        if i < len(reqs) and not busy(srv):
            # idle until the next arrival (open-loop: the device really
            # would sit idle here)
            time.sleep(max(arrivals[i] - (time.perf_counter() - t0), 0.0))
            continue
        done = srv.step()
        tnow = time.perf_counter() - t0
        for rid, toks in done.items():
            done_t[rid] = tnow
            n_tok += len(toks)
    makespan = time.perf_counter() - t0
    lat = [done_t[r] - submit_t[r] for r in done_t]
    ttft = None
    if not tiered:
        rt = srv.request_times
        ttft = [rt[r]["admit"] - rt[r]["submit"] for r in rt if "admit" in rt[r]]
    return {
        "generated_tokens": n_tok,
        "makespan_s": round(makespan, 3),
        "tokens_per_s": round(n_tok / makespan, 1),
        "latency_p50_s": round(_pctl(lat, 50), 3),
        "latency_p95_s": round(_pctl(lat, 95), 3),
        "latency_p99_s": round(_pctl(lat, 99), 3),
        "ttft_p50_s": round(_pctl(ttft, 50), 4) if ttft else None,
        "ttft_p95_s": round(_pctl(ttft, 95), 4) if ttft else None,
        "ttft_p99_s": round(_pctl(ttft, 99), 4) if ttft else None,
    }


def run_fixed_batch_online(params, cfg, reqs, arrivals, pool, cache_dtype,
                           eos=None):
    """Reference-style engine under online arrival: the host accumulates
    arrivals and launches a full-pool batch as soon as one is available
    (or when no arrivals remain). Per-request latency = batch END - its
    arrival; the batch's generate() is one opaque jit call, so there is no
    earlier completion mark (that opacity IS the fixed-batch cost)."""
    from sow_tpu.eval.generate import greedy_generate, left_pad

    lat = []
    n_tok = 0
    t0 = time.perf_counter()
    queue = []  # indices of arrived, unserved requests
    i = 0
    while i < len(reqs) or queue:
        now = time.perf_counter() - t0
        while i < len(reqs) and arrivals[i] <= now:
            queue.append(i)
            i += 1
        if len(queue) < pool and i < len(reqs):
            time.sleep(min(0.002, max(arrivals[i] - (time.perf_counter() - t0), 0.0)))
            continue
        chunk, queue = queue[:pool], queue[pool:]
        if not chunk:
            continue
        prompts = [reqs[j][0] for j in chunk]
        budget = max(reqs[j][1] for j in chunk)
        ids, mask = left_pad(prompts, 0)
        out = greedy_generate(
            params, jnp.asarray(ids), jnp.asarray(mask), cfg,
            max_new_tokens=budget, cache_dtype=cache_dtype, eos_token_id=eos,
        )
        out_np = np.asarray(jax.block_until_ready(out))
        tend = time.perf_counter() - t0
        for row, j in enumerate(chunk):
            lat.append(tend - arrivals[j])
            # count tokens actually decoded for THIS request (its own
            # budget, minus any eos padding) — the continuous engine counts
            # emitted tokens, so counting the nominal budget here would
            # bias the tokens_per_s comparison whenever generation stops
            # early
            toks = out_np[row, : reqs[j][1]]
            n = len(toks)
            if eos is not None:
                while n > 0 and toks[n - 1] == eos:
                    n -= 1
                if n < len(toks):
                    n += 1  # the terminating eos itself was emitted
            n_tok += n
    makespan = time.perf_counter() - t0
    return {
        "generated_tokens": n_tok,
        "makespan_s": round(makespan, 3),
        "tokens_per_s": round(n_tok / makespan, 1),
        "latency_p50_s": round(_pctl(lat, 50), 3),
        "latency_p95_s": round(_pctl(lat, 95), 3),
        "latency_p99_s": round(_pctl(lat, 99), 3),
        "ttft_p50_s": None, "ttft_p95_s": None, "ttft_p99_s": None,
    }


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
    p.add_argument("--arrival-rate", type=str, default="0",
                   help="online mode: open-loop arrival rate (requests/s), "
                        "comma-separated for a sweep in one process (compile "
                        "reuse); 0 = offline all-at-once (default). Reports "
                        "TTFT + completion-latency percentiles per engine.")
    p.add_argument("--burst", type=int, default=1,
                   help="online mode: arrivals come in back-to-back bursts "
                        "of this size (Poisson epochs at rate/burst)")
    args = p.parse_args()

    from sow_tpu.models import get_config, init_params

    cfg = get_config(args.model)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    reqs = make_workload(rng, cfg, args.requests)
    cache_dtype = jnp.int8 if args.int8_kv_cache else None
    max_len = 224 + 64  # workload ceiling

    rates = [float(r) for r in args.arrival_rate.split(",")]
    if any(r > 0 for r in rates):
        for rate in rates:
            arrivals = make_arrivals(rng, len(reqs), rate, args.burst)
            engines = {
                "continuous": lambda: run_server_online(
                    params, cfg, reqs, arrivals, args.pool, cache_dtype, max_len,
                    args.decode_chunk,
                ),
                "fixed_batch": lambda: run_fixed_batch_online(
                    params, cfg, reqs, arrivals, args.pool, cache_dtype,
                ),
            }
            if args.tiered:
                engines["tiered"] = lambda: run_server_online(
                    params, cfg, reqs, arrivals, args.pool, cache_dtype, max_len,
                    args.decode_chunk, tiered=True,
                )
            for name, fn in engines.items():
                # warm every (engine, rate) pair: each arrival pattern can
                # hit new admission-group prefill signatures
                fn()
                res = fn()
                res.update(
                    engine=name, model=args.model, pool=args.pool,
                    requests=args.requests, arrival_rate=rate,
                    burst=args.burst, int8_kv=bool(args.int8_kv_cache),
                    offered_load_tok_s=round(
                        rate * float(np.mean([b for _, b in reqs])), 1
                    ),
                )
                print(json.dumps(res), flush=True)
        return

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
