"""Speculative-decoding throughput: trained draft + target on the real chip.

Measures greedy target-only decode vs ``speculative_generate`` (draft
proposes gamma tokens, target verifies in one forward) on prompts drawn from
the same local corpus the flagship checkpoints were trained on — acceptance
rate, and therefore speedup, is only meaningful when draft and target were
trained on the same distribution with the same tokenizer.

Usage (after the flagship run has produced checkpoints):
  python benchmarks/spec_bench.py \
    --target-ckpt artifacts/flagship/sow_ckpt --target-model llama_60m --target-arch sow \
    --draft-ckpt artifacts/draft9m_ckpt --draft-model llama_9m --draft-arch linear \
    --tokenizer-path artifacts/bpe32k.json
Prints one JSON line per (batch, gamma) config.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def load_params(model: str, arch: str, ckpt: str | None, dtype=jnp.bfloat16):
    """Rebuild the pretrain trainer's param template, restore the checkpoint,
    and fold SoW layers to dense for serving (``merge_sow_to_dense``)."""
    from sow_tpu.checkpoint import latest_checkpoint, restore_params
    from sow_tpu.models import get_config, init_params
    from sow_tpu.models import llama as llama_lib
    from sow_tpu.nn import SoWConfig, prepare_sow

    cfg = get_config(model)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if arch == "sow":
        params = prepare_sow(
            params,
            SoWConfig(
                target_modules=llama_lib.LLAMA_TARGET_MODULES,
                rank=50, decompose=None, dtype=dtype,
            ),
            jax.random.PRNGKey(1),
        )
    if ckpt:
        path = latest_checkpoint(ckpt) or ckpt
        params, _ = restore_params(params, path)
    if arch == "sow":
        params = llama_lib.merge_sow_to_dense(params)
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params), cfg


def corpus_prompts(tokenizer_path: str, n: int, prompt_len: int) -> list[list[int]]:
    """Prompt token lists cut from real corpus files (same distribution as
    the flagship training data)."""
    if tokenizer_path.endswith(".json"):
        from sow_tpu.data.local_text import load_local_tokenizer

        tok = load_local_tokenizer(tokenizer_path)
    else:
        from sow_tpu.data.byte_tokenizer import load_tokenizer_or_byte

        tok = load_tokenizer_or_byte(tokenizer_path)
    files = sorted(
        glob.glob("/opt/venv/lib/python3.12/site-packages/numpy/**/*.py", recursive=True)
    )
    prompts, rng = [], np.random.RandomState(0)
    for f in files:
        try:
            text = open(f, errors="ignore").read()
        except OSError:
            continue
        ids = tok(text)["input_ids"]
        while len(ids) >= prompt_len and len(prompts) < n:
            prompts.append(ids[:prompt_len])
            ids = ids[prompt_len + int(rng.randint(0, 64)):]
        if len(prompts) >= n:
            break
    if len(prompts) < n:  # pad out with repeats
        prompts = (prompts * ((n // max(len(prompts), 1)) + 1))[:n]
    return prompts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target-model", default="llama_60m")
    p.add_argument("--target-arch", default="sow", choices=("linear", "sow"))
    p.add_argument("--target-ckpt", default=None)
    p.add_argument("--draft-model", default="llama_9m")
    p.add_argument("--draft-arch", default="linear", choices=("linear", "sow"))
    p.add_argument("--draft-ckpt", default=None)
    p.add_argument("--tokenizer-path", default="artifacts/bpe32k.json")
    p.add_argument("--batch-sizes", default="1,8")
    p.add_argument("--gammas", default="2,4,6")
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--server", action="store_true",
                   help="also bench the continuous-batching server with and "
                        "without the draft (speculative serving)")
    p.add_argument("--pool", type=int, default=8)
    p.add_argument("--server-requests", type=int, default=32)
    p.add_argument("--server-gamma", type=int, default=4)
    args = p.parse_args()

    from sow_tpu.eval.generate import greedy_generate, left_pad
    from sow_tpu.eval.speculative import speculative_generate

    target, tcfg = load_params(args.target_model, args.target_arch, args.target_ckpt)
    draft, dcfg = load_params(args.draft_model, args.draft_arch, args.draft_ckpt)
    assert tcfg.vocab_size == dcfg.vocab_size, "draft/target must share a tokenizer"

    max_bs = max(int(b) for b in args.batch_sizes.split(","))
    prompts = corpus_prompts(args.tokenizer_path, max_bs, args.prompt_len)

    for bs in (int(b) for b in args.batch_sizes.split(",")):
        ids, mask = left_pad(prompts[:bs], 0)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)

        def run_greedy():
            out = greedy_generate(target, ids, mask, tcfg, max_new_tokens=args.new_tokens)
            return np.asarray(out)

        run_greedy()  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run_greedy()
            times.append(time.perf_counter() - t0)
        base_s = float(np.median(times))
        base_tps = bs * args.new_tokens / base_s
        print(json.dumps({
            "metric": "greedy_baseline", "batch": bs,
            "value": round(base_tps, 1), "unit": "tokens/s",
            "ms": round(base_s * 1e3, 1),
        }), flush=True)

        for gamma in (int(g) for g in args.gammas.split(",")):
            def run_spec():
                out, stats = speculative_generate(
                    target, draft, ids, mask, tcfg, dcfg,
                    max_new_tokens=args.new_tokens, gamma=gamma,
                )
                np.asarray(out)
                return jax.tree_util.tree_map(np.asarray, stats)

            stats = run_spec()  # compile
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                stats = run_spec()
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            tps = bs * args.new_tokens / med
            print(json.dumps({
                "metric": "speculative", "batch": bs, "gamma": gamma,
                "value": round(tps, 1), "unit": "tokens/s",
                "ms": round(med * 1e3, 1),
                "vs_greedy": round(tps / base_tps, 3),
                "rounds": int(stats["rounds"]),
                "tokens_per_round": round(float(stats["tokens_per_round"]), 2),
            }), flush=True)

    if args.server:
        from sow_tpu.eval.serve import GenerationServer

        n = args.server_requests
        reqs = (prompts * ((n // max(len(prompts), 1)) + 1))[:n]

        def run_server(spec: bool):
            kw = dict(max_batch=args.pool, max_len=args.prompt_len + args.new_tokens,
                      prompt_buckets=(32, 64, 128, 256))
            if spec:
                kw.update(draft_params=draft, draft_cfg=dcfg,
                          spec_gamma=args.server_gamma)
            srv = GenerationServer(target, tcfg, **kw)
            for pr in reqs:
                srv.submit(pr, max_new_tokens=args.new_tokens)
            t0 = time.perf_counter()
            out = srv.run()
            dt = time.perf_counter() - t0
            return sum(len(v) for v in out.values()), dt

        for spec in (False, True):
            run_server(spec)  # warm
            toks, dt = run_server(spec)
            print(json.dumps({
                "metric": "server_speculative" if spec else "server_plain",
                "pool": args.pool, "requests": n,
                "gamma": args.server_gamma if spec else None,
                "generated_tokens": toks, "seconds": round(dt, 3),
                "value": round(toks / dt, 1), "unit": "tokens/s",
            }), flush=True)


if __name__ == "__main__":
    main()
