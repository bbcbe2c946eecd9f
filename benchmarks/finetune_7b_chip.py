"""Llama-7B SoW finetune on ONE v5e chip — the reference's flagship finetune
scale (``readme.md:68-84``: llama-7b commonsense, sow r=8) validated end to
end on real TPU hardware.

The reference runs this on a CUDA GPU with a bitsandbytes 8-bit base
(``finetune.py:196-199``); the TPU-native equivalent is the int8 frozen base
(``nn/quant.py``): keep-mode surgery stores each target projection as
per-channel int8, cutting the dominant weights to ~1 byte/param so the full
7B model + SoW factors + optimizer state + activations fit a single 16 GiB
chip.

Memory recipe (and why each piece is needed):
  * host-side init: params are built under ``jax.default_device(cpu)`` —
    materializing the bf16 7B tree on-device first (13.4 GiB) would leave no
    room for the int8 copy during surgery.
  * int8 targets (q/k/v/up/down, ref ``finetune.py:258``): 4.5 GiB ->
    ~2.3 GiB; non-target weights stay bf16.
  * ``remat=True``: activation rematerialization bounds saved activations to
    one layer.

Usage:  python benchmarks/finetune_7b_chip.py [--batch-size 4] [--steps 10]
Prints one JSON line with step time, tokens/s, and the weight-byte split.
"""

from __future__ import annotations

import argparse
import dataclasses
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
    p.add_argument("--model", default="llama_7b")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--no-quantize", action="store_true",
                   help="bf16 frozen base instead of int8 (for the memory A/B)")
    args = p.parse_args()

    from sow_tpu.models import llama as llama_lib
    from sow_tpu.models.configs import get_config
    from sow_tpu.train.commonsense import CommonsenseConfig, build_commonsense_trainer
    from sow_tpu.utils.memory import model_memory_usage, optimizer_memory_usage

    model_cfg = dataclasses.replace(get_config(args.model), remat=True)
    cfg = CommonsenseConfig(
        rank=args.rank,
        mode="keep",
        dtype="bfloat16",
        quantize_base=not args.no_quantize,
        accumulation_steps=0,  # keep the timed loop pure (events are cold-path)
        num_training_steps=10_000,
    )

    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        params = llama_lib.init_params(jax.random.PRNGKey(0), model_cfg, dtype=jnp.bfloat16)
        trainer = build_commonsense_trainer(cfg, model_cfg, params=params)
    t_init = time.perf_counter() - t0
    weight_bytes = model_memory_usage(trainer.params)
    opt_bytes = optimizer_memory_usage(trainer.opt_state)
    print(f"init {t_init:.1f}s; weights {weight_bytes/2**30:.2f} GiB, "
          f"opt {opt_bytes/2**30:.3f} GiB", flush=True)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, model_cfg.vocab_size, (args.batch_size, args.seq_len)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.asarray(np.where(rng.rand(args.batch_size, args.seq_len) < 0.3, -100,
                                  np.asarray(ids)), jnp.int32)

    t0 = time.perf_counter()
    loss = trainer.step(ids, mask, labels)  # compile + host->device transfer
    t_first = time.perf_counter() - t0
    print(f"first step (compile + transfer) {t_first:.1f}s, loss {loss:.3f}", flush=True)

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        loss = trainer.step(ids, mask, labels)  # float() inside = hard sync
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    toks = args.batch_size * args.seq_len
    print(json.dumps({
        "metric": "llama7b_finetune_step",
        "value": round(med * 1000, 1),
        "unit": "ms/step",
        "tokens_per_s": round(toks / med, 1),
        "batch": args.batch_size,
        "seq": args.seq_len,
        "rank": args.rank,
        "weights_gib": round(weight_bytes / 2**30, 2),
        "opt_gib": round(opt_bytes / 2**30, 3),
        "quantized_base": not args.no_quantize,
        "final_loss": round(float(loss), 4),
    }))


if __name__ == "__main__":
    main()
