"""Benchmark: llama_60m SoW pretraining throughput vs dense AdamW baseline.

Runs on whatever accelerator JAX exposes (one TPU chip under the driver).
Prints ONE JSON line:
  {"metric": ..., "value": tokens/sec (SoW), "unit": "tokens/s",
   "vs_baseline": sow_tps / dense_tps}

The BASELINE.md target is SoW >= dense tokens/sec/chip, so vs_baseline >= 1.0
means the SoW machinery is free at the step level (the folded effective-weight
design) while trainable params + optimizer state stay a fraction of dense.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def bench_arch(architecture: str, steps: int = 20, warmup: int = 3) -> dict:
    from sow_tpu.data.synthetic import random_stream
    from sow_tpu.optim.adamw import apply_updates
    from sow_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="llama_60m",
        architecture=architecture,
        rank=50,
        sow_accumulation=0,  # keep the hot loop pure; accumulation is cold-path
        batch_size=64,
        max_length=256,
        dtype="bfloat16",
        num_training_steps=10_000,
        mesh_data=-1,
        mesh_fsdp=1,
        mesh_model=1,
    )
    trainer = Trainer(cfg)
    data = random_stream(cfg.batch_size, cfg.max_length, trainer.model_cfg.vocab_size)
    ids = jnp.asarray(next(data)["input_ids"])
    mask = jnp.ones_like(ids)

    # K serial update steps inside ONE jitted fori_loop: timing is then pure
    # device compute — immune to async-dispatch quirks of the remote runtime
    # (block_until_ready alone was observed not to synchronize it).
    opt = trainer.opt

    def one_step(carry):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(lambda p: trainer._loss_fn(p, ids, mask))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run_k(params, opt_state, k):
        def body(_, carry):
            params, opt_state, _ = carry
            return one_step((params, opt_state))

        zero = jnp.float32(0)
        params, opt_state, loss = jax.lax.fori_loop(
            0, k, body, (params, opt_state, zero)
        )
        return params, opt_state, loss

    p, s, loss = run_k(trainer.params, trainer.opt_state, warmup)
    float(loss)  # hard sync via host transfer
    t0 = time.perf_counter()
    p, s, loss = run_k(p, s, steps)
    float(loss)
    dt = time.perf_counter() - t0

    tokens = steps * cfg.batch_size * cfg.max_length
    # trainable / optimizer HBM accounting (ref memory_utils.py:13-27)
    from sow_tpu.optim.adamw import GroupedAdamWState

    opt_bytes = sum(
        x.size * x.dtype.itemsize
        for tree in (trainer.opt_state.mu, trainer.opt_state.nu)
        for x in jax.tree_util.tree_leaves(tree)
    )
    return {
        "tokens_per_sec": tokens / dt,
        "step_ms": dt / steps * 1e3,
        "optimizer_bytes": int(opt_bytes),
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    dense = bench_arch("linear", steps)
    sow = bench_arch("sow", steps)
    result = {
        "metric": "llama60m_sow_pretrain_throughput",
        "value": round(sow["tokens_per_sec"], 1),
        "unit": "tokens/s",
        "vs_baseline": round(sow["tokens_per_sec"] / dense["tokens_per_sec"], 4),
        "detail": {
            "dense_tokens_per_sec": round(dense["tokens_per_sec"], 1),
            "sow_step_ms": round(sow["step_ms"], 2),
            "dense_step_ms": round(dense["step_ms"], 2),
            "sow_optimizer_bytes": sow["optimizer_bytes"],
            "dense_optimizer_bytes": dense["optimizer_bytes"],
            "optimizer_mem_ratio": round(sow["optimizer_bytes"] / dense["optimizer_bytes"], 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
