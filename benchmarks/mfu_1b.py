"""llama-1b throughput at a compute-bound batch, with MFU / HBM roofline.

Round-2 benches ran llama-1b at bs=16 (likely under-occupied); VERDICT r2 #3
asks for the SoW-vs-dense comparison at bs >= 64 (grad-accum if the chip's
HBM demands it) so the speedup claim comes with an MFU figure.

Matches the throughput intent of the reference's tokens/sec telemetry
(``simple_train.py:690-691``) at its llama-1b flagship config
(``launch.py:98-127``: r=200, seq 256, bf16); the roofline numbers come from
XLA's cost analysis of the compiled step (``sow_tpu/utils/roofline.py``).

Usage: python benchmarks/mfu_1b.py [batch_size] [grad_accum] [steps]
Prints one JSON line per architecture plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(architecture: str, batch_size: int, grad_accum: int, steps: int) -> dict:
    from sow_tpu.data.synthetic import random_stream
    from sow_tpu.train.trainer import TrainConfig, Trainer
    from sow_tpu.utils.memory import optimizer_memory_usage
    from sow_tpu.utils.roofline import compiled_step_cost, utilization

    cfg = TrainConfig(
        model="llama_1b",
        architecture=architecture,
        rank=200,  # the reference's llama-1b flagship rank (launch.py:98-127)
        sow_accumulation=0,
        batch_size=batch_size,
        gradient_accumulation=grad_accum,
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

    # Chained timing: trainer.step threads params/opt_state through donated
    # buffers, so the n dispatches chain on device; one sync at the end.
    # (Per-step host syncs would add the tunneled chip's ~2 ms RPC floor to
    # every step — see BENCH_HISTORY "chained-timing matrix".)
    for _ in range(3):
        m = trainer.step(ids, mask)
    float(m["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        m = trainer.step(ids, mask)
    float(m["loss"])  # hard sync (block_until_ready does not sync axon)
    dt = (time.perf_counter() - t0) / steps

    flops, hbm_bytes = compiled_step_cost(
        trainer._train_step_fn(), trainer.params, trainer.opt_state, ids, mask
    )
    roof = utilization(flops, hbm_bytes, dt)
    return {
        "architecture": architecture,
        "batch_size": batch_size,
        "grad_accum": grad_accum,
        "tokens_per_sec": round(batch_size * cfg.max_length / dt, 1),
        "step_ms": round(dt * 1e3, 2),
        "mfu": round(roof.get("mfu", 0.0), 4),
        "hbm_util": round(roof.get("hbm_util", 0.0), 4),
        "tflops_per_step": round(roof["tflops_per_step"], 2),
        "gbytes_per_step": round(roof["gbytes_per_step"], 2),
        "optimizer_bytes": int(optimizer_memory_usage(trainer.opt_state)),
        "device": str(jax.devices()[0]),
    }


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    results = {}
    for arch in ("linear", "sow"):
        results[arch] = bench(arch, bs, accum, steps)
        print(json.dumps(results[arch]), flush=True)
    d, s = results["linear"], results["sow"]
    print(
        json.dumps(
            {
                "metric": "llama1b_sow_vs_dense",
                "sow_vs_dense_tps": round(d and s["tokens_per_sec"] / d["tokens_per_sec"], 4),
                "sow_mfu": s["mfu"],
                "dense_mfu": d["mfu"],
                "optimizer_mem_ratio": round(s["optimizer_bytes"] / d["optimizer_bytes"], 4),
            }
        )
    )


if __name__ == "__main__":
    main()
