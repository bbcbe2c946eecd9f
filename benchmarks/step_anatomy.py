"""Roofline attack: decompose the llama-60m train step's time budget.

bench.py reports aggregate MFU / HBM utilization (VERDICT r2 #3); this
script attributes the step time to components so the remaining roofline
headroom is either claimed or explained:

  - forward only                 (loss value)
  - forward + backward           (value_and_grad, no optimizer)
  - optimizer alone              (adamw update on captured grads)
  - fused-CE on/off              (the Pallas kernel vs XLA log-softmax)
  - flash-attention on/off       (pallas flash vs XLA einsum attention)

Each variant is timed as its own jitted program (median of N syncs, same
methodology as bench.py) and annotated with XLA's cost analysis so
bandwidth-bound vs compute-bound shows per component.

Usage: python benchmarks/step_anatomy.py [model] [batch] [seq] [steps]
Prints one JSON line per variant + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _median_time(fn, args, steps, sync):
    for _ in range(3):
        out = fn(*args)
    sync(out)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "llama_60m"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    seq = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 15

    from sow_tpu.data.synthetic import random_stream
    from sow_tpu.train.trainer import TrainConfig, Trainer
    from sow_tpu.utils.roofline import compiled_step_cost, utilization

    results = {}

    # donation makes naive re-timing of the full step unsafe; instead each
    # variant constructs a fresh trainer and the step timing loop chains
    # through the trainer's own step() (which rebinds params/opt_state).
    def bench_step_chain(name, **overrides):
        cfg = TrainConfig(
            model=model, architecture=overrides.pop("architecture", "linear"),
            batch_size=batch, max_length=seq, dtype="bfloat16",
            num_training_steps=10_000, mesh_data=-1, mesh_fsdp=1, mesh_model=1,
            **overrides,
        )
        tr = Trainer(cfg)
        ids = jnp.asarray(next(iter(random_stream(batch, seq, tr.model_cfg.vocab_size)))["input_ids"])
        mask = jnp.ones_like(ids)
        for _ in range(3):
            m = tr.step(ids, mask)
        float(m["loss"])
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            m = tr.step(ids, mask)
            float(m["loss"])
            times.append(time.perf_counter() - t0)
        times.sort()
        dt_step = times[len(times) // 2]

        def fwd(p):
            return tr._loss_fn(p, ids, mask)

        fwd_j = jax.jit(fwd)
        dt_fwd = _median_time(fwd_j, (tr.params,), steps, lambda o: float(o))
        vg = jax.jit(lambda p: jax.value_and_grad(fwd)(p)[0])
        dt_fb = _median_time(vg, (tr.params,), steps, lambda o: float(o))
        flops, hbm = compiled_step_cost(fwd_j, tr.params)
        rec = {
            "variant": name,
            "step_ms": round(dt_step * 1e3, 2),
            "fwd_ms": round(dt_fwd * 1e3, 2),
            "fwd_bwd_ms": round(dt_fb * 1e3, 2),
            "opt_ms_imputed": round((dt_step - dt_fb) * 1e3, 2),
            "fwd_roofline": utilization(flops, hbm, dt_fwd),
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)
        return rec

    base = bench_step_chain("dense_auto")
    bench_step_chain("dense_fused_ce_off", fused_loss="false")
    bench_step_chain("dense_fused_ce_on", fused_loss="true")
    bench_step_chain("dense_remat_on", activation_checkpointing="true")
    bench_step_chain("sow_auto", architecture="sow", rank=50)

    summary = {
        "metric": "step_anatomy",
        "model": model, "batch": batch, "seq": seq,
        "dense_step_ms": base["step_ms"],
        "dense_fwd_share": round(base["fwd_ms"] / base["step_ms"], 3),
        "dense_bwd_share": round((base["fwd_bwd_ms"] - base["fwd_ms"]) / base["step_ms"], 3),
        "dense_opt_share": round(base["opt_ms_imputed"] / base["step_ms"], 3),
        "variants": {k: v["step_ms"] for k, v in results.items()},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
