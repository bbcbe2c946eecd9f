"""TT-Adam step-time vs dense Adam, with per-stage attribution.

The reference's TT-Adam (``tn_gradient/optimizer/ttadam.py:71-115``) pays a
per-step TT reconstruct -> dense Adam -> TT decompose round trip for its
~141x moment-state compression. BASELINE.md row 4 asks us to *beat* that
scheme's latency; this benchmark measures the whole jitted update and its
stages in isolation so each optimization lever is attributable.

Workload: the round-2 fixture — 8 leaves of (512, 1376) (llama-60m MLP
shapes), order-4 rank-8 TT state, synthetic gradients. Stages:

  * ``dense``     — optax-style fused dense AdamW on the same leaves;
  * ``ttadam``    — the shipping update (grouped vmap, rand decompose);
  * ``recon``     — batched TT->dense reconstruct of both moments only;
  * ``decomp``    — batched dense->TT decompose of both moments only;
  * variants via flags (``--state-dtype bf16``, ``--method qr``...).

Also reports the update error vs dense Adam after ``--steps`` EMA steps
(rel-L2, the honest version of ``tests/tt_adam_update.py:216``'s printed
norm) and the moment-state bytes ratio.

Usage: python benchmarks/ttadam_bench.py [--leaves 8] [--steps 30]
Prints one JSON line per measurement.
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


def timeit(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def timeit_opt(step, g, state, params, warmup=3, iters=50):
    """Time an optimizer step with the STATE CHAINED through iterations —
    the dependent chain serializes on the device, so the number is device
    step time, not host dispatch rate (on a tunneled chip, 20 independent
    dispatches of the same args measure the ~2 ms RPC floor instead)."""
    for _ in range(warmup):
        u, state = step(g, state, params)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    for _ in range(iters):
        u, state = step(g, state, params)
    jax.block_until_ready(u)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--leaves", type=int, default=8)
    p.add_argument("--shape", type=int, nargs=2, default=(512, 1376))
    p.add_argument("--order", type=int, default=4)
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--steps", type=int, default=30, help="EMA steps for the error probe")
    p.add_argument("--method", default="rand", choices=("rand", "qr"))
    p.add_argument("--state-dtype", default="float32")
    p.add_argument("--ema-mode", default="dense", choices=("dense", "tt"))
    p.add_argument("--v-mode", default="tt", choices=("tt", "factored"))
    p.add_argument("--layout", default="uniform",
                   choices=("uniform", "wide", "matrix"))
    args = p.parse_args()

    import optax

    from sow_tpu.optim.ttadam import ttadam, default_tt_spec
    from sow_tpu.tt import TensorTrain
    from sow_tpu.utils.memory import optimizer_memory_usage

    shape = tuple(args.shape)
    keys = jax.random.split(jax.random.PRNGKey(0), args.leaves + 1)
    params = {
        f"w{i}": jax.random.normal(keys[i], shape, jnp.float32) * 0.02
        for i in range(args.leaves)
    }

    @jax.jit
    def grad_at(step):
        # synthetic near-low-rank gradients, drifting with the step so the
        # EMA state matters (ref tests/tt_adam_update.py:17-26)
        ks = jax.random.split(jax.random.fold_in(keys[-1], step), args.leaves)
        def one(k):
            a = jax.random.normal(k, (shape[0], 16))
            b = jax.random.normal(jax.random.fold_in(k, 1), (16, shape[1]))
            noise = 0.05 * jax.random.normal(jax.random.fold_in(k, 2), shape)
            return a @ b / 16.0 + noise
        return {f"w{i}": one(ks[i]) for i in range(args.leaves)}

    g0 = jax.block_until_ready(grad_at(0))

    base = dict(lr=1e-3, weight_decay=0.0)
    record = {
        "leaves": args.leaves, "shape": list(shape), "order": args.order,
        "rank": args.rank, "method": args.method,
        "state_dtype": args.state_dtype, "ema_mode": args.ema_mode,
        "v_mode": args.v_mode, "layout": args.layout,
        "device": str(jax.devices()[0]),
    }

    # -- dense baseline ------------------------------------------------------
    dense_opt = optax.adamw(learning_rate=base["lr"])
    dense_state = dense_opt.init(params)
    dense_step = jax.jit(lambda g, s, p: dense_opt.update(g, s, p))
    record["dense_ms"] = round(timeit_opt(dense_step, g0, dense_state, params), 3)
    record["dense_state_bytes"] = int(
        sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(dense_state)
            if hasattr(x, "size")
        )
    )

    # -- TT-Adam -------------------------------------------------------------
    spec = default_tt_spec(order=args.order, rank=args.rank)
    tt_kwargs = dict(base, tt_spec=spec, decompose_method=args.method)
    if args.state_dtype != "float32":
        tt_kwargs["state_dtype"] = jnp.dtype(args.state_dtype)
    tt_kwargs["ema_mode"] = args.ema_mode
    tt_kwargs["v_mode"] = args.v_mode
    tt_kwargs["layout"] = args.layout
    tt_opt = ttadam(**tt_kwargs)
    tt_state = tt_opt.init(params)
    tt_step = jax.jit(lambda g, s, p: tt_opt.update(g, s, p))
    record["ttadam_ms"] = round(timeit_opt(tt_step, g0, tt_state, params), 3)
    record["tt_state_bytes"] = int(optimizer_memory_usage(tt_state))
    record["vs_dense"] = round(record["ttadam_ms"] / record["dense_ms"], 3)
    record["state_compression"] = round(
        record["dense_state_bytes"] / record["tt_state_bytes"], 1
    )

    # -- stage attribution: batched reconstruct / decompose of both moments --
    ranks = [1] + [args.rank] * (args.order - 1) + [1]
    sample = TensorTrain.from_matrix(
        g0["w0"].astype(jnp.float32), ranks, padding=True, method=args.method,
        layout=args.layout,
    )
    stacked_cores = [jnp.stack([c] * (2 * args.leaves)) for c in sample.cores]
    recon = jax.jit(jax.vmap(lambda *cs: TensorTrain(list(cs)).to_matrix(shape)))
    record["recon_ms"] = round(timeit(recon, *stacked_cores), 3)
    dense_both = jnp.stack([g0[f"w{i % args.leaves}"] for i in range(2 * args.leaves)])
    decomp = jax.jit(
        jax.vmap(
            lambda x: TensorTrain.from_matrix(
                x, ranks, padding=True, method=args.method, layout=args.layout
            ).cores
        )
    )
    record["decomp_ms"] = round(timeit(decomp, dense_both), 3)

    # -- update-error probe: run N EMA steps, compare final param delta ------
    p_d, p_t = params, params
    s_d, s_t = dense_opt.init(params), tt_opt.init(params)
    for i in range(args.steps):
        g = grad_at(i)
        u_d, s_d = dense_step(g, s_d, p_d)
        u_t, s_t = tt_step(g, s_t, p_t)
        p_d = jax.tree_util.tree_map(lambda p, u: p + u, p_d, u_d)
        p_t = jax.tree_util.tree_map(lambda p, u: p + u, p_t, u_t)
    num = den = 0.0
    for k in params:
        d = np.asarray(p_d[k] - params[k])
        t = np.asarray(p_t[k] - params[k])
        num += float(np.sum((d - t) ** 2))
        den += float(np.sum(d**2))
    record["update_rel_l2"] = round((num / den) ** 0.5, 4)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
