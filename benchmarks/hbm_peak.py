"""Measure ACHIEVABLE HBM bandwidth on this chip with pure streaming kernels.

Closes the roofline argument for the 60m training step (VERDICT r2 #3): the
step moves ~165.6 GB at ~590 GB/s ≈ 72% of the v5e's 819 GB/s *nameplate*.
Whether the remaining 28% is claimable depends on what a kernel with no
compute at all can sustain — this prints that number, for:

  * copy:   y = x                (1 read + 1 write per element)
  * triad:  y = a*x + b          (1 read + 1 write + VPU mul-add)
  * reduce: s = sum(x)           (1 read, scalar out — read-only ceiling)

Bytes counted as read+written device-side. Usage: python benchmarks/hbm_peak.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _time(fn, *args, iters: int = 20) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    # chained timing; a forced host sync via a tiny slice each iter would
    # add a ~ms tunnel RTT — instead sync once around the whole loop
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # the axon runtime was observed to under-sync block_until_ready; force
    # a real value read
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    n = 512 * 1024 * 1024  # 512 Mi elements, bf16 = 1 GiB per array
    x = jnp.ones((n,), jnp.bfloat16)

    copy = jax.jit(lambda v: v * 1)  # multiply to defeat aliasing/no-op
    triad = jax.jit(lambda v: v * 1.5 + 0.5)
    reduce_ = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

    gib = x.nbytes / 1e9
    dt_c = _time(copy, x)
    dt_t = _time(triad, x)
    dt_r = _time(reduce_, x)
    result = {
        "metric": "hbm_achievable_bandwidth",
        "unit": "GB/s",
        "array_gb": round(gib, 3),
        "copy_gbps": round(2 * gib / dt_c, 1),
        "triad_gbps": round(2 * gib / dt_t, 1),
        "reduce_gbps": round(gib / dt_r, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
