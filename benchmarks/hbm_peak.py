"""Measure ACHIEVABLE HBM bandwidth on this chip with pure streaming kernels.

Closes the roofline argument for the 60m training step (VERDICT r2 #3): the
step moves ~165.6 GB at ~590 GB/s ≈ 72% of the v5e's 819 GB/s *nameplate*.
Whether the remaining 28% is claimable depends on what a kernel with no
compute at all can sustain — this prints that number, for:

  * copy:   y = x * 1             (1 read + 1 write per element)
  * triad:  y = a*x + b           (1 read + 1 write + VPU mul-add)
  * reduce: s = sum(x + s)        (1 read per element — read-only ceiling)

Methodology: K iterations are chained INSIDE one jitted program
(`lax.scan` with a carry dependency, so XLA cannot hoist or elide the
loop body) and the whole program is timed around one hard sync. Per-call
timing of single streaming ops is hopeless on the tunneled runtime: each
dispatch pays a host RTT and the observed numbers were off by >100×
(first version of this file measured "0.4 GB/s copy").

Usage: python benchmarks/hbm_peak.py  — prints one JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

K = 30  # loop iterations inside each program


def _timed(fn, x, iters: int = 3) -> float:
    """Median wall time of fn(x) — fn is one jitted K-iteration program.
    Sync via a 1-element device_get (block_until_ready under-syncs on the
    tunneled axon runtime)."""
    out = fn(x)
    float(jnp.ravel(out)[0])  # warmup + compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x)
        float(jnp.ravel(out)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    n = 512 * 1024 * 1024  # 512 Mi elements, bf16 = 1 GiB per array
    x = jnp.ones((n,), jnp.bfloat16)
    gb = x.nbytes / 1e9

    @jax.jit
    def copy_k(v):
        # carry-dependent chain: each iter reads the previous output and
        # writes a new buffer (scalar multiply defeats aliasing/no-op)
        def body(c, _):
            return c * jnp.bfloat16(1.0), None

        out, _ = lax.scan(body, v, None, length=K)
        return out

    @jax.jit
    def triad_k(v):
        def body(c, _):
            return c * jnp.bfloat16(1.0000001) + jnp.bfloat16(0.0), None

        out, _ = lax.scan(body, v, None, length=K)
        return out

    @jax.jit
    def reduce_k(v):
        # read-only per iter: the scalar carry feeds back into the sum so
        # the loop body can't be hoisted; v is only read
        def body(s, _):
            return jnp.sum(v.astype(jnp.float32)) * 1e-9 + s * 0.5, None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return out

    dt_c = _timed(copy_k, x)
    dt_t = _timed(triad_k, x)
    dt_r = _timed(reduce_k, x)
    result = {
        "metric": "hbm_achievable_bandwidth",
        "unit": "GB/s",
        "array_gb": round(gb, 3),
        "iters_per_program": K,
        "copy_gbps": round(2 * gb * K / dt_c, 1),
        "triad_gbps": round(2 * gb * K / dt_t, 1),
        "reduce_gbps": round(gb * K / dt_r, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
