"""Measure ACHIEVABLE HBM bandwidth on this chip with pure streaming kernels.

Closes the roofline argument for the 60m training step (VERDICT r2 #3): the
step moves ~165.6 GB at ~590 GB/s ≈ 72% of the v5e's 819 GB/s *nameplate*.
Whether the remaining 28% is claimable depends on what a kernel with no
compute at all can sustain — this prints that number, for:

  * copy/triad:  y = a*x + b     (1 read + 1 write per element)
  * reduce:      s = sum(x + s)  (1 read per element — read-only ceiling)

Methodology (two prior versions of this file measured garbage, both kept
here as warnings):
  1. Per-dispatch timing of single ops measures the tunnel RTT, not the
     chip ("0.4 GB/s copy").
  2. In-program `lax.scan` chains with *trivial* bodies get algebraically
     elided — `c * bf16(1.0)` is identity, and bf16(1.0000001) IS 1.0 —
     so every timing collapsed to the ~33 ms host-sync floor
     ("1,822 GB/s copy", above nameplate).
This version uses non-trivial bf16 constants (0.99609375 = 1 − 2⁻⁸,
exactly representable, no elision) with carry dependencies (no hoisting),
and times the SAME program at K=32 vs K=96 iterations, reporting
    bw = bytes(96−32 iters) / (t96 − t32)
— differencing cancels the dispatch/sync floor and any per-program
constant. An elision guard flags any kernel whose t96/t32 ratio is too
close to 1 (a dead loop times flat in K).

Usage: python benchmarks/hbm_peak.py  — prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

K_LO, K_HI = 32, 96
A = 0.99609375  # 1 - 2^-8, exact in bf16; ^96 ≈ 0.69, no over/underflow
B = 2**-16      # small bf16-exact additive term


@functools.partial(jax.jit, static_argnums=1)
def triad_k(v, k):
    def body(c, _):
        return c * jnp.bfloat16(A) + jnp.bfloat16(B), None

    out, _ = lax.scan(body, v, None, length=k)
    return out[0]


@functools.partial(jax.jit, static_argnums=1)
def reduce_k(v, k):
    # v + broadcast(carry) fuses into the reduce (one read sweep, no
    # materialized temp); the carry dependency defeats loop-invariant
    # hoisting of the sum
    def body(s, _):
        sm = jnp.sum((v + s.astype(jnp.bfloat16)).astype(jnp.float32))
        return sm * jnp.float32(1e-12), None

    out, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
    return out


def _timed(fn, v, k, iters: int = 3) -> float:
    out = fn(v, k)
    float(out)  # warmup + compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(v, k))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    n = 512 * 1024 * 1024  # 512 Mi elements, bf16 = 1 GiB
    v = jnp.full((n,), 0.5, jnp.bfloat16)
    gb = v.nbytes / 1e9

    result = {
        "metric": "hbm_achievable_bandwidth",
        "unit": "GB/s",
        "array_gb": round(gb, 3),
        "k_lo": K_LO,
        "k_hi": K_HI,
        "device": str(jax.devices()[0]),
    }
    for name, fn, bytes_per_iter in (
        ("triad", triad_k, 2 * gb),   # read + write
        ("reduce", reduce_k, gb),     # read only
    ):
        t_lo = _timed(fn, v, K_LO)
        t_hi = _timed(fn, v, K_HI)
        dt = t_hi - t_lo
        result[f"{name}_gbps"] = (
            round(bytes_per_iter * (K_HI - K_LO) / dt, 1) if dt > 1e-4 else None
        )
        result[f"{name}_t32_ms"] = round(t_lo * 1e3, 1)
        result[f"{name}_t96_ms"] = round(t_hi * 1e3, 1)
        if t_hi < 1.5 * t_lo:
            result[f"{name}_elision_warning"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
