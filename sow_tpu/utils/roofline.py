"""Roofline accounting: MFU and HBM-bandwidth utilization.

The reference logs only tokens/sec (``simple_train.py:690-691``); on TPU the
hardware-honest form of that number is model-FLOPs utilization against the
chip's peak matmul throughput, and bytes-moved against HBM bandwidth — the
two ceilings of the roofline model. XLA's compiled-program cost analysis
supplies per-step FLOPs and bytes, so both utilizations fall out of the
measured step time with no analytic FLOP counting.

Peak numbers are from public TPU spec sheets (bf16 dense, per chip).
"""

from __future__ import annotations

from typing import Optional

import jax

# device_kind substring -> (peak bf16 FLOP/s, HBM bytes/s)
_PEAKS: list[tuple[str, float, float]] = [
    ("v5 lite", 197e12, 819e9),  # v5e
    ("v5e", 197e12, 819e9),
    ("v5p", 459e12, 2765e9),
    ("v4", 275e12, 1228e9),
    ("v3", 123e12, 900e9),
    ("v6 lite", 918e12, 1640e9),  # v6e / Trillium
    ("v6e", 918e12, 1640e9),
]


def device_peaks(device=None) -> Optional[tuple[float, float]]:
    """(peak_flops, hbm_bytes_per_sec) for ``device`` (default: devices()[0]),
    or None when the device kind is not a known TPU."""
    device = device or jax.devices()[0]
    kind = device.device_kind.lower()
    for sub, flops, bw in _PEAKS:
        if sub in kind:
            return flops, bw
    return None


def compiled_step_cost(jitted_fn, *args) -> tuple[float, float]:
    """(flops, bytes_accessed) of ONE execution of ``jitted_fn(*args)``
    from XLA's cost analysis of the compiled program."""
    compiled = jitted_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if not isinstance(ca, dict):  # older jax returned [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def utilization(
    flops_per_step: float,
    bytes_per_step: float,
    step_seconds: float,
    device=None,
) -> dict:
    """MFU / bandwidth-utilization record for one measured step time."""
    out = {
        "tflops_per_step": flops_per_step / 1e12,
        "gbytes_per_step": bytes_per_step / 1e9,
        "achieved_tflops": flops_per_step / step_seconds / 1e12,
        "achieved_hbm_gbps": bytes_per_step / step_seconds / 1e9,
    }
    peaks = device_peaks(device)
    if peaks is not None:
        peak_flops, peak_bw = peaks
        out["mfu"] = flops_per_step / step_seconds / peak_flops
        out["hbm_util"] = bytes_per_step / step_seconds / peak_bw
    return out
