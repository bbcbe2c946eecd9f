"""Metrics logging + profiling — the observability aux subsystem.

The reference logs per-step scalars to wandb (``simple_train.py:684-694``)
and captures cProfile / CUDA memory snapshots behind flags
(``simple_train.py:590-594,697-730``). TPU equivalents: a JSONL metrics
sink (wandb attaches automatically if the package+login exist), and
``jax.profiler`` traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Optional


class MetricsLogger:
    """Append-only JSONL metrics with optional wandb mirroring."""

    def __init__(self, path: Optional[str] = None, wandb_project: Optional[str] = None, config: Optional[dict] = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self._wandb = None
        if wandb_project:
            try:
                import wandb  # optional; not a baked dependency

                self._wandb = wandb.init(project=wandb_project, config=config or {})
            except Exception:
                self._wandb = None
        self._t0 = time.time()

    def log(self, step: int, **metrics: Any) -> None:
        record = {"step": step, "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context (replaces the reference's cProfile /
    ``torch.cuda.memory._record_memory_history`` machinery). View with
    TensorBoard's profile plugin or Perfetto."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Live device memory stats (the reference's optimizer-HBM probe at
    update 10, ``simple_train.py:634-641``)."""
    import jax

    out = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[f"device_{i}"] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
