"""Hyperparameter sweeps — the W8 orchestration layer.

The reference fans out ``torchrun`` subprocesses over a GPU worker pool
draining a queue of hyperparameter combos (``launch_sweep.py:34-70``,
product of ranks x accumulations x lrs x sow_lrs :45-52). On TPU a single
SPMD process owns the whole mesh, so the sweep is a queue of in-process runs
(one compiled program at a time); results land in a JSONL file instead of
wandb.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
import time
from typing import Any, Callable, Iterable, Optional

from sow_tpu.train.trainer import TrainConfig, Trainer


def grid(**axes: Iterable[Any]) -> list[dict[str, Any]]:
    """Cartesian product of named axes (ref ``launch_sweep.py:45-52``)."""
    names = list(axes)
    return [dict(zip(names, combo)) for combo in itertools.product(*axes.values())]


def random_search(n_trials: int, seed: int = 0, **axes) -> list[dict[str, Any]]:
    """Random sampling over axes — the stochastic-search counterpart of the
    reference's wandb bayes sweep (``glue_sweep.py:7-16``). An axis may be a
    list (uniform choice) or a ``(low, high)`` tuple (log-uniform float)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    combos = []
    for _ in range(n_trials):
        combo = {}
        for name, spec in axes.items():
            if isinstance(spec, tuple) and len(spec) == 2 and all(
                isinstance(v, float) for v in spec
            ):
                lo, hi = np.log(spec[0]), np.log(spec[1])
                combo[name] = float(np.exp(rng.uniform(lo, hi)))
            else:
                combo[name] = spec[int(rng.integers(len(spec)))]
        combos.append(combo)
    return combos


def run_sweep(
    base: TrainConfig,
    combos: list[dict[str, Any]],
    steps_per_run: int,
    data_factory: Callable[[TrainConfig], Iterable[dict]],
    out_path: str = "sweep_results.jsonl",
    eval_batches: Optional[Callable[[TrainConfig], Iterable[dict]]] = None,
    eval_tokens: int = 100_000,
) -> list[dict]:
    """Run each combo for ``steps_per_run`` update steps; append one JSON
    line per run with final train loss (and eval loss if a factory given)."""
    results = []
    for i, combo in enumerate(combos):
        cfg = dataclasses.replace(base, **combo)
        trainer = Trainer(cfg)
        data = iter(data_factory(cfg))
        t0 = time.perf_counter()
        last_loss = None
        import jax.numpy as jnp

        for _ in range(steps_per_run):
            batch = next(data)
            m = trainer.step(jnp.asarray(batch["input_ids"]))
            last_loss = m["loss"]
        record = {
            "run": i,
            "combo": combo,
            "final_loss": float(last_loss) if last_loss is not None else None,
            "steps": steps_per_run,
            "seconds": round(time.perf_counter() - t0, 2),
            "tokens_seen": trainer.tokens_seen,
        }
        if eval_batches is not None:
            record["eval"] = trainer.evaluate(iter(eval_batches(cfg)), max_tokens=eval_tokens)
        results.append(record)
        with open(out_path, "a") as f:
            f.write(json.dumps(record) + "\n")
    return results
