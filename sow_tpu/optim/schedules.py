"""LR schedules — exact ports of the reference lambda math, jit-traceable.

Ref ``scripts/utils/training_utils.py``:
  * linear warmup + decay            (:83-90 via transformers)
  * cyclical cosine with min-lr      (:120-136, lambda :192-207)
  * cosine with multiple warmups     (:139-165, lambda :210-255)

Each schedule maps an (integer, possibly traced) step to a *multiplier*;
multiply by the base LR at use. The per-group wrapper mirrors
``get_all_schedulers`` (:21-60), which lets the SoW factor group restart its
cycle every accumulation while the regular group runs one long cosine.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def linear_schedule(num_training_steps: int, warmup_steps: int) -> Schedule:
    """Linear warmup then linear decay to zero (transformers'
    ``get_linear_schedule_with_warmup`` used at ``training_utils.py:83-90``)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        decay = (num_training_steps - step) / max(1, num_training_steps - warmup_steps)
        return jnp.clip(jnp.where(step < warmup_steps, warm, decay), 0.0, 1.0)

    return fn


def cyclical_cosine_schedule(
    num_training_steps: int,
    warmup_ratio: float,
    min_lr_ratio: float = 0.1,
    cycle_length: int | None = None,
    cycle_ratio: float = 1.0,
) -> Schedule:
    """Cyclical cosine with floor and per-cycle decay.

    Exact port of ``_get_cyclical_cosine_schedule_with_min_lr_lambda``
    (``training_utils.py:192-207``) including its restart quirk: in cycles
    after the first, the first two steps of the warmup return 1e-7 (a
    near-zero "cooldown" before the warmup ramp). ``warmup_ratio`` is a
    fraction of ``num_training_steps`` (``training_utils.py:81``).
    """
    if cycle_length is None:
        cycle_length = num_training_steps
    if num_training_steps % cycle_length != 0:
        raise ValueError(
            f"num_training_steps ({num_training_steps}) must be divisible by "
            f"cycle_length ({cycle_length})"
        )
    num_warmup_steps = int(warmup_ratio * num_training_steps)

    def fn(step):
        step = jnp.asarray(step, jnp.int32)
        cycle_step = step % cycle_length
        cycle_number = step // cycle_length
        decay_pow = jnp.power(cycle_ratio, cycle_number.astype(jnp.float32))

        warm = cycle_step.astype(jnp.float32) / max(1, num_warmup_steps) * decay_pow
        # restart quirk (training_utils.py:199-202)
        warm = jnp.where(
            (step != cycle_step) & (cycle_step < 2), jnp.float32(1e-7), warm
        )

        progress = (cycle_step - num_warmup_steps).astype(jnp.float32) / max(
            1, cycle_length - num_warmup_steps
        )
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        decayed = (min_lr_ratio + (1.0 - min_lr_ratio) * cosine) * decay_pow
        return jnp.where(cycle_step < num_warmup_steps, warm, decayed)

    return fn


def cosine_restarts_schedule(
    num_training_steps: int,
    warmup_ratio: float,
    restart_warmup_steps: int,
    restart_every: int,
    min_lr_ratio: float = 0.1,
    adjust_step: int = 0,
) -> Schedule:
    """One long cosine decay with a short re-warmup after every restart.

    Exact port of ``_get_cosine_schedule_with_multiple_warmups_lambda``
    (``training_utils.py:210-255``); ``adjust_step`` shifts restarts when
    resuming from a warmed-up checkpoint.
    """
    if num_training_steps % restart_every != 0:
        raise ValueError(
            f"num_training_steps ({num_training_steps}) must be divisible by "
            f"restart_every ({restart_every})"
        )
    first_warmup_steps = int(warmup_ratio * num_training_steps)
    assert adjust_step + first_warmup_steps < num_training_steps
    assert adjust_step + first_warmup_steps < restart_every, (
        "the first reset would happen before the first warmup is done"
    )

    def fn(step):
        step = jnp.asarray(step, jnp.int32)
        first_warm = step.astype(jnp.float32) / max(1, first_warmup_steps)

        adj = step + adjust_step
        restart_step = adj % restart_every
        restart_number = adj // restart_every

        end_warm_progress = (restart_number * restart_every).astype(jnp.float32) / max(
            1, num_training_steps - first_warmup_steps
        )
        end_warm_cos = 0.5 * (1.0 + jnp.cos(jnp.pi * end_warm_progress))
        warm_mult = min_lr_ratio + (1.0 - min_lr_ratio) * end_warm_cos
        rewarm = restart_step.astype(jnp.float32) / max(1, restart_warmup_steps) * warm_mult

        progress = (adj - first_warmup_steps).astype(jnp.float32) / max(
            1, num_training_steps - first_warmup_steps
        )
        cosine = min_lr_ratio + (1.0 - min_lr_ratio) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))

        out = jnp.where(restart_step < restart_warmup_steps, rewarm, cosine)
        return jnp.where(step < first_warmup_steps, first_warm, out)

    return fn


def get_schedule(
    scheduler_type: str,
    *,
    num_training_steps: int,
    warmup_ratio: float,
    min_lr_ratio: float = 0.1,
    cycle_length: int | None = None,
    cycle_ratio: float = 1.0,
    restart_warmup_steps: int | None = None,
    adjust_step: int = 0,
) -> Schedule:
    """Dispatch matching ``get_scheculer`` [sic] (``training_utils.py:63-117``)."""
    if scheduler_type == "linear":
        return linear_schedule(num_training_steps, int(warmup_ratio * num_training_steps))
    if scheduler_type == "cosine":
        return cyclical_cosine_schedule(
            num_training_steps, warmup_ratio, min_lr_ratio, cycle_length, cycle_ratio
        )
    if scheduler_type == "cosine_restarts":
        assert restart_warmup_steps is not None
        assert cycle_length is not None
        return cosine_restarts_schedule(
            num_training_steps,
            warmup_ratio,
            restart_warmup_steps,
            cycle_length,
            min_lr_ratio,
            adjust_step,
        )
    raise NotImplementedError(f"Scheduler {scheduler_type} is not implemented")


def constant_schedule(value: float = 1.0) -> Schedule:
    def fn(step):
        return jnp.full((), value, jnp.float32)

    return fn
