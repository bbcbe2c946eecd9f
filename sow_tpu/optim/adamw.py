"""Grouped AdamW with per-group LR schedules and group moment resets.

TPU-native equivalent of the reference's two-group ``torch.optim.AdamW``
(``simple_train.py:502-506``: regular params at ``--lr``, SoW factors at
``--sow_lr``) plus ``reset_optimizer`` (``training_utils.py:257-277``), which
zeroes the SoW group's Adam moments at every accumulation.

Design notes:
  * Optax-style pure transformation; the whole update is one jitted tree_map.
  * **Per-group bias-correction counts**: the reference zeroes each param's
    ``state["step"]`` on group reset — but resets always cover a whole
    group, so counts are identical within a group. One scalar per *group*
    expresses the same semantics, and (measured) matters a lot on TPU:
    per-leaf scalar counts emitted ~6 unfusable scalar kernels per leaf and
    made the update 7x slower than optax; per-group scalars restore
    optax-level step time.
  * **Frozen leaves carry empty state**: leaves labeled ``"frozen"`` (the
    accumulated SoW bases) get 0-d placeholder moments, so optimizer HBM is
    proportional to *trainable* params only — the measured optimizer-memory
    win (``memory_utils.py:13-20``).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from sow_tpu.optim.schedules import Schedule, constant_schedule


class GroupedAdamWState(NamedTuple):
    step: jnp.ndarray  # global update step (drives LR schedules)
    count: dict  # per-group step counts (bias correction, resettable)
    mu: Any  # first moments
    nu: Any  # second moments


class GroupedAdamW(NamedTuple):
    init: Callable
    update: Callable
    reset_group: Callable


def _tmap(fn, *trees):
    return jax.tree_util.tree_map(fn, *trees)


def grouped_adamw(
    labels: Any,
    lrs: dict[str, float],
    schedules: dict[str, Schedule] | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float | dict[str, float] = 0.0,
    correct_bias: bool = True,
) -> GroupedAdamW:
    """Build a grouped AdamW.

    Args:
      labels: pytree matching the params treedef with string leaves
        (e.g. from ``sow_tpu.nn.param_labels``: "regular" / "sow" / "frozen").
      lrs: base LR per label. Labels absent from the dict get LR 0.
      schedules: optional per-label multiplier schedules (step -> mult).
      weight_decay: scalar or per-label dict; decoupled, scaled by the
        group's current LR (torch AdamW semantics).
    """
    schedules = dict(schedules or {})
    label_set = sorted({l for l in jax.tree_util.tree_leaves(labels)})
    for l in label_set:
        schedules.setdefault(l, constant_schedule(1.0))
    if not isinstance(weight_decay, dict):
        weight_decay = {l: weight_decay for l in label_set}
    wd = {l: weight_decay.get(l, 0.0) for l in label_set}
    base_lr = {l: lrs.get(l, 0.0) for l in label_set}

    def _frozen(label: str) -> bool:
        return label == "frozen" or base_lr[label] == 0.0

    def init(params):
        def moment(label, p):
            if _frozen(label):
                return jnp.zeros((), p.dtype)  # placeholder, no HBM cost
            return jnp.zeros_like(p)

        return GroupedAdamWState(
            step=jnp.zeros((), jnp.int32),
            count={l: jnp.zeros((), jnp.int32) for l in label_set},
            mu=_tmap(moment, labels, params),
            nu=_tmap(moment, labels, params),
        )

    def update(grads, state: GroupedAdamWState, params):
        step = state.step + 1
        count = {l: c + (0 if _frozen(l) else 1) for l, c in state.count.items()}
        # Per-group scalars, computed once (fuses into one tiny kernel).
        lr_now = {l: base_lr[l] * schedules[l](step) for l in label_set}
        step_size = {}
        for l in label_set:
            s = lr_now[l]
            if correct_bias:
                cf = count[l].astype(jnp.float32)
                s = s * jnp.sqrt(1.0 - b2**cf) / (1.0 - b1**cf)
            step_size[l] = s

        def upd(label, g, m, v, p):
            if _frozen(label):
                return jnp.zeros_like(p), m, v
            g32 = g.astype(jnp.float32)
            m = (b1 * m.astype(jnp.float32) + (1 - b1) * g32).astype(m.dtype)
            v = (b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32).astype(v.dtype)
            denom = jnp.sqrt(v.astype(jnp.float32)) + eps
            u = -step_size[label] * (m.astype(jnp.float32) / denom)
            if wd[label] > 0.0:
                u = u - lr_now[label] * wd[label] * p.astype(jnp.float32)
            return u.astype(p.dtype), m, v

        out = _tmap(upd, labels, grads, state.mu, state.nu, params)
        treedef = jax.tree_util.tree_structure(params)
        leaves = treedef.flatten_up_to(out)
        updates = treedef.unflatten([x[0] for x in leaves])
        mu = treedef.unflatten([x[1] for x in leaves])
        nu = treedef.unflatten([x[2] for x in leaves])
        return updates, GroupedAdamWState(step, count, mu, nu)

    def reset_group(state: GroupedAdamWState, group: str = "sow") -> GroupedAdamWState:
        """Zero moments + count of one label group
        (ref ``training_utils.py:257-277``). Global step is untouched, so LR
        schedules keep advancing."""

        def z(label, x):
            return jnp.zeros_like(x) if label == group else x

        return GroupedAdamWState(
            step=state.step,
            count={
                l: (jnp.zeros((), jnp.int32) if l == group else c)
                for l, c in state.count.items()
            },
            mu=_tmap(z, labels, state.mu),
            nu=_tmap(z, labels, state.nu),
        )

    return GroupedAdamW(init=init, update=update, reset_group=reset_group)


def apply_updates(params, updates):
    """``p + u`` leafwise (optax semantics), preserving dtypes."""
    return _tmap(lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)).astype(p.dtype), params, updates)


def rebuild_state_after_accumulation(
    old_state: GroupedAdamWState,
    fresh_state: GroupedAdamWState,
    labels: Any,
    reset_label: str = "sow",
) -> GroupedAdamWState:
    """Merge a freshly-initialized state (built on post-accumulation params,
    whose SoW acc shapes may have changed) with the pre-accumulation state:
    non-``reset_label`` moments/counts carry over by param path, the reset
    group keeps the fresh zeros — exactly the reference's per-group
    ``reset_optimizer`` at each accumulation (``training_utils.py:257-277``
    called from ``simple_train.py:618-626``)."""
    old_moments = {}
    for name, tree in (("mu", old_state.mu), ("nu", old_state.nu)):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            old_moments[(name, jax.tree_util.keystr(path))] = leaf

    def carry(name, tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        lab_leaves = jax.tree_util.tree_leaves(labels)
        out = []
        for (path, leaf), lab in zip(flat, lab_leaves):
            k = (name, jax.tree_util.keystr(path))
            if lab != reset_label and k in old_moments and old_moments[k].shape == leaf.shape:
                out.append(old_moments[k])
            else:
                out.append(leaf)  # reset group: fresh zeros == the reset
        return jax.tree_util.tree_unflatten(treedef, out)

    return GroupedAdamWState(
        step=old_state.step,
        count={
            l: (old_state.count[l] if l != reset_label and l in old_state.count else c)
            for l, c in fresh_state.count.items()
        },
        mu=carry("mu", fresh_state.mu),
        nu=carry("nu", fresh_state.nu),
    )
