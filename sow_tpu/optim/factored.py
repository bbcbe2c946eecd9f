"""AdamW with an Adafactor-style factored second moment.

The reference keeps full Adam moments for every trainable param
(``scripts/simple_train.py:502-506``); after SoW surgery the embedding and
lm_head moments are ~90% of the remaining optimizer HBM (the projections'
moments shrink to factor-size). This transform keeps the *first* moment
exact (param-dtype, like the grouped AdamW) and factors the *second* moment
of large 2D leaves into row/col EMA vectors — the nonnegative rank-1
reconstruction of Shazeer & Stern's Adafactor — so updates stay full-rank
(unlike GaLore's projected-subspace updates) while the dominant ``v`` buffer
drops from O(m·n) to O(m+n).

Used via ``sow_tpu.optim.combine.split_optimizer`` to route the embed /
lm_head subtrees; this is how the BASELINE.md "<60% of dense AdamW optimizer
state" gate is met by the default SoW configuration.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class FactoredState(NamedTuple):
    step: jnp.ndarray
    mu: Any  # first moments (exact, param dtype)
    vr: Any  # row EMA of g^2 (fp32) — or full v for non-factorable leaves
    vc: Any  # col EMA of g^2 (fp32) — or 0-d placeholder


class FactoredAdamW(NamedTuple):
    init: Callable
    update: Callable


def factored_adamw(
    lr: float | Callable = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    min_dim: int = 128,
) -> FactoredAdamW:
    """Factored-v AdamW for 2D leaves with min(shape) >= ``min_dim``;
    smaller / non-2D leaves run exact AdamW. The update direction matches
    Adam's with ``v`` replaced by its best nonnegative rank-1 approximation
    ``outer(vr, vc) / mean(vr)``."""

    def _factorable(p) -> bool:
        return p.ndim == 2 and min(p.shape) >= min_dim

    def init(params):
        def mu(p):
            return jnp.zeros_like(p)

        def vrow(p):
            if _factorable(p):
                return jnp.zeros((p.shape[0],), jnp.float32)
            return jnp.zeros(p.shape, jnp.float32)

        def vcol(p):
            if _factorable(p):
                return jnp.zeros((p.shape[1],), jnp.float32)
            return jnp.zeros((), jnp.float32)

        return FactoredState(
            step=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(mu, params),
            vr=jax.tree_util.tree_map(vrow, params),
            vc=jax.tree_util.tree_map(vcol, params),
        )

    def update(grads, state: FactoredState, params):
        step = state.step + 1
        lr_t = lr(step) if callable(lr) else lr
        cf = step.astype(jnp.float32)
        corr = jnp.sqrt(1.0 - b2**cf) / (1.0 - b1**cf)

        def upd(g, m, vr, vc, p):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
            g2 = g32 * g32
            if _factorable(p):
                vr = b2 * vr + (1 - b2) * jnp.mean(g2, axis=1)
                vc = b2 * vc + (1 - b2) * jnp.mean(g2, axis=0)
                # v_ij ~= vr_i * vc_j / mean(vr): exact if v is rank-1; the
                # division keeps the scale of v (mean(vr) == mean of all v_ij).
                denom = jnp.sqrt(
                    jnp.outer(vr, vc) / jnp.maximum(jnp.mean(vr), 1e-30)
                ) + eps
            else:
                vr = b2 * vr + (1 - b2) * g2
                denom = jnp.sqrt(vr) + eps
            u = -lr_t * corr * (m32 / denom)
            if weight_decay > 0.0:
                u = u - lr_t * weight_decay * p.astype(jnp.float32)
            return u.astype(p.dtype), m32.astype(m.dtype), vr, vc

        out = jax.tree_util.tree_map(upd, grads, state.mu, state.vr, state.vc, params)
        treedef = jax.tree_util.tree_structure(params)
        leaves = treedef.flatten_up_to(out)
        return (
            treedef.unflatten([x[0] for x in leaves]),
            FactoredState(
                step,
                treedef.unflatten([x[1] for x in leaves]),
                treedef.unflatten([x[2] for x in leaves]),
                treedef.unflatten([x[3] for x in leaves]),
            ),
        )

    return FactoredAdamW(init=init, update=update)
