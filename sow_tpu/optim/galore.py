"""GaLore-style projected AdamW — low-rank gradient projection.

The reference's ``--architecture galore`` path delegates to the external
``galore_torch`` package (``simple_train.py:471-479``); this is a TPU-native
implementation of the same algorithm: for each 2D param, project the gradient
onto a rank-``r`` subspace (left or right, by shape), run Adam in the
projected space (moments are rank-r — the memory win), project the update
back, and refresh the projector from the current gradient's truncated SVD
every ``update_proj_gap`` steps.

Projector refresh uses data-dependent timing; to stay jit-stable the
projector lives in the optimizer state and is refreshed with ``lax.cond``
on ``step % gap == 0``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class GaLoreState(NamedTuple):
    step: jnp.ndarray
    proj: Any  # per-leaf projector (r, m) / (n, r) or 0-d placeholder
    mu: Any  # projected first moments
    nu: Any


class GaLore(NamedTuple):
    init: Callable
    update: Callable


def _project_shapes(p, rank):
    """Project the SHORT side (galore_torch convention): for (m, n) with
    m <= n, projector (r, m), projected grad (r, n); else (n, r) and (m, r)."""
    m, n = p.shape
    r = min(rank, m, n)
    if m <= n:
        return ("left", (r, m), (r, n))
    return ("right", (n, r), (m, r))


def _svd_projector(g32, mode, rank):
    with jax.default_matmul_precision("highest"):
        u, s, vt = jnp.linalg.svd(g32, full_matrices=False)
    if mode == "left":
        return u[:, :rank].T  # (r, m)
    return vt[:rank, :].T  # (n, r)


def galore_adamw(
    lr: float | Callable = 1e-3,
    rank: int = 128,
    update_proj_gap: int = 200,
    scale: float = 0.25,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    min_dim: int = 128,
) -> GaLore:
    """Projected AdamW for 2D leaves with min(shape) >= ``min_dim``; smaller
    leaves get plain AdamW. Matches galore_torch's update:
    ``p -= lr * scale * P^T (adam(P g))`` with decoupled weight decay."""

    def _is_galore(p) -> bool:
        return p.ndim == 2 and min(p.shape) >= min_dim

    def init(params):
        def proj(p):
            if not _is_galore(p):
                return jnp.zeros((), jnp.float32)
            mode, pshape, _ = _project_shapes(p, rank)
            return jnp.zeros(pshape, jnp.float32)

        def moment(p):
            if not _is_galore(p):
                return jnp.zeros_like(p)
            _, _, gshape = _project_shapes(p, rank)
            return jnp.zeros(gshape, jnp.float32)

        return GaLoreState(
            step=jnp.zeros((), jnp.int32),
            proj=jax.tree_util.tree_map(proj, params),
            mu=jax.tree_util.tree_map(moment, params),
            nu=jax.tree_util.tree_map(moment, params),
        )

    def update(grads, state: GaLoreState, params):
        step = state.step + 1
        lr_t = lr(step) if callable(lr) else lr
        refresh = (state.step % update_proj_gap) == 0  # step 0, gap, 2*gap...

        def upd(g, pr, m, v, p):
            g32 = g.astype(jnp.float32)
            if _is_galore(p):
                mode, _, _ = _project_shapes(p, rank)
                r = min(rank, *p.shape)
                pr = jax.lax.cond(
                    refresh, lambda: _svd_projector(g32, mode, r), lambda: pr
                )
                pg = pr @ g32 if mode == "left" else g32 @ pr
            else:
                pg = g32

            m = b1 * m + (1 - b1) * pg
            v = b2 * v + (1 - b2) * pg * pg
            cf = step.astype(jnp.float32)
            corr = jnp.sqrt(1.0 - b2**cf) / (1.0 - b1**cf)
            norm_g = m / (jnp.sqrt(v) + eps)

            if _is_galore(p):
                mode, _, _ = _project_shapes(p, rank)
                back = pr.T @ norm_g if mode == "left" else norm_g @ pr.T
                u = -lr_t * corr * scale * back
            else:
                u = -lr_t * corr * norm_g
            if weight_decay > 0.0:
                u = u - lr_t * weight_decay * p.astype(jnp.float32)
            return u.astype(p.dtype), pr, m, v

        out = jax.tree_util.tree_map(upd, grads, state.proj, state.mu, state.nu, params)
        treedef = jax.tree_util.tree_structure(params)
        leaves = treedef.flatten_up_to(out)
        return (
            treedef.unflatten([x[0] for x in leaves]),
            GaLoreState(
                step,
                treedef.unflatten([x[1] for x in leaves]),
                treedef.unflatten([x[2] for x in leaves]),
                treedef.unflatten([x[3] for x in leaves]),
            ),
        )

    return GaLore(init=init, update=update)
