"""TT-Adam: Adam with tensor-train-compressed moment storage.

TPU-native re-design of ``tn_gradient/optimizer/ttadam.py:10-117``. The
reference scheme: moments are stored TT-compressed *between* steps; each step
reconstructs them to dense, runs standard Adam math, and re-compresses. Memory
is saved between steps, paid for with 2x (TT decompose + reconstruct) per
step. The whole step is one jitted function, so XLA fuses the
reconstruct -> adam -> decompose pipeline per leaf.

Differences from the reference:
  * State is TT from step 0 (``TT.zeros``) instead of switching dense->TT
    after the first step (``ttadam.py:68-74``) — a single jit-stable state
    structure.
  * The dead GaLore projector branches (``ttadam.py:58-66,105-106``, disabled
    with ``and False``) are not replicated.
  * A *pure-TT* update (the reference's intended end-state: the commented
    ``TTRAdam`` sketch, ``ttadam.py:120-207``, demonstrated in
    ``tests/tt_adam_update.py:54-77``) ships as ``pure_tt_adam_update``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from sow_tpu.tt import TensorTrain, cap_ranks, matrix_tt_shapes


class TTAdamState(NamedTuple):
    step: jnp.ndarray
    count: Any  # per-leaf counts
    mu: Any  # TensorTrain (compressed leaves) or dense array
    nu: Any


class TTAdam(NamedTuple):
    init: Callable
    update: Callable


def default_tt_spec(order: int = 4, rank: int = 4, min_dim: int = 16):
    """Leaf -> TT ranks (or None to keep dense state).

    2D leaves with both dims >= ``min_dim`` get compressed state; everything
    else (biases, norms, scalars) stays dense — mirroring the reference's
    "param groups carrying a 'ranks' key" convention (``ttadam.py:58,71``).
    """

    def spec(p) -> list[int] | None:
        if p.ndim == 2 and min(p.shape) >= min_dim:
            return [1] + [rank] * (order - 1) + [1]
        return None

    return spec


def _tt_zeros_like(
    p: jax.Array, ranks: list[int], layout: str, dtype=jnp.float32
) -> TensorTrain:
    order = len(ranks) - 1
    in_shape, out_shape = matrix_tt_shapes(p.shape[0], p.shape[1], order, ranks, layout)
    ranks = cap_ranks(ranks, in_shape, out_shape)
    return TensorTrain.zeros(ranks, in_shape, out_shape, dtype=dtype)


def ttadam(
    lr: float | Callable = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    correct_bias: bool = True,
    tt_spec: Callable | None = None,
    decompose_method: str = "rand",
    state_dtype=jnp.float32,
    ema_mode: str = "dense",
    v_mode: str = "tt",
    layout: str = "uniform",
    labels: Any = None,
    lrs: dict[str, float] | None = None,
    schedules: dict[str, Any] | None = None,
) -> TTAdam:
    """Adam whose 2D-moment storage is TT-compressed between steps.

    ``tt_spec(p)`` returns the TT ranks for a leaf or None for dense state.
    ``decompose_method``: "rand" (default — randomized range-finder sweep;
    the per-step decompose is the latency bottleneck and Householder QR
    doesn't map to the MXU) or "qr" (the reference's exact truncated-QR,
    ``ttadam.py:113-115``).
    ``state_dtype``: storage dtype of the TT cores between steps (the math
    is fp32 either way; bf16 halves the state bytes on top of the TT
    compression at a small EMA-precision cost).
    ``ema_mode``: "dense" (reference semantics, ``ttadam.py:87-115`` —
    reconstruct moments, dense EMA, re-decompose) or "tt" — decompose
    the *gradient* once and update the first moment in TT arithmetic
    (``m <- b1*m + (1-b1)*g_tt`` via block-diag add + round — the
    reference's intended TTRAdam end-state, ``ttadam.py:120-207``),
    reconstructing only for the dense update math. The rounds touch only
    core-sized data.
    ``v_mode``: "tt" (reference — the second moment is TT-compressed like
    the first; with ``ema_mode="tt"`` it advances by bond-Kronecker
    Hadamard + round, which can underestimate ``v`` badly — kept for
    parity with the TTRAdam sketch, not recommended) or "factored" —
    Adafactor row/col EMAs (Shazeer & Stern): O(m+n) state, NO per-step
    decompose for ``v``, and a sound nonnegative reconstruction. With
    ``v_mode="factored"`` the per-step full-matrix decompose count drops
    from 2 to 1 while total state stays far below dense Adam.
    ``layout``: factor grid for the TT state (see ``matrix_tt_shapes``).
    "uniform" (reference-shaped interleaved grid) or "matrix" — order-2,
    in ``(m,1) x (1,n)``: the TT bond IS a plain rank-r factorization, so
    decompose is one sketch + QR over the real matrix axes with zero
    relayout, and the bond captures matrix singular structure.

    TPU-recommended config, measured at the 8x 512x1376 bench (v5e,
    state chained through timing): ``layout="matrix"`` (order-2 spec) +
    ``v_mode="factored"`` = **1.04x dense Adam step time** at 83x state
    compression and the best update fidelity of the matrix (rel-L2 0.75
    vs dense Adam's update, vs 0.80 at 1.40x for uniform+factored and
    2.1x for the all-TT uniform grid). ``ema_mode="tt"`` additionally
    drops to ONE decompose/step and is sound ONLY on the matrix layout
    (uniform-grid rounding discards the accumulated EMA — rel ~1.0) and
    ONLY with ``v_mode="factored"`` (a TT-arithmetic ``v`` leaves
    near-zero denominator regions: measured update rel-L2 > 1e4).

    Rank choice — measured end-to-end (llama_9m, hidden 128, 800 steps,
    synthetic pretrain, matrix layout + factored v; conv9m ladder): final
    loss 1.70 at tt-rank 16 vs dense AdamW 0.197 — but 0.300 at rank 64
    and 0.225 at rank 128. Moment-compression aggressiveness
    (rank / min-dim) is the quality knob: rank ~ min-dim/2 recovers most
    of dense Adam's convergence. The default rank 16 is a max-compression
    setting, appropriate when rank << min(dims) still leaves real
    structure (large hidden sizes), not for small models.
    """
    spec_fn = tt_spec or default_tt_spec()

    # Optional grouped-LR mode (mirrors grouped_adamw's labels/lrs/schedules
    # contract, adamw.py:50-77): when ``labels`` is given, each leaf's LR is
    # ``lrs[label] * schedules[label](step)`` — this is what lets TT-Adam
    # drive a SoW model (factors at sow_lr, the rest at lr) straight from
    # the training CLI.
    if labels is not None:
        from sow_tpu.optim.schedules import constant_schedule

        _scheds = dict(schedules or {})
        _label_set = sorted({l for l in jax.tree_util.tree_leaves(labels)})
        for l in _label_set:
            _scheds.setdefault(l, constant_schedule(1.0))
        _base_lr = {l: (lrs or {}).get(l, 0.0) for l in _label_set}

    def _is_tt(x):
        return isinstance(x, TensorTrain)

    def init(params):
        def moment(p):
            ranks = spec_fn(p)
            if ranks is None:
                return jnp.zeros_like(p)
            return _tt_zeros_like(p, ranks, layout, dtype=state_dtype)

        def second(p):
            ranks = spec_fn(p)
            if ranks is None:
                return jnp.zeros_like(p)
            if v_mode == "factored":
                return {
                    "vr": jnp.zeros((p.shape[0],), jnp.float32),
                    "vc": jnp.zeros((p.shape[1],), jnp.float32),
                }
            return _tt_zeros_like(p, ranks, layout, dtype=state_dtype)

        zero_counts = jax.tree_util.tree_map(lambda p: jnp.zeros((), jnp.int32), params)
        return TTAdamState(
            step=jnp.zeros((), jnp.int32),
            count=zero_counts,
            mu=jax.tree_util.tree_map(moment, params),
            nu=jax.tree_util.tree_map(second, params),
        )

    def update(grads, state: TTAdamState, params):
        step = state.step + 1
        base_lr_t = lr(step) if callable(lr) else lr

        def upd(g, c, m, v, p, lr_t):
            c = c + 1
            g32 = g.astype(jnp.float32)
            is_tt = isinstance(m, TensorTrain)
            v_is_tt = isinstance(v, TensorTrain)
            ranks = list(m.ranks) if is_tt else None

            if not is_tt:
                m_d = b1 * m.astype(jnp.float32) + (1 - b1) * g32
                v_d = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
                m_new, v_new = m_d.astype(m.dtype), v_d.astype(v.dtype)
            elif ema_mode == "tt":
                # ONE full-matrix decompose (the gradient); the first moment
                # advances in TT arithmetic (block-diag add + round — the
                # TTRAdam sketch) and is reconstructed only for the update.
                m32 = m.astype(jnp.float32)
                g_tt = TensorTrain.from_matrix(
                    g32, ranks, padding=True, method=decompose_method,
                    layout=layout,
                )
                m_tt = (b1 * m32 + (1 - b1) * g_tt).round(like=m32)
                m_d = m_tt.to_matrix(p.shape)
                m_new = m_tt.astype(state_dtype)
                if v_is_tt:
                    v32 = v.astype(jnp.float32)
                    v_tt = (b2 * v32 + (1 - b2) * (g_tt * g_tt)).round(like=v32)
                    v_d = jnp.maximum(v_tt.to_matrix(p.shape), 0.0)
                    v_new = v_tt.astype(state_dtype)
            elif v_is_tt:
                # reference scheme (ttadam.py:71-115): TT -> dense, dense
                # EMA, dense -> TT — m and v batched through ONE contraction
                # and ONE decompose (the pipeline is dispatch-bound).
                mv_cores = [
                    jnp.stack(ab).astype(jnp.float32)
                    for ab in zip(m.cores, v.cores)
                ]
                mv = jax.vmap(lambda cs: TensorTrain(cs).to_matrix(p.shape))(mv_cores)
                m_d = b1 * mv[0] + (1 - b1) * g32
                v_d = b2 * jnp.maximum(mv[1], 0.0) + (1 - b2) * g32 * g32
                new_cores = jax.vmap(
                    lambda x: TensorTrain.from_matrix(
                        x, ranks, padding=True, method=decompose_method,
                        layout=layout,
                    ).cores
                )(jnp.stack([m_d, v_d]))
                m_new = TensorTrain([cc[0] for cc in new_cores]).astype(state_dtype)
                v_new = TensorTrain([cc[1] for cc in new_cores]).astype(state_dtype)
            else:
                # factored v: only the first moment round-trips through TT
                m_d = b1 * m.astype(jnp.float32).to_matrix(p.shape) + (1 - b1) * g32
                m_new = TensorTrain.from_matrix(
                    m_d, ranks, padding=True, method=decompose_method,
                    layout=layout,
                ).astype(state_dtype)

            if is_tt and not v_is_tt:
                # Adafactor second moment (factored.py formula): row/col
                # EMAs of g^2, nonnegative rank-1 reconstruction for denom
                g2 = g32 * g32
                vr = b2 * v["vr"] + (1 - b2) * jnp.mean(g2, axis=1)
                vc = b2 * v["vc"] + (1 - b2) * jnp.mean(g2, axis=0)
                v_d = jnp.outer(vr, vc) / jnp.maximum(jnp.mean(vr), 1e-30)
                v_new = {"vr": vr, "vc": vc}

            # dense Adam update math (ref ttadam.py:87-108)
            denom = jnp.sqrt(v_d) + eps
            step_size = lr_t
            if correct_bias:
                cf = c.astype(jnp.float32)
                step_size = step_size * jnp.sqrt(1.0 - b2**cf) / (1.0 - b1**cf)
            u = -step_size * m_d / denom
            if weight_decay > 0.0:
                # decoupled, scaled by the leaf's current lr (ref ttadam.py:110-111)
                u = u - lr_t * weight_decay * p.astype(jnp.float32)
            return u.astype(p.dtype), c, m_new, v_new

        # Group TT leaves by (param shape, TT ranks) and vmap one fused
        # update over each group: the per-leaf TT pipeline is dozens of tiny
        # ops, so launching it once per group (8x the work per kernel at
        # llama shapes — all projections share shapes) beats per-leaf
        # dispatch. Dense leaves keep the plain per-leaf tree_map.
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_c = treedef.flatten_up_to(state.count)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        if labels is None:
            flat_lr = [jnp.float32(base_lr_t)] * len(flat_p)
        else:
            lr_by_label = {l: jnp.float32(_base_lr[l] * _scheds[l](step))
                           for l in _label_set}
            flat_lr = [lr_by_label[lab] for lab in treedef.flatten_up_to(labels)]

        groups: dict = {}
        for idx, (p, m) in enumerate(zip(flat_p, flat_m)):
            if isinstance(m, TensorTrain):
                groups.setdefault((p.shape, m.ranks), []).append(idx)

        out: list = [None] * len(flat_p)

        stack = lambda *xs: jnp.stack(xs)  # works for TT cores and dicts alike
        vupd = jax.vmap(upd)
        for idxs in groups.values():
            g_s = jnp.stack([flat_g[i] for i in idxs])
            c_s = jnp.stack([flat_c[i] for i in idxs])
            p_s = jnp.stack([flat_p[i] for i in idxs])
            lr_s = jnp.stack([flat_lr[i] for i in idxs])
            m_s = jax.tree_util.tree_map(stack, *(flat_m[i] for i in idxs))
            v_s = jax.tree_util.tree_map(stack, *(flat_v[i] for i in idxs))
            u_s, c_out, m_out, v_out = vupd(g_s, c_s, m_s, v_s, p_s, lr_s)
            for j, i in enumerate(idxs):
                take = lambda x: x[j]
                out[i] = (
                    u_s[j],
                    c_out[j],
                    jax.tree_util.tree_map(take, m_out),
                    jax.tree_util.tree_map(take, v_out),
                )

        for i in range(len(flat_p)):
            if out[i] is None:
                out[i] = upd(flat_g[i], flat_c[i], flat_m[i], flat_v[i],
                             flat_p[i], flat_lr[i])

        return (
            treedef.unflatten([x[0] for x in out]),
            TTAdamState(
                step,
                treedef.unflatten([x[1] for x in out]),
                treedef.unflatten([x[2] for x in out]),
                treedef.unflatten([x[3] for x in out]),
            ),
        )

    return TTAdam(init=init, update=update)


def pure_tt_adam_update(
    grad_tt: TensorTrain,
    m: TensorTrain,
    v: TensorTrain,
    alpha: float,
    b1: float,
    b2: float,
    newton_iters: int = 8,
) -> tuple[TensorTrain, TensorTrain, TensorTrain]:
    """One Adam-like update entirely in TT arithmetic.

    The reference's intended end-state (``tests/tt_adam_update.py:54-77``):
    moments updated by TT add/scalar-mul, the second moment squared by TT
    Hadamard then rounded, and the denominator applied via the Newton
    ``sqrtinv``. Returns ``(update, m, v)`` — all TT, never densified.
    """
    ranks = list(grad_tt.ranks)
    m = (b1 * m + (1 - b1) * grad_tt).round(ranks)
    v = (b2 * v + (1 - b2) * (grad_tt * grad_tt)).round(
        grad_tt.input_shape[0] * grad_tt.output_shape[0]
    )
    m_hat = (1.0 / (1.0 - b1)) * m
    v_hat = (1.0 / (1.0 - b2)) * v
    update = alpha * (m_hat * v_hat.sqrtinv(max_iter=newton_iters))
    return update, m, v


def rebuild_tt_state_after_accumulation(
    old_state: TTAdamState,
    fresh_state: TTAdamState,
    labels: Any,
    reset_label: str = "sow",
) -> TTAdamState:
    """TTAdam counterpart of ``adamw.rebuild_state_after_accumulation``
    (adamw.py:154-191): after a SoW accumulation event restructures the
    params, carry non-``reset_label`` moments/counts over by param path and
    keep the fresh zeros for the reset group — the reference's per-group
    ``reset_optimizer`` (training_utils.py:257-277).

    Moment leaves here may be ``TensorTrain`` pytrees; a leaf carries over
    only when its full core structure matches (same treedef + shapes),
    which holds exactly for the untouched non-SoW params.
    """

    def _entry(x):
        # one "entry" per param position: a TensorTrain, a factored-v
        # {"vr","vc"} dict, or a plain array — NOT the dict's sub-leaves
        # (flattening those would misalign the zip against the per-param
        # label leaves)
        return isinstance(x, TensorTrain) or (
            isinstance(x, dict) and set(x) == {"vr", "vc"}
        )

    def _leaf_struct(x):
        return (
            jax.tree_util.tree_structure(x),
            [(l.shape, l.dtype) for l in jax.tree_util.tree_leaves(x)],
        )

    old_moments = {}
    for name, tree in (("mu", old_state.mu), ("nu", old_state.nu), ("count", old_state.count)):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree, is_leaf=_entry)
        for path, leaf in flat:
            old_moments[(name, jax.tree_util.keystr(path))] = leaf

    lab_leaves = jax.tree_util.tree_leaves(labels)

    def carry(name, tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree, is_leaf=_entry)
        out = []
        for (path, leaf), lab in zip(flat, lab_leaves):
            k = (name, jax.tree_util.keystr(path))
            if (
                lab != reset_label
                and k in old_moments
                and _leaf_struct(old_moments[k]) == _leaf_struct(leaf)
            ):
                out.append(old_moments[k])
            else:
                out.append(leaf)  # reset group: fresh zeros == the reset
        return jax.tree_util.tree_unflatten(treedef, out)

    return TTAdamState(
        step=old_state.step,
        count=carry("count", fresh_state.count),
        mu=carry("mu", fresh_state.mu),
        nu=carry("nu", fresh_state.nu),
    )
