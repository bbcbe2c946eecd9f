"""TT-SGD: SGD with momentum kept in tensor-train arithmetic.

TPU-native re-design of ``tn_gradient/optimizer/ttsgd.py:8-86``: for
compressed leaves the gradient is TT-decomposed, the momentum buffer is
updated *in TT form* (scalar-mul + add + round; ref ``ttsgd.py:64-73``), and
only the final update is reconstructed to dense. The reference's
double-applied weight decay (``ttsgd.py:61-62`` and ``:80-81``) is a bug and
is not replicated — decay applies once, decoupled.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from sow_tpu.tt import TensorTrain, cap_ranks
from sow_tpu.optim.ttadam import _tt_zeros_like, default_tt_spec


class TTSGDState(NamedTuple):
    step: jnp.ndarray
    momentum_buf: Any


class TTSGD(NamedTuple):
    init: Callable
    update: Callable


def ttsgd(
    lr: float | Callable = 1e-3,
    momentum: float = 0.9,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    tt_spec: Callable | None = None,
) -> TTSGD:
    spec_fn = tt_spec or default_tt_spec()

    def _is_tt(x):
        return isinstance(x, TensorTrain)

    def init(params):
        def buf(p):
            ranks = spec_fn(p)
            if ranks is None:
                return jnp.zeros_like(p)
            return _tt_zeros_like(p, ranks, "uniform")  # qr decompose path

        return TTSGDState(
            step=jnp.zeros((), jnp.int32),
            momentum_buf=jax.tree_util.tree_map(buf, params),
        )

    def update(grads, state: TTSGDState, params):
        step = state.step + 1
        lr_t = lr(step) if callable(lr) else lr

        def upd(g, buf, p):
            ranks = spec_fn(p)
            if ranks is not None:
                d_p = TensorTrain.from_matrix(g.astype(jnp.float32), ranks, padding=True)
                ranks_c = cap_ranks(ranks, d_p.input_shape, d_p.output_shape)
                if momentum != 0.0:
                    # TT-arithmetic momentum (ref ttsgd.py:64-73), rounded
                    # back to the storage ranks to keep state shapes static.
                    buf = (momentum * buf + (1.0 - dampening) * d_p).round(ranks_c)
                    d_p = (d_p + momentum * buf).round(ranks_c) if nesterov else buf
                d = d_p.to_matrix(p.shape)
            else:
                g32 = g.astype(jnp.float32)
                if momentum != 0.0:
                    buf = momentum * buf.astype(jnp.float32) + (1.0 - dampening) * g32
                    d = g32 + momentum * buf if nesterov else buf
                    buf = buf.astype(g.dtype)
                else:
                    d = g32
            u = -lr_t * d
            if weight_decay > 0.0:
                u = u - lr_t * weight_decay * p.astype(jnp.float32)
            return u.astype(p.dtype), buf

        out = jax.tree_util.tree_map(upd, grads, state.momentum_buf, params, is_leaf=_is_tt)
        treedef = jax.tree_util.tree_structure(params)
        leaves = treedef.flatten_up_to(out)
        return (
            treedef.unflatten([x[0] for x in leaves]),
            TTSGDState(step, treedef.unflatten([x[1] for x in leaves])),
        )

    return TTSGD(init=init, update=update)
