"""SoW linear op with reassociated backward — the framework's hot kernel.

Forward (the folded design, see ``sow_tpu.nn.sow``):

    y = x @ W_eff,   W_eff = W_base + scale * D @ U
    (D = cat_cols(A_i): K x nr,  U = cat_rows(B_i): nr x N,  W_base frozen)

The interesting part is the backward. Plain autodiff of the fold computes

    dW = x^T @ dy            # M*K*N FLOPs, materializes a K x N gradient
    dD = scale * dW @ U^T
    dU = scale * D^T @ dW

i.e. SoW training would cost as much as dense training's weight-gradient
path. But the factor gradients reassociate:

    dD = scale * x^T @ (dy @ U^T)      # M*N*nr + M*K*nr FLOPs
    dU = scale * (x @ D)^T @ dy        # M*K*nr + M*N*nr FLOPs

never forming dW. With nr << K, N this removes ~1/3 of the dense training
FLOPs (fwd M*K*N + dx M*K*N remain; dW M*K*N vanishes), so a SoW step is
*cheaper* than a dense step — the TPU-native answer to the reference's
per-pair thin-matmul forward (``tn_gradient/layer/sow.py:107-126``).

All matmuls accumulate in fp32 on the MXU (``preferred_element_type``);
outputs are cast back to the input dtype (bf16 in training).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _f32dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=())
def sow_matmul(x, d2, u2, w_base, scale):
    """``x @ (w_base + scale * d2 @ u2)``.

    x: (M, K); d2: (K, nr); u2: (nr, N); w_base: (K, N) frozen; scale: scalar.
    """
    w_eff = (w_base.astype(jnp.float32) + scale * _f32dot(d2, u2)).astype(x.dtype)
    return _f32dot(x, w_eff).astype(x.dtype)


def _sow_matmul_fwd(x, d2, u2, w_base, scale):
    w_eff = (w_base.astype(jnp.float32) + scale * _f32dot(d2, u2)).astype(x.dtype)
    y = _f32dot(x, w_eff).astype(x.dtype)
    # Residuals are all parameters/activations that already live in HBM —
    # no extra activation memory beyond dense.
    return y, (x, d2, u2, w_eff, scale)


def _sow_matmul_bwd(res, dy):
    x, d2, u2, w_eff, scale = res
    dy32 = dy
    dx = _f32dot(dy32, w_eff.T).astype(x.dtype)
    # reassociated factor gradients — dW is never formed
    t1 = _f32dot(dy32, u2.T)  # (M, nr)
    dd2 = (scale * _f32dot(x.T, t1.astype(x.dtype))).astype(d2.dtype)
    t2 = _f32dot(x, d2)  # (M, nr)
    du2 = (scale * _f32dot(t2.astype(x.dtype).T, dy32)).astype(u2.dtype)
    dw_base = jnp.zeros_like(res[3])  # frozen; DCE'd by XLA
    dscale = jnp.zeros_like(jnp.asarray(scale))
    return dx, dd2, du2, dw_base, dscale


sow_matmul.defvjp(_sow_matmul_fwd, _sow_matmul_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def sow_matmul_nobase(x, d2, u2, scale):
    """``x @ (scale * d2 @ u2)`` — blank-layer case (pretraining before the
    first accumulation, acc buffers empty; ref ``sow.py:69-70``)."""
    w_eff = (scale * _f32dot(d2, u2)).astype(x.dtype)
    return _f32dot(x, w_eff).astype(x.dtype)


def _nb_fwd(x, d2, u2, scale):
    w_eff = (scale * _f32dot(d2, u2)).astype(x.dtype)
    return _f32dot(x, w_eff).astype(x.dtype), (x, d2, u2, w_eff, scale)


def _nb_bwd(res, dy):
    x, d2, u2, w_eff, scale = res
    dx = _f32dot(dy, w_eff.T).astype(x.dtype)
    t1 = _f32dot(dy, u2.T)
    dd2 = (scale * _f32dot(x.T, t1.astype(x.dtype))).astype(d2.dtype)
    t2 = _f32dot(x, d2)
    du2 = (scale * _f32dot(t2.astype(x.dtype).T, dy)).astype(u2.dtype)
    return dx, dd2, du2, jnp.zeros_like(jnp.asarray(scale))


sow_matmul_nobase.defvjp(_nb_fwd, _nb_bwd)


def sow_linear(
    x: jax.Array,
    down: jax.Array,  # (n_iter, K, r)
    up: jax.Array,  # (n_iter, r, N)
    acc_down: Optional[jax.Array],
    acc_up: Optional[jax.Array],
    bias: Optional[jax.Array],
    scale: jax.Array,
) -> jax.Array:
    """Full SoW linear on arbitrary-rank ``x`` (..., K) with the
    reassociated-backward op on the flattened token axis."""
    n, k, r = down.shape
    _, _, nf = up.shape
    d2 = jnp.transpose(down, (1, 0, 2)).reshape(k, n * r)
    u2 = up.reshape(n * r, nf)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    scale = jax.lax.stop_gradient(scale).astype(jnp.float32)

    if acc_down is None:
        y = sow_matmul_nobase(x2, d2, u2, scale)
    else:
        if acc_up is not None:
            w_base = _f32dot(acc_down, acc_up).astype(x.dtype)
        else:
            w_base = acc_down
        w_base = jax.lax.stop_gradient(w_base)
        y = sow_matmul(x2, d2, u2, w_base, scale)

    y = y.reshape(*lead, nf)
    if bias is not None:
        y = y + bias
    return y
