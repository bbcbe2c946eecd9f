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
    return jnp.dot(x, w_eff)


def _sow_matmul_fwd(x, d2, u2, w_base, scale):
    w_eff = (w_base.astype(jnp.float32) + scale * _f32dot(d2, u2)).astype(x.dtype)
    y = jnp.dot(x, w_eff)
    # Residuals are all parameters/activations that already live in HBM —
    # no extra activation memory beyond dense.
    return y, (x, d2, u2, w_eff, scale)


def _sow_matmul_bwd(res, dy):
    x, d2, u2, w_eff, scale = res
    # Token-space matmuls stay in the compute dtype (bf16 on the MXU, which
    # accumulates fp32 internally); fp32 outputs would double HBM writes.
    dx = jnp.dot(dy, w_eff.T)
    # reassociated factor gradients — dW is never formed
    t1 = jnp.dot(dy, u2.T)  # (M, nr)
    dd2 = (scale * _f32dot(x.T, t1)).astype(d2.dtype)
    t2 = jnp.dot(x, d2)  # (M, nr)
    du2 = (scale * _f32dot(t2.T, dy)).astype(u2.dtype)
    dw_base = jnp.zeros_like(res[3])  # frozen; DCE'd by XLA
    dscale = jnp.zeros_like(jnp.asarray(scale))
    return dx, dd2, du2, dw_base, dscale


sow_matmul.defvjp(_sow_matmul_fwd, _sow_matmul_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def sow_matmul_nobase(x, d2, u2, scale):
    """``x @ (scale * d2 @ u2)`` — blank-layer case (pretraining before the
    first accumulation, acc buffers empty; ref ``sow.py:69-70``)."""
    w_eff = (scale * _f32dot(d2, u2)).astype(x.dtype)
    return jnp.dot(x, w_eff)


def _nb_fwd(x, d2, u2, scale):
    w_eff = (scale * _f32dot(d2, u2)).astype(x.dtype)
    return jnp.dot(x, w_eff), (x, d2, u2, w_eff, scale)


def _nb_bwd(res, dy):
    x, d2, u2, w_eff, scale = res
    dx = jnp.dot(dy, w_eff.T)
    t1 = jnp.dot(dy, u2.T)
    dd2 = (scale * _f32dot(x.T, t1)).astype(d2.dtype)
    t2 = jnp.dot(x, d2)
    du2 = (scale * _f32dot(t2.T, dy)).astype(u2.dtype)
    return dx, dd2, du2, jnp.zeros_like(jnp.asarray(scale))


sow_matmul_nobase.defvjp(_nb_fwd, _nb_bwd)


def _pad128(nr: int) -> int:
    return -(-nr // 128) * 128


def _reassoc_wins(k: int, n: int, nr: int) -> bool:
    """Shape heuristic: reassociation replaces the M*K*N dW matmul with four
    skinny token-space matmuls whose inner/minor dim pads to the 128-lane MXU
    tile. Measured on v5e, the skinny path only wins when its padded FLOPs
    are well under the dW FLOPs (fusion losses eat narrow margins)."""
    return 2 * _pad128(nr) * (k + n) < 0.5 * k * n


def _factored_wins(k: int, n: int, nr: int) -> bool:
    """Blank layers (no base) can run fully factored — ``(x @ D) @ U`` —
    with NO K x N object anywhere: fwd+bwd is ~3*M*nr_pad*(K+N) FLOPs vs
    dense's ~3*M*K*N. Plain autodiff already yields the 6 skinny matmuls,
    so no custom vjp is needed. Wins whenever the padded-rank FLOPs beat the
    dense-width FLOPs with margin."""
    return 2 * _pad128(nr) * (k + n) < 0.9 * k * n


def sow_linear(
    x: jax.Array,
    down: jax.Array,  # (n_iter, K, r)
    up: jax.Array,  # (n_iter, r, N)
    acc_down: Optional[jax.Array],
    acc_up: Optional[jax.Array],
    bias: Optional[jax.Array],
    scale: jax.Array,
) -> jax.Array:
    """Full SoW linear on arbitrary-rank ``x`` (..., K).

    All paths keep ``x`` at its native rank — flattening to 2D and back was
    measured to cost ~one extra activation-sized copy per layer per
    direction (the 3D->2D reshapes defeated XLA's layout propagation,
    +15GB/step on llama-60m bs=256). Strategy per shape:

      * folded (default): ``y = x @ (W_base + s*D@U)`` — byte-identical to
        a dense layer (measured), fold FLOPs are batch-free;
      * factored (blank/factored base when the padded-rank FLOPs win):
        ``y = (x@D)@U`` etc. — ~3x fewer FLOPs, +~4% bytes; XLA autodiff
        already yields the optimal skinny backward;
      * reassociated custom VJP (2D fast path for very large layers with
        small rank — 7B finetuning): dW is never materialized.
    """
    n, k, r = down.shape
    _, _, nf = up.shape
    d2 = jnp.transpose(down, (1, 0, 2)).reshape(k, n * r)
    u2 = up.reshape(n * r, nf)
    scale32 = jax.lax.stop_gradient(scale).astype(jnp.float32)

    if acc_down is None:
        if _factored_wins(k, nf, n * r):
            s = scale32.astype(x.dtype)
            y = jnp.matmul(jnp.matmul(x, d2) * s, u2)
        elif _reassoc_wins(k, nf, n * r):
            lead = x.shape[:-1]
            y = sow_matmul_nobase(x.reshape(-1, k), d2, u2, scale32).reshape(*lead, nf)
        else:
            w_eff = (scale32 * _f32dot(d2, u2)).astype(x.dtype)
            y = jnp.matmul(x, w_eff)
    else:
        vr = acc_down.shape[1] if acc_up is not None else None
        if (
            acc_up is not None
            and _factored_wins(k, nf, vr)
            and _factored_wins(k, nf, n * r)
        ):
            ad = jax.lax.stop_gradient(acc_down)
            au = jax.lax.stop_gradient(acc_up)
            s = scale32.astype(x.dtype)
            y = jnp.matmul(jnp.matmul(x, ad), au) + jnp.matmul(jnp.matmul(x, d2) * s, u2)
        else:
            if acc_up is not None:
                w_base = _f32dot(acc_down, acc_up).astype(x.dtype)
            else:
                w_base = acc_down
            w_base = jax.lax.stop_gradient(w_base)
            if _reassoc_wins(k, nf, n * r):
                lead = x.shape[:-1]
                y = sow_matmul(x.reshape(-1, k), d2, u2, w_base, scale32).reshape(*lead, nf)
            else:
                w_eff = (w_base.astype(jnp.float32) + scale32 * _f32dot(d2, u2)).astype(x.dtype)
                y = jnp.matmul(x, w_eff)

    if bias is not None:
        y = y + bias
    return y
