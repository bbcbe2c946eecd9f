"""Fused cross-entropy — Pallas TPU kernels for the vocab-32000 loss path.

Why: with a 32k vocab the CE loss dominates HBM traffic at small model
sizes. The XLA path materializes fp32 ``log_softmax`` (tokens x vocab) in
forward AND an fp32 ``dlogits`` in backward — several GB per step for
llama-60m batches, on a step that is bandwidth-bound. These kernels:

  * forward: one streaming pass over vocab tiles per token block with the
    online (rescaling) logsumexp recurrence, gathering the target logit on
    the fly — no (tokens, vocab) intermediate beyond the bf16 logits;
  * backward: writes ``dlogits = g * (softmax - onehot)`` directly in the
    logits dtype, fused in one elementwise pass using the saved logsumexp.

Sharding: the kernel emits *partial* (max, sumexp, target-logit) statistics,
so a vocab-sharded lm_head combines shards with one pmax + two psums
(``fused_ce_vocab_sharded``); batch sharding wraps via shard_map
(``fused_causal_lm_loss_sharded``).

Measured note (v5e, llama-60m, seq 256): XLA's own fused softmax-CE is
faster — the kernels stay behind ``TrainConfig.fused_loss``; their value is
memory (seq-1024 bs-64 trains where the XLA path OOMs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _ce_partial_kernel(logits_ref, targets_ref, m_ref, s_ref, tl_ref, m_sc, s_sc, tl_sc):
    """Grid (T/BT, V/BV): per token block, stream vocab tiles keeping a
    running max ``m``, rescaled sum ``s``, and the (local-) target logit
    ``tl``; write the finals to the outputs at the last tile.
    (Pallas argument order: inputs, outputs, scratch.)"""
    j = pl.program_id(1)
    nv = pl.num_programs(1)
    bt, bv = logits_ref.shape

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full((bt, 1), NEG, jnp.float32)
        s_sc[:] = jnp.zeros((bt, 1), jnp.float32)
        tl_sc[:] = jnp.zeros((bt, 1), jnp.float32)

    x = logits_ref[:].astype(jnp.float32)  # (BT, BV)
    m_old = m_sc[:]
    m_new = jnp.maximum(m_old, jnp.max(x, axis=1, keepdims=True))
    # online rescale (flash-softmax recurrence)
    s_sc[:] = s_sc[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(x - m_new), axis=1, keepdims=True
    )
    m_sc[:] = m_new

    # gather the target logit if it falls inside this vocab tile
    tgt = targets_ref[:]  # (BT, 1); out-of-range / negative = no hit
    local = tgt - j * bv
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1)
    hit = cols == local
    tl_sc[:] = tl_sc[:] + jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        m_ref[:] = m_sc[:]
        s_ref[:] = s_sc[:]
        tl_ref[:] = tl_sc[:]


def _ce_bwd_kernel(logits_ref, targets_ref, valid_ref, lse_ref, g_ref, dlogits_ref):
    """Grid (T/BT, V/BV): ``dlogits = g * (exp(l - lse) - onehot)`` in the
    logits dtype. ``targets`` are in LOCAL vocab coordinates (out-of-range =
    no onehot); ``valid`` gates ignored rows."""
    j = pl.program_id(1)
    bt, bv = logits_ref.shape
    x = logits_ref[:].astype(jnp.float32)
    lse = lse_ref[:]
    tgt = targets_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1)
    onehot = (cols == (tgt - j * bv)).astype(jnp.float32)
    p = jnp.exp(x - lse)
    g = g_ref[:] * valid_ref[:].astype(jnp.float32)
    dlogits_ref[:] = (g * (p - onehot)).astype(dlogits_ref.dtype)


def _pick_bv(v: int) -> int:
    for bv in (4096, 3200, 2048, 1024, 512, 256, 128):
        if v % bv == 0:
            return bv
    return v


def _pick_bt(t: int) -> int:
    for bt in (256, 128, 64, 32, 16, 8):
        if t % bt == 0:
            return bt
    return t


def _ce_partial(logits, targets_local, interpret):
    """Run the streaming kernel; returns per-token (m, s, tl) fp32 (T,)."""
    t, v = logits.shape
    bt, bv = _pick_bt(t), _pick_bv(v)
    m, s, tl = pl.pallas_call(
        _ce_partial_kernel,
        grid=(t // bt, v // bv),
        in_specs=[
            pl.BlockSpec((bt, bv), lambda i, j: (i, j)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, 1), jnp.float32),
        ],
        interpret=interpret,
    )(logits, targets_local.reshape(t, 1))
    return m[:, 0], s[:, 0], tl[:, 0]


def _ce_backward(logits, targets_local, valid, lse, g, interpret):
    t, v = logits.shape
    bt, bv = _pick_bt(t), _pick_bv(v)
    return pl.pallas_call(
        _ce_bwd_kernel,
        grid=(t // bt, v // bv),
        in_specs=[
            pl.BlockSpec((bt, bv), lambda i, j: (i, j)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, bv), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((t, v), logits.dtype),
        interpret=interpret,
    )(
        logits,
        targets_local.reshape(t, 1),
        valid.astype(jnp.int32).reshape(t, 1),
        lse.reshape(t, 1),
        g.reshape(t, 1),
    )


# -- unsharded-vocab per-token API --------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce_per_token(logits, targets, gscale, interpret=False):
    """Per-token NLL ``(T,)`` fp32 for ``logits (T, V)`` and int32 targets
    (negative target = ignored, contributes 0). ``gscale`` is a per-token
    fp32 weight applied in backward."""
    nll, _ = _ce_forward(logits, targets, interpret)
    return nll


def _ce_forward(logits, targets, interpret):
    m, s, tl = _ce_partial(logits, targets, interpret)
    lse = m + jnp.log(s)
    nll = jnp.where(targets >= 0, lse - tl, 0.0)
    return nll, lse


def _fused_ce_fwd(logits, targets, gscale, interpret):
    nll, lse = _ce_forward(logits, targets, interpret)
    return nll, (logits, targets, lse, gscale)


def _fused_ce_bwd(interpret, res, dnll):
    logits, targets, lse, gscale = res
    g = (dnll * gscale).astype(jnp.float32)
    dlogits = _ce_backward(logits, targets, targets >= 0, lse, g, interpret)
    return dlogits, None, None


fused_ce_per_token.defvjp(_fused_ce_fwd, _fused_ce_bwd)


# -- vocab-sharded per-token API ----------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_ce_per_token_vocab_sharded(logits, targets, model_axis, vocab_shards, interpret=False):
    """Per-token NLL where ``logits (T, V_local)`` is one vocab shard inside
    a shard_map over ``model_axis``; ``targets`` are GLOBAL vocab indices.
    Two-pass combine: local streaming stats, then one pmax + two psums.
    """
    nll, _ = _vs_forward(logits, targets, model_axis, interpret)
    return nll


def _vs_forward(logits, targets, model_axis, interpret):
    t, v_local = logits.shape
    shard = jax.lax.axis_index(model_axis)
    tgt_local = jnp.where(targets >= 0, targets - shard * v_local, -1)
    m, s, tl = _ce_partial(logits, tgt_local, interpret)
    m_g = jax.lax.pmax(m, model_axis)
    s_g = jax.lax.psum(s * jnp.exp(m - m_g), model_axis)
    tl_g = jax.lax.psum(tl, model_axis)
    lse = m_g + jnp.log(s_g)
    nll = jnp.where(targets >= 0, lse - tl_g, 0.0)
    return nll, lse


def _vs_fwd(logits, targets, model_axis, vocab_shards, interpret):
    nll, lse = _vs_forward(logits, targets, model_axis, interpret)
    return nll, (logits, targets, lse)


def _vs_bwd(model_axis, vocab_shards, interpret, res, dnll):
    logits, targets, lse = res
    t, v_local = logits.shape
    shard = jax.lax.axis_index(model_axis)
    tgt_local = jnp.where(targets >= 0, targets - shard * v_local, -1)
    # nll left this vjp replicated over the model axis; shard_map's transpose
    # of the downstream unmentioned-axis output splits the cotangent 1/n per
    # shard (measured), so scale it back — each logits element lives on
    # exactly one shard and needs the full cotangent.
    g = dnll.astype(jnp.float32) * float(vocab_shards)
    dlogits = _ce_backward(logits, tgt_local, targets >= 0, lse, g, interpret)
    return dlogits, None


fused_ce_per_token_vocab_sharded.defvjp(_vs_fwd, _vs_bwd)


# -- loss-level wrappers -------------------------------------------------------

def fused_causal_lm_loss_sharded(
    logits: jax.Array,
    labels: jax.Array,
    mesh,
    batch_axes: tuple = ("data", "fsdp"),
    model_axis: str = "model",
    ignore_index: int = -100,
    interpret: bool = False,
) -> jax.Array:
    """Multi-chip fused loss: batch sharded over ``batch_axes``, vocab over
    ``model_axis`` (1-sized axes are fine — the collectives are no-ops)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    vocab_shards = mesh.shape[model_axis]

    def local(lg, lb):
        b, s, v_local = lg.shape
        flat_logits = lg[:, :-1].reshape(b * (s - 1), v_local)
        targets = lb[:, 1:].reshape(b * (s - 1))
        tgt = jnp.where(targets == ignore_index, -1, targets).astype(jnp.int32)
        if vocab_shards > 1:
            nll = fused_ce_per_token_vocab_sharded(
                flat_logits, tgt, model_axis, vocab_shards, interpret
            )
        else:
            nll = fused_ce_per_token(flat_logits, tgt, jnp.ones((), jnp.float32), interpret)
        total = jax.lax.psum(nll.sum(), batch_axes)
        n = jax.lax.psum((tgt >= 0).sum(), batch_axes)
        return total / jnp.maximum(n, 1).astype(jnp.float32)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axes, None, model_axis), P(batch_axes)),
        out_specs=P(),
        check_vma=False,
    )(logits, labels)


def fused_causal_lm_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = -100,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused replacement for ``models.llama.causal_lm_loss``:
    shifted next-token mean NLL over valid targets (single device)."""
    b, s, v = logits.shape
    flat_logits = logits[:, :-1].reshape(b * (s - 1), v)
    targets = labels[:, 1:].reshape(b * (s - 1))
    tgt = jnp.where(targets == ignore_index, -1, targets).astype(jnp.int32)
    n_valid = jnp.maximum((tgt >= 0).sum(), 1).astype(jnp.float32)
    nll = fused_ce_per_token(flat_logits, tgt, jnp.full((b * (s - 1),), 1.0), interpret)
    return nll.sum() / n_valid
