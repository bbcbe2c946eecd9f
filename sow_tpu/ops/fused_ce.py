"""Fused cross-entropy — Pallas TPU kernel for the vocab-32000 loss path.

Why: with a 32k vocab the CE loss dominates HBM traffic at small model
sizes. The XLA path materializes fp32 ``log_softmax`` (tokens x vocab) in
forward AND an fp32 ``dlogits`` in backward — several GB per step for
llama-60m batches, on a step that is bandwidth-bound. This kernel:

  * forward: one streaming pass over vocab tiles per token block, computing
    an online (rescaling) logsumexp + the target logit — never materializing
    any (tokens, vocab) intermediate beyond the bf16 logits already in HBM;
  * backward: writes ``dlogits = g * (softmax - onehot)`` directly in the
    logits dtype (bf16), fused in one elementwise pass using the saved
    logsumexp.

Falls back to the XLA implementation off-TPU; correctness is tested in
Pallas interpret mode against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _ce_fwd_kernel(logits_ref, targets_ref, lse_ref, nll_ref, m_ref, s_ref, tl_ref):
    """Grid (T/BT, V/BV). For each token block, stream vocab tiles keeping a
    running max ``m``, rescaled sum ``s``, and the target logit ``tl``.
    (Pallas argument order: inputs, outputs, scratch.)"""
    j = pl.program_id(1)
    nv = pl.num_programs(1)
    bt, bv = logits_ref.shape

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full((bt, 1), NEG, jnp.float32)
        s_ref[:] = jnp.zeros((bt, 1), jnp.float32)
        tl_ref[:] = jnp.zeros((bt, 1), jnp.float32)

    x = logits_ref[:].astype(jnp.float32)  # (BT, BV)
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(x, axis=1, keepdims=True))
    # online rescale (flash-softmax recurrence)
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(x - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    # gather the target logit if it falls inside this vocab tile
    tgt = targets_ref[:]  # (BT, 1) global vocab index (or <0 = ignored)
    local = tgt - j * bv
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1)
    hit = cols == local
    tl_ref[:] = tl_ref[:] + jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)

    @pl.when(j == nv - 1)
    def _():
        lse = m_ref[:] + jnp.log(s_ref[:])
        lse_ref[:] = lse
        valid = tgt >= 0
        nll_ref[:] = jnp.where(valid, lse - tl_ref[:], 0.0)


def _ce_bwd_kernel(logits_ref, targets_ref, lse_ref, g_ref, dlogits_ref):
    """Grid (T/BT, V/BV): ``dlogits = g * (exp(l - lse) - onehot)``, written
    in the logits dtype — no fp32 (T, V) intermediate."""
    j = pl.program_id(0 + 1)
    bt, bv = logits_ref.shape
    x = logits_ref[:].astype(jnp.float32)
    lse = lse_ref[:]
    tgt = targets_ref[:]
    valid = tgt >= 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1)
    onehot = (cols == (tgt - j * bv)).astype(jnp.float32)
    p = jnp.exp(x - lse)
    g = g_ref[:] * valid.astype(jnp.float32)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce_per_token(logits, targets, gscale, interpret=False):
    """Per-token NLL ``(T,)`` fp32 for ``logits (T, V)`` and int32 targets
    (negative target = ignored, contributes 0). ``gscale`` is a per-token
    fp32 weight applied in backward (use 1/num_valid for a mean loss)."""
    nll, _ = _ce_forward(logits, targets, interpret)
    return nll


def _ce_forward(logits, targets, interpret):
    t, v = logits.shape
    bt, bv = _pick_bt(t), _pick_bv(v)
    grid = (t // bt, v // bv)
    lse, nll = pl.pallas_call(
        _ce_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bv), lambda i, j: (i, j)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, 1), jnp.float32),
        ],
        interpret=interpret,
    )(logits, targets.reshape(t, 1))
    return nll[:, 0], lse[:, 0]


def _fused_ce_fwd(logits, targets, gscale, interpret):
    nll, lse = _ce_forward(logits, targets, interpret)
    return nll, (logits, targets, lse, gscale)


def _fused_ce_bwd(interpret, res, dnll):
    logits, targets, lse, gscale = res
    t, v = logits.shape
    bt, bv = _pick_bt(t), _pick_bv(v)
    g = (dnll * gscale).astype(jnp.float32).reshape(t, 1)
    dlogits = pl.pallas_call(
        _ce_bwd_kernel,
        grid=(t // bt, v // bv),
        in_specs=[
            pl.BlockSpec((bt, bv), lambda i, j: (i, j)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, bv), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((t, v), logits.dtype),
        interpret=interpret,
    )(logits, targets.reshape(t, 1), lse.reshape(t, 1), g)
    return dlogits, None, None


fused_ce_per_token.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_causal_lm_loss_sharded(
    logits: jax.Array,
    labels: jax.Array,
    mesh,
    batch_axes: tuple = ("data", "fsdp"),
    ignore_index: int = -100,
    interpret: bool = False,
) -> jax.Array:
    """Multi-chip wrapper: each shard runs the kernel on its batch slice and
    the valid-token-weighted mean is psum-reduced over ``batch_axes``.

    Requires the vocab axis unsharded (the streaming logsumexp is per-row;
    cross-vocab-shard reduction would need a second collective pass) — the
    trainer gates on ``mesh_model == 1`` accordingly.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(lg, lb):
        b, s, v = lg.shape
        flat_logits = lg[:, :-1].reshape(b * (s - 1), v)
        targets = lb[:, 1:].reshape(b * (s - 1))
        tgt = jnp.where(targets == ignore_index, -1, targets).astype(jnp.int32)
        nll = fused_ce_per_token(
            flat_logits, tgt, jnp.full((b * (s - 1),), 1.0), interpret
        )
        total = jax.lax.psum(nll.sum(), batch_axes)
        n = jax.lax.psum((tgt >= 0).sum(), batch_axes)
        return total / jnp.maximum(n, 1).astype(jnp.float32)

    spec = P(batch_axes)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=P(), check_rep=False
    )(logits, labels)


def fused_causal_lm_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = -100,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused replacement for ``models.llama.causal_lm_loss``:
    shifted next-token mean NLL over valid targets."""
    b, s, v = logits.shape
    flat_logits = logits[:, :-1].reshape(b * (s - 1), v)
    targets = labels[:, 1:].reshape(b * (s - 1))
    tgt = jnp.where(targets == ignore_index, -1, targets).astype(jnp.int32)
    n_valid = jnp.maximum((tgt >= 0).sum(), 1).astype(jnp.float32)
    # gscale folds the 1/n_valid of the mean into the backward weight, so
    # d(mean)/dlogits comes out right with dnll = 1.
    nll = fused_ce_per_token(flat_logits, tgt, jnp.full((b * (s - 1),), 1.0), interpret)
    return nll.sum() / n_valid
