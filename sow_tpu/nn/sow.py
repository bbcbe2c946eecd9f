"""SoW (Sum-of-Weights) linear layer — TPU-native functional design.

Re-design of the reference ``SoWLinear`` (``tn_gradient/layer/sow.py:45-181``).
The layer parameterizes a linear map as

    W = W_acc + scale * sum_i A_i @ B_i          (A_i: in x r, B_i: r x out)

with trainable low-rank factors and a frozen accumulated base ``W_acc`` that
absorbs the factors every ``accumulate`` call, growing the effective rank over
training while optimizer state stays O((in+out) * r * n_iter).

TPU-first decisions (vs the torch reference):

* **Weight-space folding.** The reference forward chains ``n_iter + 1`` thin
  activation matmuls (``sow.py:107-126``). Here the effective weight
  ``W_eff = W_acc + scale * cat(A) @ cat(B)`` is folded in weight space —
  O(in*out*n*r) FLOPs, independent of batch — and the token path is a single
  dense ``x @ W_eff`` matmul that the MXU runs at the same speed as a dense
  baseline layer. Autodiff through the fold gives exactly the factor
  gradients ``dA = scale * dW @ B^T``, ``dB = scale * A^T @ dW``.
* **Stacked factors.** The ``n_iter`` pairs live as single stacked arrays
  ``down: (n, in, r)``, ``up: (n, r, out)`` instead of Python lists of
  parameters — one pytree leaf each, friendly to jit/sharding/optimizers.
* **Static rank metadata.** ``virtual_rank`` (the factored width of
  ``W_acc``) is static pytree metadata: shapes stay fixed between
  accumulation events, and each accumulation produces a new static shape
  (one recompile per growth step — every ~5k steps, amortized to nothing).
* **Explicit RNG.** Re-initialization threads a ``jax.random`` key instead of
  the torch global RNG (``sow.py:89-105`` hardcodes ``.to("cuda")``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from sow_tpu.utils.numerics import qr_weight


def _fold_factors(down: jax.Array, up: jax.Array, preferred_dtype=jnp.float32) -> jax.Array:
    """``sum_i A_i @ B_i`` as one matmul: ``cat_cols(A) @ cat_rows(B)``.

    ``down``: (n, in, r), ``up``: (n, r, out) -> (in, out). The stacked
    contraction is mathematically the sum over pairs.
    """
    n, d_in, r = down.shape
    _, _, d_out = up.shape
    d2 = jnp.transpose(down, (1, 0, 2)).reshape(d_in, n * r)
    u2 = up.reshape(n * r, d_out)
    return jnp.dot(d2, u2, preferred_element_type=preferred_dtype)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("down", "up", "acc_down", "acc_up", "bias", "scale"),
    meta_fields=("rank", "n_iter", "virtual_rank", "init_method"),
)
@dataclasses.dataclass
class SoWLinear:
    """Parameters + static config of one SoW linear layer (a pytree node).

    ``acc_down``/``acc_up`` hold the frozen accumulated base:
      * both ``None``     — blank layer (pretraining before 1st accumulation;
                            ref ``sow.py:69-70`` empty params)
      * ``acc_up is None``— dense base ``W_acc = acc_down`` (in, out)
                            (ref ``sow.py:151-153``)
      * both present      — factored base ``acc_down @ acc_up`` with inner
                            dim ``virtual_rank`` (ref ``sow.py:146-148``)
    """

    down: jax.Array  # (n_iter, in, rank), trainable
    up: jax.Array  # (n_iter, rank, out), trainable
    acc_down: Optional[jax.Array]  # frozen
    acc_up: Optional[jax.Array]  # frozen
    bias: Optional[jax.Array]  # (out,), trainable
    scale: jax.Array  # scalar; dynamic so scale->1/rank needs no recompile
    rank: int
    n_iter: int
    virtual_rank: int
    init_method: str

    # -- static helpers ----------------------------------------------------
    @property
    def in_features(self) -> int:
        return self.down.shape[1]

    @property
    def out_features(self) -> int:
        return self.up.shape[2]

    @property
    def dtype(self):
        return self.down.dtype

    # -- construction ------------------------------------------------------
    @staticmethod
    def init_factors(
        key: jax.Array,
        in_features: int,
        out_features: int,
        rank: int,
        n_iter: int,
        init_method: str = "normal_QR",
        dtype=jnp.float32,
        zero_up: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        """Draw fresh (down, up) factor stacks.

        ``normal_QR`` (ref ``sow.py:89-105``): per pair, sample
        ``N(0, 0.02)`` of shape (in, out), take truncated QR, use
        ``Q[:, :r]`` as A and ``R[:r, :]`` as B (or zeros when ``zero_up`` —
        the post-accumulation continuity reset, ref ``sow.py:157-178``).
        """
        keys = jax.random.split(key, n_iter)
        if init_method == "normal_QR":
            def one(k):
                w = 0.02 * jax.random.normal(k, (in_features, out_features), jnp.float32)
                q, r = qr_weight(w, rank)
                return q, r

            qs, rs = jax.vmap(one)(keys)
            down = qs.astype(dtype)
            up = jnp.zeros_like(rs, dtype=dtype) if zero_up else rs.astype(dtype)
        else:  # plain gaussian init (ref sow.py:101-102)
            down = 0.02 * jax.random.normal(keys[0], (n_iter, in_features, rank), jnp.float32)
            up = (
                jnp.zeros((n_iter, rank, out_features), jnp.float32)
                if zero_up
                else 0.02 * jax.random.normal(keys[-1], (n_iter, rank, out_features), jnp.float32)
            )
            down, up = down.astype(dtype), up.astype(dtype)
        return down, up

    @staticmethod
    def create(
        key: jax.Array,
        in_features: int,
        out_features: int,
        rank: int = 16,
        n_iter: int = 1,
        scale: float = 1.0,
        bias: bool = True,
        init_method: str = "normal_QR",
        dtype=jnp.float32,
    ) -> "SoWLinear":
        """Blank SoW layer for pretraining (no accumulated base yet;
        ref ``sow.py:47-87`` with ``decompose=None``)."""
        down, up = SoWLinear.init_factors(
            key, in_features, out_features, rank, n_iter, init_method, dtype
        )
        return SoWLinear(
            down=down,
            up=up,
            acc_down=None,
            acc_up=None,
            bias=jnp.zeros((out_features,), dtype) if bias else None,
            scale=jnp.asarray(scale, jnp.float32),
            rank=rank,
            n_iter=n_iter,
            virtual_rank=min(rank * n_iter, in_features, out_features),
            init_method=init_method,
        )

    # -- forward -----------------------------------------------------------
    def effective_weight(self) -> jax.Array:
        """Fold ``W_acc + scale * sum_i A_i B_i`` into a dense (in, out).

        fp32 accumulation, cast to the factor dtype at the end — the bf16
        parity gate (BASELINE.md) requires fp32 accumulation in exactly this
        contraction.
        """
        # scale and the accumulated base are frozen (ref: requires_grad=False,
        # sow.py:69-70); stop_gradient prunes their cotangent computation.
        scale = jax.lax.stop_gradient(self.scale.astype(jnp.float32))
        w = _fold_factors(self.down, self.up) * scale
        if self.acc_down is not None and self.acc_up is not None:
            w = w + jax.lax.stop_gradient(
                jnp.dot(self.acc_down, self.acc_up, preferred_element_type=jnp.float32)
            )
        elif self.acc_down is not None:
            w = w + jax.lax.stop_gradient(self.acc_down.astype(jnp.float32))
        return w.astype(self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        """``y = x @ W_eff + bias`` — a single MXU matmul on the token path
        (replaces the reference's n_iter+1 chained thin matmuls,
        ``sow.py:107-126``), with a reassociated custom backward that never
        materializes the K x N weight gradient (see
        ``sow_tpu.ops.sow_matmul``)."""
        from sow_tpu.nn.quant import QuantizedTensor
        from sow_tpu.ops.sow_matmul import sow_linear

        acc_down = self.acc_down
        if isinstance(acc_down, QuantizedTensor):
            # int8 frozen base (nn/quant.py): dequantize transiently — XLA
            # keeps the bf16 copy fusion-local, HBM holds the int8 bytes.
            acc_down = jax.lax.stop_gradient(acc_down.dequantize(self.dtype))
        return sow_linear(
            x, self.down, self.up, acc_down, self.acc_up, self.bias, self.scale
        )

    def call_folded(self, x: jax.Array) -> jax.Array:
        """Plain-autodiff folded path (no custom vjp) — for cross-checks."""
        y = x @ self.effective_weight()
        if self.bias is not None:
            y = y + self.bias
        return y

    # -- lifecycle ---------------------------------------------------------
    def accumulate(self, key: jax.Array) -> "SoWLinear":
        """Fold active factors into the frozen base, grow the virtual rank,
        and re-initialize the factors (A fresh QR-normal, B zero — output is
        unchanged immediately after, ref ``sow.py:128-178``).

        Pure function: returns a new layer whose acc buffers may have a new
        static shape (one jit recompile per rank-growth event).
        """
        d_in, d_out = self.in_features, self.out_features
        # fp32 weight-space fold (ref sow.py:131-140).
        acc = _fold_factors(self.down, self.up) * self.scale.astype(jnp.float32)
        if self.acc_down is not None and self.acc_up is not None:
            acc = acc + jnp.dot(
                self.acc_down, self.acc_up, preferred_element_type=jnp.float32
            )
        elif self.acc_down is not None:
            acc = acc + self.acc_down.astype(jnp.float32)

        from sow_tpu.nn.quant import QuantizedTensor, quantize_int8

        if self.virtual_rank < min(d_in, d_out):
            q, r = qr_weight(acc, self.virtual_rank)
            acc_down, acc_up = q.astype(self.dtype), r.astype(self.dtype)
            new_vr = min(self.virtual_rank + self.rank * self.n_iter, d_in, d_out)
        else:
            # preserve an int8 base's storage format across accumulations
            if isinstance(self.acc_down, QuantizedTensor):
                acc_down = quantize_int8(acc, axis=self.acc_down.axis)
            else:
                acc_down = acc.astype(self.dtype)
            acc_up = None
            new_vr = self.virtual_rank

        down, up = SoWLinear.init_factors(
            key,
            d_in,
            d_out,
            self.rank,
            self.n_iter,
            self.init_method,
            self.dtype,
            zero_up=True,
        )
        return dataclasses.replace(
            self,
            down=down,
            up=up,
            acc_down=acc_down,
            acc_up=acc_up,
            virtual_rank=new_vr,
        )

    def with_scale(self, scale) -> "SoWLinear":
        """Return the layer with a new scale (e.g. 1/rank after the first
        finetune accumulation, ref ``run_glue.py:993-1002``)."""
        return dataclasses.replace(self, scale=jnp.asarray(scale, jnp.float32))

    # -- introspection -----------------------------------------------------
    def trainable_count(self) -> int:
        n = self.down.size + self.up.size
        if self.bias is not None:
            n += self.bias.size
        return int(n)

    def accumulated_count(self) -> int:
        n = 0
        if self.acc_down is not None:
            n += self.acc_down.size
        if self.acc_up is not None:
            n += self.acc_up.size
        return int(n)


def sow_forward_unfolded(layer: SoWLinear, x: jax.Array) -> jax.Array:
    """Reference-shaped forward: base path + per-pair thin matmuls
    (``sow.py:107-126``), kept for numerics cross-checks and benchmarking
    against the folded path."""
    if layer.acc_down is not None and layer.acc_up is not None:
        out = (x @ layer.acc_down) @ layer.acc_up
    elif layer.acc_down is not None:
        out = x @ layer.acc_down
    else:
        out = jnp.zeros(x.shape[:-1] + (layer.out_features,), x.dtype)
    scale = layer.scale.astype(x.dtype)
    for i in range(layer.n_iter):
        out = out + scale * ((x @ layer.down[i]) @ layer.up[i])
    if layer.bias is not None:
        out = out + layer.bias
    return out
