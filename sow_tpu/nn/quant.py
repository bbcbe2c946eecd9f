"""Int8 weight quantization for frozen finetuning bases.

TPU-native equivalent of the reference's 8-bit base-model loading
(``scripts/run_glue.py:523-532``, ``finetune.py:196-199`` via bitsandbytes,
which is CUDA-only): the SoW/LoRA finetune keeps the base weights frozen
(keep-mode ``acc_down = W^T``), so they can be stored as per-output-channel
absmax int8 — 2x under bf16 / 4x under fp32 for the dominant tensors, which
is what lets a 7B frozen base fit a single 16 GiB v5e chip. Dequantization
happens transiently inside each layer's matmul; XLA keeps the bf16 copy
fusion-local, so HBM residency is the int8 bytes + one layer's transient.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("values", "scale"),
    meta_fields=("axis",),
)
@dataclasses.dataclass
class QuantizedTensor:
    """Per-channel symmetric int8: ``dense ~= values * scale`` broadcast over
    ``axis`` (the quantization-group axis holds one scale per slice of the
    OTHER axis)."""

    values: jax.Array  # int8, the dense tensor's shape
    scale: jax.Array  # f32, shape = dense.shape with ``axis`` removed
    axis: int  # axis reduced by absmax (scales are per remaining index)

    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def size(self):
        return self.values.size

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        scale = jnp.expand_dims(self.scale, self.axis)
        return (self.values.astype(jnp.float32) * scale).astype(dtype)

    def astype(self, dtype) -> jax.Array:
        return self.dequantize(dtype)


def quantize_int8(w: jax.Array, axis: int = 0) -> QuantizedTensor:
    """Symmetric absmax int8 over ``axis`` (default: per-output-channel for
    an (in, out) kernel)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=axis)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / jnp.expand_dims(scale, axis)), -127, 127)
    return QuantizedTensor(values=q.astype(jnp.int8), scale=scale, axis=axis)


def as_dense(x, dtype=None):
    """Dequantize if quantized, else pass through (optionally casting)."""
    if isinstance(x, QuantizedTensor):
        return x.dequantize(dtype or jnp.float32)
    if dtype is not None and x is not None:
        return x.astype(dtype)
    return x
