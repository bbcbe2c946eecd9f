"""Prefix tuning — trainable per-layer KV prefixes.

Adapter parity with the reference's ``adapter_name == "prefix-tuning"``
option (``scripts/finetune.py:286-291``, peft ``PrefixTuningConfig``): each
attention layer gets ``num_virtual_tokens`` learned key/value vectors
prepended to the (post-RoPE) keys and values. Queries attend to the prefix
unconditionally (no causal restriction), input positions are untouched, and
only the prefix parameters train.

Functional design: the prefixes live as a ``params["prefix"]`` subtree
(``{"layers": {"0": {"k": (nv, kv_heads, head_dim), "v": ...}}}``) so they
flow through optimizers, checkpoints and shardings like any other leaves;
``sow_tpu.models.llama.forward`` picks the subtree up automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_prefix_tuning(
    params: dict,
    model_cfg,
    num_virtual_tokens: int = 30,
    key: jax.Array | None = None,
    dtype=jnp.float32,
    init_std: float = 0.02,
) -> dict:
    """Return a new param tree with a trainable ``prefix`` subtree."""
    key = key if key is not None else jax.random.PRNGKey(0)
    kvh, hd = model_cfg.kv_heads, model_cfg.head_dim
    layers = {}
    for i in range(model_cfg.num_hidden_layers):
        key, k1, k2 = jax.random.split(key, 3)
        layers[str(i)] = {
            "k": (init_std * jax.random.normal(k1, (num_virtual_tokens, kvh, hd))).astype(dtype),
            "v": (init_std * jax.random.normal(k2, (num_virtual_tokens, kvh, hd))).astype(dtype),
        }
    out = dict(params)
    out["prefix"] = {"layers": layers}
    return out


def prefix_labels(labels: dict) -> dict:
    """Relabel the ``prefix`` subtree as the trainable adapter group."""
    if "prefix" not in labels:
        return labels
    out = dict(labels)
    out["prefix"] = jax.tree_util.tree_map(lambda _: "sow", labels["prefix"])
    return out
