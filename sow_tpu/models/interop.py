"""Cross-framework SoW checkpoint interop (torch reference <-> sow_tpu).

The reference saves UNMERGED SoW checkpoints — per-layer factor stacks
``downscale_weights.{i}`` / ``upscale_weights.{i}`` plus frozen
``acc_downweight`` / ``acc_upweight`` buffers (``tn_gradient/layer/sow.py``)
— and reloads them with ``load_sow`` (``tn_gradient/prepare.py:188-215``),
materializing params that are empty-shaped in a freshly-prepared model.

This module is the same bridge for sow_tpu param trees:

* ``load_reference_sow_state_dict``: reference checkpoint -> a
  ``prepare_sow``'d sow_tpu tree (the import direction the round-1 review
  flagged missing; enables cross-framework numerics comparison against
  BASELINE.md's rtol-1e-3 gate).
* ``params_to_reference_sow_state_dict``: sow_tpu tree -> reference-format
  tensors, so a reference user can resume from a sow_tpu run (complements
  the merged-dense HF export in ``llama.py:params_to_hf_state_dict``).

Orientation notes: the reference's SoW factors are stored (in, rank) /
(rank, out) — same as ours — while plain ``nn.Linear`` weights are (out, in)
and need a transpose.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.models.llama import LlamaConfig
from sow_tpu.nn.sow import SoWLinear

# our param-tree path -> reference HF module name
_LLAMA_PROJ_NAMES = (
    ("attn", "q_proj", "self_attn.q_proj"),
    ("attn", "k_proj", "self_attn.k_proj"),
    ("attn", "v_proj", "self_attn.v_proj"),
    ("attn", "o_proj", "self_attn.o_proj"),
    ("mlp", "gate_proj", "mlp.gate_proj"),
    ("mlp", "up_proj", "mlp.up_proj"),
    ("mlp", "down_proj", "mlp.down_proj"),
)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _sow_from_reference(template: SoWLinear, sd: dict, prefix: str, dtype) -> SoWLinear:
    """Fill one SoWLinear from reference tensors under ``prefix``."""
    n_iter = 0
    while f"{prefix}.downscale_weights.{n_iter}" in sd:
        n_iter += 1
    if n_iter == 0:
        raise KeyError(f"no SoW factors under {prefix!r}")
    down = jnp.asarray(
        np.stack([_to_np(sd[f"{prefix}.downscale_weights.{i}"]) for i in range(n_iter)]),
        dtype,
    )
    up = jnp.asarray(
        np.stack([_to_np(sd[f"{prefix}.upscale_weights.{i}"]) for i in range(n_iter)]),
        dtype,
    )

    def opt(name) -> Optional[jax.Array]:
        t = sd.get(f"{prefix}.{name}")
        if t is None:
            return None
        a = _to_np(t)
        if a.size == 0:  # the reference's empty placeholder (sow.py:69-70)
            return None
        return jnp.asarray(a, dtype)

    acc_down, acc_up = opt("acc_downweight"), opt("acc_upweight")
    bias = opt("bias")
    d_in, rank = down.shape[1], down.shape[2]
    d_out = up.shape[2]
    if acc_up is not None:
        virtual_rank = int(acc_down.shape[1])
    elif acc_down is not None:
        virtual_rank = min(d_in, d_out)
    else:
        virtual_rank = min(rank * n_iter, d_in, d_out)
    return dataclasses.replace(
        template,
        down=down,
        up=up,
        acc_down=acc_down,
        acc_up=acc_up,
        bias=bias if bias is not None else template.bias,
        rank=rank,
        n_iter=n_iter,
        virtual_rank=virtual_rank,
    )


def load_reference_sow_state_dict(
    params: dict, state_dict: dict, cfg: LlamaConfig, dtype=jnp.float32
) -> dict:
    """Import a reference (torch) unmerged-SoW LLaMA checkpoint.

    ``params`` is a freshly ``prepare_sow``'d sow_tpu tree used as the
    template for static metadata (init_method, scale — attributes the
    reference does not serialize); every tensor value, including acc buffers
    whose shapes differ from the template (dynamic-shape materialization,
    ref ``prepare.py:199-212``), comes from ``state_dict``. Accepts torch
    tensors or numpy arrays (e.g. ``safetensors.numpy.load_file``).
    """
    sd = state_dict
    out = jax.tree_util.tree_map(
        lambda x: x, params, is_leaf=lambda x: isinstance(x, SoWLinear)
    )

    def dense(name, transpose=True):
        a = _to_np(sd[name])
        return jnp.asarray(a.T if transpose else a, dtype)

    out["embed"] = {"embedding": dense("model.embed_tokens.weight", transpose=False)}
    for i in range(cfg.num_hidden_layers):
        lp = out["layers"][str(i)]
        pre = f"model.layers.{i}"
        for group, proj, ref_name in _LLAMA_PROJ_NAMES:
            full = f"{pre}.{ref_name}"
            node = lp[group][proj]
            if isinstance(node, SoWLinear):
                lp[group][proj] = _sow_from_reference(node, sd, full, dtype)
            elif f"{full}.weight" in sd:
                node["kernel"] = dense(f"{full}.weight")
                if f"{full}.bias" in sd:
                    node["bias"] = dense(f"{full}.bias", transpose=False)
        lp["input_norm"] = {"scale": dense(f"{pre}.input_layernorm.weight", transpose=False)}
        lp["post_norm"] = {
            "scale": dense(f"{pre}.post_attention_layernorm.weight", transpose=False)
        }
    out["norm"] = {"scale": dense("model.norm.weight", transpose=False)}
    if "lm_head" in out and "lm_head.weight" in sd:
        out["lm_head"] = {"kernel": dense("lm_head.weight")}
    return out


def params_to_reference_sow_state_dict(params: dict, cfg: LlamaConfig) -> dict:
    """Export a sow_tpu SoW tree as reference-format (unmerged) tensors.

    Inverse of :func:`load_reference_sow_state_dict`; numpy values keyed by
    HF module names, factors per-iteration as the reference's ParameterList
    entries. Empty acc buffers are emitted as 0-element arrays, matching the
    reference's empty-parameter convention so its ``load_sow`` materializes
    them identically.
    """
    sd: dict = {}

    def put(name, x, transpose=False):
        a = np.asarray(jax.device_get(x)).astype(np.float32)
        if transpose:
            a = a.T
        # jax.device_get can hand back Fortran-ordered buffers (and .T always
        # does); safetensors.numpy.save_file serializes the RAW buffer without
        # normalizing order, silently writing transposed bytes. Force C-order.
        sd[name] = np.ascontiguousarray(a)

    put("model.embed_tokens.weight", params["embed"]["embedding"])
    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        pre = f"model.layers.{i}"
        for group, proj, ref_name in _LLAMA_PROJ_NAMES:
            full = f"{pre}.{ref_name}"
            node = lp[group][proj]
            if isinstance(node, SoWLinear):
                for j in range(node.n_iter):
                    put(f"{full}.downscale_weights.{j}", node.down[j])
                    put(f"{full}.upscale_weights.{j}", node.up[j])
                put(
                    f"{full}.acc_downweight",
                    node.acc_down if node.acc_down is not None else np.zeros((0,), np.float32),
                )
                put(
                    f"{full}.acc_upweight",
                    node.acc_up if node.acc_up is not None else np.zeros((0,), np.float32),
                )
                if node.bias is not None:
                    put(f"{full}.bias", node.bias)
            else:
                put(f"{full}.weight", node["kernel"], transpose=True)
                if node.get("bias") is not None:
                    put(f"{full}.bias", node["bias"])
        put(f"{pre}.input_layernorm.weight", lp["input_norm"]["scale"])
        put(f"{pre}.post_attention_layernorm.weight", lp["post_norm"]["scale"])
    put("model.norm.weight", params["norm"]["scale"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"]["kernel"], transpose=True)
    return sd


def load_pretrain_checkpoint(
    model: str,
    arch: str,
    ckpt: str,
    rank: int = 50,
    dtype=None,
):
    """Rebuild the pretraining param template for ``model``/``arch``, restore
    ``ckpt`` into it, and fold SoW layers to dense.

    The shared loader behind every consumer of a ``train/pretrain.py``
    checkpoint outside the trainer itself — serving/spec benchmarks, the W4
    eval CLI (``--checkpoint-arch``), and GLUE finetuning from a
    locally-pretrained base (``--base-checkpoint``). Returns
    ``(params, model_cfg)``.
    """
    import jax
    import jax.numpy as jnp

    from sow_tpu.checkpoint import latest_checkpoint, restore_params
    from sow_tpu.models import get_config, init_params
    from sow_tpu.models import llama as llama_lib
    from sow_tpu.nn import SoWConfig, prepare_sow

    dtype = dtype or jnp.bfloat16
    cfg = get_config(model)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if arch == "sow":
        params = prepare_sow(
            params,
            SoWConfig(
                target_modules=llama_lib.LLAMA_TARGET_MODULES,
                rank=rank, decompose=None, dtype=dtype,
            ),
            jax.random.PRNGKey(1),
        )
    path = latest_checkpoint(ckpt) or ckpt
    params, _ = restore_params(params, path)
    if arch == "sow":
        params = llama_lib.merge_sow_to_dense(params)
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params), cfg
