"""Checkpoint / resume — safetensors + JSON, SoW-shape-aware.

Mirrors the reference pretraining scheme (``simple_train.py:167-203``):
``model_{step}/`` holding ``model.safetensors``, ``optimizer.safetensors``,
``training_state.json``; resume locates the latest ``model_*`` dir
(``simple_train.py:242-261``).

The SoW wrinkle the reference handles in ``load_sow``
(``prepare.py:188-215``): accumulated-base buffers *appear and change shape*
over training (None -> (in, vr) -> (in, out)). Restoring into a freshly-built
model therefore can't assume matching shapes. Here every SoW layer's static
metadata (virtual_rank + which acc buffers exist) is saved alongside, and
restore rebuilds each ``SoWLinear`` node from the checkpoint's shapes before
filling leaves — no replay of accumulation history needed.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.nn.sow import SoWLinear


def _flatten_with_paths(tree) -> dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        out[jax.tree_util.keystr(path)] = np.asarray(jax.device_get(leaf))
    return out


def _sow_meta(tree) -> dict[str, dict]:
    """Static metadata of every SoWLinear node, keyed by its path."""
    meta: dict[str, dict] = {}

    def rec(sub, path):
        if isinstance(sub, SoWLinear):
            meta[path] = {
                "rank": sub.rank,
                "n_iter": sub.n_iter,
                "virtual_rank": sub.virtual_rank,
                "init_method": sub.init_method,
                "has_acc_down": sub.acc_down is not None,
                "has_acc_up": sub.acc_up is not None,
                "has_bias": sub.bias is not None,
            }
            return
        if isinstance(sub, dict):
            for k, v in sub.items():
                rec(v, f"{path}.{k}" if path else k)

    rec(tree, "")
    return meta


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    config: Optional[dict] = None,
    tokens_seen: int = 0,
) -> str:
    """Write ``{directory}/model_{step}/`` (rank-0-style single writer)."""
    from safetensors.numpy import save_file

    out_dir = os.path.join(directory, f"model_{step}")
    os.makedirs(out_dir, exist_ok=True)

    save_file(_flatten_with_paths(params), os.path.join(out_dir, "model.safetensors"))
    if opt_state is not None:
        save_file(
            _flatten_with_paths(opt_state), os.path.join(out_dir, "optimizer.safetensors")
        )
    state = {
        "update_step": step,
        "tokens_seen": tokens_seen,
        "sow_meta": _sow_meta(params),
        "config": config or {},
    }
    with open(os.path.join(out_dir, "training_state.json"), "w") as f:
        json.dump(state, f, indent=2)
    return out_dir


def latest_checkpoint(directory: str) -> Optional[str]:
    """Latest ``model_{step}`` subdir (ref ``simple_train.py:242-261``)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = re.fullmatch(r"model_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, name), int(m.group(1))
    return best


def _normalize_keystr(keystr_path: str) -> str:
    """``['layers']['0']['attn']['q_proj'].down`` -> ``layers.0.attn.q_proj.down``."""
    return (
        keystr_path.replace("']['", ".").replace("['", "").replace("']", "").replace("'", "")
        .lstrip(".")
    )


def _rebuild_sow_template(template: Any, sow_meta: dict[str, dict], arrays: dict) -> Any:
    """Reshape every SoWLinear node in ``template`` to the checkpoint's
    static shapes (the ``load_sow`` materialization, ``prepare.py:188-215``)."""
    by_dotted = {_normalize_keystr(k): v for k, v in arrays.items()}

    def rec(sub, path):
        if isinstance(sub, SoWLinear):
            meta = sow_meta.get(path)
            if meta is None:
                return sub

            def find(field):
                return by_dotted.get(f"{path}.{field}" if path else field)

            acc_down = find("acc_down") if meta["has_acc_down"] else None
            acc_up = find("acc_up") if meta["has_acc_up"] else None
            return dataclasses.replace(
                sub,
                acc_down=None if acc_down is None else jnp.asarray(acc_down, sub.dtype),
                acc_up=None if acc_up is None else jnp.asarray(acc_up, sub.dtype),
                virtual_rank=meta["virtual_rank"],
            )
        if isinstance(sub, dict):
            return {k: rec(v, f"{path}.{k}" if path else k) for k, v in sub.items()}
        return sub

    return rec(template, "")


def restore_params(template: Any, ckpt_dir: str) -> tuple[Any, dict]:
    """Restore params into (a possibly re-shaped copy of) ``template``.

    Returns ``(params, training_state_dict)``.
    """
    from safetensors.numpy import load_file

    arrays = load_file(os.path.join(ckpt_dir, "model.safetensors"))
    with open(os.path.join(ckpt_dir, "training_state.json")) as f:
        state = json.load(f)

    template = _rebuild_sow_template(template, state.get("sow_meta", {}), arrays)

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if key in arrays:
            saved = arrays[key]
            if tuple(saved.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch at {key}: ckpt {saved.shape} vs template {leaf.shape}"
                )
            leaves.append(jnp.asarray(saved, leaf.dtype))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves), state


def restore_opt_state(template: Any, ckpt_dir: str) -> Any:
    """Restore optimizer state into a structurally-matching template
    (build it with ``opt.init`` on the restored params first)."""
    from safetensors.numpy import load_file

    path = os.path.join(ckpt_dir, "optimizer.safetensors")
    if not os.path.exists(path):
        return template
    arrays = load_file(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    unmatched = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if key in arrays and tuple(arrays[key].shape) == tuple(leaf.shape):
            leaves.append(jnp.asarray(arrays[key], leaf.dtype))
        else:
            # 0-d leaves are frozen-group placeholders / counters that may
            # legitimately be absent; a real moment failing to map means the
            # resumed run silently restarts Adam from zeros — warn loudly.
            if getattr(leaf, "ndim", 0) > 0:
                unmatched.append(key)
            leaves.append(leaf)
    if unmatched:
        import warnings

        warnings.warn(
            f"restore_opt_state: {len(unmatched)}/{len(flat)} optimizer leaves "
            f"did not match the checkpoint (kept fresh init) — first few: "
            f"{unmatched[:5]}. Resumed training will re-warm these moments.",
            stacklevel=2,
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)
