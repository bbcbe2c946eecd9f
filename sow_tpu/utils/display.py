"""Colorized param-tree printer + SVD alignment export.

Ports the reference's introspection extras: the colorized module tree
(``tn_gradient/utils.py:155-243`` — green trainable / red frozen / yellow
mixed, repeated layers grouped) and ``export_alignment``
(``tn_gradient/prepare.py:224-245`` — SVD-subspace alignment between the
active SoW factors and the accumulated base).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

from sow_tpu.nn.sow import SoWLinear
from sow_tpu.nn.surgery import param_labels
from sow_tpu.utils.numerics import svd_weight

_COLORS = {"green": "\033[32m", "red": "\033[31m", "yellow": "\033[33m", "white": "\033[37m"}
_RESET = "\033[0m"


def _colored(s: str, color: str, use_color: bool) -> str:
    return f"{_COLORS[color]}{s}{_RESET}" if use_color else s


def _subtree_color(labels_subtree) -> str:
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(labels_subtree) if isinstance(l, str)]
    if not leaves:
        return "white"
    trainable = [l not in ("frozen",) for l in leaves]
    if all(trainable):
        return "green"
    if not any(trainable):
        return "red"
    return "yellow"


def _describe(subtree) -> str:
    if isinstance(subtree, SoWLinear):
        return (
            f"SoWLinear(in={subtree.in_features}, out={subtree.out_features}, "
            f"rank={subtree.rank}, n_iter={subtree.n_iter}, vr={subtree.virtual_rank})"
        )
    if isinstance(subtree, dict) and "kernel" in subtree and hasattr(subtree["kernel"], "shape"):
        k = subtree["kernel"]
        return f"Linear(in={k.shape[0]}, out={k.shape[1]}, bias={'bias' in subtree})"
    if hasattr(subtree, "shape"):
        return f"Array{tuple(subtree.shape)}"
    return type(subtree).__name__


def _fingerprint(sub) -> tuple:
    """Structural fingerprint used to group repeated layers."""
    import jax

    return (
        str(jax.tree_util.tree_structure(sub)),
        tuple(tuple(x.shape) for x in jax.tree_util.tree_leaves(sub) if hasattr(x, "shape")),
    )


def format_tree(params: Any, use_color: bool = True) -> str:
    """Render the param tree with trainability colors (green trainable /
    red frozen / yellow mixed), collapsing runs of structurally-identical
    numeric children into ``(0-7): 8 x ...`` — the reference's grouped
    module print (``utils.py:175-210``)."""
    labels = param_labels(params)
    lines: list[str] = []

    def leaf_like(sub) -> bool:
        return not isinstance(sub, dict) or (
            "kernel" in sub and hasattr(sub.get("kernel"), "shape")
        )

    def rec(sub, lab, name, indent):
        pad = "  " * indent
        color = _subtree_color(lab)
        if leaf_like(sub) or isinstance(sub, SoWLinear):
            lines.append(f"{pad}{_colored(f'({name}):', color, use_color)} {_describe(sub)}")
            return
        lines.append(f"{pad}{_colored(f'({name}):', color, use_color)}")
        children = list(sub.items())
        i = 0
        while i < len(children):
            k, v = children[i]
            j = i
            if k.isdigit():
                fp = _fingerprint(v)
                while (
                    j + 1 < len(children)
                    and children[j + 1][0].isdigit()
                    and _fingerprint(children[j + 1][1]) == fp
                ):
                    j += 1
            if j > i:
                run_color = _subtree_color(lab[k])
                head = _colored(f"({k}-{children[j][0]}):", run_color, use_color)
                lines.append(f"{pad}  {head} {j - i + 1} x")
                rec(v, lab[k], k, indent + 2)
                i = j + 1
            else:
                rec(v, lab[k], k, indent + 1)
                i += 1

    rec(params, labels, "model", 0)
    return "\n".join(lines)


def alignment_matrix(layer: SoWLinear) -> np.ndarray:
    """SVD-subspace alignment grid between the active factor sum and the
    accumulated base (ref ``export_alignment``, ``prepare.py:224-245``):
    ``|U_w^T @ U_acc|`` normalized column-wise to percentages."""
    import jax.numpy as jnp

    acc_sum = jnp.einsum("nir,nro->io", layer.down, layer.up)
    if layer.acc_down is None:
        raise ValueError("layer has no accumulated base yet")
    if layer.acc_up is not None:
        weight = layer.acc_down @ layer.acc_up
    else:
        weight = layer.acc_down

    u_acc, _, _ = svd_weight(acc_sum, layer.rank)
    u_w, _, _ = svd_weight(weight)
    grid = jnp.abs(u_w.T @ u_acc)
    pct = grid / grid.sum(axis=0) * 100.0
    return np.asarray(pct)


def export_alignment(layer: SoWLinear, export_path: str) -> str:
    """Save the alignment grid as .npy (path is explicit — the reference
    hardcodes an absolute home directory, ``prepare.py:245``)."""
    pct = alignment_matrix(layer)
    os.makedirs(os.path.dirname(export_path) or ".", exist_ok=True)
    if not export_path.endswith(".npy"):
        export_path += ".npy"
    np.save(export_path, pct)
    return export_path
