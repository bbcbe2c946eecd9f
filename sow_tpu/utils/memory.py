"""Memory accounting — ports ``scripts/utils/memory_utils.py``.

Byte-count helpers the reference logs at startup (weight split,
``simple_train.py:448-462``) and at update 10 (optimizer HBM,
``simple_train.py:634-641``).
"""

from __future__ import annotations

from typing import Any

import jax

from sow_tpu.nn.sow import SoWLinear
from sow_tpu.nn.surgery import iter_sow, param_labels


def _nbytes(x) -> int:
    return int(x.size) * x.dtype.itemsize


def optimizer_memory_usage(opt_state) -> int:
    """Total bytes of moment buffers (ref ``memory_utils.py:13-20``)."""
    total = 0
    for attr in ("mu", "nu", "momentum_buf", "proj", "vr", "vc"):
        tree = getattr(opt_state, attr, None)
        if tree is not None:
            total += sum(_nbytes(x) for x in jax.tree_util.tree_leaves(tree))
    for attr in ("main", "routed"):  # SplitState combinator
        sub = getattr(opt_state, attr, None)
        if sub is not None:
            total += optimizer_memory_usage(sub)
    return total


def model_memory_usage(params) -> int:
    """Total parameter bytes (ref ``memory_utils.py:22-27``)."""
    return sum(_nbytes(x) for x in jax.tree_util.tree_leaves(params))


def weight_usage(params) -> dict[str, float]:
    """Split of total / trainable / SoW factors / accumulated bases, in MiB
    (ref ``calculate_weight_usage``, ``memory_utils.py:36-55``)."""
    mib = 1024 * 1024
    total = model_memory_usage(params)

    sow_factor = 0
    accumulated = 0
    for _, layer in iter_sow(params):
        sow_factor += _nbytes(layer.down) + _nbytes(layer.up)
        if layer.acc_down is not None:
            accumulated += _nbytes(layer.acc_down)
        if layer.acc_up is not None:
            accumulated += _nbytes(layer.acc_up)

    labels = param_labels(params)
    trainable = sum(
        _nbytes(x)
        for x, l in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(labels))
        if l != "frozen"
    )
    return {
        "total_mib": total / mib,
        "trainable_mib": trainable / mib,
        "sow_factors_mib": sow_factor / mib,
        "accumulated_mib": accumulated / mib,
    }


def sow_break_even_rank(in_features: int, out_features: int, n_iter: int = 1) -> float:
    """Rank above which the SoW factor pairs stop being smaller than the
    dense weight: ``r* = n*m / (n_iter * (n+m))`` — the analytic frontier of
    ``Parameters SoW Iteration.ipynb`` cell 1 (SURVEY §6 row 5)."""
    return (in_features * out_features) / (n_iter * (in_features + out_features))


def sow_frontier_report(params) -> list[str]:
    """Per-shape frontier lines for the startup report: trainable-factor
    fraction of dense and the break-even rank at the layer's n_iter."""
    shapes: dict[tuple[int, int, int, int], int] = {}
    for _, layer in iter_sow(params):
        k = (layer.in_features, layer.out_features, layer.rank, layer.n_iter)
        shapes[k] = shapes.get(k, 0) + 1
    lines = []
    for (n, m, r, p), count in sorted(shapes.items()):
        frac = p * (n + m) * r / (n * m)
        lines.append(
            f"sow frontier: {count}x {n}x{m} r={r} n_iter={p} -> "
            f"{frac:.1%} of dense (break-even r*={sow_break_even_rank(n, m, p):.0f})"
        )
    return lines


def format_memory_report(params, opt_state=None) -> str:
    u = weight_usage(params)
    lines = [
        f"weights: total {u['total_mib']:.2f} MiB | trainable {u['trainable_mib']:.2f} MiB"
        f" | sow factors {u['sow_factors_mib']:.2f} MiB | accumulated {u['accumulated_mib']:.2f} MiB"
    ]
    lines.extend(sow_frontier_report(params))
    if opt_state is not None:
        lines.append(f"optimizer state: {optimizer_memory_usage(opt_state) / 2**20:.2f} MiB")
    return "\n".join(lines)
