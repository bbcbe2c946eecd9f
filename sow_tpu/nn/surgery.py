"""Model surgery: swap dense linear subtrees for SoW layers in a param pytree.

TPU-native counterpart of ``tn_gradient/prepare.py:41-179``. The reference
mutates ``nn.Module`` trees via ``setattr``; here models are nested dicts of
arrays, a "linear" is any subtree ``{"kernel": (in, out)[, "bias": (out,)]}``,
and surgery is a pure tree-to-tree transformation. Matching follows the
reference's dotted-name-suffix rule (``prepare.py:74-83``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from sow_tpu.nn.sow import SoWLinear
from sow_tpu.utils.numerics import qr_weight


@dataclasses.dataclass
class SoWConfig:
    """SoW surgery configuration (ref ``prepare.py:27-38``).

    ``decompose``:
      * ``None``  — blank layers, no accumulated base until the first
                    accumulation (pretraining; ``simple_train.py:320-331``)
      * ``'keep'``— freeze the original kernel verbatim as the base
                    (finetuning default; ``prepare.py:148-153``)
      * ``'qr'``  — split the kernel's QR into a frozen major part and
                    trainable minor factors (``prepare.py:122-147``)

    ``grow_rank``: the reference's ``prepare_sow`` pins
    ``virtual_rank = min(in, out)`` on every replaced layer
    (``prepare.py:120``), so accumulation always folds to a dense base. Set
    ``grow_rank=True`` to instead start at ``rank * n_iter`` and use the
    layer's truncated-QR growth schedule (``sow.py:144-150``), which keeps
    the base factored while the effective rank grows.
    """

    target_modules: Sequence[str] = ()
    rank: int = 16
    n_iter: int = 1
    scale: float = 1.0
    init_method: str = "normal_QR"
    decompose: Optional[str] = "keep"
    dtype: Any = jnp.float32
    grow_rank: bool = False
    # Zero the up factors at surgery time so the rewritten model's output is
    # initially identical to the base (peft-LoRA's B=0 convention; the
    # reference only zeroes B at post-accumulation resets, sow.py:157-178).
    zero_up: bool = False
    # Store the frozen keep-mode base as per-channel int8 (nn/quant.py) —
    # the TPU equivalent of the reference's 8-bit base loading
    # (run_glue.py:523-532). Only valid with decompose="keep".
    quantize_base: bool = False


def _is_linear(subtree) -> bool:
    return (
        isinstance(subtree, dict)
        and "kernel" in subtree
        and hasattr(subtree["kernel"], "ndim")
        and subtree["kernel"].ndim == 2
    )


def match_path(path: str, target_modules: Sequence[str]) -> bool:
    """Dotted-suffix match, as ``prepare.py:74-83``: ``a.b.q_proj`` matches
    target ``q_proj`` and target ``b.q_proj``."""
    parts = path.split(".")
    for i in range(1, len(parts) + 1):
        if ".".join(parts[-i:]) in target_modules:
            return True
    return False


def sow_from_kernel(
    key: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    config: SoWConfig,
) -> SoWLinear:
    """Build one SoW layer from a dense kernel per ``config.decompose``."""
    d_in, d_out = kernel.shape
    rank, n_iter = config.rank, config.n_iter
    if config.grow_rank:
        virtual_rank = min(rank * n_iter, d_in, d_out)
    else:
        # Reference behaviour: prepare.py:120 pins vr to full so accumulate
        # stores a dense base.
        virtual_rank = min(d_in, d_out)

    if config.decompose == "qr":
        # QR split (prepare.py:122-147): major part -> frozen dense base,
        # minor ``rank * n_iter`` columns/rows -> initial trainable factors.
        keep = rank * n_iter
        q, r = qr_weight(kernel.astype(jnp.float32))
        q_major, q_minor = q[:, :-keep], q[:, -keep:]
        r_major, r_minor = r[:-keep, :], r[-keep:, :]
        acc = (q_major @ r_major).astype(config.dtype)
        down = jnp.stack(jnp.split(q_minor, n_iter, axis=1)).astype(config.dtype)
        up = jnp.stack(jnp.split(r_minor, n_iter, axis=0)).astype(config.dtype)
        return SoWLinear(
            down=down,
            up=up,
            acc_down=acc,
            acc_up=None,
            bias=bias,
            scale=jnp.asarray(config.scale, jnp.float32),
            rank=rank,
            n_iter=n_iter,
            virtual_rank=virtual_rank,
            init_method=config.init_method,
        )

    down, up = SoWLinear.init_factors(
        key, d_in, d_out, rank, n_iter, config.init_method, config.dtype,
        zero_up=config.zero_up,
    )
    if config.decompose == "keep":
        if config.quantize_base:
            from sow_tpu.nn.quant import quantize_int8

            acc_down = quantize_int8(kernel)  # int8 frozen base
        else:
            acc_down = kernel.astype(config.dtype)  # frozen verbatim, prepare.py:148-153
    elif config.decompose is None:
        if config.quantize_base:
            raise ValueError("quantize_base requires decompose='keep'")
        acc_down = None
    else:
        raise ValueError(f"unknown decompose mode {config.decompose!r}")
    return SoWLinear(
        down=down,
        up=up,
        acc_down=acc_down,
        acc_up=None,
        bias=bias,
        scale=jnp.asarray(config.scale, jnp.float32),
        rank=rank,
        n_iter=n_iter,
        virtual_rank=virtual_rank,
        init_method=config.init_method,
    )


def prepare_sow(params, config: SoWConfig, key: jax.Array):
    """Replace every matching linear subtree with a ``SoWLinear``.

    Pure function over a nested-dict param tree; returns the new tree.
    Mirrors ``prepare_sow`` (``prepare.py:41-179``) including the dotted
    suffix matching, but with explicit RNG threading.
    """
    replaced: list[str] = []

    def rec(subtree, path: str, key):
        if _is_linear(subtree) and match_path(path, config.target_modules):
            replaced.append(path)
            return sow_from_kernel(key, subtree["kernel"], subtree.get("bias"), config)
        if isinstance(subtree, dict):
            out = {}
            for name, child in subtree.items():
                key, sub = jax.random.split(key)
                child_path = f"{path}.{name}" if path else name
                out[name] = rec(child, child_path, sub)
            return out
        return subtree

    new_params = rec(params, "", key)
    if not replaced:
        raise ValueError(
            f"prepare_sow: no linear matched target_modules={list(config.target_modules)}"
        )
    return new_params


def _is_sow(x) -> bool:
    return isinstance(x, SoWLinear)


def map_sow(params, fn: Callable[[str, SoWLinear], Any]):
    """Apply ``fn(path, layer)`` to every SoWLinear; other leaves unchanged."""

    def rec(subtree, path: str):
        if _is_sow(subtree):
            return fn(path, subtree)
        if isinstance(subtree, dict):
            return {
                name: rec(child, f"{path}.{name}" if path else name)
                for name, child in subtree.items()
            }
        return subtree

    return rec(params, "")


def iter_sow(params):
    """Yield ``(path, SoWLinear)`` pairs."""
    found: list[tuple[str, SoWLinear]] = []
    map_sow(params, lambda p, l: (found.append((p, l)), l)[1])
    return found


def accumulate(params, key: jax.Array):
    """Accumulate every SoW layer (ref ``prepare.py:219-222``), with one
    fresh RNG key per layer.

    Layer acc shapes may change (None -> dense base), so call this *outside*
    jit; each layer's own fold/QR math is jittable and shape-cached.
    """
    paths = [p for p, _ in iter_sow(params)]
    keys = dict(zip(paths, jax.random.split(key, max(len(paths), 1))))
    return map_sow(params, lambda p, layer: layer.accumulate(keys[p]))


def set_sow_scale(params, scale):
    """Set every SoW layer's scale (the ``scale -> 1/rank`` schedule after the
    first finetune accumulation; ref ``run_glue.py:993-1002``)."""
    return map_sow(params, lambda _, layer: layer.with_scale(scale))


def linear_apply(p, x: jax.Array) -> jax.Array:
    """Uniform linear dispatch: dense ``{"kernel", "bias"}`` subtree or a
    ``SoWLinear``. Models call this so surgery never touches model code."""
    if _is_sow(p):
        return p(x)
    y = x @ p["kernel"]
    if p.get("bias") is not None:
        y = y + p["bias"]
    return y


# -- optimizer partitioning ------------------------------------------------

def param_labels(params) -> Any:
    """Label tree for grouped optimizers: ``"sow"`` for SoW factor stacks,
    ``"frozen"`` for accumulated bases / scale, ``"regular"`` otherwise.

    Mirrors the reference's two-LR param split (``simple_train.py:389-418``:
    SoW A/B factors train at ``--sow_lr``, everything else at ``--lr``;
    acc buffers are ``requires_grad=False``).
    """

    def label_layer(_, layer: SoWLinear):
        frz = lambda x: None if x is None else jax.tree_util.tree_map(lambda _: "frozen", x)
        return SoWLinear(
            down="sow",
            up="sow",
            # tree_map handles both plain arrays (one leaf) and quantized
            # bases (values+scale leaves) — labels must match structurally.
            acc_down=frz(layer.acc_down),
            acc_up=frz(layer.acc_up),
            bias=None if layer.bias is None else "regular",
            scale="frozen",
            rank=layer.rank,
            n_iter=layer.n_iter,
            virtual_rank=layer.virtual_rank,
            init_method=layer.init_method,
        )

    labeled = map_sow(params, label_layer)
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, str) else "regular",
        labeled,
        is_leaf=lambda x: isinstance(x, str),
    )


@dataclasses.dataclass
class SoWModel:
    """Convenience wrapper pairing a SoW-rewritten param tree with its config
    (the reference's ``SoWModel(PeftModel)``, ``prepare.py:181-185``, in
    functional form)."""

    params: Any
    config: SoWConfig

    @staticmethod
    def create(params, config: SoWConfig, key: jax.Array) -> "SoWModel":
        return SoWModel(params=prepare_sow(params, config, key), config=config)

    def accumulate(self, key: jax.Array) -> "SoWModel":
        return dataclasses.replace(self, params=accumulate(self.params, key))

    def set_scale(self, scale) -> "SoWModel":
        return dataclasses.replace(self, params=set_sow_scale(self.params, scale))

    def labels(self):
        return param_labels(self.params)
