"""Device mesh + sharding rules — the framework's parallelism layer.

Replaces the reference's NCCL DDP (``simple_train.py:229,566-572``) with
SPMD over a ``jax.sharding.Mesh``:

  * ``data``  — pure data parallelism (the only parallelism the reference
                has; DDP allreduce becomes an XLA psum over ICI).
  * ``fsdp``  — param/optimizer-state sharding (the ZeRO the reference
                imports but never uses, ``training_utils.py:9-14``), and a
                second batch axis: batch shards across data x fsdp.
  * ``model`` — tensor parallelism over the projections' output axes
                (beyond reference scope; free on TPU via GSPMD).
  * ``seq``   — context parallelism: activations shard over the sequence
                axis (long-context training; K/V all-gather per layer, see
                ``models/llama.py`` ``seq_shard``).

Shardings are assigned by param-path rules; XLA GSPMD inserts all
collectives (psum / all-gather / reduce-scatter) — no hand-written comm.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "fsdp", "model", "seq")


def make_mesh(
    data: int = -1, fsdp: int = 1, model: int = 1, seq: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, fsdp, model, seq)`` mesh. ``data=-1`` absorbs
    remaining devices. Works identically on real TPU slices and on
    ``--xla_force_host_platform_device_count`` virtual CPU devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % (fsdp * model * seq) != 0:
            raise ValueError(
                f"{n} devices not divisible by fsdp*model*seq={fsdp * model * seq}"
            )
        data = n // (fsdp * model * seq)
    if data * fsdp * model * seq != n:
        raise ValueError(f"mesh {data}x{fsdp}x{model}x{seq} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, fsdp, model, seq)
    return Mesh(dev_array, MESH_AXES)


def _spec_for_path(path: tuple, leaf) -> P:
    """Sharding rule from the trailing param-path key + leaf rank."""
    name = None
    for entry in reversed(path):
        if hasattr(entry, "name"):  # GetAttrKey (dataclass field)
            name = entry.name
            break
        if hasattr(entry, "key"):  # DictKey
            name = entry.key
            break
    ndim = getattr(leaf, "ndim", 0)

    if name == "embedding" and ndim == 2:
        return P("model", "fsdp")  # vocab x hidden
    if name == "kernel" and ndim == 2:
        return P("fsdp", "model")  # in x out
    if name == "down" and ndim == 3:
        return P(None, "fsdp", None)  # (n_iter, in, r): shard in
    if name == "up" and ndim == 3:
        return P(None, None, "model")  # (n_iter, r, out): shard out
    if name == "acc_down" and ndim == 2:
        return P("fsdp", None)
    if name == "acc_up" and ndim == 2:
        return P(None, "model")
    return P()  # norms, biases, scalars: replicated


def _fit_spec(mesh: Mesh, spec: P, leaf) -> P:
    """Drop sharding on dimensions the mesh axes don't divide (e.g. a
    (1, hidden) token-type embedding can't shard its singleton axis)."""
    shape = getattr(leaf, "shape", ())
    fitted = []
    for dim, axes in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axes is None:
            fitted.append(None)
            continue
        axes_t = axes if isinstance(axes, tuple) else (axes,)
        size = 1
        for a in axes_t:
            size *= mesh.shape[a]
        fitted.append(axes if dim % size == 0 else None)
    return P(*fitted)


def params_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree matching ``params``' structure."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [
        NamedSharding(mesh, _fit_spec(mesh, _spec_for_path(path, leaf), leaf))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharded over data x fsdp (leading axis); rank-agnostic —
    remaining axes replicated."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def token_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, seq) token arrays: batch over data x fsdp, positions over
    ``seq`` (context parallelism). With ``seq == 1`` this equals
    ``batch_sharding``; with CP the token axis must divide by the seq axis
    size."""
    return NamedSharding(mesh, P(("data", "fsdp"), "seq"))


def stacked_token_sharding(mesh: Mesh) -> NamedSharding:
    """(k, batch, seq) stacks of token batches for multi-step dispatch
    (``Trainer.step_many``): the leading dispatch axis is unsharded, the
    trailing two shard like ``token_sharding``."""
    return NamedSharding(mesh, P(None, ("data", "fsdp"), "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def scalar_like_shardings(mesh: Mesh, tree: Any) -> Any:
    """Fully-replicated sharding tree (e.g. for small optimizer scalars)."""
    return jax.tree_util.tree_map(lambda _: replicated(mesh), tree)


def opt_state_shardings(mesh: Mesh, opt_state, params_sh) -> Any:
    """Optimizer-state shardings: moments follow their param's sharding,
    counts/steps replicated.

    Works for GroupedAdamWState (step, count, mu, nu): mu/nu mirror params'
    structure (frozen leaves hold 0-d placeholders -> replicated).
    """
    rep = replicated(mesh)

    def moment_sh(sh, m):
        # 0-d placeholders (frozen leaves) are replicated.
        if getattr(m, "ndim", 0) == 0:
            return rep
        return sh

    from sow_tpu.optim.adamw import GroupedAdamWState
    from sow_tpu.optim.combine import SplitState

    if isinstance(opt_state, GroupedAdamWState):
        return GroupedAdamWState(
            step=rep,
            count=jax.tree_util.tree_map(lambda _: rep, opt_state.count),
            mu=jax.tree_util.tree_map(moment_sh, params_sh, opt_state.mu),
            nu=jax.tree_util.tree_map(moment_sh, params_sh, opt_state.nu),
        )
    if isinstance(opt_state, SplitState):
        return SplitState(
            main=opt_state_shardings(mesh, opt_state.main, params_sh),
            routed=_routed_shardings(mesh, opt_state.routed, params_sh),
        )
    from sow_tpu.optim.ttadam import TTAdamState

    if isinstance(opt_state, TTAdamState):
        # Dense (uncompressed) moment leaves mirror their param's sharding;
        # TT cores and factored row/col vectors are tiny -> replicated.
        # mu/nu hold one entry per param position: a plain array, a
        # TensorTrain, or a {"vr","vc"} dict — flatten both trees at that
        # granularity and zip against the params' sharding leaves.
        from sow_tpu.tt import TensorTrain

        def _entry(x):
            return isinstance(x, TensorTrain) or (
                isinstance(x, dict) and set(x) == {"vr", "vc"}
            )

        sh_flat = jax.tree_util.tree_leaves(params_sh)

        def tt_moment_tree(tree):
            flat, treedef = jax.tree_util.tree_flatten(tree, is_leaf=_entry)
            out = []
            for sh, m in zip(sh_flat, flat):
                if _entry(m):
                    out.append(jax.tree_util.tree_map(lambda _: rep, m))
                else:
                    out.append(sh if getattr(m, "ndim", 0) >= 1 else rep)
            return jax.tree_util.tree_unflatten(treedef, out)

        return TTAdamState(
            step=rep,
            count=jax.tree_util.tree_map(lambda _: rep, opt_state.count),
            mu=tt_moment_tree(opt_state.mu),
            nu=tt_moment_tree(opt_state.nu),
        )
    # fall back: replicate everything
    return jax.tree_util.tree_map(lambda _: rep, opt_state)


def _routed_shardings(mesh: Mesh, routed_state, params_sh) -> Any:
    """Shardings for a SplitOptimizer's routed sub-state. FactoredState's
    exact first moment mirrors its param (a dict subtree of the full params),
    so it follows the param's sharding; the factored row/col vectors and any
    projected state (GaLore) are tiny or shape-mismatched -> replicated."""
    from sow_tpu.optim.factored import FactoredState

    rep = replicated(mesh)
    if isinstance(routed_state, FactoredState):
        routed_param_sh = {k: params_sh[k] for k in routed_state.mu}
        return FactoredState(
            step=rep,
            mu=jax.tree_util.tree_map(
                lambda sh, m: rep if getattr(m, "ndim", 0) == 0 else sh,
                routed_param_sh,
                routed_state.mu,
            ),
            vr=jax.tree_util.tree_map(lambda _: rep, routed_state.vr),
            vc=jax.tree_util.tree_map(lambda _: rep, routed_state.vc),
        )
    return jax.tree_util.tree_map(lambda _: rep, routed_state)
