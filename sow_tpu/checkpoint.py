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


def _u32_checksum_host(a: np.ndarray) -> int:
    """Wraparound uint32 sum of the raw bytes of ``a`` (itemsize-padded)."""
    raw = np.frombuffer(np.ascontiguousarray(a).tobytes(), np.uint8)
    pad = (-raw.size) % 4
    if pad:
        raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
    return int(raw.view(np.uint32).sum(dtype=np.uint32))


def _u32_checksum_device(leaf) -> "jax.Array":
    """Device-side counterpart of :func:`_u32_checksum_host` (same bytes,
    little-endian word assembly so no bitcast byte-order assumption)."""
    x = jnp.ravel(leaf)
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    if x.dtype.itemsize == 1:
        x = jax.lax.bitcast_convert_type(x, jnp.uint8)  # int8 -> raw bytes
        pad = (-x.size) % 4
        x = jnp.pad(x, (0, pad)) if pad else x
        b = x.reshape(-1, 4).astype(jnp.uint32)
        words = b[:, 0] + (b[:, 1] << 8) + (b[:, 2] << 16) + (b[:, 3] << 24)
    elif x.dtype.itemsize == 2:
        pad = (-x.size) % 2
        x = jnp.pad(x, (0, pad)) if pad else x
        h = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(-1, 2).astype(jnp.uint32)
        words = h[:, 0] + (h[:, 1] << 16)
    elif x.dtype.itemsize == 4:
        words = jax.lax.bitcast_convert_type(x, jnp.uint32)
    else:  # 8-byte leaves: low/high u32 halves both land in the sum
        words = jax.lax.bitcast_convert_type(x, jnp.uint32).ravel()
    return jnp.sum(words, dtype=jnp.uint32)


def _c_contig(a) -> np.ndarray:
    """C-contiguous ndarray with shape preserved (np.ascontiguousarray
    promotes 0-d to 1-d, which breaks scalar opt-state leaves)."""
    a = np.asarray(a)
    return a if a.flags.c_contiguous else np.ascontiguousarray(a).reshape(a.shape)


def _flatten_with_paths(tree, verify: bool = True) -> dict[str, np.ndarray]:
    """Host snapshot of a device tree, verified end-to-end.

    ROOT CAUSE of the round-3 flagship checkpoint corruption (a step-10000
    checkpoint that evaluated at loss 10.9 while the live model was at 1.3):
    on the tunneled TPU runtime, ``device_get`` of a non-lane-aligned array
    (last dim not a 128-multiple — exactly the (., 352)/(., 1376) mlp
    gate/up kernels) hands back a NON-CONTIGUOUS strided view over the
    padded transfer buffer. Numpy-level reads normalize strides, but
    ``safetensors.numpy.save_file`` serializes raw ctypes memory — silently
    writing padded garbage between rows. Every host array is therefore
    forced C-contiguous here, and — defense in depth for a runtime that has
    burned us — the transferred bytes are verified against on-device uint32
    checksums computed from a jit-read of the same leaves, with per-leaf
    retry through a fresh on-device copy on mismatch.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    paths = [jax.tree_util.keystr(p) for p, _ in flat]
    leaves = [leaf for _, leaf in flat]

    on_device = any(isinstance(x, jax.Array) for x in leaves)
    if not on_device:
        return {p: _c_contig(x) for p, x in zip(paths, leaves)}

    if not verify:
        return {
            p: _c_contig(jax.device_get(x)) for p, x in zip(paths, leaves)
        }

    # settle in-flight donated writes before reading, then batch: one jit
    # call for all checksums, one batched transfer for all leaves
    jax.block_until_ready([x for x in leaves if isinstance(x, jax.Array)])
    sums = jax.jit(lambda t: [_u32_checksum_device(x) for x in t])(leaves)
    sums = [int(s) for s in jax.device_get(sums)]
    hosts = jax.device_get(leaves)

    out = {}
    for i, (path, leaf) in enumerate(zip(paths, leaves)):
        host = _c_contig(hosts[i])
        for attempt in range(4):
            if _u32_checksum_host(host) == sums[i]:
                break
            # retry the slow, independent way: fresh on-device copy +
            # single-leaf checksum from the same jit-read
            snap = _copy_single(leaf)
            sums[i] = int(_checksum_single(snap))
            host = _c_contig(jax.device_get(snap))
        else:
            raise RuntimeError(
                f"checkpoint transfer corruption at {path}: host bytes "
                f"disagree with the on-device checksum after retries"
            )
        out[path] = host
    return out


@jax.jit
def _copy_single(leaf):
    return jnp.copy(leaf)


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


# A checkpoint dir is COMPLETE iff both of these exist. optimizer.safetensors
# is optional (eval-only exports omit it), so it is not required here.
REQUIRED_FILES = ("model.safetensors", "training_state.json")


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    config: Optional[dict] = None,
    tokens_seen: int = 0,
) -> str:
    """Write ``{directory}/model_{step}/`` (rank-0-style single writer).

    CRASH-SAFE: everything is written into ``model_{step}.tmp`` and
    atomically renamed into place only once complete, so a kill mid-save
    (the exact failure that wedged the round-4 resetsched arm: a watchdog
    SIGKILL during the step-12000 save left an empty ``model_12000/`` that
    every resume attempt then died on) can never produce a directory that
    :func:`latest_checkpoint` would select. The reference's saver
    (``simple_train.py:167-203``) writes in place and has the same hole —
    this repo must exceed it because its own watchdog is the thing doing
    the killing.
    """
    from safetensors.numpy import save_file

    final_dir = os.path.join(directory, f"model_{step}")
    tmp_dir = final_dir + ".tmp"
    if os.path.isdir(tmp_dir):  # debris from a previous kill-mid-save
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)

    save_file(_flatten_with_paths(params), os.path.join(tmp_dir, "model.safetensors"))
    _crash_hook(step, "after_model")  # test-only fault injection (no-op)
    if opt_state is not None:
        save_file(
            _flatten_with_paths(opt_state), os.path.join(tmp_dir, "optimizer.safetensors")
        )
    state = {
        "update_step": step,
        "tokens_seen": tokens_seen,
        "sow_meta": _sow_meta(params),
        "config": config or {},
    }
    with open(os.path.join(tmp_dir, "training_state.json"), "w") as f:
        json.dump(state, f, indent=2)
        f.flush()
        os.fsync(f.fileno())

    if os.path.isdir(final_dir):  # overwrite of an (old, possibly broken) dir
        import shutil

        shutil.rmtree(final_dir)
    os.rename(tmp_dir, final_dir)  # atomic publish
    return final_dir


def _crash_hook(step: int, phase: str) -> None:
    """Fault injection for the crash-safety tests: if
    ``SOW_CKPT_CRASH_AT_STEP`` matches ``step``, hard-kill the process at
    this point of the save (simulating the watchdog's SIGKILL-mid-save)."""
    at = os.environ.get("SOW_CKPT_CRASH_AT_STEP")
    if at is not None and int(at) == step:
        os._exit(117)


def is_complete_checkpoint(path: str) -> bool:
    """True iff ``path`` holds every file a resume needs (non-empty)."""
    return all(
        os.path.isfile(os.path.join(path, f)) and os.path.getsize(os.path.join(path, f)) > 0
        for f in REQUIRED_FILES
    )


def complete_checkpoints(directory: str) -> list[str]:
    """All COMPLETE ``model_{step}`` subdirs, newest first.

    Replaces blind highest-number selection (the round-4 failure mode:
    ``latest_checkpoint`` happily returned an empty ``model_12000/`` nine
    restarts in a row while intact ``model_11000/`` sat next to it)."""
    if not os.path.isdir(directory):
        return []
    found = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"model_(\d+)", name)
        if not m:
            continue
        path = os.path.join(directory, name)
        if is_complete_checkpoint(path):
            found.append((int(m.group(1)), path))
    return [p for _, p in sorted(found, reverse=True)]


def latest_checkpoint(directory: str) -> Optional[str]:
    """Latest COMPLETE ``model_{step}`` subdir (ref ``simple_train.py:242-261``,
    hardened: incomplete/partial dirs are skipped, see :func:`complete_checkpoints`)."""
    ckpts = complete_checkpoints(directory)
    return ckpts[0] if ckpts else None


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


def _verify_uploaded_leaves(leaves: list, refs: list, paths: list) -> list:
    """Bit-verify device ``leaves`` against host ``refs``; re-upload on
    mismatch (the restore-direction counterpart of the save-path checks —
    the tunneled runtime can corrupt transfers either way). ``refs`` is
    ``None`` for leaves not sourced from the checkpoint or whose dtype was
    cast on load; those are skipped."""
    still = []
    for i, r in enumerate(refs):
        if r is None:
            continue
        want = _u32_checksum_host(r)
        ok = False
        for attempt in range(3):
            # single-input jit checksum — batched multi-array calls misbind
            # same-shaped buffers on the tunneled runtime (see
            # _flatten_with_paths trust-model note)
            if int(_checksum_single(leaves[i])) == want:
                ok = True
                break
            leaves[i] = jnp.asarray(r)
        if not ok:
            still.append(i)
    if still:
        raise RuntimeError(
            "restore transfer corruption persists after 3 attempts at: "
            + ", ".join(paths[i] for i in still[:5])
        )
    return leaves


@jax.jit
def _checksum_single(leaf):
    return _u32_checksum_device(leaf)


def restore_params(template: Any, ckpt_dir: str, verify: bool = True) -> tuple[Any, dict]:
    """Restore params into (a possibly re-shaped copy of) ``template``.

    Returns ``(params, training_state_dict)``. With ``verify`` (default),
    every restored leaf's device bytes are checksum-verified against the
    file contents and re-uploaded on mismatch.
    """
    from safetensors.numpy import load_file

    arrays = load_file(os.path.join(ckpt_dir, "model.safetensors"))
    with open(os.path.join(ckpt_dir, "training_state.json")) as f:
        state = json.load(f)

    template = _rebuild_sow_template(template, state.get("sow_meta", {}), arrays)

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves, refs, paths = [], [], []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        paths.append(key)
        if key in arrays:
            saved = arrays[key]
            if tuple(saved.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch at {key}: ckpt {saved.shape} vs template {leaf.shape}"
                )
            leaves.append(jnp.asarray(saved, leaf.dtype))
            refs.append(saved if str(saved.dtype) == str(leaf.dtype) else None)
        else:
            leaves.append(leaf)
            refs.append(None)
    if verify:
        leaves = _verify_uploaded_leaves(leaves, refs, paths)
    return jax.tree_util.tree_unflatten(treedef, leaves), state


def restore_opt_state_sharded(template: Any, ckpt_dir: str, shardings: Any) -> Any:
    """Multihost-safe optimizer-state restore: leaves found in the file are
    re-placed shard-wise from host (``multihost.put_sharded`` uploads only
    this process's addressable shards), leaves absent from the file keep the
    ``template``'s already-correctly-sharded global arrays. No cross-process
    gather is needed — every process reads the same file.

    ``template`` is the jitted+sharded fresh ``opt.init`` output and
    ``shardings`` its sharding tree (same treedef).
    """
    from safetensors.numpy import load_file

    from sow_tpu.parallel.multihost import put_sharded

    path = os.path.join(ckpt_dir, "optimizer.safetensors")
    if not os.path.exists(path):
        return template
    arrays = load_file(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    sh_leaves = jax.tree_util.tree_leaves(shardings)
    assert len(flat) == len(sh_leaves), "template/sharding treedef mismatch"
    leaves, unmatched = [], []
    for (p, leaf), sh in zip(flat, sh_leaves):
        key = jax.tree_util.keystr(p)
        if key in arrays and tuple(arrays[key].shape) == tuple(leaf.shape):
            host = np.asarray(arrays[key]).astype(leaf.dtype)
            leaves.append(put_sharded(host, sh))
        else:
            if getattr(leaf, "ndim", 0) > 0:
                unmatched.append(key)
            leaves.append(leaf)
    if unmatched:
        import warnings

        warnings.warn(
            f"restore_opt_state_sharded: {len(unmatched)}/{len(flat)} leaves "
            f"did not match the checkpoint (kept fresh init) — first few: "
            f"{unmatched[:5]}.",
            stacklevel=2,
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_opt_state(template: Any, ckpt_dir: str) -> Any:
    """Restore optimizer state into a structurally-matching template
    (build it with ``opt.init`` on the restored params first). Single-
    process path with transfer-checksum verification; multihost goes
    through :func:`restore_opt_state_sharded`.
    """
    from safetensors.numpy import load_file

    path = os.path.join(ckpt_dir, "optimizer.safetensors")
    if not os.path.exists(path):
        return template
    arrays = load_file(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    refs = []
    paths = []
    unmatched = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        paths.append(key)
        if key in arrays and tuple(arrays[key].shape) == tuple(leaf.shape):
            leaves.append(jnp.asarray(arrays[key], leaf.dtype))
            refs.append(
                arrays[key] if str(arrays[key].dtype) == str(leaf.dtype) else None
            )
        else:
            # 0-d leaves are frozen-group placeholders / counters that may
            # legitimately be absent; a real moment failing to map means the
            # resumed run silently restarts Adam from zeros — warn loudly.
            if getattr(leaf, "ndim", 0) > 0:
                unmatched.append(key)
            leaves.append(leaf)
            refs.append(None)
    leaves = _verify_uploaded_leaves(leaves, refs, paths)
    if unmatched:
        import warnings

        warnings.warn(
            f"restore_opt_state: {len(unmatched)}/{len(flat)} optimizer leaves "
            f"did not match the checkpoint (kept fresh init) — first few: "
            f"{unmatched[:5]}. Resumed training will re-warm these moments.",
            stacklevel=2,
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)
