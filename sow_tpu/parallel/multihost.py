"""Multi-process (multi-host) SPMD execution.

The reference is multi-process by construction — ``torchrun`` launches one
rank per GPU and NCCL all-reduces gradients (``simple_train.py:229``,
DDP at ``:566-572``). The TPU-native equivalent (SURVEY §2.4) is one
process per HOST, each owning its local chips, joined into ONE global
``jax.sharding.Mesh``: ``jax.distributed.initialize`` wires the runtime,
GSPMD inserts the collectives (ICI within a slice, DCN across slices), and
the only thing a host must do differently is feed its *addressable shard*
of each global batch.

Single-process SPMD remains the default; ``--multihost-*`` flags on the
training CLIs opt in. The whole path is exercised without real multi-host
hardware by ``tests/test_multihost.py``: N coordinated CPU processes, each
with K virtual devices, train against the single-process trajectory.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join this process into a distributed jax runtime.

    Must run before any other jax API touches the backend (device queries
    included) — same constraint as the reference's
    ``dist.init_process_group`` coming first in ``simple_train.py:229``.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_slice(array: np.ndarray, sharding) -> jax.Array:
    """Build a GLOBAL jax array for ``array``, uploading only the shards
    this process's devices own.

    Every process computes the same global host batch (streams are seeded
    identically; memmap/synthetic reads are cheap) and passes it with an
    explicit ``global_shape == local_data.shape`` —
    ``jax.make_array_from_process_local_data``'s documented
    same-data-everywhere mode: each device looks up ITS slice of the array
    and nothing non-addressable is touched.
    """
    arr = np.asarray(array)
    return jax.make_array_from_process_local_data(sharding, arr, arr.shape)


def global_batch(batch: dict, sharding) -> dict:
    """Map ``local_slice`` over a {input_ids, attention_mask} batch dict."""
    return {
        k: local_slice(np.asarray(v), sharding) for k, v in batch.items()
    }


def is_primary() -> bool:
    """True on the process that should own logging/checkpointing."""
    return jax.process_index() == 0


def put_sharded(host, sharding) -> jax.Array:
    """Process-count-aware ``device_put``.

    Single process: plain ``jax.device_put``. Multi-process: the sharding
    spans devices this process cannot address, so route through
    ``local_slice`` (requires the same host value on every process — true
    for seed-identical init, checkpoint loads, and the shared data stream).
    """
    if jax.process_count() == 1:
        return jax.device_put(host, sharding)
    return local_slice(np.asarray(host), sharding)


def tree_put_sharded(tree, shardings):
    """``put_sharded`` over a pytree of (host leaf, sharding leaf) pairs."""
    return jax.tree_util.tree_map(put_sharded, tree, shardings)


def gather_to_host(tree):
    """Fully-replicated host copies of a (possibly cross-process) sharded
    tree — the multi-process checkpoint-save path. Single process: plain
    ``device_get`` semantics via np.asarray."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)
