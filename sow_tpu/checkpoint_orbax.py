"""Orbax-backed checkpointing — async, atomic, retention-managed.

Production alternative to the safetensors scheme in ``sow_tpu.checkpoint``
(same on-disk philosophy: path-flattened leaves + SoW static-shape metadata,
so restore works across accumulation-driven shape growth). Orbax adds async
writes that overlap training, atomic finalization, and max-to-keep GC —
none of which the reference's ``save_pretrained`` + ``torch.save`` scheme
(``simple_train.py:167-203``) provides.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

from sow_tpu.checkpoint import _flatten_with_paths, _rebuild_sow_template, _sow_meta


class OrbaxCheckpointer:
    """Checkpoint manager over a directory of step checkpoints."""

    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        config: Optional[dict] = None,
        tokens_seen: int = 0,
    ) -> None:
        """Async save; returns immediately (call ``wait()`` to block)."""
        payload = {"params": _flatten_with_paths(params)}
        if opt_state is not None:
            payload["opt_state"] = _flatten_with_paths(opt_state)
        self.manager.save(step, args=self._ocp.args.StandardSave(payload))
        meta = {
            "update_step": step,
            "tokens_seen": tokens_seen,
            "sow_meta": _sow_meta(params),
            "config": config or {},
        }
        with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
            json.dump(meta, f)

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_params(self, template: Any, step: Optional[int] = None):
        """Restore into (a possibly SoW-reshaped copy of) ``template``;
        returns ``(params, meta_dict)``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        with open(os.path.join(self.directory, f"meta_{step}.json")) as f:
            meta = json.load(f)

        restored = self.manager.restore(step)
        arrays = restored["params"]
        template = _rebuild_sow_template(template, meta.get("sow_meta", {}), arrays)

        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for path, leaf in flat:
            key = jax.tree_util.keystr(path)
            if key in arrays:
                saved = np.asarray(arrays[key])
                if tuple(saved.shape) != tuple(leaf.shape):
                    raise ValueError(
                        f"shape mismatch at {key}: {saved.shape} vs {leaf.shape}"
                    )
                leaves.append(jax.numpy.asarray(saved, leaf.dtype))
            else:
                leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves), meta

    def restore_opt_state(self, template: Any, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        restored = self.manager.restore(step)
        arrays = restored.get("opt_state")
        if arrays is None:
            return template
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for path, leaf in flat:
            key = jax.tree_util.keystr(path)
            if key in arrays and tuple(np.shape(arrays[key])) == tuple(leaf.shape):
                leaves.append(jax.numpy.asarray(np.asarray(arrays[key]), leaf.dtype))
            else:
                leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def close(self) -> None:
        self.manager.close()
