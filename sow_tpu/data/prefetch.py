"""Background-thread batch prefetch — overlap host data work with device steps.

The reference's dataloader is a synchronous generator consumed inline by the
training loop (``scripts/utils/dataloader.py``; torch DataLoader workers are
not used). On TPU the equivalent stall is worse: tokenize/pack happens on the
host while the chip idles. This prefetcher runs the upstream iterator in a
daemon thread ``depth`` batches ahead and (optionally) eagerly transfers each
batch to device with the training sharding, so ``next()`` returns arrays the
step can consume without waiting on host work or PCIe.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import jax
import numpy as np

_SENTINEL = object()


class Prefetcher:
    """Wrap ``iterator`` with a ``depth``-deep background prefetch queue.

    ``shardings``: optional pytree-prefix of ``jax.sharding.Sharding`` — when
    given, each batch's arrays are ``device_put`` on the prefetch thread
    (async dispatch), so the consumer receives device-resident, correctly
    sharded arrays.

    Exceptions in the source iterator re-raise at the consuming ``next()``;
    ``close()`` (or garbage collection) stops the thread.
    """

    def __init__(
        self,
        iterator: Iterator[Any],
        depth: int = 2,
        shardings: Optional[Any] = None,
        verify_transfers: bool = False,
    ):
        self._src = iterator
        self._shardings = shardings
        self._verify = verify_transfers
        self._pending_check: list = []  # (key, host_sum, device_sum_future)
        self.transfer_errors = 0
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _audit(self, key: str, host: np.ndarray, dev) -> None:
        """Transfer-integrity telemetry (opt-in): enqueue a device-side
        checksum of the uploaded batch and compare LAZILY against the host
        bytes — the comparison of batch N settles while batch N+1 uploads,
        so the training pipeline is never synced. Motivated by the round-3
        checkpoint postmortem (the tunneled runtime corrupting one transfer
        direction is not hypothetical); a mismatch here means the model
        TRAINED ON corrupted tokens — warn loudly and count it."""
        from sow_tpu.checkpoint import _checksum_single, _u32_checksum_host

        self._pending_check.append(
            (key, _u32_checksum_host(host), _checksum_single(dev))
        )
        if len(self._pending_check) > 8:  # settle the oldest (long since done)
            k, want, fut = self._pending_check.pop(0)
            if int(fut) != want:
                import warnings

                self.transfer_errors += 1
                warnings.warn(
                    f"prefetch transfer corruption detected on '{k}': device "
                    f"bytes disagree with host bytes (count={self.transfer_errors})",
                    stacklevel=2,
                )

    def _transfer(self, batch):
        if self._shardings is None:
            return batch
        from sow_tpu.parallel.multihost import put_sharded

        if isinstance(batch, dict) and not isinstance(self._shardings, dict):
            out = {}
            for k, v in batch.items():
                host = np.asarray(v)
                out[k] = put_sharded(host, self._shardings)
                if self._verify:
                    self._audit(k, host, out[k])
            return out
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda v: put_sharded(np.asarray(v), self._shardings), batch
            )
        return jax.device_put(batch, self._shardings)

    def _put(self, item) -> bool:
        """Bounded put that gives up when the consumer signalled stop — a
        blocking put here would pin the thread (and any device-resident
        batches) forever if the consumer abandons the iterator while the
        queue is full."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        try:
            for batch in self._src:
                if self._stop.is_set():
                    return
                batch = self._transfer(batch)
                if not self._put(batch):
                    return
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            self._put(("__error__", e))
            return
        self._put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
            raise item[1]
        return item

    def close(self):
        self._stop.set()
        # drain so the worker unblocks from a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass
