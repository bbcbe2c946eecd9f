"""Liveness heartbeat for externally-watchdogged runs.

The external watchdog (``benchmarks/watchdog_run.sh``) monitors the run's
metrics-file mtime and kills the process group when it goes stale. That
design cannot distinguish a wedged TPU tunnel (threads parked in futex
wait, no exception — the failure the watchdog exists for) from a *long
legitimate pause*: a cold XLA compile (~13-14 min measured for the 60m
flagship on this host), a held-out eval, or a checkpoint save. Round 4
lost its most important run to exactly that: a 920 s eval+save pause at
step 12000 drew a SIGKILL mid-save.

Fix: the trainer wraps each long legitimate operation in
:meth:`Heartbeat.scope`, and a daemon thread touches ``<metrics>.hb``
every ``interval`` seconds *only while a scope is active* (so a genuine
hang inside a training step still goes stale on schedule) and only up to
``scope_cap`` seconds per scope (so a tunnel wedge *inside* a save/eval
is still caught, just on a longer fuse). The heartbeat file's content is
the active scope's reason string — the watchdog logs it when it kills,
answering "why did it die" from the outside.

The reference has no analogue (SURVEY §5: failure detection "None");
this subsystem exists because the TPU host's tunnel wedges are a
documented fact of life here.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time


class Heartbeat:
    def __init__(self, path: str | None, interval: float = 30.0,
                 scope_cap: float = 1800.0):
        self.path = path
        self.interval = interval
        self.scope_cap = scope_cap
        self._lock = threading.Lock()
        self._scopes: list[tuple[str, float]] = []  # (reason, start_time)
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    def _ensure_thread(self):
        if self._thread is None and self.path is not None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def _loop(self):
        while not self._stop.wait(self.interval):
            with self._lock:
                live = [
                    (r, t0) for r, t0 in self._scopes
                    if time.monotonic() - t0 < self.scope_cap
                ]
            if live:
                self._touch(live[-1][0])

    def _touch(self, reason: str):
        try:
            tmp = self.path + ".new"
            with open(tmp, "w") as f:
                f.write(f"{time.time():.0f} {reason}\n")
            os.replace(tmp, self.path)
        except OSError:
            pass  # heartbeat must never take the trainer down

    @contextlib.contextmanager
    def scope(self, reason: str):
        """Mark a long legitimate operation; beats while inside (capped)."""
        if self.path is None:
            yield
            return
        self._ensure_thread()
        entry = (reason, time.monotonic())
        with self._lock:
            self._scopes.append(entry)
        self._touch(reason)  # immediate beat: scopes can be < interval
        try:
            yield
        finally:
            with self._lock:
                self._scopes.remove(entry)

    def close(self):
        self._stop.set()
