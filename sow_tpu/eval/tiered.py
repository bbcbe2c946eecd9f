"""Length-tiered serving pools: several static KV pools, one weight set.

On TPU a ragged-length workload fights a single static cache pool: every
slot pays ``max_len`` cache traffic (and HBM capacity) sized for the longest
request the server must ever hold. The TPU-idiomatic fix is NOT paged
gathers (dynamic indirection serializes on TPU) but **multiple static
pools**: short requests decode against a short-``max_len`` pool whose
attention reads a fraction of the bytes, long requests go to a deep pool
with fewer slots (NEXT.md round-2 candidate #4).

``TieredServer`` wraps N ``GenerationServer`` instances sharing the SAME
weight arrays (no extra parameter HBM; each tier allocates only its own KV
pool) and routes each request to the shallowest tier that fits
``len(prompt) + max_new_tokens``. Decode compiles are shared across equal
(cfg, chunk) tiers by the module-level jit caches; each distinct pool shape
still compiles once, as any static-shape engine must.
"""

from __future__ import annotations

from typing import Optional

from sow_tpu.eval.serve import GenerationServer


class TieredServer:
    """Routes requests across length-tiered ``GenerationServer`` pools.

    ``tiers``: sequence of ``(max_batch, max_len)`` sorted here by
    ``max_len``; e.g. ``((16, 160), (8, 320), (4, 1152))`` spends the same
    cache HBM as a uniform 28-slot x 1152 pool's top quarter while letting
    short requests pay short-pool attention.
    """

    def __init__(
        self,
        params: dict,
        cfg,
        tiers=((16, 160), (8, 320), (4, 1152)),
        **server_kw,
    ):
        if not tiers:
            raise ValueError("need at least one tier")
        self.tiers = tuple(sorted(tiers, key=lambda t: t[1]))
        self.servers = [
            GenerationServer(params, cfg, max_batch=b, max_len=l, **server_kw)
            for b, l in self.tiers
        ]
        self._next_id = 0
        self._back: dict[tuple[int, int], int] = {}  # (tier, sub_rid) -> rid

    def warmup_prefills(self, groups=None) -> int:
        """AOT-compile every tier's prefill signatures (see
        ``GenerationServer.warmup_prefills``)."""
        return sum(s.warmup_prefills(groups) for s in self.servers)

    # -- public API (mirrors GenerationServer) -----------------------------
    def submit(
        self, prompt_ids: list, max_new_tokens: int = 32, temperature: float = 0.0
    ) -> int:
        need = len(prompt_ids) + max_new_tokens
        for t, srv in enumerate(self.servers):
            if need <= srv.max_len:
                sub = srv.submit(prompt_ids, max_new_tokens, temperature)
                rid = self._next_id
                self._next_id += 1
                self._back[(t, sub)] = rid
                return rid
        raise ValueError(
            f"prompt + budget ({need}) exceeds the deepest tier "
            f"(max_len {self.servers[-1].max_len})"
        )

    def step(self) -> dict[int, list]:
        """One scheduler turn across every tier with live work."""
        done = {}
        for t, srv in enumerate(self.servers):
            if srv.pending or any(s is not None for s in srv.slots):
                for sub, toks in srv.step().items():
                    done[self._rid_of(t, sub)] = toks
        return done

    def run(self) -> dict[int, list]:
        """Drain all tiers; returns {request_id: generated tokens}."""
        out = {}
        while any(
            srv.pending or any(s is not None for s in srv.slots)
            for srv in self.servers
        ):
            out.update(self.step())
        # pick up anything retired by a final sync inside sub-run bookkeeping
        for t, srv in enumerate(self.servers):
            for sub, toks in srv.finished.items():
                out[self._rid_of(t, sub)] = toks
            srv.finished = {}
        return out

    def stats(self) -> dict:
        """Aggregate + per-tier engine telemetry."""
        per = [srv.stats() for srv in self.servers]
        ticks = sum(s["decode_slot_ticks"] for s in per)
        occ = sum(s["occupied_slot_ticks"] for s in per)
        gen = sum(s["tokens_generated"] for s in per)
        return {
            "requests_completed": sum(s["requests_completed"] for s in per),
            "tokens_generated": gen,
            "occupancy": (occ / ticks) if ticks else 0.0,
            "efficiency": (gen / occ) if occ else 0.0,
            "cache_bytes": self.cache_bytes(),
            "tiers": [
                {"max_batch": b, "max_len": l, **s}
                for (b, l), s in zip(self.tiers, per)
            ],
        }

    def cache_bytes(self) -> int:
        """Total KV-pool HBM across tiers (the capacity story: compare with a
        uniform pool at the deepest max_len x total slots)."""
        return sum(
            sum(buf.nbytes for layer in srv.cache for buf in layer.values())
            for srv in self.servers
        )

    # -- internals ----------------------------------------------------------
    def _rid_of(self, tier: int, sub: int) -> int:
        return self._back[(tier, sub)]
