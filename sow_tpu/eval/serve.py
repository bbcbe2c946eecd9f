"""Continuous-batching generation server (TPU serving engine).

The reference's eval harness (``commonsense_evaluate.py:79-85``) decodes one
fixed batch at a time with HF ``generate``: throughput dies on stragglers —
every sequence waits for the batch's longest prompt AND longest completion.
This engine keeps a fixed pool of ``max_batch`` slots and interleaves:

  * **admit**: a pending prompt prefill-fills a free slot (prompt lengths
    bucketed to powers of two so there is one compiled prefill per bucket);
  * **decode**: one fused step advances ALL active slots — each at its own
    position — via ``models/llama.py::forward_decode_ragged`` (batched
    K/V scatter at per-slot write indices, per-slot causal masks);
  * **retire**: slots hitting EOS or their token budget free immediately and
    the next pending prompt takes over the slot.

Everything device-side is static-shape (the pool, the caches, the step), so
there are exactly ``len(buckets) + 1`` compiles regardless of traffic.
Supports the int8 KV cache (``cache_dtype=jnp.int8``) for 2x pool capacity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.models import llama as llama_lib


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds the largest bucket {buckets[-1]}")


@dataclasses.dataclass
class _Slot:
    request_id: int
    prompt_len: int
    max_new: int
    generated: list


class GenerationServer:
    """Fixed-pool continuous-batching decoder over one model replica."""

    def __init__(
        self,
        params: dict,
        cfg: llama_lib.LlamaConfig,
        max_batch: int = 8,
        max_len: int = 512,
        eos_token_id: Optional[int] = None,
        cache_dtype=None,
        prompt_buckets: tuple[int, ...] = (32, 64, 128, 256),
    ):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.eos = eos_token_id
        self.buckets = tuple(b for b in prompt_buckets if b <= max_len)
        dtype = cache_dtype or params["embed"]["embedding"].dtype
        self.cache = llama_lib.init_cache(cfg, max_batch, max_len, dtype=dtype)

        # host-side slot bookkeeping
        self.slots: list[Optional[_Slot]] = [None] * max_batch
        self.lengths = np.zeros(max_batch, np.int32)  # tokens in cache per slot
        self.last_token = np.zeros(max_batch, np.int32)
        self.pending: list[tuple[int, list]] = []
        self.finished: dict[int, list] = {}
        self._next_id = 0

        self._decode = jax.jit(self._decode_impl)
        self._prefill = {}  # bucket -> jitted fn

    # -- public API --------------------------------------------------------
    def submit(self, prompt_ids: list, max_new_tokens: int = 32) -> int:
        """Queue a prompt; returns a request id (see ``finished``)."""
        rid = self._next_id
        self._next_id += 1
        if len(prompt_ids) + max_new_tokens > self.max_len:
            raise ValueError("prompt + budget exceeds max_len")
        self.pending.append((rid, (list(prompt_ids), max_new_tokens)))
        return rid

    def step(self) -> dict[int, list]:
        """Admit pending prompts into free slots, run ONE decode tick for all
        active slots, retire finished ones. Returns {request_id: tokens}
        newly finished this tick."""
        self._admit()
        if not any(s is not None for s in self.slots):
            return {}
        self._tick()
        return self._retire()

    def run(self) -> dict[int, list]:
        """Drain the queue; returns all {request_id: generated tokens}."""
        while self.pending or any(s is not None for s in self.slots):
            self.step()
        out, self.finished = self.finished, {}
        return out

    # -- internals ---------------------------------------------------------
    def _admit(self):
        for i in range(self.max_batch):
            if self.slots[i] is not None or not self.pending:
                continue
            rid, (prompt, max_new) = self.pending.pop(0)
            t = len(prompt)
            bucket = _bucket(t, self.buckets)
            ids = np.zeros((1, bucket), np.int32)
            mask = np.zeros((1, bucket), np.int32)
            ids[0, bucket - t:] = prompt  # left-pad into the bucket
            mask[0, bucket - t:] = 1
            fn = self._prefill_fn(bucket)
            logits, self.cache = fn(
                self.params, self.cache, jnp.asarray(ids), jnp.asarray(mask),
                jnp.int32(i), jnp.int32(t),
            )
            first = int(jnp.argmax(logits.astype(jnp.float32)))
            self.slots[i] = _Slot(rid, t, max_new, [first])
            self.lengths[i] = t
            self.last_token[i] = first

    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefill:
            cfg = self.cfg

            @partial(jax.jit, donate_argnums=(1,))
            def prefill(params, cache, ids, mask, slot, t_real):
                # batch-1 prefill into a scratch cache of bucket length,
                # then copy the real suffix into the pool slot LEFT-ALIGNED
                # (slot cache holds positions [0, t_real)).
                b = ids.shape[1]
                scratch = llama_lib.init_cache(cfg, 1, b, dtype=cache[0]["k"].dtype)
                positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
                logits, scratch = llama_lib.forward_with_cache(
                    params, ids, cfg, scratch, 0, positions, mask
                )
                new_cache = []
                for pool, sc in zip(cache, scratch):
                    layer = {}
                    for name, buf in pool.items():
                        blk = sc[name][0]  # (kvh, bucket[, hd])
                        # roll the left-padded block so the real prompt sits
                        # at positions [0, t_real)
                        blk = jnp.roll(blk, t_real - b, axis=1)
                        pad = buf.shape[2] - b
                        if pad > 0:
                            padding = [(0, 0), (0, pad)] + [(0, 0)] * (blk.ndim - 2)
                            blk = jnp.pad(blk, padding)
                        layer[name] = jax.lax.dynamic_update_index_in_dim(
                            buf, blk.astype(buf.dtype), slot, 0
                        )
                    new_cache.append(layer)
                return logits[0, -1], new_cache

            self._prefill[bucket] = prefill
        return self._prefill[bucket]

    def _decode_impl(self, params, cache, tokens, lengths, active):
        logits, cache = llama_lib.forward_decode_ragged(
            params, tokens, self.cfg, cache, lengths
        )
        nxt = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        # inactive slots must not advance (their cache writes land in slot
        # position `lengths`, which retire() never exposes — harmless junk)
        nxt = jnp.where(active, nxt, tokens)
        return nxt, cache

    def _tick(self):
        active = np.array([s is not None for s in self.slots])
        nxt, self.cache = self._decode(
            self.params,
            self.cache,
            jnp.asarray(self.last_token),
            jnp.asarray(self.lengths),
            jnp.asarray(active),
        )
        nxt = np.asarray(nxt)
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            self.lengths[i] += 1
            tok = int(nxt[i])
            slot.generated.append(tok)
            self.last_token[i] = tok

    def _retire(self) -> dict[int, list]:
        done = {}
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            gen = slot.generated
            hit_eos = self.eos is not None and gen[-1] == self.eos
            # the pre-appended next-token candidate makes len(gen) one ahead
            if hit_eos or len(gen) >= slot.max_new:
                out = gen[: slot.max_new]
                done[slot.request_id] = out
                self.finished[slot.request_id] = out
                self.slots[i] = None
                self.lengths[i] = 0
                self.last_token[i] = 0
        return done
