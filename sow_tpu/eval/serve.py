"""Continuous-batching generation server (TPU serving engine).

The reference's eval harness (``commonsense_evaluate.py:79-85``) decodes one
fixed batch at a time with HF ``generate``: throughput dies on stragglers —
every sequence waits for the batch's longest prompt AND longest completion.
This engine keeps a fixed pool of ``max_batch`` slots and interleaves:

  * **admit**: pending prompts prefill-fill free slots in same-bucket
    GROUPS — one device call (and one logits sync) admits up to
    ``group`` requests (prompt lengths bucketed to powers of two, group
    sizes likewise, so compiles stay bounded at buckets x log2(pool));
  * **decode**: one fused call advances ALL active slots — each at its own
    position — via ``models/llama.py::forward_decode_ragged`` (per-slot
    K/V write positions + causal masks; select- or scatter-based write
    picked by buffer size). Decoding runs ``decode_chunk`` ticks per host
    round-trip as one ``lax.scan`` (multi-step scheduling): slots hitting
    EOS or their budget deactivate *inside* the chunk, so one device call
    + one host sync covers up to ``decode_chunk`` tokens per slot instead
    of one (and 4x that in drain mode, once the queue empties);
  * **retire**: finished slots free at sync points and the next pending
    prompt takes over the slot.

**Device-resident slot state.** All per-slot scheduling state (last token,
cache length, active flag, remaining budget, temperature, generated-token
buffer, RNG counter) lives in device arrays that prefill and decode update
in place (donated buffers). The host dispatches decode chunks back-to-back
WITHOUT syncing — emitted tokens accumulate into the on-device ``out``
buffer — and reads one packed snapshot only when a retirement is possible
(every request's budget bounds when it can finish, so the scheduler knows
how many ticks it may run blind; with an EOS token an optional cap bounds
how late an early exit is noticed). On a tunneled chip this removes the
~32 ms host round-trip that round 2 paid per 46 ms decode chunk.

Everything device-side is static-shape (the pool, the caches, the step), so
compiles are bounded (``len(buckets) * log2(pool) + 1``) regardless of
traffic.
Supports the int8 KV cache (``cache_dtype=jnp.int8``) for 2x pool capacity
and per-request temperature sampling (Gumbel-max, reproducible per seed).
"""

from __future__ import annotations

import dataclasses
import time
from functools import lru_cache, partial
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


def _next_pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _cache_shardings(mesh, cache):
    """KV-head axis (axis 1 of every (B, kvh, T[, hd]) buffer) over the
    ``model`` mesh axis; batch/positions replicated (slots are host-managed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sow_tpu.parallel.mesh import _fit_spec

    def sh(leaf):
        return NamedSharding(mesh, _fit_spec(mesh, P(None, "model"), leaf))

    return jax.tree_util.tree_map(sh, cache)


def _init_dstate(max_batch: int, max_len: int) -> dict:
    """Device-resident per-slot scheduling state (see module docstring)."""
    return {
        "tok": jnp.zeros((max_batch,), jnp.int32),  # last emitted token
        "len": jnp.zeros((max_batch,), jnp.int32),  # tokens in cache
        "act": jnp.zeros((max_batch,), bool),  # still decoding
        "budget": jnp.zeros((max_batch,), jnp.int32),  # decode tokens left
        "temp": jnp.zeros((max_batch,), jnp.float32),  # 0 = greedy
        "ngen": jnp.zeros((max_batch,), jnp.int32),  # generated so far
        "out": jnp.zeros((max_batch, max_len), jnp.int32),  # emitted tokens
        "ctr": jnp.zeros((), jnp.uint32),  # per-TICK RNG counter
    }


@lru_cache(maxsize=None)
def _make_prefill(
    cfg: llama_lib.LlamaConfig,
    bucket: int,
    group: int,
    seed: int,
    eos: Optional[int],
):
    """Jitted grouped prefill, cached per (cfg, bucket, group, seed, eos)
    across ALL servers: admits up to ``group`` same-bucket prompts in ONE
    device call with NO host download — the first token is sampled on
    device and written straight into the device-resident slot state.

    ``packed`` rows: [ids(bucket) | mask(bucket) | slot | t_real | rid |
    temperature | max_new]. First tokens: Gumbel-max with
    ``fold_in(PRNGKey(seed), rid)`` when temperature > 0, else argmax."""

    @partial(jax.jit, donate_argnums=(1, 2))
    def prefill(params, cache, dstate, packed):
        ids = packed[:, :bucket].astype(jnp.int32)
        mask = packed[:, bucket : 2 * bucket].astype(jnp.int32)
        slots = packed[:, 2 * bucket].astype(jnp.int32)
        t_real = packed[:, 2 * bucket + 1].astype(jnp.int32)
        rid = packed[:, 2 * bucket + 2].astype(jnp.uint32)
        temps = packed[:, 2 * bucket + 3]
        max_new = packed[:, 2 * bucket + 4].astype(jnp.int32)

        # (group, bucket) prefill into a scratch cache, then copy each row's
        # real suffix LEFT-ALIGNED into its pool slot (positions [0, t_real)).
        # Padding rows carry slot index >= pool size -> scatter-dropped.
        scratch = llama_lib.init_cache(cfg, group, bucket, dtype=cache[0]["k"].dtype)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, scratch = llama_lib.forward_with_cache(
            params, ids, cfg, scratch, 0, positions, mask
        )
        shift = t_real - bucket  # (group,) left-shift so prompts start at 0
        new_cache = []
        for pool, sc in zip(cache, scratch):
            layer = {}
            for name, buf in pool.items():
                blk = sc[name]  # (group, kvh, bucket[, hd])
                blk = jax.vmap(lambda x, s: jnp.roll(x, s, axis=1))(blk, shift)
                pad = buf.shape[2] - bucket
                if pad > 0:
                    padding = [(0, 0), (0, 0), (0, pad)] + [(0, 0)] * (blk.ndim - 3)
                    blk = jnp.pad(blk, padding)
                layer[name] = buf.at[slots].set(blk.astype(buf.dtype), mode="drop")
            new_cache.append(layer)

        lg = logits[:, -1].astype(jnp.float32)  # (group, vocab)
        greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        keys = jax.vmap(lambda r: jax.random.fold_in(jax.random.PRNGKey(seed), r))(rid)
        gumbel = jax.vmap(lambda k: jax.random.gumbel(k, (lg.shape[-1],)))(keys)
        samp = jnp.argmax(
            lg / jnp.maximum(temps, 1e-6)[:, None] + gumbel, axis=-1
        ).astype(jnp.int32)
        first = jnp.where(temps > 0, samp, greedy)

        # scatter the admitted rows into the device slot state (mode="drop"
        # discards padding rows, whose slot index is out of range)
        max_len = dstate["out"].shape[1]
        active = max_new > 1
        if eos is not None:
            # a first token that IS eos finishes the request at prefill
            active = active & (first != eos)
        row = jnp.zeros((group, max_len), jnp.int32).at[:, 0].set(first)
        st = {
            "tok": dstate["tok"].at[slots].set(first, mode="drop"),
            "len": dstate["len"].at[slots].set(t_real, mode="drop"),
            "act": dstate["act"].at[slots].set(active, mode="drop"),
            "budget": dstate["budget"].at[slots].set(max_new - 1, mode="drop"),
            "temp": dstate["temp"].at[slots].set(temps, mode="drop"),
            "ngen": dstate["ngen"].at[slots].set(1, mode="drop"),
            "out": dstate["out"].at[slots].set(row, mode="drop"),
            "ctr": dstate["ctr"],
        }
        return new_cache, st

    return prefill


@lru_cache(maxsize=None)
def _make_draft_prefill(cfg: llama_lib.LlamaConfig, bucket: int, group: int):
    """Cache-only grouped prefill for the DRAFT model in speculative serving:
    same packed layout and left-aligned scatter as ``_make_prefill``, but it
    only fills the draft KV pool — slot state belongs to the target prefill."""

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, packed):
        ids = packed[:, :bucket].astype(jnp.int32)
        mask = packed[:, bucket : 2 * bucket].astype(jnp.int32)
        slots = packed[:, 2 * bucket].astype(jnp.int32)
        t_real = packed[:, 2 * bucket + 1].astype(jnp.int32)

        scratch = llama_lib.init_cache(cfg, group, bucket, dtype=cache[0]["k"].dtype)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        _, scratch = llama_lib.forward_with_cache(
            params, ids, cfg, scratch, 0, positions, mask
        )
        shift = t_real - bucket
        new_cache = []
        for pool, sc in zip(cache, scratch):
            layer = {}
            for name, buf in pool.items():
                blk = sc[name]
                blk = jax.vmap(lambda x, s: jnp.roll(x, s, axis=1))(blk, shift)
                pad = buf.shape[2] - bucket
                if pad > 0:
                    padding = [(0, 0), (0, 0), (0, pad)] + [(0, 0)] * (blk.ndim - 3)
                    blk = jnp.pad(blk, padding)
                layer[name] = buf.at[slots].set(blk.astype(buf.dtype), mode="drop")
            new_cache.append(layer)
        return new_cache

    return prefill


@lru_cache(maxsize=None)
def _make_spec_decode(
    cfg: llama_lib.LlamaConfig,
    draft_cfg: llama_lib.LlamaConfig,
    rounds: int,
    gamma: int,
    eos: Optional[int],
    seed: int,
):
    """Jitted speculative decode chunk: ``rounds`` draft-propose/target-verify
    rounds over the device slot state, each deciding 1..gamma+1 tokens per
    active slot.

    Greedy slots (``temp == 0``) use exact-match acceptance — token-identical
    to the plain decode path. Sampling slots (``temp > 0``) run the
    rejection-sampling scheme (accept d with prob min(1, p(d)/q(d)), first
    rejection resamples from norm(max(p-q, 0))), which preserves the
    target's sampling DISTRIBUTION exactly (see ``eval/speculative.py``);
    keys derive from ``fold_in(PRNGKey(seed), ctr)`` per ROUND, so streams
    are chunk-invariant and reproducible, but differ from the non-spec
    engine's per-tick streams."""

    @partial(jax.jit, donate_argnums=(2, 3, 4))
    def decode(params, draft_params, cache, draft_cache, dstate):
        max_len = dstate["out"].shape[1]
        idx = jnp.arange(gamma + 1)[None, :]
        col = jnp.arange(max_len)[None, :]

        def spec_round(carry, _):
            cache, dcache, st = carry
            base_key = jax.random.fold_in(jax.random.PRNGKey(seed), st["ctr"])
            inv_t = 1.0 / jnp.maximum(st["temp"], 1e-6)  # (B,)
            sampling = st["temp"] > 0

            def draft_step(c, i):
                dc, tok = c
                logits, dc = llama_lib.forward_block_ragged(
                    draft_params, tok[:, None], draft_cfg, dc, st["len"] + i
                )
                lg = logits[:, 0].astype(jnp.float32)
                greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                q = jax.nn.softmax(lg * inv_t[:, None], axis=-1)
                gumbel = jax.random.gumbel(jax.random.fold_in(base_key, i), q.shape)
                samp = jnp.argmax(
                    jnp.log(jnp.maximum(q, 1e-30)) + gumbel, axis=-1
                ).astype(jnp.int32)
                nxt = jnp.where(sampling, samp, greedy)
                return (dc, nxt), (nxt, q)

            (dcache, _), (props, q_all) = jax.lax.scan(
                draft_step, (dcache, st["tok"]), jnp.arange(gamma)
            )
            props = jnp.moveaxis(props, 0, 1)  # (B, gamma)
            q_all = jnp.moveaxis(q_all, 0, 1)  # (B, gamma, V)

            block = jnp.concatenate([st["tok"][:, None], props], axis=1)
            logits, cache = llama_lib.forward_block_ragged(
                params, block, cfg, cache, st["len"]
            )
            lg = logits.astype(jnp.float32)  # (B, gamma+1, V)
            y = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            p_all = jax.nn.softmax(lg * inv_t[:, None, None], axis=-1)

            # acceptance: exact-match for greedy slots, min(1, p/q) for
            # sampling slots
            p_sel = jnp.take_along_axis(
                p_all[:, :gamma], props[..., None], axis=-1
            )[..., 0]
            q_sel = jnp.take_along_axis(q_all, props[..., None], axis=-1)[..., 0]
            u = jax.random.uniform(jax.random.fold_in(base_key, gamma), (
                props.shape[0], gamma
            ))
            acc_sample = u * jnp.maximum(q_sel, 1e-30) < p_sel
            acc_greedy = props == y[:, :gamma]
            match = jnp.where(sampling[:, None], acc_sample, acc_greedy)
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)

            # token at position a: target argmax (greedy) or residual sample
            bonus_greedy = jnp.take_along_axis(y, a[:, None], axis=1)[:, 0]
            q_pad = jnp.concatenate([q_all, jnp.zeros_like(q_all[:, :1])], axis=1)
            p_a = jnp.take_along_axis(p_all, a[:, None, None], axis=1)[:, 0]
            q_a = jnp.take_along_axis(q_pad, a[:, None, None], axis=1)[:, 0]
            r = jnp.maximum(p_a - q_a, 0.0)
            r = jnp.where(jnp.sum(r, axis=-1, keepdims=True) < 1e-6, p_a, r)
            res_gumbel = jax.random.gumbel(
                jax.random.fold_in(base_key, gamma + 1), r.shape
            )
            bonus_sample = jnp.argmax(
                jnp.log(jnp.maximum(r, 1e-30)) + res_gumbel, axis=-1
            ).astype(jnp.int32)
            bonus = jnp.where(sampling, bonus_sample, bonus_greedy)[:, None]
            new_toks = jnp.where(
                idx < a[:, None], jnp.pad(props, ((0, 0), (0, 1))), bonus
            )

            count = a + 1
            if eos is not None:
                is_eos = (new_toks == eos) & (idx < count[:, None])
                first_eos = jnp.argmax(is_eos, axis=1)
                count = jnp.where(is_eos.any(axis=1), first_eos + 1, count)
            count = jnp.minimum(count, st["budget"])
            count = jnp.where(st["act"], count, 0)

            rel = col - st["ngen"][:, None]
            take = jnp.take_along_axis(new_toks, jnp.clip(rel, 0, gamma), axis=1)
            out = jnp.where((rel >= 0) & (rel < count[:, None]), take, st["out"])

            newtok = jnp.take_along_axis(
                new_toks, jnp.maximum(count - 1, 0)[:, None], axis=1
            )[:, 0]
            newtok = jnp.where(count > 0, newtok, st["tok"])
            budget = st["budget"] - count
            done = budget <= 0
            if eos is not None:
                done = done | (newtok == eos)
            new = {
                "tok": newtok,
                "len": st["len"] + count,
                "act": st["act"] & ~done,
                "budget": budget,
                "temp": st["temp"],
                "ngen": st["ngen"] + count,
                "out": out,
                "ctr": st["ctr"] + 1,
            }
            return (cache, dcache, new), None

        (cache, draft_cache, dstate), _ = jax.lax.scan(
            spec_round, (cache, draft_cache, dstate), None, length=rounds
        )
        return cache, draft_cache, dstate

    return decode


@lru_cache(maxsize=None)
def _make_decode(
    cfg: llama_lib.LlamaConfig, decode_chunk: int, eos: Optional[int], seed: int
):
    """Jitted chunked-decode, cached per (cfg, chunk, eos, seed) across
    servers.

    ``decode_chunk`` ragged ticks as one scan over the device-resident slot
    state — NO host I/O at all: emitted tokens land in ``dstate["out"]`` at
    each slot's ``ngen`` cursor. A slot deactivates in place when it emits
    EOS or exhausts its budget; inactive slots keep re-writing their last
    K/V at a fixed position — junk the host never exposes (and prefill
    fully overwrites the slot on re-admission). Slots with ``temp > 0``
    Gumbel-max sample with a per-TICK key ``fold_in(PRNGKey(seed), ctr)``
    (so samples are invariant to how ticks are chunked); others argmax."""

    @partial(jax.jit, donate_argnums=(1, 2))
    def decode(params, cache, dstate):
        max_len = dstate["out"].shape[1]
        rows = jnp.arange(dstate["out"].shape[0])

        def tick(carry, _):
            cache, st = carry
            logits, cache = llama_lib.forward_decode_ragged(
                params, st["tok"], cfg, cache, st["len"]
            )
            lg = logits.astype(jnp.float32)
            greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            key = jax.random.fold_in(jax.random.PRNGKey(seed), st["ctr"])
            gumbel = jax.random.gumbel(key, lg.shape)
            samp = jnp.argmax(
                lg / jnp.maximum(st["temp"], 1e-6)[:, None] + gumbel, axis=-1
            ).astype(jnp.int32)
            nxt = jnp.where(st["temp"] > 0, samp, greedy)
            nxt = jnp.where(st["act"], nxt, st["tok"])
            idx = jnp.clip(st["ngen"], 0, max_len - 1)
            cur = st["out"][rows, idx]
            out = st["out"].at[rows, idx].set(jnp.where(st["act"], nxt, cur))
            adv = st["act"].astype(jnp.int32)
            budget = st["budget"] - adv
            done = budget <= 0
            if eos is not None:
                done = done | (nxt == eos)
            new = {
                "tok": nxt,
                "len": st["len"] + adv,
                "act": st["act"] & ~done,
                "budget": budget,
                "temp": st["temp"],
                "ngen": st["ngen"] + adv,
                "out": out,
                "ctr": st["ctr"] + 1,
            }
            return (cache, new), None

        (cache, dstate), _ = jax.lax.scan(
            tick, (cache, dstate), None, length=decode_chunk
        )
        return cache, dstate

    return decode


@jax.jit
def _snapshot(dstate):
    """Pack everything the host needs for retirement into ONE int32 array
    (single device->host transfer): [act | ngen | out...] per slot."""
    return jnp.concatenate(
        [
            dstate["act"].astype(jnp.int32)[:, None],
            dstate["ngen"][:, None],
            dstate["out"],
        ],
        axis=1,
    )


def _init_beam_dstate(n_groups: int, k: int, max_len: int) -> dict:
    """Device-resident state for beam serving: per-SLOT beam rows (token,
    score, finished, emitted history) + per-GROUP scheduling (active,
    budget, generated count). Slots ``g*k .. g*k+k-1`` are group ``g``'s
    beams, kept in rank order by the per-tick permutation."""
    b = n_groups * k
    return {
        "tok": jnp.zeros((b,), jnp.int32),
        "len": jnp.zeros((b,), jnp.int32),
        "score": jnp.zeros((b,), jnp.float32),  # cumulative log-prob
        "fin": jnp.zeros((b,), bool),  # beam emitted EOS
        "out": jnp.zeros((b, max_len), jnp.int32),
        "act": jnp.zeros((n_groups,), bool),
        "budget": jnp.zeros((n_groups,), jnp.int32),
        "ngen": jnp.zeros((n_groups,), jnp.int32),
    }


@lru_cache(maxsize=None)
def _make_beam_prefill(
    cfg: llama_lib.LlamaConfig, bucket: int, group: int, k: int, eos: Optional[int]
):
    """Grouped beam prefill: each admitted REQUEST's prompt runs forward
    ONCE (vs ``beam_generate`` replicating it k times), its K/V broadcast
    into the k pool rows of the assigned group, and the first expansion is
    the top-k of the final-position log-softmax — exactly
    ``eval/generate.py:120-133``. Packed rows:
    [ids(bucket) | mask(bucket) | gslot | t_real | max_new]."""

    @partial(jax.jit, donate_argnums=(1, 2))
    def prefill(params, cache, dstate, packed):
        ids = packed[:, :bucket].astype(jnp.int32)
        mask = packed[:, bucket : 2 * bucket].astype(jnp.int32)
        gslots = packed[:, 2 * bucket].astype(jnp.int32)
        t_real = packed[:, 2 * bucket + 1].astype(jnp.int32)
        max_new = packed[:, 2 * bucket + 2].astype(jnp.int32)
        n_groups = dstate["act"].shape[0]
        max_len = dstate["out"].shape[1]

        scratch = llama_lib.init_cache(cfg, group, bucket, dtype=cache[0]["k"].dtype)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, scratch = llama_lib.forward_with_cache(
            params, ids, cfg, scratch, 0, positions, mask
        )
        shift = t_real - bucket
        # replicate each request's prompt K/V into its group's k rows
        rowidx = (gslots[:, None] * k + jnp.arange(k)[None, :]).reshape(-1)
        new_cache = []
        for pool, sc in zip(cache, scratch):
            layer = {}
            for name, buf in pool.items():
                blk = sc[name]
                blk = jax.vmap(lambda x, s: jnp.roll(x, s, axis=1))(blk, shift)
                pad = buf.shape[2] - bucket
                if pad > 0:
                    padding = [(0, 0), (0, 0), (0, pad)] + [(0, 0)] * (blk.ndim - 3)
                    blk = jnp.pad(blk, padding)
                rep = jnp.repeat(blk, k, axis=0)  # (group*k, ...)
                layer[name] = buf.at[rowidx].set(rep.astype(buf.dtype), mode="drop")
            new_cache.append(layer)

        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        scores0, first = jax.lax.top_k(lp, k)  # (group, k)
        first = first.astype(jnp.int32)
        fin0 = (first == eos) if eos is not None else jnp.zeros_like(first, bool)
        row = jnp.zeros((group, k, max_len), jnp.int32).at[:, :, 0].set(first)

        flat = lambda x: x.reshape(-1)
        st = {
            "tok": dstate["tok"].at[rowidx].set(flat(first), mode="drop"),
            "len": dstate["len"].at[rowidx].set(
                flat(jnp.broadcast_to(t_real[:, None], (group, k))), mode="drop"
            ),
            "score": dstate["score"].at[rowidx].set(flat(scores0), mode="drop"),
            "fin": dstate["fin"].at[rowidx].set(flat(fin0), mode="drop"),
            "out": dstate["out"].at[rowidx].set(
                row.reshape(group * k, max_len), mode="drop"
            ),
            "act": dstate["act"].at[gslots].set(
                (max_new > 1) & ~fin0.all(axis=1), mode="drop"
            ),
            "budget": dstate["budget"].at[gslots].set(max_new - 1, mode="drop"),
            "ngen": dstate["ngen"].at[gslots].set(
                jnp.ones_like(max_new), mode="drop"
            ),
        }
        return new_cache, st

    return prefill


@lru_cache(maxsize=None)
def _make_beam_decode(
    cfg: llama_lib.LlamaConfig, decode_chunk: int, k: int, eos: Optional[int]
):
    """Chunked beam decode over the device-resident state. Each tick is one
    ragged forward for ALL pool rows + a per-group top-k over the k*V
    candidate continuations + a row permutation of beam state AND the K/V
    cache (full-row gather: the prompt region is identical across a
    group's beams, so gathering it is a semantic no-op) — the continuous-
    batching counterpart of ``eval/generate.py:136-177``, including the
    finished-beams-extend-with-EOS-at-no-cost rule. A group deactivates
    when its budget is exhausted or every beam has finished; outputs are
    eos-padded by the host, matching ``beam_generate``'s fixed-length
    output."""
    neg = jnp.float32(-1e9)

    @partial(jax.jit, donate_argnums=(1, 2))
    def decode(params, cache, dstate):
        b = dstate["tok"].shape[0]
        n_groups = b // k
        max_len = dstate["out"].shape[1]
        rows = jnp.arange(b)
        base = jnp.arange(n_groups) * k

        def tick(carry, _):
            cache, st = carry
            logits, cache = llama_lib.forward_decode_ragged(
                params, st["tok"], cfg, cache, st["len"]
            )
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            vocab = lp.shape[-1]
            if eos is not None:
                eos_only = jnp.full((vocab,), neg).at[eos].set(0.0)
                lp = jnp.where(st["fin"][:, None], eos_only[None], lp)
            cand = st["score"][:, None] + lp  # (B, V)
            new_sc, idx = jax.lax.top_k(cand.reshape(n_groups, k * vocab), k)
            beam_idx = idx // vocab
            tok_idx = (idx % vocab).astype(jnp.int32)

            actb = jnp.repeat(st["act"], k)  # per-slot active flag
            src = jnp.where(actb, (base[:, None] + beam_idx).reshape(-1), rows)
            tokn = jnp.where(actb, tok_idx.reshape(-1), st["tok"])
            out = st["out"][src]
            pos = jnp.clip(jnp.repeat(st["ngen"], k), 0, max_len - 1)
            out = out.at[rows, pos].set(jnp.where(actb, tokn, out[rows, pos]))
            fin = st["fin"][src]
            if eos is not None:
                fin = fin | (actb & (tokn == eos))
            cache = [
                {name: buf[src] for name, buf in layer.items()} for layer in cache
            ]
            adv = st["act"].astype(jnp.int32)
            budget = st["budget"] - adv
            act = st["act"] & (budget > 0) & ~fin.reshape(n_groups, k).all(axis=1)
            new = {
                "tok": tokn,
                "len": st["len"] + actb.astype(jnp.int32),
                "score": jnp.where(actb, new_sc.reshape(-1), st["score"]),
                "fin": fin,
                "out": out,
                "act": act,
                "budget": budget,
                "ngen": st["ngen"] + adv,
            }
            return (cache, new), None

        (cache, dstate), _ = jax.lax.scan(
            tick, (cache, dstate), None, length=decode_chunk
        )
        return cache, dstate

    return decode


@jax.jit
def _snapshot_beam(dstate):
    """One int32 device->host transfer for beam retirement: per slot
    [group_act | group_ngen | score_bits | out...]."""
    k = dstate["tok"].shape[0] // dstate["act"].shape[0]
    return jnp.concatenate(
        [
            jnp.repeat(dstate["act"].astype(jnp.int32), k)[:, None],
            jnp.repeat(dstate["ngen"], k)[:, None],
            jax.lax.bitcast_convert_type(dstate["score"], jnp.int32)[:, None],
            dstate["out"],
        ],
        axis=1,
    )


@dataclasses.dataclass
class _Slot:
    request_id: int
    prompt_len: int
    max_new: int
    temperature: float = 0.0
    known_ngen: int = 1  # generated count at the last host sync (prefill = 1)
    dispatched: int = 0  # decode ticks dispatched since the last sync


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
        # chunk 16 measured 15% over chunk 8 at 1b pool-8 (fewer host
        # round-trips); smaller chunks only help admission/retire latency
        decode_chunk: int = 16,
        drain_chunk: int = 32,
        sample_seed: int = 0,
        mesh=None,
        eos_sync_ticks: Optional[int] = None,
        num_beams: int = 1,
        # speculative decoding: a smaller same-vocab draft model proposes
        # spec_gamma tokens per target verify forward; each decode "tick"
        # becomes a spec ROUND deciding 1..gamma+1 tokens per slot. Greedy
        # slots stay token-identical to the plain path; temp>0 slots use
        # rejection sampling (distribution-exact, different RNG stream than
        # the non-spec engine).
        draft_params: Optional[dict] = None,
        draft_cfg=None,
        spec_gamma: int = 4,
    ):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.eos = eos_token_id
        self.decode_chunk = decode_chunk
        self.num_beams = num_beams
        if num_beams > 1 and max_batch % num_beams:
            raise ValueError("max_batch must be a multiple of num_beams")
        self._spec = draft_params is not None
        self.spec_gamma = spec_gamma
        if self._spec:
            if num_beams > 1:
                raise ValueError("speculative serving is greedy-only (no beams)")
            if draft_cfg is None:
                raise ValueError("draft_params requires draft_cfg")
            if draft_cfg.vocab_size != cfg.vocab_size:
                raise ValueError("draft and target must share a vocab")
        # beam mode: the pool is n_groups contiguous blocks of num_beams
        # slots; one request occupies a whole block (ref beam-4 eval,
        # commonsense_evaluate.py:79-85)
        self.n_groups = max_batch // num_beams
        self.buckets = tuple(b for b in prompt_buckets if b <= max_len) or (
            min(32, max_len),  # tiny max_len: seed the ladder, auto-extends
        )
        dtype = cache_dtype or params["embed"]["embedding"].dtype
        # speculative verify blocks overshoot a slot's final length by up to
        # gamma positions; give both pools that scratch headroom (submit's
        # prompt+budget bound stays at max_len)
        pool_len = max_len + (spec_gamma if self._spec else 0)
        self.cache = llama_lib.init_cache(cfg, max_batch, pool_len, dtype=dtype)
        self._beam = num_beams > 1
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.draft_cache = (
            llama_lib.init_cache(draft_cfg, max_batch, pool_len, dtype=dtype)
            if self._spec
            else None
        )
        if mesh is not None:
            # multi-chip serving: weights TP/FSDP-sharded by the training
            # path rules, cache sharded over KV heads on the `model` axis;
            # GSPMD propagates through prefill/decode and inserts the
            # collectives (the serving analogue of the trainer's SPMD step)
            from sow_tpu.parallel.mesh import params_shardings
            self.params = jax.device_put(params, params_shardings(mesh, params))
            self.cache = jax.device_put(self.cache, _cache_shardings(mesh, self.cache))
            if self._spec:
                self.draft_params = jax.device_put(
                    draft_params, params_shardings(mesh, draft_params)
                )
                self.draft_cache = jax.device_put(
                    self.draft_cache, _cache_shardings(mesh, self.draft_cache)
                )

        # device-resident slot state + minimal host mirror (scheduling only).
        # In beam mode the host schedules GROUPS (one request = one block of
        # num_beams pool rows), so the slot mirror is per-group.
        self.dstate = (
            _init_beam_dstate(self.n_groups, num_beams, max_len)
            if self._beam
            else _init_dstate(max_batch, max_len)
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.dstate = jax.device_put(self.dstate, NamedSharding(mesh, P()))
        self.slots: list[Optional[_Slot]] = [None] * (
            self.n_groups if self._beam else max_batch
        )
        self.pending: list[tuple[int, list]] = []
        self.finished: dict[int, list] = {}
        self._next_id = 0
        self._sample_seed = sample_seed
        self._chunk_counter = 0
        # telemetry (see stats())
        self._n_prefill_calls = 0
        self._n_prefilled = 0
        self._n_decode_ticks = 0  # device ticks: chunk length x chunks
        self._n_occupied_ticks = 0  # ticks x slots holding a live request
        self._n_generated = 0
        self._n_completed = 0
        # per-request wall-clock marks (monotonic): "submit" at queue entry,
        # "admit" when the request's grouped prefill is DISPATCHED (its
        # first token is computed in that call; admit-submit is the
        # scheduling/queueing delay and a lower-bound TTFT proxy — the
        # prefill itself completes asynchronously), "done" at retirement
        # sync. Powers the online-arrival benchmark's TTFT / latency
        # percentiles (benchmarks/serve_bench.py --arrival-rate).
        self.request_times: dict[int, dict] = {}

        # jitted fns come from module-level lru_caches keyed on the static
        # config, so every server with the same (cfg, chunk, eos, seed)
        # shares compiles — restarting a server must not recompile the engine
        if self._beam:
            self._decode = _make_beam_decode(cfg, decode_chunk, num_beams, eos_token_id)
        elif self._spec:
            self._decode = _make_spec_decode(
                cfg, draft_cfg, decode_chunk, spec_gamma, eos_token_id, sample_seed
            )
        else:
            self._decode = _make_decode(cfg, decode_chunk, eos_token_id, sample_seed)
        # drain mode: with nothing pending there is no reason to come back
        # to the host every `decode_chunk` ticks — a longer chunk amortizes
        # the per-chunk dispatch+sync (~32 ms vs 46 ms of compute at 1b
        # pool-8 on the tunneled chip) over 4x the tokens
        self.drain_chunk = max(drain_chunk, decode_chunk)
        if self.drain_chunk == decode_chunk:
            self._decode_long = self._decode
        elif self._beam:
            self._decode_long = _make_beam_decode(
                cfg, self.drain_chunk, num_beams, eos_token_id
            )
        elif self._spec:
            self._decode_long = _make_spec_decode(
                cfg, draft_cfg, self.drain_chunk, spec_gamma, eos_token_id,
                sample_seed,
            )
        else:
            self._decode_long = _make_decode(
                cfg, self.drain_chunk, eos_token_id, sample_seed
            )
        self._prefill = {}  # (bucket, group) -> jitted fn (from _make_prefill)
        # with an EOS token a slot can finish before its budget; cap how many
        # ticks the scheduler runs blind so early exits retire promptly
        self.eos_sync_ticks = (
            eos_sync_ticks if eos_sync_ticks is not None else 2 * decode_chunk
        )

    # -- public API --------------------------------------------------------
    def submit(
        self, prompt_ids: list, max_new_tokens: int = 32, temperature: float = 0.0
    ) -> int:
        """Queue a prompt; returns a request id (see ``finished``).
        ``temperature`` 0 = greedy; > 0 = per-slot softmax sampling
        (reproducible given the server's ``sample_seed``)."""
        if len(prompt_ids) == 0:
            # an empty prompt would prefill a fully-masked row and emit a
            # garbage first token — reject it at the door
            raise ValueError("empty prompt")
        if self._beam and temperature > 0:
            raise ValueError("beam search is deterministic; temperature must be 0")
        rid = self._next_id
        self._next_id += 1
        if len(prompt_ids) + max_new_tokens > self.max_len:
            raise ValueError("prompt + budget exceeds max_len")
        if len(prompt_ids) > self.buckets[-1]:
            # auto-extend the bucket ladder (one extra prefill compile) so a
            # long prompt degrades to a compile, not an error
            b = min(_next_pow2(len(prompt_ids)), self.max_len)
            self.buckets = self.buckets + (b,)
        self.pending.append((rid, (list(prompt_ids), max_new_tokens, temperature)))
        self.request_times[rid] = {"submit": time.perf_counter()}
        return rid

    def step(self) -> dict[int, list]:
        """One scheduler turn: sync-and-retire if a retirement is possible,
        admit pending prompts into free slots, dispatch ONE decode chunk
        (without waiting for it). Returns {request_id: tokens} retired at
        this turn's sync (empty on blind turns)."""
        done = self._sync() if self._sync_due() else {}
        self._admit()
        self._tick()
        return done

    def run(self) -> dict[int, list]:
        """Drain the queue; returns all {request_id: generated tokens}."""
        while self.pending or any(s is not None for s in self.slots):
            self.step()
        out, self.finished = self.finished, {}
        return out

    def stats(self) -> dict:
        """Engine telemetry (the serving counterpart of the trainer's
        tokens/sec logging, ref ``simple_train.py:680-694``).

        The old single ``utilization`` number mixed two different wastes, so
        it is split:
          * ``occupancy`` = occupied slot-ticks / scheduled slot-ticks — how
            full the pool is (empty-slot idling; an admission problem);
          * ``efficiency`` = kept tokens / occupied slot-ticks — how much of
            the work done for live requests produced a kept token
            (retired-slot idling inside chunks; a chunk-length problem).
        ``utilization`` (= occupancy x efficiency) stays for continuity.
        Speculative serving counts ROUNDS as ticks, so ``efficiency`` > 1
        measures the per-round speculation gain (up to gamma+1)."""
        ticks = self._n_decode_ticks
        occ = self._n_occupied_ticks
        return {
            "requests_completed": self._n_completed,
            "requests_pending": len(self.pending),
            "slots_occupied": sum(s is not None for s in self.slots),
            "tokens_generated": self._n_generated,
            "decode_chunks": self._chunk_counter,
            "decode_slot_ticks": ticks,
            "occupied_slot_ticks": occ,
            "occupancy": (occ / ticks) if ticks else 0.0,
            "efficiency": (self._n_generated / occ) if occ else 0.0,
            "utilization": (self._n_generated / ticks) if ticks else 0.0,
            "prefill_calls": self._n_prefill_calls,
            "prefill_group_fill": (
                self._n_prefilled / (self._n_prefill_calls or 1)
            ),
            "compiled_prefills": len(self._prefill),
        }

    def warmup_prefills(self, groups=None) -> int:
        """AOT-compile every (prompt-bucket, admission-group) prefill
        signature by EXECUTING each once on an all-padding batch (padding
        rows carry an out-of-range slot index, so every device write is
        scatter-dropped — state-neutral by the same mechanism normal
        partial groups rely on).

        Cold-start elimination for serving: admission-group size depends on
        arrival timing, so bursty traffic can hit a signature that smooth
        traffic never formed — and a cold XLA prefill compile (tens of
        seconds at 1b on this host) then lands mid-traffic. Measured before
        this existed: an 8-deep-burst trace collapsed the continuous
        engine to 42 tok/s with 30 s TTFT p95 purely from mid-run compiles.
        Returns the number of signatures compiled.
        """
        cap = self.n_groups if self._beam else self.max_batch
        if groups is None:
            groups = []
            g = 1
            while g <= cap:
                groups.append(g)
                g *= 2
        oob = self.n_groups if self._beam else self.max_batch
        n = 0
        for bucket in self.buckets:
            w = 2 * bucket + (3 if self._beam else 5)
            for g in groups:
                if g > cap:
                    continue
                packed = np.zeros((g, w), np.float32)
                packed[:, 2 * bucket] = oob
                fn = self._prefill_fn(bucket, g)
                self.cache, self.dstate = fn(
                    self.params, self.cache, self.dstate, jnp.asarray(packed)
                )
                if self._spec:
                    dfn = _make_draft_prefill(self.draft_cfg, bucket, g)
                    self.draft_cache = dfn(
                        self.draft_params, self.draft_cache, jnp.asarray(packed)
                    )
                n += 1
        return n

    # -- internals ---------------------------------------------------------
    def _admit(self):
        if self._beam:
            return self._admit_beam()
        while self.pending:
            free = [i for i in range(self.max_batch) if self.slots[i] is None]
            if not free:
                return
            # take the next FIFO run of same-bucket pending requests (up to
            # the free-slot count) and admit them in one grouped prefill
            bucket = _bucket(len(self.pending[0][1][0]), self.buckets)
            batch = []
            while (
                self.pending
                and len(batch) < len(free)
                and _bucket(len(self.pending[0][1][0]), self.buckets) == bucket
            ):
                batch.append(self.pending.pop(0))
            g_real = len(batch)
            group = 1
            while group < g_real:
                group *= 2
            # one packed upload per group:
            # [ids | mask | slot, t_real, rid, temp, max_new]
            packed = np.zeros((group, 2 * bucket + 5), np.float32)
            packed[:, 2 * bucket] = self.max_batch  # padding rows: OOB -> dropped
            for g, (rid, (prompt, max_new, temperature)) in enumerate(batch):
                t = len(prompt)
                packed[g, bucket - t : bucket] = prompt  # left-pad into bucket
                packed[g, 2 * bucket - t : 2 * bucket] = 1
                packed[g, 2 * bucket] = free[g]
                packed[g, 2 * bucket + 1] = t
                # rid rides a float32 row: wrap at 2^24 (float32-exact
                # ceiling) so sampling keys stay exact; they repeat only
                # after 16.7M requests
                packed[g, 2 * bucket + 2] = rid % (1 << 24)
                packed[g, 2 * bucket + 3] = temperature
                packed[g, 2 * bucket + 4] = max_new
            fn = self._prefill_fn(bucket, group)
            # NO host download: the first token is sampled on device and
            # written into the device slot state; the host learns it at the
            # next sync
            packed = jnp.asarray(packed)
            self.cache, self.dstate = fn(self.params, self.cache, self.dstate, packed)
            if self._spec:
                # the draft pool must hold the prompt K/V too
                dfn = _make_draft_prefill(self.draft_cfg, bucket, group)
                self.draft_cache = dfn(self.draft_params, self.draft_cache, packed)
            self._n_prefill_calls += 1
            self._n_prefilled += g_real
            now = time.perf_counter()
            for g, (rid, (prompt, max_new, temperature)) in enumerate(batch):
                self.slots[free[g]] = _Slot(rid, len(prompt), max_new, temperature)
                self.request_times[rid]["admit"] = now

    def _admit_beam(self):
        """Grouped beam admission: each request takes one free GROUP (a
        block of ``num_beams`` pool rows); its prompt prefills ONCE and is
        broadcast into the block on device."""
        while self.pending:
            free = [g for g in range(self.n_groups) if self.slots[g] is None]
            if not free:
                return
            bucket = _bucket(len(self.pending[0][1][0]), self.buckets)
            batch = []
            while (
                self.pending
                and len(batch) < len(free)
                and _bucket(len(self.pending[0][1][0]), self.buckets) == bucket
            ):
                batch.append(self.pending.pop(0))
            g_real = len(batch)
            group = 1
            while group < g_real:
                group *= 2
            # packed rows: [ids | mask | gslot, t_real, max_new]
            packed = np.zeros((group, 2 * bucket + 3), np.float32)
            packed[:, 2 * bucket] = self.n_groups  # padding rows: OOB -> dropped
            for g, (rid, (prompt, max_new, _temp)) in enumerate(batch):
                t = len(prompt)
                packed[g, bucket - t : bucket] = prompt
                packed[g, 2 * bucket - t : 2 * bucket] = 1
                packed[g, 2 * bucket] = free[g]
                packed[g, 2 * bucket + 1] = t
                packed[g, 2 * bucket + 2] = max_new
            fn = self._prefill_fn(bucket, group)
            self.cache, self.dstate = fn(
                self.params, self.cache, self.dstate, jnp.asarray(packed)
            )
            self._n_prefill_calls += 1
            self._n_prefilled += g_real
            now = time.perf_counter()
            for g, (rid, (prompt, max_new, _temp)) in enumerate(batch):
                self.slots[free[g]] = _Slot(rid, len(prompt), max_new)
                self.request_times[rid]["admit"] = now

    def _prefill_fn(self, bucket: int, group: int):
        key = (bucket, group)
        if key not in self._prefill:
            if self._beam:
                self._prefill[key] = _make_beam_prefill(
                    self.cfg, bucket, group, self.num_beams, self.eos
                )
            else:
                self._prefill[key] = _make_prefill(
                    self.cfg, bucket, group, self._sample_seed, self.eos
                )
        return self._prefill[key]

    def _tick(self):
        """Dispatch one decode chunk over the device slot state WITHOUT
        waiting for it (jax dispatch is async; donated buffers chain)."""
        occupied = [s for s in self.slots if s is not None]
        if not occupied:
            return
        # a slot's generated count after d blind ticks is
        # min(max_new, eos point, known_ngen + d): once known_ngen +
        # dispatched reaches max_new the slot is certainly finished and
        # further ticks would be pure waste
        remaining = [s.max_new - (s.known_ngen + s.dispatched) for s in occupied]
        if max(remaining) <= 0:
            return  # everything occupied is guaranteed finished (sync next)
        # drain mode: queue empty and the longest-remaining slot spans the
        # long chunk, so no admission is delayed and no tick runs all-idle
        use_long = not self.pending and max(remaining) >= self.drain_chunk
        decode = self._decode_long if use_long else self._decode
        n = self.drain_chunk if use_long else self.decode_chunk
        if self._spec:
            # one spec "tick" = one draft-propose/target-verify round deciding
            # 1..gamma+1 tokens per slot; `dispatched` counts rounds, which
            # keeps the min-progress bound above (>=1 token/round) valid
            self.cache, self.draft_cache, self.dstate = decode(
                self.params, self.draft_params, self.cache, self.draft_cache,
                self.dstate,
            )
        else:
            self.cache, self.dstate = decode(self.params, self.cache, self.dstate)
        self._chunk_counter += 1
        self._n_decode_ticks += n * self.max_batch
        self._n_occupied_ticks += n * len(occupied) * self.num_beams
        for s in occupied:
            s.dispatched += n

    def _sync_due(self) -> bool:
        """A host sync is worthwhile only when it could retire a slot:
        (a) some slot has certainly exhausted its budget, or (b) EOS is in
        play and some slot has run blind for ``eos_sync_ticks`` — an early
        exit may be sitting unnoticed."""
        occupied = [s for s in self.slots if s is not None]
        if not occupied:
            return False
        # spec rounds decide up to gamma+1 tokens, so a slot may be done
        # after max_new/(gamma+1) rounds — sync when retirement is POSSIBLE
        mult = (self.spec_gamma + 1) if self._spec else 1
        if any(s.known_ngen + s.dispatched * mult >= s.max_new for s in occupied):
            return True
        return self.eos is not None and any(
            s.dispatched >= self.eos_sync_ticks for s in occupied
        )

    def _sync(self) -> dict[int, list]:
        """ONE packed device->host transfer; refresh the host's view of
        every slot and retire the finished ones."""
        if self._beam:
            return self._sync_beam()
        snap = np.asarray(_snapshot(self.dstate))  # blocks on queued chunks
        done = {}
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            act, ngen = bool(snap[i, 0]), int(snap[i, 1])
            self._n_generated += ngen - slot.known_ngen
            slot.known_ngen, slot.dispatched = ngen, 0
            if not act:
                out = [int(t) for t in snap[i, 2 : 2 + min(ngen, slot.max_new)]]
                done[slot.request_id] = out
                self.finished[slot.request_id] = out
                self.request_times[slot.request_id]["done"] = time.perf_counter()
                self.slots[i] = None
                self._n_completed += 1
        return done

    def _sync_beam(self) -> dict[int, list]:
        """Beam retirement: ONE packed transfer; a retiring group returns its
        argmax-score beam (ties -> first, i.e. row 0 after the score-sorted
        permutation) EOS-padded to ``max_new`` — exactly ``beam_generate``'s
        fixed-length best-beam output (``eval/generate.py:186-187``)."""
        k = self.num_beams
        snap = np.asarray(_snapshot_beam(self.dstate))  # blocks queued chunks
        scores = snap[:, 2].view(np.float32)
        done = {}
        for g, slot in enumerate(self.slots):
            if slot is None:
                continue
            act, ngen = bool(snap[g * k, 0]), int(snap[g * k, 1])
            # per-beam tokens count toward generated work
            self._n_generated += (ngen - slot.known_ngen) * k
            slot.known_ngen, slot.dispatched = ngen, 0
            if not act:
                best = g * k + int(np.argmax(scores[g * k : (g + 1) * k]))
                n = min(ngen, slot.max_new)
                out = [int(t) for t in snap[best, 3 : 3 + n]]
                if self.eos is not None:
                    out += [self.eos] * (slot.max_new - n)
                done[slot.request_id] = out
                self.finished[slot.request_id] = out
                self.request_times[slot.request_id]["done"] = time.perf_counter()
                self.slots[g] = None
                self._n_completed += 1
        return done


def main(argv=None):
    """Serving CLI: JSONL requests in, JSONL completions out (streamed as
    they finish — the user-facing face of the continuous-batching engine).

    Request lines: {"prompt": "text"} or {"prompt_ids": [...]}, optional
    "id", "max_new_tokens", "temperature". Results keep request order ids:
    {"id": ..., "token_ids": [...], "text": ...}.

        python -m sow_tpu.eval.serve --base-model llama_7b \
            --checkpoint ./trained --input requests.jsonl
    """
    import argparse
    import json
    import sys

    p = argparse.ArgumentParser()
    p.add_argument("--base-model", type=str, default="llama_test")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="SoW checkpoint dir (keep-mode surgery at --rank); "
                        "omit for a randomly initialized model (demo)")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--tokenizer", type=str, default="byte")
    p.add_argument("--input", type=str, default="-",
                   help="JSONL request file, '-' for stdin")
    p.add_argument("--pool", type=int, default=8)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--int8-kv-cache", action="store_true")
    p.add_argument("--decode-chunk", type=int, default=16)
    p.add_argument("--mesh-data", type=int, default=-1)
    p.add_argument("--mesh-fsdp", type=int, default=1)
    p.add_argument("--mesh-model", type=int, default=1)
    # speculative serving: a smaller same-tokenizer draft model; outputs stay
    # token-identical to the plain greedy engine
    p.add_argument("--draft-model", type=str, default=None)
    p.add_argument("--draft-checkpoint", type=str, default=None)
    p.add_argument("--draft-arch", choices=("linear", "sow"), default="linear",
                   help="template for --draft-checkpoint (sow = pretrain-style "
                        "blank SoW layers, folded to dense after restore)")
    p.add_argument("--spec-gamma", type=int, default=4)
    args = p.parse_args(argv)

    from sow_tpu.data.byte_tokenizer import load_tokenizer_or_byte
    from sow_tpu.models import get_config, init_params

    # "byte" -> builtin; an explicit HF name must load or RAISE (a silent
    # byte fallback would decode with the wrong vocabulary)
    if args.tokenizer in (None, "byte"):
        tok = load_tokenizer_or_byte("byte")
    else:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer)

    cfg = get_config(args.base_model)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if args.checkpoint:
        from sow_tpu.checkpoint import latest_checkpoint, restore_params
        from sow_tpu.models import llama as _ll
        from sow_tpu.nn import SoWConfig, prepare_sow

        params = prepare_sow(
            params,
            SoWConfig(target_modules=_ll.LLAMA_FINETUNE_TARGET_MODULES,
                      rank=args.rank, decompose="keep"),
            jax.random.PRNGKey(1),
        )
        params, _ = restore_params(
            params, latest_checkpoint(args.checkpoint) or args.checkpoint
        )

    mesh = None
    if args.mesh_fsdp * args.mesh_model > 1 or args.mesh_data > 1:
        from sow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, fsdp=args.mesh_fsdp,
                         model=args.mesh_model)

    draft_params = draft_cfg = None
    if args.draft_model:
        from sow_tpu.models import llama as _ll

        draft_cfg = get_config(args.draft_model)
        draft_params = init_params(jax.random.PRNGKey(2), draft_cfg, dtype=jnp.bfloat16)
        if args.draft_arch == "sow":
            from sow_tpu.nn import SoWConfig, prepare_sow

            draft_params = prepare_sow(
                draft_params,
                SoWConfig(target_modules=_ll.LLAMA_TARGET_MODULES,
                          rank=args.rank, decompose=None),
                jax.random.PRNGKey(3),
            )
        if args.draft_checkpoint:
            from sow_tpu.checkpoint import latest_checkpoint, restore_params

            draft_params, _ = restore_params(
                draft_params,
                latest_checkpoint(args.draft_checkpoint) or args.draft_checkpoint,
            )
        if args.draft_arch == "sow":
            draft_params = _ll.merge_sow_to_dense(draft_params)
            draft_params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), draft_params
            )

    srv = GenerationServer(
        params, cfg, max_batch=args.pool, max_len=args.max_len,
        eos_token_id=tok.eos_token_id,
        cache_dtype=jnp.int8 if args.int8_kv_cache else None,
        decode_chunk=args.decode_chunk, mesh=mesh,
        draft_params=draft_params, draft_cfg=draft_cfg,
        spec_gamma=args.spec_gamma,
    )

    stream = sys.stdin if args.input == "-" else open(args.input)
    rid_to_user = {}
    with stream:
        for line in stream:
            line = line.strip()
            if not line:
                continue
            req = json.loads(line)
            # explicit membership check: an empty prompt_ids list must be
            # rejected by submit(), not fall through to a KeyError on "prompt"
            if "prompt_ids" in req:
                ids = req["prompt_ids"]
            else:
                ids = tok(req["prompt"])["input_ids"]
            rid = srv.submit(
                ids,
                max_new_tokens=int(req.get("max_new_tokens", args.max_new_tokens)),
                temperature=float(req.get("temperature", args.temperature)),
            )
            rid_to_user[rid] = req.get("id", rid)
            # under queue pressure, advance the engine between reads so
            # completions stream out while ingest continues
            while len(srv.pending) >= srv.max_batch:
                for got_rid, toks in srv.step().items():
                    _emit(tok, rid_to_user, got_rid, toks)
    while srv.pending or any(s is not None for s in srv.slots):
        for got_rid, toks in srv.step().items():
            _emit(tok, rid_to_user, got_rid, toks)
    # engine telemetry on stderr (stdout stays pure JSONL results)
    print(json.dumps({"stats": srv.stats()}), file=sys.stderr)


def _emit(tok, rid_to_user, rid, token_ids):
    import json
    import sys

    text = tok.decode(token_ids, skip_special_tokens=True)
    print(json.dumps({"id": rid_to_user[rid], "token_ids": token_ids, "text": text}))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
