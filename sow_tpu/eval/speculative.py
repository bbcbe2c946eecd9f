"""Speculative decoding: a small draft model proposes, the target verifies.

Beyond-reference capability (the reference's eval decodes autoregressively
through HF ``model.generate``, ``commonsense_evaluate.py:79-85``): a draft
model proposes ``gamma`` greedy tokens, the target scores all of them in ONE
forward, and the longest matching prefix plus one target "bonus" token is
accepted — so each target forward decides between 1 and ``gamma + 1`` tokens.
Greedy speculative decoding is **lossless**: every emitted token equals what
target-only greedy decoding would emit (pinned by tests).

TPU-native design points:
  * The whole generation — draft scan, verify pass, accept logic — lives in
    ONE jitted ``lax.while_loop``; the host dispatches once per request
    batch, which matters on a tunneled chip with a ~2 ms RPC floor.
  * Both KV caches are static-shaped ``(B, kvh, t0 + max_new + gamma, hd)``
    buffers. Rows advance unevenly (each accepts its own prefix length), so
    writes land at per-row offsets; rejected proposals leave stale cache
    slots that are *provably never read*: a query at generated offset
    ``g-1+s`` may only attend generated slots ``<= g-1+s``, all of which are
    rewritten by the same verify block before attention runs.
  * Static shapes throughout — ``gamma`` and ``max_new_tokens`` are trace
    constants; per-row raggedness is masks + gathers, never dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from sow_tpu.models import llama as llama_lib


def _spec_forward(
    params: dict,
    tokens: jax.Array,  # (B, S) — per-row block of tokens to ingest
    cfg: llama_lib.LlamaConfig,
    cache: list[dict],
    t0: int,  # prompt region size (generated region starts at cache slot t0)
    prompt_mask: jax.Array,  # (B, t0) — 1 for real (non-pad) prompt slots
    n_real: jax.Array,  # (B,) true prompt lengths (RoPE offset)
    g0: jax.Array,  # (B,) generated index of tokens[:, 0]
) -> tuple[jax.Array, list[dict]]:
    """Forward ``tokens[:, s]`` at per-row generated index ``g0[b] + s``
    (cache slot ``t0 + g0[b] + s``), attending to the real prompt plus
    generated slots ``<= g0[b] + s``. Returns (logits (B, S, V), cache).

    Generalizes ``forward_decode_ragged`` (S=1, no prompt/generated split) to
    the multi-token verify block speculative decoding needs."""
    b, s_len = tokens.shape
    max_len = cache[0]["k"].shape[2]
    bidx = jnp.arange(b)

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (max_len,), 0)  # (max_len,)
    prompt_ok = jnp.zeros((b, max_len), bool).at[:, :t0].set(prompt_mask.astype(bool))
    # query s of row b attends generated slot j-t0 iff j-t0 <= g0[b] + s
    gen_off = k_pos[None, None, :] - t0  # (1, 1, max_len)
    q_gen = g0[:, None, None] + jnp.arange(s_len)[None, :, None]  # (B, S, 1)
    gen_ok = (gen_off >= 0) & (gen_off <= q_gen)
    mask = (prompt_ok[:, None, :] | gen_ok)[:, None]  # (B, 1, S, max_len)

    write_pos = t0 + g0[:, None] + jnp.arange(s_len)[None, :]  # (B, S)
    positions = n_real[:, None] + g0[:, None] + jnp.arange(s_len)  # (B, S) RoPE

    def write(buf, val):
        # val: (B, kvh, S[, hd]) -> buf slots write_pos[b, s]
        val = val.astype(buf.dtype)
        if buf.nbytes <= llama_lib._WHERE_WRITE_MAX_BYTES:
            # broadcast select (TPU scatters serialize; see forward_decode_ragged)
            s_idx = k_pos[None, :] - t0 - g0[:, None]  # (B, max_len)
            valid = (s_idx >= 0) & (s_idx < s_len)
            gidx = jnp.clip(s_idx, 0, s_len - 1)[:, None, :]  # (B, 1, max_len)
            if buf.ndim == 4:
                gathered = jnp.take_along_axis(val, gidx[..., None], axis=2)
                return jnp.where(valid[:, None, :, None], gathered, buf)
            gathered = jnp.take_along_axis(val, gidx, axis=2)
            return jnp.where(valid[:, None, :], gathered, buf)
        moved = jnp.moveaxis(val, 2, 1)  # (B, S, kvh[, hd])
        return buf.at[bidx[:, None], :, write_pos].set(moved)

    return llama_lib._cached_forward(params, tokens, cfg, cache, positions, mask, write)


@partial(
    jax.jit,
    static_argnames=(
        "target_cfg", "draft_cfg", "max_new_tokens", "gamma", "eos_token_id",
        "cache_dtype",
    ),
)
def speculative_generate(
    target_params: dict,
    draft_params: dict,
    input_ids: jax.Array,  # (B, T0), left-padded
    attention_mask: jax.Array,  # (B, T0)
    target_cfg: llama_lib.LlamaConfig,
    draft_cfg: llama_lib.LlamaConfig,
    max_new_tokens: int,
    gamma: int = 4,
    eos_token_id: Optional[int] = None,
    cache_dtype=None,
) -> tuple[jax.Array, dict]:
    """Greedy speculative decode; returns (tokens (B, max_new_tokens),
    stats). ``stats["rounds"]`` is the number of verify passes and
    ``stats["tokens"]`` the total non-padding tokens decided — their ratio is
    the per-round acceptance (1 = no speedup, gamma+1 = maximal).

    Draft and target must share a tokenizer (same vocab ids); architectures
    may differ freely. Output is token-identical to
    ``greedy_generate(target_params, ...)`` regardless of draft quality."""
    b, t0 = input_ids.shape
    max_len = t0 + max_new_tokens + gamma  # verify may overshoot by gamma
    fill = eos_token_id if eos_token_id is not None else 0

    def prefill(params, cfg):
        cache = llama_lib.init_cache(
            cfg, b, max_len, dtype=cache_dtype or params["embed"]["embedding"].dtype
        )
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        key_mask = jnp.concatenate(
            [attention_mask, jnp.ones((b, max_len - t0), attention_mask.dtype)], axis=1
        )
        logits, cache = llama_lib.forward_with_cache(
            params, input_ids, cfg, cache, 0, positions, key_mask
        )
        return logits[:, -1], cache

    t_last, t_cache = prefill(target_params, target_cfg)
    _, d_cache = prefill(draft_params, draft_cfg)

    n_real = attention_mask.sum(axis=1).astype(jnp.int32)
    prompt_mask = attention_mask
    first = jnp.argmax(t_last.astype(jnp.float32), axis=-1).astype(jnp.int32)

    out = jnp.full((b, max_new_tokens), fill, jnp.int32)
    out = out.at[:, 0].set(first)
    finished0 = (first == eos_token_id) if eos_token_id is not None else jnp.zeros((b,), bool)
    finished0 = finished0 | (max_new_tokens <= 1)

    def greedy(logits):
        return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)

    def cond(carry):
        _, _, g, _, finished, _, _, _ = carry
        return ~jnp.all(finished | (g >= max_new_tokens))

    def body(carry):
        t_cache, d_cache, g, pending, finished, out, rounds, accepted = carry
        g0 = g - 1  # generated index of `pending` (decided, not yet ingested)

        # -- draft proposes gamma tokens sequentially ------------------------
        def draft_step(carry, i):
            cache, tok = carry
            logits, cache = _spec_forward(
                draft_params, tok[:, None], draft_cfg, cache, t0,
                prompt_mask, n_real, g0 + i,
            )
            return (cache, greedy(logits[:, 0])), greedy(logits[:, 0])

        (d_cache, _), proposals = jax.lax.scan(
            draft_step, (d_cache, pending), jnp.arange(gamma)
        )
        proposals = jnp.moveaxis(proposals, 0, 1)  # (B, gamma)

        # -- target verifies the whole block in one forward ------------------
        block = jnp.concatenate([pending[:, None], proposals], axis=1)  # (B, gamma+1)
        t_logits, t_cache = _spec_forward(
            target_params, block, target_cfg, t_cache, t0, prompt_mask, n_real, g0
        )
        y = greedy(t_logits)  # (B, gamma+1): target's choice after each block token

        # accept the longest prefix where draft == target, plus bonus y[:, a]
        match = proposals == y[:, :gamma]  # (B, gamma)
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # (B,)

        idx = jnp.arange(gamma + 1)[None, :]
        bonus = jnp.take_along_axis(y, a[:, None], axis=1)  # (B, 1)
        new_toks = jnp.where(idx < a[:, None], jnp.pad(proposals, ((0, 0), (0, 1))), bonus)

        # decided count: a+1, truncated at the first EOS and the budget
        count = a + 1
        if eos_token_id is not None:
            is_eos = (new_toks == eos_token_id) & (idx < count[:, None])
            first_eos = jnp.argmax(is_eos, axis=1)  # 0 when none
            count = jnp.where(is_eos.any(axis=1), first_eos + 1, count)
        count = jnp.minimum(count, max_new_tokens - g)
        count = jnp.where(finished, 0, count)

        # write decided tokens into the output at per-row offsets
        col = jnp.arange(max_new_tokens)[None, :]
        rel = col - g[:, None]
        take = jnp.take_along_axis(new_toks, jnp.clip(rel, 0, gamma), axis=1)
        out = jnp.where((rel >= 0) & (rel < count[:, None]), take, out)

        new_pending = jnp.take_along_axis(
            new_toks, jnp.maximum(count - 1, 0)[:, None], axis=1
        )[:, 0]
        pending = jnp.where(count > 0, new_pending, pending)
        g = g + count
        if eos_token_id is not None:
            finished = finished | ((count > 0) & (pending == eos_token_id))
        finished = finished | (g >= max_new_tokens)
        rounds = rounds + 1
        accepted = accepted + jnp.sum(jnp.where(count > 0, a, 0))
        return (t_cache, d_cache, g, pending, finished, out, rounds, accepted)

    init = (
        t_cache, d_cache, jnp.ones((b,), jnp.int32), first, finished0, out,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )
    (_, _, g, _, _, out, rounds, accepted) = jax.lax.while_loop(cond, body, init)
    stats = {
        "rounds": rounds,
        "tokens": jnp.sum(g),
        "accepted": accepted,
        "tokens_per_round": jnp.sum(g - 1) / jnp.maximum(rounds * b, 1),
    }
    return out, stats


def _residual_sample(p_row: jax.Array, q_row: jax.Array, key: jax.Array) -> jax.Array:
    """Sample from ``norm(max(p - q, 0))`` — the rejection-sampling residual
    (falls back to ``p`` when the residual underflows, e.g. p == q).
    ``p_row``/``q_row``: (B, V) probabilities; returns (B,) int32."""
    r = jnp.maximum(p_row - q_row, 0.0)
    tiny = jnp.sum(r, axis=-1, keepdims=True) < 1e-6
    r = jnp.where(tiny, p_row, r)
    gumbel = jax.random.gumbel(key, r.shape)
    return jnp.argmax(jnp.log(jnp.maximum(r, 1e-30)) + gumbel, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "target_cfg", "draft_cfg", "max_new_tokens", "gamma", "eos_token_id",
        "cache_dtype",
    ),
)
def speculative_sample(
    target_params: dict,
    draft_params: dict,
    input_ids: jax.Array,  # (B, T0), left-padded
    attention_mask: jax.Array,  # (B, T0)
    target_cfg: llama_lib.LlamaConfig,
    draft_cfg: llama_lib.LlamaConfig,
    max_new_tokens: int,
    key: jax.Array,
    gamma: int = 4,
    temperature: float = 1.0,
    eos_token_id: Optional[int] = None,
    cache_dtype=None,
) -> tuple[jax.Array, dict]:
    """Rejection-sampling speculative decode at ``temperature`` > 0.

    The draft SAMPLES gamma proposals from q = softmax(draft/T); the target
    accepts proposal d with probability min(1, p(d)/q(d)) and on the first
    rejection resamples from the residual norm(max(p - q, 0)) — the
    Leviathan/Chen scheme, which makes the OUTPUT DISTRIBUTION exactly the
    target's sampling distribution regardless of draft quality (pinned by a
    unit-level Monte Carlo test of the accept/residual step and a
    temperature->0 determinism test against greedy decoding). Same cache
    and raggedness machinery as ``speculative_generate``."""
    b, t0 = input_ids.shape
    max_len = t0 + max_new_tokens + gamma
    fill = eos_token_id if eos_token_id is not None else 0
    inv_t = 1.0 / jnp.maximum(temperature, 1e-6)  # traced: no recompile per T

    def prefill(params, cfg):
        cache = llama_lib.init_cache(
            cfg, b, max_len, dtype=cache_dtype or params["embed"]["embedding"].dtype
        )
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        key_mask = jnp.concatenate(
            [attention_mask, jnp.ones((b, max_len - t0), attention_mask.dtype)], axis=1
        )
        logits, cache = llama_lib.forward_with_cache(
            params, input_ids, cfg, cache, 0, positions, key_mask
        )
        return logits[:, -1], cache

    t_last, t_cache = prefill(target_params, target_cfg)
    _, d_cache = prefill(draft_params, draft_cfg)

    n_real = attention_mask.sum(axis=1).astype(jnp.int32)
    prompt_mask = attention_mask

    key, k0 = jax.random.split(key)
    p0 = jax.nn.softmax(t_last.astype(jnp.float32) * inv_t, axis=-1)
    first = jnp.argmax(
        jnp.log(jnp.maximum(p0, 1e-30)) + jax.random.gumbel(k0, p0.shape), axis=-1
    ).astype(jnp.int32)

    out = jnp.full((b, max_new_tokens), fill, jnp.int32)
    out = out.at[:, 0].set(first)
    finished0 = (first == eos_token_id) if eos_token_id is not None else jnp.zeros((b,), bool)
    finished0 = finished0 | (max_new_tokens <= 1)

    def cond(carry):
        _, _, g, _, finished, _, _, _, _ = carry
        return ~jnp.all(finished | (g >= max_new_tokens))

    def body(carry):
        t_cache, d_cache, g, pending, finished, out, rounds, accepted, key = carry
        g0 = g - 1
        key, k_draft, k_u, k_res = jax.random.split(key, 4)

        # -- draft samples gamma proposals, carrying its full dists ----------
        def draft_step(carry, i):
            cache, tok = carry
            logits, cache = _spec_forward(
                draft_params, tok[:, None], draft_cfg, cache, t0,
                prompt_mask, n_real, g0 + i,
            )
            q = jax.nn.softmax(logits[:, 0].astype(jnp.float32) * inv_t, axis=-1)
            gk = jax.random.fold_in(k_draft, i)
            nxt = jnp.argmax(
                jnp.log(jnp.maximum(q, 1e-30)) + jax.random.gumbel(gk, q.shape),
                axis=-1,
            ).astype(jnp.int32)
            return (cache, nxt), (nxt, q)

        (d_cache, _), (proposals, q_all) = jax.lax.scan(
            draft_step, (d_cache, pending), jnp.arange(gamma)
        )
        proposals = jnp.moveaxis(proposals, 0, 1)  # (B, gamma)
        q_all = jnp.moveaxis(q_all, 0, 1)  # (B, gamma, V)

        # -- target scores the block once ------------------------------------
        block = jnp.concatenate([pending[:, None], proposals], axis=1)
        t_logits, t_cache = _spec_forward(
            target_params, block, target_cfg, t_cache, t0, prompt_mask, n_real, g0
        )
        p_all = jax.nn.softmax(t_logits.astype(jnp.float32) * inv_t, axis=-1)  # (B, gamma+1, V)

        # -- accept with prob min(1, p/q); a = accepted prefix length --------
        p_sel = jnp.take_along_axis(
            p_all[:, :gamma], proposals[..., None], axis=-1
        )[..., 0]
        q_sel = jnp.take_along_axis(q_all, proposals[..., None], axis=-1)[..., 0]
        u = jax.random.uniform(k_u, (b, gamma))
        acc = u * jnp.maximum(q_sel, 1e-30) < p_sel
        a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)  # (B,)

        # -- token at position a: residual if a<gamma, else bonus from p -----
        # padding q with a zero slice at index gamma unifies both cases:
        # residual(p_gamma, 0) = p_gamma
        q_pad = jnp.concatenate([q_all, jnp.zeros_like(q_all[:, :1])], axis=1)
        p_a = jnp.take_along_axis(p_all, a[:, None, None], axis=1)[:, 0]
        q_a = jnp.take_along_axis(q_pad, a[:, None, None], axis=1)[:, 0]
        resampled = _residual_sample(p_a, q_a, k_res)

        idx = jnp.arange(gamma + 1)[None, :]
        new_toks = jnp.where(
            idx < a[:, None], jnp.pad(proposals, ((0, 0), (0, 1))), resampled[:, None]
        )

        count = a + 1
        if eos_token_id is not None:
            is_eos = (new_toks == eos_token_id) & (idx < count[:, None])
            first_eos = jnp.argmax(is_eos, axis=1)
            count = jnp.where(is_eos.any(axis=1), first_eos + 1, count)
        count = jnp.minimum(count, max_new_tokens - g)
        count = jnp.where(finished, 0, count)

        col = jnp.arange(max_new_tokens)[None, :]
        rel = col - g[:, None]
        take = jnp.take_along_axis(new_toks, jnp.clip(rel, 0, gamma), axis=1)
        out = jnp.where((rel >= 0) & (rel < count[:, None]), take, out)

        new_pending = jnp.take_along_axis(
            new_toks, jnp.maximum(count - 1, 0)[:, None], axis=1
        )[:, 0]
        pending = jnp.where(count > 0, new_pending, pending)
        g = g + count
        if eos_token_id is not None:
            finished = finished | ((count > 0) & (pending == eos_token_id))
        finished = finished | (g >= max_new_tokens)
        rounds = rounds + 1
        accepted = accepted + jnp.sum(jnp.where(count > 0, a, 0))
        return (t_cache, d_cache, g, pending, finished, out, rounds, accepted, key)

    init = (
        t_cache, d_cache, jnp.ones((b,), jnp.int32), first, finished0, out,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), key,
    )
    (_, _, g, _, _, out, rounds, accepted, _) = jax.lax.while_loop(cond, body, init)
    stats = {
        "rounds": rounds,
        "tokens": jnp.sum(g),
        "accepted": accepted,
        "tokens_per_round": jnp.sum(g - 1) / jnp.maximum(rounds * b, 1),
    }
    return out, stats
