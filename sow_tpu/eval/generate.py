"""Autoregressive generation: greedy + beam search with static KV cache.

Replaces the reference's ``model.generate(num_beams=4, max_new_tokens=32)``
(``commonsense_evaluate.py:79-85``). TPU-native: left-padded prompts so the
last prompt token sits at a uniform index, a fixed-size cache, and a
``lax.scan`` decode loop — everything static-shaped and jitted once per
(batch, prompt_len, max_new) signature.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.models import llama as llama_lib


def left_pad(sequences: list[list[int]], pad_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Left-pad variable-length prompts to a common length (HF decoder
    convention); returns (input_ids, attention_mask)."""
    t0 = max(len(s) for s in sequences)
    ids = np.full((len(sequences), t0), pad_id, dtype=np.int32)
    mask = np.zeros((len(sequences), t0), dtype=np.int32)
    for i, s in enumerate(sequences):
        if len(s):
            ids[i, t0 - len(s):] = s
            mask[i, t0 - len(s):] = 1
    return ids, mask


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "eos_token_id", "cache_dtype"))
def greedy_generate(
    params: dict,
    input_ids: jax.Array,  # (B, T0), left-padded
    attention_mask: jax.Array,  # (B, T0)
    cfg: llama_lib.LlamaConfig,
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
    cache_dtype=None,  # e.g. jnp.int8 for the quantized KV cache
) -> jax.Array:
    """Returns generated token ids ``(B, max_new_tokens)`` (eos-padded)."""
    b, t0 = input_ids.shape
    max_len = t0 + max_new_tokens
    cache = llama_lib.init_cache(
        cfg, b, max_len, dtype=cache_dtype or params["embed"]["embedding"].dtype
    )

    # RoPE positions: pads excluded (left padding -> cumsum of mask - 1).
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    key_mask = jnp.concatenate(
        [attention_mask, jnp.ones((b, max_new_tokens), attention_mask.dtype)], axis=1
    )

    logits, cache = llama_lib.forward_with_cache(
        params, input_ids, cfg, cache, 0, positions, key_mask
    )
    next_tok = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(jnp.int32)
    n_real = attention_mask.sum(axis=1).astype(jnp.int32)  # (B,)
    finished = jnp.zeros((b,), bool)
    if eos_token_id is not None:
        finished = next_tok == eos_token_id

    def step(carry, t):
        cache, tok, pos_next, finished = carry
        logits, cache = llama_lib.forward_with_cache(
            params, tok[:, None], cfg, cache, t0 + t, pos_next[:, None], key_mask
        )
        new_tok = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(jnp.int32)
        if eos_token_id is not None:
            new_tok = jnp.where(finished, eos_token_id, new_tok)
            finished = finished | (new_tok == eos_token_id)
        return (cache, new_tok, pos_next + 1, finished), tok

    (cache, last, _, _), toks = jax.lax.scan(
        step, (cache, next_tok, n_real, finished), jnp.arange(max_new_tokens - 1)
    )
    toks = jnp.moveaxis(toks, 0, 1)  # (B, max_new-1)
    return jnp.concatenate([toks, last[:, None]], axis=1)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "num_beams", "eos_token_id", "cache_dtype"),
)
def beam_generate(
    params: dict,
    input_ids: jax.Array,  # (B, T0), left-padded
    attention_mask: jax.Array,
    cfg: llama_lib.LlamaConfig,
    max_new_tokens: int,
    num_beams: int = 4,
    eos_token_id: Optional[int] = None,
    cache_dtype=None,  # e.g. jnp.int8 for the quantized KV cache
) -> jax.Array:
    """Beam search (length_penalty=1, HF defaults otherwise); returns the best
    beam's tokens ``(B, max_new_tokens)``. The KV cache lives at (B*beams) and
    is gathered on beam reorder each step."""
    b, t0 = input_ids.shape
    k = num_beams
    max_len = t0 + max_new_tokens
    neg = jnp.float32(-1e9)

    def flat(x):  # (B, k, ...) -> (B*k, ...)
        return x.reshape((b * k,) + x.shape[2:])

    ids_k = flat(jnp.broadcast_to(input_ids[:, None], (b, k, t0)))
    mask_k = flat(jnp.broadcast_to(attention_mask[:, None], (b, k, t0)))
    cache = llama_lib.init_cache(
        cfg, b * k, max_len, dtype=cache_dtype or params["embed"]["embedding"].dtype
    )
    positions = jnp.maximum(jnp.cumsum(mask_k, axis=1) - 1, 0)
    key_mask = jnp.concatenate(
        [mask_k, jnp.ones((b * k, max_new_tokens), mask_k.dtype)], axis=1
    )

    logits, cache = llama_lib.forward_with_cache(
        params, ids_k, cfg, cache, 0, positions, key_mask
    )
    logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)  # (B*k, V)
    vocab = logp.shape[-1]

    # First expansion: all beams identical -> take top-k from beam 0 only.
    logp0 = logp.reshape(b, k, vocab)[:, 0]
    scores, first_tok = jax.lax.top_k(logp0, k)  # (B, k)
    tokens = jnp.zeros((b, k, max_new_tokens), jnp.int32)
    tokens = tokens.at[:, :, 0].set(first_tok)
    finished = (
        (first_tok == eos_token_id) if eos_token_id is not None else jnp.zeros((b, k), bool)
    )
    pos_next = flat(jnp.broadcast_to(attention_mask.sum(1).astype(jnp.int32)[:, None], (b, k)))

    def step(carry, t):
        cache, tokens, scores, finished, pos_next = carry
        cur = tokens.reshape(b * k, max_new_tokens)[
            jnp.arange(b * k), jnp.broadcast_to(t - 1, (b * k,))
        ]
        logits, cache = llama_lib.forward_with_cache(
            params, cur[:, None], cfg, cache, t0 + t - 1, pos_next[:, None], key_mask
        )
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1).reshape(b, k, vocab)
        if eos_token_id is not None:
            # finished beams only extend with eos at no cost
            eos_only = jnp.full((vocab,), neg).at[eos_token_id].set(0.0)
            logp = jnp.where(finished[..., None], eos_only[None, None], logp)
        cand = scores[..., None] + logp  # (B, k, V)
        new_scores, idx = jax.lax.top_k(cand.reshape(b, k * vocab), k)
        beam_idx = idx // vocab  # (B, k)
        tok_idx = (idx % vocab).astype(jnp.int32)

        # reorder beam state
        tokens = jnp.take_along_axis(tokens, beam_idx[..., None], axis=1)
        tokens = tokens.at[:, :, t].set(tok_idx)
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        if eos_token_id is not None:
            finished = finished | (tok_idx == eos_token_id)

        flat_idx = (jnp.arange(b)[:, None] * k + beam_idx).reshape(b * k)

        def reorder(c):
            # Only the GENERATED suffix differs between beams: the prompt
            # region [0, t0) is written once at prefill, identically for all
            # beams of a batch item, and beam permutations stay within the
            # item — so gathering it is a no-op. Reordering just the
            # [t0, t0+max_new) slice cuts the per-step copy by
            # t0/max_new (~8x at the eval shapes; the full-cache gather was
            # the round-1 review's beam-decode bottleneck). Position is
            # axis 2 of both the (B*k, kv_heads, max_len, head_dim) value
            # buffers and the (B*k, kv_heads, max_len) int8 scale sidecars.
            return c.at[:, :, t0:].set(c[:, :, t0:][flat_idx])

        cache = [{name: reorder(buf) for name, buf in c.items()} for c in cache]
        pos_next = pos_next[flat_idx] + 1
        return (cache, tokens, new_scores, finished, pos_next), None

    # First scan step (t=1) feeds the t=0 token, whose RoPE position is the
    # prompt's real length n_real — pos_next starts there.
    (cache, tokens, scores, finished, _), _ = jax.lax.scan(
        step,
        (cache, tokens, scores, finished, pos_next),
        jnp.arange(1, max_new_tokens),
    )
    best = jnp.argmax(scores, axis=1)
    return tokens[jnp.arange(b), best]
