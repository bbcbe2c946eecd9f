"""Generation tests: KV-cache greedy vs full-recompute reference, padding
invariance, and beam-search properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.eval.generate import beam_generate, greedy_generate, left_pad
from sow_tpu.models import forward, get_config, init_params

CFG = get_config("llama_test")
KEY = jax.random.PRNGKey(0)
PARAMS = init_params(KEY, CFG)


def reference_greedy(params, ids, steps):
    """No-cache greedy: full forward each step (slow but trivially correct)."""
    out = []
    cur = ids
    for _ in range(steps):
        logits = forward(params, cur, CFG)
        nxt = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(jnp.int32)
        out.append(nxt)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    return jnp.stack(out, axis=1)


def seq_logprob(params, prompt_ids, prompt_mask, gen):
    """Sum log p(gen | prompt) under the model (full forward)."""
    full = jnp.concatenate([prompt_ids, gen], axis=1)
    mask = jnp.concatenate([prompt_mask, jnp.ones_like(gen)], axis=1)
    logits = forward(params, full, CFG, attention_mask=mask)
    t0 = prompt_ids.shape[1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    total = 0.0
    for t in range(gen.shape[1]):
        total = total + jnp.take_along_axis(lp[:, t0 - 1 + t], gen[:, t][:, None], axis=-1)[:, 0]
    return total


class TestGreedy:
    def test_matches_no_cache_reference(self):
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        got = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=6)
        want = reference_greedy(PARAMS, ids, 6)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_left_padding_invariance(self):
        base = [[5, 6, 7], [10, 11, 12, 13, 14]]
        ids, mask = left_pad(base, pad_id=0)
        got = greedy_generate(PARAMS, jnp.asarray(ids), jnp.asarray(mask), CFG, max_new_tokens=5)
        # row 1 has no padding: compare against unpadded decode
        want = reference_greedy(PARAMS, jnp.asarray([base[1]], dtype=jnp.int32), 5)
        np.testing.assert_array_equal(np.asarray(got[1:2]), np.asarray(want))

    def test_eos_freezes_row(self):
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        free = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=8)
        eos = int(free[0, 2])  # pretend the 3rd generated token is EOS
        got = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=8, eos_token_id=eos)
        np.testing.assert_array_equal(np.asarray(got[0, :3]), np.asarray(free[0, :3]))
        assert np.all(np.asarray(got[0, 3:]) == eos)


class TestBeam:
    def test_single_beam_equals_greedy(self):
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        greedy = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=5)
        beam1 = beam_generate(PARAMS, ids, mask, CFG, max_new_tokens=5, num_beams=1)
        np.testing.assert_array_equal(np.asarray(beam1), np.asarray(greedy))

    def test_beam_score_at_least_greedy(self):
        ids = jax.random.randint(jax.random.PRNGKey(4), (3, 8), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        greedy = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=5)
        beam = beam_generate(PARAMS, ids, mask, CFG, max_new_tokens=5, num_beams=4)
        lp_greedy = np.asarray(seq_logprob(PARAMS, ids, mask, greedy))
        lp_beam = np.asarray(seq_logprob(PARAMS, ids, mask, beam))
        assert np.all(lp_beam >= lp_greedy - 1e-3)

    def test_beam_padded_prompts(self):
        ids, mask = left_pad([[3, 4], [5, 6, 7, 8]], pad_id=0)
        out = beam_generate(
            PARAMS, jnp.asarray(ids), jnp.asarray(mask), CFG, max_new_tokens=4, num_beams=3
        )
        assert out.shape == (2, 4)

    def test_matches_no_cache_beam_oracle(self):
        """Cached beam search == naive beam search with full recompute.

        Regression guard for the cache-reorder axis: the suffix-only reorder
        must gather the POSITION axis (axis 2) of the (B*k, kv_heads,
        max_len, head_dim) cache. An axis-1 gather silently becomes a no-op
        once prompt_len >= kv_heads, leaving beams attending to other beams'
        K/V — only divergent-beam decodes at depth > 1 expose it, which the
        property tests above never did."""
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, 8), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        assert ids.shape[1] >= CFG.kv_heads  # the regime that hid the bug
        k, steps = 4, 8
        got = beam_generate(PARAMS, ids, mask, CFG, max_new_tokens=steps, num_beams=k)
        want = _oracle_beam(PARAMS, np.asarray(ids), k, steps)
        np.testing.assert_array_equal(np.asarray(got), want)


def _oracle_beam(params, ids, k, steps):
    """Beam search with NO cache: full forward over every candidate prefix."""
    b, t0 = ids.shape
    seqs = np.broadcast_to(ids[:, None], (b, k, t0)).copy()
    scores = None
    for _ in range(steps):
        logits = forward(params, jnp.asarray(seqs.reshape(b * k, -1)), CFG)
        logp = np.asarray(
            jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        ).reshape(b, k, -1)
        vocab = logp.shape[-1]
        if scores is None:  # first expansion: beams identical, expand beam 0
            idx = np.argsort(-logp[:, 0], axis=1)[:, :k]
            scores = np.take_along_axis(logp[:, 0], idx, 1)
            beam_idx, tok_idx = np.zeros((b, k), int), idx
        else:
            flat = (scores[..., None] + logp).reshape(b, k * vocab)
            idx = np.argsort(-flat, axis=1)[:, :k]
            scores = np.take_along_axis(flat, idx, 1)
            beam_idx, tok_idx = idx // vocab, idx % vocab
        seqs = np.take_along_axis(seqs, beam_idx[..., None], 1)
        seqs = np.concatenate([seqs, tok_idx[..., None]], axis=2)
    best = np.argmax(scores, axis=1)
    return seqs[np.arange(b), best][:, t0:]
