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
