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


class TestGQA:
    """Grouped-query attention (kv_heads < heads) without K/V repetition."""

    CFG_GQA = get_config("llama_test").__class__(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=128,
    )

    def test_grouped_equals_repeat(self):
        """grouped_attention == naive attention over explicitly repeated KV."""
        from sow_tpu.models.llama import grouped_attention

        key = jax.random.PRNGKey(11)
        kq, kk, kv = jax.random.split(key, 3)
        b, nh, kvh, t, s, hd = 2, 8, 2, 5, 9, 16
        q = jax.random.normal(kq, (b, nh, t, hd), jnp.float32)
        k = jax.random.normal(kk, (b, kvh, s, hd), jnp.float32)
        v = jax.random.normal(kv, (b, kvh, s, hd), jnp.float32)
        mask = jax.random.bernoulli(key, 0.8, (b, 1, t, s))
        mask = mask.at[..., 0].set(True)  # no fully-masked query rows
        got = grouped_attention(q, k, v, mask, hd)

        rep = nh // kvh
        kr, vr = jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1)
        import math

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, kr) / math.sqrt(hd)
        scores = jnp.where(mask, scores, -1e30)
        want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), vr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_gqa_greedy_matches_no_cache(self):
        params = init_params(jax.random.PRNGKey(5), self.CFG_GQA)
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 7), 0, self.CFG_GQA.vocab_size)
        mask = jnp.ones_like(ids)
        got = greedy_generate(params, ids, mask, self.CFG_GQA, max_new_tokens=6)
        out = []
        cur = ids
        for _ in range(6):
            logits = forward(params, cur, self.CFG_GQA)
            nxt = jnp.argmax(logits[:, -1].astype(jnp.float32), -1).astype(jnp.int32)
            out.append(nxt)
            cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.stack(out, 1)))


class TestInt8Cache:
    def test_greedy_matches_f32_cache(self):
        ids = jax.random.randint(jax.random.PRNGKey(8), (2, 8), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        ref = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=6)
        got = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=6, cache_dtype=jnp.int8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_cache_logits_close(self):
        """Per-position absmax int8 KV keeps decode logits within ~1%."""
        from sow_tpu.models import llama as llama_lib

        ids = jax.random.randint(jax.random.PRNGKey(9), (2, 12), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        positions = jnp.broadcast_to(jnp.arange(12), (2, 12))
        lo, _ = llama_lib.forward_with_cache(
            PARAMS, ids, CFG, llama_lib.init_cache(CFG, 2, 12, jnp.float32),
            0, positions, mask,
        )
        lq, _ = llama_lib.forward_with_cache(
            PARAMS, ids, CFG, llama_lib.init_cache(CFG, 2, 12, jnp.int8),
            0, positions, mask,
        )
        err = np.abs(np.asarray(lq) - np.asarray(lo)).max()
        scale = np.abs(np.asarray(lo)).max()
        assert err <= 0.02 * scale, (err, scale)

    def test_beam_int8_reorders_scales(self):
        ids = jax.random.randint(jax.random.PRNGKey(10), (2, 8), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        ref = beam_generate(PARAMS, ids, mask, CFG, max_new_tokens=6, num_beams=4)
        got = beam_generate(
            PARAMS, ids, mask, CFG, max_new_tokens=6, num_beams=4, cache_dtype=jnp.int8
        )
        # int8 rounding may legitimately flip a near-tie; require the common
        # case (identical argmax decisions on this fixed tiny model) to pin
        # that scales are carried through the beam permutation.
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


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


class TestCacheWriteStrategies:
    """The byte-gated cache-write crossover: both branches (select for small
    buffers, dynamic-slice/scatter for big) must be token-identical. CPU
    tests only ever see tiny buffers, so force the big-buffer branch by
    shrinking the gate."""

    def test_uniform_dus_branch_matches_select(self, monkeypatch):
        from sow_tpu.models import llama as llama_lib

        ids = jax.random.randint(jax.random.PRNGKey(21), (2, 6), 2, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        default = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=5)
        monkeypatch.setattr(llama_lib, "_WHERE_WRITE_MAX_BYTES", 0)
        jax.clear_caches()  # the gate is baked in at trace time
        forced = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=5)
        jax.clear_caches()
        assert jnp.array_equal(default, forced)

    def test_ragged_scatter_branch_matches_select(self, monkeypatch):
        from sow_tpu.eval.serve import GenerationServer
        from sow_tpu.models import llama as llama_lib

        rng = np.random.RandomState(22)
        prompts = [list(rng.randint(2, CFG.vocab_size, n)) for n in (5, 9)]

        def run():
            srv = GenerationServer(
                PARAMS, CFG, max_batch=2, max_len=64, prompt_buckets=(16,)
            )
            rids = [srv.submit(p, max_new_tokens=5) for p in prompts]
            out = srv.run()
            return [out[r] for r in rids]

        default = run()
        monkeypatch.setattr(llama_lib, "_WHERE_WRITE_MAX_BYTES", 0)
        jax.clear_caches()
        forced = run()
        jax.clear_caches()
        assert default == forced
