"""Speculative decoding: losslessness vs target-only greedy, raggedness,
EOS semantics, and acceptance accounting.

The load-bearing property is that greedy speculative decoding emits exactly
the target model's greedy tokens for ANY draft — the draft only changes how
many target forwards it takes, never the output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.eval.generate import greedy_generate, left_pad
from sow_tpu.eval.speculative import speculative_generate
from sow_tpu.models import get_config, init_params

CFG = get_config("llama_test")
TARGET = init_params(jax.random.PRNGKey(0), CFG)
# a different random model over the same vocab: a "bad" draft
DRAFT = init_params(jax.random.PRNGKey(7), CFG)


def spec(ids, mask, draft=DRAFT, **kw):
    out, stats = speculative_generate(
        TARGET, draft, jnp.asarray(ids), jnp.asarray(mask), CFG, CFG, **kw
    )
    return np.asarray(out), jax.tree_util.tree_map(np.asarray, stats)


class TestLossless:
    def test_matches_target_greedy_any_draft(self):
        ids = jax.random.randint(jax.random.PRNGKey(1), (3, 8), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        want = np.asarray(greedy_generate(TARGET, ids, mask, CFG, max_new_tokens=9))
        for gamma in (1, 3, 4):
            got, _ = spec(ids, mask, max_new_tokens=9, gamma=gamma)
            np.testing.assert_array_equal(got, want)

    def test_self_draft_accepts_everything(self):
        # draft == target -> every proposal matches -> gamma+1 tokens/round
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        got, stats = spec(ids, mask, draft=TARGET, max_new_tokens=13, gamma=3)
        want = np.asarray(greedy_generate(TARGET, ids, mask, CFG, max_new_tokens=13))
        np.testing.assert_array_equal(got, want)
        # 1 prefill token + 12 more at near-full acceptance: ceil(12/4)=3
        # rounds ideally; allow a couple of extra rounds for float-tie flips
        # between the draft's S=1 forward and the blocked verify forward
        # (different contraction shapes -> ulp-level logit differences).
        rounds = int(stats["rounds"])
        assert 3 <= rounds <= 5
        # per row, each active round decides a+1 tokens summing to 12, so
        # accepted = sum(a) >= 12 - rounds per row
        assert int(stats["accepted"]) >= 2 * (12 - rounds)

    def test_ragged_prompts(self):
        base = [[5, 6, 7], [10, 11, 12, 13, 14], [2]]
        ids, mask = left_pad(base, pad_id=0)
        want = np.asarray(
            greedy_generate(TARGET, jnp.asarray(ids), jnp.asarray(mask), CFG, max_new_tokens=7)
        )
        got, _ = spec(ids, mask, max_new_tokens=7, gamma=2)
        np.testing.assert_array_equal(got, want)


class TestEos:
    def test_eos_freezes_and_pads(self):
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        free, _ = spec(ids, mask, max_new_tokens=8, gamma=3)
        eos = int(free[0, 2])  # pretend the 3rd generated token is EOS
        want = np.asarray(
            greedy_generate(TARGET, ids, mask, CFG, max_new_tokens=8, eos_token_id=eos)
        )
        got, _ = spec(ids, mask, max_new_tokens=8, gamma=3, eos_token_id=eos)
        np.testing.assert_array_equal(got, want)
        assert np.all(got[0, 3:] == eos)

    def test_mixed_finished_rows(self):
        # one row hits EOS early, the other decodes to budget; per-row
        # freezing must not perturb the live row
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 7), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        free, _ = spec(ids, mask, max_new_tokens=10, gamma=3)
        eos = int(free[0, 1])  # row 0's 2nd token; assume row 1 differs there
        if eos in free[1]:
            pytest.skip("token collision between rows; pick another seed")
        want = np.asarray(
            greedy_generate(TARGET, ids, mask, CFG, max_new_tokens=10, eos_token_id=eos)
        )
        got, _ = spec(ids, mask, max_new_tokens=10, gamma=3, eos_token_id=eos)
        np.testing.assert_array_equal(got, want)


class TestAccounting:
    def test_round_bounds(self):
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 5), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        max_new, gamma = 11, 3
        _, stats = spec(ids, mask, max_new_tokens=max_new, gamma=gamma)
        rounds = int(stats["rounds"])
        # each round decides 1..gamma+1 tokens per row beyond the prefill token
        assert np.ceil((max_new - 1) / (gamma + 1)) <= rounds <= max_new - 1
        assert float(stats["tokens_per_round"]) >= 1.0

    def test_max_new_one(self):
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 5), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        got, stats = spec(ids, mask, max_new_tokens=1, gamma=3)
        want = np.asarray(greedy_generate(TARGET, ids, mask, CFG, max_new_tokens=1))
        np.testing.assert_array_equal(got, want)
        assert int(stats["rounds"]) == 0

    def test_int8_cache_still_lossless_vs_itself(self):
        # int8 KV quantizes both engines' caches; spec must still match the
        # int8 greedy path (same quantization at the same positions)
        ids = jax.random.randint(jax.random.PRNGKey(8), (2, 6), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        want = np.asarray(
            greedy_generate(
                TARGET, ids, mask, CFG, max_new_tokens=6, cache_dtype=jnp.int8
            )
        )
        got, _ = spec(ids, mask, max_new_tokens=6, gamma=2, cache_dtype=jnp.int8)
        np.testing.assert_array_equal(got, want)


class TestSampling:
    def test_accept_residual_step_preserves_target_dist(self):
        """Monte Carlo of one accept/residual step: draft token d ~ q,
        accept iff u*q(d) < p(d), else resample from norm(max(p-q,0)) —
        the output must be distributed exactly as p (Leviathan/Chen lemma)."""
        from sow_tpu.eval.speculative import _residual_sample

        V, N = 8, 20000
        kp, kq = jax.random.PRNGKey(10), jax.random.PRNGKey(11)
        p = jax.nn.softmax(jax.random.normal(kp, (V,)) * 1.5)
        q = jax.nn.softmax(jax.random.normal(kq, (V,)) * 1.5)

        def one(key):
            kd, ku, kr = jax.random.split(key, 3)
            d = jax.random.categorical(kd, jnp.log(q))
            u = jax.random.uniform(ku)
            accept = u * jnp.maximum(q[d], 1e-30) < p[d]
            res = _residual_sample(p[None], q[None], kr)[0]
            return jnp.where(accept, d, res)

        keys = jax.random.split(jax.random.PRNGKey(12), N)
        samples = np.asarray(jax.vmap(one)(keys))
        emp = np.bincount(samples, minlength=V) / N
        tv = 0.5 * np.abs(emp - np.asarray(p)).sum()
        assert tv < 0.02, (tv, emp, np.asarray(p))

    def test_temperature_zero_limit_matches_greedy(self):
        from sow_tpu.eval.speculative import speculative_sample

        ids = jax.random.randint(jax.random.PRNGKey(13), (2, 7), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        want = np.asarray(greedy_generate(TARGET, ids, mask, CFG, max_new_tokens=8))
        got, _ = speculative_sample(
            TARGET, DRAFT, ids, mask, CFG, CFG, max_new_tokens=8,
            key=jax.random.PRNGKey(14), gamma=3, temperature=1e-4,
        )
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_reproducible_given_key(self):
        from sow_tpu.eval.speculative import speculative_sample

        ids = jax.random.randint(jax.random.PRNGKey(15), (2, 6), 0, CFG.vocab_size)
        mask = jnp.ones_like(ids)
        kw = dict(max_new_tokens=6, gamma=2, temperature=0.8)
        a1, _ = speculative_sample(
            TARGET, DRAFT, ids, mask, CFG, CFG, key=jax.random.PRNGKey(16), **kw
        )
        a2, _ = speculative_sample(
            TARGET, DRAFT, ids, mask, CFG, CFG, key=jax.random.PRNGKey(16), **kw
        )
        b1, _ = speculative_sample(
            TARGET, DRAFT, ids, mask, CFG, CFG, key=jax.random.PRNGKey(17), **kw
        )
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert not np.array_equal(np.asarray(a1), np.asarray(b1))
