"""Speculative continuous-batching server: outputs must stay token-identical
to isolated target-only greedy decodes — any draft, any admission order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.eval.generate import greedy_generate
from sow_tpu.eval.serve import GenerationServer
from sow_tpu.models import get_config, init_params

CFG = get_config("llama_test")
PARAMS = init_params(jax.random.PRNGKey(0), CFG)
DRAFT = init_params(jax.random.PRNGKey(7), CFG)  # a "bad" random draft


def isolated_greedy(prompt, max_new, eos=None):
    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones_like(ids)
    out = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=max_new, eos_token_id=eos)
    return [int(x) for x in np.asarray(out)[0]]


def make(draft=DRAFT, **kw):
    kw.setdefault("max_batch", 3)
    kw.setdefault("max_len", 64)
    kw.setdefault("prompt_buckets", (8, 16))
    kw.setdefault("spec_gamma", 2)
    return GenerationServer(PARAMS, CFG, draft_params=draft, draft_cfg=CFG, **kw)


class TestSpecServer:
    def test_matches_isolated_greedy_bad_draft(self):
        rng = np.random.RandomState(0)
        prompts = [list(rng.randint(2, CFG.vocab_size, n)) for n in (5, 9, 13, 7, 11)]
        srv = make()
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        out = srv.run()
        for rid, p in zip(rids, prompts):
            assert out[rid] == isolated_greedy(p, 6), rid

    def test_self_draft_matches_and_saves_rounds(self):
        rng = np.random.RandomState(1)
        prompts = [list(rng.randint(2, CFG.vocab_size, 6)) for _ in range(3)]
        srv = make(draft=PARAMS, decode_chunk=4)
        rids = [srv.submit(p, max_new_tokens=12) for p in prompts]
        out = srv.run()
        for rid, p in zip(rids, prompts):
            assert out[rid] == isolated_greedy(p, 12), rid
        # 11 decode tokens at ~gamma+1=3/round: ~4 rounds = one chunk, vs 11
        # single-token ticks for the plain path
        assert srv._chunk_counter <= 3

    def test_ragged_budgets_slot_reuse(self):
        rng = np.random.RandomState(2)
        prompts = [list(rng.randint(2, CFG.vocab_size, 6)) for _ in range(5)]
        budgets = [3, 8, 5, 2, 6]
        srv = make(max_batch=2)
        rids = [srv.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
        out = srv.run()
        for rid, p, b in zip(rids, prompts, budgets):
            assert out[rid] == isolated_greedy(p, b), rid

    def test_late_submission(self):
        rng = np.random.RandomState(3)
        first = [list(rng.randint(2, CFG.vocab_size, 8)) for _ in range(2)]
        late = list(rng.randint(2, CFG.vocab_size, 5))
        srv = make()
        rids = [srv.submit(p, max_new_tokens=8) for p in first]
        srv.step()
        srv.step()
        late_rid = srv.submit(late, max_new_tokens=8)
        out = srv.run()
        for rid, p in zip(rids, first):
            assert out[rid] == isolated_greedy(p, 8), rid
        assert out[late_rid] == isolated_greedy(late, 8)

    def test_eos_frees_slot_early(self):
        rng = np.random.RandomState(4)
        prompt = list(rng.randint(2, CFG.vocab_size, 6))
        free = isolated_greedy(prompt, 10)
        eos = free[3]  # 4th generated token acts as EOS
        srv = make(eos_token_id=eos)
        rid = srv.submit(prompt, max_new_tokens=10)
        out = srv.run()
        assert out[rid] == isolated_greedy(prompt, 10, eos=eos)[: len(out[rid])]
        assert out[rid][-1] == eos or len(out[rid]) == 10

    def test_sampling_reproducible_and_isolated(self):
        """temp>0 slots run rejection-sampling rounds: reproducible given
        the server seed, different across seeds, and a sampling slot must
        not perturb a greedy slot's token-identity."""
        rng = np.random.RandomState(6)
        p_greedy = list(rng.randint(2, CFG.vocab_size, 6))
        p_samp = list(rng.randint(2, CFG.vocab_size, 6))

        def run(seed):
            srv = make(sample_seed=seed)
            rg = srv.submit(p_greedy, max_new_tokens=6)
            rs = srv.submit(p_samp, max_new_tokens=6, temperature=0.9)
            out = srv.run()
            return out[rg], out[rs]

        g1, s1 = run(0)
        g2, s2 = run(0)
        g3, s3 = run(123)
        assert g1 == g2 == g3 == isolated_greedy(p_greedy, 6)
        assert s1 == s2  # same seed -> same stream
        assert s1 != s3  # different seed -> different stream (overwhelmingly)

    def test_int8_cache(self):
        rng = np.random.RandomState(5)
        prompts = [list(rng.randint(2, CFG.vocab_size, 7)) for _ in range(3)]
        srv = make(cache_dtype=jnp.int8)
        rids = [srv.submit(p, max_new_tokens=5) for p in prompts]
        out = srv.run()
        # int8 greedy oracle: quantization applies to both engines
        def iso_int8(p, n):
            ids = jnp.asarray([p], jnp.int32)
            g = greedy_generate(
                PARAMS, ids, jnp.ones_like(ids), CFG, max_new_tokens=n,
                cache_dtype=jnp.int8,
            )
            return [int(x) for x in np.asarray(g)[0]]
        for rid, p in zip(rids, prompts):
            assert out[rid] == iso_int8(p, 5), rid
