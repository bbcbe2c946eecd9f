"""Tiered-pool serving: routing, correctness vs isolated greedy, capacity."""

import numpy as np
import pytest

from sow_tpu.eval.tiered import TieredServer
from sow_tpu.models import get_config, init_params
import jax
import jax.numpy as jnp

from sow_tpu.eval.generate import greedy_generate

CFG = get_config("llama_test")
PARAMS = init_params(jax.random.PRNGKey(0), CFG)


def isolated_greedy(prompt, max_new):
    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones_like(ids)
    out = greedy_generate(PARAMS, ids, mask, CFG, max_new_tokens=max_new)
    return [int(x) for x in np.asarray(out)[0]]


def make(**kw):
    kw.setdefault("tiers", ((3, 24), (2, 64)))
    kw.setdefault("prompt_buckets", (8, 16))
    return TieredServer(PARAMS, CFG, **kw)


class TestTieredServer:
    def test_mixed_lengths_match_isolated_greedy(self):
        rng = np.random.RandomState(0)
        prompts = [list(rng.randint(2, CFG.vocab_size, n)) for n in (5, 30, 9, 40, 13)]
        srv = make()
        rids = [srv.submit(p, max_new_tokens=6) for p in prompts]
        out = srv.run()
        assert sorted(out) == sorted(rids)
        for rid, p in zip(rids, prompts):
            assert out[rid] == isolated_greedy(p, 6), rid

    def test_routes_to_shallowest_fitting_tier(self):
        srv = make()
        srv.submit([3, 4, 5], max_new_tokens=4)  # 7 <= 24: tier 0
        srv.submit(list(range(2, 32)), max_new_tokens=8)  # 38 > 24: tier 1
        assert len(srv.servers[0].pending) == 1
        assert len(srv.servers[1].pending) == 1
        # budget pushes a short prompt past tier 0
        srv.submit([3, 4, 5], max_new_tokens=30)
        assert len(srv.servers[1].pending) == 2

    def test_rejects_over_deepest_tier(self):
        srv = make()
        with pytest.raises(ValueError, match="deepest tier"):
            srv.submit(list(range(2, 70)), max_new_tokens=8)

    def test_more_slots_than_uniform_pool_at_equal_bytes(self):
        # the capacity story: 3x24 + 2x64 slots cost exactly 200 slot-rows;
        # a uniform 5-slot pool at max_len 64 costs 320 — tiering serves the
        # same 5 concurrent requests at 62.5% of the cache HBM
        srv = make()
        tiered = srv.cache_bytes()
        uniform = TieredServer(PARAMS, CFG, tiers=((5, 64),), prompt_buckets=(8, 16))
        assert tiered < 0.65 * uniform.cache_bytes()

    def test_stats_aggregate(self):
        rng = np.random.RandomState(1)
        srv = make()
        rids = [
            srv.submit(list(rng.randint(2, CFG.vocab_size, n)), max_new_tokens=5)
            for n in (5, 30)
        ]
        out = srv.run()
        st = srv.stats()
        assert st["requests_completed"] == 2
        # tokens_generated counts decode-kept tokens (the first token of each
        # request comes from prefill): budget-1 per request
        assert st["tokens_generated"] >= 2 * (5 - 1)
        assert len(st["tiers"]) == 2
        assert st["cache_bytes"] == srv.cache_bytes()
        assert all(out[r] for r in rids)

    def test_composes_with_speculative_serving(self):
        # server_kw passes straight through: tiered pools + a draft model
        draft = init_params(jax.random.PRNGKey(7), CFG)
        rng = np.random.RandomState(2)
        prompts = [list(rng.randint(2, CFG.vocab_size, n)) for n in (5, 30)]
        srv = make(draft_params=draft, draft_cfg=CFG, spec_gamma=2)
        rids = [srv.submit(p, max_new_tokens=5) for p in prompts]
        out = srv.run()
        for rid, p in zip(rids, prompts):
            assert out[rid] == isolated_greedy(p, 5), rid
