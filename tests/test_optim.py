"""Optimizer + schedule tests.

Grouped AdamW is cross-checked against optax.adamw (independent
implementation); TT optimizers are checked for parity against dense updates
on synthetic low-rank gradients — the reference's printed-only comparison
(``tests/tt_adam_update.py:216``) turned into asserting tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sow_tpu.optim.adamw import apply_updates, grouped_adamw
from sow_tpu.optim.schedules import (
    cosine_restarts_schedule,
    cyclical_cosine_schedule,
    get_schedule,
    linear_schedule,
)
from sow_tpu.optim.ttadam import default_tt_spec, pure_tt_adam_update, ttadam
from sow_tpu.optim.ttsgd import ttsgd
from sow_tpu.tt import TensorTrain
from sow_tpu.utils.numerics import generate_rank_k

KEY = jax.random.PRNGKey(0)


def low_rank_grad(key, m=81, n=81):
    """CP-rank-2 gradient whose elementwise square has CP rank <= 4 — both
    exactly representable at TT rank 4 (the parity regime of
    ``tests/tt_adam_update.py``)."""
    return generate_rank_k(key, (3,) * 8, 2, mix=1).reshape(m, n)


class TestGroupedAdamW:
    def test_matches_optax_single_group(self):
        params = {"w": jax.random.normal(KEY, (8, 8)), "b": jnp.zeros((8,))}
        labels = {"w": "regular", "b": "regular"}
        mine = grouped_adamw(labels, lrs={"regular": 1e-2}, weight_decay=0.01)
        ref = optax.adamw(1e-2, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)

        s_mine, s_ref = mine.init(params), ref.init(params)
        p_mine = p_ref = params
        for i in range(5):
            g = jax.tree_util.tree_map(
                lambda p: jax.random.normal(jax.random.PRNGKey(i), p.shape), params
            )
            u1, s_mine = mine.update(g, s_mine, p_mine)
            p_mine = apply_updates(p_mine, u1)
            u2, s_ref = ref.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u2)
        for a, b in zip(jax.tree_util.tree_leaves(p_mine), jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_frozen_group_untouched(self):
        params = {"w": jnp.ones((4, 4)), "acc": jnp.ones((4, 4))}
        labels = {"w": "regular", "acc": "frozen"}
        opt = grouped_adamw(labels, lrs={"regular": 0.1})
        state = opt.init(params)
        assert state.mu["acc"].shape == ()  # placeholder — no HBM for frozen
        g = {"w": jnp.ones((4, 4)), "acc": jnp.ones((4, 4))}
        u, state = opt.update(g, state, params)
        assert float(jnp.abs(u["acc"]).max()) == 0.0
        assert float(jnp.abs(u["w"]).max()) > 0.0

    def test_group_reset_restarts_bias_correction(self):
        params = {"w": jnp.ones((4,)), "s": jnp.ones((4,))}
        labels = {"w": "regular", "s": "sow"}
        opt = grouped_adamw(labels, lrs={"regular": 0.1, "sow": 0.1})
        state = opt.init(params)
        g = {"w": jnp.ones((4,)), "s": jnp.ones((4,))}
        for _ in range(3):
            _, state = opt.update(g, state, params)
        state = opt.reset_group(state, "sow")
        assert float(state.count["sow"]) == 0 and float(state.count["regular"]) == 3
        assert float(jnp.abs(state.mu["s"]).max()) == 0.0
        assert float(jnp.abs(state.mu["w"]).max()) > 0.0
        # Post-reset first sow update equals a fresh optimizer's first step.
        u, _ = opt.update(g, state, params)
        fresh = grouped_adamw(labels, lrs={"sow": 0.1})
        uf, _ = fresh.update(g, fresh.init(params), params)
        np.testing.assert_allclose(np.asarray(u["s"]), np.asarray(uf["s"]), rtol=1e-5)

    def test_per_group_schedules(self):
        params = {"w": jnp.ones((2,)), "s": jnp.ones((2,))}
        labels = {"w": "regular", "s": "sow"}
        sched = {"sow": lambda step: jnp.float32(0.0)}
        opt = grouped_adamw(labels, lrs={"regular": 0.1, "sow": 0.1}, schedules=sched)
        state = opt.init(params)
        g = {"w": jnp.ones((2,)), "s": jnp.ones((2,))}
        u, _ = opt.update(g, state, params)
        assert float(jnp.abs(u["s"]).max()) == 0.0
        assert float(jnp.abs(u["w"]).max()) > 0.0


class TestSchedules:
    def test_linear(self):
        f = linear_schedule(100, 10)
        assert float(f(0)) == 0.0
        assert float(f(5)) == pytest.approx(0.5)
        assert float(f(10)) == pytest.approx(1.0)
        assert float(f(55)) == pytest.approx(0.5)
        assert float(f(100)) == pytest.approx(0.0)

    def test_cyclical_cosine(self):
        # 1000 steps, 10% warmup, cycles of 500 (training_utils.py:192-207)
        f = cyclical_cosine_schedule(1000, 0.1, min_lr_ratio=0.1, cycle_length=500)
        assert float(f(50)) == pytest.approx(0.5)  # mid-warmup
        assert float(f(100)) == pytest.approx(1.0)  # warmup end
        assert float(f(300)) == pytest.approx(0.55, abs=1e-3)  # cosine midpoint
        # cycle restart quirk: steps 500, 501 return 1e-7
        assert float(f(500)) == pytest.approx(1e-7)
        assert float(f(501)) == pytest.approx(1e-7)
        assert float(f(550)) == pytest.approx(0.5)  # second warmup ramp

    def test_cyclical_cosine_cycle_ratio(self):
        f = cyclical_cosine_schedule(1000, 0.1, min_lr_ratio=0.1, cycle_length=500, cycle_ratio=0.5)
        # Second cycle peak is halved.
        assert float(f(600)) == pytest.approx(0.5 * float(f(100)), rel=1e-5)

    def test_cosine_restarts(self):
        f = cosine_restarts_schedule(1000, 0.05, restart_warmup_steps=10, restart_every=250)
        assert float(f(25)) == pytest.approx(0.5)  # first warmup
        # after a restart: short re-warmup toward the decayed envelope
        v_restart = float(f(255))
        assert 0.0 < v_restart < 1.0
        # far along: decays toward min_lr_ratio
        assert float(f(999)) == pytest.approx(0.1, abs=0.01)

    def test_divisibility_errors(self):
        with pytest.raises(ValueError):
            cyclical_cosine_schedule(1000, 0.1, cycle_length=300)
        with pytest.raises(ValueError):
            cosine_restarts_schedule(1000, 0.05, restart_warmup_steps=10, restart_every=300)

    def test_get_schedule_dispatch(self):
        assert get_schedule("linear", num_training_steps=10, warmup_ratio=0.1)
        with pytest.raises(NotImplementedError):
            get_schedule("nope", num_training_steps=10, warmup_ratio=0.1)


class TestTTAdam:
    def test_state_is_compressed(self):
        params = {"w": jnp.zeros((81, 81)), "b": jnp.zeros((81,))}
        opt = ttadam(lr=1e-3)
        state = opt.init(params)
        assert isinstance(state.mu["w"], TensorTrain)
        assert isinstance(state.mu["b"], jnp.ndarray)
        dense_bytes = 81 * 81 * 4
        tt_bytes = state.mu["w"].numel() * 4
        assert tt_bytes < 0.2 * dense_bytes  # the compression headline

    def test_parity_with_dense_adam_on_low_rank_grads(self):
        # Reference comparison (tests/tt_adam_update.py:216) with assertions:
        # on gradients whose moments stay exactly TT-representable, the
        # compressed optimizer matches dense Adam.
        params = {"w": jnp.zeros((81, 81))}
        opt = ttadam(lr=1e-2)
        ref = optax.adam(1e-2, b1=0.9, b2=0.999, eps=1e-8)
        s, sr = opt.init(params), ref.init(params)
        p, pr = params, params
        # A fixed low-rank gradient keeps both moments *exactly*
        # TT-representable (m rank-2, v = g^2 rank<=4). With varying
        # gradients the running v exceeds the storage rank and truncation can
        # go negative — the fragility the reference clamps at ttadam.py:84.
        g = {"w": low_rank_grad(jax.random.PRNGKey(0))}
        for _ in range(3):
            u, s = opt.update(g, s, p)
            p = apply_updates(p, u)
            ur, sr = ref.update(g, sr, pr)
            pr = optax.apply_updates(pr, ur)
        # Tight parity where Adam is well-conditioned (|g| bounded away from
        # zero); near-zero-gradient entries have denominators ~eps where any
        # state approximation yields O(1) relative error — an intrinsic
        # property of the scheme, dense or compressed.
        ga = np.abs(np.asarray(g["w"]))
        mask = ga > 0.05 * ga.max()
        a, b = np.asarray(p["w"]), np.asarray(pr["w"])
        np.testing.assert_allclose(a[mask], b[mask], rtol=2e-2, atol=2e-4)
        assert np.abs(a - b).mean() < 2e-4  # global average stays tight too

    def test_jit_step(self):
        params = {"w": jnp.zeros((81, 81))}
        opt = ttadam(lr=1e-2)
        state = opt.init(params)

        @jax.jit
        def step(g, state, params):
            u, state = opt.update(g, state, params)
            return apply_updates(params, u), state

        g = {"w": low_rank_grad(jax.random.PRNGKey(0))}
        p1, s1 = step(g, state, params)
        # State structure is stable across steps (jit carry requirement).
        p2, s2 = step(g, s1, p1)
        assert jax.tree_util.tree_structure(s1) == jax.tree_util.tree_structure(s2)

    def _drifting_grads(self, shape=(96, 128), r=8, n=20):
        """Near-low-rank gradients drifting with the step (the bench's
        workload): the moments are NOT exactly TT-representable, so these
        exercise the truncation behavior of each mode."""
        key = jax.random.PRNGKey(7)
        U = jax.random.normal(key, (shape[0], r))
        V = jax.random.normal(jax.random.fold_in(key, 1), (r, shape[1]))
        out = []
        for i in range(n):
            k = jax.random.fold_in(key, 100 + i)
            out.append(
                {"w": (U * jax.random.normal(k, (r,))) @ V / r
                 + 0.01 * jax.random.normal(k, shape)}
            )
        return out

    def _final_update_rel(self, opt, grads):
        ref = optax.adam(1e-3)
        params = {"w": jnp.zeros(grads[0]["w"].shape)}
        s, sr = opt.init(params), ref.init(params)
        rel = None
        for g in grads:
            u, s = opt.update(g, s, params)
            ur, sr = ref.update(g, sr, params)
            rel = float(
                jnp.linalg.norm(u["w"] - ur["w"]) / jnp.linalg.norm(ur["w"])
            )
        return rel

    def test_matrix_layout_factored_v_stays_close_to_dense(self):
        """The TPU-recommended config (layout='matrix' order-2 bond +
        Adafactor second moment): bounded drift from dense Adam on
        drifting near-low-rank gradients. Benched at 1.04x dense step time
        (vs 2.1x for the uniform order-4 grid) at 83x state compression."""
        grads = self._drifting_grads()
        spec = default_tt_spec(order=2, rank=8)
        opt = ttadam(lr=1e-3, tt_spec=spec, layout="matrix", v_mode="factored")
        assert self._final_update_rel(opt, grads) < 0.75

    def test_tt_arithmetic_ema_needs_matrix_layout(self):
        """ema_mode='tt' (first moment advanced by TT add+round, ONE
        decompose/step) only works on the order-2 'matrix' layout, whose
        bond captures matrix singular structure; rounding in the
        interleaved uniform grid discards the accumulated EMA almost
        entirely (measured rel ~1.0 = the moment never accumulates)."""
        grads = self._drifting_grads()
        good = ttadam(
            lr=1e-3, tt_spec=default_tt_spec(order=2, rank=8),
            layout="matrix", ema_mode="tt", v_mode="factored",
        )
        bad = ttadam(
            lr=1e-3, tt_spec=default_tt_spec(order=4, rank=8),
            layout="uniform", ema_mode="tt", v_mode="factored",
        )
        rel_good = self._final_update_rel(good, grads)
        rel_bad = self._final_update_rel(bad, grads)
        assert rel_good < 0.8, rel_good
        assert rel_bad > 0.9, rel_bad  # the uniform-grid EMA collapse


class TestTTSGD:
    def test_parity_with_dense_sgd_momentum(self):
        params = {"w": jnp.zeros((81, 81))}
        opt = ttsgd(lr=0.1, momentum=0.9, nesterov=False)
        p = params
        s = opt.init(params)
        g_fixed = low_rank_grad(jax.random.PRNGKey(5))
        # dense reference
        buf = jnp.zeros_like(g_fixed)
        pr = jnp.zeros((81, 81))
        for _ in range(3):
            u, s = opt.update({"w": g_fixed}, s, p)
            p = apply_updates(p, u)
            buf = 0.9 * buf + g_fixed
            pr = pr - 0.1 * buf
        np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(pr), rtol=1e-2, atol=1e-4)


class TestPureTT:
    def test_pure_tt_adam_close_to_dense(self):
        # Well-conditioned regime: rank-1 gradient with entries in [1, 4], so
        # v_hat is bounded away from zero and the Newton rsqrt converges.
        # (The reference's own demo, tests/tt_adam_update.py:54-77, runs on
        # near-zero entries where elementwise rsqrt is ill-posed and only
        # *prints* the error.)
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        a = jax.random.uniform(k1, (81,), minval=1.0, maxval=2.0)
        b = jax.random.uniform(k2, (81,), minval=1.0, maxval=2.0)
        g = jnp.outer(a, b)
        gtt = TensorTrain.from_matrix(g, [1, 4, 4, 4, 1], padding=True)
        m = TensorTrain.zeros(gtt.ranks, gtt.input_shape, gtt.output_shape)
        v = TensorTrain.zeros(gtt.ranks, gtt.input_shape, gtt.output_shape)
        upd, m, v = pure_tt_adam_update(gtt, m, v, alpha=1e-3, b1=0.9, b2=0.999, newton_iters=30)
        upd_dense = np.asarray(upd.to_matrix((81, 81)))
        # dense reference (bias correction as 1/(1-b) like the ref test,
        # tests/tt_adam_update.py:71-77, which omits eps)
        ref = 1e-3 * np.asarray(g) / np.sqrt(np.asarray(g) ** 2)
        err = np.linalg.norm(upd_dense - ref) / np.linalg.norm(ref)
        assert err < 0.1


class TestFactoredAdamW:
    """Adafactor-style factored-v AdamW (sow_tpu/optim/factored.py) — the
    default embed/lm_head optimizer under SoW."""

    def test_exact_on_rank_one_vsq(self):
        # With a constant gradient, v is rank-1 (outer(vr, vc)/mean(vr)
        # reconstructs it exactly), so factored == exact AdamW.
        from sow_tpu.optim.factored import factored_adamw

        g = jnp.outer(
            jax.random.uniform(KEY, (130,), minval=0.5, maxval=2.0),
            jax.random.uniform(jax.random.PRNGKey(1), (140,), minval=0.5, maxval=2.0),
        )
        params = {"w": jnp.zeros((130, 140))}
        fac = factored_adamw(lr=1e-2, min_dim=128)
        ref = optax.adamw(1e-2, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
        sf, sr = fac.init(params), ref.init(params)
        pf, pr = params, params
        for _ in range(5):
            uf, sf = fac.update({"w": g}, sf, pf)
            pf = apply_updates(pf, uf)
            ur, sr = ref.update({"w": g}, sr, pr)
            pr = optax.apply_updates(pr, ur)
        np.testing.assert_allclose(
            np.asarray(pf["w"]), np.asarray(pr["w"]), rtol=1e-4, atol=1e-6
        )

    def test_small_leaves_run_exact_adamw(self):
        from sow_tpu.optim.factored import factored_adamw

        g = {"w": jax.random.normal(KEY, (16, 24)), "b": jnp.ones((24,))}
        params = jax.tree_util.tree_map(jnp.zeros_like, g)
        fac = factored_adamw(lr=1e-2, min_dim=128)  # both leaves below min_dim
        ref = optax.adamw(1e-2, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
        sf, sr = fac.init(params), ref.init(params)
        pf, pr = params, params
        for _ in range(3):
            uf, sf = fac.update(g, sf, pf)
            pf = apply_updates(pf, uf)
            ur, sr = ref.update(g, sr, pr)
            pr = optax.apply_updates(pr, ur)
        # eps placement differs from optax (ours matches torch AdamW:
        # m/(sqrt(v)+eps) vs optax's m/(sqrt(v+eps'))) — tiny-|g| entries
        # diverge at the 1e-5 level, hence the tolerance.
        for a, b in zip(jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(pr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)

    def test_memory_sublinear(self):
        from sow_tpu.optim.factored import factored_adamw
        from sow_tpu.utils.memory import optimizer_memory_usage

        params = {"w": jnp.zeros((512, 384), jnp.bfloat16)}
        st = factored_adamw(min_dim=128).init(params)
        # m: 512*384 bf16; vr+vc: (512+384) f32 — far below full-v 512*384*4
        assert optimizer_memory_usage(st) < 512 * 384 * 2 + (512 + 384) * 4 + 64

    def test_converges_noisy_lowrank(self):
        from sow_tpu.optim.factored import factored_adamw

        key = jax.random.PRNGKey(3)
        target = jax.random.normal(key, (130, 130))
        params = {"w": jnp.zeros((130, 130))}
        fac = factored_adamw(lr=5e-2, min_dim=128)
        s = fac.init(params)
        p = params
        for i in range(200):
            g = {"w": p["w"] - target + 0.01 * jax.random.normal(jax.random.PRNGKey(i), (130, 130))}
            u, s = fac.update(g, s, p)
            p = apply_updates(p, u)
        err = float(jnp.abs(p["w"] - target).mean())
        assert err < 0.05


class TestTTAdamGroupedLR:
    """Grouped-LR mode (labels/lrs/schedules — the contract that lets
    --optimizer ttadam drive SoW training from the CLI)."""

    def _grads_params(self):
        k = jax.random.PRNGKey(0)
        params = {"a": jnp.zeros((64, 64)), "b": jnp.zeros((64, 64))}
        grads = {
            "a": jax.random.normal(k, (64, 64)) * 0.1,
            "b": jax.random.normal(jax.random.fold_in(k, 1), (64, 64)) * 0.1,
        }
        return params, grads

    def test_labels_route_per_group_lr(self):
        params, grads = self._grads_params()
        labels = {"a": "regular", "b": "sow"}
        opt = ttadam(labels=labels, lrs={"regular": 1e-2, "sow": 0.0},
                     layout="matrix", v_mode="factored",
                     tt_spec=default_tt_spec(order=2, rank=8, min_dim=16))
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        assert float(jnp.abs(updates["a"]).max()) > 0
        # zero-lr group: moments advance but the update is exactly zero
        assert float(jnp.abs(updates["b"]).max()) == 0.0

    def test_uniform_lrs_match_unlabeled(self):
        params, grads = self._grads_params()
        labels = {"a": "regular", "b": "sow"}
        spec = default_tt_spec(order=2, rank=8, min_dim=16)
        grouped = ttadam(labels=labels, lrs={"regular": 3e-3, "sow": 3e-3},
                         layout="matrix", v_mode="factored", tt_spec=spec)
        plain = ttadam(lr=3e-3, layout="matrix", v_mode="factored", tt_spec=spec)
        sg, sp = grouped.init(params), plain.init(params)
        ug, _ = grouped.update(grads, sg, params)
        up, _ = plain.update(grads, sp, params)
        for ka in ("a", "b"):
            np.testing.assert_allclose(np.asarray(ug[ka]), np.asarray(up[ka]),
                                       rtol=1e-6, atol=1e-8)

    def test_schedule_multiplies_group_lr(self):
        params, grads = self._grads_params()
        labels = {"a": "regular", "b": "regular"}
        spec = default_tt_spec(order=2, rank=8, min_dim=16)
        half = ttadam(labels=labels, lrs={"regular": 1e-2},
                      schedules={"regular": lambda s: 0.5},
                      layout="matrix", v_mode="factored", tt_spec=spec)
        full = ttadam(labels=labels, lrs={"regular": 5e-3},
                      layout="matrix", v_mode="factored", tt_spec=spec)
        uh, _ = half.update(grads, half.init(params), params)
        uf, _ = full.update(grads, full.init(params), params)
        np.testing.assert_allclose(np.asarray(uh["a"]), np.asarray(uf["a"]),
                                   rtol=1e-6, atol=1e-9)

    def test_rebuild_after_accumulation_carries_non_sow(self):
        from sow_tpu.optim.ttadam import rebuild_tt_state_after_accumulation

        params, grads = self._grads_params()
        labels = {"a": "regular", "b": "sow"}
        spec = default_tt_spec(order=2, rank=8, min_dim=16)
        opt = ttadam(labels=labels, lrs={"regular": 1e-2, "sow": 1e-3},
                     layout="matrix", v_mode="factored", tt_spec=spec)
        state = opt.init(params)
        _, state = opt.update(grads, state, params)
        fresh = opt.init(params)
        merged = rebuild_tt_state_after_accumulation(state, fresh, labels)
        # regular: carried over (non-zero TT cores); sow: fresh zeros
        assert float(jnp.abs(merged.mu["a"].cores[0]).max()) > 0
        assert float(jnp.abs(merged.mu["b"].cores[0]).max()) == 0.0
        assert float(merged.count["a"]) == 1 and float(merged.count["b"]) == 0
        np.testing.assert_allclose(np.asarray(merged.nu["a"]["vr"]),
                                   np.asarray(state.nu["a"]["vr"]))
        assert float(jnp.abs(merged.nu["b"]["vr"]).max()) == 0.0
