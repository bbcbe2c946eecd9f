"""GaLore projected-AdamW tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.optim.adamw import apply_updates
from sow_tpu.optim.galore import galore_adamw
from sow_tpu.utils.numerics import generate_rank_k


class TestGaLore:
    def test_state_memory_reduction(self):
        params = {"w": jnp.zeros((2048, 512))}
        opt = galore_adamw(rank=128)
        s = opt.init(params)
        dense_bytes = 2 * 2048 * 512 * 4
        galore_bytes = (s.mu["w"].size + s.nu["w"].size + s.proj["w"].size) * 4
        assert galore_bytes < 0.3 * dense_bytes

    def test_small_leaves_plain_adam(self):
        params = {"b": jnp.zeros((64,)), "small": jnp.zeros((8, 8))}
        opt = galore_adamw(rank=128)
        s = opt.init(params)
        assert s.mu["b"].shape == (64,)
        assert s.mu["small"].shape == (8, 8)
        g = {"b": jnp.ones((64,)), "small": jnp.ones((8, 8))}
        u, s = opt.update(g, s, params)
        assert float(jnp.abs(u["b"]).max()) > 0

    def test_update_in_gradient_subspace(self):
        # rank-4 gradient, rank-4 projector: the update must lie exactly in
        # the gradient's column space. (With projector rank > true rank,
        # Adam's sign normalization amplifies fp32 SVD noise in the junk
        # directions — inherent to the GaLore scheme, so the test pins the
        # exact-rank case.)
        g = generate_rank_k(jax.random.PRNGKey(0), (81, 81), 4)
        params = {"w": jnp.zeros((81, 81))}
        opt = galore_adamw(rank=4, min_dim=16, scale=1.0)
        s = opt.init(params)
        u, s = opt.update({"w": g}, s, params)
        ug, sv, vt = np.linalg.svd(np.asarray(g, np.float64), full_matrices=False)
        basis = ug[:, :4]
        resid = np.asarray(u["w"], np.float64) - basis @ (basis.T @ np.asarray(u["w"], np.float64))
        assert np.linalg.norm(resid) < 1e-3 * np.linalg.norm(np.asarray(u["w"]))

    def test_projector_refresh_cadence(self):
        params = {"w": jnp.zeros((64, 64))}
        opt = galore_adamw(rank=4, update_proj_gap=3, min_dim=16)
        s = opt.init(params)
        g1 = {"w": generate_rank_k(jax.random.PRNGKey(1), (64, 64), 2)}
        g2 = {"w": generate_rank_k(jax.random.PRNGKey(2), (64, 64), 2)}
        _, s = opt.update(g1, s, params)  # step 1: refresh (step0 % 3 == 0)
        p1 = np.asarray(s.proj["w"])
        _, s = opt.update(g2, s, params)  # step 2: no refresh
        np.testing.assert_array_equal(np.asarray(s.proj["w"]), p1)
        _, s = opt.update(g2, s, params)  # step 3: no refresh
        np.testing.assert_array_equal(np.asarray(s.proj["w"]), p1)
        _, s = opt.update(g2, s, params)  # step 4: refresh (step3 % 3 == 0)
        assert np.abs(np.asarray(s.proj["w"]) - p1).max() > 1e-6

    def test_optimizes_quadratic(self):
        target = generate_rank_k(jax.random.PRNGKey(3), (64, 64), 4)
        params = {"w": jnp.zeros((64, 64))}
        opt = galore_adamw(lr=0.05, rank=8, min_dim=16, scale=1.0, update_proj_gap=10)
        s = opt.init(params)

        @jax.jit
        def step(p, s):
            g = jax.tree_util.tree_map(lambda w: w - target, p)
            u, s = opt.update(g, s, p)
            return apply_updates(p, u), s

        loss0 = float(jnp.sum((params["w"] - target) ** 2))
        for _ in range(50):
            params, s = step(params, s)
        loss1 = float(jnp.sum((params["w"] - target) ** 2))
        assert loss1 < 0.5 * loss0
