"""Reassociated-backward SoW matmul: value + gradient parity vs plain
autodiff of the folded formula."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.nn.sow import SoWLinear
from sow_tpu.ops.sow_matmul import sow_linear, sow_matmul, sow_matmul_nobase

KEY = jax.random.PRNGKey(0)
M, K, N, NR = 16, 32, 24, 8


def rand(key, shape, s=0.1):
    return s * jax.random.normal(key, shape)


class TestValueParity:
    def test_with_base(self):
        ks = jax.random.split(KEY, 4)
        x, d2, u2, wb = rand(ks[0], (M, K)), rand(ks[1], (K, NR)), rand(ks[2], (NR, N)), rand(ks[3], (K, N))
        got = sow_matmul(x, d2, u2, wb, jnp.float32(0.7))
        want = x @ (wb + 0.7 * d2 @ u2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_nobase(self):
        ks = jax.random.split(KEY, 3)
        x, d2, u2 = rand(ks[0], (M, K)), rand(ks[1], (K, NR)), rand(ks[2], (NR, N))
        got = sow_matmul_nobase(x, d2, u2, jnp.float32(1.3))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(x @ (1.3 * d2 @ u2)), rtol=1e-4, atol=1e-5
        )


class TestGradParity:
    def _check(self, with_base: bool):
        ks = jax.random.split(jax.random.PRNGKey(3), 5)
        x, d2, u2 = rand(ks[0], (M, K)), rand(ks[1], (K, NR)), rand(ks[2], (NR, N))
        wb = rand(ks[3], (K, N))
        t = rand(ks[4], (M, N))  # random cotangent direction via loss

        if with_base:
            def f_custom(x, d2, u2):
                return jnp.sum(sow_matmul(x, d2, u2, wb, jnp.float32(0.7)) * t)

            def f_ref(x, d2, u2):
                return jnp.sum((x @ (wb + 0.7 * d2 @ u2)) * t)
        else:
            def f_custom(x, d2, u2):
                return jnp.sum(sow_matmul_nobase(x, d2, u2, jnp.float32(0.7)) * t)

            def f_ref(x, d2, u2):
                return jnp.sum((x @ (0.7 * d2 @ u2)) * t)

        g1 = jax.grad(f_custom, argnums=(0, 1, 2))(x, d2, u2)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, d2, u2)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_with_base(self):
        self._check(True)

    def test_nobase(self):
        self._check(False)

    def test_frozen_base_gets_zero_grad(self):
        ks = jax.random.split(KEY, 4)
        x, d2, u2, wb = rand(ks[0], (M, K)), rand(ks[1], (K, NR)), rand(ks[2], (NR, N)), rand(ks[3], (K, N))
        g = jax.grad(lambda w: jnp.sum(sow_matmul(x, d2, u2, w, jnp.float32(1.0))))(wb)
        assert float(jnp.abs(g).max()) == 0.0


class TestLayerIntegration:
    def test_layer_call_matches_folded_path(self):
        layer = SoWLinear.create(KEY, K, N, rank=4, n_iter=2, scale=0.5)
        acc = rand(jax.random.PRNGKey(9), (K, N))
        layer = dataclasses.replace(layer, acc_down=acc)
        x = rand(jax.random.PRNGKey(10), (5, K))
        np.testing.assert_allclose(
            np.asarray(layer(x)), np.asarray(layer.call_folded(x)), rtol=1e-4, atol=1e-5
        )

    def test_layer_grads_match_folded_path(self):
        layer = SoWLinear.create(KEY, K, N, rank=4, n_iter=2, scale=0.5)
        x = rand(jax.random.PRNGKey(11), (5, K))

        g1 = jax.grad(lambda l: jnp.sum(l(x) ** 2))(layer)
        g2 = jax.grad(lambda l: jnp.sum(l.call_folded(x) ** 2))(layer)
        np.testing.assert_allclose(np.asarray(g1.down), np.asarray(g2.down), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1.up), np.asarray(g2.up), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1.bias), np.asarray(g2.bias), rtol=1e-4, atol=1e-5)

    def test_3d_input(self):
        layer = SoWLinear.create(KEY, K, N, rank=4, n_iter=1)
        x = rand(jax.random.PRNGKey(12), (2, 7, K))
        assert layer(x).shape == (2, 7, N)

    def test_factored_acc(self):
        layer = SoWLinear.create(KEY, K, N, rank=4, n_iter=1)
        layer = layer.accumulate(jax.random.PRNGKey(13))  # factored base
        x = rand(jax.random.PRNGKey(14), (5, K))
        np.testing.assert_allclose(
            np.asarray(layer(x)), np.asarray(layer.call_folded(x)), rtol=1e-4, atol=1e-5
        )


class TestPathSelection:
    def test_heuristics(self):
        from sow_tpu.ops.sow_matmul import _factored_wins, _reassoc_wins

        # 7B finetune shapes at r=8: both low-rank paths win decisively
        assert _reassoc_wins(4096, 11008, 8)
        assert _factored_wins(4096, 11008, 8)
        # llama-60m pretraining at r=50 (pad 128): factored yes, reassoc no
        assert _factored_wins(512, 1376, 50)
        assert not _reassoc_wins(512, 1376, 50)
        # square small layer at r=50: neither (fold is byte-parity optimal)
        assert not _factored_wins(512, 512, 50)
        assert not _reassoc_wins(512, 512, 50)
        # huge rank: everything folds
        assert not _factored_wins(512, 1376, 512)
