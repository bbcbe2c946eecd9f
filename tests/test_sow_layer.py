"""SoW layer + surgery semantics tests.

Covers the invariants the reference only establishes implicitly through
training runs: folded-vs-unfolded forward equality, accumulate continuity,
virtual-rank growth, decompose modes, suffix matching, and gradient flow.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.nn import (
    SoWConfig,
    SoWLinear,
    accumulate,
    iter_sow,
    linear_apply,
    param_labels,
    prepare_sow,
    set_sow_scale,
    sow_from_kernel,
    sow_forward_unfolded,
)

KEY = jax.random.PRNGKey(0)
IN, OUT, RANK, N_ITER = 32, 48, 4, 3


def blank_layer(scale=1.0, **kw):
    return SoWLinear.create(
        KEY, IN, OUT, rank=RANK, n_iter=N_ITER, scale=scale, **kw
    )


class TestForward:
    def test_folded_equals_unfolded_blank(self):
        layer = blank_layer(scale=0.7)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, IN))
        np.testing.assert_allclose(
            np.asarray(layer(x)), np.asarray(sow_forward_unfolded(layer, x)),
            rtol=1e-4, atol=1e-5,
        )

    def test_folded_equals_unfolded_with_dense_acc(self):
        layer = blank_layer()
        acc = jax.random.normal(jax.random.PRNGKey(2), (IN, OUT))
        layer = dataclasses.replace(layer, acc_down=acc, acc_up=None)
        x = jax.random.normal(jax.random.PRNGKey(3), (5, IN))
        np.testing.assert_allclose(
            np.asarray(layer(x)), np.asarray(sow_forward_unfolded(layer, x)),
            rtol=1e-4, atol=1e-4,
        )

    def test_folded_equals_unfolded_with_factored_acc(self):
        layer = blank_layer()
        vr = 10
        ad = jax.random.normal(jax.random.PRNGKey(4), (IN, vr))
        au = jax.random.normal(jax.random.PRNGKey(5), (vr, OUT))
        layer = dataclasses.replace(layer, acc_down=ad, acc_up=au)
        x = jax.random.normal(jax.random.PRNGKey(6), (5, IN))
        np.testing.assert_allclose(
            np.asarray(layer(x)), np.asarray(sow_forward_unfolded(layer, x)),
            rtol=1e-4, atol=1e-4,
        )

    def test_matches_explicit_pair_sum(self):
        layer = blank_layer(scale=2.0)
        x = jax.random.normal(jax.random.PRNGKey(7), (5, IN))
        expected = sum(
            2.0 * (x @ layer.down[i]) @ layer.up[i] for i in range(N_ITER)
        ) + layer.bias
        np.testing.assert_allclose(
            np.asarray(layer(x)), np.asarray(expected), rtol=1e-4, atol=1e-5
        )

    def test_normal_qr_init_orthonormal_columns(self):
        # normal_QR init: each A_i has orthonormal columns (Q of a QR).
        layer = blank_layer()
        for i in range(N_ITER):
            a = np.asarray(layer.down[i], dtype=np.float64)
            np.testing.assert_allclose(a.T @ a, np.eye(RANK), atol=1e-4)


class TestAccumulate:
    def test_continuity_dense(self):
        # Reference invariant (sow.py:157-178): output unchanged right after
        # accumulation because B resets to zero and acc absorbs the fold.
        # virtual_rank pinned to min(in, out) — the prepare_sow default
        # (prepare.py:120) — so accumulate folds to a dense base.
        layer = dataclasses.replace(blank_layer(scale=0.5), virtual_rank=min(IN, OUT))
        x = jax.random.normal(jax.random.PRNGKey(8), (5, IN))
        before = np.asarray(layer(x))
        layer2 = layer.accumulate(jax.random.PRNGKey(9))
        after = np.asarray(layer2(x))
        np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-5)
        assert layer2.acc_down is not None and layer2.acc_up is None
        assert float(jnp.abs(layer2.up).max()) == 0.0

    def test_continuity_growing(self):
        layer = blank_layer(scale=0.5)
        assert layer.virtual_rank == RANK * N_ITER
        x = jax.random.normal(jax.random.PRNGKey(10), (5, IN))
        before = np.asarray(layer(x))
        layer2 = layer.accumulate(jax.random.PRNGKey(11))
        # First fold has true rank <= rank*n_iter == virtual_rank, so the
        # truncated QR is exact and continuity holds.
        np.testing.assert_allclose(np.asarray(layer2(x)), before, rtol=1e-3, atol=1e-4)
        assert layer2.acc_up is not None  # factored base
        assert layer2.acc_down.shape == (IN, RANK * N_ITER)
        assert layer2.virtual_rank == 2 * RANK * N_ITER

    def test_virtual_rank_caps_at_min_dim(self):
        layer = blank_layer()
        for step in range(5):
            layer = layer.accumulate(jax.random.PRNGKey(20 + step))
        assert layer.virtual_rank == min(IN, OUT)
        # Once capped, base goes dense.
        layer = layer.accumulate(jax.random.PRNGKey(30))
        assert layer.acc_up is None
        assert layer.acc_down.shape == (IN, OUT)

    def test_second_accumulate_absorbs_training(self):
        layer = blank_layer()
        layer = layer.accumulate(jax.random.PRNGKey(12))
        # emulate a training change to the factors
        layer = dataclasses.replace(
            layer,
            up=jax.random.normal(jax.random.PRNGKey(13), layer.up.shape) * 0.1,
        )
        x = jax.random.normal(jax.random.PRNGKey(14), (5, IN))
        before = np.asarray(layer(x))
        layer2 = layer.accumulate(jax.random.PRNGKey(15))
        np.testing.assert_allclose(np.asarray(layer2(x)), before, rtol=1e-3, atol=1e-4)


class TestDecomposeModes:
    def setup_method(self, _):
        self.kernel = jax.random.normal(jax.random.PRNGKey(16), (IN, OUT)) * 0.1
        self.bias = jnp.zeros((OUT,))

    def test_keep_freezes_kernel(self):
        cfg = SoWConfig(target_modules=("w",), rank=RANK, n_iter=1, decompose="keep")
        layer = sow_from_kernel(KEY, self.kernel, self.bias, cfg)
        np.testing.assert_allclose(np.asarray(layer.acc_down), np.asarray(self.kernel))
        assert layer.acc_up is None
        assert layer.virtual_rank == min(IN, OUT)

    def test_qr_reconstructs_kernel(self):
        # acc + sum A_i B_i == Q R == kernel exactly (scale=1, prepare.py:122-147).
        cfg = SoWConfig(target_modules=("w",), rank=RANK, n_iter=1, decompose="qr")
        layer = sow_from_kernel(KEY, self.kernel, self.bias, cfg)
        w_eff = np.asarray(layer.effective_weight())
        np.testing.assert_allclose(w_eff, np.asarray(self.kernel), rtol=1e-3, atol=1e-4)

    def test_none_mode_blank(self):
        cfg = SoWConfig(target_modules=("w",), rank=RANK, decompose=None)
        layer = sow_from_kernel(KEY, self.kernel, self.bias, cfg)
        assert layer.acc_down is None and layer.acc_up is None


def toy_params():
    k = jax.random.PRNGKey(17)

    def lin(key, i, o):
        return {"kernel": jax.random.normal(key, (i, o)) * 0.1, "bias": jnp.zeros((o,))}

    ks = jax.random.split(k, 4)
    return {
        "blocks": {
            "0": {"attn": {"q_proj": lin(ks[0], 16, 16), "o_proj": lin(ks[1], 16, 16)}},
            "1": {"attn": {"q_proj": lin(ks[2], 16, 16), "o_proj": lin(ks[3], 16, 16)}},
        },
        "head": lin(jax.random.PRNGKey(18), 16, 8),
    }


class TestSurgery:
    def test_suffix_match_replaces_targets_only(self):
        params = toy_params()
        cfg = SoWConfig(target_modules=("q_proj",), rank=2, decompose="keep")
        out = prepare_sow(params, cfg, KEY)
        paths = [p for p, _ in iter_sow(out)]
        assert sorted(paths) == ["blocks.0.attn.q_proj", "blocks.1.attn.q_proj"]
        assert "kernel" in out["blocks"]["0"]["attn"]["o_proj"]
        assert "kernel" in out["head"]

    def test_no_match_raises(self):
        with pytest.raises(ValueError, match="no linear matched"):
            prepare_sow(toy_params(), SoWConfig(target_modules=("nope",)), KEY)

    def test_keep_mode_preserves_function_approximately(self):
        params = toy_params()
        x = jax.random.normal(jax.random.PRNGKey(19), (3, 16))
        before = np.asarray(linear_apply(params["blocks"]["0"]["attn"]["q_proj"], x))
        cfg = SoWConfig(target_modules=("q_proj",), rank=2, decompose="qr")
        out = prepare_sow(params, cfg, KEY)
        after = np.asarray(linear_apply(out["blocks"]["0"]["attn"]["q_proj"], x))
        np.testing.assert_allclose(after, before, rtol=1e-3, atol=1e-4)

    def test_accumulate_tree_and_scale(self):
        params = prepare_sow(
            toy_params(), SoWConfig(target_modules=("q_proj",), rank=2, decompose=None), KEY
        )
        params = accumulate(params, jax.random.PRNGKey(21))
        for _, layer in iter_sow(params):
            assert layer.acc_down is not None
        params = set_sow_scale(params, 1 / 2)
        for _, layer in iter_sow(params):
            assert float(layer.scale) == 0.5

    def test_param_labels(self):
        params = prepare_sow(
            toy_params(), SoWConfig(target_modules=("q_proj",), rank=2, decompose="keep"), KEY
        )
        labels = param_labels(params)
        layer_labels = labels["blocks"]["0"]["attn"]["q_proj"]
        assert layer_labels.down == "sow" and layer_labels.up == "sow"
        assert layer_labels.acc_down == "frozen"
        assert layer_labels.bias == "regular"
        assert labels["head"]["kernel"] == "regular"
        # Same treedef as params (required by optax.multi_transform).
        assert jax.tree_util.tree_structure(labels) == jax.tree_util.tree_structure(params)


class TestGradients:
    def test_grads_flow_to_factors_not_acc(self):
        layer = blank_layer().accumulate(jax.random.PRNGKey(22))
        x = jax.random.normal(jax.random.PRNGKey(23), (4, IN))

        def loss(l):
            return jnp.sum(l(x) ** 2)

        g = jax.grad(loss)(layer)
        assert float(jnp.abs(g.down).max()) == 0.0  # up is zero post-accumulate
        assert float(jnp.abs(g.up).max()) > 0.0
        assert float(jnp.abs(g.acc_down).max()) == 0.0  # stop_gradient
        assert float(jnp.abs(g.scale)) == 0.0

    def test_jit_forward(self):
        layer = blank_layer()
        x = jax.random.normal(jax.random.PRNGKey(24), (4, IN))
        f = jax.jit(lambda l, x: l(x))
        np.testing.assert_allclose(np.asarray(f(layer, x)), np.asarray(layer(x)), rtol=1e-5)
