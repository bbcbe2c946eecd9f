"""TT algebra parity tests — the numerics bedrock.

The reference has only assertion-free scripts (``tests/tt_test.py``,
``tests/tt_adam_update.py``); these tests turn those checks into hard gates:
round-trips, arithmetic, rounding, orthogonality, and the iterative
elementwise maps, all verified against dense numpy math.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.tt import TensorTrain
from sow_tpu.utils.numerics import generate_rank_k, pad_matrix

KEY = jax.random.PRNGKey(0)


def full_ranks(input_shape, output_shape):
    """Exact maximal TT bond ranks for lossless decomposition."""
    phys = [i * o for i, o in zip(input_shape, output_shape)]
    d = len(phys)
    return (
        [1]
        + [min(math.prod(phys[:k]), math.prod(phys[k:])) for k in range(1, d)]
        + [1]
    )


def dense_of(tt: TensorTrain) -> np.ndarray:
    return np.asarray(tt.reconstruct())


class TestRoundTrip:
    def test_from_tensor_reconstruct_exact_at_full_rank(self):
        shape_in, shape_out = (2, 2, 2), (3, 3, 3)
        tensor = jnp.arange(math.prod(shape_in + shape_out), dtype=jnp.float32).reshape(
            shape_in + shape_out
        )
        ranks = full_ranks(shape_in, shape_out)
        tt = TensorTrain.from_tensor(tensor, ranks)
        np.testing.assert_allclose(dense_of(tt), np.asarray(tensor), rtol=1e-4, atol=1e-4)

    def test_from_matrix_roundtrip_low_rank(self):
        # A genuinely low-rank matrix survives truncated TT decomposition.
        m, n, order, rank = 81, 81, 4, 4
        grad = generate_rank_k(KEY, (3, 3, 3, 3, 3, 3, 3, 3), 2, mix=2).reshape(m, n)
        ranks = [1] + [rank] * (order - 1) + [1]
        tt = TensorTrain.from_matrix(grad, ranks, padding=True)
        back = np.asarray(tt.to_matrix((m, n)))
        err = np.linalg.norm(back - np.asarray(grad)) / np.linalg.norm(np.asarray(grad))
        assert err < 0.5  # truncated: approximate, bounded

    def test_from_matrix_full_rank_exact(self):
        m, n, order = 16, 16, 2
        mat = jax.random.normal(KEY, (m, n))
        ranks = full_ranks((4, 4), (4, 4))
        tt = TensorTrain.from_matrix(mat, ranks, padding=True)
        np.testing.assert_allclose(
            np.asarray(tt.to_matrix((m, n))), np.asarray(mat), rtol=1e-4, atol=1e-4
        )

    def test_from_matrix_padding_non_power(self):
        # 10x37 has no exact order-2 root: padding path must engage.
        mat = jax.random.normal(KEY, (10, 37))
        tt = TensorTrain.from_matrix(mat, [1, 64, 1], padding=True)
        np.testing.assert_allclose(
            np.asarray(tt.to_matrix((10, 37))), np.asarray(mat), rtol=1e-3, atol=1e-4
        )

    def test_metadata(self):
        tt = TensorTrain.zeros([1, 4, 4, 1], (3, 3, 3), (5, 5, 5))
        assert tt.order == 3
        assert tt.ranks == (1, 4, 4, 1)
        assert tt.input_shape == (3, 3, 3)
        assert tt.output_shape == (5, 5, 5)
        assert tt.numel() == 1 * 3 * 5 * 4 + 4 * 3 * 5 * 4 + 4 * 3 * 5 * 1


class TestArithmetic:
    def setup_method(self, _):
        k1, k2 = jax.random.split(KEY)
        shape = (3, 3, 3, 3)  # (i0,i1,o0,o1)
        self.a = jax.random.normal(k1, shape)
        self.b = jax.random.normal(k2, shape)
        ranks = full_ranks((3, 3), (3, 3))
        self.tta = TensorTrain.from_tensor(self.a, ranks)
        self.ttb = TensorTrain.from_tensor(self.b, ranks)

    def test_add(self):
        np.testing.assert_allclose(
            dense_of(self.tta + self.ttb), np.asarray(self.a + self.b), rtol=1e-4, atol=1e-4
        )

    def test_sub(self):
        np.testing.assert_allclose(
            dense_of(self.tta - self.ttb), np.asarray(self.a - self.b), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize("c", [2.0, -3.0, 0.5, -0.25])
    def test_scalar_mul_sign_correct(self, c):
        # Even order — the reference implementation loses the sign here.
        np.testing.assert_allclose(
            dense_of(c * self.tta), c * np.asarray(self.a), rtol=1e-4, atol=1e-4
        )

    def test_hadamard(self):
        np.testing.assert_allclose(
            dense_of(self.tta * self.ttb), np.asarray(self.a * self.b), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize("c", [1.5, -2.0])
    def test_add_const(self, c):
        np.testing.assert_allclose(
            dense_of(self.tta.add_const(c)), np.asarray(self.a) + c, rtol=1e-4, atol=1e-4
        )

    def test_add_const_rank_growth_is_one(self):
        out = self.tta.add_const(1.0)
        assert all(r2 == r1 + 1 for r1, r2 in zip(self.tta.ranks[1:-1], out.ranks[1:-1]))

    def test_inner_full(self):
        expected = float(jnp.vdot(self.a, self.b))
        got = float(self.tta.inner(self.ttb, mode="full"))
        assert got == pytest.approx(expected, rel=1e-4)

    def test_norm_is_squared_frobenius(self):
        expected = float(jnp.vdot(self.a, self.a))
        assert float(self.tta.norm()) == pytest.approx(expected, rel=1e-4)


class TestRoundingOrtho:
    def setup_method(self, _):
        self.x = generate_rank_k(jax.random.PRNGKey(7), (4, 4, 4, 4), 2, mix=1)
        self.tt = TensorTrain.from_tensor(self.x, full_ranks((4, 4), (4, 4)))

    def test_round_preserves_low_rank_tensor(self):
        rounded = self.tt.round(4)
        np.testing.assert_allclose(dense_of(rounded), np.asarray(self.x), rtol=1e-3, atol=1e-3)
        assert max(rounded.ranks) <= 4

    def test_round_after_add_recovers(self):
        doubled = self.tt + self.tt
        assert max(doubled.ranks) > max(self.tt.ranks)
        rounded = doubled.round(like=self.tt)
        np.testing.assert_allclose(
            dense_of(rounded), 2 * np.asarray(self.x), rtol=1e-3, atol=1e-3
        )

    @pytest.mark.parametrize("mode", ["left", "right"])
    def test_orthogonalize_preserves_value(self, mode):
        ortho = self.tt.orthogonalize(mode=mode)
        np.testing.assert_allclose(dense_of(ortho), np.asarray(self.x), rtol=1e-4, atol=1e-4)

    def test_left_orthogonality_property(self):
        ortho = self.tt.orthogonalize(mode="left")
        for k in range(ortho.order - 1):
            l = np.asarray(ortho.left_matrix(k))
            np.testing.assert_allclose(l.T @ l, np.eye(l.shape[1]), atol=1e-4)


class TestIterativeMaps:
    def test_sqrt(self):
        # Positive, well-conditioned values.
        x = jax.random.uniform(KEY, (3, 3, 3, 3), minval=0.5, maxval=2.0)
        tt = TensorTrain.from_tensor(x, full_ranks((3, 3), (3, 3)))
        got = dense_of(tt.sqrt(max_iter=12))
        np.testing.assert_allclose(got, np.sqrt(np.asarray(x)), rtol=2e-2, atol=2e-2)

    def test_sqrtinv(self):
        x = jax.random.uniform(jax.random.PRNGKey(3), (3, 3, 3, 3), minval=0.5, maxval=2.0)
        tt = TensorTrain.from_tensor(x, full_ranks((3, 3), (3, 3)))
        got = dense_of(tt.sqrtinv(max_iter=20))
        np.testing.assert_allclose(got, 1.0 / np.sqrt(np.asarray(x)), rtol=2e-2, atol=2e-2)


class TestPytree:
    def test_jit_through(self):
        x = jax.random.normal(KEY, (3, 3, 3, 3))
        tt = TensorTrain.from_tensor(x, full_ranks((3, 3), (3, 3)))

        @jax.jit
        def f(t: TensorTrain):
            return (2.0 * t).reconstruct()

        np.testing.assert_allclose(np.asarray(f(tt)), 2 * np.asarray(x), rtol=1e-4, atol=1e-4)

    def test_grad_through_reconstruct(self):
        x = jax.random.normal(KEY, (2, 2, 2, 2))
        tt = TensorTrain.from_tensor(x, full_ranks((2, 2), (2, 2)))

        def loss(t: TensorTrain):
            return jnp.sum(t.reconstruct() ** 2)

        g = jax.grad(loss)(tt)
        assert isinstance(g, TensorTrain)
        assert all(gc.shape == c.shape for gc, c in zip(g.cores, tt.cores))

    def test_tree_map(self):
        tt = TensorTrain.ones([1, 2, 2, 1], (2, 2, 2), (2, 2, 2))
        doubled = jax.tree_util.tree_map(lambda c: c * 2, tt)
        assert isinstance(doubled, TensorTrain)
        assert float(doubled.cores[0][0, 0, 0, 0]) == 2.0


class TestDecomposeJit:
    def test_from_matrix_under_jit(self):
        mat = jax.random.normal(KEY, (16, 16))

        @jax.jit
        def f(m):
            return TensorTrain.from_matrix(m, [1, 8, 1], padding=True).to_matrix((16, 16))

        out = f(mat)
        assert out.shape == (16, 16)

    def test_compression_factor(self):
        # Ref tests/tt_adam_update.py:131-154 — the headline compression claim.
        m = n = 81
        order, rank = 4, 4
        ranks = [1] + [rank] * (order - 1) + [1]
        tt = TensorTrain.zeros(ranks, (3,) * order, (3,) * order)
        dense_params = 3 * m * n  # grad + m + v
        tt_params = 3 * tt.numel()
        assert dense_params / tt_params > 10  # reference prints ~“reduction factor”


class TestReciprocalAndFromCores:
    def test_from_cores_roundtrip(self):
        tt = TensorTrain.ones([1, 2, 2, 1], (2, 2, 2), (3, 3, 3))
        tt2 = TensorTrain.from_cores(tt.cores)
        np.testing.assert_array_equal(dense_of(tt), dense_of(tt2))

    def test_reciprocal_elementwise(self):
        x = jax.random.uniform(jax.random.PRNGKey(11), (3, 3, 3, 3), minval=0.5, maxval=2.0)
        tt = TensorTrain.from_tensor(x, full_ranks((3, 3), (3, 3)))
        got = dense_of(tt.reciprocal(max_iter=25))
        np.testing.assert_allclose(got, 1.0 / np.asarray(x), rtol=2e-2, atol=2e-2)


class TestRandDecomposeRobustness:
    def test_full_rank_decaying_spectrum_no_nan(self):
        """Regression: requesting a TT rank near the matrix dimension on an
        input with a fast-decaying spectrum (real first-moment gradients)
        left the power-iterated sketch columns nearly parallel; the fp32
        Gram went indefinite beyond the CholeskyQR ridge and XLA's cholesky
        returned NaN, permanently poisoning TT-Adam state (observed on-chip:
        tt_rank=128 at llama_9m NaN'd from step 0). The strong-ridge
        fallback in ``_rand_basis`` must keep the basis finite and the
        decomposition accurate."""
        from sow_tpu.tt import TensorTrain

        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        u, _ = jnp.linalg.qr(jax.random.normal(k1, (64, 64)))
        v, _ = jnp.linalg.qr(jax.random.normal(k2, (64, 64)))
        s = jnp.exp(-jnp.linspace(0.0, 16.0, 64))  # ~1e-7 dynamic range
        a = (u * s) @ v.T
        tt = TensorTrain.from_matrix(
            a, [1, 64, 1], padding=True, method="rand", layout="matrix"
        )
        rec = tt.to_matrix((64, 64))
        assert bool(jnp.isfinite(rec).all())
        err = jnp.linalg.norm(rec - a) / jnp.linalg.norm(a)
        # the strong-ridge fallback trades a little orthonormality for
        # finiteness on this adversarial spectrum; a few percent error in
        # the ~1e-7 tail is noise, NaN was the bug
        assert float(err) < 0.1, float(err)

    def test_ttadam_full_rank_real_gradient_no_nan(self):
        """Trainer-level pin: one TT-Adam step at tt_rank == hidden dim on a
        real backprop gradient stays finite (the shape that NaN'd)."""
        from sow_tpu.data.synthetic import affine_stream
        from sow_tpu.train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(
            model="llama_test", architecture="linear", optimizer="ttadam",
            batch_size=8, max_length=16, num_training_steps=4,
            lr=1e-3, dtype="float32", tt_rank=64,
        )
        tr = Trainer(cfg)
        data = affine_stream(8, 16, tr.model_cfg.vocab_size, seed=0)
        for _ in range(2):
            m = tr.step(jnp.asarray(next(data)["input_ids"]))
        assert bool(jnp.isfinite(jnp.asarray(m["loss"])))
        for leaf in jax.tree_util.tree_leaves(tr.opt_state):
            if hasattr(leaf, "dtype") and leaf.dtype.kind == "f":
                assert bool(jnp.isfinite(leaf).all())
