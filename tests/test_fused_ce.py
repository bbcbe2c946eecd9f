"""Fused cross-entropy kernel: interpret-mode parity with the XLA loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.models.llama import causal_lm_loss
from sow_tpu.ops.fused_ce import fused_causal_lm_loss, fused_ce_per_token


class TestFusedCE:
    def test_loss_parity_with_ignore(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 512)) * 3.0
        labels = jax.random.randint(jax.random.PRNGKey(1), (2, 17), 0, 512)
        labels = labels.at[:, 10:].set(-100)
        ref = float(causal_lm_loss(logits, labels))
        got = float(fused_causal_lm_loss(logits, labels, interpret=True))
        assert got == pytest.approx(ref, abs=1e-4)

    def test_grad_parity(self):
        logits = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 256)) * 2.0
        labels = jax.random.randint(jax.random.PRNGKey(3), (2, 9), 0, 256)
        g1 = jax.grad(lambda l: causal_lm_loss(l, labels))(logits)
        g2 = jax.grad(lambda l: fused_causal_lm_loss(l, labels, interpret=True))(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)

    def test_multi_vocab_tile_streaming(self):
        # vocab 1024 -> multiple BV tiles; online rescaling must hold
        logits = jax.random.normal(jax.random.PRNGKey(4), (4, 17, 1024)) * 5.0
        labels = jax.random.randint(jax.random.PRNGKey(5), (4, 17), 0, 1024)
        ref = float(causal_lm_loss(logits, labels))
        got = float(fused_causal_lm_loss(logits, labels, interpret=True))
        assert got == pytest.approx(ref, abs=1e-4)

    def test_extreme_logits_stable(self):
        logits = jnp.zeros((1, 9, 256)).at[0, :, 7].set(1e4)
        labels = jnp.full((1, 9), 7)
        got = float(fused_causal_lm_loss(logits, labels, interpret=True))
        assert got == pytest.approx(0.0, abs=1e-3)  # certain prediction

    def test_all_ignored_zero(self):
        logits = jax.random.normal(jax.random.PRNGKey(6), (1, 9, 128))
        labels = jnp.full((1, 9), -100)
        assert float(fused_causal_lm_loss(logits, labels, interpret=True)) == 0.0

    def test_per_token_api(self):
        logits = jax.random.normal(jax.random.PRNGKey(7), (16, 128))
        tgt = jax.random.randint(jax.random.PRNGKey(8), (16,), 0, 128).astype(jnp.int32)
        nll = fused_ce_per_token(logits, tgt, jnp.ones((16,)), True)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        ref = lse - jnp.take_along_axis(logits, tgt[:, None], 1)[:, 0]
        np.testing.assert_allclose(np.asarray(nll), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestShardedFusedCE:
    def test_matches_xla_loss_on_8_device_mesh(self):
        from sow_tpu.ops.fused_ce import fused_causal_lm_loss_sharded
        from sow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(4, 2, 1)
        logits = jax.random.normal(jax.random.PRNGKey(0), (8, 9, 256)) * 2.0
        labels = jax.random.randint(jax.random.PRNGKey(1), (8, 9), 0, 256)
        labels = labels.at[:, 6:].set(-100)
        ref = float(causal_lm_loss(logits, labels))
        got = float(
            fused_causal_lm_loss_sharded(logits, labels, mesh, interpret=True)
        )
        assert got == pytest.approx(ref, abs=1e-4)

    def test_grads_match_on_mesh(self):
        from sow_tpu.ops.fused_ce import fused_causal_lm_loss_sharded
        from sow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, 1, 1)
        logits = jax.random.normal(jax.random.PRNGKey(2), (8, 9, 128))
        labels = jax.random.randint(jax.random.PRNGKey(3), (8, 9), 0, 128)
        g1 = jax.grad(lambda l: causal_lm_loss(l, labels))(logits)
        g2 = jax.grad(
            lambda l: fused_causal_lm_loss_sharded(l, labels, mesh, interpret=True)
        )(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)


class TestVocabShardedFusedCE:
    def test_vocab_sharded_matches_xla(self):
        from sow_tpu.ops.fused_ce import fused_causal_lm_loss_sharded
        from sow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(2, 2, 2)  # vocab split 2 ways over 'model'
        logits = jax.random.normal(jax.random.PRNGKey(5), (8, 9, 256)) * 3.0
        labels = jax.random.randint(jax.random.PRNGKey(6), (8, 9), 0, 256)
        labels = labels.at[:, 6:].set(-100)
        ref = float(causal_lm_loss(logits, labels))
        got = float(fused_causal_lm_loss_sharded(logits, labels, mesh, interpret=True))
        assert got == pytest.approx(ref, abs=1e-4)

    def test_vocab_sharded_grads_match(self):
        from sow_tpu.ops.fused_ce import fused_causal_lm_loss_sharded
        from sow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(2, 1, 4)  # 4-way vocab shards
        logits = jax.random.normal(jax.random.PRNGKey(7), (4, 9, 512))
        labels = jax.random.randint(jax.random.PRNGKey(8), (4, 9), 0, 512)
        g1 = jax.grad(lambda l: causal_lm_loss(l, labels))(logits)
        g2 = jax.grad(
            lambda l: fused_causal_lm_loss_sharded(l, labels, mesh, interpret=True)
        )(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)
