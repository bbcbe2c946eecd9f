"""Int8 frozen-base quantization (nn/quant.py) — the TPU equivalent of the
reference's 8-bit base-model loading (run_glue.py:523-532, bitsandbytes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.models import forward, get_config, init_params
from sow_tpu.models.llama import LLAMA_FINETUNE_TARGET_MODULES
from sow_tpu.nn import SoWConfig, iter_sow, prepare_sow
from sow_tpu.nn.quant import QuantizedTensor, as_dense, quantize_int8


class TestQuantizedTensor:
    def test_roundtrip_error_bound(self):
        w = 0.02 * jax.random.normal(jax.random.PRNGKey(0), (256, 128))
        q = quantize_int8(w)
        err = jnp.abs(q.dequantize() - w)
        # symmetric absmax int8: error <= scale/2 per channel
        bound = jnp.expand_dims(q.scale, 0) / 2 + 1e-8
        assert bool((err <= bound).all())

    def test_memory_is_quarter(self):
        w = jnp.zeros((512, 512), jnp.float32)
        q = quantize_int8(w)
        dense_bytes = w.size * 4
        q_bytes = q.values.size * 1 + q.scale.size * 4
        assert q_bytes < 0.27 * dense_bytes

    def test_pytree_roundtrip(self):
        q = quantize_int8(jnp.ones((8, 16)))
        leaves, treedef = jax.tree_util.tree_flatten(q)
        assert len(leaves) == 2
        q2 = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_array_equal(np.asarray(q2.values), np.asarray(q.values))
        assert q2.axis == q.axis


class TestQuantizedBase:
    CFG = get_config("llama_test")

    def _params(self, quantize):
        base = init_params(jax.random.PRNGKey(0), self.CFG)
        return prepare_sow(
            base,
            SoWConfig(target_modules=LLAMA_FINETUNE_TARGET_MODULES, rank=4,
                      decompose="keep", quantize_base=quantize, zero_up=True),
            jax.random.PRNGKey(1),
        )

    def test_forward_close_to_fp32_base(self):
        ids = jnp.asarray(np.random.default_rng(0).integers(0, self.CFG.vocab_size, (2, 12)))
        ref = np.asarray(forward(self._params(False), ids, self.CFG))
        out = np.asarray(forward(self._params(True), ids, self.CFG))
        # int8 per-channel quantization of the frozen base: small logit drift
        assert np.abs(out - ref).max() < 0.05
        assert np.abs(out - ref).mean() < 0.01

    def test_base_is_int8(self):
        params = self._params(True)
        for _, layer in iter_sow(params):
            assert isinstance(layer.acc_down, QuantizedTensor)
            assert layer.acc_down.values.dtype == jnp.int8
            break

    def test_finetune_with_quantized_base(self):
        from sow_tpu.train.glue import GlueConfig, GlueTrainer

        params = self._params(True)

        def fwd(p, ids, mask):
            return forward(p, ids, self.CFG, mask)

        from sow_tpu.models.llama import causal_lm_loss

        tr = GlueTrainer(
            GlueConfig(task="commonsense", rank=4, sow_lr=1e-2,
                       accumulation_steps=8, num_training_steps=100),
            params, fwd, loss_fn=causal_lm_loss,
        )
        rng = np.random.default_rng(0)
        ids = rng.integers(2, self.CFG.vocab_size, (8, 16))
        losses = [
            tr.step(jnp.asarray(ids), jnp.asarray(np.ones_like(ids)), jnp.asarray(ids))
            for _ in range(20)
        ]
        # trains (crossing accumulation events at 8, 16), base stays int8
        assert np.mean(losses[-4:]) < np.mean(losses[:4])
        assert tr.n_accumulations == 2
        for _, layer in iter_sow(tr.params):
            assert isinstance(layer.acc_down, QuantizedTensor)
            break

    def test_quantize_requires_keep_mode(self):
        base = init_params(jax.random.PRNGKey(0), self.CFG)
        with pytest.raises(ValueError, match="keep"):
            prepare_sow(
                base,
                SoWConfig(target_modules=LLAMA_FINETUNE_TARGET_MODULES,
                          decompose=None, quantize_base=True),
                jax.random.PRNGKey(1),
            )
