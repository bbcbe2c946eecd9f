"""RoBERTa parity + surgery tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.models import roberta as rl
from sow_tpu.nn import SoWConfig, iter_sow, prepare_sow

CFG = rl.ROBERTA_CONFIGS["roberta-test"]
KEY = jax.random.PRNGKey(0)


class TestForward:
    def test_shapes(self):
        params = rl.init_params(KEY, CFG)
        ids = jax.random.randint(jax.random.PRNGKey(1), (3, 10), 2, CFG.vocab_size)
        logits = rl.forward(params, ids, CFG)
        assert logits.shape == (3, CFG.num_labels)

    def test_padding_invariance(self):
        params = rl.init_params(KEY, CFG)
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 2, CFG.vocab_size)
        padded = jnp.concatenate([ids, jnp.full((1, 4), CFG.pad_token_id)], axis=1)
        a = rl.forward(params, ids, CFG)
        b = rl.forward(params, padded, CFG)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_loss(self):
        logits = jnp.array([[2.0, -1.0], [0.0, 3.0]])
        labels = jnp.array([0, 1])
        assert float(rl.classification_loss(logits, labels)) < 0.1
        mse = rl.classification_loss(jnp.array([[1.5], [2.0]]), jnp.array([1.0, 2.0]), is_regression=True)
        assert float(mse) == pytest.approx(0.125)


@pytest.mark.slow
class TestHFParity:
    def test_logits_match_hf(self):
        torch = pytest.importorskip("torch")
        from transformers import RobertaConfig as HFConfig
        from transformers import RobertaForSequenceClassification

        hf_cfg = HFConfig(
            vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
            num_hidden_layers=CFG.num_hidden_layers, num_attention_heads=CFG.num_attention_heads,
            intermediate_size=CFG.intermediate_size, max_position_embeddings=CFG.max_position_embeddings,
            type_vocab_size=CFG.type_vocab_size, layer_norm_eps=CFG.layer_norm_eps,
            pad_token_id=CFG.pad_token_id, num_labels=CFG.num_labels,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = RobertaForSequenceClassification(hf_cfg).eval()
        params = rl.params_from_hf_state_dict(model.state_dict(), CFG)
        rng = np.random.default_rng(0)
        ids_np = rng.integers(2, CFG.vocab_size, (2, 12))
        ids_np[1, 8:] = CFG.pad_token_id  # exercise padding positions
        mask = (ids_np != CFG.pad_token_id).astype(np.int64)
        with torch.no_grad():
            ref = model(torch.tensor(ids_np), attention_mask=torch.tensor(mask)).logits.numpy()
        ours = np.asarray(rl.forward(params, jnp.asarray(ids_np), CFG, jnp.asarray(mask)))
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


class TestSurgery:
    def test_reference_target_set_matches(self):
        params = rl.init_params(KEY, CFG)
        cfg = SoWConfig(target_modules=rl.ROBERTA_TARGET_MODULES, rank=2, decompose="keep")
        out = prepare_sow(params, cfg, KEY)
        paths = [p for p, _ in iter_sow(out)]
        # per layer: query, key, value, attention.output.dense,
        # intermediate.dense, output.dense (suffix "output.dense" matches
        # both output denses — same as the reference's suffix rule)
        assert len(paths) == 6 * CFG.num_hidden_layers
        assert all("classifier" not in p for p in paths)

    def test_keep_mode_function_preserved_at_init_with_zero_scale(self):
        params = rl.init_params(KEY, CFG)
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 2, CFG.vocab_size)
        before = np.asarray(rl.forward(params, ids, CFG))
        cfg = SoWConfig(target_modules=rl.ROBERTA_TARGET_MODULES, rank=2, decompose="keep", scale=0.0)
        out = prepare_sow(params, cfg, KEY)
        after = np.asarray(rl.forward(out, ids, CFG))
        np.testing.assert_allclose(after, before, rtol=1e-4, atol=1e-4)
