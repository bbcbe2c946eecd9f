"""Pipeline parallelism tests (GPipe schedule in shard_map over a
``stage`` mesh axis). Correctness = exact parity with the non-pipelined
reference on the same params/data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.data.synthetic import affine_stream
from sow_tpu.models import forward, get_config, init_params
from sow_tpu.models import llama as llama_lib
from sow_tpu.parallel.pipeline import (
    PipelineTrainer,
    from_pipeline_params,
    make_pipeline_mesh,
    pipeline_forward_loss,
    to_pipeline_params,
)
from sow_tpu.train.trainer import TrainConfig, Trainer

CFG = get_config("llama_test")  # 2 layers


def ref_loss(params, ids_flat, mask_flat):
    logits = forward(params, ids_flat, CFG, mask_flat)
    labels = jnp.where(mask_flat.astype(bool), ids_flat, -100)
    return llama_lib.causal_lm_loss(logits, labels)


@pytest.mark.slow
class TestPipelineForward:
    def test_loss_matches_reference(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        mesh = make_pipeline_mesh(2, 2, devices=jax.devices()[:4])
        pp = to_pipeline_params(params)
        rng = np.random.RandomState(0)
        ids = jnp.asarray(rng.randint(2, CFG.vocab_size, (3, 4, 16)), jnp.int32)
        mask = jnp.ones_like(ids)
        got = pipeline_forward_loss(pp, ids, mask, CFG, mesh, n_stages=2)
        want = ref_loss(params, ids.reshape(12, 16), mask.reshape(12, 16))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_grads_match_reference(self):
        params = init_params(jax.random.PRNGKey(1), CFG)
        mesh = make_pipeline_mesh(1, 2, devices=jax.devices()[:2])
        pp = to_pipeline_params(params)
        rng = np.random.RandomState(1)
        ids = jnp.asarray(rng.randint(2, CFG.vocab_size, (2, 2, 16)), jnp.int32)
        mask = jnp.ones_like(ids)

        g_pp = jax.grad(
            lambda p: pipeline_forward_loss(p, ids, mask, CFG, mesh, n_stages=2)
        )(pp)
        g_ref = jax.grad(
            lambda p: ref_loss(p, ids.reshape(4, 16), mask.reshape(4, 16))
        )(params)
        g_pp_std = from_pipeline_params(g_pp, CFG.num_hidden_layers)
        flat_pp = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_leaves_with_path(g_pp_std)
        }
        for p, r in jax.tree_util.tree_leaves_with_path(g_ref):
            v = flat_pp[jax.tree_util.keystr(p)]
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(r), rtol=1e-4, atol=1e-6
            )

    def test_roundtrip_layout(self):
        params = init_params(jax.random.PRNGKey(2), CFG)
        back = from_pipeline_params(to_pipeline_params(params), CFG.num_hidden_layers)
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back),
        ):
            assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def make_cfg(**overrides):
    return TrainConfig(
        model="llama_test",
        architecture=overrides.pop("architecture", "sow"),
        lr=1e-3,
        sow_lr=1e-3,
        rank=4,
        num_training_steps=50,
        sow_accumulation=overrides.pop("sow_accumulation", 0),
        batch_size=8,
        max_length=16,
        dtype="float32",
        gradient_accumulation=overrides.pop("gradient_accumulation", 4),
        embed_optimizer="adamw",  # match PipelineTrainer's plain grouped AdamW
        **overrides,
    )


@pytest.mark.slow
class TestPipelineTrainer:
    def _losses(self, trainer, steps=6):
        data = affine_stream(8, 16, CFG.vocab_size, seed=0)
        out = []
        for _ in range(steps):
            batch = next(data)
            out.append(float(trainer.step(jnp.asarray(batch["input_ids"]))["loss"]))
        return out

    def test_matches_standard_trainer(self):
        """PP=2 x DP=2 == the standard trainer, step for step (fp32).

        Identical init (same seed/key layout) and identical optimizer; the
        only difference is the pipeline's global token-mean vs the scan
        accumulator's mean-of-means — equal under the full masks used here.
        """
        from sow_tpu.parallel.mesh import make_mesh

        cfg = make_cfg()
        ref = Trainer(cfg, mesh=make_mesh(1, 1, 1, devices=jax.devices()[:1]))
        pp = PipelineTrainer(cfg, n_stages=2, mesh=make_pipeline_mesh(2, 2, devices=jax.devices()[:4]))
        l_ref = self._losses(ref)
        l_pp = self._losses(pp)
        np.testing.assert_allclose(l_pp, l_ref, rtol=1e-5, atol=1e-6)

    def test_accumulation_event_parity(self):
        """The SoW accumulation event (unstack -> accumulate -> restack +
        optimizer-group reset) stays in lockstep with the standard trainer."""
        from sow_tpu.parallel.mesh import make_mesh

        cfg = make_cfg(sow_accumulation=3)
        ref = Trainer(cfg, mesh=make_mesh(1, 1, 1, devices=jax.devices()[:1]))
        pp = PipelineTrainer(cfg, n_stages=2, mesh=make_pipeline_mesh(1, 2, devices=jax.devices()[:2]))
        l_ref = self._losses(ref, steps=7)
        l_pp = self._losses(pp, steps=7)
        assert ref.update_step == pp.update_step == 7
        # bases materialized on both sides
        from sow_tpu.nn import iter_sow

        assert any(l.acc_down is not None for _, l in iter_sow(ref.params))
        assert any(l.acc_down is not None for _, l in iter_sow(pp.standard_params))
        np.testing.assert_allclose(l_pp, l_ref, rtol=1e-5, atol=1e-6)

    def test_dense_architecture(self):
        cfg = make_cfg(architecture="linear")
        pp = PipelineTrainer(cfg, n_stages=2, mesh=make_pipeline_mesh(1, 2, devices=jax.devices()[:2]))
        losses = self._losses(pp, steps=5)
        assert losses[-1] < losses[0]

    def test_evaluate(self):
        cfg = make_cfg()
        pp = PipelineTrainer(cfg, n_stages=2, mesh=make_pipeline_mesh(2, 2, devices=jax.devices()[:4]))
        data = affine_stream(8, 16, CFG.vocab_size, seed=3)
        batches = [{"input_ids": jnp.asarray(next(data)["input_ids"])} for _ in range(2)]
        out = pp.evaluate(iter(batches), max_tokens=10_000)
        assert out["eval_loss"] > 0 and out["eval_tokens"] > 0
        # the jitted eval program is cached on the trainer (a fresh closure
        # per call would recompile the whole pipeline at every eval interval)
        fn_first = pp._eval_fn
        pp.evaluate(iter(batches), max_tokens=10_000)
        assert pp._eval_fn is fn_first

    def test_opt_state_interop_with_standard_trainer(self, tmp_path):
        """A pipeline-saved checkpoint restores Adam moments into the
        standard Trainer (and back): moments persist in the standard layout
        rather than under stacked_layers keypaths, which the other trainer
        would silently drop (zeroing mu/nu on resume)."""
        import warnings

        from sow_tpu.checkpoint import (
            latest_checkpoint,
            restore_opt_state,
            save_checkpoint,
        )
        from sow_tpu.parallel.mesh import make_mesh

        cfg = make_cfg()
        pp = PipelineTrainer(cfg, n_stages=2, mesh=make_pipeline_mesh(1, 2, devices=jax.devices()[:2]))
        self._losses(pp, steps=3)  # put real (nonzero) moments in the state
        save_checkpoint(
            str(tmp_path), 3, pp.standard_params, pp.standard_opt_state,
        )
        ckpt = latest_checkpoint(str(tmp_path))

        # -> standard trainer: every trained moment must map (no warning)
        ref = Trainer(cfg, mesh=make_mesh(1, 1, 1, devices=jax.devices()[:1]))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            restored = restore_opt_state(ref.opt_state, ckpt)
        src = {
            jax.tree_util.keystr(p): np.asarray(l)
            for p, l in jax.tree_util.tree_flatten_with_path(pp.standard_opt_state.mu)[0]
        }
        n_checked = 0
        for p, leaf in jax.tree_util.tree_flatten_with_path(restored.mu)[0]:
            arr = np.asarray(leaf)
            if arr.ndim == 0:
                continue  # frozen-group placeholder
            np.testing.assert_allclose(arr, src[jax.tree_util.keystr(p)], rtol=1e-6)
            if np.abs(arr).sum() > 0:
                n_checked += 1
        assert n_checked > 0, "no nonzero moments restored — interop is broken"

        # -> back into a fresh pipeline trainer
        pp2 = PipelineTrainer(cfg, n_stages=2, mesh=make_pipeline_mesh(1, 2, devices=jax.devices()[:2]))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pp2.load_standard_opt_state(restore_opt_state(pp2.standard_opt_state, ckpt))
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(pp2.opt_state.mu)[0],
            jax.tree_util.tree_flatten_with_path(pp.opt_state.mu)[0],
        ):
            assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
