"""Context parallelism (the mesh "seq" axis): activations shard over the
token axis; attention all-gathers K/V per layer (models/llama.py
``seq_shard``). Runs on the 8 virtual CPU devices; correctness is checked
against the identical single-axis (replicated-seq) run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.data.synthetic import affine_stream
from sow_tpu.parallel.mesh import make_mesh
from sow_tpu.train.trainer import TrainConfig, Trainer


def cp_trainer(seq, data=1, fsdp=1, model=1, **overrides):
    n = data * fsdp * model * seq
    mesh = make_mesh(data, fsdp, model, seq, devices=jax.devices()[:n])
    cfg = TrainConfig(
        model="llama_test",
        architecture=overrides.pop("architecture", "sow"),
        lr=1e-3,
        sow_lr=1e-3,
        rank=4,
        num_training_steps=50,
        sow_accumulation=0,
        batch_size=4,
        max_length=32,
        dtype="float32",
        mesh_data=data,
        mesh_fsdp=fsdp,
        mesh_model=model,
        mesh_seq=seq,
        **overrides,
    )
    return Trainer(cfg, mesh=mesh)


def losses(trainer, steps=4):
    data = affine_stream(4, 32, trainer.model_cfg.vocab_size, seed=0)
    out = []
    for _ in range(steps):
        batch = next(data)
        out.append(float(trainer.step(jnp.asarray(batch["input_ids"]))["loss"]))
    return out


@pytest.mark.slow
class TestContextParallel:
    def test_cp_matches_single_device_losses(self):
        """4-way CP == replicated run, step for step (fp32, rtol 1e-5)."""
        ref = losses(cp_trainer(seq=1, data=1))
        cp = losses(cp_trainer(seq=4, data=2))
        np.testing.assert_allclose(cp, ref, rtol=1e-5, atol=1e-6)

    def test_cp_with_tp_and_fsdp(self):
        """All four axes at once: (data 1, fsdp 2, model 2, seq 2)."""
        ref = losses(cp_trainer(seq=1, data=1))
        cp = losses(cp_trainer(seq=2, data=1, fsdp=2, model=2))
        np.testing.assert_allclose(cp, ref, rtol=1e-5, atol=1e-6)

    def test_cp_activations_are_seq_sharded(self):
        """The embed output really is sharded over the seq axis (the
        constraint is doing something, not just passing through)."""
        trainer = cp_trainer(seq=4, data=2)
        assert trainer.model_cfg.seq_shard

        from sow_tpu.models import llama as llama_lib

        captured = {}

        def probe(params, ids):
            x = params["embed"]["embedding"][ids]
            x = llama_lib._cp_constrain(x, ("unc", "seq", "unc"))
            captured["sharding"] = x.aval.sharding if hasattr(x.aval, "sharding") else None
            return x.sum()

        ids = jnp.zeros((4, 32), jnp.int32)
        with jax.set_mesh(trainer.mesh):
            jitted = jax.jit(probe)
            out = jitted(trainer.params, ids)
            out.block_until_ready()
            # verify via the lowered HLO: the constraint shows up as a
            # custom-call sharding op on the embed gather's output
            txt = jitted.lower(trainer.params, ids).as_text()
        assert "Sharding" in txt or "sharding" in txt

    def test_cp_eval_matches(self):
        t_ref = cp_trainer(seq=1, data=1)
        t_cp = cp_trainer(seq=4, data=2)
        data = affine_stream(4, 32, t_ref.model_cfg.vocab_size, seed=1)
        batches = [
            {"input_ids": jnp.asarray(next(data)["input_ids"])} for _ in range(2)
        ]
        e_ref = t_ref.evaluate(iter(batches), max_tokens=10_000)
        e_cp = t_cp.evaluate(iter(batches), max_tokens=10_000)
        np.testing.assert_allclose(e_cp["eval_loss"], e_ref["eval_loss"], rtol=1e-5)
