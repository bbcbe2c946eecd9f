"""Checkpoint/resume tests, including the SoW dynamic-shape materialization
(acc buffers appearing after accumulation — ref ``prepare.py:188-215``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sow_tpu.checkpoint import (
    latest_checkpoint,
    restore_opt_state,
    restore_params,
    save_checkpoint,
)
from sow_tpu.data.synthetic import affine_stream
from sow_tpu.models import forward, get_config, init_params
from sow_tpu.train.trainer import TrainConfig, Trainer


def tiny_trainer(**kw):
    cfg = TrainConfig(
        model="llama_test", architecture="sow", rank=4, num_training_steps=40,
        sow_accumulation=kw.pop("sow_accumulation", 5), batch_size=8, max_length=16,
        dtype="float32", lr=1e-3, sow_lr=1e-3,
        mesh_data=kw.pop("mesh_data", -1), mesh_fsdp=kw.pop("mesh_fsdp", 1),
        mesh_model=kw.pop("mesh_model", 1), **kw,
    )
    return Trainer(cfg)


class TestRoundTrip:
    def test_dense_params_roundtrip(self, tmp_path):
        cfg = get_config("llama_test")
        params = init_params(jax.random.PRNGKey(0), cfg)
        d = save_checkpoint(str(tmp_path), 7, params)
        assert latest_checkpoint(str(tmp_path)) == d
        template = init_params(jax.random.PRNGKey(99), cfg)  # different values
        restored, state = restore_params(template, d)
        assert state["update_step"] == 7
        for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_picks_max_step(self, tmp_path):
        cfg = get_config("llama_test")
        params = init_params(jax.random.PRNGKey(0), cfg)
        save_checkpoint(str(tmp_path), 5, params)
        d10 = save_checkpoint(str(tmp_path), 10, params)
        assert latest_checkpoint(str(tmp_path)) == d10


@pytest.mark.slow
class TestSowResume:
    def test_resume_after_accumulation_restores_shapes_and_logits(self, tmp_path):
        # Train past an accumulation so acc buffers exist, save, then restore
        # into a FRESH trainer whose template still has acc_down=None.
        t1 = tiny_trainer()
        data = affine_stream(8, 16, t1.model_cfg.vocab_size, seed=0)
        for _ in range(7):  # crosses the step-5 accumulation event
            t1.step(jnp.asarray(next(data)["input_ids"]))
        d = save_checkpoint(
            str(tmp_path), t1.update_step, t1.params, t1.opt_state,
            tokens_seen=t1.tokens_seen,
        )

        t2 = tiny_trainer()
        restored, state = restore_params(t2.params, d)
        ids = jnp.asarray(next(data)["input_ids"])
        ref_logits = np.asarray(forward(t1.params, ids, t1.model_cfg))
        new_logits = np.asarray(forward(restored, ids, t2.model_cfg))
        np.testing.assert_allclose(new_logits, ref_logits, rtol=1e-5, atol=1e-5)

        # optimizer state restores structurally after rebuilding on new params
        t2.params = restored
        t2._build_optimizer()
        fresh = t2.opt.init(t2.params)
        opt_state = restore_opt_state(fresh, d)
        np.testing.assert_array_equal(
            np.asarray(opt_state.routed.mu["embed"]["embedding"]),
            np.asarray(t1.opt_state.routed.mu["embed"]["embedding"]),
        )
        assert int(opt_state.main.step) == int(t1.opt_state.main.step)

    def test_training_continues_identically(self, tmp_path):
        t1 = tiny_trainer(sow_accumulation=100)
        data = affine_stream(8, 16, t1.model_cfg.vocab_size, seed=1)
        batches = [jnp.asarray(next(data)["input_ids"]) for _ in range(6)]
        for b in batches[:3]:
            t1.step(b)
        d = save_checkpoint(str(tmp_path), t1.update_step, t1.params, t1.opt_state)

        # continue original
        loss_a = [float(t1.step(b)["loss"]) for b in batches[3:]]

        # resume and continue
        t2 = tiny_trainer(sow_accumulation=100)
        t2.params, _ = restore_params(t2.params, d)
        t2.params = t2._device_put_params(t2.params)
        t2._build_optimizer()
        t2.opt_state = restore_opt_state(t2.opt.init(t2.params), d)
        t2.update_step = 3
        loss_b = [float(t2.step(b)["loss"]) for b in batches[3:]]
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
class TestOrbax:
    def test_async_save_restore_with_sow_shapes(self, tmp_path):
        from sow_tpu.checkpoint_orbax import OrbaxCheckpointer

        t1 = tiny_trainer()
        data = affine_stream(8, 16, t1.model_cfg.vocab_size, seed=11)
        for _ in range(7):  # crosses the step-5 accumulation
            t1.step(jnp.asarray(next(data)["input_ids"]))
        ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"), max_to_keep=2)
        ckpt.save(t1.update_step, t1.params, t1.opt_state, tokens_seen=t1.tokens_seen)
        ckpt.wait()
        assert ckpt.latest_step() == 7

        t2 = tiny_trainer()  # fresh template: acc_down=None
        restored, meta = ckpt.restore_params(t2.params)
        assert meta["update_step"] == 7
        ids = jnp.asarray(next(data)["input_ids"])
        np.testing.assert_allclose(
            np.asarray(forward(restored, ids, t2.model_cfg)),
            np.asarray(forward(t1.params, ids, t1.model_cfg)),
            rtol=1e-5, atol=1e-5,
        )
        ckpt.close()

    def test_retention(self, tmp_path):
        from sow_tpu.checkpoint_orbax import OrbaxCheckpointer

        cfg = get_config("llama_test")
        params = init_params(jax.random.PRNGKey(0), cfg)
        ckpt = OrbaxCheckpointer(str(tmp_path / "o2"), max_to_keep=2, async_save=False)
        for s in (1, 2, 3):
            ckpt.save(s, params)
        ckpt.wait()
        assert ckpt.latest_step() == 3
        assert set(ckpt.manager.all_steps()) == {2, 3}  # step 1 GC'd
        ckpt.close()


@pytest.mark.slow
class TestShardedResume:
    """VERDICT r1 item 7: the resume path must rebuild optimizer state
    jitted + sharded (an unjitted init replicates full state per device at
    the restore-time memory peak), and mesh finetune evals must not
    replicate the model."""

    def test_pretrain_cli_resume_keeps_opt_state_sharded(self, tmp_path):
        from sow_tpu.train import pretrain

        save = str(tmp_path / "ckpt")
        common = [
            "--model", "llama_test", "--architecture", "sow", "--rank", "4",
            "--batch-size", "8", "--max-length", "16", "--dtype", "float32",
            "--sow-accumulation", "0", "--synthetic-data",
            "--mesh-data", "2", "--mesh-fsdp", "2", "--mesh-model", "2",
            "--eval-every", "0", "--logging-steps", "100",
        ]
        pretrain.main(common + ["--num-training-steps", "3", "--save-dir", save,
                                "--save-every", "3"])
        # resume through the real CLI path
        pretrain.main(common + ["--num-training-steps", "5", "--continue-from", save])

    def test_resume_opt_state_is_sharded(self, tmp_path):
        t1 = tiny_trainer(mesh_data=2, mesh_fsdp=2, mesh_model=2, sow_accumulation=100)
        data = affine_stream(8, 16, t1.model_cfg.vocab_size, seed=3)
        for _ in range(2):
            t1.step(jnp.asarray(next(data)["input_ids"]))
        d = save_checkpoint(str(tmp_path), t1.update_step, t1.params, t1.opt_state)

        t2 = tiny_trainer(mesh_data=2, mesh_fsdp=2, mesh_model=2, sow_accumulation=100)
        t2.params, _ = restore_params(t2.params, d)
        t2.params = t2._device_put_params(t2.params)
        t2._build_optimizer()
        opt_sh = t2._opt_shardings(t2.params)
        fresh = jax.jit(t2.opt.init, out_shardings=opt_sh)(t2.params)
        t2.opt_state = jax.device_put(restore_opt_state(fresh, d), opt_sh)
        # a large moment leaf must actually be sharded, not replicated
        mu = t2.opt_state.routed.mu["embed"]["embedding"]
        assert not mu.sharding.is_fully_replicated
        # and training continues
        t2.update_step = t1.update_step
        m = t2.step(jnp.asarray(next(data)["input_ids"]))
        assert float(m["loss"]) > 0


class TestTransferVerification:
    """The verified-transfer path (``_flatten_with_paths``).

    Round-3 flagship postmortem: on the tunneled TPU runtime, device_get of
    a non-lane-aligned array (last dim not a 128-multiple — the mlp gate/up
    kernels) returns a NON-CONTIGUOUS strided view over the padded transfer
    buffer; safetensors serializes raw ctypes memory, so checkpoints came
    out with padded garbage between rows (a step-10000 checkpoint evaluated
    at loss 10.9 while the live model was at 1.3). Saves now force
    C-contiguity and verify transferred bytes against on-device uint32
    checksums; restores verify uploads the same way.
    """

    @pytest.mark.parametrize(
        "dtype", [jnp.bfloat16, jnp.float32, jnp.int32, jnp.float16, jnp.int8, jnp.bool_]
    )
    def test_checksum_host_device_agree(self, dtype):
        from sow_tpu.checkpoint import _u32_checksum_device, _u32_checksum_host

        k = jax.random.PRNGKey(3)
        for shape in [(7,), (33, 5), (), (1,)]:
            if dtype == jnp.bool_:
                x = jax.random.bernoulli(k, 0.5, shape)
            elif jnp.issubdtype(dtype, jnp.integer):
                x = jax.random.randint(k, shape, -100, 100).astype(dtype)
            else:
                x = jax.random.normal(k, shape).astype(dtype)
            dev = int(jax.jit(_u32_checksum_device)(x))
            host = _u32_checksum_host(np.asarray(jax.device_get(x)))
            assert dev == host, (dtype, shape)

    def test_save_after_donated_steps_matches_live_params(self, tmp_path):
        tr = tiny_trainer()
        data = iter(affine_stream(8, 16, get_config("llama_test").vocab_size, seed=0))
        for _ in range(3):
            tr.step(jnp.asarray(next(data)["input_ids"]))
        live = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), tr.params
        )
        d = save_checkpoint(str(tmp_path), 3, tr.params, tr.opt_state)
        tr2 = tiny_trainer()
        tr2.params, _ = restore_params(tr2.params, d)
        for a, b in zip(
            jax.tree_util.tree_leaves(tr2.params), jax.tree_util.tree_leaves(live)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_noncontiguous_leaves_serialize_correctly(self, tmp_path):
        # the tunneled runtime hands back strided views for non-lane-aligned
        # arrays; save must normalize to C-order before safetensors writes
        # raw memory (the round-3 flagship corruption)
        base = np.arange(64 * 96, dtype=np.float32).reshape(64, 96)
        strided = base[:, :80]  # non-contiguous view
        assert not strided.flags.c_contiguous
        tree = {"w": strided, "s": np.float32(3.0)}
        d = save_checkpoint(str(tmp_path), 1, tree)
        from safetensors.numpy import load_file

        disk = load_file(d + "/model.safetensors")
        np.testing.assert_array_equal(disk["['w']"], np.asarray(strided))
        assert disk["['s']"].shape == ()
