"""Tests: TT linear layer, sweep runner, display/alignment utilities,
memory accounting."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from sow_tpu.nn.sow import SoWLinear
from sow_tpu.nn.tt_linear import TTLinear
from sow_tpu.utils.display import alignment_matrix, export_alignment, format_tree
from sow_tpu.utils.memory import optimizer_memory_usage, weight_usage

KEY = jax.random.PRNGKey(0)


class TestTTLinear:
    def test_forward_matches_dense_weight(self):
        layer = TTLinear.create(KEY, 81, 81, ranks=[1, 6, 6, 6, 1], bias=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 81))
        y = layer(x)
        w = layer.dense_weight()
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x @ w + layer.bias), rtol=1e-3, atol=1e-4
        )

    def test_non_power_dims_pad(self):
        layer = TTLinear.create(KEY, 100, 70, ranks=[1, 4, 1], bias=False)
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 100))
        y = layer(x)
        assert y.shape == (3, 70)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x @ layer.dense_weight()), rtol=1e-3, atol=1e-4
        )

    def test_param_compression(self):
        layer = TTLinear.create(KEY, 1024, 1024, ranks=[1, 8, 8, 8, 1], bias=False)
        assert layer.numel() < 0.05 * 1024 * 1024

    def test_grad_flows(self):
        layer = TTLinear.create(KEY, 64, 64, ranks=[1, 4, 1])
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
        g = jax.grad(lambda l: jnp.sum(l(x) ** 2))(layer)
        assert all(float(jnp.abs(c).max()) > 0 for c in g.cores)


class TestSweep:
    def test_grid(self):
        from sow_tpu.train.sweep import grid

        combos = grid(rank=[2, 4], lr=[0.1, 0.2, 0.3])
        assert len(combos) == 6
        assert {"rank": 2, "lr": 0.3} in combos

    @pytest.mark.slow
    def test_run_sweep(self, tmp_path):
        from sow_tpu.data.synthetic import affine_stream
        from sow_tpu.train.sweep import grid, run_sweep
        from sow_tpu.train.trainer import TrainConfig

        base = TrainConfig(
            model="llama_test", architecture="sow", num_training_steps=10,
            sow_accumulation=0, batch_size=8, max_length=16, dtype="float32",
            mesh_data=-1, mesh_fsdp=1, mesh_model=1,
        )
        out = str(tmp_path / "sweep.jsonl")
        results = run_sweep(
            base,
            grid(rank=[2, 4]),
            steps_per_run=3,
            data_factory=lambda cfg: affine_stream(8, 16, 256, seed=0),
            out_path=out,
        )
        assert len(results) == 2
        lines = [json.loads(l) for l in open(out)]
        assert lines[0]["combo"] == {"rank": 2}
        assert lines[1]["final_loss"] > 0

    def test_tpe_beats_random_at_equal_budget(self):
        """Model-based sweep parity (ref wandb bayes, glue_sweep.py:7-16):
        TPE finds a better optimum than random search at the same trial
        budget on a synthetic 4-D lr/sow_lr/rank/accumulation objective.
        Fully deterministic (seeded numpy Generators)."""
        from sow_tpu.train.sweep import TPESearch, random_search

        axes = dict(
            lr=(1e-4, 1e-1), sow_lr=(1e-5, 1e-2),
            rank=[4, 8, 16, 32, 64, 128],
            sow_accumulation=[200, 500, 1000, 2000, 5000],
        )

        def objective(c):
            z = (np.log10(c["lr"]) + 2.5) ** 2 + (np.log10(c["sow_lr"]) + 3.5) ** 2
            z += 0.3 * abs(np.log2(c["rank"]) - 5)  # best rank 32
            z += 0.2 * abs(np.log10(c["sow_accumulation"]) - 3)  # best acc 1000
            return z

        budget, seeds = 40, range(10)
        tpe_best, rnd_best = [], []
        for seed in seeds:
            s = TPESearch(axes, seed=seed)
            best = np.inf
            for _ in range(budget):
                combo = s.propose()
                v = objective(combo)
                s.observe(combo, v)
                best = min(best, v)
            tpe_best.append(best)
            rnd_best.append(
                min(objective(c) for c in random_search(budget, seed=seed, **axes))
            )
        assert np.mean(tpe_best) < np.mean(rnd_best)
        assert sum(t < r for t, r in zip(tpe_best, rnd_best)) >= 6

    def test_tpe_respects_axis_domains(self):
        from sow_tpu.train.sweep import TPESearch

        axes = dict(lr=(1e-4, 1e-1), rank=[2, 4])
        s = TPESearch(axes, seed=0, n_startup=3)
        for i in range(12):
            c = s.propose()
            assert 1e-4 <= c["lr"] <= 1e-1
            assert c["rank"] in (2, 4)
            s.observe(c, float(i))

    @pytest.mark.slow
    def test_run_glue_sweep_tpe(self, tmp_path):
        """W8 full parity: the model-based (TPE) sweep drives the GLUE
        finetune workload over the reference bayes box (glue_sweep.py:7-16),
        offline on synthetic batches."""
        import json as _json

        from sow_tpu.train.sweep import TPESearch, run_glue_sweep

        axes = dict(rank=[2, 4], sow_accumulation=[1000],
                    lr=(1e-4, 1e-3), sow_lr=(1e-4, 1e-3))
        out = str(tmp_path / "glue_sweep.jsonl")
        results = run_glue_sweep(
            TPESearch(axes, seed=0), n_trials=2, steps_per_run=4,
            out_path=out, model_name="roberta-test", task="cola",
            batch_size=8, max_length=32, seed=0,
        )
        assert len(results) == 2
        lines = [_json.loads(l) for l in open(out)]
        assert all("matthews_correlation" in l["eval"] for l in lines)
        assert all(l["final_loss"] > 0 for l in lines)

    def test_run_adaptive_sweep(self, tmp_path):
        from sow_tpu.data.synthetic import affine_stream
        from sow_tpu.train.sweep import TPESearch, run_adaptive_sweep
        from sow_tpu.train.trainer import TrainConfig

        base = TrainConfig(
            model="llama_test", architecture="sow", num_training_steps=10,
            sow_accumulation=0, batch_size=8, max_length=16, dtype="float32",
            mesh_data=-1, mesh_fsdp=1, mesh_model=1,
        )
        strategy = TPESearch(dict(rank=[2, 4]), seed=0, n_startup=1)
        out = str(tmp_path / "tpe.jsonl")
        results = run_adaptive_sweep(
            base, strategy, n_trials=2, steps_per_run=3,
            data_factory=lambda cfg: affine_stream(8, 16, 256, seed=0),
            out_path=out,
        )
        assert len(results) == 2
        assert len(strategy.history) == 2
        assert all(r["final_loss"] > 0 for r in results)


class TestDisplay:
    def test_format_tree_groups_and_colors(self):
        from sow_tpu.models import get_config, init_params
        from sow_tpu.nn import SoWConfig, prepare_sow
        from sow_tpu.models.llama import LLAMA_TARGET_MODULES

        params = init_params(KEY, get_config("llama_test"))
        params = prepare_sow(
            params, SoWConfig(target_modules=("q_proj",), rank=2, decompose="keep"), KEY
        )
        txt = format_tree(params, use_color=False)
        assert "(0-1): 2 x" in txt  # identical layers grouped
        assert "SoWLinear" in txt
        txt_color = format_tree(params, use_color=True)
        assert "\033[" in txt_color

    def test_alignment(self, tmp_path):
        layer = SoWLinear.create(KEY, 32, 24, rank=4, n_iter=2)
        layer = layer.accumulate(jax.random.PRNGKey(5))
        # give factors some mass so the SVD is well-defined
        import dataclasses

        layer = dataclasses.replace(
            layer, up=jax.random.normal(jax.random.PRNGKey(6), layer.up.shape) * 0.1
        )
        m = alignment_matrix(layer)
        assert m.shape[1] == layer.rank
        np.testing.assert_allclose(m.sum(axis=0), 100.0, rtol=1e-3)
        path = export_alignment(layer, str(tmp_path / "align"))
        assert np.load(path).shape == m.shape


class TestMemoryAccounting:
    def test_weight_usage_split(self):
        from sow_tpu.models import get_config, init_params
        from sow_tpu.nn import SoWConfig, prepare_sow
        from sow_tpu.models.llama import LLAMA_TARGET_MODULES

        params = init_params(KEY, get_config("llama_test"))
        params = prepare_sow(
            params,
            SoWConfig(target_modules=LLAMA_TARGET_MODULES, rank=2, decompose="keep"),
            KEY,
        )
        u = weight_usage(params)
        assert u["accumulated_mib"] > 0  # keep mode freezes bases
        assert u["sow_factors_mib"] > 0
        assert u["trainable_mib"] < u["total_mib"]


class TestRandomSearch:
    def test_random_search_axes(self):
        from sow_tpu.train.sweep import random_search

        combos = random_search(10, seed=1, rank=[2, 4, 8], lr=(1e-5, 1e-2))
        assert len(combos) == 10
        assert all(c["rank"] in (2, 4, 8) for c in combos)
        assert all(1e-5 <= c["lr"] <= 1e-2 for c in combos)
        # log-uniform spread: both decades appear over 10 draws
        assert min(c["lr"] for c in combos) < 1e-3 < max(c["lr"] for c in combos)


class TestRandomMatrixUtils:
    def test_randhaar_orthogonal(self):
        from sow_tpu.utils.numerics import randhaar

        q = randhaar(jax.random.PRNGKey(0), 16)
        np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(16), atol=1e-5)

    def test_randuptri_shape_and_diag(self):
        from sow_tpu.utils.numerics import randuptri

        r = np.asarray(randuptri(jax.random.PRNGKey(1), 8))
        assert np.allclose(r, np.triu(r))
        assert (np.diag(r) > 0).all()  # chi-distributed: positive

    def test_perturbe(self):
        from sow_tpu.utils.numerics import perturbe_random

        m = jnp.zeros((4, 4))
        p = perturbe_random(jax.random.PRNGKey(2), m, scale=0.1)
        assert 0 < float(jnp.abs(p).mean()) < 0.5

    def test_sow_model_wrapper(self):
        from sow_tpu.models import get_config, init_params
        from sow_tpu.nn import SoWConfig, SoWModel, iter_sow

        params = init_params(KEY, get_config("llama_test"))
        model = SoWModel.create(
            params, SoWConfig(target_modules=("q_proj",), rank=2, decompose="keep"), KEY
        )
        assert len(list(iter_sow(model.params))) == 2
        model2 = model.accumulate(jax.random.PRNGKey(9)).set_scale(0.5)
        for _, l in iter_sow(model2.params):
            assert float(l.scale) == 0.5


@pytest.mark.slow
class TestSweepBaseCheckpointMultiTrial:
    def test_trials_do_not_alias_donated_base_params(self, tmp_path):
        """Regression: the GLUE trainer's jitted step donates its param
        buffers; the per-trial 'copy' was an identity tree_map, so trial 2
        stepped on trial-1-deleted arrays (RuntimeError: Array has been
        deleted) — killed the first on-chip TPE sweep. Two trials from one
        pretrained base must both run."""
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        base = str(tmp_path / "base")
        r = subprocess.run(
            [sys.executable, "-m", "sow_tpu.train.pretrain",
             "--model", "llama_test", "--architecture", "sow", "--rank", "4",
             "--sow-accumulation", "0", "--num-training-steps", "2",
             "--batch-size", "4", "--max-length", "16", "--synthetic-data",
             "--eval-every", "0", "--save-dir", base, "--save-every", "2",
             "--dtype", "float32"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-1000:]
        out = str(tmp_path / "sweep.jsonl")
        r = subprocess.run(
            [sys.executable, "-m", "sow_tpu.train.sweep", "--workload", "glue",
             "--glue-model", "llama_test", "--task", "cola",
             "--base-checkpoint", base, "--base-arch", "sow", "--base-rank", "4",
             "--batch-size", "4", "--max-length", "16", "--eval-batches", "2",
             "--ranks", "4", "8", "--accumulations", "100", "--lrs", "1e-4",
             "--sow-lrs", "1e-4", "--steps-per-run", "2",
             "--random-trials", "2", "--out", out],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        lines = [l for l in open(out).read().splitlines() if l.strip()]
        assert len(lines) == 2  # both trials completed
