"""Notebook-experiment parity tests (BASELINE.json parity configs).

Asserts the qualitative conclusions of the reference notebooks: the SoW
linear-regression fit converges toward the dense least-squares optimum with
rank growing across accumulations; deeper MLPs accumulate truncation error;
reduced-rank regression beats naive SVD truncation of OLS.
"""

import jax
import numpy as np
import pytest

from sow_tpu.examples.notebooks import (
    low_rank_mlp_error,
    reduced_rank_regression,
    sow_linear_regression,
)


@pytest.mark.slow
class TestSowLinearRegression:
    def test_converges_toward_dense_fit_with_rank_growth(self):
        out = sow_linear_regression(
            jax.random.PRNGKey(0),
            in_features=64, out_features=48, rank=20,
            steps=300, accumulate_every=75, lr=1e-2, grow_rank=True,
        )
        # loss approaches the dense least-squares optimum (rtol gate of
        # BASELINE.md is 1e-3; this is a small-steps CI budget so we assert
        # within 3x of optimum and a 10x improvement over the start)
        assert out["final_loss"] < 3 * max(out["dense_loss"], 1e-4)
        assert out["final_loss"] < 0.1 * out["losses"][0]
        # virtual rank grew by rank per accumulation, capped at min(in,out)
        assert out["virtual_rank"] > 20
        # effective rank of the base increases across accumulation events
        assert out["acc_ranks"] == sorted(out["acc_ranks"])
        assert out["acc_ranks"][0] <= 20

    def test_full_rank_mode_dense_base(self):
        out = sow_linear_regression(
            jax.random.PRNGKey(1), steps=120, accumulate_every=50, grow_rank=False,
        )
        assert out["final_loss"] < 0.5 * out["losses"][0]


class TestMlpLowRank:
    def test_error_grows_with_depth(self):
        out = low_rank_mlp_error(jax.random.PRNGKey(2), width=64, depth=4, rank=8)
        errs = out["errors_per_depth"]
        assert len(errs) == 4
        assert errs[-1] > errs[0]  # truncation error compounds with depth
        assert all(0 < e < 1.5 for e in errs)

    def test_full_rank_no_error(self):
        out = low_rank_mlp_error(jax.random.PRNGKey(3), width=32, depth=2, rank=32)
        assert max(out["errors_per_depth"]) < 1e-4


class TestReducedRankRegression:
    def test_rrr_beats_naive_truncation(self):
        rng_outcomes = [
            reduced_rank_regression(jax.random.PRNGKey(s)) for s in range(3)
        ]
        for out in rng_outcomes:
            # at the true rank, RRR fit error ~ OLS error, and never worse
            # than naive coefficient truncation
            assert out["rrr_err"] <= out["svd_trunc_err"] + 1e-6
            assert out["rrr_err"] < 1.2 * out["ols_err"] + 0.05
            assert out["w_err_rrr"] < 0.2

    def test_underfit_rank_hurts(self):
        good = reduced_rank_regression(jax.random.PRNGKey(5), true_rank=6, fit_rank=6)
        bad = reduced_rank_regression(jax.random.PRNGKey(5), true_rank=6, fit_rank=2)
        assert bad["rrr_err"] > good["rrr_err"]


class TestSowParameterFrontier:
    """``Parameters SoW Iteration.ipynb`` cell 1 (SURVEY §6 row 5)."""

    def test_break_even_crossover_llama_60m_shapes(self):
        from sow_tpu.examples.notebooks import sow_parameter_frontier

        out = sow_parameter_frontier(512, 1376, max_rank=200)
        dense = out["dense_params"]
        assert dense == 512 * 1376
        for p, row in out["per_n_iter"].items():
            r_star = row["break_even_rank"]
            # analytic crossover: below r* SoW is smaller, above it larger
            assert abs(r_star - dense / (p * (512 + 1376))) < 1e-9
            below, above = int(np.floor(r_star)), int(np.ceil(r_star)) + 1
            if 1 <= below <= len(row["params"]):
                assert row["params"][below - 1] <= dense
            if above <= len(row["params"]):
                assert row["params"][above - 1] > dense
        # the notebook's headline: n_iter=2 crosses near r=186 at 512x1376
        assert 186 <= out["per_n_iter"][2]["break_even_rank"] <= 187

    def test_virtual_rank_saturates_at_min_dim(self):
        from sow_tpu.examples.notebooks import sow_parameter_frontier

        out = sow_parameter_frontier(512, 1376, n_iters=(20,), max_rank=50)
        vr = out["per_n_iter"][20]["virtual_ranks"]
        assert vr[-1] == 512  # 20 * 50 = 1000 saturates at min(512, 1376)
        assert vr[0] == 20

    def test_memory_report_carries_frontier(self):
        from sow_tpu.nn.sow import SoWLinear
        from sow_tpu.utils.memory import format_memory_report, sow_break_even_rank

        layer = SoWLinear.create(jax.random.PRNGKey(0), 512, 1376, rank=50, n_iter=2)
        report = format_memory_report({"proj": layer})
        assert "break-even r*=187" in report or "break-even r*=186" in report
        assert abs(sow_break_even_rank(512, 1376, 2) - 186.58) < 0.01


class TestRandomMatrixDistribution:
    """``Random Matrix Distribution.ipynb`` — assert the orderings the
    notebook's plots show."""

    def test_best_rank_r_beats_random(self):
        from sow_tpu.examples.notebooks import best_vs_random_low_rank

        out = best_vs_random_low_rank(jax.random.PRNGKey(0), n=32, rank=4, n_trials=2000)
        # Eckart-Young-optimal truncation essentially always beats a random
        # rank-r Gaussian product on random probes (notebook cells 1-5)
        assert out["best_win_fraction"] > 0.95
        assert out["mean_offset"] < 0

    def test_event_probability_near_one_at_all_ranks(self):
        from sow_tpu.examples.notebooks import rank_event_probability

        out = rank_event_probability(jax.random.PRNGKey(1), n=256, ranks=(1, 8, 64),
                                     n_samples=20_000)
        # the notebook's probability curve hugs 1 across the rank axis
        for r, p in out["probs"].items():
            assert p > 0.98, (r, p)
        assert out["probs"][64] >= out["probs"][1] - 0.01

    def test_draw_grid_matches_r2_over_n(self):
        from sow_tpu.examples.notebooks import draw_probability_grid

        out = draw_probability_grid(jax.random.PRNGKey(2), n_max=16, n_samples=4000)
        assert out["max_abs_error"] < 0.15  # empirical ~= (r^2)/n (cells 16-18)

    def test_rank_r_spectra_ordered_and_grow_with_n(self):
        from sow_tpu.examples.notebooks import random_rank_spectrum

        out = random_rank_spectrum(jax.random.PRNGKey(3), sizes=(32, 64), rank=8,
                                   n_samples=200)
        s32, s64 = out["mean_spectra"][32], out["mean_spectra"][64]
        assert all(a > b for a, b in zip(s32, s32[1:]))  # strictly ordered means
        assert all(a > b for a, b in zip(s64, s64[1:]))
        assert s64[0] > s32[0]  # sigma_1 grows with ambient dimension
