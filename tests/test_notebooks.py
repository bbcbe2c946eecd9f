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
