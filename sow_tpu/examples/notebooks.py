"""Reference-notebook experiments as library functions.

BASELINE.json gates numerics parity on the reference's research notebooks:
  * ``Linear Regression SoW.ipynb`` (missing upstream; reconstructed per
    SURVEY §0 from ``MLP Low Rank Approximation.ipynb`` cells 3-5) — fit
    ``y = xW + b`` with a SoW layer, tracking effective rank across
    accumulations;
  * ``MLP Low Rank Approximation.ipynb`` — depth vs low-rank
    approximation error;
  * ``Reduced Rank Regression.ipynb`` — closed-form RRR vs truncated-SVD
    fit error on synthetic ``Y = XW + noise``;
  * ``Parameters SoW Iteration.ipynb`` cell 1 — the analytic
    ``n_iter*(n+m)*r`` vs dense ``n*m`` trainable-parameter frontier
    (``sow_parameter_frontier``);
  * ``Random Matrix Distribution.ipynb`` — distributional studies of
    best-vs-random low-rank approximations and random rank-r spectra
    (``best_vs_random_low_rank``, ``rank_event_probability``,
    ``draw_probability_grid``, ``random_rank_spectrum``).

Each experiment returns plain dicts of scalars so tests can assert the
notebook's qualitative conclusions instead of eyeballing plots.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sow_tpu.nn.sow import SoWLinear
from sow_tpu.optim.adamw import apply_updates, grouped_adamw
from sow_tpu.utils.numerics import svd_weight


def sow_linear_regression(
    key: jax.Array,
    in_features: int = 64,
    out_features: int = 48,
    rank: int = 20,
    n_iter: int = 1,
    n_samples: int = 512,
    steps: int = 300,
    accumulate_every: int = 75,
    lr: float = 1e-2,
    noise: float = 0.01,
    grow_rank: bool = True,
) -> dict:
    """Fit ``y = x @ W_true + b`` with a SoW layer, accumulating
    periodically. Returns loss trajectory, per-phase effective ranks of the
    accumulated base, and the dense least-squares reference loss."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w_true = jax.random.normal(k1, (in_features, out_features)) / np.sqrt(in_features)
    b_true = jax.random.normal(k2, (out_features,)) * 0.1
    x = jax.random.normal(k3, (n_samples, in_features))
    y = x @ w_true + b_true + noise * jax.random.normal(k4, (n_samples, out_features))

    layer = SoWLinear.create(k1, in_features, out_features, rank=rank, n_iter=n_iter)
    if not grow_rank:
        layer = dataclasses.replace(layer, virtual_rank=min(in_features, out_features))

    from sow_tpu.nn.surgery import param_labels

    def make_opt(params):
        lab = param_labels(params)
        return grouped_adamw(lab, lrs={"sow": lr, "regular": lr})

    params = {"layer": layer}
    opt = make_opt(params)
    opt_state = opt.init(params)

    def make_step(opt):
        @jax.jit
        def step_fn(params, opt_state):
            def loss_of(p):
                return jnp.mean((p["layer"](x) - y) ** 2)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return apply_updates(params, updates), opt_state, loss

        return step_fn

    step_fn = make_step(opt)
    losses, ranks = [], []
    acc_key = jax.random.PRNGKey(1234)
    for t in range(steps):
        params, opt_state, loss = step_fn(params, opt_state)
        losses.append(float(loss))
        if accumulate_every and (t + 1) % accumulate_every == 0 and t + 1 < steps:
            acc_key, sub = jax.random.split(acc_key)
            params = {"layer": params["layer"].accumulate(sub)}
            ranks.append(_effective_rank(params["layer"]))
            opt = make_opt(params)
            opt_state = opt.init(params)
            step_fn = make_step(opt)
    layer = params["layer"]

    # dense least-squares reference
    xb = jnp.concatenate([x, jnp.ones((n_samples, 1))], axis=1)
    w_ls, *_ = jnp.linalg.lstsq(xb, y)
    dense_loss = float(jnp.mean((xb @ w_ls - y) ** 2))

    return {
        "losses": losses,
        "final_loss": losses[-1],
        "dense_loss": dense_loss,
        "acc_ranks": ranks,
        "virtual_rank": layer.virtual_rank,
    }


def _effective_rank(layer: SoWLinear, tol: float = 1e-4) -> int:
    if layer.acc_down is None:
        return 0
    w = layer.acc_down if layer.acc_up is None else layer.acc_down @ layer.acc_up
    s = jnp.linalg.svd(w.astype(jnp.float32), compute_uv=False)
    return int((s > tol * s[0]).sum())


def low_rank_mlp_error(
    key: jax.Array,
    width: int = 64,
    depth: int = 3,
    rank: int = 8,
    n_samples: int = 256,
) -> dict:
    """Depth-vs-low-rank-approximation study (MLP notebook cells 9-14):
    relative output error of truncating every layer of a random MLP to
    ``rank``, as depth grows. Returns per-depth errors."""
    keys = jax.random.split(key, depth + 1)
    x = jax.random.normal(keys[0], (n_samples, width))
    errors = []
    h_full = x
    h_trunc = x
    for d in range(depth):
        w = jax.random.normal(keys[d + 1], (width, width)) / np.sqrt(width)
        u, s, vt = svd_weight(w, rank)
        w_trunc = u @ jnp.diag(s) @ vt
        h_full = jnp.tanh(h_full @ w)
        h_trunc = jnp.tanh(h_trunc @ w_trunc)
        err = float(jnp.linalg.norm(h_full - h_trunc) / jnp.linalg.norm(h_full))
        errors.append(err)
    return {"errors_per_depth": errors}


def reduced_rank_regression(
    key: jax.Array,
    n: int = 200,
    p: int = 32,
    q: int = 24,
    true_rank: int = 6,
    fit_rank: int = 6,
    noise: float = 0.05,
) -> dict:
    """Closed-form reduced-rank regression vs truncated-SVD-of-OLS fit
    (Reduced Rank Regression notebook cells 2-7).

    RRR: ``B_r = argmin_{rank r} ||Y - X B||_F`` via OLS followed by SVD of
    the FITTED values (the correct projection), vs naively truncating the
    OLS coefficient matrix.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = jax.random.normal(k1, (p, true_rank))
    b = jax.random.normal(k2, (true_rank, q))
    w_true = a @ b / np.sqrt(p)
    x = jax.random.normal(k3, (n, p))
    y = x @ w_true + noise * jax.random.normal(k4, (n, q))

    with jax.default_matmul_precision("highest"):
        b_ols, *_ = jnp.linalg.lstsq(x, y)
        yhat = x @ b_ols
        # RRR: project OLS fit onto top-r right singular vectors of yhat
        _, _, vt = jnp.linalg.svd(yhat, full_matrices=False)
        v_r = vt[:fit_rank].T
        b_rrr = b_ols @ v_r @ v_r.T
        # naive: truncate B directly
        u, s, wt = jnp.linalg.svd(b_ols, full_matrices=False)
        b_svd = (u[:, :fit_rank] * s[:fit_rank]) @ wt[:fit_rank]

    def fit_err(bm):
        return float(jnp.linalg.norm(y - x @ bm) / jnp.linalg.norm(y))

    return {
        "ols_err": fit_err(b_ols),
        "rrr_err": fit_err(b_rrr),
        "svd_trunc_err": fit_err(b_svd),
        "w_err_rrr": float(jnp.linalg.norm(b_rrr - w_true) / jnp.linalg.norm(w_true)),
    }


# -- Parameters SoW Iteration.ipynb (cell 1) ---------------------------------

def sow_parameter_frontier(
    in_features: int = 512,
    out_features: int = 1376,
    n_iters: tuple[int, ...] = (2, 3, 5, 10, 15, 20),
    max_rank: int = 50,
) -> dict:
    """Analytic trainable-parameter frontier of the SoW decomposition
    (``Parameters SoW Iteration.ipynb`` cell 1, llama-60m shapes 512x1376).

    A SoW layer trains ``n_iter`` rank-``r`` factor pairs:
    ``n_iter * (n + m) * r`` parameters against the dense ``n * m``. The
    break-even rank where SoW stops being smaller is
    ``r* = n*m / (n_iter * (n+m))``; the virtual rank reached at rank ``r``
    is ``min(n, m, n_iter * r)`` (the notebook's ``r_k`` scatter labels).
    """
    n, m = in_features, out_features
    dense = n * m
    out = {"dense_params": dense, "per_n_iter": {}}
    for p in n_iters:
        ranks = list(range(1, max_rank + 1))
        params = [p * (n + m) * r for r in ranks]
        out["per_n_iter"][p] = {
            "params": params,
            "break_even_rank": dense / (p * (n + m)),
            "virtual_ranks": [min(n, m, p * r) for r in ranks],
        }
    return out


# -- Random Matrix Distribution.ipynb -----------------------------------------

def best_vs_random_low_rank(
    key: jax.Array,
    n: int = 32,
    rank: int = 4,
    n_trials: int = 2000,
) -> dict:
    """Best-vs-random rank-r approximation gap (notebook cells 1-5).

    For a Gaussian ``W``, compare the Eckart-Young-optimal truncated-SVD
    ``W1`` against random rank-r matrices ``W2 = G1 @ G2`` on random probes:
    ``offset = ||Wx - W1x||^2 - ||Wx - W2x||^2``. The notebook's plots show
    the best approximation winning essentially always; we return the win
    fraction and mean offset so a test can assert it."""
    k_w, k_u, k_v, k_x = jax.random.split(key, 4)
    w = jax.random.normal(k_w, (n, n))
    u, s, vt = jnp.linalg.svd(w)
    w1 = (u[:, :rank] * s[:rank]) @ vt[:rank]
    g1 = jax.random.normal(k_u, (n_trials, n, rank))
    g2 = jax.random.normal(k_v, (n_trials, rank, n))
    w2 = jnp.einsum("tnr,trm->tnm", g1, g2)
    x = jax.random.normal(k_x, (n_trials, n))
    err_best = jnp.sum((x @ (w - w1).T) ** 2, axis=-1)
    err_rand = jnp.sum(jnp.einsum("tn,tmn->tm", x, w[None] - w2) ** 2, axis=-1)
    offset = err_best - err_rand
    return {
        "best_win_fraction": float(jnp.mean(offset < 0)),
        "mean_offset": float(jnp.mean(offset)),
    }


def rank_event_probability(
    key: jax.Array,
    n: int = 256,
    ranks: tuple[int, ...] = (1, 8, 64),
    n_samples: int = 20_000,
) -> dict:
    """Probability of the quadratic-form event ``A >= B`` vs rank (notebook
    cells 6-12): ``A = sum a_i s_i^2 + sum a_perm_i t_i^2`` against the
    cross term ``B = 2 sum a_i t_i s_perm_i`` with sorted Gaussian spectra —
    the AM-GM-style inequality the SoW analysis leans on. The notebook's
    curve sits near 1 at every rank; we return the per-rank probability."""
    probs = {}
    for i, r in enumerate(ranks):
        k = jax.random.fold_in(key, i)
        ka, ks, kt, kp = jax.random.split(k, 4)
        alpha = jax.random.normal(ka, (n_samples, n)) ** 2
        sigma = -jnp.sort(-jax.random.normal(ks, (n_samples, n)), axis=1)
        theta = -jnp.sort(-jax.random.normal(kt, (n_samples, r)), axis=1)
        perm = jnp.argsort(jax.random.uniform(kp, (n_samples, n)), axis=1)[:, :r]
        a_perm = jnp.take_along_axis(alpha, perm, axis=1)
        s_perm = jnp.take_along_axis(sigma, perm, axis=1)
        a_top = (alpha[:, :r] * sigma[:, :r] ** 2).sum(1) + (a_perm * theta**2).sum(1)
        b = 2 * (alpha[:, :r] * theta * s_perm).sum(1)
        probs[r] = float(jnp.mean(a_top >= b))
    return {"probs": probs}


def draw_probability_grid(
    key: jax.Array,
    n_max: int = 16,
    n_samples: int = 4000,
) -> dict:
    """Empirical vs theoretical draw-count grid (notebook cells 16-18):
    expected number of ``r`` uniform draws from ``{1..n}`` landing in
    ``{1..r}`` is ``r^2 / n``. Returns the max absolute deviation over the
    lower-triangular (n, r) grid."""
    max_err = 0.0
    for i in range(n_max):
        for j in range(i + 1):
            k = jax.random.fold_in(key, i * n_max + j)
            draws = jax.random.randint(k, (n_samples, j + 1), 1, i + 2)
            emp = float((draws <= j + 1).sum()) / n_samples
            max_err = max(max_err, abs(emp - (j + 1) ** 2 / (i + 1)))
    return {"max_abs_error": max_err}


def random_rank_spectrum(
    key: jax.Array,
    sizes: tuple[int, ...] = (32, 64),
    rank: int = 8,
    n_samples: int = 200,
) -> dict:
    """Singular-value distribution of random rank-r Gaussian products
    (notebook cells 25-34): mean spectra are strictly ordered and the top
    singular value grows with the ambient dimension ``n``."""
    out = {}
    for i, n in enumerate(sizes):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        g1 = jax.random.normal(k1, (n_samples, n, rank))
        g2 = jax.random.normal(k2, (n_samples, rank, n))
        s = jnp.linalg.svd(jnp.einsum("tnr,trm->tnm", g1, g2), compute_uv=False)
        out[n] = [float(v) for v in jnp.mean(s[:, :rank], axis=0)]
    return {"mean_spectra": out}
