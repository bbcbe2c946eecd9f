"""Reference-notebook experiments as library functions.

BASELINE.json gates numerics parity on the reference's research notebooks:
  * ``Linear Regression SoW.ipynb`` (missing upstream; reconstructed per
    SURVEY §0 from ``MLP Low Rank Approximation.ipynb`` cells 3-5) — fit
    ``y = xW + b`` with a SoW layer, tracking effective rank across
    accumulations;
  * ``MLP Low Rank Approximation.ipynb`` — depth vs low-rank
    approximation error;
  * ``Reduced Rank Regression.ipynb`` — closed-form RRR vs truncated-SVD
    fit error on synthetic ``Y = XW + noise``.

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
