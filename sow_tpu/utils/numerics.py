"""Numerics helpers: truncated QR/SVD, padding, factorization utilities.

TPU-native counterpart of the reference numerics utils
(``tn_gradient/utils.py:8-141``). All decompositions run in float32 — the
reference round-trips half-precision inputs through fp32 because CUDA QR does
not support half (``tn_gradient/utils.py:8-30``); on TPU we do the same because
QR/SVD lower to fp32 XLA loops and bf16 inputs would lose the factorization's
value.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def qr_weight(weight: jax.Array, rank: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Truncated QR of ``weight`` computed in fp32, cast back to input dtype.

    Mirrors ``tn_gradient/utils.py:8-30``: ``W = Q @ R`` with ``Q`` truncated to
    the first ``rank`` columns and ``R`` to the first ``rank`` rows. Matmul
    precision is forced to ``highest`` — TPU QR is built from blocked
    Householder matmuls that otherwise run in bf16 and destroy the
    factorization (~1e-2 relative error observed vs 1e-6 at fp32).
    """
    dtype = weight.dtype
    with jax.default_matmul_precision("highest"):
        q, r = jnp.linalg.qr(weight.astype(jnp.float32), mode="reduced")
    if rank is not None:
        q = q[:, :rank]
        r = r[:rank, :]
    return q.astype(dtype), r.astype(dtype)


def svd_weight(
    weight: jax.Array, rank: int | None = None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Truncated SVD in fp32 at ``highest`` matmul precision
    (ref ``tn_gradient/utils.py:32-57``)."""
    dtype = weight.dtype
    with jax.default_matmul_precision("highest"):
        u, s, vt = jnp.linalg.svd(weight.astype(jnp.float32), full_matrices=False)
    if rank is not None:
        u = u[:, :rank]
        s = s[:rank]
        vt = vt[:rank, :]
    return u.astype(dtype), s.astype(dtype), vt.astype(dtype)


def pad_matrix(matrix: jax.Array, new_shape: tuple[int, int]) -> jax.Array:
    """Zero-pad a matrix up to ``new_shape`` (ref ``tn_gradient/utils.py:78-84``)."""
    pad_rows = new_shape[0] - matrix.shape[0]
    pad_cols = new_shape[1] - matrix.shape[1]
    if pad_rows < 0 or pad_cols < 0:
        raise ValueError(f"pad_matrix: target {new_shape} smaller than {matrix.shape}")
    if pad_rows == 0 and pad_cols == 0:
        return matrix
    return jnp.pad(matrix, ((0, pad_rows), (0, pad_cols)))


def unpad_matrix(matrix: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Slice the top-left ``shape`` block (ref ``tn_gradient/utils.py:86-87``)."""
    return matrix[: shape[0], : shape[1]]


def closest_factorization(n: int, d: int) -> tuple[list[int], int]:
    """Greedy ``d``-term factorization of ``n`` with factors near ``n**(1/d)``.

    Mirrors ``tn_gradient/utils.py:89-99``. Returns ``(factors, product)`` with
    ``product >= n``.
    """
    factors: list[int] = []
    p, o = 1, n
    while n > 1:
        k = math.ceil(n ** (1 / d))
        factors.append(k)
        n, p, d = n // k, p * k, d - 1
        if n == 1:
            if p < o:
                factors[-1] += n
            return factors, p
    return factors or [1], p


def generate_rank_k(
    key: jax.Array,
    shape: Sequence[int],
    rank: int,
    mix: int = 1,
    pos: bool = False,
) -> jax.Array:
    """Random tensor that is a sum of ``mix`` rank-``rank`` CP terms.

    Functional counterpart of ``tn_gradient/utils.py:101-112`` (which uses the
    global torch RNG); used by the optimizer parity tests to build synthetic
    low-rank gradients.
    """
    tensor = jnp.zeros(tuple(shape), dtype=jnp.float32)
    letters = "abcdefghij"[: len(shape)]
    spec = ",".join(f"{ch}k" for ch in letters) + "->" + letters
    for j in range(mix):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, len(shape))
        factors = [jax.random.uniform(k, (dim, rank)) for k, dim in zip(keys, shape)]
        if not pos:
            factors = [2.0 * f - 1.0 for f in factors]
        tensor = tensor + jnp.einsum(spec, *factors)
    return tensor


def unfolding(tensor: jax.Array, mode: int) -> jax.Array:
    """Mode-``mode`` unfolding: axis ``mode`` to the front, rest flattened.

    Ref ``tn_gradient/utils.py:114-133``.
    """
    d = tensor.ndim
    if mode < 0:
        mode = d + mode
    if mode < 0 or mode >= d:
        raise ValueError("mode out of range")
    return jnp.moveaxis(tensor, mode, 0).reshape(tensor.shape[mode], -1)


def left_unfolding(tensor: jax.Array) -> jax.Array:
    """(a_1..a_{d-1}, a_d) matricization (ref ``utils.py:135-137``)."""
    return unfolding(tensor, -1).T


def right_unfolding(tensor: jax.Array) -> jax.Array:
    """(a_1, a_2..a_d) matricization (ref ``utils.py:139-141``)."""
    return unfolding(tensor, 0)


def randhaar(key: jax.Array, n: int) -> jax.Array:
    """Random n x n orthogonal matrix, Haar-distributed (ref
    ``tn_gradient/utils.py:59-62`` via scipy ortho_group; here QR of a
    Gaussian with sign-fixed R diagonal — the standard Haar construction)."""
    z = jax.random.normal(key, (n, n))
    with jax.default_matmul_precision("highest"):
        q, r = jnp.linalg.qr(z)
    return q * jnp.sign(jnp.diagonal(r))[None, :]


def randuptri(key: jax.Array, n: int, scale: float = 1.0) -> jax.Array:
    """Random upper-triangular matrix with chi-distributed diagonal
    (ref ``tn_gradient/utils.py:64-70``) — together with ``randhaar`` this
    samples QR factors matching a Gaussian matrix's distribution."""
    k1, k2 = jax.random.split(key)
    r = jnp.triu(jax.random.normal(k1, (n, n)))
    dfs = n - jnp.arange(n)
    chi = jnp.sqrt(2.0 * jax.random.gamma(k2, dfs / 2.0))
    return r.at[jnp.arange(n), jnp.arange(n)].set(chi * scale)


def perturbe_random(key: jax.Array, matrix: jax.Array, scale: float = 0.02) -> jax.Array:
    """Gaussian perturbation (ref ``tn_gradient/utils.py:72-76``)."""
    return matrix + scale * jax.random.normal(key, matrix.shape, matrix.dtype)
