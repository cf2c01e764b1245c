"""Small batched dense linear algebra that works on TPU in f64.

TPU's LuDecomposition/Cholesky custom calls only support f32, so all the
small per-element factorizations (nodal 3x3 blocks, the 9x9 incompatible-mode
condensation, tridiagonal eigen) are written as statically-unrolled
elementwise ops — pure VPU code that XLA fuses into the surrounding kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def gauss_jordan_inv(A: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of (..., n, n) via statically-unrolled Gauss-Jordan
    with diagonal pivoting (fine for the SPD/diagonally-dominant blocks this
    framework produces)."""
    n = A.shape[-1]
    M = A
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    for i in range(n):
        piv = M[..., i:i + 1, i:i + 1]
        row_m = M[..., i:i + 1, :] / piv
        row_i = I[..., i:i + 1, :] / piv
        M = M.at[..., i, :].set(row_m[..., 0, :])
        I = I.at[..., i, :].set(row_i[..., 0, :])
        fac = M[..., :, i:i + 1]
        mask = jnp.arange(n) != i
        fac = jnp.where(mask[:, None], fac, 0.0)
        M = M - fac * row_m
        I = I - fac * row_i
    return I


def cholesky_small(A: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky of SPD (..., n, n), statically unrolled."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[..., j, k] * L[..., j, k]
        d = jnp.sqrt(s)
        L = L.at[..., j, j].set(d)
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[..., i, k] * L[..., j, k]
            L = L.at[..., i, j].set(s / d)
    return L


def spd_solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD (..., n, n) x = (..., n) via unrolled Cholesky."""
    n = A.shape[-1]
    L = cholesky_small(A)
    y = jnp.zeros_like(b)
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[..., k]
        y = y.at[..., i].set(s / L[..., i, i])
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        s = y[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[..., k]
        x = x.at[..., i].set(s / L[..., i, i])
    return x
