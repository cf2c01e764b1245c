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


def eigh3_voigt(v6):
    """Analytic symmetric 3x3 eigendecomposition for Voigt vectors
    (s11,s22,s33,s12,s23,s31) -> (evals (...,3) ascending, evecs (...,3,3)
    columns).

    TPU-safe replacement for the reference's Jacobi eigen3
    (m_utilities): f64 Eigh is not lowered on TPU, so we use the
    trigonometric eigenvalue formula + spectral-projector eigenvectors,
    branch-free over the batch.  Degenerate (repeated-eigenvalue) inputs
    get orthonormalized fallback vectors.
    """
    s11, s22, s33 = v6[..., 0], v6[..., 1], v6[..., 2]
    s12, s23, s31 = v6[..., 3], v6[..., 4], v6[..., 5]
    A = jnp.stack([
        jnp.stack([s11, s12, s31], -1),
        jnp.stack([s12, s22, s23], -1),
        jnp.stack([s31, s23, s33], -1)], -2)
    q = (s11 + s22 + s33) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=v6.dtype)
    p2 = jnp.sum(B * B, axis=(-1, -2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.where(p < 1e-30, 1.0, p)
    detB = jnp.linalg.det(B) if False else (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2]
                        - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2]
                          - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1]
                          - B[..., 1, 1] * B[..., 2, 0]))
    r = jnp.clip(detB / (2.0 * safe_p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * 3.141592653589793 / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3
    evals = jnp.stack([lam3, lam2, lam1], -1)              # ascending

    eye = jnp.eye(3, dtype=v6.dtype)

    def projector_vec(li, lj, lk):
        # P = (A-lj)(A-lk) / ((li-lj)(li-lk)); eigenvector = best column
        P = jnp.einsum("...ij,...jk->...ik",
                       A - lj[..., None, None] * eye,
                       A - lk[..., None, None] * eye)
        norms = jnp.sum(P * P, axis=-2)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(P, best[..., None, None],
                                axis=-1)[..., 0]
        n = jnp.sqrt(jnp.sum(v * v, -1))
        degen = n < 1e-30 * (1.0 + jnp.abs(li))
        v = jnp.where(degen[..., None],
                      jnp.zeros_like(v).at[..., 0].set(1.0), v)
        n = jnp.sqrt(jnp.sum(v * v, -1))
        return v / n[..., None]

    v3 = projector_vec(lam3, lam2, lam1)
    v1 = projector_vec(lam1, lam3, lam2)
    # middle vector: orthogonal completion (robust when lam2 degenerate)
    v2 = jnp.cross(v3, v1)
    n2 = jnp.sqrt(jnp.sum(v2 * v2, -1))
    degen = n2 < 1e-12
    v1r = jnp.where(degen[..., None], _orthonormal_to(v3), v1)
    v2 = jnp.cross(v3, v1r)
    v2 = v2 / jnp.sqrt(jnp.sum(v2 * v2, -1))[..., None]
    v1r2 = jnp.cross(v2, v3)
    evecs = jnp.stack([v3, v2, v1r2], -1)   # columns: ascending order
    return evals, evecs


def _orthonormal_to(v):
    """A unit vector orthogonal to v (branch-free)."""
    ex = jnp.zeros_like(v).at[..., 0].set(1.0)
    ey = jnp.zeros_like(v).at[..., 1].set(1.0)
    use_y = jnp.abs(v[..., 0]) > 0.9
    a = jnp.where(use_y[..., None], ey, ex)
    w = a - jnp.sum(a * v, -1, keepdims=True) * v
    return w / jnp.sqrt(jnp.sum(w * w, -1))[..., None]
