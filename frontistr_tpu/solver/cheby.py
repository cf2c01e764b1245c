"""Chebyshev polynomial preconditioner.

The reference's strong preconditioners (SSOR PRECOND=1/2, BILU) are
sequential forward/backward sweeps — hostile to TPU vector units.  The
TPU-native equivalent with similar iteration-count reduction is a fixed-
degree Chebyshev polynomial in the block-Jacobi-preconditioned operator:
z = p_k(M_J A) M_J r with p_k fitted to 1/lambda on [alpha*lmax, lmax].
All matvecs, no data-dependent branches, fuses into the CG while_loop.

lmax is estimated once per solve by power iteration (the analogue of the
reference's auto-sigma logic in hecmw_solver_Iterative.f90).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def estimate_lmax(A, M, n, iters: int = 12, seed: int = 7) -> float:
    """Power iteration on M A (SPD in the M^-1 inner product)."""
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal(n))
    v = v / jnp.linalg.norm(v)
    step = jax.jit(lambda x: M(A(x)))
    lam = 1.0
    for _ in range(iters):
        w = step(v)
        lam = float(jnp.linalg.norm(w))
        v = w / lam
    return lam


def chebyshev_precond(A, M, lmax: float, degree: int = 8,
                      alpha: float = 1.0 / 30.0):
    """Returns a linear operator z = p(M A) M r approximating (M A)^-1 M.

    Standard Chebyshev semi-iteration for the SPD operator B = M A with
    spectrum assumed in [alpha*lmax, lmax] (fourth-kind-free classic
    recurrence; zero initial guess)."""
    lmin = alpha * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    def apply(r):
        # Chebyshev iteration solving B z = M r, z0 = 0 (correction form)
        b = M(r)
        d = b / theta
        z = d
        sigma = theta / delta
        rho_old = 1.0 / sigma
        resid = b - M(A(z))
        for _ in range(degree - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            d = rho * rho_old * d + (2.0 * rho / delta) * resid
            z = z + d
            resid = resid - M(A(d))
            rho_old = rho
        return z

    return apply
