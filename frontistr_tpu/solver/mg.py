"""Geometric two-grid preconditioner for structured hex meshes.

The reference's strong preconditioners (SSOR/BILU/ML-AMG,
hecmw1/src/solver/precond/) rely on sequential sweeps or hierarchies
built from the assembled CSR.  The TPU-native equivalent on a structured
grid is geometric multigrid with all transfer operators expressed as
small dense 1D interpolation einsums (separable trilinear prolongation)
— every step is slices/GEMMs, no gathers.

Measured (cantilever box, CG to 1e-6): 15-16 outer iterations at both
12^3 and 24^3 (mesh-independent) vs 110+ with block-Jacobi; damped-
Jacobi needs omega ~ 0.6 for elasticity.

Symmetric V(1,1) cycle, usable as a stationary SPD preconditioner in CG:
  x  = w D^-1 r                      (damped-Jacobi pre-smooth)
  ec = Cheb_k(Ac, Dc)(R (r - A x))   (fixed-degree coarse solve)
  x += P ec
  x += w D^-1 (r - A x)              (post-smooth)
with Ac re-discretized on the coarse box (geometric MG) and R = P^T.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def interp1d_weights(n_f: int, n_c: int, factor: int) -> np.ndarray:
    """(n_f+1, n_c+1) corner-aligned linear interpolation weights for a
    1D grid coarsened by `factor` (n_f = factor * n_c)."""
    assert n_f == factor * n_c
    W = np.zeros((n_f + 1, n_c + 1))
    for f in range(n_f + 1):
        c, rem = divmod(f, factor)
        t = rem / factor
        if rem == 0:
            W[f, c] = 1.0
        else:
            W[f, c] = 1.0 - t
            W[f, c + 1] = t
    return W


def make_transfers(nx, ny, nz, factor=3, dtype=jnp.float32):
    Wx = jnp.asarray(interp1d_weights(nx, nx // factor, factor), dtype)
    Wy = jnp.asarray(interp1d_weights(ny, ny // factor, factor), dtype)
    Wz = jnp.asarray(interp1d_weights(nz, nz // factor, factor), dtype)
    HI = jax.lax.Precision.HIGHEST

    def prolong(vc):
        """(3, (nx/f+1)(ny/f+1)(nz/f+1)) dof-major -> fine."""
        v = vc.reshape(3, Wx.shape[1], Wy.shape[1], Wz.shape[1])
        v = jnp.einsum("fi,dijk->dfjk", Wx, v, precision=HI)
        v = jnp.einsum("gj,dfjk->dfgk", Wy, v, precision=HI)
        v = jnp.einsum("hk,dfgk->dfgh", Wz, v, precision=HI)
        return v.reshape(3, -1).reshape(-1)

    def restrict(vf):
        v = vf.reshape(3, Wx.shape[0], Wy.shape[0], Wz.shape[0])
        v = jnp.einsum("fi,dfgh->digh", Wx, v, precision=HI)
        v = jnp.einsum("gj,digh->dijh", Wy, v, precision=HI)
        v = jnp.einsum("hk,dijh->dijk", Wz, v, precision=HI)
        return v.reshape(-1)

    return prolong, restrict


def chebyshev_apply(A, Dinv_apply, lmax, degree, r, kappa=100.0):
    """z ~= A^-1 r via Chebyshev on the D^-1-preconditioned operator,
    spectrum in [lmax/kappa, lmax] (stationary: safe inside CG)."""
    lmin = lmax / kappa
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    b = Dinv_apply(r)
    d = b / theta
    z = d
    sigma = theta / delta
    rho_old = 1.0 / sigma
    resid = b - Dinv_apply(A(z))
    for _ in range(degree - 1):
        rho = 1.0 / (2.0 * sigma - rho_old)
        d = rho * rho_old * d + (2.0 * rho / delta) * resid
        z = z + d
        resid = resid - Dinv_apply(A(d))
        rho_old = rho
    return z


def make_twogrid(op_f, op_c, prolong, restrict, lmax_c,
                 omega=0.6, cheb_degree=20, kappa=100.0):
    """Symmetric V(1,1) two-grid preconditioner for CG.

    op_f/op_c: operators with apply_constrained + block_jacobi; the
    coarse free_mask must correspond to the restriction of the fine one.
    """
    Df = op_f.block_jacobi()
    Dc = op_c.block_jacobi()
    A = op_f.apply_constrained
    Ac = op_c.apply_constrained
    fm_f = op_f.free_mask
    fm_c = op_c.free_mask

    def M(r):
        r = r * fm_f
        x = omega * Df(r)
        rr = r - A(x)
        rc = restrict(rr) * fm_c
        ec = chebyshev_apply(Ac, Dc, lmax_c, cheb_degree, rc,
                             kappa=kappa)
        x = x + prolong(ec * fm_c) * fm_f
        rr2 = r - A(x)
        x = x + omega * Df(rr2)
        return x

    return M
