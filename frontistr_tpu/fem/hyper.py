"""Hyperelastic constitutive models (total-Lagrangian).

TPU-native formulation: each material is a scalar strain-energy density
W(E) of the Voigt Green-Lagrange strain (engineering shear); the 2nd
Piola-Kirchhoff stress and material tangent come from forward-mode autodiff

    S = dW/dE,        D = d2W/dE2

which is mathematically identical to the reference's hand-derived
invariant-derivative chains (fistr1/src/lib/physics/Hyperelastic.f90
cderiv/calElasticMooneyRivlin/calElasticArrudaBoyce: S = 2 dW/dC,
C_ijkl = 4 d2W/dC2) but exact-by-construction and fused by XLA.

Energy functions (constants (c10, c01, d) / (c1, lambda_m, d), parsed from
!HYPERELASTIC per fstr_ctrl_material.f90:166-240):
  Mooney-Rivlin / Neo-Hooke (c01=0):
      W = c10 (I1b - 3) + c01 (I2b - 3) + (J-1)^2 / d
  Arruda-Boyce:
      W = c1 (I1b/2 + I1b^2/(20 lm^2) + 11 I1b^3/(1050 lm^4)
            + 19 I1b^4/(7000 lm^6) + 519 I1b^5/(673750 lm^8) + const)
          + (J^2/2 - ln J) / d
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def right_cauchy_green(E_voigt):
    """C = 2E + I from Voigt GL strain (eng. shear), Hyperelastic.f90:42-48."""
    e11, e22, e33, g12, g23, g31 = (E_voigt[..., i] for i in range(6))
    c11 = 2 * e11 + 1
    c22 = 2 * e22 + 1
    c33 = 2 * e33 + 1
    row0 = jnp.stack([c11, g12, g31], -1)
    row1 = jnp.stack([g12, c22, g23], -1)
    row2 = jnp.stack([g31, g23, c33], -1)
    return jnp.stack([row0, row1, row2], -2)


def invariants(C):
    I1 = jnp.trace(C, axis1=-2, axis2=-1)
    CC = C @ C
    I2 = 0.5 * (I1 ** 2 - jnp.trace(CC, axis1=-2, axis2=-1))
    from frontistr_tpu.fem.isoparam import det_inv_small
    I3, _ = det_inv_small(C)
    return I1, I2, I3


def w_mooney_rivlin(E_voigt, c10, c01, d):
    C = right_cauchy_green(E_voigt)
    I1, I2, I3 = invariants(C)
    J = jnp.sqrt(I3)
    I1b = I1 * I3 ** (-1.0 / 3.0)
    I2b = I2 * I3 ** (-2.0 / 3.0)
    return c10 * (I1b - 3.0) + c01 * (I2b - 3.0) + (J - 1.0) ** 2 / d


def w_neohooke(E_voigt, ee, nu):
    """Compressible neo-Hooke in (E, nu) form (ElasticNeoHooke.f90:7-9):
        W = mu/2 (Ic - 3) - mu ln J + lambda/2 (ln J)^2
    with Lame constants from the material's ELASTIC properties — the
    reference's NEOHOOKE law reads M_YOUNGS/M_POISSON (set by the mesh
    !MATERIAL or the cnt !ELASTIC card) and IGNORES the !HYPERELASTIC
    card values (fstr_ctrl stores them in the unused PLCONST slots)."""
    C = right_cauchy_green(E_voigt)
    I1, I2, I3 = invariants(C)
    lam = nu * ee / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = ee / (2.0 * (1.0 + nu))
    lnJ = 0.5 * jnp.log(I3)
    return 0.5 * mu * (I1 - 3.0) - mu * lnJ + 0.5 * lam * lnJ ** 2


def w_arruda_boyce(E_voigt, c1, lm, d):
    C = right_cauchy_green(E_voigt)
    I1, I2, I3 = invariants(C)
    J = jnp.sqrt(I3)
    I1b = I1 * I3 ** (-1.0 / 3.0)
    lm2 = lm * lm
    series = (I1b / 2.0 + I1b ** 2 / (20.0 * lm2)
              + 11.0 * I1b ** 3 / (1050.0 * lm2 ** 2)
              + 19.0 * I1b ** 4 / (7000.0 * lm2 ** 3)
              + 519.0 * I1b ** 5 / (673750.0 * lm2 ** 4))
    return c1 * series + (J * J / 2.0 - jnp.log(J)) / d


_W_FUNCS = {
    "NEOHOOKE": w_neohooke,            # (E, nu) log-J form
    "MOONEY-RIVLIN": w_mooney_rivlin,
    "MOONEYRIVLIN": w_mooney_rivlin,
    "ARRUDA-BOYCE": w_arruda_boyce,
    "ARRUDABOYCE": w_arruda_boyce,
}


def make_hyper_fns(mtype: str, consts):
    """Returns (pk2(E_batch) -> S_batch, tangent(E_batch) -> D_batch),
    batched over arbitrary leading axes of (..., 6) strain."""
    wf = _W_FUNCS[mtype.upper()]
    if mtype.upper() == "NEOHOOKE":
        # caller passes the material's (E, nu); card values unused
        c = [float(consts[0]), float(consts[1])]
    else:
        c = [float(v) for v in consts[:3]]

    def w(e):
        return wf(e, *c)

    grad = jax.grad(w)
    hess = jax.jacfwd(grad)

    def pk2(E):
        flat = E.reshape(-1, 6)
        S = jax.vmap(grad)(flat)
        return S.reshape(E.shape)

    def tangent(E):
        flat = E.reshape(-1, 6)
        D = jax.vmap(hess)(flat)
        return D.reshape(E.shape + (6,))

    return pk2, tangent
