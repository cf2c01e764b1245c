"""Batched isoparametric geometry.

Replaces the reference's per-point ``getGlobalDeriv`` (fistr1/src/lib/element/
element.f90) with element-batched einsums: every quantity carries a leading
element axis ``E`` so XLA maps the small dense algebra onto the MXU/VPU.

Conventions (matching the reference):
  J[i, j]      = d x_j / d xi_i = sum_n dN[n, i] * x[n, j]
  gderiv[n, j] = d N_n / d x_j  = (dN @ J^{-T})[n, j]
"""

from __future__ import annotations

import jax.numpy as jnp


def jacobians(dN: jnp.ndarray, coords_e: jnp.ndarray):
    """Per-quadrature-point Jacobians for a batch of elements.

    Args:
      dN: (nq, nn, dim) natural shape derivatives (static table).
      coords_e: (E, nn, dim) element node coordinates.

    Returns:
      det: (E, nq) Jacobian determinants.
      gderiv: (E, nq, nn, dim) global shape derivatives.
    """
    # J: (E, nq, dim, dim);  J[e,q,i,j] = sum_n dN[q,n,i] coords[e,n,j]
    J = jnp.einsum("qni,enj->eqij", dN, coords_e)
    det = jnp.linalg.det(J)
    Jinv = jnp.linalg.inv(J)
    # gderiv[e,q,n,j] = sum_i dN[q,n,i] * Jinv[e,q,j,i]  (= dN @ J^{-T})
    gderiv = jnp.einsum("qni,eqji->eqnj", dN, Jinv)
    return det, gderiv


# Constant strain-selection tensors: B = S . gderiv
# 3D Voigt order (e11,e22,e33,g12,g23,g13) — static_LIB_3d.f90:124-135
def strain_selector_3d():
    import numpy as np
    S = np.zeros((6, 3, 3))
    S[0, 0, 0] = 1.0
    S[1, 1, 1] = 1.0
    S[2, 2, 2] = 1.0
    S[3, 0, 1] = S[3, 1, 0] = 1.0
    S[4, 1, 2] = S[4, 2, 1] = 1.0
    S[5, 0, 2] = S[5, 2, 0] = 1.0
    return S


# 2D order (e11,e22,g12,e_theta) — static_LIB_2d.f90:63-71 (4th row handled
# separately for axisymmetric sections)
def strain_selector_2d():
    import numpy as np
    S = np.zeros((4, 2, 2))
    S[0, 0, 0] = 1.0
    S[1, 1, 1] = 1.0
    S[2, 0, 1] = S[2, 1, 0] = 1.0
    return S


def b_matrix(S: jnp.ndarray, gderiv_q: jnp.ndarray) -> jnp.ndarray:
    """Strain-displacement matrix for one quadrature point, batched.

    Args:
      S: (ns, ndof, dim) constant selector.
      gderiv_q: (E, nn, dim) global derivs at this point.

    Returns:
      B: (E, ns, nn*ndof), dof-within-node fastest (matches the reference's
      3*j-2 … 3*j column layout).
    """
    E, nn, _ = gderiv_q.shape
    ns, ndof, _ = S.shape
    B = jnp.einsum("kdj,enj->eknd", S, gderiv_q)
    return B.reshape(E, ns, nn * ndof)
