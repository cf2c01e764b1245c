"""Batched isoparametric geometry.

Replaces the reference's per-point ``getGlobalDeriv`` (fistr1/src/lib/element/
element.f90) with element-batched einsums: every quantity carries a leading
element axis ``E`` so XLA maps the small dense algebra onto the MXU/VPU.

Conventions (matching the reference):
  J[i, j]      = d x_j / d xi_i = sum_n dN[n, i] * x[n, j]
  gderiv[n, j] = d N_n / d x_j  = (dN @ J^{-T})[n, j]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det_inv_small(J: jnp.ndarray):
    """Closed-form determinant + inverse for batched 2x2 / 3x3 matrices.

    TPU has no f64 LU decomposition; cofactor expansion is both supported
    and faster (pure VPU ops, no lane-serial factorization).
    """
    d = J.shape[-1]
    if d == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, e = J[..., 1, 0], J[..., 1, 1]
        det = a * e - b * c
        inv_det = 1.0 / det
        inv = jnp.stack([
            jnp.stack([e, -b], -1),
            jnp.stack([-c, a], -1),
        ], -2) * inv_det[..., None, None]
        return det, inv
    if d == 3:
        a00, a01, a02 = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
        a10, a11, a12 = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
        a20, a21, a22 = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
        c00 = a11 * a22 - a12 * a21
        c01 = a12 * a20 - a10 * a22
        c02 = a10 * a21 - a11 * a20
        det = a00 * c00 + a01 * c01 + a02 * c02
        inv_det = 1.0 / det
        inv = jnp.stack([
            jnp.stack([c00, a02 * a21 - a01 * a22, a01 * a12 - a02 * a11], -1),
            jnp.stack([c01, a00 * a22 - a02 * a20, a02 * a10 - a00 * a12], -1),
            jnp.stack([c02, a01 * a20 - a00 * a21, a00 * a11 - a01 * a10], -1),
        ], -2) * inv_det[..., None, None]
        return det, inv
    det = jnp.linalg.det(J)
    return det, jnp.linalg.inv(J)


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
    J = jnp.einsum("qni,enj->eqij", dN, coords_e,
                    precision=jax.lax.Precision.HIGHEST)
    det, Jinv = det_inv_small(J)
    # gderiv[e,q,n,j] = sum_i dN[q,n,i] * Jinv[e,q,j,i]  (= dN @ J^{-T})
    gderiv = jnp.einsum("qni,eqji->eqnj", dN, Jinv,
                       precision=jax.lax.Precision.HIGHEST)
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
