"""Beam elements 611 (2-node, 6 dof/node) and 641 (3x4-dof packing).

TPU re-design of the reference beam kernels (fistr1/src/lib/
static_LIB_beam.f90): the classic 12x12 Euler-Bernoulli + torsion beam
stiffness in a local frame built from the section's reference vector
(framtr:18-57), batched over elements.

Section parameters (!SECTION TYPE=BEAM data line, fstr_setup.f90):
  (vx, vy, vz, area, Iyy, Izz, Jx) -- the first three form the reference
vector defining the local z axis plane.

641 is the same beam expressed as a 4-"node" element with 3 dof per node
(nodes 1,2 carry translations, nodes 3,4 the rotations of nodes 1,2 —
STF_Beam_641:156-420) so beams can live in an NDOF=3 solid system.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 611 dof order [u1, th1, u2, th2] -> 641 order [u1, u2, th1, th2]
_P641 = np.array([0, 1, 2, 6, 7, 8, 3, 4, 5, 9, 10, 11])


def _frame(x, refv):
    """Local frame per element (framtr): rows (t1 axial, t2, t3)."""
    d = x[:, 1, :] - x[:, 0, :]
    le = jnp.linalg.norm(d, axis=-1)
    t1 = d / le[:, None]
    r = jnp.broadcast_to(jnp.asarray(refv, x.dtype), t1.shape)
    t2 = jnp.cross(r, t1)
    t2 = t2 / jnp.linalg.norm(t2, axis=-1, keepdims=True)
    t3 = jnp.cross(t1, t2)
    return le, jnp.stack([t1, t2, t3], axis=1)       # (E,), (E,3,3)


def _local_k(le, ee, pp, a, iy, iz, jx, dtype):
    """(E,12,12) local beam stiffness (STF_Beam:85-141)."""
    E = le.shape[0]
    g = ee / (2.0 * (1.0 + pp))
    L2, L3 = le * le, le * le * le
    ea = ee * a / le
    twoe, foure = 2.0 * ee / le, 4.0 * ee / le
    twelvee, sixe = 12.0 * ee / L3, 6.0 * ee / L2
    gj = g * jx / le
    k = jnp.zeros((E, 12, 12), dtype)

    def s(i, j, v):
        nonlocal k
        k = k.at[:, i - 1, j - 1].set(v)
        if i != j:
            k = k.at[:, j - 1, i - 1].set(v)
    s(1, 1, ea); s(7, 1, -ea); s(7, 7, ea)
    s(2, 2, twelvee * iz); s(6, 2, sixe * iz)
    s(8, 2, -twelvee * iz); s(12, 2, sixe * iz)
    s(3, 3, twelvee * iy); s(5, 3, -sixe * iy)
    s(9, 3, -twelvee * iy); s(11, 3, -sixe * iy)
    s(4, 4, gj); s(10, 4, -gj); s(10, 10, gj)
    s(5, 5, foure * iy); s(9, 5, sixe * iy); s(11, 5, twoe * iy)
    s(6, 6, foure * iz); s(8, 6, -sixe * iz); s(12, 6, twoe * iz)
    s(8, 8, twelvee * iz); s(12, 8, -sixe * iz)
    s(9, 9, twelvee * iy); s(11, 9, sixe * iy)
    s(11, 11, foure * iy)
    s(12, 12, foure * iz)
    return k


def stiffness_beam(coords, section, ee, pp, etype=611):
    """coords (E,nn,3) (nn=2 for 611, 4 for 641 — only the first two carry
    geometry), section = 7 floats -> (E,12,12) global stiffness."""
    x = coords[:, :2, :]
    refv = np.asarray(section[0:3], float)
    a, iy, iz, jx = (float(section[3]), float(section[4]),
                     float(section[5]), float(section[6]))
    le, t = _frame(x, refv)
    k = _local_k(le, ee, pp, a, iy, iz, jx, coords.dtype)
    # block-diagonal rotation: 4 blocks of t
    T = jnp.zeros((le.shape[0], 12, 12), coords.dtype)
    for b in range(4):
        T = T.at[:, 3 * b:3 * b + 3, 3 * b:3 * b + 3].set(t)
    kg = jnp.einsum("eji,ejk,ekl->eil", T, k, T)    # T^T k T
    if etype == 641:
        P = _P641
        kg = kg[:, P[:, None], P[None, :]]
    return kg


def nqm_beam_641(coords, section, ee, disp_e, radius=0.0, angles=None,
                 thermal=0.0):
    """Fiber strain/stress at 6 angular section positions for 641 beams
    (NodalStress_Beam_641 / ElementalStress_Beam_641,
    static_LIB_beam.f90:646-980).

    disp_e: (E, 4, 3) nodal values in the 641 packing (nodes 1-2 =
    translations, nodes 3-4 = rotations).  radius/angles come from the
    extended !MATERIAL ELASTIC row (E, nu, radius, angle1..6 —
    fstr_get_prop.f90:91-99; radius 0 = pure axial fiber).
    Returns (nd_strain (E, 4, 6), nd_stress (E, 4, 6),
             el_strain (E, 6), el_stress (E, 6)): components k = fiber k,
    zeros on the rotation rows, matching the reference layout.
    """
    if angles is None:
        angles = np.zeros(6)
    ang = np.deg2rad(np.asarray(angles, float))
    x2h = radius * np.cos(ang)                   # (6,)
    x3h = radius * np.sin(ang)
    le, T = _frame(coords[:, :2, :], np.asarray(section[:3], float))
    l2 = le * le
    l3 = l2 * le
    # rotate nodal values into the local frame: (E, 4, 3)
    dh = jnp.einsum("eij,enj->eni", T, disp_e)
    du_ax = (dh[:, 1, 0] - dh[:, 0, 0]) / le     # axial strain (E,)

    def fiber_stress(x1h):
        # Hermite curvature terms (static_LIB_beam.f90:824-838)
        c1 = -6.0 / l2 + 12.0 * x1h / l3
        c2 = -4.0 / le + 6.0 * x1h / l2
        c3 = 6.0 / l2 - 12.0 * x1h / l3
        c4 = -2.0 / le + 6.0 * x1h / l2
        bend2 = (c1 * dh[:, 0, 1] + c2 * dh[:, 2, 2]
                 + c3 * dh[:, 1, 1] + c4 * dh[:, 3, 2])
        bend3 = (c1 * dh[:, 0, 2] - c2 * dh[:, 2, 1]
                 + c3 * dh[:, 1, 2] - c4 * dh[:, 3, 1])
        # (E, 6): sigma_k = E(eps_ax - x2h_k bend2 - x3h_k bend3) - Eath
        sig = ee * (du_ax[:, None]
                    - jnp.asarray(x2h)[None, :] * bend2[:, None]
                    - jnp.asarray(x3h)[None, :] * bend3[:, None]) \
            - ee * thermal
        return sig

    Ee = coords.shape[0]
    eps = jnp.broadcast_to(du_ax[:, None], (Ee, 6))
    sig_mid = fiber_stress(0.5 * le)
    sig_n1 = fiber_stress(jnp.zeros_like(le))
    sig_n2 = fiber_stress(le)
    nd_strain = jnp.zeros((Ee, 4, 6)).at[:, 0, :].set(eps) \
        .at[:, 1, :].set(eps)
    nd_stress = jnp.zeros((Ee, 4, 6)).at[:, 0, :].set(sig_n1) \
        .at[:, 1, :].set(sig_n2)
    return (np.asarray(nd_strain), np.asarray(nd_stress),
            np.asarray(eps), np.asarray(sig_mid))
