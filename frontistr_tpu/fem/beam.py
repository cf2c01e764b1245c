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
