"""Nodal stress/strain smoothing.

Rebuilds fstr_NodalStress3D / fstr_NodalStress2D
(fistr1/src/analysis/static/fstr_NodalStress.f90) as one precomputed
extrapolation matrix per element type:

    nodal_vals(e) = EXTRAP[etype] @ gauss_vals(e)        # (nn, nq) @ (nq, ns)

followed by a global scatter-add + per-node count average, exactly matching
the reference's algorithm:
  - tri3/tet4/prism6: gauss mean broadcast to all nodes (NodalStress_C2/C3)
  - quad4/tri6/quad8/tet10/hex8/prism15/hex20: least-squares-free inverse
    shape-function extrapolation on corner gauss subsets, midside nodes =
    average of adjacent corners (NodalStress_INV2/INV3,
    fstr_NodalStress.f90:69-106, 320-470)
  - element value = plain gauss mean (ElementStress_C2/C3)
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List

import numpy as np

from frontistr_tpu.elements.tables import ETYPE_INFO, get_table

# midside-node -> (cornerA, cornerB) tables, FSTR ordering (0-based),
# from NodalStress_INV2/INV3 averaging blocks
_MIDS = {
    232: {3: (0, 1), 4: (1, 2), 5: (2, 0)},
    242: {4: (0, 1), 5: (1, 2), 6: (2, 3), 7: (3, 0)},
    342: {4: (0, 1), 5: (1, 2), 6: (2, 0), 7: (0, 3), 8: (1, 3), 9: (2, 3)},
    352: {6: (0, 1), 7: (1, 2), 8: (2, 0), 9: (3, 4), 10: (4, 5),
          11: (5, 3), 12: (0, 3), 13: (1, 4), 14: (2, 5)},
    362: {8: (0, 1), 9: (1, 2), 10: (2, 3), 11: (3, 0),
          12: (4, 5), 13: (5, 6), 14: (6, 7), 15: (7, 4),
          16: (0, 4), 17: (1, 5), 18: (2, 6), 19: (3, 7)},
}

# gauss subset used for corner extrapolation (0-based indices into the
# element's own rule), and the lower-order "corner element" providing the
# shape functions (fstr_NodalStress.f90:69-106)
_CORNER_RULE = {
    232: (231, [0, 1, 2]),
    241: (241, [0, 1, 2, 3]),
    242: (241, [0, 2, 6, 8]),
    342: (341, [0, 1, 2, 3]),
    361: (361, [0, 1, 2, 3, 4, 5, 6, 7]),
    352: (351, [0, 1, 2, 6, 7, 8]),
    362: (361, [0, 2, 6, 8, 18, 20, 24, 26]),
}

_CORNER_SF = {231: 3, 241: 4, 341: 4, 351: 6, 361: 8}


@lru_cache(maxsize=None)
def extrapolation_matrix(etype: int) -> np.ndarray:
    """(nn, nq) matrix mapping gauss values to nodal values."""
    table = get_table(etype)
    nn, nq = table.nn, table.nq
    if etype not in _CORNER_RULE:
        # gauss-average broadcast (tri3, tet4, prism6 and any fallback)
        return np.full((nn, nq), 1.0 / nq)

    corner_etype, subset = _CORNER_RULE[etype]
    from frontistr_tpu.elements.tables import ETYPE_INFO as EI
    _, nc, sf, _ = EI[corner_etype]
    import jax.numpy as jnp
    # shape functions of the corner element evaluated at the subset points
    pts = table.points[subset]
    A = np.stack([np.asarray(sf(jnp.asarray(p, jnp.float64))) for p in pts])
    Ainv = np.linalg.inv(A)                       # (nc, len(subset))
    E = np.zeros((nn, nq))
    for col, q in enumerate(subset):
        E[:nc, q] = Ainv[:, col]
    for mid, (a, b) in _MIDS.get(etype, {}).items():
        E[mid] = 0.5 * (E[a] + E[b])
    return E


def mises_3d(s: np.ndarray) -> np.ndarray:
    """von Mises from 6-component stress (get_mises,
    fstr_NodalStress.f90:483-499)."""
    s11, s22, s33 = s[..., 0], s[..., 1], s[..., 2]
    s12, s23, s13 = s[..., 3], s[..., 4], s[..., 5]
    ps = (s11 + s22 + s33) / 3.0
    sm = 0.5 * ((s11 - ps) ** 2 + (s22 - ps) ** 2 + (s33 - ps) ** 2) \
        + s12 ** 2 + s23 ** 2 + s13 ** 2
    return np.sqrt(3.0 * sm)


def mises_2d(s: np.ndarray) -> np.ndarray:
    """2D von Mises (fstr_NodalStress2D: 0.5*((s11-s22)^2+s11^2+s22^2)+3 s12^2)."""
    s11, s22, s12 = s[..., 0], s[..., 1], s[..., 2]
    return np.sqrt(0.5 * ((s11 - s22) ** 2 + s11 ** 2 + s22 ** 2)
                   + 3.0 * s12 ** 2)


def smooth(n_node: int, block_data: List[dict], dim: int):
    """Average per-element nodal values onto mesh nodes.

    Args:
      block_data: list of dicts with keys
        'conn' (E, nn), 'gauss_strain' (E, nq, ns), 'gauss_stress' (E, nq, ns),
        'etype'.
      dim: 2 or 3.

    Returns dict with nodal 'strain', 'stress', 'mises' and per-block element
    means ('estrain', 'estress', 'emises' lists).
    """
    ns = 6 if dim == 3 else 3
    acc_eps = np.zeros((n_node, ns))
    acc_sig = np.zeros((n_node, ns))
    count = np.zeros(n_node)
    est_list, ess_list, ems_list = [], [], []
    for bd in block_data:
        etype = bd["etype"]
        conn = bd["conn"]
        if bd.get("skip"):        # beam blocks: no continuum stress
            E = len(bd["gauss_strain"])
            est_list.append(np.zeros((E, ns)))
            ess_list.append(np.zeros((E, ns)))
            ems_list.append(np.zeros(E))
            continue
        geps = np.asarray(bd["gauss_strain"])[..., :ns]
        gsig = np.asarray(bd["gauss_stress"])[..., :ns]
        Ex = extrapolation_matrix(etype)
        nd_eps = np.einsum("nq,eqs->ens", Ex, geps)
        nd_sig = np.einsum("nq,eqs->ens", Ex, gsig)
        np.add.at(acc_eps, conn.reshape(-1), nd_eps.reshape(-1, ns))
        np.add.at(acc_sig, conn.reshape(-1), nd_sig.reshape(-1, ns))
        np.add.at(count, conn.reshape(-1), 1.0)
        e_eps = geps.mean(axis=1)
        e_sig = gsig.mean(axis=1)
        est_list.append(e_eps)
        ess_list.append(e_sig)
        ems_list.append(mises_3d(e_sig) if dim == 3 else mises_2d(e_sig))
    cnt = np.where(count == 0, 1.0, count)
    nd_eps = acc_eps / cnt[:, None]
    nd_sig = acc_sig / cnt[:, None]
    nmises = mises_3d(nd_sig) if dim == 3 else mises_2d(nd_sig)
    return dict(strain=nd_eps, stress=nd_sig, mises=nmises, count=count,
                estrain=est_list, estress=ess_list, emises=ems_list)
