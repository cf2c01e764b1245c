"""Element shape-function / quadrature registry.

TPU-first design: instead of the reference's per-point getter subroutines
(``getQuadPoint``/``getShapeFunc``/``getGlobalDeriv`` in
fistr1/src/lib/element/element.f90:404-484), every element type is described by
*static* dense tables evaluated once at build time:

    N      (nq, nn)      shape functions at every quadrature point
    dN     (nq, nn, dim) natural derivatives at every quadrature point
    w      (nq,)         quadrature weights

These constant tables get baked into jitted kernels, so all element math
becomes batched dense matmuls on the MXU with zero dynamic control flow.

Shape function conventions and quadrature rules replicate the reference
exactly so the golden logs match:
  - quadrature points/weights: fistr1/src/lib/element/quadrature.f90
  - rule selection per etype:  fistr1/src/lib/element/element.f90
    (NumOfQuadPoints / getQuadPoint)
  - shape functions: fistr1/src/lib/element/{tri3n,tri6n,quad4n,quad8n,
    tet4n,tet10n,prism6n,prism15n,hex8n,hex20n}.f90

Natural derivatives are obtained by forward-mode autodiff of the shape
functions (exact, and immune to hand-derivation typos).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Gauss abscissae used by the reference (quadrature.f90:47-121)
_G2 = 0.577350269189626  # 1/sqrt(3)
_G3 = 0.774596669241483  # sqrt(3/5)
_W3 = (5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0)

# ---------------------------------------------------------------------------
# Shape functions (FSTR node ordering).  xi is a length-`dim` array.
# ---------------------------------------------------------------------------


def _sf_tri3(xi):
    # tri3n.f90 ShapeFunc_tri3n: func(1:2)=areacoord, func(3)=1-xi-eta.
    # NOTE: deliberately inconsistent with tri6's corner convention
    # (node1<->1-xi-eta there); the reference's nodal-stress extrapolation
    # inherits this quirk and the golden logs depend on it.
    x, e = xi
    return jnp.stack([x, e, 1.0 - x - e])


def _sf_tri6(xi):
    # tri6n.f90 ShapeFunc_tri6n: mids 4=(1,2), 5=(2,3), 6=(3,1)
    x, e = xi
    s = 1.0 - x - e
    return jnp.stack([
        s * (2.0 * s - 1.0),
        x * (2.0 * x - 1.0),
        e * (2.0 * e - 1.0),
        4.0 * x * s,
        4.0 * x * e,
        4.0 * e * s,
    ])


def _sf_quad4(xi):
    r, s = xi
    return 0.25 * jnp.stack([
        (1 - r) * (1 - s), (1 + r) * (1 - s),
        (1 + r) * (1 + s), (1 - r) * (1 + s),
    ])


def _sf_quad8(xi):
    # quad8n.f90: serendipity, mids 5=(1,2) 6=(2,3) 7=(3,4) 8=(4,1)
    r, s = xi
    rp, rm, sp, sm = 1 + r, 1 - r, 1 + s, 1 - s
    return jnp.stack([
        0.25 * rm * sm * (-1.0 - r - s),
        0.25 * rp * sm * (-1.0 + r - s),
        0.25 * rp * sp * (-1.0 + r + s),
        0.25 * rm * sp * (-1.0 - r + s),
        0.5 * (1 - r * r) * sm,
        0.5 * (1 - s * s) * rp,
        0.5 * (1 - r * r) * sp,
        0.5 * (1 - s * s) * rm,
    ])


def _sf_tet4(xi):
    x, e, z = xi
    return jnp.stack([1.0 - x - e - z, x, e, z])


def _sf_tet10(xi):
    # tet10n.f90: mids 5=(1,2) 6=(2,3) 7=(3,1) 8=(1,4) 9=(2,4) 10=(3,4)
    x, e, z = xi
    a = 1.0 - x - e - z
    return jnp.stack([
        (2 * a - 1) * a,
        x * (2 * x - 1),
        e * (2 * e - 1),
        z * (2 * z - 1),
        4 * x * a,
        4 * x * e,
        4 * e * a,
        4 * z * a,
        4 * x * z,
        4 * e * z,
    ])


def _sf_prism6(xi):
    # prism6n.f90: nodes 1..3 bottom (zeta=-1), 4..6 top
    x, e, z = xi
    a = 1.0 - x - e
    return 0.5 * jnp.stack([
        a * (1 - z), x * (1 - z), e * (1 - z),
        a * (1 + z), x * (1 + z), e * (1 + z),
    ])


def _sf_prism15(xi):
    # prism15n.f90 ShapeFunc_prism15n
    x, e, z = xi
    a = 1.0 - x - e
    return jnp.stack([
        0.5 * a * (1 - z) * (2 * a - 2 - z),
        0.5 * x * (1 - z) * (2 * x - 2 - z),
        0.5 * e * (1 - z) * (2 * e - 2 - z),
        0.5 * a * (1 + z) * (2 * a - 2 + z),
        0.5 * x * (1 + z) * (2 * x - 2 + z),
        0.5 * e * (1 + z) * (2 * e - 2 + z),
        2 * x * a * (1 - z),
        2 * x * e * (1 - z),
        2 * e * a * (1 - z),
        2 * x * a * (1 + z),
        2 * x * e * (1 + z),
        2 * e * a * (1 + z),
        a * (1 - z * z),
        x * (1 - z * z),
        e * (1 - z * z),
    ])


def _sf_hex8(xi):
    r, s, t = xi
    return 0.125 * jnp.stack([
        (1 - r) * (1 - s) * (1 - t), (1 + r) * (1 - s) * (1 - t),
        (1 + r) * (1 + s) * (1 - t), (1 - r) * (1 + s) * (1 - t),
        (1 - r) * (1 - s) * (1 + t), (1 + r) * (1 - s) * (1 + t),
        (1 + r) * (1 + s) * (1 + t), (1 - r) * (1 + s) * (1 + t),
    ])


def _sf_hex20(xi):
    # hex20n.f90 ShapeFunc_hex20n
    r, s, t = xi
    rp, sp, tp = 1 + r, 1 + s, 1 + t
    rm, sm, tm = 1 - r, 1 - s, 1 - t
    return jnp.stack([
        -0.125 * rm * sm * tm * (2 + r + s + t),
        -0.125 * rp * sm * tm * (2 - r + s + t),
        -0.125 * rp * sp * tm * (2 - r - s + t),
        -0.125 * rm * sp * tm * (2 + r - s + t),
        -0.125 * rm * sm * tp * (2 + r + s - t),
        -0.125 * rp * sm * tp * (2 - r + s - t),
        -0.125 * rp * sp * tp * (2 - r - s - t),
        -0.125 * rm * sp * tp * (2 + r - s - t),
        0.25 * (1 - r * r) * sm * tm,
        0.25 * rp * (1 - s * s) * tm,
        0.25 * (1 - r * r) * sp * tm,
        0.25 * rm * (1 - s * s) * tm,
        0.25 * (1 - r * r) * sm * tp,
        0.25 * rp * (1 - s * s) * tp,
        0.25 * (1 - r * r) * sp * tp,
        0.25 * rm * (1 - s * s) * tp,
        0.25 * rm * sm * (1 - t * t),
        0.25 * rp * sm * (1 - t * t),
        0.25 * rp * sp * (1 - t * t),
        0.25 * rm * sp * (1 - t * t),
    ])


def _sf_line2(xi):
    (r,) = xi
    return jnp.stack([0.5 * (1 - r), 0.5 * (1 + r)])


def _sf_line3(xi):
    (r,) = xi
    return jnp.stack([-0.5 * r * (1 - r), 0.5 * r * (1 + r), (1 - r * r)])


# ---------------------------------------------------------------------------
# Quadrature rules (reference quadrature.f90 data tables, exact ordering)
# ---------------------------------------------------------------------------


def _qp_tri1():
    return np.array([[1 / 3, 1 / 3]]), np.array([0.5])


def _qp_tri3():
    p = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
    return p, np.full(3, 1 / 6)


def _qp_quad4():
    g = _G2
    p = np.array([[-g, -g], [g, -g], [-g, g], [g, g]])
    return p, np.ones(4)


def _qp_quad9():
    g = np.array([-_G3, 0.0, _G3])
    pts, ws = [], []
    for j in range(3):
        for i in range(3):
            pts.append([g[i], g[j]])
            ws.append(_W3[i] * _W3[j])
    return np.array(pts), np.array(ws)


def _qp_tet1():
    return np.array([[0.25, 0.25, 0.25]]), np.array([1 / 6])


def _qp_tet4():
    a, b = 0.138196601125011, 0.585410196624968
    p = np.array([[a, a, a], [b, a, a], [a, b, a], [a, a, b]])
    return p, np.full(4, 0.041666666666667)


def _qp_prism2():
    g = _G2
    p = np.array([[1 / 3, 1 / 3, -g], [1 / 3, 1 / 3, g]])
    return p, np.full(2, 0.5)


def _qp_prism9():
    # gauss3d8: tri 3-pt x line 3-pt, tri index fastest
    tri = [[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]]
    zs = [-_G3, 0.0, _G3]
    pts, ws = [], []
    for k in range(3):
        for t in range(3):
            pts.append([tri[t][0], tri[t][1], zs[k]])
            ws.append((1 / 6) * _W3[k])
    return np.array(pts), np.array(ws)


def _qp_hex8():
    g = _G2
    pts = []
    for k in (-g, g):
        for j in (-g, g):
            for i in (-g, g):
                pts.append([i, j, k])
    return np.array(pts), np.ones(8)


def _qp_hex27():
    g = np.array([-_G3, 0.0, _G3])
    pts, ws = [], []
    for k in range(3):
        for j in range(3):
            for i in range(3):
                pts.append([g[i], g[j], g[k]])
                ws.append(_W3[i] * _W3[j] * _W3[k])
    return np.array(pts), np.array(ws)


def _qp_line1():
    return np.array([[0.0]]), np.array([2.0])


def _qp_line2():
    return np.array([[-_G2], [_G2]]), np.array([1.0, 1.0])


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# etype -> (dim, nn, shape fn, quadrature fn)
ETYPE_INFO = {
    # line2 uses the 2-point rule: exact for the int N_i N_j edge mass that
    # FILM/RADIATE build (heat_LIB_FILM.f90 heat_FILM_231 uses 2-pt); all
    # lower-degree integrals (truss stiffness, edge pressure) are unchanged
    111: (1, 2, _sf_line2, _qp_line2),   # truss (reference maps 301->111)
    112: (1, 3, _sf_line3, _qp_line2),
    231: (2, 3, _sf_tri3, _qp_tri1),
    232: (2, 6, _sf_tri6, _qp_tri3),
    241: (2, 4, _sf_quad4, _qp_quad4),
    242: (2, 8, _sf_quad8, _qp_quad9),
    301: (1, 2, _sf_line2, _qp_line1),
    341: (3, 4, _sf_tet4, _qp_tet1),
    # u-p flow tet: tet4 shapes on the tet10 4-pt rule
    # (element.f90:429 fe_tet4n_pipi shares gauss3d5)
    3414: (3, 4, _sf_tet4, _qp_tet4),
    342: (3, 10, _sf_tet10, _qp_tet4),
    351: (3, 6, _sf_prism6, _qp_prism2),
    352: (3, 15, _sf_prism15, _qp_prism9),
    361: (3, 8, _sf_hex8, _qp_hex8),
    362: (3, 20, _sf_hex20, _qp_hex27),
}

# HEC-MW -> FSTR node reordering (hecmw2fstr_connect_conv.c:18-20); identity
# for all other types.  fstr_conn[k] = hecmw_conn[TABLE[k]-1]
HECMW2FSTR_ORDER = {
    232: [1, 2, 3, 6, 4, 5],
    342: [1, 2, 3, 4, 7, 5, 6, 8, 9, 10],
    352: [1, 2, 3, 4, 5, 6, 9, 7, 8, 12, 10, 11, 13, 14, 15],
}


@dataclasses.dataclass(frozen=True)
class ElementTable:
    """Static per-etype integration tables (numpy, baked into jit)."""

    etype: int
    dim: int
    nn: int
    nq: int
    points: np.ndarray   # (nq, dim)
    weights: np.ndarray  # (nq,)
    N: np.ndarray        # (nq, nn)
    dN: np.ndarray       # (nq, nn, dim)


@lru_cache(maxsize=None)
def get_table(etype: int) -> ElementTable:
    if etype not in ETYPE_INFO:
        raise KeyError(f"unsupported element type {etype}")
    dim, nn, sf, qp = ETYPE_INFO[etype]
    pts, wts = qp()
    with jax.ensure_compile_time_eval():
        N = np.stack([np.asarray(sf(jnp.asarray(p, jnp.float64))) for p in pts])
        jac = jax.jacfwd(sf)
        dN = np.stack([np.asarray(jac(jnp.asarray(p, jnp.float64))) for p in pts])
    return ElementTable(etype, dim, nn, len(wts), pts, np.asarray(wts), N, dN)


def shape_func(etype: int, xi) -> jnp.ndarray:
    _, _, sf, _ = ETYPE_INFO[etype]
    return sf(jnp.asarray(xi))


def shape_deriv(etype: int, xi) -> jnp.ndarray:
    _, _, sf, _ = ETYPE_INFO[etype]
    return jax.jacfwd(sf)(jnp.asarray(xi))


def is_solid(etype: int) -> bool:
    return etype in (231, 232, 241, 242, 341, 342, 351, 352, 361, 362)


def space_dim(etype: int) -> int:
    return ETYPE_INFO[etype][0] if ETYPE_INFO[etype][0] > 1 else (
        1 if etype in (111, 112) else 3)
