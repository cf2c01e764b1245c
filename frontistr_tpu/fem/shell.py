"""MITC shell elements 731 (MITC3) / 741 (MITC4).

TPU re-design of the reference shell stack (fistr1/src/lib/
static_LIB_shell.f90 STF_Shell_MITC:49-1305, ElementStress_Shell_MITC:1310-
2328, DL_Shell:2333-3005): every element-level loop becomes a batched
einsum over the element axis E; the small loops over tying points, in-plane
Gauss points and the 2-point thickness rule are unrolled at trace time
(static shapes, MXU-friendly (E, 5, nn*6) GEMMs).

Behavioral conventions replicated from the reference:
  - per-element nodal directors: v3 = normalized g1 x g2 evaluated at each
    node's natural coords, v2 = v3 x e0 (e0 = g1 at the element center),
    v1 = v2 x v3 (static_LIB_shell.f90:345-460) -- directors are NOT
    averaged across elements, which keeps elements independent (ideal for
    batching);
  - 5-row covariant strain vector (E_xx, E_ee, 2E_xe, 2E_ez, 2E_zx) with
    MITC tying of the two transverse-shear rows sampled at zeta=0
    (:471-521, :897-912 MITC4 edge-midpoint interpolation; :1000-1020
    MITC3 Lee-Bathe interpolation);
  - plane-stress constitutive tensor in the local orthonormal frame
    (lambda1 = E/(1-nu^2), shear correction 5/6) pushed to covariant
    components through e_hat . cg products (ElasticLinear.f90:174-286,
    calMatMatrix.f90:280-351);
  - drilling stabilization K += alpha * Cv Cv^T with
    Cv = N.theta.v3 - 1/2 v1.(grad u - grad u^T).v2 and
    alpha = alpha_over_mu * mu, alpha_over_mu defaulting to 1e-3
    (static_LIB_shell.f90:1113-1214, fstr_get_prop.f90:75);
  - 2-point Gauss through the thickness (zeta = +-1/sqrt(3)), 2x2 Gauss
    in-plane for 741 and the 3-point triangle rule for 731;
  - stress output evaluated at the nodes for zeta = +1 and -1 and averaged
    (the reference's PLUS/MINUS surface mean, fstr_NodalStress.f90:808-835),
    transformed to global components with the covariant basis for stress
    and the contravariant basis for strain (shear strains are TENSOR
    components for shells, unlike the engineering shear of solids).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SQ3I = 1.0 / np.sqrt(3.0)

# covariant Voigt row -> tensor index pairs (0-based), order
# (11, 22, 12, 23, 31) per mat_c2d_Shell (calMatMatrix.f90:296-320)
_VI = np.array([0, 1, 0, 1, 2])
_VJ = np.array([0, 1, 1, 2, 0])


# ---------------------------------------------------------------- tables

def _quad4_N(p):
    x, e = p
    return np.array([(1 - x) * (1 - e), (1 + x) * (1 - e),
                     (1 + x) * (1 + e), (1 - x) * (1 + e)]) * 0.25


def _quad4_dN(p):
    x, e = p
    return np.array([
        [-(1 - e), -(1 - x)],
        [+(1 - e), -(1 + x)],
        [+(1 + e), +(1 + x)],
        [-(1 + e), +(1 - x)]]) * 0.25


def _quad9_N(p):
    x, e = p
    lx = np.array([0.5 * x * (x - 1), 0.5 * x * (x + 1), 1 - x * x])
    le = np.array([0.5 * e * (e - 1), 0.5 * e * (e + 1), 1 - e * e])
    # node order: corners (-,-),(+,-),(+,+),(-,+), edges (0,-),(+,0),
    # (0,+),(-,0), center (getShapeFunc fe_mitc9_shell)
    ij = [(0, 0), (1, 0), (1, 1), (0, 1),
          (2, 0), (1, 2), (2, 1), (0, 2), (2, 2)]
    return np.array([lx[i] * le[j] for i, j in ij])


def _quad9_dN(p):
    x, e = p
    lx = np.array([0.5 * x * (x - 1), 0.5 * x * (x + 1), 1 - x * x])
    le = np.array([0.5 * e * (e - 1), 0.5 * e * (e + 1), 1 - e * e])
    dlx = np.array([x - 0.5, x + 0.5, -2 * x])
    dle = np.array([e - 0.5, e + 0.5, -2 * e])
    ij = [(0, 0), (1, 0), (1, 1), (0, 1),
          (2, 0), (1, 2), (2, 1), (0, 2), (2, 2)]
    return np.array([[dlx[i] * le[j], lx[i] * dle[j]] for i, j in ij])


def _tri3_N(p):
    x, e = p
    return np.array([x, e, 1.0 - x - e])


def _tri3_dN(p):
    return np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]])


class ShellTable:
    def __init__(self, etype):
        self.etype = etype
        if etype == 741:
            self.nn = 4
            self.nodal = np.array([[-1., -1.], [1., -1.], [1., 1.],
                                   [-1., 1.]])
            g = SQ3I
            self.gauss = np.array([[-g, -g], [g, -g], [-g, g], [g, g]])
            self.gw = np.ones(4)
            # tying points: edge midpoints (0,-1),(1,0),(0,1),(-1,0)
            self.tying = np.array([[0., -1.], [1., 0.], [0., 1.],
                                   [-1., 0.]])
            self.N, self.dN = _quad4_N, _quad4_dN
        elif etype == 731:
            self.nn = 3
            self.nodal = np.array([[1., 0.], [0., 1.], [0., 0.]])
            a, b = 1.0 / 6.0, 2.0 / 3.0
            self.gauss = np.array([[a, a], [b, a], [a, b]])
            self.gw = np.full(3, 1.0 / 6.0)
            self.tying = np.array([[0.5, 0.], [0., 0.5], [0.5, 0.5]])
            self.N, self.dN = _tri3_N, _tri3_dN
        elif etype == 743:
            # MITC9 (static_LIB_shell.f90:145-258): 9-node Lagrange,
            # 3x3 Gauss, three tying families over ALL five strain rows
            self.nn = 9
            self.nodal = np.array(
                [[-1., -1.], [1., -1.], [1., 1.], [-1., 1.],
                 [0., -1.], [1., 0.], [0., 1.], [-1., 0.], [0., 0.]])
            g = np.sqrt(0.6)
            pts = [-g, 0.0, g]
            wts = [5. / 9., 8. / 9., 5. / 9.]
            self.gauss = np.array([[a, b] for b in pts for a in pts])
            self.gw = np.array([wa * wb for wb in wts for wa in wts])
            s3 = SQ3I
            s35 = np.sqrt(0.6)
            # family 1: rows (e11, e13); family 2: (e22, e23);
            # family 3: (e12) (tpcoord, static_LIB_shell.f90:218-262)
            self.ty1 = np.array([[-s3, -s35], [s3, -s35], [s3, s35],
                                 [-s3, s35], [s3, 0.], [-s3, 0.]])
            self.ty2 = np.array([[-s35, -s3], [0., -s3], [s35, -s3],
                                 [s35, s3], [0., s3], [-s35, s3]])
            self.ty3 = np.array([[-s3, -s3], [s3, -s3], [s3, s3],
                                 [-s3, s3]])
            self.tying = self.ty1      # director build needs an attr
            self.N, self.dN = _quad9_N, _quad9_dN
        else:
            raise ValueError(f"unsupported shell etype {etype}")

    def mitc9_h(self, p):
        """(h1 (6,), h2 (6,), h3 (4,)) tying interpolations at gauss p
        (static_LIB_shell.f90:915-956)."""
        x, e = p
        s3 = SQ3I
        s35 = np.sqrt(0.6)
        xi1 = np.array([-1., 1., 1., -1., 1., -1.])
        et1 = np.array([-1., -1., 1., 1., 0., 0.])
        xh, eh = x / s3, e / s35
        h1 = (0.5 * (1 + xi1 * xh)
              * (0.5 * et1 * eh * (1 + et1 * eh)
                 + (1 - et1 * et1) * (1 - eh * eh)))
        xi2 = np.array([-1., 0., 1., 1., 0., -1.])
        et2 = np.array([-1., -1., -1., 1., 1., 1.])
        xh, eh = x / s35, e / s3
        h2 = ((0.5 * xi2 * xh * (1 + xi2 * xh)
               + (1 - xi2 * xi2) * (1 - xh * xh))
              * 0.5 * (1 + et2 * eh))
        xi3 = np.array([-1., 1., 1., -1.])
        et3 = np.array([-1., -1., 1., 1.])
        xh, eh = x / s3, e / s3
        h3 = 0.25 * (1 + xi3 * xh) * (1 + et3 * eh)
        return h1, h2, h3

    def tying_coeffs(self, p):
        """(c44, c45, c54, c55) each (ntying,): row4/5 of the assumed-
        strain B as combinations of rows 4/5 at the tying points."""
        x, e = p
        if self.etype == 741:
            c44 = np.array([0., 0.5 * (1 + x), 0., 0.5 * (1 - x)])
            c45 = np.zeros(4)
            c54 = np.zeros(4)
            c55 = np.array([0.5 * (1 - e), 0., 0.5 * (1 + e), 0.])
        else:
            c44 = np.array([0., 1 - x, x])
            c45 = np.array([x, 0., -x])
            c54 = np.array([0., e, -e])
            c55 = np.array([1 - e, 0., e])
        return c44, c45, c54, c55


_TABLES = {}


def shell_table(etype) -> ShellTable:
    if etype not in _TABLES:
        _TABLES[etype] = ShellTable(etype)
    return _TABLES[etype]


# ------------------------------------------------------------- geometry

def directors(elem, table):
    """Per-node director triads (static_LIB_shell.f90:345-460).

    elem: (E, nn, 3) -> v1, v2, v3 each (E, nn, 3)."""
    dN0 = jnp.asarray(table.dN(np.zeros(2)), elem.dtype)      # (nn,2)
    e0 = jnp.einsum("n,enj->ej", dN0[:, 0], elem)             # g1 at center
    v1l, v2l, v3l = [], [], []
    for nb in range(table.nn):
        dNn = jnp.asarray(table.dN(table.nodal[nb]), elem.dtype)
        g1 = jnp.einsum("n,enj->ej", dNn[:, 0], elem)
        g2 = jnp.einsum("n,enj->ej", dNn[:, 1], elem)
        v3 = jnp.cross(g1, g2)
        v3 = v3 / jnp.linalg.norm(v3, axis=-1, keepdims=True)
        v2 = jnp.cross(v3, e0)
        v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
        v1 = jnp.cross(v2, v3)
        v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
        v3 = jnp.cross(v1, v2)
        v3 = v3 / jnp.linalg.norm(v3, axis=-1, keepdims=True)
        v1l.append(v1)
        v2l.append(v2)
        v3l.append(v3)
    return (jnp.stack(v1l, axis=1), jnp.stack(v2l, axis=1),
            jnp.stack(v3l, axis=1))


def _basis(elem, s, N, dN, zeta):
    """Covariant basis g1,g2,g3 at (xi,eta,zeta). s = (t/2) v3 per node."""
    dt = elem.dtype
    N = jnp.asarray(N, dt)
    dN = jnp.asarray(dN, dt)
    g1 = jnp.einsum("n,enj->ej", dN[:, 0], elem + zeta * s)
    g2 = jnp.einsum("n,enj->ej", dN[:, 1], elem + zeta * s)
    g3 = jnp.einsum("n,enj->ej", N, s)
    return g1, g2, g3


def _bmat(elem, s, N, dN, zeta):
    """Covariant strain-displacement matrix (E, 5, nn*6) plus g1,g2,g3.

    Rows: (E_xx, E_ee, 2E_xe, 2E_ez, 2E_zx); columns per node
    (ux,uy,uz,tx,ty,tz) (static_LIB_shell.f90:548-634)."""
    dt = elem.dtype
    E, nn, _ = elem.shape
    N = jnp.asarray(N, dt)
    dN = jnp.asarray(dN, dt)
    g1, g2, g3 = _basis(elem, s, N, dN, zeta)
    # rotation lever arms per node
    r1 = dN[None, :, 0, None] * (zeta * s)            # du/dxi   from theta
    r2 = dN[None, :, 1, None] * (zeta * s)
    r3 = N[None, :, None] * s                          # du/dzeta from theta
    B = jnp.zeros((E, 5, nn, 6), dt)
    # translation dofs: row_k[n, d] = dN-combination * g[d]
    B = B.at[:, 0, :, 0:3].set(dN[None, :, 0, None] * g1[:, None, :])
    B = B.at[:, 1, :, 0:3].set(dN[None, :, 1, None] * g2[:, None, :])
    B = B.at[:, 2, :, 0:3].set(dN[None, :, 0, None] * g2[:, None, :]
                               + dN[None, :, 1, None] * g1[:, None, :])
    B = B.at[:, 3, :, 0:3].set(dN[None, :, 1, None] * g3[:, None, :])
    B = B.at[:, 4, :, 0:3].set(dN[None, :, 0, None] * g3[:, None, :])
    # rotation dofs: aa_i = r1 x g_i, bb_i = r2 x g_i, cc_i = r3 x g_i
    aa1 = jnp.cross(r1, g1[:, None, :])
    aa2 = jnp.cross(r1, g2[:, None, :])
    aa3 = jnp.cross(r1, g3[:, None, :])
    bb1 = jnp.cross(r2, g1[:, None, :])
    bb2 = jnp.cross(r2, g2[:, None, :])
    bb3 = jnp.cross(r2, g3[:, None, :])
    cc1 = jnp.cross(r3, g1[:, None, :])
    cc2 = jnp.cross(r3, g2[:, None, :])
    B = B.at[:, 0, :, 3:6].set(aa1)
    B = B.at[:, 1, :, 3:6].set(bb2)
    B = B.at[:, 2, :, 3:6].set(aa2 + bb1)
    B = B.at[:, 3, :, 3:6].set(bb3 + cc2)
    B = B.at[:, 4, :, 3:6].set(aa3 + cc1)
    return B.reshape(E, 5, nn * 6), g1, g2, g3


def _chat(ee, pp):
    """Local plane-stress constitutive tensor with 5/6 shear correction
    (ElasticLinear.f90:227-262)."""
    l1 = ee / (1.0 - pp * pp)
    l2 = pp * l1
    mu = 0.5 * ee / (1.0 + pp)
    k = 5.0 / 6.0
    c = np.zeros((3, 3, 3, 3))
    c[0, 0, 0, 0] = l1
    c[0, 0, 1, 1] = l2
    c[1, 1, 0, 0] = l2
    c[1, 1, 1, 1] = l1
    for (i, j) in ((0, 1), (1, 0)):
        c[i, j, 0, 1] = mu
        c[i, j, 1, 0] = mu
    for (i, j) in ((0, 2), (2, 0)):
        c[i, j, 0, 2] = k * mu
        c[i, j, 2, 0] = k * mu
    for (i, j) in ((1, 2), (2, 1)):
        c[i, j, 1, 2] = k * mu
        c[i, j, 2, 1] = k * mu
    return c


def _contravariant(g1, g2, g3):
    det = jnp.einsum("ei,ei->e", g1, jnp.cross(g2, g3))
    cg1 = jnp.cross(g2, g3) / det[:, None]
    cg2 = jnp.cross(g3, g1) / det[:, None]
    cg3 = jnp.cross(g1, g2) / det[:, None]
    return cg1, cg2, cg3, det


def _dmat(chat, g1, g2, g3, cg1, cg2, cg3):
    """5x5 covariant-frame D: push local tensor through e_hat . cg."""
    dt = g1.dtype
    e3 = g3 / jnp.linalg.norm(g3, axis=-1, keepdims=True)
    e1 = jnp.cross(g2, e3)
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(e3, e1)
    e2 = e2 / jnp.linalg.norm(e2, axis=-1, keepdims=True)
    eh = jnp.stack([e1, e2, e3], axis=1)               # (E,3,3) rows e_a
    cg = jnp.stack([cg1, cg2, cg3], axis=1)            # (E,3,3) rows cg_i
    R = jnp.einsum("eak,eik->eai", eh, cg)             # e_a . cg_i
    c = jnp.einsum("abcd,eai,ebj,eck,edl->eijkl",
                   jnp.asarray(chat, dt), R, R, R, R)
    return c[:, _VI[:, None], _VJ[:, None], _VI[None, :], _VJ[None, :]]


# ------------------------------------------------------------ stiffness

def stiffness_shell(elem, thick, ee, pp, alpha_over_mu=1.0e-3, etype=741):
    """Batched MITC shell stiffness (E, nn*6, nn*6)."""
    table = shell_table(etype)
    E, nn, _ = elem.shape
    dt = elem.dtype
    v1, v2, v3 = directors(elem, table)
    s = 0.5 * thick * v3
    chat = _chat(ee, pp)
    mu = 0.5 * ee / (1.0 + pp)
    alpha = alpha_over_mu * mu
    mitc9 = etype == 743
    if not mitc9:
        nt = table.tying.shape[0]
        # assumed-strain rows sampled at zeta = 0 (zeta-independent)
        Bt4, Bt5 = [], []
        for p in range(nt):
            Bp, _, _, _ = _bmat(elem, s, table.N(table.tying[p]),
                                table.dN(table.tying[p]), 0.0)
            Bt4.append(Bp[:, 3])
            Bt5.append(Bp[:, 4])
        Bt4 = jnp.stack(Bt4, axis=1)                   # (E,nt,nn6)
        Bt5 = jnp.stack(Bt5, axis=1)

    K = jnp.zeros((E, nn * 6, nn * 6), dt)
    for zeta in (-SQ3I, SQ3I):
        if mitc9:
            # MITC9 ties ALL five rows, sampled at the CURRENT layer
            # zeta (static_LIB_shell.f90:473-476)
            Bty = []
            for tp in (table.ty1, table.ty2, table.ty3):
                rows = []
                for p in tp:
                    Bp, _, _, _ = _bmat(elem, s, table.N(p),
                                        table.dN(p), zeta)
                    rows.append(Bp)
                Bty.append(jnp.stack(rows, axis=1))    # (E,np,5,nn6)
        for q in range(table.gauss.shape[0]):
            p = table.gauss[q]
            w = float(table.gw[q])
            Nq, dNq = table.N(p), table.dN(p)
            B, g1, g2, g3 = _bmat(elem, s, Nq, dNq, zeta)
            if mitc9:
                h1, h2, h3 = table.mitc9_h(p)
                h1 = jnp.asarray(h1, dt)
                h2 = jnp.asarray(h2, dt)
                h3 = jnp.asarray(h3, dt)
                B = (B.at[:, 0].set(jnp.einsum(
                        "t,etj->ej", h1, Bty[0][:, :, 0]))
                     .at[:, 4].set(jnp.einsum(
                        "t,etj->ej", h1, Bty[0][:, :, 4]))
                     .at[:, 1].set(jnp.einsum(
                        "t,etj->ej", h2, Bty[1][:, :, 1]))
                     .at[:, 3].set(jnp.einsum(
                        "t,etj->ej", h2, Bty[1][:, :, 3]))
                     .at[:, 2].set(jnp.einsum(
                        "t,etj->ej", h3, Bty[2][:, :, 2])))
            else:
                c44, c45, c54, c55 = table.tying_coeffs(p)
                row4 = (jnp.einsum("t,etj->ej", jnp.asarray(c44, dt),
                                   Bt4)
                        + jnp.einsum("t,etj->ej", jnp.asarray(c45, dt),
                                     Bt5))
                row5 = (jnp.einsum("t,etj->ej", jnp.asarray(c54, dt),
                                   Bt4)
                        + jnp.einsum("t,etj->ej", jnp.asarray(c55, dt),
                                     Bt5))
                B = B.at[:, 3].set(row4).at[:, 4].set(row5)
            cg1, cg2, cg3, det = _contravariant(g1, g2, g3)
            D = _dmat(chat, g1, g2, g3, cg1, cg2, cg3)
            DB = jnp.einsum("ers,esj->erj", D, B)
            K = K + (w * det)[:, None, None] * \
                jnp.einsum("eri,erj->eij", B, DB)
            # drilling stabilization
            Cv = _drill_vector(table, elem, s, v1, v2, v3, Nq, dNq, zeta,
                               cg1, cg2, cg3)
            K = K + (w * alpha * det)[:, None, None] * \
                jnp.einsum("ei,ej->eij", Cv, Cv)
    return K


def _drill_vector(table, elem, s, v1, v2, v3, Nq, dNq, zeta,
                  cg1, cg2, cg3):
    """Cv = N.theta.v3 - 1/2 v1.(grad u - grad u^T).v2 per dof
    (static_LIB_shell.f90:1040-1214)."""
    dt = elem.dtype
    E, nn, _ = elem.shape
    Nqj = jnp.asarray(Nq, dt)
    dNj = jnp.asarray(dNq, dt)
    r1 = dNj[None, :, 0, None] * (zeta * s)
    r2 = dNj[None, :, 1, None] * (zeta * s)
    r3 = Nqj[None, :, None] * s
    # derivative operators Bk (E, 3, nn, 6): du/d(xi_k) components
    def dop(dshape, r):
        Bk = jnp.zeros((E, 3, nn, 6), dt)
        if dshape is not None:
            eye = jnp.eye(3, dtype=dt)
            Bk = Bk.at[:, :, :, 0:3].set(
                jnp.einsum("n,cd->cnd", dshape, eye)[None])
        # rotation: du = theta x r  =>  column(theta_d) = e_d x r
        ed = jnp.eye(3, dtype=dt)
        colr = jnp.cross(ed[None, None, :, :], r[:, :, None, :])
        # colr[e,n,d,c] -> Bk[e,c,n,d]
        Bk = Bk.at[:, :, :, 3:6].set(jnp.transpose(colr, (0, 3, 1, 2)))
        return Bk
    B1 = dop(dNj[:, 0], r1)
    B2 = dop(dNj[:, 1], r2)
    B3 = dop(None, r3)
    cg = jnp.stack([cg1, cg2, cg3], axis=1)            # (E,k,3)
    Bs = jnp.stack([B1.reshape(E, 3, nn * 6),
                    B2.reshape(E, 3, nn * 6),
                    B3.reshape(E, 3, nn * 6)], axis=1)  # (E,k,3,j)
    G = jnp.einsum("eka,ekcj->ecaj", cg, Bs)           # du_c/dx_a
    v1i = jnp.einsum("n,enk->ek", Nqj, v1)
    v2i = jnp.einsum("n,enk->ek", Nqj, v2)
    v3i = jnp.einsum("n,enk->ek", Nqj, v3)
    Cw = jnp.einsum("ea,ebaj,eb->ej", v1i, G - jnp.swapaxes(G, 1, 2), v2i)
    Ct = jnp.zeros((E, nn, 6), dt)
    Ct = Ct.at[:, :, 3:6].set(Nqj[None, :, None] * v3i[:, None, :])
    return Ct.reshape(E, nn * 6) - 0.5 * Cw


# ----------------------------------------------------------------- loads

def shell_dload(elem, thick, rho, ltype, params, etype=741):
    """Distributed loads for shells -> (E, nn*6) consistent nodal vector.

    ltype: 'P0'/'P' surface pressure along +normal (DL_Shell:2640-2780),
    'BX','BY','BZ' body force per volume, 'GRAV', 'CENT'
    (DL_Shell:2784-3002)."""
    table = shell_table(etype)
    E, nn, _ = elem.shape
    dt = elem.dtype
    _, _, v3 = directors(elem, table)
    s = 0.5 * thick * v3
    f = jnp.zeros((E, nn, 6), dt)
    if ltype.startswith("P"):
        val = params[0]
        for q in range(table.gauss.shape[0]):
            p = table.gauss[q]
            w = float(table.gw[q])
            Nq = jnp.asarray(table.N(p), dt)
            dNq = jnp.asarray(table.dN(p), dt)
            g1 = jnp.einsum("n,enj->ej", dNq[:, 0], elem)
            g2 = jnp.einsum("n,enj->ej", dNq[:, 1], elem)
            nvec = jnp.cross(g1, g2)
            f = f.at[:, :, 0:3].add(
                w * val * Nq[None, :, None] * nvec[:, None, :])
        return f.reshape(E, nn * 6)

    # volume loads: integrate over zeta with rotation coupling
    for zeta in (-SQ3I, SQ3I):
        for q in range(table.gauss.shape[0]):
            p = table.gauss[q]
            w = float(table.gw[q])
            Nq = jnp.asarray(table.N(p), dt)
            dNq = jnp.asarray(table.dN(p), dt)
            g1, g2, g3 = _basis(elem, s, Nq, dNq, zeta)
            det = jnp.einsum("ei,ei->e", g1, jnp.cross(g2, g3))
            urot = Nq[None, :, None] * (zeta * s)       # (E,nn,3)
            if ltype in ("BX", "BY", "BZ"):
                coef = jnp.zeros((E, 3), dt).at[
                    :, {"BX": 0, "BY": 1, "BZ": 2}[ltype]].set(params[0])
            elif ltype == "GRAV":
                val = params[0]
                a = jnp.asarray(params[1:4], dt)
                coef = jnp.broadcast_to(rho * val * a, (E, 3))
            elif ltype == "CENT":
                val = params[0]
                a = jnp.asarray(params[1:4], dt)
                r = jnp.asarray(params[4:7], dt)
                x = jnp.einsum("n,enj->ej", Nq, elem)
                t = jnp.einsum("ej,j->e", x - a, r) / jnp.dot(r, r)
                ph = x - (a + t[:, None] * r)
                coef = ph * (rho * val * val)
            else:
                raise ValueError(f"shell dload type {ltype}")
            wdet = (w * det)[:, None]
            f = f.at[:, :, 0:3].add(
                wdet[:, :, None] * Nq[None, :, None] * coef[:, None, :])
            # moment on theta_d: (e_d x urot) . coef = (urot x coef)_d
            f = f.at[:, :, 3:6].add(
                wdet[:, :, None] * jnp.cross(urot, coef[:, None, :]))
    return f.reshape(E, nn * 6)


def stiffness_solid_shell(elem_lower, thick, ee, pp, etype=781,
                          alpha_over_mu=1.0e-3):
    """761/781 'shell-solid mixed' stiffness: the MITC3/MITC4 6-dof shell
    evaluated on the lower-face nodes, with dofs re-ordered so the element
    exposes 2*nn 3-dof nodes (translations first, rotation carriers after
    -- fstr_StiffMatrix.f90:168-183 + the sstable permutation in
    STF_Shell_MITC:1240-1295)."""
    base = 731 if etype == 761 else 741
    K = stiffness_shell(elem_lower, thick, ee, pp,
                        alpha_over_mu=alpha_over_mu, etype=base)
    nn = 3 if etype == 761 else 4
    # old order per node: (ux,uy,uz,tx,ty,tz); new: all u blocks then all t
    perm = np.concatenate([
        np.concatenate([np.arange(3) + 6 * i for i in range(nn)]),
        np.concatenate([np.arange(3, 6) + 6 * i for i in range(nn)])])
    return K[:, perm[:, None], perm[None, :]]


# ---------------------------------------------------------------- stress

def shell_nodal_stress(elem, ue, thick, ee, pp, etype=741):
    """Mid-surface (PLUS/MINUS averaged) nodal strain & stress in global
    components (11,22,33,12,23,31), shear as tensor components.

    elem (E,nn,3), ue (E,nn,6) -> strain (E,nn,6), stress (E,nn,6)."""
    table = shell_table(etype)
    E, nn, _ = elem.shape
    dt = elem.dtype
    _, _, v3 = directors(elem, table)
    s = 0.5 * thick * v3
    chat = _chat(ee, pp)
    u = ue.reshape(E, nn * 6)
    nt = table.tying.shape[0]
    Bt4, Bt5 = [], []
    for p in range(nt):
        Bp, _, _, _ = _bmat(elem, s, table.N(table.tying[p]),
                            table.dN(table.tying[p]), 0.0)
        Bt4.append(Bp[:, 3])
        Bt5.append(Bp[:, 4])
    Bt4 = jnp.stack(Bt4, axis=1)
    Bt5 = jnp.stack(Bt5, axis=1)

    strain = jnp.zeros((E, nn, 6), dt)
    stress = jnp.zeros((E, nn, 6), dt)
    for zeta in (1.0, -1.0):
        for ln in range(nn):
            p = table.nodal[ln]
            Nq, dNq = table.N(p), table.dN(p)
            B, g1, g2, g3 = _bmat(elem, s, Nq, dNq, zeta)
            c44, c45, c54, c55 = table.tying_coeffs(p)
            row4 = (jnp.einsum("t,etj->ej", jnp.asarray(c44, dt), Bt4)
                    + jnp.einsum("t,etj->ej", jnp.asarray(c45, dt), Bt5))
            row5 = (jnp.einsum("t,etj->ej", jnp.asarray(c54, dt), Bt4)
                    + jnp.einsum("t,etj->ej", jnp.asarray(c55, dt), Bt5))
            B = B.at[:, 3].set(row4).at[:, 4].set(row5)
            Ev = jnp.einsum("erj,ej->er", B, u)         # (E,5)
            cg1, cg2, cg3, det = _contravariant(g1, g2, g3)
            D = _dmat(chat, g1, g2, g3, cg1, cg2, cg3)
            Sv = jnp.einsum("ers,es->er", D, Ev)
            # symmetric 3x3 tensors (E33 = S33 = 0 by construction)
            Et = jnp.zeros((E, 3, 3), dt)
            Et = Et.at[:, 0, 0].set(Ev[:, 0]).at[:, 1, 1].set(Ev[:, 1])
            Et = Et.at[:, 0, 1].set(0.5 * Ev[:, 2]).at[:, 1, 0].set(
                0.5 * Ev[:, 2])
            Et = Et.at[:, 1, 2].set(0.5 * Ev[:, 3]).at[:, 2, 1].set(
                0.5 * Ev[:, 3])
            Et = Et.at[:, 2, 0].set(0.5 * Ev[:, 4]).at[:, 0, 2].set(
                0.5 * Ev[:, 4])
            St = jnp.zeros((E, 3, 3), dt)
            St = St.at[:, 0, 0].set(Sv[:, 0]).at[:, 1, 1].set(Sv[:, 1])
            St = St.at[:, 0, 1].set(Sv[:, 2]).at[:, 1, 0].set(Sv[:, 2])
            St = St.at[:, 1, 2].set(Sv[:, 3]).at[:, 2, 1].set(Sv[:, 3])
            St = St.at[:, 2, 0].set(Sv[:, 4]).at[:, 0, 2].set(Sv[:, 4])
            cg = jnp.stack([cg1, cg2, cg3], axis=1)
            gv = jnp.stack([g1, g2, g3], axis=1)
            eps = jnp.einsum("eij,eia,ejb->eab", Et, cg, cg)
            sig = jnp.einsum("eij,eia,ejb->eab", St, gv, gv)
            comp = lambda T: jnp.stack(
                [T[:, 0, 0], T[:, 1, 1], T[:, 2, 2], T[:, 0, 1],
                 T[:, 1, 2], T[:, 2, 0]], axis=-1)
            strain = strain.at[:, ln].add(0.5 * comp(eps))
            stress = stress.at[:, ln].add(0.5 * comp(sig))
    return strain, stress
