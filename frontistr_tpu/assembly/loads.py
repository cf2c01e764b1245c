"""External load assembly (!CLOAD / !DLOAD).

Host-side (numpy) replication of fstr_ass_load + DL_C3/DL_C2
(fistr1/src/analysis/static/fstr_ass_load.f90:18-439,
fistr1/src/lib/static_LIB_3d.f90 DL_C3, static_LIB_2d.f90 DL_C2):
body force BX/BY/BZ, GRAV, CENT, face pressures P1..P6, surface-group
pressure (LTYPE=100).  Load vectors are assembled once per step on the host
(they are O(n) and not in the hot loop), batched over elements with numpy
einsums.

Face numbering tables from getSubFace
(fistr1/src/lib/element/element.f90:188-360), converted to 0-based.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from frontistr_tpu.elements.tables import get_table

# etype -> list of (face_etype, [0-based local node ids]) indexed by face-1
FACE_TABLES: Dict[int, List] = {
    341: [(231, [0, 1, 2]), (231, [3, 1, 0]), (231, [3, 2, 1]),
          (231, [3, 0, 2])],
    342: [(232, [0, 1, 2, 4, 5, 6]), (232, [3, 1, 0, 8, 4, 7]),
          (232, [3, 2, 1, 9, 5, 8]), (232, [3, 0, 2, 7, 6, 9])],
    361: [(241, [0, 1, 2, 3]), (241, [7, 6, 5, 4]), (241, [4, 5, 1, 0]),
          (241, [5, 6, 2, 1]), (241, [6, 7, 3, 2]), (241, [7, 4, 0, 3])],
    362: [(242, [0, 1, 2, 3, 8, 9, 10, 11]),
          (242, [7, 6, 5, 4, 14, 13, 12, 15]),
          (242, [4, 5, 1, 0, 12, 17, 8, 16]),
          (242, [5, 6, 2, 1, 13, 18, 9, 17]),
          (242, [6, 7, 3, 2, 14, 19, 10, 18]),
          (242, [7, 4, 0, 3, 15, 16, 11, 19])],
    351: [(231, [0, 1, 2]), (231, [5, 4, 3]), (241, [3, 4, 1, 0]),
          (241, [4, 5, 2, 1]), (241, [5, 3, 0, 2])],
    352: [(232, [0, 1, 2, 6, 7, 8]), (232, [5, 4, 3, 10, 9, 11]),
          (242, [3, 4, 1, 0, 9, 13, 6, 12]),
          (242, [4, 5, 2, 1, 10, 14, 7, 13]),
          (242, [5, 3, 0, 2, 11, 12, 8, 14])],
    # 2D edges (faces of plane elements; face elements are line2/line3)
    231: [(111, [0, 1]), (111, [1, 2]), (111, [2, 0])],
    232: [(112, [0, 1, 3]), (112, [1, 2, 4]), (112, [2, 0, 5])],
    241: [(111, [0, 1]), (111, [1, 2]), (111, [2, 3]), (111, [3, 0])],
    242: [(112, [0, 1, 4]), (112, [1, 2, 5]), (112, [2, 3, 6]),
          (112, [3, 0, 7])],
}

_LTYPE = {"BX": 1, "BY": 2, "BZ": 3, "GRAV": 4, "CENT": 5,
          "P1": 10, "P2": 20, "P3": 30, "P4": 40, "P5": 50, "P6": 60,
          "P0": 100, "S": 100}


def _volume_shape_integrals(etype: int, coords_e: np.ndarray, dim: int,
                            thick: float):
    """sum_q w_q det_q N(q) -> (E, nn); also mean qp coords for CENT."""
    t = get_table(etype)
    dN = t.dN
    J = np.einsum("qni,enj->eqij", dN, coords_e)
    det = np.linalg.det(J)
    scale = thick if dim == 2 else 1.0
    return t, det * scale


def _body_force(etype, coords_e, dim, thick, ltype, params, rho):
    """DL_C3/DL_C2 volume-load arm. Returns (E, nn, dim) force vectors."""
    t, wdet = _volume_shape_integrals(etype, coords_e, dim, thick)
    E, nn, _ = coords_e.shape
    val = params[0]
    if ltype in (1, 2, 3):
        pl = np.einsum("qn,eq,q->en", t.N, wdet, t.weights)
        out = np.zeros((E, nn, dim))
        out[:, :, ltype - 1] = val * pl
        return out
    if ltype == 4:  # GRAV
        v = np.asarray(params[1:1 + dim])
        v = v / np.linalg.norm(v)
        pl = np.einsum("qn,eq,q->en", t.N, wdet, t.weights)
        return val * rho * pl[:, :, None] * v[None, None, :]
    if ltype == 5:  # CENT: omega=val, axis point A=params[1:4], dir R=params[4:7]
        A = np.asarray(params[1:1 + 3])[:dim]
        R = np.asarray(params[4:4 + 3])[:dim]
        xq = np.einsum("qn,end->eqd", t.N, coords_e)       # qp coords
        proj = (np.einsum("eqd,d->eq", xq - A, R) /
                np.dot(R, R))[:, :, None] * R[None, None, :]
        ph = xq - (A + proj)                               # radial arm
        coef = rho * val * val * ph                        # (E, nq, dim)
        return np.einsum("qn,eq,q,eqd->end", t.N, wdet, t.weights, coef)
    raise ValueError(f"ltype {ltype}")


def _face_pressure(etype, coords_e, dim, thick, face_no, val):
    """DL_C3/DL_C2 surface-load arm (normal pressure). (E, nn, dim)."""
    ftype, lnodes = FACE_TABLES[etype][face_no - 1]
    ft = get_table(ftype)
    fc = coords_e[:, lnodes, :]                            # (E, nsur, dim)
    E = coords_e.shape[0]
    out = np.zeros((E,) + coords_e.shape[1:])
    for q in range(ft.nq):
        N = ft.N[q]
        dN = ft.dN[q]                                      # (nsur, fdim)
        g = np.einsum("end,nf->edf", fc, dN)               # (E, dim, fdim)
        if dim == 3:
            normal = np.cross(g[:, :, 0], g[:, :, 1])      # area-weighted
        else:
            normal = np.stack([-g[:, 1, 0], g[:, 0, 0]], axis=1) * thick
        w = ft.weights[q] * val
        out[:, lnodes, :] += w * N[None, :, None] * normal[:, None, :]
    return out


def collect_temperature(mesh, cards, n_node: int, default: float,
                        grpid_filter=None):
    """!TEMPERATURE card -> nodal temperature field (fstr_setup TEMPERATURE
    semantics: per node-group constant values, default = reference temp)."""
    T = np.full(n_node, default)
    found = False
    for c in cards:
        gid = c.iparam("GRPID", 1)
        if grpid_filter is not None and gid not in grpid_filter:
            continue
        for row in c.data:
            grp = row[0]
            val = float(row[1]) if len(row) > 1 else 0.0
            if grp in mesh.node_groups:
                T[mesh.node_groups[grp]] = val
                found = True
            else:
                try:
                    nid = int(grp)
                    if nid in mesh.id2idx:
                        T[mesh.id2idx[nid]] = val
                        found = True
                except ValueError:
                    pass
    return T if found else None


def thermal_strains(model, block, temperature: np.ndarray):
    """Thermal strain at gauss points: eps_th = alpha*(T-ref) on normal
    components (UPDATE_C3 EPSTH, static_LIB_3d.f90; 2D: UPDATE_C2
    EPSTH(1:2))."""
    t = get_table(block.etype)
    T_e = temperature[block.conn]                         # (E, nn)
    tq = np.einsum("qn,en->eq", t.N, T_e)                 # (E, nq)
    alpha = float(block.material.expansion)
    ns = block.D.shape[-1]
    eps = np.zeros(T_e.shape[:1] + (t.nq, ns))
    ncomp = 3 if model.dim == 3 else 2
    dT = alpha * (tq - model.reftemp)
    for k in range(ncomp):
        eps[:, :, k] = dT
    return eps


def thermal_load(model, temperature: np.ndarray) -> np.ndarray:
    """TLOAD: f = int B^T D eps_th dV (TLOAD_C3/TLOAD_C2 semantics)."""
    from frontistr_tpu.fem.isoparam import (strain_selector_2d,
                                            strain_selector_3d)
    ndof = model.ndof
    f = np.zeros(model.n_node * ndof)
    S = strain_selector_3d() if model.dim == 3 else strain_selector_2d()
    for b in model.blocks:
        t = get_table(b.etype)
        coords_e = model.coords[b.conn]
        J = np.einsum("qni,enj->eqij", t.dN, coords_e)
        det = np.linalg.det(J)
        Jinv = np.linalg.inv(J)
        g = np.einsum("qni,eqji->eqnj", t.dN, Jinv)
        scale = b.thick if model.dim == 2 else 1.0
        wdet = (t.weights * scale)[None, :] * det
        epsth = thermal_strains(model, b, temperature)
        if b.D.ndim == 4:
            sig = np.einsum("eqkl,eql->eqk", b.D, epsth)
        else:
            sig = np.einsum("ekl,eql->eqk", b.D, epsth)
        vect = np.einsum("kdj,eqnj,eqk,eq->end", S, g, sig, wdet)
        dofs = (b.conn[:, :, None] * ndof + np.arange(ndof)[None, None, :])
        np.add.at(f, dofs.reshape(-1), vect.reshape(-1))
    return f


def collect_dload(mesh, model, cards, grpid_filter=None,
                  coords=None) -> np.ndarray:
    """Assemble !DLOAD cards into a global load vector.

    coords overrides the node positions (follower loads: the reference
    re-assembles DLOAD at hecMESH%node + unode every Newton iteration when
    DLOAD_follow=1, fstr_ass_load.f90:165-196)."""
    ndof = model.ndof
    if coords is None:
        coords = model.coords
    f = np.zeros(model.n_node * ndof)
    for (bi, sel, face, ltype, params, token) in _dload_groups(
            mesh, model, cards, grpid_filter):
        b = model.blocks[bi]
        coords_e = coords[b.conn[sel]]
        rho = float(b.material.density)
        if getattr(b, "kind", "solid") == "shell":
            from frontistr_tpu.fem import shell as shmod
            import jax.numpy as jnp
            tok = token if token in ("BX", "BY", "BZ", "GRAV",
                                     "CENT") else "P0"
            vect = np.asarray(shmod.shell_dload(
                jnp.asarray(coords_e), b.thick, rho, tok,
                np.asarray(params), b.etype))
        elif ltype < 10:
            vect = _body_force(b.etype, coords_e, model.dim, b.thick,
                               ltype, params, rho)
        elif ltype >= 100:
            continue            # S/P0 on solids needs a surface group
        else:
            vect = _face_pressure(b.etype, coords_e, model.dim, b.thick,
                                  face, params[0])
        dofs = (b.conn[sel][:, :, None] * ndof +
                np.arange(ndof)[None, None, :])
        np.add.at(f, dofs.reshape(-1), vect.reshape(-1))
    return f


# ---------------------------------------------------------------------------
# Device-side follower DLOAD (fstr_ass_load.f90:165-196 DLOAD_follow=1):
# under nlgeom the reference re-assembles every DLOAD at node+unode each
# Newton iteration.  The host numpy path above costs a device->host pull
# of u plus an O(n) numpy pass per iteration; on a remote-TPU tunnel that
# is the slowest thing in the loop.  The grouping (which elements, which
# faces, which load types) is static per model, so it is precomputed once
# and the numeric evaluation becomes one jitted gather+einsum+scatter.
# ---------------------------------------------------------------------------

def _dload_groups(mesh, model, cards, grpid_filter=None):
    """Static card grouping shared by collect_dload and FollowerDload:
    yields (bi, rows, face, ltype, params, token)."""
    eid2loc = {}
    for bi, b in enumerate(model.blocks):
        for k, eid in enumerate(b.elem_ids):
            eid2loc[int(eid)] = (bi, k)

    def group(eids, faces, ltype, params, token):
        by_block: Dict[tuple, List] = {}
        for idx, eid in enumerate(eids):
            loc = eid2loc.get(int(eid))
            if loc is None:
                continue
            face = int(faces[idx]) if faces is not None else ltype // 10
            by_block.setdefault((loc[0], face), []).append(loc[1])
        for (bi, face), rows in by_block.items():
            yield (bi, np.asarray(rows, np.int64), face, ltype, params,
                   token)

    for c in cards:
        gid = c.iparam("GRPID", 1)
        if grpid_filter is not None and gid not in grpid_filter:
            continue
        for row in c.data:
            grp = row[0]
            lt_tok = row[1].upper()
            ltype = _LTYPE.get(lt_tok)
            if ltype is None:
                continue
            params = [float(v) for v in row[2:]] + [0.0] * 7
            params = np.asarray(params[:7])
            if ltype == 100:
                sg = mesh.surf_groups.get(grp)
                if sg is not None:
                    for face in np.unique(sg[:, 1]):
                        sel = sg[sg[:, 1] == face]
                        yield from group(sel[:, 0], None, int(face) * 10,
                                         params, lt_tok)
                    continue
            eids = mesh.elem_groups.get(grp)
            if eids is None:
                try:
                    eids = np.asarray([int(grp)])
                except ValueError:
                    continue
            yield from group(eids, None, ltype, params, lt_tok)


def _body_force_j(etype, coords_e, dim, thick, ltype, params, rho):
    """jax twin of _body_force (same DL_C3/DL_C2 math, traced)."""
    import jax.numpy as jnp
    t = get_table(etype)
    J = jnp.einsum("qni,enj->eqij", jnp.asarray(t.dN), coords_e)
    from frontistr_tpu.fem.isoparam import det_inv_small
    det, _ = det_inv_small(J)
    wdet = det * (thick if dim == 2 else 1.0)
    N = jnp.asarray(t.N)
    w = jnp.asarray(t.weights)
    val = float(params[0])
    if ltype in (1, 2, 3):
        pl = jnp.einsum("qn,eq,q->en", N, wdet, w)
        out = jnp.zeros(coords_e.shape[:2] + (dim,))
        return out.at[:, :, ltype - 1].set(val * pl)
    if ltype == 4:                                   # GRAV
        v = np.asarray(params[1:1 + dim])
        v = v / np.linalg.norm(v)
        pl = jnp.einsum("qn,eq,q->en", N, wdet, w)
        return val * rho * pl[:, :, None] * jnp.asarray(v)[None, None, :]
    if ltype == 5:                                   # CENT
        A = jnp.asarray(np.asarray(params[1:1 + 3])[:dim])
        R = np.asarray(params[4:4 + 3])[:dim]
        Rj = jnp.asarray(R)
        xq = jnp.einsum("qn,end->eqd", N, coords_e)
        proj = (jnp.einsum("eqd,d->eq", xq - A, Rj) /
                float(np.dot(R, R)))[:, :, None] * Rj[None, None, :]
        coef = rho * val * val * (xq - (A + proj))
        return jnp.einsum("qn,eq,q,eqd->end", N, wdet, w, coef)
    raise ValueError(f"ltype {ltype}")


def _face_pressure_j(etype, coords_e, dim, thick, face_no, val):
    """jax twin of _face_pressure (normal follower pressure, traced)."""
    import jax.numpy as jnp
    ftype, lnodes = FACE_TABLES[etype][face_no - 1]
    ft = get_table(ftype)
    fc = coords_e[:, np.asarray(lnodes), :]
    out = jnp.zeros(coords_e.shape)
    for q in range(ft.nq):
        N = ft.N[q]
        dN = jnp.asarray(ft.dN[q])
        g = jnp.einsum("end,nf->edf", fc, dN)
        if dim == 3:
            normal = jnp.cross(g[:, :, 0], g[:, :, 1])
        else:
            normal = jnp.stack([-g[:, 1, 0], g[:, 0, 0]], axis=1) * thick
        add = (ft.weights[q] * val) * jnp.asarray(N)[None, :, None] * \
            normal[:, None, :]
        out = out.at[:, np.asarray(lnodes), :].add(add)
    return out


class FollowerDload:
    """Jitted follower DLOAD: f(u) assembled at coords0 + u on device.

    Falls back (ok=False) for shell blocks and 6-dof models — those keep
    the host path.  Entries are per (block, face, card) with static
    connectivity; the jit closes over the small tables and takes only u.
    """

    def __init__(self, model, cards, grpid_filter=None):
        import jax
        import jax.numpy as jnp
        self.ok = True
        entries = []
        for (bi, rows, face, ltype, params, token) in _dload_groups(
                model.mesh, model, cards, grpid_filter):
            b = model.blocks[bi]
            if getattr(b, "kind", "solid") != "solid" \
                    or model.ndof != model.dim or ltype >= 100 \
                    or (ltype >= 10 and b.etype not in FACE_TABLES):
                self.ok = False
                return
            entries.append((b.etype, b.conn[rows], face, ltype,
                            np.asarray(params), float(b.material.density),
                            b.thick))
        if not entries:
            self.ok = False
            return
        n = model.n_dof_total
        dim, ndof = model.dim, model.ndof
        coords0 = jnp.asarray(model.coords[:, :dim])

        def assemble(u):
            f = jnp.zeros(n)
            xd = coords0 + u.reshape(model.n_node, ndof)[:, :dim]
            for (etype, conn, face, ltype, params, rho, thick) in entries:
                ce = xd[jnp.asarray(conn)]
                if ltype < 10:
                    vect = _body_force_j(etype, ce, dim, thick, ltype,
                                         params, rho)
                else:
                    vect = _face_pressure_j(etype, ce, dim, thick, face,
                                            float(params[0]))
                dofs = (conn[:, :, None] * ndof +
                        np.arange(ndof)[None, None, :])
                f = f.at[jnp.asarray(dofs.reshape(-1))].add(
                    vect.reshape(-1))
            return f

        self._fn = jax.jit(assemble)

    def __call__(self, u):
        return self._fn(u)
