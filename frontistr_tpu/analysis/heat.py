"""Heat conduction analysis (steady + transient).

TPU rebuild of the NDOF=1 heat stack (fistr1/src/analysis/heat/):
  - temperature-dependent conductivity/capacity via piecewise-linear tables
    (heat_init.f90:196-231 funcA/funcB construction == jnp.interp with end
    clamping)
  - batched conductance matrices  k_e = int kappa(T) grad N . grad N dV
    (heat_LIB_THERMAL.f90 heat_THERMAL_<etype>)
  - lumped capacity (heat_LIB_CAPACITY.f90)
  - boundary conditions: !FIXTEMP (Dirichlet), !CFLUX (point), !DFLUX
    (S0..S6 face flux / BF body generation, heat_LIB_DFLUX.f90), !FILM
    (K += int h N N^T, f += int h Tamb N, heat_LIB_FILM.f90), !RADIATE
    (exact quartic factorization RRR=(T1+T2)(T1^2+T2^2)RR,
    heat_LIB_RADIATE.f90:95-107)
  - steady fixed-point loop on ||T_new - T_old||_2 <= eps
    (heat_solve_SS.f90) and transient backward Euler with fixed/adaptive dt
    (heat_solve_TRAN.f90)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frontistr_tpu.assembly import femop
from frontistr_tpu.assembly.loads import FACE_TABLES
from frontistr_tpu.elements.tables import get_table, ETYPE_INFO
from frontistr_tpu.fem.isoparam import jacobians
from frontistr_tpu.io.ctrlio import AnalysisConfig
from frontistr_tpu.io.meshio import Mesh
from frontistr_tpu.solver import cg as krylov


@dataclasses.dataclass
class HeatBlock:
    etype: int
    elem_ids: np.ndarray
    conn: np.ndarray
    thick: float
    cond_table: np.ndarray      # (n, 2) (value, temp) rows
    rho_table: np.ndarray
    cp_table: np.ndarray
    # interface element (541): (thick, hh, rr1, rr2) from
    # !SECTION TYPE=INTERFACE; None for volume elements
    iface: Optional[tuple] = None


@dataclasses.dataclass
class WeldLine:
    """!WELD_LINE moving heat source (fstr_ctrl_get_WELDLINE
    'RRRR' + 'S IRRRR': I,U,coe,v / egrp,xyz,n1,n2,distol,tstart;
    applied as heat_mat_ass_bc_DFLUX.f90:112-180 — total power
    I*U*coe spread over the volume of the elements whose centroid
    along axis ``xyz`` lies within ``distol`` of the torch position
    n1 + v*(t - tstart))."""
    current: float
    voltage: float
    coe: float
    v: float
    xyz: int                                  # 1/2/3 = x/y/z
    n1: float
    n2: float
    distol: float
    tstart: float
    elems: List[tuple]                        # (block_idx, elem_sel rows)


@dataclasses.dataclass
class HeatModel:
    mesh: Mesh
    cfg: AnalysisConfig
    n_node: int
    coords: np.ndarray
    dim: int
    blocks: List[HeatBlock]
    fixtemp_nodes: np.ndarray
    fixtemp_vals: np.ndarray
    f_const: np.ndarray                       # CFLUX + DFLUX contributions
    films: List[tuple]                        # (block_idx, elem_sel, face, h, sink)
    radiates: List[tuple]                     # (block_idx, elem_sel, face, rr, sink)
    zero_temp: float = 0.0
    weldlines: List[WeldLine] = dataclasses.field(default_factory=list)


def _mat_table(md, item, default=0.0):
    rows = md.items.get(item) if md else None
    if not rows:
        return np.asarray([[default, 0.0]])
    out = []
    for r in rows:
        v = r[0]
        t = r[1] if len(r) > 1 else 0.0
        out.append([v, t])
    return np.asarray(out)


def _interp(table: np.ndarray, T):
    """Piecewise linear in temperature, clamped at ends (heat_init funcA/B)."""
    vals = jnp.asarray(table[:, 0])
    temps = jnp.asarray(table[:, 1])
    if table.shape[0] == 1:
        return jnp.full_like(T, float(table[0, 0]))
    return jnp.interp(T, temps, vals)


def build_heat_model(mesh: Mesh, cfg: AnalysisConfig) -> HeatModel:
    blocks = []
    dim = max(ETYPE_INFO[b.etype][0] for b in mesh.blocks
              if b.etype in ETYPE_INFO)
    for b in mesh.blocks:
        sec = mesh.sections[b.section_id] if mesh.sections else None
        md = mesh.materials.get(sec.material) if sec else None
        thick = sec.values[0] if sec and sec.values else 1.0
        if b.etype == 541:
            # gap/interface element: !SECTION TYPE=INTERFACE carries
            # (thickness, conductance, rr1, rr2)
            # (heat_mat_ass_conductivity.f90:123-129)
            v = list(sec.values) + [0.0] * 4 if sec else [1.0, 0.0, 0, 0]
            blocks.append(HeatBlock(
                b.etype, b.elem_ids, b.conn, v[0],
                cond_table=_mat_table(md, 3),
                rho_table=_mat_table(md, 1),
                cp_table=_mat_table(md, 2),
                iface=(v[0], v[1], v[2], v[3])))
            continue
        if b.etype not in ETYPE_INFO:
            continue
        blocks.append(HeatBlock(
            b.etype, b.elem_ids, b.conn, thick,
            cond_table=_mat_table(md, 3),
            rho_table=_mat_table(md, 1),
            cp_table=_mat_table(md, 2)))

    n_node = mesh.n_node
    # FIXTEMP
    fnodes, fvals = [], []
    for c in cfg.fixtemps:
        for row in c.data:
            grp, val = row[0], float(row[1]) if len(row) > 1 else 0.0
            if grp in mesh.node_groups:
                idx = mesh.node_groups[grp]
            else:
                try:
                    idx = np.asarray([mesh.id2idx[int(grp)]])
                except (ValueError, KeyError):
                    continue
            fnodes.append(idx)
            fvals.append(np.full(len(idx), val))
    fixtemp_nodes = (np.concatenate(fnodes) if fnodes
                     else np.zeros(0, np.int64))
    fixtemp_vals = np.concatenate(fvals) if fvals else np.zeros(0)

    # constant flux loads
    f = np.zeros(n_node)
    for c in cfg.cfluxes:
        for row in c.data:
            grp, val = row[0], float(row[1])
            if grp in mesh.node_groups:
                f[mesh.node_groups[grp]] += val
            else:
                try:
                    f[mesh.id2idx[int(grp)]] += val
                except (ValueError, KeyError):
                    pass

    eid2loc = {}
    for bi, b in enumerate(blocks):
        for k, eid in enumerate(b.elem_ids):
            eid2loc[int(eid)] = (bi, k)

    def elems_of(grp):
        eids = mesh.elem_groups.get(grp)
        if eids is None:
            try:
                eids = np.asarray([int(grp)])
            except ValueError:
                return {}
        by_block: Dict[int, List[int]] = {}
        for eid in eids:
            loc = eid2loc.get(int(eid))
            if loc:
                by_block.setdefault(loc[0], []).append(loc[1])
        return by_block

    coords = mesh.coords[:, :dim]
    for c in cfg.dfluxes:
        for row in c.data:
            grp, ltype, val = row[0], row[1].upper(), float(row[2])
            for bi, rows_ in elems_of(grp).items():
                b = blocks[bi]
                sel = np.asarray(rows_, np.int64)
                if ltype == "BF":       # body heat generation
                    t = get_table(b.etype)
                    ce = coords[b.conn[sel]]
                    J = np.einsum("qni,enj->eqij", t.dN, ce)
                    det = np.abs(np.linalg.det(J))
                    scale = b.thick if dim == 2 else 1.0
                    vect = np.einsum("qn,eq,q->en", t.N, det * scale,
                                     t.weights) * val
                    np.add.at(f, b.conn[sel].reshape(-1), vect.reshape(-1))
                elif ltype.startswith("S"):
                    face = int(ltype[1:])
                    if face == 0:
                        continue
                    vect, lnodes = _surface_integral_N(
                        b, coords, sel, face, dim)
                    np.add.at(f, b.conn[sel][:, lnodes].reshape(-1),
                              (val * vect).reshape(-1))

    # surface-group cards: !SFLUX/!SFILM/!SRADIATE address SGROUP
    # (elem, face) pairs and route into the same face kernels as the
    # element-group DFLUX-S/FILM/RADIATE arms (fstr_ctrl_heat.f90
    # fstr_ctrl_get_SFLUX/SFILM/SRADIATE; applied via the Q_SUF arm of
    # heat_mat_ass_bc_DFLUX.f90:32-41 and its FILM/RADIATE analogs)
    def faces_of(grp):
        pairs = mesh.surf_groups.get(grp)
        if pairs is None:
            print(f"### WARNING: surface group '{grp}' not in mesh; "
                  f"card ignored")
            return {}
        by_bf: Dict[tuple, List[int]] = {}
        for eid, face in np.asarray(pairs, np.int64):
            loc = eid2loc.get(int(eid))
            if loc:
                by_bf.setdefault((loc[0], int(face)), []).append(loc[1])
        return by_bf

    for c in cfg.sfluxes:
        for row in c.data:
            grp, val = row[0], float(row[1])
            for (bi, face), rows_ in faces_of(grp).items():
                b = blocks[bi]
                sel = np.asarray(rows_, np.int64)
                vect, lnodes = _surface_integral_N(b, coords, sel, face,
                                                   dim)
                np.add.at(f, b.conn[sel][:, lnodes].reshape(-1),
                          (val * vect).reshape(-1))

    films, radiates = [], []
    for c in cfg.sfilms:
        for row in c.data:
            grp, h = row[0], float(row[1])
            sink = float(row[2]) if len(row) > 2 else 0.0
            for (bi, face), rows_ in faces_of(grp).items():
                films.append((bi, np.asarray(rows_, np.int64), face, h,
                              sink))
    for c in cfg.sradiates:
        for row in c.data:
            grp, rr = row[0], float(row[1])
            sink = float(row[2]) if len(row) > 2 else 0.0
            for (bi, face), rows_ in faces_of(grp).items():
                radiates.append((bi, np.asarray(rows_, np.int64), face,
                                 rr, sink))
    for c in cfg.films:
        for row in c.data:
            grp, ltype = row[0], row[1].upper()
            h, sink = float(row[2]), float(row[3]) if len(row) > 3 else 0.0
            face = int(ltype[1:]) if ltype.startswith("F") else 1
            for bi, rows_ in elems_of(grp).items():
                films.append((bi, np.asarray(rows_, np.int64), face, h,
                              sink))
    for c in cfg.radiates:
        for row in c.data:
            grp, ltype = row[0], row[1].upper()
            rr, sink = float(row[2]), float(row[3]) if len(row) > 3 else 0.0
            face = int(ltype[1:]) if ltype.startswith("R") else 1
            for bi, rows_ in elems_of(grp).items():
                radiates.append((bi, np.asarray(rows_, np.int64), face, rr,
                                 sink))

    weldlines = []
    for c in getattr(cfg, "weldlines", []):
        if len(c.data) < 2:
            print("### WARNING: !WELD_LINE needs two data lines; ignored")
            continue
        r0 = [float(v) for v in c.data[0][:4]]
        r1 = c.data[1]
        egrp = r1[0]
        eids = mesh.elem_groups.get(egrp)
        if eids is None:
            print(f"### WARNING: weld line element group '{egrp}' not in "
                  f"mesh; card ignored")
            continue
        elems: Dict[int, List[int]] = {}
        for eid in eids:
            loc = eid2loc.get(int(eid))
            if loc:
                elems.setdefault(loc[0], []).append(loc[1])
        weldlines.append(WeldLine(
            current=r0[0], voltage=r0[1], coe=r0[2], v=r0[3],
            xyz=int(float(r1[1])), n1=float(r1[2]), n2=float(r1[3]),
            distol=float(r1[4]), tstart=float(r1[5]),
            elems=[(bi, np.asarray(rs, np.int64))
                   for bi, rs in elems.items()]))

    return HeatModel(mesh, cfg, n_node, coords, dim, blocks, fixtemp_nodes,
                     fixtemp_vals, f, films, radiates,
                     zero_temp=mesh.zero_temp, weldlines=weldlines)


def _surface_integral_N(block, coords, sel, face, dim):
    """int N dS over a face for selected elements: (Esel, nsur), lnodes."""
    ftype, lnodes = FACE_TABLES[block.etype][face - 1]
    ft = get_table(ftype)
    fc = coords[block.conn[sel]][:, lnodes, :]
    out = np.zeros((len(sel), len(lnodes)))
    for q in range(ft.nq):
        g = np.einsum("end,nf->edf", fc, ft.dN[q])
        if dim == 3:
            area = np.linalg.norm(np.cross(g[:, :, 0], g[:, :, 1]), axis=1)
        else:
            area = np.linalg.norm(g[:, :, 0], axis=1) * block.thick
        out += ft.weights[q] * area[:, None] * ft.N[q][None, :]
    return out, lnodes


def weld_flux(model: "HeatModel", t_mid: float) -> Optional[np.ndarray]:
    """Nodal rhs from active weld lines at evaluation time ``t_mid``.

    heat_mat_ass_bc_DFLUX.f90:112-180: total power I*U*coe is spread
    uniformly over the volume of the elements whose centroid along the
    torch axis lies within ``distol`` of position n1 + v*(t - tstart);
    active only inside [tstart, tstart + (n2-n1)/v].
    """
    if not model.weldlines:
        return None
    f = np.zeros(model.n_node)
    for wl in model.weldlines:
        tend = wl.tstart + (wl.n2 - wl.n1) / wl.v
        if t_mid < wl.tstart or t_mid > tend:
            continue
        wpos = wl.n1 + wl.v * (t_mid - wl.tstart)
        val = wl.current * wl.voltage * wl.coe
        fw = np.zeros(model.n_node)
        vol = 0.0
        for bi, sel in wl.elems:
            b = model.blocks[bi]
            cmean = model.coords[b.conn[sel], wl.xyz - 1].mean(axis=1)
            act = sel[np.abs(cmean - wpos) < wl.distol]
            if act.size == 0:
                continue
            t = get_table(b.etype)
            ce = model.coords[b.conn[act]]
            J = np.einsum("qni,enj->eqij", t.dN, ce)
            det = np.abs(np.linalg.det(J))
            scale = b.thick if model.dim == 2 else 1.0
            vect = np.einsum("qn,eq,q->en", t.N, det * scale,
                             t.weights) * val
            np.add.at(fw, b.conn[act].reshape(-1), vect.reshape(-1))
            vol += float(((det * scale) @ t.weights).sum())
        if vol > 0:
            f += fw / vol
    return f


def conduct_ke(table, coords_e, T_e, cond_table, thick, dim):
    """Batched conductance matrices with kappa(T) at gauss points."""
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    det, gderiv = jacobians(dN, coords_e)
    det = jnp.abs(det)
    N = jnp.asarray(table.N, dt)
    w = jnp.asarray(table.weights, dt)
    Tq = jnp.einsum("qn,en->eq", N, T_e)
    kap = _interp(cond_table, Tq)                        # (E, nq)
    scale = thick if dim == 2 else 1.0
    wdet = (w * scale)[None, :] * det * kap
    return jnp.einsum("eqnj,eqmj,eq->enm", gderiv, gderiv, wdet)


def interface_ke_541(coords_e, T_e, tzero, thick, hh, rr1, rr2):
    """8-node gap interface conductance (heat_THERMAL_541,
    heat_LIB_THERMAL.f90:902-1007): nodes 1-4 / 5-8 are the paired quad
    faces; coupling = gap conductance hh/thick plus radiation linearized
    about the current absolute temperatures (T - tzero, tzero = !ZERO),
    with face areas SA/SB by 2x2 Gauss (heat_get_area)."""
    dt = coords_e.dtype
    qt = get_table(241)

    def _qarea(fc):
        a = jnp.zeros(fc.shape[0], dt)
        for q in range(qt.nq):
            g = jnp.einsum("end,nf->edf", fc, jnp.asarray(qt.dN[q], dt))
            a = a + jnp.asarray(qt.weights[q], dt) * jnp.linalg.norm(
                jnp.cross(g[:, :, 0], g[:, :, 1], axis=1), axis=1)
        return a

    SA = _qarea(coords_e[:, :4])
    SB = _qarea(coords_e[:, 4:])
    tz = T_e - tzero
    r1 = rr1 ** 0.25
    r2 = rr2 ** 0.25
    ta, tb = tz[:, :4], tz[:, 4:]
    common = ((r1 * ta) ** 2 + (r2 * tb) ** 2) * (r1 * ta + r2 * tb)
    HA = common * r1
    HB = common * r2
    HHH = hh / thick
    E = coords_e.shape[0]
    K = jnp.zeros((E, 8, 8), dt)
    i = jnp.arange(4)
    K = K.at[:, i, i].set((HHH + HA) * SA[:, None] * 0.25)
    K = K.at[:, i + 4, i + 4].set((HHH + HB) * SB[:, None] * 0.25)
    off = -(HHH + 0.5 * (HA + HB)) * (0.5 * (SA + SB))[:, None] * 0.25
    K = K.at[:, i, i + 4].set(off)
    K = K.at[:, i + 4, i].set(off)
    return K


def lumped_capacity(table, coords_e, T_e, rho_table, cp_table, thick, dim,
                    hrz=False):
    """Lumped capacity diag: int rho(T) c(T) N_i dV (heat_LIB_CAPACITY).

    hrz=True uses HRZ lumping — the consistent diagonal int N_i^2 scaled
    by total/diagonal mass, S0(J) = M_JJ*(2*TOTM-TOTD)/TOTD in
    heat_CAPACITY_342 etc. — which the reference applies to the
    SECOND-order etypes, whose row-sum corner integrals go negative
    (negative lumped capacity = unstable transient)."""
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    det, _ = jacobians(dN, coords_e)
    det = jnp.abs(det)
    N = jnp.asarray(table.N, dt)
    w = jnp.asarray(table.weights, dt)
    Tq = jnp.einsum("qn,en->eq", N, T_e)
    rc = _interp(rho_table, Tq) * _interp(cp_table, Tq)
    scale = thick if dim == 2 else 1.0
    wdet = (w * scale)[None, :] * det * rc
    if hrz:
        diag = jnp.einsum("qn,eq->en", N * N, wdet)
        tot = wdet.sum(axis=1)
        return diag * (tot / diag.sum(axis=1))[:, None]
    return jnp.einsum("qn,eq->en", N, wdet)


@dataclasses.dataclass
class HeatResult:
    T: np.ndarray
    steps: int
    iters: int
    times: List[float]


class _HeatSolver:
    """Once-jitted heat solve (assembly shapes are fixed; conductivity and
    film/radiate matrices stream in as traced arguments).

    nshard > 0 runs the solve GSPMD-sharded over an nshard-device mesh
    (multi-chip transient/steady heat — same design as the sharded
    structural solve, make_constrained_solver): node axis padded with
    inert phantom rows, node-axis arrays sharded, XLA inserts the
    collectives for the incidence scatter and CG dots."""

    def __init__(self, model, nshard: int = 0):
        self.model = model
        n = model.n_node
        dofs, nns, conns = [], [], []
        for b in model.blocks:
            dofs.append(jnp.asarray(b.conn.astype(np.int32)))
            nns.append(b.conn.shape[1])
            conns.append(b.conn)
        self.surf = []
        for kind, entries in (("film", model.films),
                              ("rad", model.radiates)):
            for (bi, sel, face, coef, sink) in entries:
                b = model.blocks[bi]
                ftype, lnodes = FACE_TABLES[b.etype][face - 1]
                fconn = b.conn[sel][:, lnodes]
                self.surf.append((kind, bi, sel, face, coef, sink,
                                  fconn))
                dofs.append(jnp.asarray(fconn.astype(np.int32)))
                nns.append(fconn.shape[1])
                conns.append(fconn)
        cons = None
        npn = n                       # padded node count (== n unsharded)
        if nshard:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            from frontistr_tpu.parallel import shard as shmod
            npn = shmod._ceil_to(n, nshard)
            jmesh = shmod.device_mesh(nshard)
            rep, row = shmod.solver_shardings(jmesh)

            def cons(x, *spec):
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(jmesh, P(*spec)))

        inc, total_en = femop.build_incidence(conns, npn)
        self.inc = jnp.asarray(inc)
        self.total_en = total_en
        self.dofs, self.nns = dofs, nns
        free = np.ones(npn)
        free[n:] = 0.0                # phantom pad rows: identity
        free[model.fixtemp_nodes] = 0.0
        self.free = jnp.asarray(free)
        u_fix = np.zeros(npn)
        u_fix[model.fixtemp_nodes] = model.fixtemp_vals
        self.u_fix = jnp.asarray(u_fix)
        if nshard:
            self.inc = jax.device_put(self.inc, row)
            self.free = jax.device_put(self.free, row)
            self.u_fix = jax.device_put(self.u_fix, row)
            dofs = [jax.device_put(d, rep) for d in dofs]
            self.dofs = dofs
        sv = model.cfg.solver
        nns_t = tuple(nns)
        # !EQUATION on heat decks (temperature ties, ndof=1): the same
        # exact elimination as the structural solvers
        from frontistr_tpu.assembly import extras as exmod
        mpc_a = exmod.mpc_arrays(model.mesh, 1, npn)
        if mpc_a is not None and nshard:
            mpc_a = {k: jax.device_put(v, row if k == "mask" else rep)
                     for k, v in mpc_a.items()}

        # all arrays ride through the jit boundary as pytree ARGS
        # (closure arrays are inlined as module literals: payload
        # overflow on the remote-compile path at scale)
        @jax.jit
        def _solve(ctx, kes, f, dt_inv_C):
            dofs_a, inc_a, free_j, u_fix_j, mpc = ctx
            op = femop.FEOperator(
                kes=list(kes), dofs=list(dofs_a), nns=nns_t, inc=inc_a,
                total_en=total_en, n_node=npn, ndof=1, free_mask=free_j)

            def A(x):
                y = op.matvec(x * free_j) + dt_inv_C * (x * free_j)
                return y * free_j + x * (1.0 - free_j)

            y_fix = op.matvec(u_fix_j) + dt_inv_C * u_fix_j
            b_c = (f - y_fix) * free_j + u_fix_j * (1.0 - free_j)
            if cons is not None:
                b_c = cons(b_c, "x")
            D = op.diag_blocks().reshape(-1) + dt_inv_C
            D = D * free_j ** 2
            D = jnp.where(D == 0, 1.0, D)
            A_cg = A
            if mpc is not None:
                # steady/transient ties: T_dep = sum c T_m + const holds
                # every solve (factor 1 — temperatures are total, not
                # incremental)
                b_c = exmod.mpc_reduce_rhs(mpc, A, b_c, 1.0)
                A_cg = exmod.mpc_wrap(mpc, A)
            res = krylov.pcg(A_cg, b_c, M=lambda r: r / D, tol=sv.resid,
                             maxiter=max(sv.nier, 2000))
            x = res.x
            if mpc is not None:
                x = exmod.mpc_recover(mpc, x, 1.0)
            if cons is not None:
                x = cons(x)[:n]
            return x

        ctx = (list(dofs), self.inc, self.free, self.u_fix, mpc_a)
        if nshard:
            dev0 = jax.devices()[0]
            npad = npn - n

            def _run(kes, f, dt_inv_C):
                kes_s = tuple(jax.device_put(k, rep) for k in kes)
                fp = jax.device_put(jnp.pad(f, (0, npad)), row)
                cp = jax.device_put(jnp.pad(dt_inv_C, (0, npad)), row)
                return jax.device_put(_solve(ctx, kes_s, fp, cp), dev0)

            self._solve = _run
            self._scan_ok = False
        elif sv.method.upper() in (
                "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG") \
                and mpc_a is None:
            # METHOD=DIRECT: host SuperLU on K + diag(C/dt).  The
            # conductivity blocks are T-dependent (rebuilt per step /
            # fixed-point pass), so each call factors the current
            # matrix — the reference's heat direct path refactors the
            # same way (heat_solve_main -> solve_LINEQ per iteration).
            from frontistr_tpu.solver.direct import assemble_csr
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla
            free_np = np.asarray(self.free)
            ufix_np = np.asarray(self.u_fix)
            dofs_np = [np.asarray(d) for d in dofs]

            def _run_direct(kes, f, dt_inv_C):
                A = assemble_csr([np.asarray(k) for k in kes],
                                 dofs_np, npn)
                A = (A + sp.diags(np.asarray(dt_inv_C))).tocsr()
                P = sp.diags(free_np)
                Acon = P @ A @ P + sp.diags(1.0 - free_np)
                dz = Acon.diagonal() == 0.0
                if dz.any():
                    Acon = Acon + sp.diags(dz.astype(float))
                b = (np.asarray(f) - A @ ufix_np) * free_np + \
                    ufix_np * (1.0 - free_np)
                return jnp.asarray(spla.splu(Acon.tocsc()).solve(b))

            self._solve = _run_direct
            self._scan_ok = False
        else:
            if sv.method.upper() in (
                    "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG"):
                print("### NOTE: METHOD=DIRECT with !EQUATION rides the "
                      "iterative eliminated solve in heat")
            self._solve = lambda kes, f, dt_inv_C: _solve(ctx, kes, f,
                                                          dt_inv_C)
            # the plain jitted arm is pure jnp — safe to trace inside
            # the transient lax.scan (sharded/direct arms device_put /
            # factor on the host per call)
            self._scan_ok = True

    def step(self, T, dt_inv_C=None, T_prev=None, f_extra=None):
        model = self.model
        n = model.n_node
        kes = []
        for b in model.blocks:
            coords_e = jnp.asarray(model.coords[b.conn])
            T_e = T[jnp.asarray(b.conn)]
            if b.iface is not None:
                th, hh, rr1, rr2 = b.iface
                kes.append(interface_ke_541(coords_e, T_e,
                                            model.zero_temp, th, hh,
                                            rr1, rr2))
                continue
            table = get_table(b.etype)
            kes.append(conduct_ke(table, coords_e, T_e, b.cond_table,
                                  b.thick, model.dim))
        f = jnp.asarray(model.f_const)
        if f_extra is not None:
            f = f + jnp.asarray(f_extra)
        for (kind, bi, sel, face, coef, sink, fconn) in self.surf:
            b = model.blocks[bi]
            ftype, lnodes = FACE_TABLES[b.etype][face - 1]
            ft = get_table(ftype)
            fc = jnp.asarray(model.coords[b.conn[sel]][:, lnodes, :])
            T_f = T[jnp.asarray(fconn)]
            kmat, fvec = _surface_film_terms(
                ft, fc, T_f, coef, sink, kind, model.zero_temp,
                b.thick, model.dim)
            kes.append(kmat)
            f = f.at[jnp.asarray(fconn).reshape(-1)].add(
                fvec.reshape(-1))
        if dt_inv_C is not None:
            f = f + dt_inv_C * T_prev
        else:
            dt_inv_C = jnp.zeros(n)
        return self._solve(tuple(kes), f, dt_inv_C)


def _solve_heat_system(model, T, dt_inv_C=None, T_prev=None, solver=None,
                       f_extra=None):
    if solver is None:
        solver = _HeatSolver(model)
    return solver.step(T, dt_inv_C, T_prev, f_extra)


def _surface_film_terms(ft, fc, T_f, coef, sink, kind, tzero, thick, dim):
    """(Esel, nsur, nsur) surface matrix + (Esel, nsur) rhs for FILM/RADIATE."""
    dt = fc.dtype
    nsur = fc.shape[1]
    E = fc.shape[0]
    kmat = jnp.zeros((E, nsur, nsur), dt)
    fvec = jnp.zeros((E, nsur), dt)
    for q in range(ft.nq):
        N = jnp.asarray(ft.N[q], dt)
        dNq = jnp.asarray(ft.dN[q], dt)
        g = jnp.einsum("end,nf->edf", fc, dNq)
        if dim == 3:
            area = jnp.linalg.norm(jnp.cross(g[:, :, 0], g[:, :, 1]),
                                   axis=1)
        else:
            area = jnp.linalg.norm(g[:, :, 0], axis=1) * thick
        if kind == "film":
            cc = coef * jnp.ones_like(area)
        else:
            Tq = jnp.einsum("n,en->e", N, T_f)
            t1 = Tq - tzero
            t2 = sink - tzero
            cc = coef * (t1 + t2) * (t1 * t1 + t2 * t2)
        wa = ft.weights[q] * area * cc
        kmat = kmat + wa[:, None, None] * (N[None, :, None] *
                                           N[None, None, :])
        fvec = fvec + wa[:, None] * N[None, :] * sink
    return kmat, fvec


def run_heat(mesh: Mesh, cfg: AnalysisConfig, workdir: str,
             log_path: Optional[str] = None,
             restart_path: Optional[str] = None,
             restart_freq: int = 0,
             on_interval=None) -> HeatResult:
    """on_interval(step, t, T) fires after every committed time step —
    the runner uses it for per-interval result files + in-situ
    visualization (heat_solve_TRAN.f90:268-270)."""
    model = build_heat_model(mesh, cfg)
    h = cfg.heat or __import__(
        "frontistr_tpu.io.ctrlio", fromlist=["HeatConfig"]).HeatConfig()
    n = model.n_node
    T = jnp.zeros(n)
    # initial condition
    ic = mesh.initial_conditions.get("TEMPERATURE")
    if ic is not None:
        T = T.at[jnp.asarray(ic[:, 0].astype(np.int64))].set(
            jnp.asarray(ic[:, 1]))
    itmax = h.itmax if h else 20
    eps = h.eps if h else 1.0e-6
    total_iters = 0
    times = []

    from frontistr_tpu.parallel import shard as shmod
    solver = _HeatSolver(model, nshard=shmod.requested_shards())
    transient = h is not None and h.fixed_dt > 0.0
    if not transient:
        # steady: fixed-point on temperature-dependent properties
        # (heat_solve_SS.f90 loop)
        for it in range(max(itmax, 1)):
            T_new = _solve_heat_system(model, T, solver=solver)
            chg = float(jnp.sqrt(jnp.sum((T_new - T) ** 2)))
            T = T_new
            total_iters += 1
            if chg <= max(eps, 1e-12):
                break
        steps = 1
        times = [0.0]
        if log_path:
            _write_heat_log(log_path, model, np.asarray(T), 1, 0.0)
        if on_interval is not None:
            on_interval(1, 0.0, np.asarray(T))
    else:
        dt = h.fixed_dt
        t_total = h.total_time
        t = 0.0
        steps = 0
        # transient restart (heat_solve_TRAN.f90 restart block): the
        # state is just (T, t, step) — backward Euler has no history
        if restart_path and os.path.exists(restart_path):
            from frontistr_tpu.io.restart import load_restart
            rd = load_restart(restart_path)
            T = jnp.asarray(rd["T"])
            t = float(rd["t"])
            steps = int(rd["steps"])
            print(f"### heat restart: resuming at step {steps}, "
                  f"t={t:g}")
        first = steps == 0
        # --- transient under lax.scan: the whole step train (lumped
        # capacity, fixed-point on T-dependent properties via
        # lax.while_loop, backward-Euler solve, log extrema) as ONE XLA
        # program — per-step eager dispatch is the wall on the
        # remote-TPU tunnel.  Falls back to the eager loop for restart,
        # per-interval IO, weld lines (host-evaluated torch position),
        # and the sharded/direct solver arms. ---
        scan_ok = (on_interval is None and not model.weldlines
                   and getattr(solver, "_scan_ok", False)
                   and os.environ.get("FRONTISTR_TPU_HEAT_SCAN",
                                      "1") != "0")
        if scan_ok:
            start_step = steps
            dts = []
            tt = t
            while tt < t_total - 1e-12:
                dc = min(dt, t_total - tt)
                dts.append(dc)
                tt += dc
            ts = t + np.cumsum(dts)
            eps_eff = max(eps, 1e-12)
            itcap = max(itmax, 1)

            def _cap(T_c):
                C = jnp.zeros(n)
                for b in model.blocks:
                    if b.iface is not None:
                        continue
                    table = get_table(b.etype)
                    coords_e = jnp.asarray(model.coords[b.conn])
                    T_e = T_c[jnp.asarray(b.conn)]
                    ce = lumped_capacity(
                        table, coords_e, T_e, b.rho_table, b.cp_table,
                        b.thick, model.dim,
                        hrz=b.etype in (232, 242, 342, 352, 362))
                    C = C.at[jnp.asarray(b.conn).reshape(-1)].add(
                        ce.reshape(-1))
                return C

            def _step_scan(T_c, xs):
                dt_cur, _ = xs
                dt_inv_C = _cap(T_c) / dt_cur
                T_prev = T_c
                T1 = solver.step(T_c, dt_inv_C, T_prev)
                chg1 = jnp.sqrt(jnp.sum((T1 - T_c) ** 2))

                def cond(c):
                    _, k, chg = c
                    return (k < itcap) & (chg > eps_eff)

                def body(c):
                    T_x, k, _ = c
                    T_n = solver.step(T_x, dt_inv_C, T_prev)
                    return (T_n, k + 1,
                            jnp.sqrt(jnp.sum((T_n - T_x) ** 2)))

                T_fin, iters, _ = jax.lax.while_loop(
                    cond, body, (T1, jnp.asarray(1), chg1))
                ys = (T_fin.max(), jnp.argmax(T_fin),
                      T_fin.min(), jnp.argmin(T_fin), iters)
                return T_fin, ys

            # segment the scan at restart-checkpoint boundaries (host
            # IO between segments; the per-step program is identical,
            # so interrupted + resumed stays BIT-equal to one scan)
            n_total = len(dts)
            if restart_path and restart_freq > 0:
                seg_ends = []
                k = restart_freq - (start_step % restart_freq)
                while k < n_total:
                    seg_ends.append(k)
                    k += restart_freq
                seg_ends.append(n_total)
                seg_ends = sorted(set(seg_ends))
            else:
                seg_ends = [n_total]
            ys_all = []
            done = 0
            total_iters = 0
            for se in seg_ends:
                if se == done:
                    continue
                T, ys = jax.lax.scan(
                    _step_scan, T,
                    (jnp.asarray(np.asarray(dts[done:se])),
                     jnp.asarray(ts[done:se])))
                ys_all.append([np.asarray(y) for y in ys])
                done = se
                steps = start_step + done
                if restart_path and restart_freq > 0 and \
                        steps % restart_freq == 0:
                    from frontistr_tpu.io.restart import save_restart
                    save_restart(restart_path,
                                 {"T": np.asarray(T),
                                  "t": float(ts[done - 1]),
                                  "steps": steps})
            tmaxs, imaxs, tmins, imins, its = (
                np.concatenate([seg[j] for seg in ys_all])
                for j in range(5))
            steps = start_step + n_total
            times = list(ts)
            total_iters = int(its.sum())
            if log_path:
                ids = model.mesh.node_ids
                mode = "w" if start_step == 0 else "a"
                with open(log_path, mode) as f:
                    if start_step == 0:
                        f.write(" fstr_setup: OK\n \n")
                    for k in range(n_total):
                        f.write(f" ISTEP ={start_step + k + 1:6d}\n")
                        f.write(f" Time  ={ts[k]:10.3f}\n")
                        f.write(f" Maximum Temperature :"
                                f"{tmaxs[k]:10.3f}\n")
                        f.write(f" Maximum Node No.    :"
                                f"{int(ids[imaxs[k]]):10d}\n")
                        f.write(f" Minimum Temperature :"
                                f"{tmins[k]:10.3f}\n")
                        f.write(f" Minimum Node No.    :"
                                f"{int(ids[imins[k]]):10d}\n")
            Tn = np.asarray(T)
            return HeatResult(Tn, steps, total_iters, times)

        while t < t_total - 1e-12:
            dt_cur = min(dt, t_total - t)
            f_weld = weld_flux(model, t + 0.5 * dt_cur)
            # lumped capacity at current T
            C = jnp.zeros(n)
            for b in model.blocks:
                if b.iface is not None:
                    continue          # gap interfaces carry no capacity
                table = get_table(b.etype)
                coords_e = jnp.asarray(model.coords[b.conn])
                T_e = T[jnp.asarray(b.conn)]
                ce = lumped_capacity(table, coords_e, T_e, b.rho_table,
                                     b.cp_table, b.thick, model.dim,
                                     hrz=b.etype in (232, 242, 342,
                                                     352, 362))
                C = C.at[jnp.asarray(b.conn).reshape(-1)].add(
                    ce.reshape(-1))
            dt_inv_C = C / dt_cur
            T_prev = T
            for it in range(max(itmax, 1)):
                T_new = _solve_heat_system(model, T, dt_inv_C, T_prev,
                                           solver=solver, f_extra=f_weld)
                chg = float(jnp.sqrt(jnp.sum((T_new - T) ** 2)))
                T = T_new
                total_iters += 1
                if chg <= max(eps, 1e-12):
                    break
            t += dt_cur
            steps += 1
            times.append(t)
            if restart_path and restart_freq > 0 and \
                    steps % restart_freq == 0:
                from frontistr_tpu.io.restart import save_restart
                save_restart(restart_path,
                             {"T": np.asarray(T), "t": t, "steps": steps})
            if log_path:
                _write_heat_log(log_path, model, np.asarray(T), steps, t,
                                append=not first)
                first = False
            if on_interval is not None:
                on_interval(steps, t, np.asarray(T))

    Tn = np.asarray(T)
    return HeatResult(Tn, steps, total_iters, times)


def _write_heat_log(path, model, T, istep, time_, append=False):
    imax = int(np.argmax(T))
    imin = int(np.argmin(T))
    ids = model.mesh.node_ids
    mode = "a" if append else "w"
    with open(path, mode) as f:
        if not append:
            f.write(" fstr_setup: OK\n \n")
        f.write(f" ISTEP ={istep:6d}\n")
        f.write(f" Time  ={time_:10.3f}\n")
        f.write(f" Maximum Temperature :{T[imax]:10.3f}\n")
        f.write(f" Maximum Node No.    :{int(ids[imax]):10d}\n")
        f.write(f" Minimum Temperature :{T[imin]:10.3f}\n")
        f.write(f" Minimum Node No.    :{int(ids[imin]):10d}\n")
