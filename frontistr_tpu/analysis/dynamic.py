"""Implicit (Newmark-beta) and explicit (central difference) dynamics.

TPU rebuild of fistr1/src/analysis/dynamic/transit/:
  implicit (fstr_dynamic_nlimplicit.f90:98-370):
    a1=0.5/b-1, a2=1/(b dt), a3=1/(b dt^2), b1=(0.5 g/b-1)dt, b2=g/b-1,
    b3=g/(b dt), c1=1+ray_k b3, c2=a3+ray_m b3
    predictors VEC1=a1 ACC+a2 VEL, VEC2=b1 ACC+b2 VEL
    Newton: B = F(t) - Q + M(VEC1 - a3 du + ray_m X) + ray_k K X,
            K_eff = c1 K + c2 M;  res = sqrt(|B|^2/|B1|^2) < converg
    post:   ACC' = -a1 ACC - a2 VEL + a3 du; VEL' = -b1 ACC - b2 VEL + b3 du
  explicit (fstr_dynamic_nlexplicit.f90:95-296):
    VEC1 = (1/dt^2 + ray_m/(2dt)) m;  u_{n+1} = B/VEC1 with
    B = F - Q + 2/dt^2 m u_n + (-1/dt^2 + ray_m/(2dt)) m u_{n-1}
Loads are scaled by !AMPLITUDE tables at t_curr (table_dyn.f90 semantics,
clamped linear interpolation).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frontistr_tpu.assembly import femop
from frontistr_tpu.assembly import operators as old_ops
from frontistr_tpu.assembly.model import StructModel, collect_cload
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.analysis.nonlinear import BlockPrograms, init_block_state, \
    _commit_state
from frontistr_tpu.analysis.static import StaticResult, _solve_policy
from frontistr_tpu.solver import cg as krylov
from frontistr_tpu.solver.mixed import refined_cg
from frontistr_tpu.post import nodal as postnodal


def lumped_mass_vector(model: StructModel) -> np.ndarray:
    """Global lumped mass per dof: HRZ diagonal scaling
    m_i = (int rho N_i^2) * M_elem / sum_j (int rho N_j^2)
    with high-order quadrature (setMASS kernels, eigen_LIB_3d*mass.f90 —
    the 'ss(num)*(2*totmass-totdiag)/totdiag' scaling)."""
    from frontistr_tpu.elements.quadhi import mass_tables
    m = np.zeros(model.n_node)
    rot_zero = model.ndof == 6
    for b in model.blocks:
        if b.kind in ("shell", "beam", "beam341", "sshell"):
            me = _struct_elem_mass(model, b)         # (E, nn) per node
            np.add.at(m, b.conn.reshape(-1), me.reshape(-1))
            continue
        N, dN, w = mass_tables(b.etype)
        coords_e = model.coords[b.conn]
        J = np.einsum("qni,enj->eqij", dN, coords_e)
        det = np.abs(np.linalg.det(J))
        scale = b.thick if model.dim == 2 else 1.0
        rho = b.density[:, None]
        wdet = w[None, :] * det * scale                  # (E, nq)
        mii = np.einsum("qn,eq->en", N * N, wdet) * rho  # int rho N_i^2
        total = wdet.sum(axis=1) * b.density             # element mass
        diag_sum = mii.sum(axis=1)
        me = mii * (total / np.where(diag_sum == 0, 1.0,
                                     diag_sum))[:, None]
        np.add.at(m, b.conn.reshape(-1), me.reshape(-1))
    if not rot_zero:
        return np.repeat(m, model.ndof)
    # 6-dof models: translational mass only, zero rotary inertia
    # (fstr_EIG_setMASS.f90:163-231 -- the rotary terms are commented out
    # in the reference too)
    md = np.zeros((model.n_node, 6))
    md[:, :3] = m[:, None]
    return md.reshape(-1)


def _struct_elem_mass(model, b) -> np.ndarray:
    """Equal-split element mass for shells/beams (fstr_EIG_setMASS.f90:
    131-150): shells A*t*rho/nn, beams L*a*rho/2 on the geometry-carrying
    nodes (641 rotation carriers get zero)."""
    x = model.coords[b.conn]
    E, nn = b.conn.shape[:2]
    rho = b.density
    if b.kind in ("shell", "sshell"):
        if b.kind == "sshell":
            # lower-face area; mass on the translation-carrying nodes only
            # (fstr_EIG_setMASS.f90:174-199)
            nn2 = b.conn.shape[1] // 2
            xl = x[:, :nn2]
            if nn2 == 3:
                area = 0.5 * np.linalg.norm(
                    np.cross(xl[:, 1] - xl[:, 0], xl[:, 2] - xl[:, 0]),
                    axis=1)
            else:
                a1 = 0.5 * np.linalg.norm(
                    np.cross(xl[:, 1] - xl[:, 0], xl[:, 2] - xl[:, 0]),
                    axis=1)
                a2 = 0.5 * np.linalg.norm(
                    np.cross(xl[:, 2] - xl[:, 0], xl[:, 3] - xl[:, 0]),
                    axis=1)
                area = a1 + a2
            val = area * b.thick * rho / nn2
            me = np.zeros((E, nn))
            me[:, :nn2] = val[:, None]
            return me
        if nn == 3:
            area = 0.5 * np.linalg.norm(
                np.cross(x[:, 1] - x[:, 0], x[:, 2] - x[:, 0]), axis=1)
        else:
            # quad: two triangles (1,2,3) + (1,3,4)
            a1 = 0.5 * np.linalg.norm(
                np.cross(x[:, 1] - x[:, 0], x[:, 2] - x[:, 0]), axis=1)
            a2 = 0.5 * np.linalg.norm(
                np.cross(x[:, 2] - x[:, 0], x[:, 3] - x[:, 0]), axis=1)
            area = a1 + a2
        val = area * b.thick * rho / nn
        return np.broadcast_to(val[:, None], (E, nn)).copy()
    # beams: section area from the BEAM section values
    sec = model.mesh.sections[b.sect_id] if model.mesh.sections else None
    a = sec.values[3] if sec and len(sec.values) >= 7 else 1.0
    L = np.linalg.norm(x[:, 1] - x[:, 0], axis=1)
    val = 0.5 * L * a * rho
    me = np.zeros((E, nn))
    me[:, 0] = val
    me[:, 1] = val
    return me


def _amp_factory(mesh, cfg):
    """name -> amp(t) callable (clamped linear interp over !AMPLITUDE)."""
    def make(name):
        a = mesh.amplitudes.get(name)
        if a is None:
            return lambda t: 1.0
        tt, vv = np.asarray(a.time), np.asarray(a.value)
        return lambda t: float(np.interp(t, tt, vv))
    return make


def _amp_tab(mesh, name):
    """(time, value) jnp tables for a named !AMPLITUDE — the traced
    (jnp.interp) counterpart of _amp_factory's host closures; None for
    the constant-1 default."""
    a = mesh.amplitudes.get(name) if name else None
    if a is None:
        return None
    return (jnp.asarray(np.asarray(a.time)),
            jnp.asarray(np.asarray(a.value)))


def _load_groups_with_amp(mesh, cfg, ndof, n_node):
    """[(f_vector, amp_fn)] per CLOAD card group (DLOAD similar)."""
    make = _amp_factory(mesh, cfg)
    out = []
    for c in cfg.cloads:
        amp = make(c.param("AMP", ""))
        f = collect_cload(mesh, [c], ndof, n_node)
        out.append((f, amp))
    if cfg.dloads:
        from frontistr_tpu.assembly.loads import collect_dload
        for c in cfg.dloads:
            amp = make(c.param("AMP", ""))
            out.append((None, amp, c))   # resolved later with model
    return out


@dataclasses.dataclass
class DynamicResult:
    u: np.ndarray
    vel: np.ndarray
    acc: np.ndarray
    steps: int
    monitors: Dict[str, np.ndarray]
    final: Optional[StaticResult] = None


def run_dynamic(model: StructModel, log_path: Optional[str] = None,
                restart_path: Optional[str] = None, restart_freq: int = 0,
                coupler=None, on_interval=None):
    """on_interval(step, t, u, vel, acc) fires after every committed
    time step — the runner uses it for per-interval result files +
    in-situ visualization (fstr_solve_dynamic result/vis cadence)."""
    cfg = model.cfg
    d = cfg.dynamic
    if d is None:
        raise ValueError("!DYNAMIC card missing")
    if coupler is None:
        from frontistr_tpu.couple.rcap import driver_from_env
        coupler = driver_from_env(model, model.mesh, cfg)
    if d.idx_eqa == 11:
        return _run_explicit(model, log_path, coupler=coupler,
                             on_interval=on_interval)
    return _run_implicit(model, log_path, restart_path=restart_path,
                         restart_freq=restart_freq, coupler=coupler,
                         on_interval=on_interval)


def _external_force(model, t, amp_loads):
    f = np.zeros(model.n_dof_total)
    for entry in amp_loads:
        if entry[0] is not None:
            f += entry[0] * entry[1](t)
        else:
            from frontistr_tpu.assembly.loads import collect_dload
            _, amp, card = entry
            f += collect_dload(model.mesh, model, [card]) * amp(t)
    return f


def _rate_bc_split(model, cards, make_amp):
    """Split !VELOCITY / !ACCELERATION cards into (initial, transit)
    entries.  initial = (dofs, vals); transit = (dofs, vals, amp_fn).
    Row layout matches !BOUNDARY (group, dof_s, dof_e, value)."""
    ndof = model.ndof
    mesh = model.mesh
    init_d, init_v = [], []
    tr_d, tr_v, tr_amp, tr_name = [], [], None, ""
    for c in cards:
        typ = (c.param("TYPE", "") or "").upper()
        amp = make_amp(c.param("AMP", ""))
        name = c.param("AMP", "")
        for row in c.data:
            grp = row[0]
            d1 = int(float(row[1]))
            d2 = int(float(row[2])) if len(row) > 2 else d1
            val = float(row[3]) if len(row) > 3 else 0.0
            nodes = mesh.node_groups.get(grp)
            if nodes is None:
                try:
                    nodes = [mesh.id2idx[int(grp)]]
                except (ValueError, KeyError):
                    continue
            for nn in np.asarray(nodes).reshape(-1):
                for d in range(d1, d2 + 1):
                    dof = int(nn) * ndof + d - 1
                    if typ.startswith("INIT"):
                        init_d.append(dof)
                        init_v.append(val)
                    else:
                        tr_d.append(dof)
                        tr_v.append(val)
                        tr_amp = amp
                        tr_name = name
    init = (np.asarray(init_d, np.int64), np.asarray(init_v)) \
        if init_d else None
    # 4th slot: the amplitude NAME, so the lax.scan explicit arm can
    # rebuild a traced jnp.interp from the table (the closure at [2] is
    # host-only float interp)
    trans = (np.asarray(tr_d, np.int64), np.asarray(tr_v), tr_amp,
             tr_name) if tr_d else None
    return init, trans


def _postprocess_dyn(model, programs, states, u, vel, acc):
    from frontistr_tpu.analysis.nonlinear import _postprocess
    res = _postprocess(model, programs, states, jnp.asarray(u))
    return res


def _run_implicit(model: StructModel, log_path, restart_path=None,
                  restart_freq=0, coupler=None, on_interval=None):
    cfg = model.cfg
    d = cfg.dynamic
    step = cfg.steps[0]
    ndof = model.ndof
    n = model.n_dof_total
    dt = d.t_delta
    beta, gamma = d.beta, d.gamma
    a1 = 0.5 / beta - 1.0
    a2 = 1.0 / (beta * dt)
    a3 = 1.0 / (beta * dt * dt)
    b1 = (0.5 * gamma / beta - 1.0) * dt
    b2 = gamma / beta - 1.0
    b3 = gamma / (beta * dt)
    c1 = 1.0 + d.ray_k * b3
    c2 = a3 + d.ray_m * b3

    mass = jnp.asarray(lumped_mass_vector(model))
    programs = [BlockPrograms(model, b) for b in model.blocks]
    states = [init_block_state(b, p.table)
              for b, p in zip(model.blocks, programs)]
    inc, total_en = femop.build_incidence([b.conn for b in model.blocks],
                                          model.n_node)
    inc_j = jnp.asarray(inc)
    dofs_j = [jnp.asarray(b.dofs) for b in model.blocks]
    nns = [b.conn.shape[1] for b in model.blocks]
    amp_loads = _load_groups_with_amp(model.mesh, cfg, ndof, model.n_node)
    make_amp = _amp_factory(model.mesh, cfg)
    bc_amps = [make_amp(c.param("AMP", "")) for c in cfg.boundaries]

    u = jnp.zeros(n)
    vel = jnp.zeros(n)
    acc = jnp.zeros(n)
    # --- !VELOCITY / !ACCELERATION (dynamic_mat_ass_bc_vl/_ac.f90 +
    # DYNAMIC_BC_INIT_VL/_AC): TYPE=INITIAL seeds v(0)/a(0); otherwise
    # the card is a prescribed-rate Dirichlet condition enforced through
    # the Newmark displacement relation each step ---
    v_init, v_trans = _rate_bc_split(model, cfg.velocities, make_amp)
    a_init, a_trans = _rate_bc_split(model, cfg.accelerations, make_amp)
    if v_init is not None:
        vel = vel.at[jnp.asarray(v_init[0])].set(jnp.asarray(v_init[1]))
    if a_init is not None:
        acc = acc.at[jnp.asarray(a_init[0])].set(jnp.asarray(a_init[1]))
    extra_fix = np.concatenate(
        [e[0] for e in (v_trans, a_trans) if e is not None]) \
        if (v_trans is not None or a_trans is not None) \
        else np.zeros(0, np.int64)
    fixed_all = np.concatenate([np.asarray(model.fixed_dofs,
                                           np.int64).reshape(-1),
                                extra_fix])
    free = jnp.asarray(old_ops.make_free_mask(n, fixed_all))
    # Newmark coefficients of the prescribed-rate displacement relation
    bv2 = dt * (gamma - beta) / gamma
    bv3 = dt * dt * (gamma - 2.0 * beta) / (2.0 * gamma)
    bv4 = dt * beta / gamma
    ba2 = dt
    ba3 = dt * dt * (0.5 - beta)
    ba4 = dt * dt * beta
    mixed = _solve_policy() == "mixed"
    result = None
    from frontistr_tpu.fem.isoparam import det_inv_small

    nns_t = tuple(nns)

    # !EQUATION on dynamics decks: the same exact dependent-dof
    # elimination as the static solvers, wrapped around the Newmark
    # effective operator (reference: hecmw_mat_ass_equation applied
    # before EVERY solve, middleware-level)
    from frontistr_tpu.assembly import extras as exmod
    mpc_a = exmod.mpc_arrays(model.mesh, ndof, n)
    if mpc_a is not None and float(np.abs(np.asarray(
            mpc_a["const"])).max()) > 0.0:
        print("### WARNING: !EQUATION with nonzero CONST is enforced "
              "homogeneously in dynamics (rate form)")

    @jax.jit
    def _solve_eff(ctx, kes, B, dirichlet_inc):
        """K_eff = c1 K + c2 M solve, compiled once for the whole run.
        Arrays ride through as pytree args (closure arrays would be
        inlined as module literals — remote-compile payload blowup)."""
        dofs_a, inc_a, free, mass, mpc = ctx
        op = femop.FEOperator(list(kes), list(dofs_a), nns_t, inc_a,
                              total_en, model.n_node, ndof, free)

        def A_raw(x):
            return c1 * op.matvec(x) + c2 * mass * x

        def A_eff(x):
            y = A_raw(x * free)
            return y * free + x * (1.0 - free)

        b_c = (B - A_raw(dirichlet_inc)) * free + \
            dirichlet_inc * (1.0 - free)
        D = op.diag_blocks()
        Dd = c1 * D + c2 * mass.reshape(model.n_node, ndof)[
            :, :, None] * jnp.eye(ndof)[None]
        fm = free.reshape(model.n_node, ndof)
        Dd = Dd * (fm[:, :, None] * fm[:, None, :])
        dd = Dd[:, jnp.arange(ndof), jnp.arange(ndof)]
        Dd = Dd.at[:, jnp.arange(ndof), jnp.arange(ndof)].add(
            jnp.where(dd == 0.0, jnp.ones_like(dd), jnp.zeros_like(dd)))
        _, Dinv = det_inv_small(Dd)

        def M(r):
            return jnp.einsum("nij,nj->ni", Dinv,
                              r.reshape(model.n_node, ndof)).reshape(-1)

        A_cg = A_eff
        if mpc is not None:
            b_c = exmod.mpc_reduce_rhs(mpc, A_eff, b_c)
            A_cg = exmod.mpc_wrap(mpc, A_eff)
        x = krylov.pcg(A_cg, b_c, M=M, tol=cfg.solver.resid,
                       maxiter=cfg.solver.nier).x
        if mpc is not None:
            x = exmod.mpc_recover(mpc, x)
        return x

    _ctx = (list(dofs_j), inc_j, free, mass, mpc_a)

    # multi-chip Newmark: FRONTISTR_TPU_SHARDS=n routes the effective
    # solve c1 K + c2 M through the GSPMD-sharded cluster-ELL + AMG
    # solver (contact decks keep the single-device contact solvers)
    from frontistr_tpu.parallel import shard as shmod
    nshard = shmod.requested_shards()
    if nshard and not (model.mesh.contact_pairs and cfg.contacts):
        from frontistr_tpu.analysis.nonlinear import \
            make_constrained_solver
        _sh_solver = make_constrained_solver(
            model, dofs_j, nns, inc_j, total_en, free, mixed,
            nshard=nshard, eff=(c1, c2), mass=mass)

        def solve_eff(kes, B, dirichlet_inc):
            return _sh_solver(tuple(kes), B, dirichlet_inc)
    elif cfg.solver.method.upper() in (
            "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG") \
            and mpc_a is None \
            and not (model.mesh.contact_pairs and cfg.contacts):
        # METHOD=DIRECT in implicit dynamics: factor K_eff = c1 K + c2 M
        # with host SuperLU ONCE and back-substitute every step — the
        # reference's set_arrays_DirectSolver path does exactly this for
        # linear dynamics; a nonlinear run passes fresh tangent arrays,
        # which triggers a refactorization (cache keyed by the kes
        # identity, entry holds the arrays so ids cannot be recycled)
        from frontistr_tpu.solver.direct import assemble_csr
        import os as _os
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        _fact: dict = {}
        free_np = np.asarray(free)
        _band = _os.environ.get("FRONTISTR_TPU_DIRECT",
                                "").lower() == "band"

        def solve_eff(kes, B, dirichlet_inc):
            key = tuple(id(k) for k in kes)
            ent = _fact.get("f")
            if ent is None or ent[0] != key:
                if _band:
                    # in-house on-device blocked band Cholesky of
                    # K_eff = c1 K + c2 M (solver/band.py)
                    from frontistr_tpu.solver.band import BandCholesky
                    fac = BandCholesky(
                        [np.asarray(k) for k in kes],
                        [np.asarray(dd) for dd in dofs_j], n,
                        free_np,
                        [np.asarray(b.conn) for b in model.blocks],
                        model.n_node, scale=c1,
                        diag_add=c2 * np.asarray(mass))
                    A = None
                else:
                    A = assemble_csr([np.asarray(k) for k in kes],
                                     [np.asarray(dd)
                                      for dd in dofs_j], n)
                    A = (c1 * A +
                         c2 * sp.diags(np.asarray(mass))).tocsr()
                    P = sp.diags(free_np)
                    Acon = P @ A @ P + sp.diags(1.0 - free_np)
                    dz = Acon.diagonal() == 0.0
                    if dz.any():
                        Acon = Acon + sp.diags(dz.astype(float))
                    fac = spla.splu(Acon.tocsc())
                _fact["f"] = (key, fac, A, tuple(kes))
                ent = _fact["f"]
            _, fac, A, kes_held = ent
            b = np.asarray(B)
            uf = np.asarray(dirichlet_inc)
            if A is not None:
                Auf = A @ uf
            else:                       # element-block matvec (host)
                Auf = c2 * np.asarray(mass) * uf
                for k, dd in zip(kes_held, dofs_j):
                    kv = np.asarray(k)
                    ddv = np.asarray(dd)
                    fe = np.einsum("eij,ej->ei", kv, uf[ddv])
                    np.add.at(Auf, ddv.reshape(-1),
                              c1 * fe.reshape(-1))
            b = (b - Auf) * free_np + uf * (1.0 - free_np)
            return jnp.asarray(fac.solve(b))
    else:
        if cfg.solver.method.upper() in (
                "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG"):
            print("### NOTE: METHOD=DIRECT with !EQUATION/contact rides "
                  "the iterative eliminated solve in dynamics")

        def solve_eff(kes, B, dirichlet_inc):
            return _solve_eff(_ctx, kes, B, dirichlet_inc)

    # --- contact in implicit dynamics (fstr_dynamic_nlimplicit.f90:374+):
    # the same AL / SLAGRANGE machinery as the static Newton loop, with
    # the Newmark effective matrix c1 K + c2 M (+ K_c) as the tangent ---
    cm = None
    contact_solver = None
    slag = None
    if model.mesh.contact_pairs and cfg.contacts:
        from frontistr_tpu.contact.ntos import ContactManager
        from frontistr_tpu.analysis.nonlinear import (
            make_constrained_solver, make_contact_solver,
            make_slag_contact_solver)
        cm = ContactManager(model.mesh, model, cfg)
        if not cm.active:
            cm = None
        # !EQUATION on contact decks: the AL/penalty effective-solve
        # arms eliminate MPCs on the contact-extended operator; SLag
        # composes the two eliminations when the dof sets are disjoint
        # (reference: hecmw_mat_ass_equation before every solve)
        slag_mpc = False
        if cm is not None and mpc_a is not None \
                and cm.algo == "SLAGRANGE" and not cm.has_friction:
            from frontistr_tpu.analysis.nonlinear import \
                contact_mpc_disjoint
            slag_mpc = contact_mpc_disjoint(cm, model)
            if not slag_mpc:
                print("### WARNING: !EQUATION dofs overlap the contact "
                      "surfaces; SLAGRANGE+MPC composition is invalid "
                      "— MPC ignored for this run")
        if cm is not None and cm.algo == "SLAGRANGE" \
                and not cm.has_friction:
            if nshard:
                # GSPMD SLag on the Newmark effective matrix: the
                # elimination wrap rides inside the sharded solve
                from frontistr_tpu.contact.slag import ContactEliminator
                contact_solver = make_constrained_solver(
                    model, dofs_j, nns, inc_j, total_en, free, mixed,
                    nshard=nshard, eff=(c1, c2), mass=mass,
                    contact=True, with_mpc=slag_mpc, slag_elim=True)
                slag = ContactEliminator(n, ndof)
            else:
                contact_solver, slag = make_slag_contact_solver(
                    model, dofs_j, nns, inc_j, total_en, free,
                    eff=(c1, c2), mass=mass, mpc=slag_mpc)
        elif cm is not None:
            if nshard:
                # AL/penalty contact rides the GSPMD effective solve as
                # replicated slot blocks (make_constrained_solver
                # contact=True) — same sharded path as the static arm
                contact_solver = make_constrained_solver(
                    model, dofs_j, nns, inc_j, total_en, free, mixed,
                    nshard=nshard, eff=(c1, c2), mass=mass,
                    contact=True, friction=cm.has_friction)
            else:
                contact_solver = make_contact_solver(
                    model, dofs_j, nns, inc_j, total_en, free,
                    friction=cm.has_friction, eff=(c1, c2), mass=mass)

    @jax.jit
    def _matvec_k(ctx, kes, x):
        dofs_a, inc_a, free_a = ctx[0], ctx[1], ctx[2]
        op = femop.FEOperator(list(kes), list(dofs_a), nns_t, inc_a,
                              total_en, model.n_node, ndof, free_a)
        return op.matvec(x)

    def matvec_k(kes, x):
        return _matvec_k(_ctx, kes, x)

    # '!RESTART' resume (reference dynamics restart,
    # fstr_dynamic_nlimplicit.f90 restart block / fstr_write_restart_dyna)
    start_i = 1
    if restart_path and restart_freq and os.path.exists(restart_path):
        from frontistr_tpu.io.restart import load_restart
        rz = load_restart(restart_path)
        u = jnp.asarray(rz["u"])
        vel = jnp.asarray(rz["vel"])
        acc = jnp.asarray(rz["acc"])
        states = [{k: (jnp.asarray(v) if v is not None else None)
                   for k, v in s.items()} for s in rz["states"]]
        start_i = int(np.asarray(rz["i"])) + 1
        if cm is not None and "cm" in rz:
            cs = rz["cm"]
            cm.lam = np.asarray(cs["lam"])
            cm.lam_t = np.asarray(cs["lam_t"])
            if cs.get("rel_prev") is not None:
                cm.rel_prev = np.asarray(cs["rel_prev"])
            cm.slag_released = np.asarray(cs["slag_released"]).astype(bool)

    mon = _Monitor(model, d)
    g_tol = 1e-8 * max(float(np.abs(model.coords).max()), 1.0)

    # --- linear implicit under lax.scan: one effective solve per step,
    # the whole transient as ONE XLA program.  For a linear model the
    # Newton loop is exactly one solve (it=2 only re-measures the
    # residual), so the scan result equals the eager loop at CG
    # tolerance.  Conditions: linear programs, no contact/coupler/
    # per-interval IO/restart, single-device, iterative solver. ---
    from frontistr_tpu.analysis.nonlinear import _all_linear
    lin_scan = (cm is None and coupler is None and on_interval is None
                and not restart_path and start_i == 1 and not nshard
                and _all_linear(programs)
                and cfg.solver.method.upper() not in (
                    "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG")
                and os.environ.get("FRONTISTR_TPU_IMPLICIT_SCAN",
                                   "1") != "0")
    if lin_scan:
        kes0 = []
        for p, s in zip(programs, states):
            u_e = jnp.zeros(n).reshape(model.n_node, ndof)[p.block.conn]
            kes0.append(p.tangent(u_e, u_e * 0.0, s, 0.0, dt))
        kes0 = tuple(kes0)
        from frontistr_tpu.assembly.loads import collect_dload
        fvecs, ftabs = [], []
        for c in cfg.cloads:
            fvecs.append(jnp.asarray(collect_cload(
                model.mesh, [c], ndof, model.n_node)))
            ftabs.append(_amp_tab(model.mesh, c.param("AMP", "")))
        for c in cfg.dloads:
            fvecs.append(jnp.asarray(collect_dload(model.mesh, model,
                                                   [c])))
            ftabs.append(_amp_tab(model.mesh, c.param("AMP", "")))
        u_fix_c = jnp.asarray(old_ops.full_fixed_vector(
            n, model.fixed_dofs, model.fixed_vals))
        vtab = _amp_tab(model.mesh, v_trans[3]) \
            if v_trans is not None else None
        atab = _amp_tab(model.mesh, a_trans[3]) \
            if a_trans is not None else None
        Q0 = _qforce_dyn(model, programs, states, u, jnp.zeros(n),
                         inc_j, ndof)
        midx = mon.idx

        def _scan_step(carry, i):
            u_c, vel_c, acc_c, Q_c, states_c = carry
            t = dt * i
            vec1_c = a1 * acc_c + a2 * vel_c
            vec2_c = b1 * acc_c + b2 * vel_c
            f_ext = jnp.zeros(n)
            for fv, tab in zip(fvecs, ftabs):
                fac = jnp.interp(t, *tab) if tab is not None else 1.0
                f_ext = f_ext + fv * fac
            B = f_ext - Q_c + mass * (vec1_c + d.ray_m * vec2_c)
            if d.ray_k != 0.0:
                B = B + d.ray_k * _matvec_k(_ctx, kes0, vec2_c)
            dirichlet_inc = u_fix_c - u_c
            if v_trans is not None:
                fac = jnp.interp(t, *vtab) if vtab is not None else 1.0
                dj = jnp.asarray(v_trans[0])
                dirichlet_inc = dirichlet_inc.at[dj].set(
                    bv2 * vel_c[dj] + bv3 * acc_c[dj]
                    + bv4 * jnp.asarray(v_trans[1]) * fac)
            if a_trans is not None:
                fac = jnp.interp(t, *atab) if atab is not None else 1.0
                dj = jnp.asarray(a_trans[0])
                dirichlet_inc = dirichlet_inc.at[dj].set(
                    ba2 * vel_c[dj] + ba3 * acc_c[dj]
                    + ba4 * jnp.asarray(a_trans[1]) * fac)
            # constrained-dof increment ONLY: the constrained-rhs trick
            # applies A_raw to this whole vector, so residual values on
            # FREE rows (u_fix - u is nonzero there from step 2 on)
            # would perturb the solve
            dirichlet_inc = dirichlet_inc * (1.0 - free)
            du_c = _solve_eff(_ctx, kes0, B, dirichlet_inc)
            new_states, flats = [], []
            for p, s in zip(programs, states_c):
                u_e = u_c.reshape(model.n_node, ndof)[p.block.conn]
                ddu_e = du_c.reshape(model.n_node, ndof)[p.block.conn]
                ns_, qf = p.update(u_e, ddu_e, s, t, dt)
                new_states.append(_commit_state(ns_))
                flats.append(qf.reshape(-1))
            flats.append(jnp.zeros(ndof))
            flat = jnp.concatenate(flats)
            idx = inc_j[:, :, None] * ndof + \
                jnp.arange(ndof)[None, None, :]
            Q_new = flat[idx].sum(axis=1).reshape(-1)
            acc_n = -a1 * acc_c - a2 * vel_c + a3 * du_c
            vel_n = -b1 * acc_c - b2 * vel_c + b3 * du_c
            u_n = u_c + du_c
            if midx is not None:
                k = midx * ndof
                ys = (jax.lax.dynamic_slice(u_n, (k,), (ndof,)),
                      jax.lax.dynamic_slice(vel_n, (k,), (ndof,)),
                      jax.lax.dynamic_slice(acc_n, (k,), (ndof,)))
            else:
                ys = ()
            return (u_n, vel_n, acc_n, Q_new, new_states), ys

        steps_t = jnp.arange(1, d.n_step + 1, dtype=jnp.float64)
        (u, vel, acc, Q, states), ys = jax.lax.scan(
            _scan_step, (u, vel, acc, Q0, list(states)), steps_t)
        if mon.idx is not None and d.n_step >= 1:
            us, vs, accs = (np.asarray(y) for y in ys)
            for i in range(1, d.n_step + 1):
                if i % mon.every == 0:
                    mon.rows.append((i, dt * i, us[i - 1], vs[i - 1],
                                     accs[i - 1]))
        result = _finalize_dyn(model, programs, states, u, vel, acc,
                               d.n_step, log_path,
                               monitors=mon.arrays())
        mon.write_files(log_path)
        return result

    for i in range(start_i, d.n_step + 1):
        t = dt * i
        vec1 = a1 * acc + a2 * vel
        vec2 = b1 * acc + b2 * vel
        f_ext = jnp.asarray(_external_force(model, t, amp_loads))
        if coupler is not None:
            # interface traction from the peer code (fstr_rcap_get +
            # dynamic_mat_ass_couple load insertion)
            f_ext = f_ext + jnp.asarray(coupler.traction_force(i))
        # prescribed displacement at t (total)
        u_fix_t = old_ops.full_fixed_vector(
            n, model.fixed_dofs, model.fixed_vals)
        u_fix_t = jnp.asarray(u_fix_t)  # amp on BC assumed uniform here
        states0 = states
        max_cont = max(getattr(step, "max_contiter", 1), 1) \
            if cm is not None else 1
        for cont_it in range(max_cont):
            # each augmentation pass restarts the Newton increment from
            # the converged state of step i-1 (fstr_solve_NonLinear's
            # loopFORcontactAnalysis semantics inside the dynamic loop)
            du = jnp.zeros(n)
            states = states0
            resb = None
            cn = None
            # SLag active set is FROZEN for the whole Newton pass
            # (fstr_scan_contact_state runs between
            # loopFORcontactAnalysis passes, never inside Newton —
            # flipping slots on mid-iteration residuals, which carry
            # O(1/beta/dt^2) inertia terms, makes Newton chase a moving
            # system and commits steps with spurious release/penetration)
            cact = None
            if cm is not None and slag is not None:
                coords_def = model.coords + np.asarray(u).reshape(
                    model.n_node, ndof)[:, :model.dim]
                proj0 = cm.search(coords_def)
                cact = proj0["touching"] & (proj0["gap"] <= g_tol) & \
                    ~cm.slag_released
            Q = _qforce_dyn(model, programs, states, u, du, inc_j, ndof)
            for it in range(1, max(step.max_iter, 1) + 1):
                kes = []
                for p, s in zip(programs, states):
                    u_e = u.reshape(model.n_node, ndof)[p.block.conn]
                    ddu_e = du.reshape(model.n_node, ndof)[p.block.conn]
                    kes.append(p.tangent(u_e, ddu_e, s, t, dt))
                X_ray = vec2 - b3 * du
                B = f_ext - Q + mass * (vec1 - a3 * du + d.ray_m * X_ray)
                if d.ray_k != 0.0:
                    B = B + d.ray_k * matvec_k(tuple(kes), X_ray)

                proj = None
                if cm is not None:
                    coords_def = model.coords + np.asarray(
                        u + du).reshape(model.n_node, ndof)[:, :model.dim]
                    proj = cm.search(coords_def)

                Bres = B
                if cm is None and mpc_a is not None:
                    # reduced-space convergence residual: constraint
                    # forces cancel dependent-vs-master
                    Bres = exmod.mpc_Tt(mpc_a, B)
                cdofs_j = cke_j = None
                if cm is not None and slag is None:
                    cdofs, cke, cqf, _, _ = cm.device_blocks(proj)
                    cdofs_j = jnp.asarray(cdofs)
                    cke_j = jnp.asarray(cke)
                    Bc = jnp.zeros_like(B).at[cdofs_j.reshape(-1)].add(
                        jnp.asarray(cqf).reshape(-1))
                    B = B - Bc
                    Bres = exmod.mpc_Tt(mpc_a, B) \
                        if mpc_a is not None else B

                if it == 1:
                    dirichlet_inc = u_fix_t - u
                    # prescribed-rate BCs: Newmark displacement relation
                    # (dynamic_mat_ass_bc_vl/_ac increment arms)
                    if v_trans is not None:
                        d_, v_, af = v_trans[:3]
                        dj = jnp.asarray(d_)
                        dirichlet_inc = dirichlet_inc.at[dj].set(
                            bv2 * vel[dj] + bv3 * acc[dj]
                            + bv4 * jnp.asarray(v_) * af(t))
                    if a_trans is not None:
                        d_, v_, af = a_trans[:3]
                        dj = jnp.asarray(d_)
                        dirichlet_inc = dirichlet_inc.at[dj].set(
                            ba2 * vel[dj] + ba3 * acc[dj]
                            + ba4 * jnp.asarray(v_) * af(t))
                    # constrained dofs only: u_fix - u is nonzero on
                    # FREE rows from step 2 on, and the constrained-rhs
                    # trick applies A_raw to this whole vector — the
                    # unmasked residual perturbed it=1 and cost one
                    # self-correcting extra solve EVERY step
                    dirichlet_inc = dirichlet_inc * (1.0 - free)
                else:
                    dirichlet_inc = jnp.zeros(n)

                if cm is not None and slag is not None:
                    # geometry coefficients track the deformed config
                    # (fstr_AddContactStiffness per iteration); only the
                    # act mask is frozen
                    cn = slag.build(proj, cm.all_slaves, cact)
                    r = exmod.mpc_Tt(mpc_a, B) \
                        if getattr(contact_solver, "has_mpc", False) \
                        else B
                    Bres = jnp.asarray(
                        np.asarray(slag.Tt(cn, r)) * np.asarray(free))

                bnorm = float(jnp.vdot(Bres * free, Bres * free))
                if it == 1:
                    resb = max(bnorm, 1e-300)
                res_rel = np.sqrt(bnorm / resb)
                if os.environ.get("FRONTISTR_TPU_DEBUG_NEWTON"):
                    print(f" dyn i={i} it={it} res={res_rel:.6e}",
                          flush=True)
                if cm is not None and os.environ.get(
                        "FRONTISTR_TPU_DEBUG_CONTACT"):
                    nact = int(cact.sum()) if (slag is not None and
                                               cn is not None) else -1
                    print(f" dyn i={i} cont={cont_it} it={it} "
                          f"act={nact} rel={int(cm.slag_released.sum())} "
                          f"gapmin={proj['gap'].min():.3e} "
                          f"res={res_rel:.3e}", flush=True)
                if it > 1 and res_rel < step.converg:
                    break

                if cm is not None and slag is not None:
                    dx = contact_solver(tuple(kes), B, dirichlet_inc, cn)
                elif cm is not None:
                    dx = contact_solver(tuple(kes), B, dirichlet_inc,
                                        cdofs_j, cke_j)
                else:
                    dx = solve_eff(tuple(kes), B, dirichlet_inc)
                du = du + dx
                new_states = []
                flats = []
                for p, s in zip(programs, states):
                    u_e = u.reshape(model.n_node, ndof)[p.block.conn]
                    ddu_e = du.reshape(model.n_node, ndof)[p.block.conn]
                    ns_, qf = p.update(u_e, ddu_e, s, t, dt)
                    new_states.append(ns_)
                    flats.append(qf.reshape(-1))
                states = new_states
                flats.append(jnp.zeros(ndof))
                flat = jnp.concatenate(flats)
                idx = inc_j[:, :, None] * ndof + \
                    jnp.arange(ndof)[None, None, :]
                Q = flat[idx].sum(axis=1).reshape(-1)
            if cm is None:
                break
            coords_def = model.coords + np.asarray(
                u + du).reshape(model.n_node, ndof)[:, :model.dim]
            proj = cm.search(coords_def)
            char = float(np.abs(model.coords).max()) or 1.0
            if slag is not None:
                # active-set scan at the converged pass
                # (fstr_scan_contact_state): release slots whose
                # converged contact pressure is tensile, re-activate
                # inactive slots that penetrated; re-run the pass if the
                # set changed or penetration remains
                lam_c = np.asarray(slag.lagrange(cn, B))
                scale = max(float(np.abs(lam_c).max()), 1.0)
                rel_new = cact & (lam_c < -1e-8 * scale)
                act_new = (~cact) & proj["touching"] & \
                    (proj["gap"] < -(cm.ntol if cm.ntol > 0 else 1e-5) * char)
                cm.slag_released |= rel_new
                cm.slag_released &= ~act_new
                live = proj["touching"] & ~cm.slag_released
                pen = float(np.maximum(-proj["gap"], 0.0)[live].max()) \
                    if live.any() else 0.0
                if not rel_new.any() and not act_new.any() and \
                        pen < (cm.ntol if cm.ntol > 0 else 1e-5) * char:
                    break
                continue
            # AL augmentation: update multipliers at the converged
            # config, stop when penetration is resolved AND multipliers
            # settled — freeing a separated slot (bounce-off) must
            # trigger another Newton pass or the step keeps the ghost
            # pressure and pumps energy into the rebound
            pen = float(np.maximum(-proj["gap"],
                                   0.0)[proj["touching"]].max()) \
                if proj["touching"].any() else 0.0
            lam_pre = cm.lam.copy()
            cm.augment(proj)
            dlam = float(np.abs(cm.lam - lam_pre).max()) \
                if cm.lam.size else 0.0
            if pen < (cm.ntol if cm.ntol > 0 else 1e-5) * char and dlam <= cm.kn * (cm.ntol if cm.ntol > 0 else 1e-5) * char:
                break
        # Newmark velocity/acceleration update
        acc_new = -a1 * acc - a2 * vel + a3 * du
        vel_new = -b1 * acc - b2 * vel + b3 * du
        acc, vel = acc_new, vel_new
        u = u + du
        states = [_commit_state(s) for s in states]
        mon.record(i, t, u, vel, acc)
        if on_interval is not None:
            on_interval(i, t, np.asarray(u), np.asarray(vel),
                        np.asarray(acc))
        if coupler is not None:
            # publish interface motion to the peer (fstr_rcap_send)
            coupler.publish_state(i, u, vel, acc)
        if restart_path and restart_freq > 0 and i % restart_freq == 0:
            from frontistr_tpu.io.restart import save_restart
            payload = dict(
                u=np.asarray(u), vel=np.asarray(vel), acc=np.asarray(acc),
                i=np.asarray(i),
                states=[{k: np.asarray(v) for k, v in s.items()}
                        for s in states])
            if cm is not None:
                payload["cm"] = dict(
                    lam=cm.lam, lam_t=cm.lam_t,
                    rel_prev=cm.rel_prev,
                    slag_released=cm.slag_released.astype(np.int8))
            save_restart(restart_path, payload)

    result = _finalize_dyn(model, programs, states, u, vel, acc, d.n_step,
                           log_path, monitors=mon.arrays())
    mon.write_files(log_path)
    return result


def _qforce_dyn(model, programs, states, u, du, inc_j, ndof):
    flats = []
    for p, s in zip(programs, states):
        u_e = u.reshape(model.n_node, ndof)[p.block.conn]
        ddu_e = du.reshape(model.n_node, ndof)[p.block.conn]
        _, qf = p.update(u_e, ddu_e, s)
        flats.append(qf.reshape(-1))
    flats.append(jnp.zeros(ndof))
    flat = jnp.concatenate(flats)
    idx = inc_j[:, :, None] * ndof + jnp.arange(ndof)[None, None, :]
    return flat[idx].sum(axis=1).reshape(-1)


def _run_explicit(model: StructModel, log_path, coupler=None,
                  on_interval=None):
    cfg = model.cfg
    d = cfg.dynamic
    ndof = model.ndof
    if ndof == 6:
        raise NotImplementedError(
            "explicit dynamics needs rotary inertia for 6-dof "
            "shell/beam models; use implicit (idx_eqa=1)")
    n = model.n_dof_total
    dt = d.t_delta
    a1 = 1.0 / (dt * dt)
    a2 = 1.0 / (2.0 * dt)
    mass = jnp.asarray(lumped_mass_vector(model))
    vec1 = (a1 + a2 * d.ray_m) * mass
    programs = [BlockPrograms(model, b) for b in model.blocks]
    states = [init_block_state(b, p.table)
              for b, p in zip(model.blocks, programs)]
    inc, total_en = femop.build_incidence([b.conn for b in model.blocks],
                                          model.n_node)
    inc_j = jnp.asarray(inc)
    free = jnp.asarray(old_ops.make_free_mask(n, model.fixed_dofs))
    amp_loads = _load_groups_with_amp(model.mesh, cfg, ndof, model.n_node)

    disp1 = jnp.zeros(n)          # u_n
    disp3 = jnp.zeros(n)          # u_{n-1}
    vel = jnp.zeros(n)
    acc = jnp.zeros(n)
    u = jnp.zeros(n)
    # initial velocity/acceleration (DYNAMIC_BC_INIT_VL/_AC): central
    # difference seeds u_{-1} = -dt v0 + dt^2/2 a0
    make_amp = _amp_factory(model.mesh, cfg)
    v_init, v_tr = _rate_bc_split(model, cfg.velocities, make_amp)
    a_init, a_tr = _rate_bc_split(model, cfg.accelerations, make_amp)
    if model.mesh.equations:
        # parity: the reference explicit solver has no MPC path either
        # (no hecmw_mat_ass_equation call in fstr_dynamic_nlexplicit)
        print("### WARNING: !EQUATION not applied in EXPLICIT dynamics "
              "(no solve to eliminate through); constraints IGNORED")
    if v_init is not None:
        vel = vel.at[jnp.asarray(v_init[0])].set(jnp.asarray(v_init[1]))
        disp3 = disp3 - dt * vel
    if a_init is not None:
        acc = acc.at[jnp.asarray(a_init[0])].set(jnp.asarray(a_init[1]))
        disp3 = disp3 + (0.5 * dt * dt) * acc
    vec1 = jnp.where(vec1 * free == 0.0, 1.0, vec1)
    Q = jnp.zeros(n)

    mon = _Monitor(model, d)
    ray_m = d.ray_m

    def _step_core(disp1, disp3, Q, states_c, t, f_ext):
        """One central-difference step, fully traced (shared by the
        lax.scan arm and the eager fallback)."""
        B = f_ext - Q + 2.0 * a1 * mass * disp1 + \
            (-a1 + a2 * ray_m) * mass * disp3
        X = jnp.where(free > 0, B / vec1, 0.0)
        # prescribed-rate Dirichlet (dynamic_mat_ass_bc_vl/_ac explicit
        # branches): u_{n+1} = u_{n-1} + 2 dt v / 2 u_n - u_{n-1} + dt^2 a
        if v_tr is not None:
            vfac = (jnp.interp(t, *_amp_tab(model.mesh, v_tr[3]))
                    if _amp_tab(model.mesh, v_tr[3]) is not None else 1.0)
            vdix = jnp.asarray(v_tr[0])
            X = X.at[vdix].set(disp3[vdix] +
                               (2.0 * dt * vfac) * jnp.asarray(v_tr[1]))
        if a_tr is not None:
            afac = (jnp.interp(t, *_amp_tab(model.mesh, a_tr[3]))
                    if _amp_tab(model.mesh, a_tr[3]) is not None else 1.0)
            adix = jnp.asarray(a_tr[0])
            X = X.at[adix].set(2.0 * disp1[adix] - disp3[adix] +
                               (dt * dt * afac) * jnp.asarray(a_tr[1]))
        acc_s = a1 * (X - 2.0 * disp1 + disp3)
        vel_s = a2 * (X - disp3)
        # one stress/state update per step (fstr_dynamic_nlexplicit:278-296)
        du = X - disp1
        new_states, flats = [], []
        for p, s in zip(programs, states_c):
            u_e = disp1.reshape(model.n_node, ndof)[p.block.conn]
            ddu_e = du.reshape(model.n_node, ndof)[p.block.conn]
            ns_, qf = p.update(u_e, ddu_e, s, t, dt)
            new_states.append(_commit_state(ns_))
            flats.append(qf.reshape(-1))
        flats.append(jnp.zeros(ndof))
        flat = jnp.concatenate(flats)
        idx = inc_j[:, :, None] * ndof + jnp.arange(ndof)[None, None, :]
        Q_new = flat[idx].sum(axis=1).reshape(-1)
        return X, acc_s, vel_s, Q_new, new_states

    use_scan = (coupler is None and on_interval is None
                and os.environ.get("FRONTISTR_TPU_EXPLICIT_SCAN",
                                   "1") != "0")
    if use_scan:
        # TPU-native time integrator: the whole step train is ONE
        # lax.scan program — explicit runs are dispatch-bound (a tiny
        # mass division + element update per step, thousands of steps;
        # each eager step is ~15 dispatch round-trips on the remote-TPU
        # tunnel).  External force is re-expressed as static per-card
        # vectors scaled by traced jnp.interp amplitude factors.
        from frontistr_tpu.assembly.loads import collect_dload
        fvecs, ftabs = [], []
        for c in cfg.cloads:
            fvecs.append(jnp.asarray(collect_cload(
                model.mesh, [c], ndof, model.n_node)))
            ftabs.append(_amp_tab(model.mesh, c.param("AMP", "")))
        for c in cfg.dloads:
            fvecs.append(jnp.asarray(collect_dload(model.mesh, model,
                                                   [c])))
            ftabs.append(_amp_tab(model.mesh, c.param("AMP", "")))
        midx = mon.idx

        def _scan_step(carry, i):
            disp1, disp3, Q, _, _, states_c = carry
            t = dt * i
            f_ext = jnp.zeros(n)
            for fv, tab in zip(fvecs, ftabs):
                fac = jnp.interp(t, *tab) if tab is not None else 1.0
                f_ext = f_ext + fv * fac
            X, acc_s, vel_s, Q_new, ns = _step_core(
                disp1, disp3, Q, states_c, t, f_ext)
            if midx is not None:
                k = midx * ndof
                ys = (jax.lax.dynamic_slice(X, (k,), (ndof,)),
                      jax.lax.dynamic_slice(vel_s, (k,), (ndof,)),
                      jax.lax.dynamic_slice(acc_s, (k,), (ndof,)))
            else:
                ys = ()
            return (X, disp1, Q_new, vel_s, acc_s, ns), ys

        steps = jnp.arange(1, d.n_step + 1, dtype=jnp.float64)
        (disp1, disp3, Q, vel, acc, states), ys = jax.lax.scan(
            _scan_step, (disp1, disp3, Q, vel, acc, list(states)),
            steps)
        u = disp1
        if mon.idx is not None and d.n_step >= 1:
            us, vs, accs = (np.asarray(y) for y in ys)
            for i in range(1, d.n_step + 1):
                if i % mon.every == 0:
                    mon.rows.append((i, dt * i, us[i - 1], vs[i - 1],
                                     accs[i - 1]))
    else:
        for i in range(1, d.n_step + 1):
            t = dt * i
            f_ext = jnp.asarray(_external_force(model, t, amp_loads))
            if coupler is not None:
                f_ext = f_ext + jnp.asarray(coupler.traction_force(i))
            X, acc, vel, Q, states = _step_core(disp1, disp3, Q,
                                                list(states), t, f_ext)
            disp3 = disp1
            disp1 = X
            u = X
            mon.record(i, t, u, vel, acc)
            if on_interval is not None:
                on_interval(i, t, np.asarray(u), np.asarray(vel),
                            np.asarray(acc))
            if coupler is not None:
                coupler.publish_state(i, u, vel, acc)

    result = _finalize_dyn(model, programs, states, u, vel, acc, d.n_step,
                           log_path, monitors=mon.arrays())
    mon.write_files(log_path)
    return result


class _Monitor:
    """Per-step monitoring-node history (dynamic_output_monit,
    dynamic_output.f90:354-431): record u/v/a of node `node_monit_1`
    every `nout_monit` steps; emit dyna_disp/velo/acce.out next to the
    log with the reference line layout (step, t, global id, components)."""

    def __init__(self, model, d):
        self.model = model
        self.gid = int(getattr(d, "node_monit_1", 0) or 0)
        self.every = max(int(getattr(d, "nout_monit", 1) or 1), 1)
        self.idx = model.mesh.id2idx.get(self.gid) if self.gid else None
        self.rows = []

    def record(self, i, t, u, vel, acc):
        if self.idx is None or i % self.every:
            return
        nd = self.model.ndof
        k = self.idx
        self.rows.append((
            i, t,
            np.asarray(u).reshape(-1, nd)[k].copy(),
            np.asarray(vel).reshape(-1, nd)[k].copy(),
            np.asarray(acc).reshape(-1, nd)[k].copy()))

    def arrays(self):
        if not self.rows:
            return {}
        return {"step": np.asarray([r[0] for r in self.rows]),
                "time": np.asarray([r[1] for r in self.rows]),
                "disp": np.stack([r[2] for r in self.rows]),
                "velo": np.stack([r[3] for r in self.rows]),
                "acce": np.stack([r[4] for r in self.rows])}

    def write_files(self, log_path):
        if not self.rows or not log_path:
            return
        base = os.path.dirname(os.path.abspath(log_path))
        for name, col in (("dyna_disp", 2), ("dyna_velo", 3),
                          ("dyna_acce", 4)):
            with open(os.path.join(base, f"{name}.out"), "w") as fh:
                for r in self.rows:
                    vals = "".join(f"{v:13.4E}" for v in r[col])
                    fh.write(f"{r[0]:10d}{r[1]:13.4E}{self.gid:10d}"
                             f"{vals}\n")


def _finalize_dyn(model, programs, states, u, vel, acc, steps, log_path,
                  monitors=None):
    from frontistr_tpu.analysis.nonlinear import _postprocess
    res = _postprocess(model, programs, states, jnp.asarray(u))
    out = DynamicResult(u=np.asarray(u).reshape(model.n_node, model.ndof),
                        vel=np.asarray(vel).reshape(model.n_node,
                                                    model.ndof),
                        acc=np.asarray(acc).reshape(model.n_node,
                                                    model.ndof),
                        steps=steps, monitors=monitors or {}, final=res)
    if log_path:
        _write_dyn_log(log_path, model, out, steps)
    return out


def _write_dyn_log(path, model, out, step):
    """New-format summary incl. velocity/acceleration (dynamic_output.f90)."""
    import numpy as np
    from frontistr_tpu.io import logio
    res = out.final
    dim = model.dim
    sel = res.node_count > 0
    names, arrs = [], []
    for dname, a in (("U", out.u), ("V", out.vel), ("A", out.acc)):
        for k in range(dim):
            names.append(f"{dname}{k+1}")
            arrs.append(a[sel, k])
    for k, lab in enumerate(logio.LABELS_E[dim]):
        names.append(lab)
        arrs.append(res.nodal_strain[sel, k])
    for k, lab in enumerate(logio.LABELS_S[dim]):
        names.append(lab)
        arrs.append(res.nodal_stress[sel, k])
    names.append("SMS")
    arrs.append(res.nodal_mises[sel])
    ids = model.mesh.node_ids[sel]
    with open(path, "w") as f:
        f.write(f"#### Result step={step:6d}\n")
        f.write(" ##### Global Summary @Node    :Max/IdMax/Min/IdMin####\n")
        for nm, a in zip(names, arrs):
            imax, imin = int(np.argmax(a)), int(np.argmin(a))
            f.write(f" //{nm:<5s}{a[imax]: .4E} {int(ids[imax]):9d} "
                    f"{a[imin]: .4E} {int(ids[imin]):9d}\n")
