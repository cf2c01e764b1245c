"""Linear static analysis driver.

The TPU equivalent of the kstSTATIC path: assemble -> apply BC -> Krylov
solve -> stress recovery (fstr_static_analysis,
fistr1/src/main/fistr_main.f90:288 with a single linear step).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frontistr_tpu.assembly.model import StructModel
from frontistr_tpu.assembly import operators as ops
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.post import nodal as postnodal
from frontistr_tpu.solver import cg as krylov


@dataclasses.dataclass
class StaticResult:
    u: np.ndarray                      # (n_node, ndof)
    nodal_strain: np.ndarray
    nodal_stress: np.ndarray
    nodal_mises: np.ndarray
    elem_strain: np.ndarray            # concatenated over blocks
    elem_stress: np.ndarray
    elem_mises: np.ndarray
    elem_ids: np.ndarray
    iters: int
    relres: float
    solve_time: float = 0.0
    assemble_time: float = 0.0
    node_count: np.ndarray = None      # elements touching each node
    reaction: np.ndarray = None        # (n_node, ndof) internal force
    #   at the converged state (fstrSOLID%REACTION,
    #   static_make_result.f90:97-102)


def compute_element_stiffness(model: StructModel):
    """Batched element stiffness per block (linear elastic)."""
    kes = []
    for b in model.blocks:
        coords_e = jnp.asarray(model.coords[b.conn])
        if b.kind == "shell":
            from frontistr_tpu.fem import shell
            ke = shell.stiffness_shell(coords_e, b.thick,
                                       b.material.youngs,
                                       b.material.poisson, etype=b.etype)
            kes.append(ke)
            continue
        if b.kind == "sshell":
            from frontistr_tpu.fem import shell
            nn2 = b.conn.shape[1] // 2
            ke = shell.stiffness_solid_shell(
                coords_e[:, :nn2, :], b.thick, b.material.youngs,
                b.material.poisson, etype=b.etype)
            kes.append(ke)
            continue
        if b.kind in ("beam", "beam341"):
            from frontistr_tpu.fem import beam
            sec = model.mesh.sections[b.sect_id] \
                if model.mesh.sections else None
            sect = sec.values if sec and len(sec.values) >= 7 else \
                [0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0]
            ax = model.coords[b.conn[:, 1]] - model.coords[b.conn[:, 0]]
            ax = ax / np.linalg.norm(ax, axis=1, keepdims=True)
            if (np.linalg.norm(np.cross(np.asarray(sect[:3]), ax),
                               axis=1) < 1e-8).any():
                raise ValueError(
                    "Bad reference vector for beam element (parallel to "
                    "the beam axis) -- check !SECTION TYPE=BEAM")
            ke = beam.stiffness_beam(coords_e, sect, b.material.youngs,
                                     b.material.poisson, etype=b.etype)
            kes.append(ke)
            continue
        table = get_table(b.etype)
        if b.etype == 361 and b.formulation == "IC":
            ke = solid.stiffness_hex8ic(table, coords_e, jnp.asarray(b.D))
        elif b.etype == 361 and b.formulation == "FBAR":
            ke = solid.stiffness_hex8fbar(table, coords_e,
                                          jnp.asarray(b.D))
        else:
            ke = solid.stiffness_linear(table, coords_e, jnp.asarray(b.D),
                                        thick=b.thick)
        kes.append(ke)
    return kes


from functools import partial


def _amg_or_jacobi(eop, amaps, coords):
    """V-cycle preconditioner when maps are provided, else block-Jacobi.
    Trace-safe: amaps/coords arrive as pytree args of the enclosing jit."""
    from frontistr_tpu.solver import amg as amgmod
    if amaps is None:
        return eop.block_jacobi()
    return amgmod.setup_amg(amaps, eop.blocks, eop.cols,
                            coords.astype(eop.blocks.dtype),
                            eop.free_mask, eop.apply_constrained,
                            eop.block_jacobi())


def _amg_or_jacobi_cluster(cop, sblocks, scols, amaps, coords):
    """Same, for the cluster operator: Galerkin maps come from the
    extracted scalar blocks; smoother matvecs use the fast cluster op."""
    from frontistr_tpu.solver import amg as amgmod
    if amaps is None:
        return cop.block_jacobi()
    return amgmod.setup_amg(amaps, sblocks, scols,
                            coords.astype(cop.blocks.dtype),
                            cop.free_mask, cop.apply_constrained,
                            cop.block_jacobi())


@partial(jax.jit,
         static_argnames=("tol", "inner_tol", "maxiter", "hist_len"))
def _mixed_cluster_solve(op, cop32, sb32, scols, amaps, coords, b_c,
                         tol, inner_tol, maxiter, hist_len=0):
    """f32 cluster-ELL CG + f64 gather-op refinement (the default
    unstructured hot path: ~7 ms/matvec at 1M-dof tet vs 38 ms scalar
    ELL).  All operators/maps are pytree ARGS."""
    from frontistr_tpu.solver.mixed import refined_cg
    M32 = _amg_or_jacobi_cluster(cop32, sb32, scols, amaps, coords)
    return refined_cg(op.apply_constrained, cop32.apply_constrained,
                      M32, b_c, tol=tol, inner_tol=inner_tol,
                      maxiter=maxiter, hist_len=hist_len)


@partial(jax.jit, static_argnames=("tol", "maxiter", "hist_len"))
def _cg_cluster_solve(cop, sb, scols, amaps, coords, b_c, tol, maxiter,
                      hist_len=0):
    M = _amg_or_jacobi_cluster(cop, sb, scols, amaps, coords)
    return krylov.pcg(cop.apply_constrained, b_c, M=M, tol=tol,
                      maxiter=maxiter, hist_len=hist_len)


@partial(jax.jit,
         static_argnames=("tol", "inner_tol", "maxiter", "hist_len"))
def _mixed_ell_solve(op, eop32, amaps, coords, b_c, tol, inner_tol,
                     maxiter, hist_len=0):
    """f32 ELL-CG + f64 gather-op refinement.  All operators/maps are
    pytree ARGS — nothing big is closed over (closure arrays get inlined
    as module literals: HTTP 413 at 1M dof on the remote-compile path)."""
    from frontistr_tpu.solver.mixed import refined_cg
    M32 = _amg_or_jacobi(eop32, amaps, coords)
    return refined_cg(op.apply_constrained, eop32.apply_constrained,
                      M32, b_c, tol=tol, inner_tol=inner_tol,
                      maxiter=maxiter, hist_len=hist_len)


@partial(jax.jit,
         static_argnames=("tol", "inner_tol", "maxiter", "hist_len"))
def _mixed_structured_solve(sop, sop32, b_c, tol, inner_tol, maxiter,
                            hist_len=0):
    from frontistr_tpu.solver.mixed import refined_cg
    return refined_cg(sop.apply_constrained, sop32.apply_constrained,
                      sop32.block_jacobi(), b_c, tol=tol,
                      inner_tol=inner_tol, maxiter=maxiter,
                      hist_len=hist_len)


@partial(jax.jit, static_argnames=("method", "tol", "maxiter", "hist_len"))
def _krylov_ell_solve(eop, amaps, coords, b_c, method, tol, maxiter,
                      hist_len=0):
    M = _amg_or_jacobi(eop, amaps, coords) \
        if method.upper() in ("CG", "1") else eop.block_jacobi()
    return krylov.solve(method, eop.apply_constrained, b_c, M=M,
                        tol=tol, maxiter=maxiter, hist_len=hist_len)


def print_iterlog(res) -> None:
    """Emit the reference's ITERLOG lines (hecmw_solver_CG.f90:245
    ``write (*,'(i7, 1pe16.6)') ITER, RESID``) from the on-device
    residual history recorded inside the jitted Krylov loop."""
    hist = getattr(res, "hist", None)
    if hist is None:
        return
    h = np.asarray(hist).reshape(-1)
    it = 0
    for r in h:
        if r < 0:
            continue
        it += 1
        print(f"{it:7d} {r:16.6E}")


def print_timelog(t_setup: float, t_solve: float) -> None:
    """Reference TIMELOG shape (hecmw_solver_CG.f90:131-145 prints
    setup/iteration wall times; single-chip: no rank statistics)."""
    print(" Time solver setup")
    print(f"   Total   : {t_setup:.6f}")
    print(" Time solver iterations")
    print(f"   Total   : {t_solve:.6f}")


def _solve_policy() -> str:
    """'f64' (CPU: native f64 Krylov) or 'mixed' (TPU: f32 CG + f64
    refinement).  Override with FRONTISTR_TPU_PRECISION=f64|mixed."""
    import os
    pol = os.environ.get("FRONTISTR_TPU_PRECISION", "auto")
    if pol in ("f64", "mixed"):
        return pol
    return "mixed" if jax.default_backend() not in ("cpu",) else "f64"


def solve_linear(model: StructModel, kes=None,
                 f_ext: Optional[np.ndarray] = None):
    """Assemble + constrained Krylov solve; returns (u flat, iters, relres)."""
    from frontistr_tpu.assembly import femop
    from frontistr_tpu.solver.mixed import refined_cg
    t0 = time.perf_counter()
    if kes is None:
        kes = compute_element_stiffness(model)
    n = model.n_dof_total
    u_fix = jnp.asarray(ops.full_fixed_vector(n, model.fixed_dofs,
                                              model.fixed_vals))
    f = jnp.asarray(model.f_ext if f_ext is None else f_ext)

    # multi-chip path (FRONTISTR_TPU_SHARDS): GSPMD-sharded block-ELL CG
    from frontistr_tpu.parallel import shard as shardmod
    nsh = shardmod.requested_shards()
    if nsh and model.cfg.solver.method.upper() in ("CG", "1"):
        # !EQUATION rides the sharded arm too (exact elimination with
        # pytree-arg mpc tables, same as the sharded heat solver)
        t1 = time.perf_counter()
        x, iters, relres = shardmod.sharded_solve_linear(
            model, kes, np.asarray(f), np.asarray(u_fix), nsh,
            mixed=_solve_policy() == "mixed")
        t2 = time.perf_counter()
        return x, iters, relres, t1 - t0, t2 - t1

    op = femop.from_model(model, kes)
    b_c = op.constrained_rhs(f, u_fix)

    from frontistr_tpu.assembly.extras import MPCEliminator
    mpc = MPCEliminator(model.mesh, model.ndof, n)
    A = mpc.wrap(op.apply_constrained) if mpc.active \
        else op.apply_constrained
    if mpc.active:
        b_c = mpc.reduce_rhs(op.apply_constrained, b_c) + \
            (1.0 - mpc.dep_mask) * 0.0

    sv = model.cfg.solver
    hl = 2000 if sv.iterlog else 0
    if (sv.dumptype or "NONE").upper() not in ("NONE", "", "0"):
        # !SOLVER DUMPTYPE=MM|CSR (hecmw_matrix_dump.f90)
        from frontistr_tpu.assembly import ell as _ell
        from frontistr_tpu.solver.dump import dump_operator
        _eop = _ell.from_model(model, kes)
        p = dump_operator(np.asarray(_eop.blocks),
                          np.asarray(_eop.cols), model.ndof,
                          sv.dumptype)
        print(f"### matrix dumped: {p}")
    # gather-free stencil operator for structured hex boxes (TPU gathers
    # run ~0.6 GB/s; strided slices stream at HBM bandwidth)
    sop = None
    if (getattr(model.mesh, "structured", None) is not None
            and len(model.blocks) == 1 and model.blocks[0].etype == 361
            and model.blocks[0].kind == "solid" and not model.extras[0]
            and not mpc.active):
        from frontistr_tpu.assembly.structured import (
            StructuredHexOperator, soa_from_blocks)
        nxyz = model.mesh.structured
        keT = soa_from_blocks(jnp.asarray(kes[0]))
        sop = StructuredHexOperator(*nxyz, keT, op.free_mask)
    t1 = time.perf_counter()
    if sv.method.upper() in ("DIRECT", "DIRECTMKL", "MUMPS", "MKL",
                             "DIRECTLAG"):
        from frontistr_tpu.solver.direct import solve_direct
        x = solve_direct(op, np.asarray(f), np.asarray(u_fix))
        if mpc.active:
            x = np.asarray(mpc.recover(jnp.asarray(x)))
        t2 = time.perf_counter()
        return x, 1, 0.0, t1 - t0, t2 - t1
    import os
    if os.environ.get("FRONTISTR_TPU_PRECOND", "") == "cheby" \
            and not mpc.active:
        # polynomial (Chebyshev) preconditioner: the TPU-native stand-in
        # for the reference's sequential SSOR/BILU sweeps; opt-in (it
        # trades dots for matvecs and only wins on stiff spectra)
        from frontistr_tpu.solver.cheby import (estimate_lmax,
                                                chebyshev_precond)
        lmax = estimate_lmax(op.apply_constrained, op.block_jacobi(), n)
        MC = chebyshev_precond(op.apply_constrained, op.block_jacobi(),
                               lmax)
        res = krylov.solve(sv.method, A, b_c, M=MC, tol=sv.resid,
                           maxiter=sv.nier)
    elif _solve_policy() == "mixed" and sv.method.upper() == "CG" \
            and not mpc.active:
        if sop is not None:
            sop32 = dataclasses.replace(
                sop, keT=sop.keT.astype(jnp.float32),
                free_mask=sop.free_mask.astype(jnp.float32))
            res = _mixed_structured_solve(sop, sop32, b_c, tol=sv.resid,
                                          inner_tol=1e-6,
                                          maxiter=sv.nier, hist_len=hl)
        else:
            # assembled cluster-ELL f32 operator for the CG hot loop
            # (~7 ms/matvec at 1M-dof tet vs 404 ms incidence-gather);
            # f64 true residuals still go through the gather operator.
            # AMG V-cycle preconditioner when the problem is big enough.
            from frontistr_tpu.assembly import bell, ell
            from frontistr_tpu.solver import amg as amgmod
            prof = ell.profile_from_model(model)
            amaps = amgmod.eligible_maps(prof, model.n_dof_total)
            cprof = bell.cluster_profile_from_model(model, scalar=prof)
            if amaps is not None:
                cop32, sb32 = bell.from_model(
                    model, kes, dtype=jnp.float32, profile=cprof,
                    want_scalar=True, scalar=prof)
            else:
                cop32 = bell.from_model(model, kes, dtype=jnp.float32,
                                        profile=cprof)
                sb32 = None
            res = _mixed_cluster_solve(op, cop32, sb32,
                                       prof.device().cols, amaps,
                                       jnp.asarray(model.coords), b_c,
                                       tol=sv.resid, inner_tol=1e-6,
                                       maxiter=sv.nier, hist_len=hl)
    else:
        if sop is None and not mpc.active \
                and sv.method.upper() in ("CG", "1"):
            from frontistr_tpu.assembly import bell, ell
            from frontistr_tpu.solver import amg as amgmod
            prof = ell.profile_from_model(model)
            amaps = amgmod.eligible_maps(prof, model.n_dof_total)
            cprof = bell.cluster_profile_from_model(model, scalar=prof)
            if amaps is not None:
                cop, sb = bell.from_model(model, kes, profile=cprof,
                                          want_scalar=True, scalar=prof)
            else:
                cop = bell.from_model(model, kes, profile=cprof)
                sb = None
            res = _cg_cluster_solve(cop, sb, prof.device().cols, amaps,
                                    jnp.asarray(model.coords), b_c,
                                    tol=sv.resid, maxiter=sv.nier,
                                    hist_len=hl)
        elif sop is None and not mpc.active:
            from frontistr_tpu.assembly import ell
            prof = ell.profile_from_model(model)
            eop = ell.from_model(model, kes, profile=prof)
            res = _krylov_ell_solve(eop, None,
                                    jnp.asarray(model.coords), b_c,
                                    method=sv.method, tol=sv.resid,
                                    maxiter=sv.nier, hist_len=hl)
        else:
            Mj = (sop or op).block_jacobi()
            res = krylov.solve(sv.method,
                               sop.apply_constrained if sop is not None
                               else A, b_c,
                               M=Mj, tol=sv.resid,
                               maxiter=sv.nier)
    x_sol = mpc.recover(res.x) if mpc.active else res.x
    x = np.asarray(jax.block_until_ready(x_sol))
    t2 = time.perf_counter()
    if sv.iterlog:
        print_iterlog(res)
    if sv.timelog:
        print_timelog(t1 - t0, t2 - t1)
    if sv.estcond:
        # ESTCOND option (hecmw_solver_CG.f90:89): report the estimated
        # condition number of the preconditioned operator
        from frontistr_tpu.solver.cond import estimate_condition
        cond = estimate_condition(A, n, M=op.block_jacobi())
        print(f"### Condition number estimate (precond K): {cond:.4e}")
    return x, int(res.iters), float(res.relres), t1 - t0, t2 - t1


def recover_stress(model: StructModel, u_flat: np.ndarray):
    """Gauss strain/stress + nodal smoothing + element means."""
    u = u_flat.reshape(model.n_node, model.ndof)
    if any(b.kind == "shell" for b in model.blocks):
        from frontistr_tpu.post.shellpost import shell_recover
        return u, shell_recover(model, u), []
    if all(b.kind in ("beam", "beam341", "sshell")
           for b in model.blocks):
        # beam fiber strain/stress at the 6 section positions
        # (NodalStress_Beam_641, static_LIB_beam.f90:646-980)
        n, ns = model.n_node, 6
        nd_strain = np.zeros((n, ns))
        nd_stress = np.zeros((n, ns))
        count = np.zeros(n)
        estrain, estress, emises = [], [], []
        for b in model.blocks:
            Eb = len(b.elem_ids)
            if b.kind != "beam341" or b.etype != 641:
                estrain.append(np.zeros((Eb, ns)))
                estress.append(np.zeros((Eb, ns)))
                emises.append(np.zeros(Eb))
                continue
            from frontistr_tpu.fem import beam as beammod
            sec = model.mesh.sections[b.sect_id] \
                if model.mesh.sections else None
            sect = sec.values if sec and len(sec.values) >= 7 else \
                [0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0]
            # radius + 6 angles from the extended !MATERIAL ELASTIC row
            # (fstr_get_prop.f90:91-99)
            radius, angles = 0.0, None
            try:
                row = model.mesh.materials[sec.material].items[1][0]
                if len(row) >= 9:
                    radius = float(row[2])
                    angles = [float(v) for v in row[3:9]]
            except Exception:
                pass
            de = jnp.asarray(u[b.conn])
            nds, ndt, es, et = beammod.nqm_beam_641(
                jnp.asarray(model.coords[b.conn]), sect,
                b.material.youngs, de, radius=radius, angles=angles)
            estrain.append(es)
            estress.append(et)
            emises.append(np.abs(et).max(axis=1))
            # nodal average over the two end nodes
            for ln in range(2):
                np.add.at(nd_strain, b.conn[:, ln], nds[:, ln])
                np.add.at(nd_stress, b.conn[:, ln], ndt[:, ln])
                np.add.at(count, b.conn[:, ln], 1.0)
        nz = count > 0
        nd_strain[nz] /= count[nz, None]
        nd_stress[nz] /= count[nz, None]
        sm = dict(strain=nd_strain, stress=nd_stress,
                  mises=np.abs(nd_stress).max(axis=1),
                  count=np.maximum(count, 1.0),
                  estrain=estrain, estress=estress, emises=emises)
        return u, sm, []
    block_data = []
    for b in model.blocks:
        if b.kind != "solid":
            ns = 6 if model.dim == 3 else 4
            block_data.append(dict(
                etype=b.etype, conn=b.conn[:, :0],
                gauss_strain=np.zeros((len(b.elem_ids), 1, ns)),
                gauss_stress=np.zeros((len(b.elem_ids), 1, ns)),
                skip=True))
            continue
        table = get_table(b.etype)
        coords_e = jnp.asarray(model.coords[b.conn])
        u_e = jnp.asarray(u[b.conn])
        if b.etype == 361 and b.formulation == "IC":
            eps = solid.strains_at_gauss_hex8ic(table, coords_e, u_e,
                                                jnp.asarray(b.D))
        else:
            eps = solid.strains_at_gauss(table, coords_e, u_e)  # (E,nq,ns)
        eps_el = eps
        if model.temperature is not None:
            from frontistr_tpu.assembly.loads import thermal_strains
            eps_el = eps - jnp.asarray(
                thermal_strains(model, b, model.temperature))
        if b.D.ndim == 4:
            sig = jnp.einsum("eqkl,eql->eqk", jnp.asarray(b.D), eps_el)
        else:
            sig = jnp.einsum("ekl,eql->eqk", jnp.asarray(b.D), eps_el)
        block_data.append(dict(etype=b.etype, conn=b.conn,
                               gauss_strain=np.asarray(eps),
                               gauss_stress=np.asarray(sig)))
    sm = postnodal.smooth(model.n_node, block_data, model.dim)
    return u, sm, block_data


def run_linear_static(model: StructModel) -> StaticResult:
    from frontistr_tpu.assembly import femop
    kes = compute_element_stiffness(model)
    u_flat, iters, relres, t_asm, t_slv = solve_linear(model, kes=kes)
    u, sm, _ = recover_stress(model, u_flat)
    elem_ids = np.concatenate([b.elem_ids for b in model.blocks])
    op = femop.from_model(model, kes)
    reaction = np.asarray(op.matvec(jnp.asarray(u_flat))).reshape(
        model.n_node, model.ndof) - np.asarray(
        model.f_ext).reshape(model.n_node, model.ndof)
    return StaticResult(
        u=u,
        nodal_strain=sm["strain"], nodal_stress=sm["stress"],
        nodal_mises=sm["mises"], node_count=sm["count"],
        elem_strain=np.concatenate(sm["estrain"]),
        elem_stress=np.concatenate(sm["estress"]),
        elem_mises=np.concatenate(sm["emises"]),
        elem_ids=elem_ids, iters=iters, relres=relres,
        assemble_time=t_asm, solve_time=t_slv, reaction=reaction)
