"""Incompressible-flow driver for u-p tet meshes (element 3414).

TPU rebuild of the reference's fluid arm: !SOLUTION TYPE=DYNAMIC +
!DYNAMIC TYPE=NONLINEAR on a 3414 mesh runs the semi-implicit SUPG/PSPG
Navier-Stokes stepper (fstr_dynamic_nlimplicit.f90:100-210 with the
3414 special cases of dynamic_mat_ass_load.f90:240-330 and zero mass,
fstr_EIG_setMASS.f90:119).  Per time step the linearized system
K(v_n) d(dv) = r is solved with BiCGSTAB (the K blocks are
nonsymmetric: advection + SUPG), where r = b(v_n) - K (v_n + dv).

TPU design: element matrices are one batched einsum kernel
(fem/fluid.py), the global operator is the same block-ELL pytree used
by the solid path (ndof=4 blocks), and the step solve is jitted once
and streamed new (K, B, v) operands."""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import fluid as flib
from frontistr_tpu.assembly import ell
from frontistr_tpu.assembly.model import collect_boundary
from frontistr_tpu.solver.cg import bicgstab


@dataclasses.dataclass
class FlowResult:
    v: np.ndarray            # (n_node, 4) velocity + pressure
    steps: int
    iters: int
    resid: float
    strain: Optional[np.ndarray] = None   # (E, 6) cell-avg strain rate
    stress: Optional[np.ndarray] = None   # (E, 6) cell-avg Cauchy stress


def _fluid_props(cfg, mesh):
    """viscosity from !FLUID TYPE=INCOMP_NEWTONIAN, rho from !DENSITY
    (fstr_ctrl_get_FLUID, fstr_ctrl_material.f90:660-706)."""
    mu, rho = 1.0e-3, 1.0e3
    for m in getattr(cfg, "materials", []):
        if getattr(m, "fluid", None) is not None:
            if m.fluid.data:
                mu = float(m.fluid.data[0][0])
            if getattr(m, "density", None) is not None and m.density.data:
                rho = float(m.density.data[0][0])
            return mu, rho
    return mu, rho


@partial(jax.jit, static_argnames=("dt",))
def _elem_step(profile, coords, conn, v, mu, rho, dt):
    """K blocks + assembled explicit RHS for one time step."""
    table = get_table(3414)
    x = coords[conn]
    K, b = flib.stf_load_c3_vp(table, x, v[conn], mu, rho, dt)
    blocks = ell.assemble_blocks(profile, [K], [4])
    n = coords.shape[0]
    B = jnp.zeros(n * 4, b.dtype)
    dof = (conn[:, :, None] * 4
           + jnp.arange(4)[None, None, :]).reshape(-1)
    B = B.at[dof].add(b.reshape(-1))
    return blocks, B


@jax.jit
def _residual(op: ell.ELLOperator, B, vtot):
    r = B - op.matvec(vtot)
    return r * op.free_mask


def run_flow(mesh, cfg, workdir=None, log_path=None,
             n_step: Optional[int] = None):
    blk = next(b for b in mesh.blocks if b.etype == 3414)
    conn = np.asarray(blk.conn, np.int64)
    n_node = mesh.n_node
    dyn = cfg.dynamic
    dt = float(dyn.t_delta) if dyn is not None else 1.0
    steps = int(n_step if n_step is not None
                else (dyn.n_step if dyn is not None else 1))
    step0 = cfg.steps[0] if getattr(cfg, "steps", None) else None
    max_iter = step0.max_iter if step0 is not None else 20
    converg = step0.converg if step0 is not None else 1e-8
    mu, rho = _fluid_props(cfg, mesh)

    fixed_dofs, fixed_vals = collect_boundary(mesh, cfg.boundaries, 4)
    if not np.any(fixed_dofs % 4 == 3):
        # no pressure BC: pin the gauge (constant-pressure nullspace
        # would break the Krylov solve; velocity is unaffected)
        fixed_dofs = np.append(fixed_dofs, 3)
        fixed_vals = np.append(fixed_vals, 0.0)
    free = np.ones(n_node * 4)
    free[fixed_dofs] = 0.0

    prof = ell.build_profile([conn], n_node, 4)
    prof_d = prof.device()
    coords_j = jnp.asarray(mesh.coords)
    conn_j = jnp.asarray(conn)
    free_j = jnp.asarray(free)

    v = np.zeros(n_node * 4)
    v[fixed_dofs] = fixed_vals            # BC-substituted start field
    v_j = jnp.asarray(v)

    sv = cfg.solver
    tol = float(getattr(sv, "resid", 1e-8) or 1e-8)
    total_iters = 0
    resid = 0.0
    for step in range(1, steps + 1):
        blocks, B = _elem_step(prof_d, coords_j, conn_j,
                               v_j.reshape(n_node, 4), mu, rho, dt)
        op = ell.ELLOperator(blocks=blocks, cols=prof_d.cols,
                             diag_slot=prof_d.diag_slot, n_node=n_node,
                             ndof=4, free_mask=free_j)
        M = op.block_jacobi()
        dv = jnp.zeros_like(v_j)
        bscale = float(jnp.linalg.norm(B * free_j)) or 1.0
        for it in range(max_iter):
            r = _residual(op, B, v_j + dv)
            resid = float(jnp.linalg.norm(r)) / bscale
            if resid <= max(converg, 1e-14):
                break
            res = bicgstab(op.apply_constrained, r, M=M, tol=tol,
                           maxiter=int(getattr(sv, "nier", 10000)
                                       or 10000))
            dv = dv + res.x
            total_iters += 1
        v_j = v_j + dv
        if log_path and (step % max(1, int(getattr(dyn, "nout", 100)
                                          or 100)) == 0 or step == steps):
            with open(log_path, "a") as f:
                f.write(f" time step={step:10d} "
                        f"time={step * dt:13.4E}\n")

    vmat = np.asarray(v_j).reshape(n_node, 4)
    table = get_table(3414)
    eps, p = flib.update_c3_vp(table, coords_j[conn_j],
                               jnp.asarray(vmat)[conn_j])
    sig = flib.fluid_stress(eps, p, mu)
    return FlowResult(v=vmat, steps=steps, iters=total_iters,
                      resid=resid,
                      strain=np.asarray(eps.mean(axis=1)),
                      stress=np.asarray(sig.mean(axis=1)))


def write_flow_result(path: str, mesh, res: FlowResult, step: int = 1):
    from frontistr_tpu.io.resfile import write_result
    eids = np.concatenate([b.elem_ids for b in mesh.blocks])
    write_result(path, f"*fstrresult flow step={step}",
                 mesh.node_ids, eids,
                 [("VELOCITY", res.v[:, :3]),
                  ("PRESSURE", res.v[:, 3:4])],
                 [("STRAIN_RATE", res.strain),
                  ("STRESS", res.stress)])
