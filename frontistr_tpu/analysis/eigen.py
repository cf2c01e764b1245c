"""Eigenvalue analysis: shift-invert Lanczos for K phi = lambda M phi.

TPU rebuild of fstr_solve_lanczos (fistr1/src/analysis/dynamic/mode/
fstr_EIG_lanczos.f90): the operator apply is a Krylov solve K^{-1}(M q)
(jitted once, reused every Lanczos step), M-orthonormal basis with full
reorthogonalization, small tridiagonal eig on the host (replacing the
QL_decomposition of fstr_EIG_tridiag.f90:183-302), participation factors /
effective mass per fstr_EIG_output.f90:44-86.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frontistr_tpu.assembly import femop
from frontistr_tpu.assembly import operators as old_ops
from frontistr_tpu.assembly.model import StructModel
from frontistr_tpu.analysis.static import compute_element_stiffness
from frontistr_tpu.analysis.dynamic import lumped_mass_vector
from frontistr_tpu.solver import cg as krylov


@dataclasses.dataclass
class EigenResult:
    eigenvalues: np.ndarray       # (nget,)
    ang_freq: np.ndarray
    freq: np.ndarray
    eigenvectors: np.ndarray      # (n_dof, nget)
    partfactor: np.ndarray        # (nget, ndof)
    effmass: np.ndarray           # (nget, ndof)
    total_mass: float
    iters: int


def run_eigen(model: StructModel, log_path: Optional[str] = None,
              kes=None, log_append: bool = False):
    """kes overrides the element stiffness (STATICEIGEN passes the
    tangent about the converged deformed state)."""
    cfg = model.cfg
    ec = cfg.eigen
    nget = ec.nget if ec else 5
    tol = ec.tolerance if ec else 1e-8
    maxiter = ec.maxiter if ec else 60

    n = model.n_dof_total
    if kes is None:
        kes = compute_element_stiffness(model)
    inc, total_en = femop.build_incidence([b.conn for b in model.blocks],
                                          model.n_node)
    free = old_ops.make_free_mask(n, model.fixed_dofs)
    mass = lumped_mass_vector(model)
    # Lanczos runs in the M-seminorm over mass-carrying dofs; K however
    # must stay unconstrained on zero-mass dofs (shell/beam rotations are
    # condensed through K^-1, NOT clamped).  Only Dirichlet dofs and dofs
    # of nodes untouched by any element are pinned.
    used = np.zeros(model.n_node, bool)
    for b in model.blocks:
        used[np.unique(b.conn)] = True
    k_active = (free > 0) & np.repeat(used, model.ndof)
    active = k_active & (mass > 0)
    act = jnp.asarray(active.astype(np.float64))
    mass_j = jnp.asarray(mass)

    op = femop.FEOperator(
        kes=[jnp.asarray(k) for k in kes],
        dofs=[jnp.asarray(b.dofs) for b in model.blocks],
        nns=[b.conn.shape[1] for b in model.blocks],
        inc=jnp.asarray(inc), total_en=total_en, n_node=model.n_node,
        ndof=model.ndof,
        free_mask=jnp.asarray(k_active.astype(np.float64)))
    k_act = jnp.asarray(k_active.astype(np.float64))

    # !EQUATION: dependent-dof elimination folded into the shift-invert
    # apply — Lanczos then runs on the reduced pencil (T^t K T, T^t M T)
    # with all vectors kept in range(T) (reference: middleware-level
    # hecmw_mat_ass_equation before every solve)
    from frontistr_tpu.assembly import extras as exmod
    mpc_a = exmod.mpc_arrays(model.mesh, model.ndof, n)

    @jax.jit
    def _shift_invert(op, mass_j, k_act, mpc, q):
        """w = K^{-1} (M q) on the Dirichlet-constrained system.  The
        operator rides through jit as a pytree arg (closure arrays are
        inlined as module literals — payload overflow at scale)."""
        b = (mass_j * q) * k_act
        A = op.apply_constrained
        if mpc is not None:
            b = exmod.mpc_Tt(mpc, b)
            A = exmod.mpc_wrap(mpc, op.apply_constrained)
        res = krylov.pcg(A, b, M=op.block_jacobi(),
                         tol=1e-10, maxiter=model.cfg.solver.nier)
        x = res.x
        if mpc is not None:
            x = exmod.mpc_recover(mpc, x)
        return x * k_act

    # multi-chip Lanczos: FRONTISTR_TPU_SHARDS routes each K^{-1}(M q)
    # apply through the GSPMD-sharded cluster-ELL + AMG solver (full
    # f64 — eigenpair accuracy needs the unmixed arm)
    from frontistr_tpu.parallel import shard as shmod
    nshard = shmod.requested_shards()
    if nshard:
        from frontistr_tpu.analysis.nonlinear import \
            make_constrained_solver
        _sh = make_constrained_solver(
            model, [jnp.asarray(b.dofs) for b in model.blocks],
            [b.conn.shape[1] for b in model.blocks], jnp.asarray(inc),
            total_en, k_act, mixed=False, nshard=nshard)
        _kes_t = tuple(jnp.asarray(k) for k in kes)
        _zero = jnp.zeros(n)

        def shift_invert(q):
            # the sharded solver reduces/recovers MPC internally
            b = (mass_j * q) * k_act
            return _sh(_kes_t, b, _zero) * k_act
    elif cfg.solver.method.upper() in (
            "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG") \
            and mpc_a is None:
        # METHOD=DIRECT: factor K once and back-substitute every
        # Lanczos apply — the reference's direct eigen path
        # (set_arrays_DirectSolver + solve per iteration); far cheaper
        # than a 1e-10 CG per apply.  FRONTISTR_TPU_DIRECT=band selects
        # the in-house ON-DEVICE blocked band Cholesky (solver/band.py,
        # hecmw_solver_direct.f90 counterpart); default is host SuperLU.
        import os as _os
        mass_np = np.asarray(mass_j)
        kact_np = np.asarray(k_act)
        if _os.environ.get("FRONTISTR_TPU_DIRECT", "").lower() == "band":
            from frontistr_tpu.solver.band import BandCholesky
            _bc = BandCholesky(
                [np.asarray(k) for k in kes],
                [np.asarray(b.dofs) for b in model.blocks], n,
                k_active.astype(float),
                [np.asarray(b.conn) for b in model.blocks],
                model.n_node)

            def shift_invert(q):
                b = (mass_np * np.asarray(q)) * kact_np
                return jnp.asarray(_bc.solve(b) * kact_np)
        else:
            from frontistr_tpu.solver.direct import assemble_csr
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla
            A = assemble_csr([np.asarray(k) for k in kes],
                             [np.asarray(b.dofs)
                              for b in model.blocks], n)
            fm = k_active.astype(float)
            Acon = sp.diags(fm) @ A @ sp.diags(fm) + \
                sp.diags(1.0 - fm)
            dz = Acon.diagonal() == 0.0
            if dz.any():
                Acon = Acon + sp.diags(dz.astype(float))
            _lu = spla.splu(Acon.tocsc())

            def shift_invert(q):
                b = (mass_np * np.asarray(q)) * kact_np
                return jnp.asarray(_lu.solve(b) * kact_np)
    else:
        if cfg.solver.method.upper() in (
                "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG"):
            print("### NOTE: METHOD=DIRECT with !EQUATION rides the "
                  "iterative eliminated solve in eigen")
        def shift_invert(q):
            return _shift_invert(op, mass_j, k_act, mpc_a, q)

    # --- Lanczos with full reorthogonalization (M-inner product) ----------
    rng = np.random.default_rng(0)
    q = act * jnp.asarray(rng.standard_normal(n))
    if mpc_a is not None:
        # seed inside the constraint subspace range(T)
        q = exmod.mpc_recover(mpc_a, q) * act
    q = q / jnp.sqrt(jnp.vdot(mass_j * q, q))
    V = [q]
    alphas: List[float] = []
    betas: List[float] = []
    m_iter = min(maxiter, int(active.sum()))
    theta_prev = None
    it_used = m_iter
    for j in range(m_iter):
        w = shift_invert(V[j])
        a = float(jnp.vdot(mass_j * w, V[j]))
        w = w - a * V[j]
        if j > 0:
            w = w - betas[-1] * V[j - 1]
        # full M-reorthogonalization
        for v in V:
            w = w - jnp.vdot(mass_j * w, v) * v
        b = float(jnp.sqrt(jnp.vdot(mass_j * w, w)))
        alphas.append(a)
        betas.append(b)
        # convergence check on the largest nget Ritz values of T
        if j + 1 >= nget:
            T = np.diag(alphas) + np.diag(betas[:-1], 1) + \
                np.diag(betas[:-1], -1)
            theta, S = np.linalg.eigh(T)
            idx = np.argsort(theta)[::-1][:nget]   # largest 1/lambda
            resid = np.abs(b * S[-1, idx])
            if np.all(resid < tol * np.maximum(np.abs(theta[idx]), 1e-30)) \
                    or b < 1e-14:
                it_used = j + 1
                break
        if b < 1e-14:
            it_used = j + 1
            break
        V.append(w / b)

    T = np.diag(alphas) + np.diag(betas[:-1], 1) + np.diag(betas[:-1], -1)
    theta, S = np.linalg.eigh(T)
    order = np.argsort(theta)[::-1]
    theta = theta[order][:nget]
    S = S[:, order][:, :nget]
    lam = 1.0 / theta
    Vm = np.stack([np.asarray(v) for v in V[:len(alphas)]], axis=1)
    phi = Vm @ S                                     # (n, nget)

    mass_np = np.asarray(mass)
    ndof = model.ndof
    pf = np.zeros((nget, ndof))
    em = np.zeros((nget, ndof))
    for i in range(nget):
        p = phi[:, i].reshape(model.n_node, ndof)
        mm = mass_np.reshape(model.n_node, ndof)
        gm = float((mm * p * p).sum())
        for d in range(ndof):
            r = float((mm[:, d] * p[:, d]).sum())
            pf[i, d] = r / gm
            em[i, d] = r * r / gm

    total_mass = float(mass_np.sum() / min(ndof, 3))
    res = EigenResult(
        eigenvalues=lam, ang_freq=np.sqrt(np.abs(lam)),
        freq=np.sqrt(np.abs(lam)) / (2 * np.pi), eigenvectors=phi,
        partfactor=pf, effmass=em, total_mass=total_mass, iters=it_used)
    if log_path:
        write_eigen_log(log_path, res, ndof, append=log_append)
    return res


def write_eigen_log(path: str, res: EigenResult, ndof: int,
                    append: bool = False):
    """RESULT OF EIGEN VALUE ANALYSIS block (EGLIST format,
    fstr_EIG_output.f90)."""
    with open(path, "a" if append else "w") as f:
        f.write(" fstr_setup: OK\n \n")
        f.write("********************************\n")
        f.write("*RESULT OF EIGEN VALUE ANALYSIS*\n")
        f.write("********************************\n\n")
        f.write(f"NUMBER OF ITERATIONS = {res.iters:8d}\n")
        f.write(f"TOTAL MASS = {res.total_mass:12.4E}\n\n")
        f.write("                   ANGLE       FREQUENCY   "
                "PARTICIPATION FACTOR                EFFECTIVE MASS\n")
        f.write("  NO.  EIGENVALUE  FREQUENCY   (HZ)        "
                "X           Y           Z           X           Y"
                "           Z\n")
        f.write("  ---  ----------  ----------  ----------  ----------  "
                "----------  ----------  ----------  ----------  "
                "----------\n")
        for i in range(len(res.eigenvalues)):
            p = res.partfactor[i]
            e = res.effmass[i]
            f.write(f"{i+1:5d}  {res.eigenvalues[i]:10.4E}  "
                    f"{res.ang_freq[i]:10.4E}  {res.freq[i]:10.4E}  "
                    f"{p[0]:10.4E}  {p[1]:10.4E}  {p[2]:10.4E}  "
                    f"{e[0]:10.4E}  {e[1]:10.4E}  {e[2]:10.4E}\n")
