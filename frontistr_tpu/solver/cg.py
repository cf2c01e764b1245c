"""Jit-compiled preconditioned Krylov solvers.

The TPU rebuild of hecmw1/src/solver/iterative/hecmw_solver_CG.f90 (and
BiCGSTAB/GMRES/GPBiCG siblings): the iteration is a ``lax.while_loop`` over a
small pytree state, so an entire solve is a single XLA computation — no
host round-trips per iteration (the reference pays an MPI allreduce per dot;
here dots are on-chip reductions, and multi-chip runs psum them).

Convergence: ||r||_2 / ||b||_2 < tol, matching the reference's BNRM2-relative
criterion (hecmw_solver_CG.f90 loop).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    relres: jnp.ndarray
    converged: jnp.ndarray
    hist: Optional[jnp.ndarray] = None   # (hist_len,) per-iter relres


def _identity(r):
    return r


def pcg(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
        x0: Optional[jnp.ndarray] = None, tol: float = 1.0e-8,
        maxiter: int = 10000, hist_len: int = 0) -> CGResult:
    """Preconditioned conjugate gradients (left-precond, Fletcher–Reeves
    rho update, same recurrences as hecmw_solve_CG).

    hist_len > 0 records the per-iteration relative residual into a fixed
    on-device buffer inside the while_loop (the TPU-native ITERLOG: no
    host sync per iteration, printed after the solve; reference prints
    live at hecmw_solver_CG.f90:245).  Unused slots hold -1."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnrm2 = jnp.vdot(b, b)
    bnrm2 = jnp.where(bnrm2 == 0.0, 1.0, bnrm2)

    r0 = b - A(x0)
    z0 = M(r0)
    rho0 = jnp.vdot(r0, z0)
    hist0 = jnp.full(hist_len, -1.0, jnp.float32) if hist_len else None

    def cond(st):
        return (st[5] > tol) & (st[4] < maxiter)

    def body(st):
        x, r, p, rho, k, _, hist = st
        q = A(p)
        alpha = rho / jnp.vdot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        z = M(r)
        rho_new = jnp.vdot(r, z)
        beta = rho_new / rho
        p = z + beta * p
        resid = jnp.sqrt(jnp.vdot(r, r) / bnrm2)
        if hist is not None:
            hist = hist.at[jnp.minimum(k, hist_len - 1)].set(
                resid.astype(jnp.float32))
        return (x, r, p, rho_new, k + 1, resid, hist)

    resid0 = jnp.sqrt(jnp.vdot(r0, r0) / bnrm2)
    st = (x0, r0, z0, rho0, jnp.asarray(0), resid0, hist0)
    x, r, p, rho, k, resid, hist = jax.lax.while_loop(cond, body, st)
    return CGResult(x, k, resid, resid <= tol, hist)


def bicgstab(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
             x0: Optional[jnp.ndarray] = None, tol: float = 1.0e-8,
             maxiter: int = 10000) -> CGResult:
    """BiCGSTAB (hecmw_solver_BiCGSTAB.f90 recurrences)."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnrm2 = jnp.vdot(b, b)
    bnrm2 = jnp.where(bnrm2 == 0.0, 1.0, bnrm2)
    r0 = b - A(x0)
    rt = r0

    def cond(st):
        return (st[-1] > tol) & (st[-2] < maxiter)

    def body(st):
        x, r, p, v, rho, alpha, omega, k, _ = st
        rho_new = jnp.vdot(rt, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        ph = M(p)
        v = A(ph)
        alpha = rho_new / jnp.vdot(rt, v)
        s = r - alpha * v
        sh = M(s)
        t = A(sh)
        omega = jnp.vdot(t, s) / jnp.vdot(t, t)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        resid = jnp.sqrt(jnp.vdot(r, r) / bnrm2)
        return (x, r, p, v, rho_new, alpha, omega, k + 1, resid)

    resid0 = jnp.sqrt(jnp.vdot(r0, r0) / bnrm2)
    one = jnp.asarray(1.0, b.dtype)
    st = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
          jnp.asarray(0), resid0)
    out = jax.lax.while_loop(cond, body, st)
    x, r = out[0], out[1]
    k, resid = out[-2], out[-1]
    return CGResult(x, k, resid, resid <= tol)


def gmres(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
          x0: Optional[jnp.ndarray] = None, tol: float = 1.0e-8,
          maxiter: int = 10000, restart: int = 30) -> CGResult:
    """Restarted GMRES(m) with right preconditioning
    (hecmw_solver_GMRES.f90 capability; Arnoldi via modified Gram-Schmidt,
    statically-shaped Krylov basis)."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    m = restart
    bnrm = jnp.sqrt(jnp.vdot(b, b))
    bnrm = jnp.where(bnrm == 0.0, 1.0, bnrm)
    dtype = b.dtype

    def arnoldi_cycle(x):
        r = b - A(x)
        beta = jnp.sqrt(jnp.vdot(r, r))
        V = jnp.zeros((m + 1, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)
        V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))

        def step(j, carry):
            V, H = carry
            w = A(M(V[j]))

            def mgs(i, wh):
                w, H = wh
                hij = jnp.vdot(V[i], w) * (i <= j)
                H = H.at[i, j].add(hij)
                w = w - hij * V[i]
                return (w, H)

            w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
            hj1 = jnp.sqrt(jnp.vdot(w, w))
            H = H.at[j + 1, j].set(hj1)
            V = V.at[j + 1].set(w / jnp.where(hj1 == 0, 1.0, hj1))
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, step, (V, H))
        # least squares min ||beta e1 - H y|| via Givens rotations +
        # back substitution (hecmw_solver_GMRES.f90's plane rotations):
        # TPU-safe (scalar rotations, no QR/SVD lowering needed) and,
        # unlike normal equations, does not square the Hessenberg
        # conditioning
        g0 = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def rot(j, Hg):
            Hr, g = Hg
            a, bb = Hr[j, j], Hr[j + 1, j]
            r = jnp.sqrt(a * a + bb * bb)
            c = jnp.where(r == 0, 1.0, a / jnp.where(r == 0, 1.0, r))
            s = jnp.where(r == 0, 0.0, bb / jnp.where(r == 0, 1.0, r))
            rj, rj1 = Hr[j], Hr[j + 1]
            Hr = Hr.at[j].set(c * rj + s * rj1)
            Hr = Hr.at[j + 1].set(-s * rj + c * rj1)
            gj, gj1 = g[j], g[j + 1]
            g = g.at[j].set(c * gj + s * gj1)
            g = g.at[j + 1].set(-s * gj + c * gj1)
            return (Hr, g)

        Hr, g = jax.lax.fori_loop(0, m, rot, (H, g0))

        def back(i, y):
            j = m - 1 - i
            d = jnp.where(Hr[j, j] == 0, 1.0, Hr[j, j])
            return y.at[j].set((g[j] - jnp.dot(Hr[j, :m], y)) / d)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
        x_new = x + M(V[:m].T @ y)
        r_new = b - A(x_new)
        res = jnp.sqrt(jnp.vdot(r_new, r_new)) / bnrm
        return x_new, res

    def cond(st):
        x, k, res = st
        return (res > tol) & (k < maxiter)

    def body(st):
        x, k, _ = st
        x, res = arnoldi_cycle(x)
        return (x, k + m, res)

    r0 = b - A(x0)
    res0 = jnp.sqrt(jnp.vdot(r0, r0)) / bnrm
    x, k, res = jax.lax.while_loop(cond, body, (x0, jnp.asarray(0), res0))
    return CGResult(x, k, res, res <= tol)


def gpbicg(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
           x0: Optional[jnp.ndarray] = None, tol: float = 1.0e-8,
           maxiter: int = 10000) -> CGResult:
    """GPBiCG (hecmw_solver_GPBiCG.f90 capability; Zhang's recurrences)."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnrm2 = jnp.vdot(b, b)
    bnrm2 = jnp.where(bnrm2 == 0.0, 1.0, bnrm2)
    r0 = b - A(x0)
    rt = r0
    zero = jnp.zeros_like(b)

    def cond(st):
        return (st["resid"] > tol) & (st["k"] < maxiter)

    def body(st):
        x, r, t, t0, w, p, u, z = (st["x"], st["r"], st["t"], st["t0"],
                                   st["w"], st["p"], st["u"], st["z"])
        rho, beta, k = st["rho"], st["beta"], st["k"]
        p = M(r) + beta * (p - u)
        Ap = A(p)
        alpha = rho / jnp.vdot(rt, Ap)
        y = t - r - alpha * w + alpha * Ap
        t_new = r - alpha * Ap
        Att = A(M(t_new))
        ydy = jnp.vdot(y, y)
        first = (k == 0)
        zeta_num = jnp.vdot(Att, t_new)
        zeta_den = jnp.vdot(Att, Att)
        # general step (k>0): 2x2 solve
        yt = jnp.vdot(y, t_new)
        ay = jnp.vdot(Att, y)
        det = zeta_den * ydy - ay * ay
        det = jnp.where(det == 0, 1.0, det)
        zeta_g = (ydy * zeta_num - yt * ay) / det
        eta_g = (zeta_den * yt - ay * zeta_num) / det
        zeta = jnp.where(first, zeta_num / jnp.where(zeta_den == 0, 1.0, zeta_den), zeta_g)
        eta = jnp.where(first, 0.0, eta_g)
        u = zeta * M(Ap) + eta * (M(t0) - M(r) + beta * u)
        z = zeta * M(r) + eta * z - alpha * u
        x = x + alpha * p + z
        r_new = t_new - eta * y - zeta * Att
        rho_new = jnp.vdot(rt, r_new)
        beta_new = (alpha / zeta) * (rho_new / jnp.where(rho == 0, 1.0, rho))
        w = Att + beta_new * Ap
        resid = jnp.sqrt(jnp.vdot(r_new, r_new) / bnrm2)
        return dict(x=x, r=r_new, t=t_new, t0=t, w=w, p=p, u=u, z=z,
                    rho=rho_new, beta=beta_new, k=k + 1, resid=resid)

    resid0 = jnp.sqrt(jnp.vdot(r0, r0) / bnrm2)
    st = dict(x=x0, r=r0, t=zero, t0=zero, w=zero, p=zero, u=zero, z=zero,
              rho=jnp.vdot(rt, r0), beta=jnp.asarray(0.0, b.dtype),
              k=jnp.asarray(0), resid=resid0)
    out = jax.lax.while_loop(cond, body, st)
    return CGResult(out["x"], out["k"], out["resid"], out["resid"] <= tol)


SOLVERS = {
    "CG": pcg,
    "BICGSTAB": bicgstab,
    "GMRES": gmres,
    "GPBICG": gpbicg,
    # numeric codes as in hecmw Iarray(1) (hecmw_matrix_misc.f90 method ids)
    "1": pcg,
    "2": bicgstab,
    "3": gmres,
    "4": gpbicg,
}


def solve(method: str, A, b, M=None, x0=None, tol=1.0e-8, maxiter=10000,
          hist_len: int = 0, **kw) -> CGResult:
    method = method.upper()
    if method in ("DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG"):
        # dense/direct path handled by caller (solver/direct.py)
        raise ValueError("direct solvers are dispatched in solver.direct")
    if method not in SOLVERS:
        raise ValueError(f"unknown solver METHOD={method!r}; "
                         f"expected one of {sorted(SOLVERS)}")
    fn = SOLVERS[method]
    if fn is pcg:
        kw["hist_len"] = hist_len         # ITERLOG buffer (CG only)
    return fn(A, b, M=M, x0=x0, tol=tol, maxiter=maxiter, **kw)
