"""Preconditioned MINRES for symmetric indefinite systems.

The reference can solve the contact saddle system ITERATIVELY without
eliminating the Lagrange multipliers (solve_LINEQ_iter_contact.f90:46-109
`solve_no_eliminate` dispatch).  The TPU analogue needs a Krylov method
that tolerates the indefinite KKT block structure [K B^T; B 0] — CG
breaks down there; MINRES (Paige & Saunders 1975) minimises the residual
over the Krylov space using a three-term Lanczos recurrence, all
fixed-shape ops inside one `lax.while_loop`.

The preconditioner must be symmetric positive definite; the saddle
caller passes a block-diagonal M^{-1} = diag(blockJacobi(K), Schur-diag)
which preserves symmetry of the preconditioned operator.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from frontistr_tpu.solver.cg import CGResult


def _identity(x):
    return x


def minres(A: Callable, b: jnp.ndarray, M: Optional[Callable] = None,
           tol: float = 1.0e-8, maxiter: int = 10000) -> CGResult:
    """Left-preconditioned MINRES (Paige–Saunders recurrences).

    Solves A x = b with A symmetric (possibly indefinite) and M an SPD
    approximation of A^{-1} applied as a function.  Returns CGResult;
    `resid` is the preconditioned residual-norm estimate relative to
    ||b||_M (the quantity MINRES minimises)."""
    M = M or _identity
    eps = jnp.asarray(1e-30, b.dtype)

    r1 = b
    y = M(r1)
    beta1 = jnp.sqrt(jnp.maximum(jnp.vdot(r1, y), 0.0))
    beta1s = jnp.where(beta1 == 0.0, 1.0, beta1)

    # carried state mirrors the classic implementation's locals
    x0 = jnp.zeros_like(b)
    w0 = jnp.zeros_like(b)
    st = dict(x=x0, r1=r1, r2=r1, y=y,
              w=w0, w2=w0,
              oldb=jnp.asarray(0.0, b.dtype),
              beta=beta1,
              dbar=jnp.asarray(0.0, b.dtype),
              epsln=jnp.asarray(0.0, b.dtype),
              phibar=beta1,
              cs=jnp.asarray(-1.0, b.dtype),
              sn=jnp.asarray(0.0, b.dtype),
              itn=jnp.asarray(0),
              resid=jnp.asarray(1.0, b.dtype))

    def cond(st):
        return (st["resid"] > tol) & (st["itn"] < maxiter)

    def body(st):
        itn = st["itn"] + 1
        s = 1.0 / jnp.maximum(st["beta"], eps)
        v = s * st["y"]
        y = A(v)
        y = jnp.where(itn >= 2,
                      y - (st["beta"] / jnp.maximum(st["oldb"], eps))
                      * st["r1"], y)
        alfa = jnp.vdot(v, y)
        y = y - (alfa / jnp.maximum(st["beta"], eps)) * st["r2"]
        r1 = st["r2"]
        r2 = y
        y = M(r2)
        oldb = st["beta"]
        beta = jnp.sqrt(jnp.maximum(jnp.vdot(r2, y), 0.0))

        oldeps = st["epsln"]
        delta = st["cs"] * st["dbar"] + st["sn"] * alfa
        gbar = st["sn"] * st["dbar"] - st["cs"] * alfa
        epsln = st["sn"] * beta
        dbar = -st["cs"] * beta
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), eps)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * st["phibar"]
        phibar = sn * st["phibar"]

        w1 = st["w2"]
        w2 = st["w"]
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = st["x"] + phi * w
        resid = phibar / beta1s
        return dict(x=x, r1=r1, r2=r2, y=y, w=w, w2=w2,
                    oldb=oldb, beta=beta, dbar=dbar, epsln=epsln,
                    phibar=phibar, cs=cs, sn=sn, itn=itn, resid=resid)

    out = jax.lax.while_loop(cond, body, st)
    return CGResult(out["x"], out["itn"], out["resid"],
                    out["resid"] <= tol, None)
