"""Condition-number estimation (the ESTCOND option of the reference's
iterative solvers, hecmw_solver_CG.f90:89 + hecmw_estimate_condition).

The reference accumulates CG's alpha/beta into a Lanczos tridiagonal and
reports eigmax/eigmin.  Here we run an explicit k-step Lanczos on the
(preconditioned) operator with jitted matvecs — same estimate, decoupled
from the solver's jitted while_loop."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def estimate_condition(A, n: int, M=None, k: int = 40, seed: int = 0):
    """Extreme-eigenvalue ratio of (M A) via k-step Lanczos."""
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal(n))
    q = q / jnp.linalg.norm(q)
    op = (lambda x: M(A(x))) if M is not None else A
    opj = jax.jit(op)
    alphas, betas = [], []
    q_prev = jnp.zeros_like(q)
    beta = 0.0
    for _ in range(k):
        w = opj(q)
        a = float(jnp.vdot(q, w))
        w = w - a * q - beta * q_prev
        beta_new = float(jnp.linalg.norm(w))
        alphas.append(a)
        betas.append(beta_new)
        if beta_new < 1e-14:
            break
        q_prev = q
        q = w / beta_new
        beta = beta_new
    T = np.diag(alphas)
    if len(alphas) > 1:
        off = np.asarray(betas[:len(alphas) - 1])
        T += np.diag(off, 1) + np.diag(off, -1)
    ev = np.linalg.eigvalsh(T)
    ev = ev[ev > 0]
    if len(ev) == 0:
        return float("inf")
    return float(ev.max() / ev.min())
