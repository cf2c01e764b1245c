"""Incompressible-flow u-p tet element 3414 (SUPG/PSPG stabilized).

TPU rebuild of the reference's semi-implicit Navier-Stokes element
(fistr1/src/lib/static_LIB_3d_vp.f90): P1P1 velocity-pressure tet with
streamline-upwind (SUPG) and pressure (PSPG) stabilization, integrated
with the Crank-Nicolson factor gamma = 1/2 over one time increment.
Quadrature is the 4-point tet rule (element.f90:429 maps fe_tet4n_pipi
to the tet10 tables).

Everything is batched over elements: the per-(na,nb) `forall` blocks of
the reference become (E, q, nn, nn) einsums feeding one fused
(E, 4*nn, 4*nn) element matrix, MXU-friendly and shared verbatim
between the stiffness (STF_C3_vp:15-560) and residual
(LOAD_C3_vp:577-1244) paths, which in the reference duplicate the same
1200 lines.

dof layout per node: (vx, vy, vz, p) -- 4*nn element vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frontistr_tpu.fem.isoparam import jacobians

_HI = jax.lax.Precision.HIGHEST
GAMMA = 0.5


def _tau(table, x, v, mu, rho, dt):
    """Per-element stabilization parameter (STF_C3_vp:74-208).

    t1 = 2/dt, t2 = sum_a |vbar . dndx_a| (volume-averaged derivs),
    t3 = 4 mu/(rho V^(2/3)) at rest else mu t2^2/(rho |vbar|^2);
    tau = (t1^2+t2^2+t3^2)^(-1/2).  vbar is the element-center velocity
    (tet4 center shape funcs are all 1/4)."""
    dN = jnp.asarray(table.dN, x.dtype)
    det, g = jacobians(dN, x)
    w = jnp.asarray(table.weights, x.dtype)
    wg = w[None, :] * det                              # (E, q)
    vol = wg.sum(axis=1)                               # (E,)
    dndx = jnp.einsum("eq,eqnd->end", wg, g) / vol[:, None, None]
    vbar = v[:, :, :3].mean(axis=1)                    # (E, 3)
    d = jnp.abs(jnp.einsum("ei,eni->en", vbar, dndx)).sum(axis=1)
    vv = jnp.einsum("ei,ei->e", vbar, vbar)
    t1 = 2.0 / dt
    t3 = jnp.where(vv < 1e-15,
                   4.0 * mu / (rho * vol ** (2.0 / 3.0)),
                   mu * d * d / (rho * jnp.maximum(vv, 1e-300)))
    tau = 1.0 / jnp.sqrt(t1 * t1 + d * d + t3 * t3)
    return tau, det, g, wg


def stf_load_c3_vp(table, x, v, mu, rho, dt):
    """Element matrix K (E, 4nn, 4nn) and explicit RHS b (E, 4nn).

    v: (E, nn, 4) nodal (velocity, pressure) at the step start (with
    Dirichlet values substituted).  The residual of the semi-implicit
    scheme is r = b - K @ (v + dv); the caller forms it after gathering
    the current increment (LOAD_C3_vp:1231-1242)."""
    E, nn = x.shape[0], x.shape[1]
    tau, det, g, wg = _tau(table, x, v, mu, rho, dt)
    N = jnp.asarray(table.N, x.dtype)                  # (q, nn)
    ti = 1.0 / dt
    # per-gauss advection velocity (STF_C3_vp:236-248)
    vq = jnp.einsum("qn,eni->eqi", N, v[:, :, :3])     # (E, q, 3)

    # (E,q,a,b) building blocks (STF_C3_vp:252-300 forall)
    MM = N[None, :, :, None] * N[None, :, None, :]     # N_a N_b
    AA = jnp.einsum("qa,eqi,eqbi->eqab", N, vq, g, precision=_HI)
    DD = jnp.einsum("eqai,eqbj->eqabij", g, g, precision=_HI)
    trD = jnp.einsum("eqabii->eqab", DD)
    BB = jnp.einsum("eqi,eqj,eqabij->eqab", vq, vq, DD, precision=_HI)
    CC = jnp.einsum("eqai,qb->eqabi", g, N)            # dN_a/dx_i N_b
    MS = jnp.swapaxes(AA, 2, 3)                        # MS = AA^T
    AS = BB
    CS = jnp.einsum("eqk,eqabki->eqabi", vq, DD, precision=_HI)
    MP = jnp.einsum("qb,eqai->eqabi", N, g)
    AP = jnp.swapaxes(CS, 2, 3)                        # AP = CS^T

    tq = tau[:, None, None, None]
    # velocity-velocity: delta_ij * core + gamma mu DD[j,i]
    core = (ti * rho * (MM + tq * MS) + GAMMA * rho * (AA + tq * AS)
            + GAMMA * mu * trD)                        # (E,q,a,b)
    Kvv = (GAMMA * mu) * jnp.einsum("eqabji->eqabij", DD)
    Kvv = Kvv + core[..., None, None] * jnp.eye(3, dtype=x.dtype)
    # velocity-pressure / pressure-velocity / pressure-pressure
    Kvp = -CC + tq[..., None] * CS                     # (E,q,a,b,i)
    Kpv = (jnp.einsum("eqbaj->eqabj", CC)
           + (ti * tau)[:, None, None, None, None] * MP
           + (GAMMA * tau)[:, None, None, None, None] * AP)
    Kpp = (tau / rho)[:, None, None, None] * trD

    # assemble the (4nn, 4nn) element matrix, gauss-weighted
    K = jnp.zeros((E, nn, 4, nn, 4), x.dtype)
    K = K.at[:, :, :3, :, :3].set(
        jnp.einsum("eq,eqabij->eaibj", wg, Kvv, precision=_HI))
    K = K.at[:, :, :3, :, 3].set(
        jnp.einsum("eq,eqabi->eaib", wg, Kvp, precision=_HI))
    K = K.at[:, :, 3, :, :3].set(
        jnp.einsum("eq,eqabj->eabj", wg, Kpv, precision=_HI))
    K = K.at[:, :, 3, :, 3].set(
        jnp.einsum("eq,eqab->eab", wg, Kpp, precision=_HI))
    K = K.reshape(E, nn * 4, nn * 4)

    # explicit RHS b (LOAD_C3_vp:1150-1230): velocity rows use v only
    vel = v[:, :, :3]                                  # (E, b, i)
    m_v = jnp.einsum("eqab,ebi->eqai", MM, vel, precision=_HI)
    a_v = jnp.einsum("eqab,ebi->eqai", AA, vel, precision=_HI)
    ms_v = jnp.einsum("eqab,ebi->eqai", MS, vel, precision=_HI)
    as_v = jnp.einsum("eqab,ebi->eqai", AS, vel, precision=_HI)
    # diffusion: sum_j d_v(j,j,i) = trD v_i ; sum_j d_v(j,i,j) = DD_{ji} v_j
    dv1 = jnp.einsum("eqab,ebi->eqai", trD, vel, precision=_HI)
    dv2 = jnp.einsum("eqabji,ebj->eqai", DD, vel, precision=_HI)
    mp_v = jnp.einsum("eqabj,ebj->eqa", MP, vel, precision=_HI)
    ap_v = jnp.einsum("eqabj,ebj->eqa", AP, vel, precision=_HI)
    bv = (ti * rho * (m_v + tq * ms_v)
          - (1.0 - GAMMA) * rho * (a_v + tq * as_v)
          - (1.0 - GAMMA) * mu * (dv1 + dv2))          # (E,q,a,3)
    bp = (ti * tau)[:, None, None] * mp_v \
        - ((1.0 - GAMMA) * tau)[:, None, None] * ap_v  # (E,q,a)
    b = jnp.concatenate(
        [jnp.einsum("eq,eqai->eai", wg, bv, precision=_HI),
         jnp.einsum("eq,eqa->ea", wg, bp, precision=_HI)[..., None]],
        axis=2)                                        # (E, a, 4)
    return K, b.reshape(E, nn * 4)


def update_c3_vp(table, x, v_new):
    """Gauss strain-rate / Cauchy stress for output (UPDATE_C3_vp:
    static_LIB_3d_vp.f90:593-675): strain = sym grad v, stress =
    -p I + 2 mu strain (deviatoric rows); returns (E, q, 6) pairs."""
    dN = jnp.asarray(table.dN, x.dtype)
    _, g = jacobians(dN, x)
    N = jnp.asarray(table.N, x.dtype)
    L = jnp.einsum("ebi,eqbj->eqij", v_new[:, :, :3], g, precision=_HI)
    eps = jnp.stack([L[..., 0, 0], L[..., 1, 1], L[..., 2, 2],
                     0.5 * (L[..., 0, 1] + L[..., 1, 0]),
                     0.5 * (L[..., 1, 2] + L[..., 2, 1]),
                     0.5 * (L[..., 2, 0] + L[..., 0, 2])], axis=-1)
    p = jnp.einsum("eb,qb->eq", v_new[:, :, 3], N)
    return eps, p


def fluid_stress(eps, p, mu):
    """Cauchy stress rows from strain rate + pressure (6 components)."""
    sig = 2.0 * mu * eps
    sig = sig.at[..., :3].add(-p[..., None])
    return sig
