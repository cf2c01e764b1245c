"""Viscoelastic (Prony series) and Norton creep constitutive updates.

Batched reimplementation of fistr1/src/lib/physics/Viscoelastic.f90 and
creep.f90:

Viscoelastic (UpdateViscoelastic / calViscoelasticMatrix):
    h(x) = (1-e^-x)/x  (series expansion for x<1e-4)
    q_n' = e^{-dtau} q_n + mu_n h(dtau) (e - e_n),  e = dev strain (tensor
    shear), sigma = 2G (mu_0 e + sum q_n') + K tr(eps) I
    tangent: G_g = G (mu_0 + sum mu_n h), isotropic D(G_g, K)

Norton creep (update_iso_creep / iso_creep):
    trial deviator s; scalar Newton on dg: f = A' (|s|-3G dg)^n = dg,
    A' = A ((t+dt)^{m+1} - t^{m+1})/(m+1);  s' = s (1 - 3G dg/|s|)
    consistent tangent: De + c3 n n^T - c4 dev projection terms
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hvisc(x):
    series = 1.0 - 0.5 * x * (1.0 - x / 3.0 * (1.0 - 0.25 * x *
                                               (1.0 - 0.2 * x)))
    safe = jnp.where(x < 1e-4, 1.0, x)
    return jnp.where(x < 1e-4, series, (1.0 - jnp.exp(-safe)) / safe)


def _dev(eps):
    """Deviatoric TENSOR strain from Voigt engineering strain."""
    th = (eps[..., 0] + eps[..., 1] + eps[..., 2]) / 3.0
    dev = jnp.concatenate([eps[..., :3] - th[..., None],
                           0.5 * eps[..., 3:]], -1)
    return th, dev


def trs_shift(T, trs_consts, definition="WLF"):
    """Reduced-time factor a(T) (Viscoelastic.f90 trs:70-84): effective
    dt' = a(T) * dt.  WLF: a = exp(C1 (T-T0)/(C2+T-T0) ln10);
    Arrhenius: a = exp(C1 (1/(T-C2) - 1/(T0-C2)))."""
    c = jnp.asarray(trs_consts).reshape(-1)
    T0, C1, C2 = c[0], c[1], c[2]
    if definition.startswith("ARR"):
        h = C1 * (1.0 / (T - C2) - 1.0 / (T0 - C2))
    else:
        h = C1 * (T - T0) / (C2 + T - T0) * jnp.log(10.0)
    return jnp.exp(h)


def visco_update(eps, vq, ven, dt, G, K, mus, taus):
    """Returns (sigma, vq_new).  vq (..., nterms, 6) committed q;
    ven (..., 6) committed deviatoric strain.  dt may be a scalar or an
    array broadcastable to eps[..., 0] (TRS-scaled reduced time)."""
    th, dev = _dev(eps)
    dtau = jnp.asarray(dt)[..., None] / taus          # (..., nterms)
    expn = jnp.exp(-dtau)
    dq = mus * hvisc(dtau)
    de = dev[..., None, :] - ven[..., None, :]
    vq_new = expn[..., None] * vq + dq[..., None] * de
    mu0 = 1.0 - mus.sum()
    s = vq_new.sum(axis=-2)
    sig_dev = 2.0 * G * (mu0 * dev + s)
    sig = jnp.concatenate(
        [sig_dev[..., :3] + (3.0 * K * th)[..., None], sig_dev[..., 3:]],
        -1)
    return sig, vq_new


def visco_commit(state_vq_new, eps):
    th, dev = _dev(eps)
    return state_vq_new, dev


def visco_D(dt, G, K, mus, taus):
    """Traced isotropic viscoelastic tangent (calViscoelasticMatrix).
    dt scalar or (...,) array -> D (..., 6, 6)."""
    dt = jnp.asarray(dt)
    dtau = dt[..., None] / taus
    gfac_t = (mus * hvisc(dtau)).sum(-1) + (1.0 - mus.sum())
    gfac = jnp.where(dt == 0.0, 1.0, gfac_t)
    Gg = G * gfac
    Kg = K - 2.0 / 3.0 * Gg
    base = jnp.zeros((6, 6))
    base = base.at[:3, :3].set(Kg)
    base = base + jnp.diag(jnp.concatenate(
        [2.0 * Gg * jnp.ones(3), Gg * jnp.ones(3)]))
    return base


def _eq_dev(sig):
    th = (sig[..., 0] + sig[..., 1] + sig[..., 2]) / 3.0
    dev = jnp.concatenate([sig[..., :3] - th[..., None], sig[..., 3:]], -1)
    mag = jnp.sqrt(1.5 * (jnp.sum(dev[..., :3] ** 2, -1)
                          + 2.0 * jnp.sum(dev[..., 3:] ** 2, -1)))
    return th, dev, mag


def creep_return(sig_trial, G, A, n, m, ttime, dt, iters: int = 30):
    """Norton radial return. Returns (sigma, dg, eqvs)."""
    aa = A * ((ttime + dt) ** (m + 1.0) - ttime ** (m + 1.0)) / (m + 1.0)
    th, dev, dstri = _eq_dev(sig_trial)
    safe = jnp.maximum(dstri, 1e-10)
    dg = jnp.zeros_like(dstri)
    for _ in range(iters):
        eqvs = jnp.maximum(dstri - 3.0 * G * dg, 1e-10)
        f = aa * eqvs ** n
        df = n * f / eqvs
        ddg = (f - dg) / (3.0 * G * df + 1.0)
        dg = dg + ddg
    eqvs = jnp.maximum(dstri - 3.0 * G * dg, 1e-10)
    scale = 1.0 - 3.0 * G * dg / safe
    dev_new = scale[..., None] * dev
    sig = jnp.concatenate([dev_new[..., :3] + th[..., None],
                           dev_new[..., 3:]], -1)
    active = dstri > 1e-10
    sig = jnp.where(active[..., None], sig, sig_trial)
    dg = jnp.where(active, dg, 0.0)
    return sig, dg, eqvs


def creep_tangent(De, sig, dg, G, A, n, m, ttime, dt):
    """iso_creep consistent tangent (creep.f90:88-113)."""
    aa = A * ((ttime + dt) ** (m + 1.0) - ttime ** (m + 1.0)) / (m + 1.0)
    th, dev, dstri = _eq_dev(sig)
    eqvs = jnp.maximum(dstri, 1e-10)
    nvec = dev / eqvs[..., None]
    f = aa * eqvs ** n
    df = n * f / eqvs
    c3 = 6.0 * G * G
    c4 = c3 * dg / (dstri + 3.0 * G * dg)
    c3t = c4 - c3 * df / (3.0 * G * df + 1.0)
    c5 = c4 / 3.0
    D = De + c3t[..., None, None] * nvec[..., :, None] * nvec[..., None, :]
    eye3 = jnp.zeros((6, 6)).at[:3, :3].set(1.0)
    diag = jnp.concatenate([jnp.ones(3), 0.5 * jnp.ones(3)])
    D = D - c4[..., None, None] * jnp.diag(diag)
    D = D + c5[..., None, None] * eye3
    active = (dstri > 1e-10) & (dt > 0)
    return jnp.where(active[..., None, None], D, De)
