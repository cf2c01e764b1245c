"""Elastoplastic constitutive update (Mises family).

Batched, branch-free (jnp.where) re-derivation of the reference's
return-mapping (fistr1/src/lib/physics/Elastoplastic.f90):

- trial stress comes from the TOTAL mechanical strain (the reference's
  UPDATE_C3 computes sigma = D_e : eps_total then calls BackwardEuler with
  the committed plastic multiplier, Elastoplastic.f90:351-561)
- isotropic hardening laws LINEAR / MULTILINEAR / SWIFT / RAMBERG-OSGOOD,
  kinematic (Prager) and combined (Elastoplastic.f90:176-294)
- radial return with a fixed 5-iteration Newton on the consistency equation
  (MAXITER=5, tol semantics preserved but evaluated branch-free)
- consistent(ish) tangent D = De - (De a)(De a)^T / (H + a^T De a) when
  yielded (calElastoPlasticMatrix, Elastoplastic.f90:16-119)

The reference's Mohr-Coulomb / Drucker-Prager arms are planned follow-ups.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PlasticParams:
    youngs: float
    poisson: float
    hardening: str                   # LINEAR/MULTILINEAR/SWIFT/RAMBERG-OSGOOD/KINEMATIC/COMBINED
    consts: np.ndarray               # !PLASTIC data rows flattened
    table: Optional[np.ndarray] = None   # multilinear (yield, pstrain) rows

    @property
    def G(self):
        return self.youngs / (2.0 * (1.0 + self.poisson))

    @property
    def kinematic(self):
        return self.hardening in ("KINEMATIC", "COMBINED")


def make_hardening(params: PlasticParams):
    """Returns (yield_stress(p), harden_coeff(p), kin_coeff, kin_state(p))."""
    h = params.hardening.upper()
    c = params.consts.reshape(-1)

    if h == "MULTILINEAR":
        tab = params.table if params.table is not None else \
            params.consts.reshape(-1, 2)
        ys = jnp.asarray(tab[:, 0])
        ps = jnp.asarray(tab[:, 1])
        slopes = jnp.diff(ys) / jnp.maximum(jnp.diff(ps), 1e-30)

        def yield_stress(p):
            return jnp.interp(p, ps, ys)

        def harden(p):
            idx = jnp.clip(jnp.searchsorted(ps, p, side="right") - 1, 0,
                           len(slopes) - 1)
            return slopes[idx]

        return yield_stress, harden, 0.0, (lambda p: 0.0 * p)

    if h == "SWIFT":
        e0, k, n = c[0], c[1], c[2]
        return (lambda p: k * (e0 + p) ** n,
                lambda p: k * n * (e0 + p) ** (n - 1.0),
                0.0, (lambda p: 0.0 * p))

    if h in ("RAMBERG-OSGOOD", "RAMBERGOSGOOD"):
        e0, D, n = c[0], c[1], c[2]

        def yield_stress(p):
            return jnp.where(p <= e0, D, D * (p / e0) ** (1.0 / n))

        def harden(p):
            ef = yield_stress(p)
            return D * (ef / D) ** (1.0 - n) / (e0 * n)

        return yield_stress, harden, 0.0, (lambda p: 0.0 * p)

    if h == "KINEMATIC":
        s0, hk = c[0], c[1]
        return (lambda p: s0 + 0.0 * p, lambda p: 0.0 * p, hk,
                (lambda p: hk * p))

    if h == "COMBINED":
        s0, hiso, hk = c[0], c[1], c[2]
        return (lambda p: s0 + hiso * p, lambda p: hiso + 0.0 * p, hk,
                (lambda p: hk * p))

    # LINEAR (default): sigma_y = c0 + c1 * p
    s0 = c[0]
    hh = c[1] if len(c) > 1 else 0.0
    return (lambda p: s0 + hh * p, lambda p: hh + 0.0 * p, 0.0,
            (lambda p: 0.0 * p))


def _deviator(sig):
    j1 = (sig[..., 0] + sig[..., 1] + sig[..., 2]) / 3.0
    dev = sig.at[..., 0].add(-j1).at[..., 1].add(-j1).at[..., 2].add(-j1) \
        if hasattr(sig, "at") else sig
    dev = jnp.concatenate([sig[..., :3] - j1[..., None], sig[..., 3:]], -1)
    return j1, dev


def _eq_stress(dev):
    j2 = 0.5 * jnp.sum(dev[..., :3] ** 2, -1) + jnp.sum(dev[..., 3:] ** 2, -1)
    return jnp.sqrt(3.0 * j2)


def return_mapping_mises(params: PlasticParams, sig_trial, p_committed,
                         back, maxiter: int = 5, tol: float = 1e-3):
    """Radial return (BackwardEuler yType==0 arm), batched over (..., 6).

    Args:
      sig_trial: elastic trial stress D_e : eps_total.
      p_committed: committed equivalent plastic strain (scalar field).
      back: back-stress (kinematic), same shape as sig_trial.

    Returns (sigma, p_new, yielded(bool), back_new).
    """
    ys_f, h_f, kin_h, kin_f = make_hardening(params)
    G = params.G
    j1, dev = _deviator(sig_trial)
    if params.kinematic:
        dev_eff = dev - back
    else:
        dev_eff = dev
    yd = _eq_stress(dev_eff)
    betan = kin_f(p_committed)
    f0 = yd - ys_f(p_committed)

    yielded = f0 > tol

    dlam = jnp.zeros_like(yd)
    f = f0
    for _ in range(maxiter):
        H = h_f(p_committed + dlam)
        KH = kin_h if np.isscalar(kin_h) else kin_h
        dd = 3.0 * G + H + KH
        dlam_new = dlam + f / dd
        dlam_new = jnp.maximum(dlam_new, 0.0)
        KK = kin_f(p_committed + dlam_new)
        f = yd - 3.0 * G * dlam_new - ys_f(p_committed + dlam_new) \
            - (KK - betan)
        dlam = dlam_new
    dlam = jnp.where(yielded, dlam, 0.0)
    p_new = p_committed + dlam

    safe_yd = jnp.where(yd == 0, 1.0, yd)
    scale = 1.0 - 3.0 * dlam * G / safe_yd
    dev_new = scale[..., None] * dev_eff
    sig_new = jnp.concatenate(
        [dev_new[..., :3] + j1[..., None], dev_new[..., 3:]], -1)
    back_new = back
    if params.kinematic:
        KK = kin_f(p_new)
        back_new = back + ((KK - betan) / safe_yd)[..., None] * dev_eff
        sig_new = sig_new + back_new
    sig_out = jnp.where(yielded[..., None], sig_new, sig_trial)
    return sig_out, p_new, yielded, back_new


def plastic_tangent(params: PlasticParams, De, sig, p, back, yielded):
    """D = De - (De a)(De a)^T / (H + Kh + a:De:a) on yielded points
    (calElastoPlasticMatrix yType==0)."""
    ys_f, h_f, kin_h, kin_f = make_hardening(params)
    j1, dev = _deviator(sig)
    if params.kinematic:
        dev = dev - back
    j2 = 0.5 * jnp.sum(dev[..., :3] ** 2, -1) + jnp.sum(dev[..., 3:] ** 2, -1)
    safe = jnp.where(j2 == 0, 1.0, j2)
    dj2 = jnp.concatenate([dev[..., :3], 2.0 * dev[..., 3:]], -1) / \
        (2.0 * jnp.sqrt(safe))[..., None]
    a = jnp.sqrt(3.0) * dj2
    H = h_f(p)
    da = jnp.einsum("...kl,...l->...k", De, a)
    denom = H + kin_h + jnp.einsum("...k,...k->...", da, a)
    Dp = De - da[..., :, None] * da[..., None, :] / denom[..., None, None]
    return jnp.where(yielded[..., None, None], Dp, De)
