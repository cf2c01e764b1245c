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

Mohr-Coulomb / Drucker-Prager return mapping included (tests/test_mcdp.py).
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
    yield_func: str = "MISES"        # MISES / MOHR-COULOMB / DRUCKER-PRAGER

    @property
    def G(self):
        return self.youngs / (2.0 * (1.0 + self.poisson))

    @property
    def K(self):
        return self.youngs / (3.0 * (1.0 - 2.0 * self.poisson))

    @property
    def kinematic(self):
        return self.hardening in ("KINEMATIC", "COMBINED")

    @property
    def phi(self):
        """Friction angle in radians (!PLASTIC MC/DP row: c, phi_deg, H)."""
        return float(self.consts.reshape(-1)[1]) * 3.141592653589793 / 180.0

    @property
    def dp_eta(self):
        # fstr_ctrl_material.f90:461-464 outer-cone DP constants
        sf = np.sin(self.phi)
        return 2.0 * sf / (np.sqrt(3.0) * (3.0 + sf))

    @property
    def dp_xi(self):
        sf, cf = np.sin(self.phi), np.cos(self.phi)
        return 6.0 * cf / (np.sqrt(3.0) * (3.0 + sf))


def make_hardening(params: PlasticParams):
    """Returns (yield_stress(p), harden_coeff(p), kin_coeff, kin_state(p))."""
    h = params.hardening.upper()
    c = params.consts.reshape(-1)

    if params.yield_func.upper() != "MISES":
        # MC/DP data row is (c, phi_deg, H): cohesion-style linear hardening
        s0 = c[0]
        hh = c[2] if len(c) > 2 else 0.0
        return (lambda p: s0 + hh * p, lambda p: hh + 0.0 * p, 0.0,
                (lambda p: 0.0 * p))

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


def _lode(dev):
    """(J2, J3, sin3theta clipped) from deviatoric Voigt."""
    j2 = 0.5 * jnp.sum(dev[..., :3] ** 2, -1) + \
        jnp.sum(dev[..., 3:] ** 2, -1)
    d1, d2, d3, d4, d5, d6 = [dev[..., i] for i in range(6)]
    j3 = (d1 * d2 * d3 + 2.0 * d4 * d5 * d6 - d2 * d6 * d6
          - d3 * d4 * d4 - d1 * d5 * d5)
    safe = jnp.where(j2 <= 0.0, 1.0, j2)
    s3t = jnp.clip(-3.0 * jnp.sqrt(3.0) * j3 / (2.0 * safe ** 1.5),
                   -1.0, 1.0)
    return j2, j3, s3t


def return_mapping_dp(params: PlasticParams, sig_trial, p_committed,
                      back, maxiter: int = 5, tol: float = 1e-3):
    """Drucker-Prager return (BackwardEuler yType==2), batched.

    Onset uses the full-trace yield f = sqrt(J2) + eta*tr(sigma) - xi*
    sigma_y (calYieldFunc:342-344); the Newton loop then iterates the
    reference's mean-stress form (BackwardEuler:533-556) -- both quirks
    replicated."""
    ys_f, h_f, _, _ = make_hardening(params)
    G, K = params.G, params.K
    eta, xi = params.dp_eta, params.dp_xi
    j1m, dev = _deviator(sig_trial)           # j1m = mean stress
    j2 = 0.5 * jnp.sum(dev[..., :3] ** 2, -1) + \
        jnp.sum(dev[..., 3:] ** 2, -1)
    yd = jnp.sqrt(jnp.maximum(j2, 0.0))
    f0 = yd + eta * (3.0 * j1m) - xi * ys_f(p_committed)
    yielded = f0 > tol
    dlam = jnp.zeros_like(yd)
    f = f0
    for _ in range(maxiter):
        H = h_f(p_committed + xi * dlam)
        dd = G + K * eta * eta + H * xi * xi
        dlam = jnp.maximum(dlam + f / dd, 0.0)
        f = yd - G * dlam + eta * (j1m - K * eta * dlam) \
            - xi * ys_f(p_committed + xi * dlam)
    dlam = jnp.where(yielded, dlam, 0.0)
    p_new = p_committed + xi * dlam
    safe_yd = jnp.where(yd == 0, 1.0, yd)
    dev_new = (1.0 - G * dlam / safe_yd)[..., None] * dev
    j1_new = j1m - K * eta * dlam
    sig_new = jnp.concatenate(
        [dev_new[..., :3] + j1_new[..., None], dev_new[..., 3:]], -1)
    sig_out = jnp.where(yielded[..., None], sig_new, sig_trial)
    return sig_out, p_new, yielded, back


def return_mapping_mc(params: PlasticParams, sig_trial, p_committed,
                      back, maxiter: int = 5, tol: float = 1e-3):
    """Mohr-Coulomb principal-stress return (BackwardEuler yType==1):
    smooth-cone onset check (calYieldFunc:329-341), then a one-vector
    return on the max/min principal pair with the trial Lode angle frozen,
    reassembled through the trial eigenprojection."""
    from frontistr_tpu.utils.linalg import eigh3_voigt
    ys_f, h_f, _, _ = make_hardening(params)
    G, K = params.G, params.K
    phi = params.phi
    sf, cf = np.sin(phi), np.cos(phi)
    j1m, dev = _deviator(sig_trial)
    j2, j3, s3t = _lode(dev)
    sita = jnp.arcsin(s3t) / 3.0
    sq_j2 = jnp.sqrt(jnp.maximum(j2, 0.0))
    f0 = (jnp.cos(sita) - jnp.sin(sita) * sf / jnp.sqrt(3.0)) * sq_j2 \
        + (3.0 * j1m) * sf / 3.0 - ys_f(p_committed) * cf
    yielded = f0 > tol

    evals, evecs = eigh3_voigt(sig_trial)     # ascending: (min, mid, max)
    smin, smid, smax = evals[..., 0], evals[..., 1], evals[..., 2]
    dlam = jnp.zeros_like(smax)
    f = f0
    for _ in range(maxiter):
        pcur = p_committed + 2.0 * dlam * cf
        H = h_f(pcur)
        dd = 4.0 * G * (1.0 + sf * jnp.sin(sita) / 3.0) \
            + 4.0 * K * sf * jnp.sin(sita) + 4.0 * H * cf * cf
        dlam = jnp.maximum(dlam + f / dd, 0.0)
        yd = ys_f(p_committed + 2.0 * dlam * cf)
        f = smax - smin + (smax + smin) * sf \
            - (4.0 * G * (1.0 + sf * jnp.sin(sita) / 3.0)
               + 4.0 * K * sf * jnp.sin(sita)) * dlam \
            - 2.0 * yd * cf
    dlam = jnp.where(yielded, dlam, 0.0)
    p_new = p_committed + 2.0 * dlam * cf
    smax_n = smax - (2.0 * G * (1.0 + sf / 3.0) + 2.0 * K * sf) * dlam
    smin_n = smin + (2.0 * G * (1.0 - sf / 3.0) - 2.0 * K * sf) * dlam
    smid_n = smid + (4.0 * G / 3.0 - 2.0 * K) * sf * dlam
    pr = jnp.stack([smin_n, smid_n, smax_n], -1)
    mat = jnp.einsum("...ik,...k,...jk->...ij", evecs, pr, evecs)
    sig_new = jnp.stack([mat[..., 0, 0], mat[..., 1, 1], mat[..., 2, 2],
                         mat[..., 0, 1], mat[..., 1, 2], mat[..., 2, 0]],
                        -1)
    sig_out = jnp.where(yielded[..., None], sig_new, sig_trial)
    return sig_out, p_new, yielded, back


def return_mapping(params: PlasticParams, sig_trial, p_committed, back,
                   **kw):
    yf = params.yield_func.upper()
    if yf.startswith("MOHR"):
        return return_mapping_mc(params, sig_trial, p_committed, back,
                                 **kw)
    if yf.startswith("DRUCKER"):
        return return_mapping_dp(params, sig_trial, p_committed, back,
                                 **kw)
    return return_mapping_mises(params, sig_trial, p_committed, back,
                                **kw)


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
    yf = params.yield_func.upper()
    if yf.startswith("DRUCKER"):
        dj1 = jnp.concatenate([jnp.ones_like(dev[..., :3]),
                               jnp.zeros_like(dev[..., 3:])], -1)
        a = params.dp_eta * dj1 + dj2
    elif yf.startswith("MOHR"):
        # calElastoPlasticMatrix yType==1 flow vector
        phi = params.phi
        sfai = np.sin(phi)
        j2f, j3, s3t = _lode(dev)
        degen = jnp.abs(jnp.abs(s3t) - 1.0) < 1e-8
        sita = jnp.arcsin(jnp.clip(s3t, -1.0, 1.0)) / 3.0
        t3 = jnp.tan(3.0 * sita)
        C2s = jnp.cos(sita) * (jnp.tan(sita) * t3 + sfai *
                               (t3 - jnp.tan(sita) / jnp.sqrt(3.0)))
        safe_j2 = jnp.where(j2f == 0, 1.0, j2f)
        C3s = jnp.sqrt(3.0) * jnp.sin(sita) + jnp.cos(sita) * sfai / \
            (2.0 * safe_j2 * jnp.cos(3.0 * sita))
        C1 = jnp.where(degen, 0.0, sfai / 3.0)
        C2 = jnp.where(degen, jnp.sqrt(3.0), C2s)
        C3 = jnp.where(degen, 0.0, C3s)
        dj1 = jnp.concatenate([jnp.ones_like(dev[..., :3]),
                               jnp.zeros_like(dev[..., 3:])], -1)
        d1, d2, d3, d4, d5, d6 = [dev[..., i] for i in range(6)]
        dj3 = jnp.stack([
            d2 * d3 - d5 * d5 + j2f / 3.0,
            d1 * d3 - d6 * d6 + j2f / 3.0,
            d1 * d2 - d4 * d4 + j2f / 3.0,
            2.0 * (d5 * d6 - d3 * d4),
            2.0 * (d4 * d6 - d1 * d5),
            2.0 * (d4 * d5 - d2 * d6)], -1)
        a = C1[..., None] * dj1 + C2[..., None] * dj2 \
            + C3[..., None] * dj3
    else:
        a = jnp.sqrt(3.0) * dj2
    H = h_f(p)
    da = jnp.einsum("...kl,...l->...k", De, a)
    denom = H + kin_h + jnp.einsum("...k,...k->...", da, a)
    Dp = De - da[..., :, None] * da[..., None, :] / denom[..., None, None]
    return jnp.where(yielded[..., None, None], Dp, De)
