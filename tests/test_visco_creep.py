"""Analytic checks for viscoelastic (Prony) and Norton creep materials
(the reference ships no goldens for these; tutorials 07/08 only carry
meshes).  Single-element/known-solution tests instead."""

import numpy as np
import pytest


def _single_hex_model(cnt_text, nx=1):
    import tempfile, os
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    mesh = box_hex8(nx, 1, 1, density=1.0)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(cnt_text)
        path = f.name
    cfg = read_cnt(path)
    os.unlink(path)
    model = build_struct_model(mesh, cfg)
    return mesh, cfg, model


def test_visco_relaxation():
    """Confined uniaxial strain step: sigma_ax(t) = K eps + 4/3 G(t) eps
    with G(t) = G (mu0 + mu1 e^{-t/tau})."""
    E, nu = 1000.0, 0.3
    mu1, tau = 0.5, 1.0
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY, GRPID=1
 X0, 1, 1, 0.0
 Y0, 2, 2, 0.0
 Y1, 2, 2, 0.0
 Z0, 3, 3, 0.0
 Z1, 3, 3, 0.0
 X1, 1, 1, 0.01
!STEP, TYPE=VISCO, SUBSTEPS=20, CONVERG=1.0e-8
 0.25, 5.0
 BOUNDARY, 1
!MATERIAL, NAME=M1
!ELASTIC
 {E}, {nu}
!VISCOELASTIC
 {mu1}, {tau}
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    mesh, cfg, model = _single_hex_model(cnt)
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    res = run_nonlinear_static(model)
    # after t=5 (=5 tau), G(t) ~ G mu0
    G = E / (2 * (1 + nu))
    K = E / (3 * (1 - 2 * nu))
    eps = 0.01
    t = 5.0
    # NOTE the BCs ramp eps linearly over [0,5]; use hereditary integral
    # eps(t') = eps * t'/5:  sigma = K eps + 4/3 G eps (mu0 + mu1 *
    #   (tau/T)(1 - e^{-T/tau}))  with T=5
    mu0 = 1 - mu1
    relax = mu0 + mu1 * (tau / t) * (1 - np.exp(-t / tau))
    sig_expect = K * eps + 4.0 / 3.0 * G * eps * relax
    sig_ax = res.elem_stress[0, 0]
    assert abs(sig_ax - sig_expect) / sig_expect < 0.02, \
        (sig_ax, sig_expect)


def test_creep_norton_uniaxial():
    """Dead uniaxial stress: creep strain rate = A sigma^n (m=0)."""
    E, nu = 200000.0, 0.3
    A, n = 1.0e-9, 3.0
    sig0 = 10.0   # CLOAD produces uniform sigma = 10 on unit cube
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY, GRPID=1
 X0, 1, 1, 0.0
 Y0, 2, 2, 0.0
 Z0, 3, 3, 0.0
!CLOAD, GRPID=1
 X1, 1, 2.5
!STEP, TYPE=VISCO, SUBSTEPS=10, CONVERG=1.0e-8
 10.0, 100.0
 BOUNDARY, 1
 LOAD, 1
!MATERIAL, NAME=M1
!ELASTIC
 {E}, {nu}
!CREEP, TYPE=NORTON
 {A}, {n}, 0.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    mesh, cfg, model = _single_hex_model(cnt)
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    res = run_nonlinear_static(model)
    # VISCO steps ramp the load by lambda; final sigma = 10.  Backward-Euler
    # integration evaluates the creep law at each substep's END stress:
    # eps_c = sum_k A (sig0 k/10)^n dt  (discrete, not the continuous
    # T/(n+1) integral)
    nsub, T = 10, 100.0
    dt = T / nsub
    eps_creep = sum(A * (sig0 * k / nsub) ** n * dt
                    for k in range(1, nsub + 1))
    eps_el = sig0 / E
    u_exp = eps_el + eps_creep
    u_ax = res.u[:, 0].max()
    assert abs(u_ax - u_exp) / u_exp < 0.01, (u_ax, u_exp)


def test_trs_shift_wlf_and_arrhenius():
    import jax
    import jax.numpy as jnp
    from frontistr_tpu.fem.visco import trs_shift
    # WLF: a(T0) = 1; above T0 relaxation accelerates (a > 1)
    c = np.asarray([20.0, 8.86, 101.6])
    assert float(trs_shift(jnp.asarray(20.0), c)) == 1.0
    a50 = float(trs_shift(jnp.asarray(50.0), c))
    assert a50 == pytest.approx(10 ** (8.86 * 30 / (101.6 + 30)), rel=1e-12)
    # Arrhenius
    c2 = np.asarray([300.0, 5000.0, 0.0])
    aT = float(trs_shift(jnp.asarray(350.0), c2, "ARRHENIUS"))
    assert aT == pytest.approx(np.exp(5000.0 * (1 / 350.0 - 1 / 300.0)),
                               rel=1e-12)


def test_trs_accelerates_relaxation():
    """Same Prony solid held at fixed strain: at elevated temperature the
    WLF-shifted material relaxes further in the same physical time."""
    import jax.numpy as jnp
    from frontistr_tpu.fem.visco import visco_update, trs_shift
    mus = jnp.asarray([0.5])
    taus = jnp.asarray([10.0])
    G, K = 100.0, 200.0
    eps = jnp.asarray([[0.01, 0.0, 0.0, 0.0, 0.0, 0.0]])
    vq = jnp.zeros((1, 1, 6))
    ven = jnp.zeros((1, 6))
    dt = 5.0
    c = np.asarray([20.0, 8.86, 101.6])
    a_hot = trs_shift(jnp.asarray(60.0), c)
    s_cold, _ = visco_update(eps, vq, ven, dt, G, K, mus, taus)
    s_hot, _ = visco_update(eps, vq, ven, dt * a_hot, G, K, mus, taus)
    # deviatoric part relaxes more when hot
    dev = lambda s: float(s[0, 0] - (s[0, 0] + s[0, 1] + s[0, 2]) / 3.0)
    assert dev(np.asarray(s_hot)) < dev(np.asarray(s_cold))
    # and exactly equals the cold response at the reduced time
    s_equiv, _ = visco_update(eps, vq, ven, float(dt * a_hot), G, K,
                              mus, taus)
    np.testing.assert_allclose(np.asarray(s_hot), np.asarray(s_equiv),
                               rtol=1e-12)
