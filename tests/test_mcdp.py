"""Mohr-Coulomb / Drucker-Prager plasticity: unit return-mapping physics
plus a full single-element NLSTATIC drive."""

import os
import tempfile

import numpy as np


def _params(yield_func, c=10.0, phi=30.0, H=0.0):
    from frontistr_tpu.fem.plastic import PlasticParams
    return PlasticParams(1000.0, 0.3, "LINEAR",
                         np.asarray([c, phi, H]), yield_func=yield_func)


def test_dp_uniaxial_consistency():
    import jax.numpy as jnp
    from frontistr_tpu.fem.plastic import return_mapping_dp
    p = _params("DRUCKER-PRAGER")
    eta, xi = p.dp_eta, p.dp_xi
    # uniaxial compression trial beyond yield
    s_onset = xi * 10.0 / (1.0 / np.sqrt(3.0) - eta)
    sig = jnp.asarray([[-1.5 * s_onset, 0., 0., 0., 0., 0.]])
    pc = jnp.zeros(1)
    back = jnp.zeros((1, 6))
    sn, pn, yl, _ = return_mapping_dp(p, sig, pc, back)
    assert bool(yl[0])
    assert float(pn[0]) > 0.0
    # returned stress satisfies the mean-stress DP surface
    dev = np.asarray(sn[0, :3]) - np.asarray(sn[0, :3]).mean()
    j2 = 0.5 * np.sum(dev ** 2) + np.sum(np.asarray(sn[0, 3:]) ** 2)
    f = np.sqrt(j2) + eta * np.asarray(sn[0, :3]).mean() - xi * 10.0
    assert abs(f) < 1e-6 * s_onset
    # below onset: elastic
    sig_el = jnp.asarray([[-0.5 * s_onset, 0., 0., 0., 0., 0.]])
    sn2, pn2, yl2, _ = return_mapping_dp(p, sig_el, pc, back)
    assert not bool(yl2[0])
    np.testing.assert_allclose(np.asarray(sn2), np.asarray(sig_el))


def test_mc_shear_consistency():
    import jax.numpy as jnp
    from frontistr_tpu.fem.plastic import return_mapping_mc
    p = _params("MOHR-COULOMB", c=10.0, phi=30.0)
    sf, cf = np.sin(np.deg2rad(30.0)), np.cos(np.deg2rad(30.0))
    # compression + confinement trial state beyond the MC line
    sig = jnp.asarray([[-80.0, -10.0, -30.0, 0., 0., 0.]])
    pc = jnp.zeros(1)
    back = jnp.zeros((1, 6))
    sn, pn, yl, _ = return_mapping_mc(p, sig, pc, back)
    assert bool(yl[0])
    assert float(pn[0]) > 0.0
    # the reference's Newton converges the TRIAL-linearized equation
    # (BackwardEuler:487-513, Lode angle frozen at the trial state):
    # f = smax_t - smin_t + (smax_t+smin_t) sf
    #     - (4G(1+sf sin(theta)/3) + 4K sf sin(theta)) dlam - 2 yd cf = 0
    G, K = p.G, p.K
    tr = np.sort(np.asarray(sig[0, :3]))
    smin_t, smax_t = tr[0], tr[-1]
    dev = np.asarray(sig[0, :3]) - np.asarray(sig[0, :3]).mean()
    j2 = 0.5 * np.sum(dev ** 2)
    j3 = np.prod(dev)
    sita = np.arcsin(np.clip(-3 * np.sqrt(3) * j3 / (2 * j2 ** 1.5),
                             -1, 1)) / 3.0
    dlam = float(pn[0]) / (2.0 * cf)
    f_it = smax_t - smin_t + (smax_t + smin_t) * sf \
        - (4 * G * (1 + sf * np.sin(sita) / 3)
           + 4 * K * sf * np.sin(sita)) * dlam - 2 * 10.0 * cf
    assert abs(f_it) < 1e-3 * 80.0
    # the actual MC surface residual shrinks vs the trial state (the
    # reference's update leaves O(sin(theta)-sin(phi)) residual since the
    # principal corrections use phi while the Newton used theta)
    def f_mc(s6):
        pr = np.sort(np.asarray(s6[:3]))
        return pr[-1] - pr[0] + (pr[-1] + pr[0]) * sf - 2 * 10.0 * cf
    assert abs(f_mc(np.asarray(sn[0]))) < 0.5 * abs(f_mc(
        np.asarray(sig[0])))


def test_dp_element_drive():
    """Single hex8 under growing compression: NLSTATIC with DP yields and
    converges; mises stress caps near the DP surface."""
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    msh = """!HEADER
 dp
!NODE
 1, 0., 0., 0.
 2, 1., 0., 0.
 3, 1., 1., 0.
 4, 0., 1., 0.
 5, 0., 0., 1.
 6, 1., 0., 1.
 7, 1., 1., 1.
 8, 0., 1., 1.
!ELEMENT, TYPE=361
 1, 1, 2, 3, 4, 5, 6, 7, 8
!SECTION, TYPE=SOLID, EGRP=ALL, MATERIAL=M1
!NGROUP, NGRP=BOT
 1, 2, 3, 4
!NGROUP, NGRP=TOP
 5, 6, 7, 8
!END
"""
    cnt = """!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY
 BOT, 3, 3, 0.0
 1, 1, 2, 0.0
 2, 2, 2, 0.0
!BOUNDARY
 TOP, 3, 3, -0.05
!STEP, SUBSTEPS=5, CONVERG=1.0e-6
!MATERIAL, NAME=M1
!ELASTIC, INFINITE
 1000.0, 0.3
!PLASTIC, YIELD=DRUCKER-PRAGER, INFINITE
 10.0, 20.0, 50.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    with tempfile.TemporaryDirectory() as d:
        mp, cp = os.path.join(d, "m.msh"), os.path.join(d, "m.cnt")
        open(mp, "w").write(msh)
        open(cp, "w").write(cnt)
        mesh = read_mesh(mp)
        cfg = read_cnt(cp)
    model = build_struct_model(mesh, cfg)
    res = run_nonlinear_static(model)
    # elastic would give |s33| = E' * 0.05 >> yield-limited stress
    s33 = res.elem_stress[0, 2]
    assert s33 < 0.0
    from frontistr_tpu.fem.plastic import PlasticParams
    p = _params("DRUCKER-PRAGER", c=10.0, phi=20.0, H=50.0)
    elastic_s33 = 1000.0 * (1 - 0.3) / ((1 + 0.3) * (1 - 0.6)) * 0.05
    assert abs(s33) < 0.7 * elastic_s33      # capped well below elastic


def test_follower_pressure_differs_from_dead_load():
    """NLGEOM plate under face pressure: the follower load (default) tracks
    the rotating surface, a dead load does not -- results must differ and
    both converge."""
    import tempfile
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    msh = """!HEADER
 fol
!NODE
 1, 0., 0., 0.
 2, 1., 0., 0.
 3, 1., 1., 0.
 4, 0., 1., 0.
 5, 0., 0., 0.2
 6, 1., 0., 0.2
 7, 1., 1., 0.2
 8, 0., 1., 0.2
 9, 2., 0., 0.
 10, 2., 1., 0.
 11, 2., 0., 0.2
 12, 2., 1., 0.2
!ELEMENT, TYPE=361
 1, 1, 2, 3, 4, 5, 6, 7, 8
 2, 2, 9, 10, 3, 6, 11, 12, 7
!SECTION, TYPE=SOLID, EGRP=ALL, MATERIAL=M1
!NGROUP, NGRP=FIX
 1, 4, 5, 8
!END
"""
    cnt = """!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY
 FIX, 1, 3, 0.0
!DLOAD
 ALL, P2, 8.0
!STEP, SUBSTEPS=4, CONVERG=1.0e-6
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.3
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    import os
    with tempfile.TemporaryDirectory() as d:
        mp, cp = os.path.join(d, "m.msh"), os.path.join(d, "m.cnt")
        open(mp, "w").write(msh)
        open(cp, "w").write(cnt)
        mesh = read_mesh(mp)
        cfg = read_cnt(cp)
    model = build_struct_model(mesh, cfg)
    res_f = run_nonlinear_static(model)
    uf = res_f.u.copy()
    # dead load: disable the follower deck
    model2 = build_struct_model(mesh, cfg)
    model2.dload_grp = None
    res_d = run_nonlinear_static(model2)
    ud = res_d.u
    assert np.isfinite(uf).all() and np.isfinite(ud).all()
    # large deflection: load direction matters
    assert np.abs(uf).max() > 0.05
    assert np.abs(uf - ud).max() > 1e-3 * np.abs(uf).max()
