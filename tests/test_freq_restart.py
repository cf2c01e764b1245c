"""Frequency response (resonance behavior) + restart round-trip tests."""

import os
import tempfile

import numpy as np
import pytest


def _beam_model(nlgeom=False, substeps=2):
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    mesh = box_hex8(6, 1, 1, lx=6.0, youngs=1000.0, density=1.0)
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE={'NLSTATIC' if nlgeom else 'STATIC'}
!BOUNDARY, GRPID=1
 X0, 1, 3, 0.0
!CLOAD, GRPID=1
 X1, 3, -0.05
!STEP, SUBSTEPS={substeps}, CONVERG=1.0e-8
 BOUNDARY, 1
 LOAD, 1
!EIGEN
 4, 1.0e-10, 60
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    with tempfile.NamedTemporaryFile("w", suffix=".cnt", delete=False) as f:
        f.write(cnt)
        path = f.name
    cfg = read_cnt(path)
    os.unlink(path)
    return mesh, cfg, build_struct_model(mesh, cfg)


def test_frequency_resonance_peak():
    """Response amplitude must peak at the first eigenfrequency."""
    from frontistr_tpu.analysis.eigen import run_eigen
    from frontistr_tpu.analysis.freq import run_frequency
    mesh, cfg, model = _beam_model()
    eig = run_eigen(model)
    f1 = eig.freq[0]
    res = run_frequency(model, 0.5 * f1, 1.5 * f1, n_freq=21,
                        ray_alpha=0.01, eigen_result=eig)
    peak = res.freqs[np.argmax(res.disp_amp_max)]
    assert abs(peak - f1) < (res.freqs[1] - res.freqs[0]) * 1.5
    # static limit: response at f->0 approx static deflection
    res0 = run_frequency(model, 1e-4, 2e-4, n_freq=2, ray_alpha=0.01,
                         eigen_result=eig)
    from frontistr_tpu.analysis.static import run_linear_static
    stat = run_linear_static(model)
    assert abs(res0.disp_amp_max[0] - np.abs(stat.u).max()) / \
        np.abs(stat.u).max() < 0.05


def test_restart_roundtrip():
    """Run 4 substeps with checkpointing every 2; resume from step 2 must
    reproduce the uninterrupted result."""
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    mesh, cfg, model = _beam_model(nlgeom=True, substeps=4)
    full = run_nonlinear_static(model)

    with tempfile.TemporaryDirectory() as d:
        rp = os.path.join(d, "restart.npz")
        # run only first 2 substeps by shrinking elapsetime, checkpointing
        mesh2, cfg2, model2 = _beam_model(nlgeom=True, substeps=4)
        cfg2.steps[0].elapsetime = 0.5
        cfg2.steps[0].num_substep = 2
        cfg2.steps[0].initdt = 0.25
        run_nonlinear_static(model2, restart_path=rp, restart_freq=1)
        assert os.path.exists(rp)
        # resume with the full deck
        mesh3, cfg3, model3 = _beam_model(nlgeom=True, substeps=4)
        res = run_nonlinear_static(model3, restart_path=rp)
        np.testing.assert_allclose(res.u, full.u, rtol=1e-8, atol=1e-12)


def test_static_eigen_combo():
    from frontistr_tpu.analysis.freq import run_static_eigen
    mesh, cfg, model = _beam_model(nlgeom=True, substeps=2)
    sres, eig = run_static_eigen(model)
    assert np.isfinite(sres.u).all()
    assert (eig.eigenvalues > 0).all()
