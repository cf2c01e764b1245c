"""End-to-end tutorial workload runs (the reference ships no goldens for
these directories — convergence + physical sanity checks)."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

TUT = os.path.join(REFERENCE, "tutorial")


def _run(subdir, mesh_name, cnt_name, shorten=None):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    d = os.path.join(TUT, subdir)
    mesh = read_mesh(os.path.join(d, mesh_name))
    cfg = read_cnt(os.path.join(d, cnt_name))
    if shorten:
        cfg.steps[0].num_substep = shorten
        cfg.steps[0].initdt = 1.0 / shorten
    model = build_struct_model(mesh, cfg)
    res = run_nonlinear_static(model)
    return model, res


@requires_reference
def test_tutorial03_hyperelastic():
    model, res = _run("03_hyperelastic_cylinder", "cylinder.msh",
                      "cylinder.cnt")
    # prescribed LOADS displacement is -7.0 at full load
    assert abs(np.abs(res.u).max() - 7.0) < 1e-6
    assert np.isfinite(res.nodal_mises).all()


@requires_reference
def test_tutorial05_plastic_necking():
    model, res = _run("05_plastic_cylinder", "necking.msh", "necking.cnt",
                      shorten=5)
    assert abs(np.abs(res.u).max() - 7.0) < 1e-6
    # yielding must have occurred (initial yield 450)
    assert res.nodal_mises.max() > 450.0


@requires_reference
def test_tutorial07_viscoelastic():
    model, res = _run("07_viscoelastic_cylinder", "cylinder.msh",
                      "cylinder.cnt")
    assert np.isfinite(res.u).all()
    assert np.abs(res.u).max() > 0


@requires_reference
def test_tutorial08_creep():
    model, res = _run("08_creep_cylinder", "cylinder.cnt".replace(
        ".cnt", ".msh"), "cylinder.cnt", shorten=5)
    assert np.isfinite(res.u).all()
    assert np.abs(res.u).max() > 0
