"""METHOD=DIRECT across every driver equals the iterative answer.

The reference's solve_LINEQ dispatches MUMPS/direct solvers from every
analysis (set_arrays_DirectSolver.f90); here the host-SuperLU arms are
cross-checked against the CG arms on small models: implicit dynamics
(factor-once effective matrix), eigen (factor-once shift-invert), and
transient heat (refactor per T-dependent step)."""

import os
import tempfile
import textwrap

import numpy as np
import pytest

from frontistr_tpu.meshgen import box_tet4
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model


def _cfg(text, method):
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(text.replace("{M}", method))
        p = fh.name
    cfg = read_cnt(p)
    os.unlink(p)
    return cfg


DYN = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE=DYNAMIC
    !DYNAMIC
     1, 1
     0.0, 0.03, 3, 0.01
     0.5, 0.25
     1, 1, 0.5, 0.0
     10
    !BOUNDARY, GRPID=1
     X0, 1, 3, 0.0
    !CLOAD, GRPID=1
     X1, 3, -1.5
    !STEP, SUBSTEPS=1, CONVERG=1.0e-8
     BOUNDARY, 1
     LOAD, 1
    !MATERIAL, NAME=M1
    !ELASTIC
     500.0, 0.3
    !DENSITY
     2.0
    !SOLVER,METHOD={M},PRECOND=1,ITERLOG=NO,TIMELOG=NO
     10000, 1
     1.0e-12, 1.0, 0.0
    !END
""")


def test_direct_implicit_dynamics_matches():
    from frontistr_tpu.analysis.dynamic import run_dynamic

    def run(method):
        model = build_struct_model(box_tet4(3, 3, 3), _cfg(DYN, method))
        out = run_dynamic(model)
        return np.asarray(out.u), np.asarray(out.vel)

    u_cg, v_cg = run("CG")
    u_d, v_d = run("DIRECT")
    assert np.abs(u_cg).max() > 1e-8
    np.testing.assert_allclose(u_d, u_cg, rtol=1e-7,
                               atol=1e-10 * np.abs(u_cg).max())
    np.testing.assert_allclose(v_d, v_cg, rtol=1e-7,
                               atol=1e-10 * max(np.abs(v_cg).max(), 1.0))


EIG = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE=EIGEN
    !EIGEN
     4, 1.0e-10, 60
    !BOUNDARY
     X0, 1, 3, 0.0
    !MATERIAL, NAME=M1
    !ELASTIC
     1000.0, 0.3
    !DENSITY
     1.0
    !SOLVER,METHOD={M},ITERLOG=NO,TIMELOG=NO
     10000, 1
     1.0e-10, 1.0, 0.0
    !END
""")


def test_direct_eigen_matches():
    from frontistr_tpu.analysis.eigen import run_eigen

    def run(method):
        model = build_struct_model(box_tet4(3, 3, 3), _cfg(EIG, method))
        return run_eigen(model)

    r_d = run("MUMPS")
    r_cg = run("CG")
    np.testing.assert_allclose(r_d.freq, r_cg.freq, rtol=1e-7)


HEAT = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE=HEAT
    !HEAT
     0.1, 0.5
    !FIXTEMP
     X0, 100.0
    !CFLUX
     X1, 5.0
    !SOLVER, METHOD={M}
     10000, 1
     1.0e-10, 1.0, 0.0
    !END
""")


def test_direct_transient_heat_matches(tmp_path):
    from frontistr_tpu.analysis.heat import run_heat

    def run(method):
        cfg = _cfg(HEAT, method)
        mesh = box_tet4(3, 3, 3)
        mesh.materials["M1"].items[1] = [[7.85e-6]]
        mesh.materials["M1"].items[2] = [[4.61e2]]
        mesh.materials["M1"].items[3] = [[5.0e1]]
        return run_heat(mesh, cfg, str(tmp_path)).T

    T_cg = run("CG")
    T_d = run("DIRECT")
    assert np.abs(T_cg).max() > 1.0
    np.testing.assert_allclose(T_d, T_cg, rtol=1e-8,
                               atol=1e-9 * np.abs(T_cg).max())
