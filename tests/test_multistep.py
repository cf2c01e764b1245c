"""Multi-!STEP load/BC bookkeeping (fstr_solve_NLGEOM per-step tables).

Reference semantics (fstr_ass_load.f90:69-70, fstr_AddBC.f90:42):
- a load group active in the current AND previous step is held at factor
  1.0; a newly active group ramps 0->1 over its first active step;
- prescribed displacements ramp (FACTOR2-FACTOR1) incrementally in every
  step they are active in, so a group active in two steps applies 2x its
  value in total.
"""

import os
import textwrap

import numpy as np
import pytest

from frontistr_tpu.run import run_directory

MSH = "/root/reference/examples/static/exA/A341.msh"

CNT_TWO_STEP_LOAD = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE=NLSTATIC
    !CLOAD, GRPID=1
     CL1, 2, 1.0
    !BOUNDARY, GRPID=1
     FIX, 1, 3, 0.0
    !ISTEP, TYPE=STATIC, SUBSTEPS=2
     BOUNDARY, 1
     LOAD, 1
    !ISTEP, TYPE=STATIC, SUBSTEPS=2
     BOUNDARY, 1
     LOAD, 1
    !SOLVER, METHOD=CG, PRECOND=1, ITERLOG=NO, TIMELOG=NO
     10000, 1
     1.0e-8, 1.0, 0.0
    !END
""")

CNT_ONE_STEP_LOAD = CNT_TWO_STEP_LOAD.replace(
    "!ISTEP, TYPE=STATIC, SUBSTEPS=2\n BOUNDARY, 1\n LOAD, 1\n"
    "!ISTEP, TYPE=STATIC, SUBSTEPS=2\n BOUNDARY, 1\n LOAD, 1\n",
    "!ISTEP, TYPE=STATIC, SUBSTEPS=2\n BOUNDARY, 1\n LOAD, 1\n")

CNT_TWO_STEP_BND = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE=NLSTATIC
    !BOUNDARY, GRPID=1
     FIX, 1, 3, 0.0
    !BOUNDARY, GRPID=2
     CL1, 2, 2, 0.5
    !ISTEP, TYPE=STATIC, SUBSTEPS=2
     BOUNDARY, 1
     BOUNDARY, 2
    !ISTEP, TYPE=STATIC, SUBSTEPS=2
     BOUNDARY, 1
     BOUNDARY, 2
    !SOLVER, METHOD=CG, PRECOND=1, ITERLOG=NO, TIMELOG=NO
     10000, 1
     1.0e-8, 1.0, 0.0
    !END
""")


def _prep(tmp_path, cnt_text, name):
    wd = tmp_path / name
    wd.mkdir()
    msh = open(MSH).read()
    # exA meshes define FIX/CL1 node groups? use the mesh's own groups:
    (wd / "m.msh").write_text(msh)
    (wd / "c.cnt").write_text(cnt_text)
    (wd / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-ENTIRE\n m.msh\n"
        "!CONTROL, NAME=fstrCNT\n c.cnt\n")
    return str(wd)


@pytest.fixture(scope="module")
def groups_ok():
    txt = open(MSH).read()
    if "FIX" not in txt or "CL1" not in txt:
        pytest.skip("exA mesh lacks FIX/CL1 node groups")


def test_two_step_same_load_equals_one_step(tmp_path, groups_ok):
    """A load active in both steps is held at full factor in step 2, so the
    final state equals the single-step solution (not re-ramped, not 2x)."""
    r1 = run_directory(_prep(tmp_path, CNT_ONE_STEP_LOAD, "one"))
    r2 = run_directory(_prep(tmp_path, CNT_TWO_STEP_LOAD, "two"))
    u1 = np.asarray(r1["static"].u)
    u2 = np.asarray(r2["static"].u)
    assert np.max(np.abs(u1)) > 0
    np.testing.assert_allclose(u2, u1, rtol=1e-6, atol=1e-12)


def test_two_step_boundary_accumulates(tmp_path, groups_ok):
    """A prescribed displacement active in both steps applies its value
    once per step (reference incremental-factor rule): total = 2x value."""
    res = run_directory(_prep(tmp_path, CNT_TWO_STEP_BND, "bnd"))
    u = np.asarray(res["static"].u).reshape(-1, 3)
    mesh = res["mesh"]
    cl1 = mesh.node_groups["CL1"]
    np.testing.assert_allclose(u[cl1, 1], 1.0, rtol=1e-8)
