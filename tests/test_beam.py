"""Beam 611/641 analytic checks: Euler-Bernoulli cantilever (exact for the
cubic-Hermite beam element even with one element)."""

import os
import tempfile

import numpy as np


MSH_611 = """!HEADER
 beam
!NODE
 1, 0., 0., 0.
 2, 10., 0., 0.
!ELEMENT, TYPE=611
 1, 1, 2
!SECTION, TYPE=BEAM, EGRP=ALL, MATERIAL=M1
 0., 0., 1., 1.0, 2.0, 2.0, 1.0
!MATERIAL, NAME=M1, ITEM=1
!ITEM=1, SUBITEM=2
 1000., 0.3
!END
"""

MSH_641 = """!HEADER
 beam341
!NODE
 1, 0., 0., 0.
 2, 10., 0., 0.
 3, 0., 0., 0.
 4, 10., 0., 0.
!ELEMENT, TYPE=641
 1, 1, 2, 3, 4
!SECTION, TYPE=BEAM, EGRP=ALL, MATERIAL=M1
 0., 0., 1., 1.0, 2.0, 2.0, 1.0
!MATERIAL, NAME=M1, ITEM=1
!ITEM=1, SUBITEM=2
 1000., 0.3
!END
"""

CNT_611 = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 1, 1, 6, 0.0
!CLOAD
 2, 3, -1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""

CNT_641 = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 1, 1, 3, 0.0
 3, 1, 3, 0.0
!CLOAD
 2, 3, -1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""


def _run(msh_text, cnt_text):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    with tempfile.TemporaryDirectory() as d:
        mp, cp = os.path.join(d, "b.msh"), os.path.join(d, "b.cnt")
        open(mp, "w").write(msh_text)
        open(cp, "w").write(cnt_text)
        mesh = read_mesh(mp)
        cfg = read_cnt(cp)
        model = build_struct_model(mesh, cfg)
        return model, run_linear_static(model)


def test_beam611_cantilever_tip_load():
    model, res = _run(MSH_611, CNT_611)
    assert model.ndof == 6
    # w = PL^3 / 3EI = -1 * 1000 / (3*1000*2)
    np.testing.assert_allclose(res.u[1, 2], -1000.0 / 6000.0, rtol=1e-8)
    # tip rotation theta_y = PL^2/2EI (sign: w' < 0 -> theta_y > 0)
    np.testing.assert_allclose(res.u[1, 4], 100.0 / 4000.0, rtol=1e-8)


def test_beam641_cantilever_tip_load():
    model, res = _run(MSH_641, CNT_641)
    assert model.ndof == 3
    np.testing.assert_allclose(res.u[1, 2], -1000.0 / 6000.0, rtol=1e-8)
    # node 4 carries the tip rotation vector
    np.testing.assert_allclose(res.u[3, 1], 100.0 / 4000.0, rtol=1e-8)


def test_beam611_axial_and_torsion():
    cnt = CNT_611.replace(" 2, 3, -1.0", " 2, 1, 5.0\n 2, 4, 2.0")
    model, res = _run(MSH_611, cnt)
    # u = NL/EA = 5*10/1000 ; twist = TL/GJ, G = 1000/2.6
    np.testing.assert_allclose(res.u[1, 0], 0.05, rtol=1e-8)
    G = 1000.0 / (2.0 * 1.3)
    np.testing.assert_allclose(res.u[1, 3], 2.0 * 10.0 / G, rtol=1e-8)
