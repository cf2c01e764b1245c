"""Abaqus .inp reader: same model via .inp and native .msh must match."""

import os
import tempfile

import numpy as np

INP = """*HEADING
 abaqus cube
*NODE, NSET=NALL
 1, 0., 0., 0.
 2, 1., 0., 0.
 3, 1., 1., 0.
 4, 0., 1., 0.
 5, 0., 0., 1.
 6, 1., 0., 1.
 7, 1., 1., 1.
 8, 0., 1., 1.
*ELEMENT, TYPE=C3D8, ELSET=EALL
 1, 1, 2, 3, 4, 5, 6, 7, 8
*NSET, NSET=BOT
 1, 2, 3, 4
*NSET, NSET=TOP, GENERATE
 5, 8, 1
*SOLID SECTION, ELSET=EALL, MATERIAL=M1
*MATERIAL, NAME=M1
*ELASTIC
 210000., 0.3
*DENSITY
 7.85e-9
"""

MSH = """!HEADER
 native cube
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
!MATERIAL, NAME=M1, ITEM=2
!ITEM=1, SUBITEM=2
 210000., 0.3
!ITEM=2, SUBITEM=1
 7.85e-9
!NGROUP, NGRP=BOT
 1, 2, 3, 4
!NGROUP, NGRP=TOP
 5, 6, 7, 8
!END
"""

CNT = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 BOT, 3, 3, 0.0
 1, 1, 2, 0.0
 2, 2, 2, 0.0
!CLOAD
 TOP, 3, -25.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""


def _solve(mesh):
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(CNT)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    model = build_struct_model(mesh, cfg)
    return run_linear_static(model)


def test_abaqus_matches_native():
    from frontistr_tpu.io.abaqusio import read_abaqus
    from frontistr_tpu.io.meshio import read_mesh
    with tempfile.TemporaryDirectory() as d:
        ip = os.path.join(d, "m.inp")
        mp = os.path.join(d, "m.msh")
        open(ip, "w").write(INP)
        open(mp, "w").write(MSH)
        ma = read_abaqus(ip)
        mn = read_mesh(mp)
    assert ma.blocks[0].etype == 361
    np.testing.assert_array_equal(ma.blocks[0].conn, mn.blocks[0].conn)
    np.testing.assert_array_equal(ma.node_groups["TOP"],
                                  mn.node_groups["TOP"])
    ra = _solve(ma)
    rn = _solve(mn)
    np.testing.assert_allclose(ra.u, rn.u, atol=1e-14)
    # uniaxial: u_z = sigma/E = 100/210000
    np.testing.assert_allclose(ra.u[4:, 2], -100.0 / 210000.0, rtol=1e-9)


def test_abaqus_secopt_plane_strain():
    from frontistr_tpu.io.abaqusio import read_abaqus
    inp = """*NODE
 1, 0., 0.
 2, 1., 0.
 3, 1., 1.
 4, 0., 1.
*ELEMENT, TYPE=CPE4, ELSET=E1
 1, 1, 2, 3, 4
*SOLID SECTION, ELSET=E1, MATERIAL=M1
 1.0
*MATERIAL, NAME=M1
*ELASTIC
 1000., 0.3
"""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.inp")
        open(p, "w").write(inp)
        m = read_abaqus(p)
    assert m.blocks[0].etype == 241
    assert m.sections[0].opt == 1          # plane strain
    assert m.sections[0].values[0] == 1.0
