"""NASTRAN bulk-data reader: formats, continuations, solve equivalence."""

import os
import tempfile

import numpy as np

BULK = """$ cube under uniaxial load
BEGIN BULK
GRID,1,,0.0,0.0,0.0
GRID,2,,1.0,0.0,0.0
GRID,3,,1.0,1.0,0.0
GRID,4,,0.0,1.0,0.0
GRID    5               0.0     0.0     1.0
GRID    6               1.0     0.0     1.0
GRID    7               1.0     1.0     1.0
GRID    8               0.0     1.0     1.0
CHEXA,1,10,1,2,3,4,5,6,
+,7,8
PSOLID,10,100
MAT1,100,210000.,,0.3,7.85-9
ENDDATA
"""

CNT = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 1, 1, 3, 0.0
 2, 2, 3, 0.0
 3, 3, 3, 0.0
 4, 3, 3, 0.0
!CLOAD
 5, 3, 25.0
 6, 3, 25.0
 7, 3, 25.0
 8, 3, 25.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""


def test_nastran_reads_and_solves():
    from frontistr_tpu.io.nastranio import read_nastran
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    with tempfile.TemporaryDirectory() as d:
        mp, cp = os.path.join(d, "m.nas"), os.path.join(d, "m.cnt")
        open(mp, "w").write(BULK)
        open(cp, "w").write(CNT)
        mesh = read_nastran(mp)
        cfg = read_cnt(cp)
    assert mesh.blocks[0].etype == 361
    md = mesh.materials["MAT100"]
    assert md.items[1][0] == [210000.0, 0.3]
    assert abs(md.items[2][0][0] - 7.85e-9) < 1e-20   # 7.85-9 parsed
    model = build_struct_model(mesh, cfg)
    res = run_linear_static(model)
    # sigma = 100 -> u_z = 100/E at the free corners (uniaxial-ish)
    uz = res.u[4:, 2]
    np.testing.assert_allclose(uz.mean(), 100.0 / 210000.0, rtol=0.1)
