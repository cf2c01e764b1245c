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


def test_beam_641_fiber_stress_cantilever():
    """Tip-loaded cantilever: the 641 fiber stress at radius r must match
    M*r/I at the wall (Euler-Bernoulli bending stress)."""
    import tempfile
    import numpy as np
    from frontistr_tpu.io.meshio import Mesh, ElemBlock, Section, \
        MaterialDef
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static

    # 4 elements along x; 641 packing: nodes 1-2 translations,
    # nodes 3-4 rotation carriers (duplicated nodes)
    ne = 4
    L = 1.0
    xs = np.linspace(0, L, ne + 1)
    coords = np.zeros((2 * (ne + 1), 3))
    coords[:ne + 1, 0] = xs
    coords[ne + 1:, 0] = xs            # rotation-carrier twins
    conn = np.asarray([[i, i + 1, ne + 1 + i, ne + 2 + i]
                       for i in range(ne)])
    r = 0.05
    area = np.pi * r * r
    iy = np.pi * r ** 4 / 4.0
    mesh = Mesh(
        header="", coords=coords,
        node_ids=np.arange(1, len(coords) + 1),
        id2idx={i + 1: i for i in range(len(coords))},
        blocks=[ElemBlock(641, np.arange(1, ne + 1), conn, conn)],
        sections=[Section("BEAM", "ALL", "M1",
                          [0.0, 0.0, 1.0, area, iy, iy, 2 * iy])],
        materials={"M1": MaterialDef(
            "M1", items={1: [[210e9, 0.3, r, 0.0, 90.0, 180.0, 270.0,
                              45.0, 135.0]]},)},
        node_groups={"FIX": np.asarray([0, ne + 1]),
                     "TIP": np.asarray([ne])},
        elem_groups={}, surf_groups={}, amplitudes={}, equations=[],
        contact_pairs=[], initial_conditions={})
    cnt = ("!VERSION\n 3\n!SOLUTION, TYPE=STATIC\n"
           "!BOUNDARY\n FIX, 1, 3, 0.0\n!CLOAD\n TIP, 2, -100.0\n"
           "!SOLVER, METHOD=CG\n 4000, 1\n 1.0e-12, 1.0, 0.0\n!END\n")
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(cnt)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    model = build_struct_model(mesh, cfg)
    res = run_linear_static(model)
    P = 100.0
    M = P * L                          # wall moment
    sig_wall = M * r / iy              # bending fiber stress
    # fiber at angle 90 deg (k=1) lies in the bending plane (local x3
    # direction for load along global -y with refv z): pick the max
    # fiber stress at the wall element's node 1
    s_wall = np.abs(res.elem_stress[0]).max()
    assert abs(s_wall - sig_wall) < 0.15 * sig_wall, (s_wall, sig_wall)
    # tip deflection check: PL^3/3EI
    d_tip = np.abs(res.u[:, 1]).max()
    d_ref = P * L ** 3 / (3 * 210e9 * iy)
    assert abs(d_tip - d_ref) < 0.02 * d_ref
