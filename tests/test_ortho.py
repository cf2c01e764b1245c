"""Orthotropic elasticity + !ORIENTATION local frames.

Symmetry check: an orthotropic cube pulled along its stiff material axis
must respond identically whether the material frame is global (pull x) or
rotated 90 deg about z via !ORIENTATION (pull y)."""

import os
import tempfile

import numpy as np


MSH = """!HEADER
 ortho
!NODE
{nodes}!ELEMENT, TYPE=361
 1, 1, 2, 3, 4, 5, 6, 7, 8
!SECTION, TYPE=SOLID, EGRP=ALL, MATERIAL=M1
!NGROUP, NGRP=F{fdir}
 {fix}
!NGROUP, NGRP=L{fdir}
 {load}
!END
"""

CNT = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 F{d}, {d}, {d}, 0.0
 1, 1, 3, 0.0
 {extra}
!CLOAD
 L{d}, {d}, 25.0
!MATERIAL, NAME=M1
!ELASTIC, TYPE=ORTHOTROPIC
 200000., 100000., 50000., 0.3, 0.2, 0.25, 40000., 30000., 20000.
{orient}!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""

ORIENT = """!SECTION, SECNUM=1, ORIENTATION=OR1
!ORIENTATION, NAME=OR1, DEFINITION=COORDINATES
 0.0, 1.0, 0.0,  -1.0, 0.0, 0.0,  0.0, 0.0, 0.0
"""


def _cube_nodes():
    lines = []
    nid = 1
    for z in (0.0, 1.0):
        for y in (0.0, 1.0):
            for x in (0.0, 1.0):
                pass
    # hex8 connectivity 1..8: bottom (z=0) ccw then top
    pts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    for i, (x, y, z) in enumerate(pts):
        lines.append(f" {i+1}, {x}., {y}., {z}.\n")
    return "".join(lines), pts


def _run(pull_axis, orient):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    nodes, pts = _cube_nodes()
    d = pull_axis  # 1=x, 2=y
    ax = d - 1
    fix = ", ".join(str(i + 1) for i, p in enumerate(pts) if p[ax] == 0)
    load = ", ".join(str(i + 1) for i, p in enumerate(pts) if p[ax] == 1)
    with tempfile.TemporaryDirectory() as tmp:
        mp = os.path.join(tmp, "o.msh")
        cp = os.path.join(tmp, "o.cnt")
        open(mp, "w").write(MSH.format(nodes=nodes, fdir=d, fix=fix,
                                       load=load))
        open(cp, "w").write(CNT.format(d=d, orient=ORIENT if orient else "",
                                       extra=""))
        mesh = read_mesh(mp)
        cfg = read_cnt(cp)
        model = build_struct_model(mesh, cfg)
        res = run_linear_static(model)
        u = res.u[:, ax]
        return float(np.max(np.abs(u)))


def test_ortho_frame_rotation_symmetry():
    # pull along global x with material frame = global: E1 governs
    ux = _run(1, orient=False)
    # pull along global y with the frame rotated so local-1 = global y
    uy = _run(2, orient=True)
    np.testing.assert_allclose(ux, uy, rtol=1e-10)
    # and the unrotated pull along y engages E2 (softer -> larger disp)
    uy_soft = _run(2, orient=False)
    assert uy_soft > 1.5 * ux


def test_ortho_D_matches_iso_when_degenerate():
    from frontistr_tpu.fem.material import elastic_D, elastic_D_ortho, D3
    ee, pp = 210e3, 0.3
    g = ee / (2 * (1 + pp))
    c9 = [ee, ee, ee, pp, pp, pp, g, g, g]
    np.testing.assert_allclose(elastic_D_ortho(c9), elastic_D(ee, pp, D3),
                               rtol=1e-12)


def test_rotate_D_identity():
    from frontistr_tpu.fem.material import elastic_D_ortho, rotate_D
    D = elastic_D_ortho([200e3, 100e3, 50e3, .3, .2, .25,
                         40e3, 30e3, 20e3])
    np.testing.assert_allclose(rotate_D(D, np.eye(3)), D, atol=1e-9)


def test_temperature_dependent_elastic():
    """!ELASTIC with (E, nu, temp) rows + !TEMPERATURE: E interpolated at
    gauss temperature.  Uniform hot cube at T where E halves -> double the
    displacement of the cold cube."""
    import tempfile
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    mesh = box_hex8(2, 2, 2)
    base = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!REFTEMP
 {tref}
!BOUNDARY
 Z0, 3, 3, 0.0
 X0, 1, 1, 0.0
 Y0, 2, 2, 0.0
!CLOAD
 Z1, 3, -{load}
!TEMPERATURE
 ALL, {T}
!MATERIAL, NAME=M1
!ELASTIC, DEPENDENCIES=1
 200000., 0.0, 0.0
 100000., 0.0, 100.0
!EXPANSION_COEFF
 0.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""
    def run(T):
        with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                         delete=False) as f:
            f.write(base.format(T=T, tref=T, load=25.0 / 9.0))
            p = f.name
        cfg = read_cnt(p)
        os.unlink(p)
        res = run_linear_static(build_struct_model(mesh, cfg))
        return np.abs(res.u[:, 2]).max()
    u_cold = run(0.0)
    u_hot = run(100.0)
    np.testing.assert_allclose(u_hot, 2.0 * u_cold, rtol=1e-8)
