"""Shell/beam mass: eigenvalue and implicit dynamics on 6-dof models."""

import os
import tempfile

import numpy as np


MSH = """!HEADER
 shell strip
!NODE
{nodes}!ELEMENT, TYPE=741
{elems}!SECTION, TYPE=SHELL, EGRP=ALL, MATERIAL=M1
 0.1, 3
!MATERIAL, NAME=M1, ITEM=2
!ITEM=1, SUBITEM=2
 1.0e6, 0.0
!ITEM=2, SUBITEM=1
 1.0
!NGROUP, NGRP=FIX
 {fix}
!END
"""


def _strip_mesh(nx=8, L=2.0, w=0.25):
    nodes, elems = [], []
    nid = {}
    k = 1
    for i in range(nx + 1):
        for j in range(2):
            nid[(i, j)] = k
            nodes.append(f" {k}, {i * L / nx}, {j * w}, 0.\n")
            k += 1
    for i in range(nx):
        n1 = nid[(i, 0)]
        n2 = nid[(i + 1, 0)]
        n3 = nid[(i + 1, 1)]
        n4 = nid[(i, 1)]
        elems.append(f" {i+1}, {n1}, {n2}, {n3}, {n4}\n")
    fix = ", ".join(str(nid[(0, j)]) for j in range(2))
    return "".join(nodes), "".join(elems), fix


def _build(cnt):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    nodes, elems, fix = _strip_mesh()
    with tempfile.TemporaryDirectory() as d:
        mp, cp = os.path.join(d, "m.msh"), os.path.join(d, "m.cnt")
        open(mp, "w").write(MSH.format(nodes=nodes, elems=elems, fix=fix))
        open(cp, "w").write(cnt)
        mesh = read_mesh(mp)
        cfg = read_cnt(cp)
    return build_struct_model(mesh, cfg)


def test_shell_eigen_cantilever():
    from frontistr_tpu.analysis.eigen import run_eigen
    cnt = """!VERSION
 3
!SOLUTION, TYPE=EIGEN
!BOUNDARY
 FIX, 1, 6, 0.0
!EIGEN
 3, 1.0e-8, 60
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    model = _build(cnt)
    res = run_eigen(model)
    # analytic first bending freq of a cantilever strip (E=1e6, t=0.1,
    # L=2, rho*A per length = 1*0.1*w):  f1 = (1.875^2/2pi) sqrt(EI/mL^4)
    E, t, L, rho = 1.0e6, 0.1, 2.0, 1.0
    I_per_w = t ** 3 / 12.0
    m_per_w = rho * t
    f1 = (1.875 ** 2 / (2 * np.pi)) * np.sqrt(
        E * I_per_w / (m_per_w * L ** 4))
    got = res.freq[0]
    assert abs(got - f1) / f1 < 0.1, (got, f1)


def test_shell_implicit_dynamics_runs():
    from frontistr_tpu.analysis.dynamic import run_dynamic
    cnt = """!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 1, 1
 0.0, 0.01, 20, 5.0e-4
 0.5, 0.25
 1, 1, 1
 10
!BOUNDARY
 FIX, 1, 6, 0.0
!CLOAD
 17, 3, -10.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    model = _build(cnt)
    res = run_dynamic(model)
    u = np.asarray(res.u)
    assert np.isfinite(u).all()
    # the loaded free-end node moves down
    assert u.reshape(model.n_node, 6)[16, 2] < 0.0
