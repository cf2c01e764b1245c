"""Solid-shell 761/781 (3-dof shell-solid mixed packing)."""

import os
import tempfile

import numpy as np


def _run(etype):
    import jax
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    nx = 4
    nodes, nid = [], {}
    k = 1
    for up in (0, 1):
        for i in range(nx + 1):
            for j in range(2):
                nid[(i, j, up)] = k
                nodes.append(f" {k}, {i * 0.5}, {j * 0.25}, 0.\n")
                k += 1
    elems = []
    for i in range(nx):
        if etype == 781:
            lo = [nid[(i, 0, 0)], nid[(i + 1, 0, 0)],
                  nid[(i + 1, 1, 0)], nid[(i, 1, 0)]]
            up = [nid[(i, 0, 1)], nid[(i + 1, 0, 1)],
                  nid[(i + 1, 1, 1)], nid[(i, 1, 1)]]
        else:
            lo = [nid[(i, 0, 0)], nid[(i + 1, 0, 0)], nid[(i + 1, 1, 0)]]
            up = [nid[(i, 0, 1)], nid[(i + 1, 0, 1)], nid[(i + 1, 1, 1)]]
        elems.append(f" {i+1}, " + ", ".join(map(str, lo + up)) + "\n")
    fix_ids = [nid[(0, j, z)] for j in range(2) for z in (0, 1)]
    if etype == 761:
        fix_ids += [nid[(1, j, z)] for j in range(2) for z in (0, 1)]
    fix = ", ".join(map(str, fix_ids))
    msh = f"""!HEADER
 ss
!NODE
{''.join(nodes)}!ELEMENT, TYPE={etype}
{''.join(elems)}!SECTION, TYPE=SHELL, EGRP=ALL, MATERIAL=M1
 0.1, 3
!MATERIAL, NAME=M1, ITEM=1
!ITEM=1, SUBITEM=2
 1.0e6, 0.0
!NGROUP, NGRP=FIX
 {fix}
!END
"""
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 FIX, 1, 3, 0.0
!CLOAD
 {nid[(nx, 0, 0)]}, 3, -0.5
 {nid[(nx, 1, 0)]}, 3, -0.5
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""
    with tempfile.TemporaryDirectory() as dd:
        mp, cp = os.path.join(dd, "m.msh"), os.path.join(dd, "m.cnt")
        open(mp, "w").write(msh)
        open(cp, "w").write(cnt)
        mesh = read_mesh(mp)
        cfg = read_cnt(cp)
    model = build_struct_model(mesh, cfg)
    assert model.ndof == 3 and model.blocks[0].kind == "sshell"
    res = run_linear_static(model)
    return res.u[nid[(nx, 0, 0)] - 1, 2]


def test_781_cantilever_matches_beam_theory():
    w = _run(781)
    wth = -1 * 8 / (3 * 1e6 * 0.25 * 1e-3 / 12)   # PL^3/3EI
    assert abs((w - wth) / wth) < 0.05, (w, wth)


def test_761_cantilever_deflects():
    w = _run(761)
    assert np.isfinite(w) and w < -1e-3
