"""Contact tests: tutorial-09 Hertz run + two-block compression analytic."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE


@requires_reference
def test_hertz_tutorial_runs_and_closes_gap():
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from frontistr_tpu.contact.ntos import ContactManager
    d = os.path.join(REFERENCE, "tutorial", "09_contact_hertz")
    mesh = read_mesh(os.path.join(d, "cgs3.msh"))
    cfg = read_cnt(os.path.join(d, "cgs3.cnt"))
    model = build_struct_model(mesh, cfg)
    res = run_nonlinear_static(model)
    assert abs(np.abs(res.u).max() - 0.306) < 1e-4
    cm = ContactManager(mesh, model, cfg)
    proj = cm.search(model.coords + res.u)
    pen = np.maximum(-proj["gap"], 0.0)[proj["touching"]]
    assert pen.max() < 1e-4          # AL closed the gap
    assert proj["touching"].all()


def test_two_block_compression():
    """Two stacked unit cubes with a contact interface under uniform
    pressure: stress transmits through the interface (sigma = -p
    everywhere), interface stays closed."""
    import tempfile
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.meshio import Mesh, ContactPairDef
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    # build a 2-cube mesh with duplicate interface nodes
    m1 = box_hex8(1, 1, 1)
    n1 = m1.n_node
    coords = np.vstack([m1.coords,
                        m1.coords + np.array([0, 0, 1.0])])
    conn2 = m1.blocks[0].conn + n1
    m1.coords = coords
    m1.node_ids = np.arange(1, len(coords) + 1)
    m1.id2idx = {int(i): int(i) - 1 for i in m1.node_ids}
    from frontistr_tpu.io.meshio import ElemBlock
    m1.blocks = [ElemBlock(361, np.asarray([1]), m1.blocks[0].conn,
                           m1.blocks[0].conn),
                 ElemBlock(361, np.asarray([2]), conn2, conn2)]
    z0 = np.isclose(coords[:, 2], 0.0)
    ztop = np.isclose(coords[:, 2], 2.0)
    slave = np.nonzero(np.isclose(coords[:, 2], 1.0) &
                       (np.arange(len(coords)) >= n1))[0]
    m1.node_groups = {
        "ALL": np.arange(len(coords)),
        "BOT": np.nonzero(z0)[0], "TOP": np.nonzero(ztop)[0],
        "SLAVE": slave,
        "XA": np.nonzero(np.isclose(coords[:, 0], 0))[0],
        "YA": np.nonzero(np.isclose(coords[:, 1], 0))[0]}
    # master: top face (face 2? use face with z=1 of lower cube = face 2
    # per hex tables: face 2 is nodes 8,7,6,5 (top))
    m1.surf_groups = {"MAST": np.asarray([[1, 2]])}
    m1.elem_groups = {"ALL": np.asarray([1, 2])}
    m1.contact_pairs = [ContactPairDef("CP1", "NODE-SURF", "SLAVE",
                                       "MAST")]
    cnt = """!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY, GRPID=1
 BOT, 3, 3, 0.0
 XA, 1, 1, 0.0
 YA, 2, 2, 0.0
 TOP, 3, 3, -0.01
!CONTACT_ALGO, TYPE=ALAGRANGE
!CONTACT, GRPID=1
 CP1, 0.0
!STEP, SUBSTEPS=2, CONVERG=1.0e-7
 BOUNDARY, 1
 CONTACT, 1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(cnt)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    model = build_struct_model(m1, cfg)
    res = run_nonlinear_static(model)
    # uniform compression through the joint: eps = -0.01/2 per cube,
    # sigma_z = -5 everywhere
    sz = res.elem_stress[:, 2]
    np.testing.assert_allclose(sz, -5.0, rtol=2e-2)
    # displacement at the interface ~ -0.005
    ui = res.u[model.mesh.node_groups["SLAVE"], 2]
    np.testing.assert_allclose(ui, -0.005, rtol=5e-2)
