"""Contact tests: tutorial-09 Hertz run + two-block compression analytic."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE


@requires_reference
def test_hertz_tutorial_runs_and_closes_gap():
    """Tutorial 09: the gap closes AND the contact force path balances —
    the total normal force entering through the slave nodes equals the
    reaction leaving through the fixed BOTTOM face (interface
    equilibrium, not a self-history constant)."""
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
    # the prescribed UPPER displacement is reproduced exactly
    up = mesh.node_groups["UPPER"]
    np.testing.assert_allclose(res.u[up, 1], -0.306, rtol=1e-9)
    cm = ContactManager(mesh, model, cfg)
    proj = cm.search(model.coords + res.u)
    pen = np.maximum(-proj["gap"], 0.0)[proj["touching"]]
    assert pen.max() < 1e-4          # AL closed the gap
    assert proj["touching"].all()
    # interface equilibrium: slave contact force == BOTTOM reaction
    P_bot = res.reaction[mesh.node_groups["BOTTOM"], 1].sum()
    P_slv = res.reaction[cm.all_slaves, 1].sum()
    assert abs(abs(P_bot) - abs(P_slv)) < 1e-6 * abs(P_slv)
    assert abs(P_slv) > 1.0          # a real force flows through


def _hertz_indenter_model(R=50.0, delta=0.01, L=6.0, H=3.0, nx=48,
                          nz=12, E=1000.0):
    """Parabolic indenter pressed into an elastic block: the SMALL-
    contact regime (a << R) where plane-strain Hertz theory holds,
    unlike tutorial 09's blunt tip (R_tip ~ 1.5, delta = 0.306).
    Upper block's bottom face carries the parabola x^2/(2R), blended to
    flat at its top; symmetry plane at x = 0."""
    import tempfile
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.meshio import ContactPairDef, ElemBlock
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model

    lo = box_hex8(nx, 1, nz, lx=L, ly=1.0, lz=H)
    n1 = lo.n_node
    up_coords = lo.coords.copy()
    g = up_coords[:, 0] ** 2 / (2 * R)
    up_coords[:, 2] = H + up_coords[:, 2] + \
        (1.0 - up_coords[:, 2] / H) * g
    coords = np.vstack([lo.coords, up_coords])
    conn1 = lo.blocks[0].conn
    conn2 = conn1 + n1
    E1 = conn1.shape[0]
    lo.coords = coords
    lo.blocks = [ElemBlock(361, np.arange(1, E1 + 1), conn1, conn1),
                 ElemBlock(361, np.arange(E1 + 1, 2 * E1 + 1), conn2,
                           conn2)]
    lo.node_ids = np.arange(1, len(coords) + 1)
    lo.id2idx = {int(i): int(i) - 1 for i in lo.node_ids}
    idx = np.arange(len(coords))
    bot = idx[np.isclose(coords[:, 2], 0.0)]
    upsel = idx[idx >= n1]
    top = upsel[np.isclose(coords[upsel][:, 2], 2 * H)]
    slave = upsel[np.isclose(coords[upsel][:, 2],
                             H + coords[upsel][:, 0] ** 2 / (2 * R))]
    x0 = idx[np.isclose(coords[:, 0], 0.0)]
    lo.node_groups = {"ALL": idx, "BOT": bot, "TOP": top,
                      "SLAVE": slave, "X0": x0}
    dz = H / nz
    cz = coords[conn1][:, :, 2].mean(1)
    top_elems = np.nonzero(cz > H - dz * 0.75)[0] + 1
    lo.surf_groups = {"MAST": np.stack(
        [top_elems, np.full(len(top_elems), 2)], 1)}
    lo.elem_groups = {"ALL": np.arange(1, 2 * E1 + 1)}
    lo.contact_pairs = [ContactPairDef("CP1", "NODE-SURF", "SLAVE",
                                       "MAST")]
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY, GRPID=1
 BOT, 3, 3, 0.0
 BOT, 1, 1, 0.0
 ALL, 2, 2, 0.0
 X0, 1, 1, 0.0
 TOP, 3, 3, -{delta}
 TOP, 1, 1, 0.0
!CONTACT_ALGO, TYPE=ALAGRANGE
!CONTACT, GRPID=1
 CP1, 0.0
!STEP, SUBSTEPS=2, CONVERG=1.0e-7
 BOUNDARY, 1
 CONTACT, 1
!MATERIAL, NAME=M1
!ELASTIC
 {E}, 0.0
!SOLVER,METHOD=CG,PRECOND=1,ITERLOG=NO,TIMELOG=NO
 20000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    import tempfile as tf
    with tf.NamedTemporaryFile("w", suffix=".cnt", delete=False) as f:
        f.write(cnt)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    return build_struct_model(lo, cfg), lo, (R, delta, L, nx, E)


def test_hertz_analytic_pressure():
    """Plane-strain Hertz, measured against THEORY: with the total line
    force P' taken from the run's own reaction, the analytic half-width
    a = sqrt(4 P' R / (pi E*)) and pressure p(x) = p0 sqrt(1-(x/a)^2),
    p0 = 2P'/(pi a), must match the nodal contact pressures.

    Measured at nx=48: p(0) within 1.3%, interior profile within 1.6%,
    contact edge on the correct node."""
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    model, mesh, (R, delta, L, nx, E) = _hertz_indenter_model()
    res = run_nonlinear_static(model)
    coords = mesh.coords
    bot = mesh.node_groups["BOT"]
    slave = mesh.node_groups["SLAVE"]
    P_half = abs(res.reaction[bot, 2].sum())
    Pline = 2 * P_half / 1.0          # symmetric half-model, thickness 1
    Estar = E / 2.0                   # two identical nu=0 bodies
    a = np.sqrt(4 * Pline * R / (np.pi * Estar))
    p0 = 2 * Pline / (np.pi * a)
    assert a < 0.2 * R                # genuinely in the Hertz regime

    xs = coords[slave][:, 0]
    fz = res.reaction[slave, 2]
    dx = L / nx
    ux = np.unique(np.round(xs, 9))
    ptot = np.array([fz[np.isclose(xs, x)].sum() for x in ux])
    order = np.argsort(ux)
    ux, ptot = ux[order], ptot[order]
    press = ptot / np.where(ux > 1e-9, dx, dx / 2)
    # peak pressure within 5% of analytic p0
    assert abs(press[0] - p0) < 0.05 * p0, (press[0], p0)
    # interior profile within 6% of p0 scale
    inner = ux < 0.8 * a
    ph = p0 * np.sqrt(np.maximum(1 - (ux / a) ** 2, 0.0))
    assert np.all(np.abs(press[inner] - ph[inner]) < 0.06 * p0), \
        list(zip(ux[inner], press[inner], ph[inner]))
    # contact edge: last loaded node within one spacing of analytic a
    loaded = ux[press > 0.02 * p0]
    assert abs(loaded.max() - a) < 1.5 * dx, (loaded.max(), a)


@requires_reference
def test_2tubes_tutorial():
    """Tutorial 10 (SLAGRANGE, INTERACTION=FSLID): two crossed tubes
    pressed together.  Physics checks: the prescribed drive is
    reproduced, the touching interface does not penetrate, and the
    contact force path balances between the two bodies."""
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from frontistr_tpu.contact.ntos import ContactManager
    d = os.path.join(REFERENCE, "tutorial", "10_contact_2tubes")
    mesh = read_mesh(os.path.join(d, "2tubes.msh"))
    cfg = read_cnt(os.path.join(d, "2tubes.cnt"))
    model = build_struct_model(mesh, cfg)
    res = run_nonlinear_static(model)
    x1 = mesh.node_groups["X1"]
    np.testing.assert_allclose(res.u[x1, 0], -1.0, rtol=1e-8)
    cm = ContactManager(mesh, model, cfg)
    proj = cm.search(model.coords + res.u)
    char = float(np.abs(model.coords).max())
    pen = np.maximum(-proj["gap"], 0.0)[proj["touching"]]
    assert proj["touching"].any()
    # SLag elimination closes ACTIVE slots exactly; contact-EDGE slots
    # released by the tensile scan may keep a sliver of geometric
    # penetration (fstr_scan_contact_state tolerates the same).  So:
    # nearly every touching slot is closed, and no slot grossly
    # interpenetrates relative to the 1.0 drive displacement.
    assert (pen < 1e-4 * char).mean() > 0.95
    assert pen.max() < 3e-3
    # force balance: everything entering via X1 leaves via X0
    P_x1 = res.reaction[x1, 0].sum()
    P_x0 = res.reaction[mesh.node_groups["X0"], 0].sum()
    assert abs(abs(P_x1) - abs(P_x0)) < 1e-5 * max(abs(P_x1), 1.0)
    assert abs(P_x1) > 1.0


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


def _two_cube_friction_model(mu, top_ux=1.0e-3, substeps=2):
    """Two stacked cubes, top pressed down and sheared in x; friction
    coefficient mu on the interface."""
    import tempfile
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.meshio import ContactPairDef, ElemBlock
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model

    m1 = box_hex8(1, 1, 1)
    n1 = m1.n_node
    coords = np.vstack([m1.coords, m1.coords + np.array([0, 0, 1.0])])
    conn2 = m1.blocks[0].conn + n1
    m1.coords = coords
    m1.node_ids = np.arange(1, len(coords) + 1)
    m1.id2idx = {int(i): int(i) - 1 for i in m1.node_ids}
    m1.blocks = [ElemBlock(361, np.asarray([1]), m1.blocks[0].conn,
                           m1.blocks[0].conn),
                 ElemBlock(361, np.asarray([2]), conn2, conn2)]
    z0 = np.isclose(coords[:, 2], 0.0)
    ztop = np.isclose(coords[:, 2], 2.0)
    slave = np.nonzero(np.isclose(coords[:, 2], 1.0) &
                       (np.arange(len(coords)) >= n1))[0]
    zmid_low = np.nonzero(np.isclose(coords[:, 2], 1.0) &
                          (np.arange(len(coords)) < n1))[0]
    m1.node_groups = {
        "ALL": np.arange(len(coords)),
        "BOT": np.nonzero(z0)[0], "TOP": np.nonzero(ztop)[0],
        "SLAVE": slave, "MIDLOW": zmid_low}
    m1.surf_groups = {"MAST": np.asarray([[1, 2]])}
    m1.elem_groups = {"ALL": np.asarray([1, 2])}
    m1.contact_pairs = [ContactPairDef("CP1", "NODE-SURF", "SLAVE",
                                       "MAST")]
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY, GRPID=1
 BOT, 1, 3, 0.0
 TOP, 3, 3, -0.01
 TOP, 1, 1, {top_ux}
 TOP, 2, 2, 0.0
!CONTACT_ALGO, TYPE=ALAGRANGE
!CONTACT, GRPID=1
 CP1, {mu}
!STEP, SUBSTEPS={substeps}, CONVERG=1.0e-6
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
    return build_struct_model(m1, cfg)


def test_contact_friction_stick_transmits_shear():
    """High-mu interface sticks: the applied shear transmits through the
    joint (series shear springs -> lower cube top moves ~half the slide).
    A frictionless comparison would be singular (the upper block keeps a
    free lateral rigid mode), so stick vs slip is the well-posed pair."""
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    model1 = _two_cube_friction_model(mu=100.0)
    res1 = run_nonlinear_static(model1)
    ux1 = res1.u[model1.mesh.node_groups["MIDLOW"], 0].mean()
    # stick: tau = G*gamma with gamma = 0.5e-3 each -> lower top ~5e-4
    assert 2.5e-4 < ux1 < 7.5e-4, ux1
    sxz = abs(res1.elem_stress[0, 5])
    assert 0.1 < sxz < 0.5, sxz             # ~G*5e-4 = 0.25


def test_contact_friction_slip_capped():
    """Intermediate mu: transmitted shear is capped at the Coulomb cone
    radius mu*N (stress order 11,22,33,12,23,13 -> xz is index 5)."""
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    mu = 0.01
    model = _two_cube_friction_model(mu=mu, top_ux=1.0e-3, substeps=5)
    res = run_nonlinear_static(model)
    # normal: eps_z = -0.01/2 per cube -> sigma_z = -5; cap = mu*5
    # (stick transmits ~0.11 through the single-element shear chain)
    sxz = abs(res.elem_stress[0, 5])
    assert sxz <= mu * 5.0 * 1.3, sxz
    assert sxz >= mu * 5.0 * 0.3, sxz
    # and strictly less shear than the same model would transmit sticking
    model_s = _two_cube_friction_model(mu=100.0, top_ux=1.0e-3,
                                       substeps=5)
    res_s = run_nonlinear_static(model_s)
    sxz_stick = abs(res_s.elem_stress[0, 5])
    assert sxz < 0.75 * sxz_stick, (sxz, sxz_stick)


def test_slagrange_exact_gap_closure():
    """SLAGRANGE elimination closes the interface gap to machine
    precision (vs the AL penalty's ~1e-4), with the same transmitted
    stress."""
    import tempfile
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.meshio import ContactPairDef, ElemBlock
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from frontistr_tpu.contact.ntos import ContactManager

    m1 = box_hex8(1, 1, 1)
    n1 = m1.n_node
    coords = np.vstack([m1.coords, m1.coords + np.array([0, 0, 1.0])])
    conn2 = m1.blocks[0].conn + n1
    m1.coords = coords
    m1.node_ids = np.arange(1, len(coords) + 1)
    m1.id2idx = {int(i): int(i) - 1 for i in m1.node_ids}
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
!CONTACT_ALGO, TYPE=SLAGRANGE
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
 1.0e-12, 1.0, 0.0
!END
"""
    import tempfile as tf
    with tf.NamedTemporaryFile("w", suffix=".cnt", delete=False) as f:
        f.write(cnt)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    assert cfg.contact_algo.upper() == "SLAGRANGE"
    model = build_struct_model(m1, cfg)
    res = run_nonlinear_static(model)
    sz = res.elem_stress[:, 2]
    np.testing.assert_allclose(sz, -5.0, rtol=2e-2)
    # exact closure: penetration at the interface ~ machine precision
    cm = ContactManager(m1, model, cfg)
    proj = cm.search(model.coords + res.u)
    pen = np.abs(proj["gap"])[proj["touching"]]
    assert pen.max() < 1e-9, pen.max()
    ui = res.u[m1.node_groups["SLAVE"], 2]
    np.testing.assert_allclose(ui, -0.005, rtol=1e-6)


@pytest.mark.parametrize("algo", ["SLAGRANGE", "ALAGRANGE"])
def test_direct_solver_contact_decks(algo):
    """METHOD=DIRECT honored on contact decks: SLAGRANGE runs the
    explicit Lagrange-row saddle-point factorization
    (solve_LINEQ_direct_serial_lag.f90 analog), ALAGRANGE folds the
    penalty blocks into the factorized operator.  Both must match the
    iterative arm."""
    import tempfile
    from tests.test_dynamic_contact import _two_cube_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    def cnt(method):
        return f"""!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY, GRPID=1
 BOT, 3, 3, 0.0
 ALL, 1, 2, 0.0
!CLOAD, GRPID=1
 TOPF, 3, -2.0
!CONTACT_ALGO, TYPE={algo}
!CONTACT, GRPID=1
 CP1, 0.0
!STEP, SUBSTEPS=2, CONVERG=1.0e-7
 BOUNDARY, 1
 LOAD, 1
 CONTACT, 1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.0
!SOLVER,METHOD={method},PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""

    us = {}
    for method in ("DIRECT", "CG"):
        mesh = _two_cube_mesh(0.0)
        with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                         delete=False) as f:
            f.write(cnt(method))
            p = f.name
        cfg = read_cnt(p)
        os.unlink(p)
        model = build_struct_model(mesh, cfg)
        res = run_nonlinear_static(model)
        us[method] = res.u.copy()
        # sigma_zz = 4 * (-2.0) / 1.0 = -8 through the interface
        np.testing.assert_allclose(res.elem_stress[:, 2], -8.0,
                                   rtol=2e-2)
    np.testing.assert_allclose(us["DIRECT"], us["CG"],
                               atol=1e-7, rtol=1e-6)
