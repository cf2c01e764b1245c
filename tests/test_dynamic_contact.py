"""Contact in implicit dynamics + dynamics restart.

Reference: fstr_dynamic_nlimplicit.f90:374+ (the contact arm of the
Newmark Newton loop reuses the static AL / SLAGRANGE machinery with the
effective matrix c1 K + c2 M) and fstr_write_restart_dyna (u/v/a + gauss
+ contact state checkpointing).

Fixture: two stacked unit cubes with duplicate interface nodes, the
upper one driven down onto the lower one (drop-impact when a gap is
left).  Lateral dofs are fixed so the column is effectively 1-D: the
analytic quasi-static limit is uniform stress F/A through the closed
interface.
"""

import os
import tempfile

import numpy as np

from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.io.meshio import ElemBlock, ContactPairDef
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model
from frontistr_tpu.analysis.dynamic import run_dynamic


def _two_cube_mesh(gap=0.0):
    """Two unit cubes stacked in z, upper shifted up by `gap`, interface
    nodes duplicated (slave = lower face of the upper cube)."""
    m = box_hex8(1, 1, 1)
    n1 = m.n_node
    coords = np.vstack([m.coords,
                        m.coords + np.array([0.0, 0.0, 1.0 + gap])])
    conn2 = m.blocks[0].conn + n1
    m.coords = coords
    m.node_ids = np.arange(1, len(coords) + 1)
    m.id2idx = {int(i): int(i) - 1 for i in m.node_ids}
    m.blocks = [ElemBlock(361, np.asarray([1]), m.blocks[0].conn,
                          m.blocks[0].conn),
                ElemBlock(361, np.asarray([2]), conn2, conn2)]
    z0 = np.isclose(coords[:, 2], 0.0)
    ztop = np.isclose(coords[:, 2], 2.0 + gap)
    slave = np.nonzero(np.isclose(coords[:, 2], 1.0 + gap) &
                       (np.arange(len(coords)) >= n1))[0]
    m.node_groups = {
        "ALL": np.arange(len(coords)),
        "BOT": np.nonzero(z0)[0],
        "TOPF": np.nonzero(ztop)[0],
        "SLAVE": slave}
    m.surf_groups = {"MAST": np.asarray([[1, 2]])}   # top face, lower cube
    m.elem_groups = {"ALL": np.asarray([1, 2])}
    m.contact_pairs = [ContactPairDef("CP1", "NODE-SURF", "SLAVE",
                                      "MAST")]
    return m


def _cnt(n_step, dt, algo="ALAGRANGE", ray_m=2.0, fz=-2.0,
         gamma=0.5, beta=0.25):
    return f"""!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 1, 1
 0.0, {n_step * dt}, {n_step}, {dt}
 {gamma}, {beta}
 1, 1, {ray_m}, 0.0
 10
!BOUNDARY, GRPID=1
 BOT, 3, 3, 0.0
 ALL, 1, 2, 0.0
!CLOAD, GRPID=1
 TOPF, 3, {fz}
!CONTACT_ALGO, TYPE={algo}
!CONTACT, GRPID=1
 CP1, 0.0
!STEP, SUBSTEPS=1, CONVERG=1.0e-7
 BOUNDARY, 1
 LOAD, 1
 CONTACT, 1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.0
!DENSITY
 1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""


def _run(gap, n_step, dt, algo="ALAGRANGE", restart_path=None,
         restart_freq=0, **kw):
    mesh = _two_cube_mesh(gap)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(_cnt(n_step, dt, algo=algo, **kw))
        path = fh.name
    cfg = read_cnt(path)
    os.unlink(path)
    model = build_struct_model(mesh, cfg)
    out = run_dynamic(model, restart_path=restart_path,
                      restart_freq=restart_freq)
    return model, out


def test_drop_impact_arrested():
    """Drop impact: the upper cube accelerates across the gap, impacts,
    and is arrested at the interface (AL augmentation closes the gap).

    Uses dissipative Newmark (gamma=0.75, beta=(gamma+1/2)^2/4): plain
    trapezoidal Newmark with an opening/closing unilateral contact is
    energy-unstable under interface chatter (each open-close cycle
    injects energy — a property shared with the reference's plain
    Newmark contact arm); numerical dissipation is the standard
    production remedy for impact."""
    gap = 0.05
    model, out = _run(gap, n_step=60, dt=0.01, ray_m=0.5,
                      gamma=0.75, beta=0.390625)
    assert np.isfinite(out.u).all()
    assert np.isfinite(out.vel).all()
    slave = model.mesh.node_groups["SLAVE"]
    uz = out.u[slave, 2]
    # arrested at the interface: travelled the gap, but neither passed
    # through the lower cube (elastic headroom ~F/(EA)=8e-3 per cube)
    # nor rebounded above it (energy-sane)
    assert uz.min() > -(gap + 0.03), uz.min()
    assert uz.max() < -gap * 0.6, uz.max()
    # penetration after the final AL augmentation is geometrically tiny
    from frontistr_tpu.contact.ntos import ContactManager
    cm = ContactManager(model.mesh, model, model.cfg)
    proj = cm.search(model.coords + out.u[:, :3])
    pen = np.maximum(-proj["gap"], 0.0)[proj["touching"]]
    assert pen.size and pen.max() < 2e-3, pen
    # dissipation has bled off most of the impact velocity
    v_imp = np.sqrt(2.0 * 8.0 * gap)      # free-fall estimate, a=F/m=8
    assert np.abs(out.vel[:, 2]).max() < 0.7 * v_imp, out.vel[:, 2]


def test_slag_compression_transmits_stress():
    """SLAGRANGE arm in dynamics: zero-gap column under constant load,
    damped to the quasi-static limit -> uniform stress F/A through the
    eliminated interface."""
    model, out = _run(0.0, n_step=60, dt=0.02, algo="SLAGRANGE",
                      ray_m=4.0, gamma=0.75, beta=0.390625)
    assert np.isfinite(out.u).all()
    szz = out.final.elem_stress[:, 2]
    # sigma_zz = total force / area = 4 * (-2.0) / 1.0 = -8 in BOTH cubes
    assert np.allclose(szz, -8.0, atol=0.4), szz
    slave = model.mesh.node_groups["SLAVE"]
    # interface closed: slave nodes compressed into the lower cube's top
    # by exactly the lower cube's elastic shortening (~0.008)
    assert np.all(out.u[slave, 2] < 0.0)
    assert np.abs(out.u[slave, 2] + 0.008).max() < 2e-3
    # transient fully damped: quasi-static limit reached
    assert np.abs(out.vel).max() < 0.01


def test_dynamic_restart_resume_bitexact():
    """Dynamics restart (fstr_write_restart_dyna analog): interrupting
    after step 4 and resuming reproduces the uninterrupted trajectory."""
    with tempfile.TemporaryDirectory() as td:
        # uninterrupted 8-step run (checkpoint file unused on entry)
        rp_a = os.path.join(td, "a.npz")
        _, full = _run(0.02, n_step=8, dt=0.01, restart_path=rp_a,
                       restart_freq=4)
        # interrupted: 4 steps, checkpoint written at step 4 ...
        rp_b = os.path.join(td, "b.npz")
        _run(0.02, n_step=4, dt=0.01, restart_path=rp_b, restart_freq=4)
        assert os.path.exists(rp_b)
        # ... then resumed to step 8 from the checkpoint
        _, resumed = _run(0.02, n_step=8, dt=0.01, restart_path=rp_b,
                          restart_freq=4)
        for k in ("u", "vel", "acc"):
            a, b = getattr(full, k), getattr(resumed, k)
            assert np.allclose(a, b, rtol=1e-9, atol=1e-12), (
                k, np.abs(a - b).max())
