"""ROT_CENTER features: torque CLOAD + rotational (Rodrigues) BOUNDARY.

Reference: fstr_ass_load.f90:95-133 (torque distributed so every slave
node carries T/n about the center axis) and fstr_AddBC.f90:112-160
(prescribed du = R(vec) r - r on the current slave positions).
"""
import numpy as np
import pytest

from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.io.ctrlio import AnalysisConfig, Card, StepInfo
from frontistr_tpu.assembly.model import (build_struct_model,
                                          collect_rot, torque_forces,
                                          rot_bc_disp, rodrigues)


def _mesh():
    m = box_hex8(3, 3, 3)
    # center group: the axis nodes at x=y=0.5 ... use the single node
    # nearest the centroid of the top face
    idx = np.arange(m.n_node)
    c = np.argmin(((m.coords - [0.5, 0.5, 1.0]) ** 2).sum(1))
    m.node_groups["CTR"] = np.asarray([c])
    top = m.node_groups["Z1"]
    m.node_groups["RIM"] = top[top != c]
    return m


def test_torque_forces_net_moment():
    m = _mesh()
    card = Card("CLOAD", {"ROT_CENTER": "CTR", "GRPID": "1"},
                [["RIM", "3", "2.5"]])
    ents = collect_rot(m, [card], 3)
    assert len(ents) == 1
    f = torque_forces(m, ents[0], m.coords).reshape(-1, 3)
    # zero net force in the rotation plane components is NOT guaranteed
    # node-by-node, but the total moment about the center axis is T
    c = m.coords[ents[0]["center"]].mean(axis=0)
    r = m.coords - c
    M = np.cross(r, f).sum(axis=0)
    assert abs(M[2] - 2.5) < 1e-12
    assert abs(M[0]) < 1e-12 and abs(M[1]) < 1e-12
    # every loaded node carries exactly T/n about the axis
    n = len(ents[0]["nodes"])
    for i in ents[0]["nodes"]:
        mi = np.cross(r[i], f[i])
        assert abs(mi[2] - 2.5 / n) < 1e-12


def test_rot_bc_displacement_is_rigid_rotation():
    m = _mesh()
    th = 0.3
    ent = dict(nodes=m.node_groups["RIM"], center=m.node_groups["CTR"],
               vec=np.asarray([0.0, 0.0, th]))
    dofs, vals = rot_bc_disp(ent, m.coords)
    c = m.coords[ent["center"]].mean(axis=0)
    for k, n in enumerate(ent["nodes"]):
        r = m.coords[n] - c
        R = np.asarray([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        want = R @ r - r
        got = vals[3 * k:3 * k + 3]
        assert np.allclose(got, want, atol=1e-12)


def test_torque_linear_static_twists():
    m = _mesh()
    cfg = AnalysisConfig()
    cfg.solution_type = "STATIC"
    cfg.steps = [StepInfo()]
    cfg.boundaries = [Card("BOUNDARY", {}, [["Z0", "1", "3", "0.0"]])]
    cfg.cloads = [Card("CLOAD", {"ROT_CENTER": "CTR"},
                       [["RIM", "3", "10.0"]])]
    model = build_struct_model(m, cfg)
    # external load carries the torque
    f = model.f_ext.reshape(-1, 3)
    c = m.coords[m.node_groups["CTR"]].mean(axis=0)
    M = np.cross(m.coords - c, f).sum(axis=0)
    assert abs(M[2] - 10.0) < 1e-10
    from frontistr_tpu.analysis.static import run_linear_static
    res = run_linear_static(model)
    assert res.relres < 1e-6
    # twist: top-face tangential motion circulates about the axis
    u = res.u.reshape(-1, 3)
    rim = m.node_groups["RIM"]
    r = m.coords[rim] - c
    circ = np.cross(r, u[rim])[:, 2]
    assert circ.mean() > 0 and (circ > 0).mean() > 0.9


def test_rot_bc_linear_static():
    m = _mesh()
    cfg = AnalysisConfig()
    cfg.solution_type = "STATIC"
    cfg.steps = [StepInfo()]
    th = 0.01
    cfg.boundaries = [
        Card("BOUNDARY", {}, [["Z0", "1", "3", "0.0"]]),
        Card("BOUNDARY", {"ROT_CENTER": "CTR"},
             [["RIM", "3", "3", str(th)]])]
    model = build_struct_model(m, cfg)
    from frontistr_tpu.analysis.static import run_linear_static
    res = run_linear_static(model)
    u = res.u.reshape(-1, 3)
    c = m.coords[m.node_groups["CTR"]].mean(axis=0)
    for n in m.node_groups["RIM"]:
        r3 = m.coords[n] - c
        want = rodrigues(np.asarray([0, 0, th]), r3[None, :])[0] - r3
        assert np.allclose(u[n], want, atol=1e-10), n


def test_rot_bc_nonlinear_increments_compose():
    """NLGEOM multi-substep: incremental Rodrigues updates compose to
    (approximately) the full rotation of the slave ring."""
    m = _mesh()
    cfg = AnalysisConfig()
    cfg.solution_type = "NLSTATIC"
    cfg.nlgeom = True
    st = StepInfo()
    st.substeps = 4
    st.max_iter = 20
    st.converg = 1e-8
    cfg.steps = [st]
    th = 0.2
    cfg.boundaries = [
        Card("BOUNDARY", {}, [["Z0", "1", "3", "0.0"]]),
        Card("BOUNDARY", {"ROT_CENTER": "CTR"},
             [["RIM", "3", "3", str(th)]])]
    model = build_struct_model(m, cfg)
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    res = run_nonlinear_static(model)
    u = res.u.reshape(-1, 3)
    c = m.coords[m.node_groups["CTR"]].mean(axis=0)
    # the composition of 4 incremental rotations about a (moving) center
    # tracks the exact rigid rotation to first order in the center drift
    for n in m.node_groups["RIM"]:
        r3 = m.coords[n] - c
        want = rodrigues(np.asarray([0, 0, th]), r3[None, :])[0] - r3
        assert np.linalg.norm(u[n] - want) < 0.05 * max(
            np.linalg.norm(want), 1e-3), n
