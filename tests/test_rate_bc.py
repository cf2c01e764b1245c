"""!VELOCITY / !ACCELERATION cards in structural dynamics
(dynamic_mat_ass_bc_vl/_ac.f90 + DYNAMIC_BC_INIT_VL/_AC): initial
conditions and prescribed-rate Dirichlet enforcement."""

import os
import tempfile

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE
from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model
from frontistr_tpu.analysis.dynamic import run_dynamic


def _run_deck(cnt, mesh=None):
    mesh = mesh or box_hex8(1, 1, 1)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(cnt)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    model = build_struct_model(mesh, cfg)
    return model, run_dynamic(model)


def test_initial_velocity_rigid_drift_implicit():
    """Free cube with v0 = -1 in z, no loads: rigid translation
    u_z(t) = -t (Newmark is exact for constant-velocity motion)."""
    n_step, dt = 5, 0.01
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 1, 1
 0.0, {n_step * dt}, {n_step}, {dt}
 0.5, 0.25
 1, 1, 0.0, 0.0
 10
!VELOCITY, TYPE=INITIAL
 ALL, 3, 3, -1.0
!STEP, SUBSTEPS=1, CONVERG=1.0e-10
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.3
!DENSITY
 1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""
    model, out = _run_deck(cnt)
    np.testing.assert_allclose(out.u[:, 2], -n_step * dt, rtol=1e-8)
    np.testing.assert_allclose(out.vel[:, 2], -1.0, rtol=1e-8)
    assert np.abs(out.u[:, :2]).max() < 1e-12


def test_initial_velocity_rigid_drift_explicit():
    n_step, dt = 5, 1.0e-4
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 11, 1
 0.0, {n_step * dt}, {n_step}, {dt}
 0.5, 0.25
 1, 1, 0.0, 0.0
 10
!VELOCITY, TYPE=INITIAL
 ALL, 3, 3, -2.0
!STEP, SUBSTEPS=1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.3
!DENSITY
 1.0
!SOLVER,METHOD=CG
 100, 1
 1.0e-10, 1.0, 0.0
!END
"""
    model, out = _run_deck(cnt)
    np.testing.assert_allclose(out.u[:, 2], -2.0 * n_step * dt,
                               rtol=1e-6)


def test_prescribed_velocity_bc_tracks_rate():
    """VELOCITY (no TYPE) on the top face with the base fixed: the
    driven dofs must track u = v*t through the Newmark displacement
    relation."""
    n_step, dt, v = 8, 0.01, -0.5
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 1, 1
 0.0, {n_step * dt}, {n_step}, {dt}
 0.5, 0.25
 1, 1, 0.0, 0.0
 10
!BOUNDARY, GRPID=1
 Z0, 1, 3, 0.0
!VELOCITY, GRPID=1
 Z1, 3, 3, {v}
!STEP, SUBSTEPS=1, CONVERG=1.0e-10
 BOUNDARY, 1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.0
!DENSITY
 1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""
    model, out = _run_deck(cnt, mesh=box_hex8(1, 1, 2))
    top = model.mesh.node_groups["Z1"]
    # trapezoid-consistent ramp-on: v averages (0 + v)/2 over the first
    # step, so u_n = v (t - dt/2) exactly (same as the reference's
    # b2/b3/b4 relation); velocity itself reaches v exactly
    np.testing.assert_allclose(out.u[top, 2],
                               v * (n_step * dt - 0.5 * dt), rtol=1e-9)
    np.testing.assert_allclose(out.vel[top, 2], v, rtol=1e-9)


@requires_reference
def test_tutorial14_plate_impact_smoke():
    """Tutorial 14 (dynamic plate-to-ground impact, SLAGRANGE +
    initial velocity + perfect plasticity), shortened to 15 steps:
    runs, stays finite, and the plate has moved down by ~v0*t."""
    from frontistr_tpu.io.meshio import read_mesh
    d = os.path.join(REFERENCE, "tutorial", "14_dynamic_plate_contact")
    mesh = read_mesh(os.path.join(d, "plateToGround.msh"))
    cfg = read_cnt(os.path.join(d, "plateToGround.cnt"))
    cfg.dynamic.n_step = 15
    model = build_struct_model(mesh, cfg)
    out = run_dynamic(model)
    assert np.isfinite(out.u).all() and np.isfinite(out.vel).all()
    plate = model.mesh.node_groups["plate"]
    t = 15 * cfg.dynamic.t_delta
    uz = out.u[plate, 2]
    # plate fell ~v0*t (some nodes arrested by contact may lag)
    assert uz.min() < -0.5 * 4427.0 * t
    assert uz.min() > -2.0 * 4427.0 * t


def test_prescribed_velocity_bc_explicit_tracks_rate():
    """EXPLICIT (idx_eqa=11) prescribed velocity: the central-difference
    relation u_{n+1} = u_{n-1} + 2 dt v (dynamic_mat_ass_bc_vl explicit
    branch) makes driven dofs track u = v*t exactly."""
    n_step, v = 40, -0.5
    dt = 1.0e-4            # well under the CFL limit for E=1000, rho=1
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 11, 1
 0.0, {n_step * dt}, {n_step}, {dt}
 0.5, 0.25
 1, 1, 0.0, 0.0
 10
!BOUNDARY, GRPID=1
 Z0, 1, 3, 0.0
!VELOCITY, GRPID=1
 Z1, 3, 3, {v}
!STEP, SUBSTEPS=1
 BOUNDARY, 1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.0
!DENSITY
 1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""
    model, out = _run_deck(cnt, mesh=box_hex8(1, 1, 2))
    top = model.mesh.node_groups["Z1"]
    # u_{n+1} = u_{n-1} + 2 dt v telescopes to u_n = v * t exactly
    np.testing.assert_allclose(out.u[top, 2], v * n_step * dt,
                               rtol=1e-9)
    np.testing.assert_allclose(out.vel[top, 2], v, rtol=1e-9)


def test_prescribed_acceleration_bc_explicit():
    """EXPLICIT prescribed acceleration: u_{n+1} = 2u_n - u_{n-1} +
    dt^2 a telescopes to the exact discrete sum u_n = a dt^2 n(n+1)/2
    (dynamic_mat_ass_bc_ac explicit branch)."""
    n_step, a = 40, -30.0
    dt = 1.0e-4
    cnt = f"""!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 11, 1
 0.0, {n_step * dt}, {n_step}, {dt}
 0.5, 0.25
 1, 1, 0.0, 0.0
 10
!BOUNDARY, GRPID=1
 Z0, 1, 3, 0.0
!ACCELERATION, GRPID=1
 Z1, 3, 3, {a}
!STEP, SUBSTEPS=1
 BOUNDARY, 1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.0
!DENSITY
 1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""
    model, out = _run_deck(cnt, mesh=box_hex8(1, 1, 2))
    top = model.mesh.node_groups["Z1"]
    u_exact = a * dt * dt * n_step * (n_step + 1) / 2.0
    np.testing.assert_allclose(out.u[top, 2], u_exact, rtol=1e-9)
