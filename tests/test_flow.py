"""u-p flow element 3414 + SUPG/PSPG stepper (analysis/flow.py).

Reference: static_LIB_3d_vp.f90 (STF/LOAD/UPDATE_C3_vp) driven through
the nonlinear-implicit dynamic loop with zero mass.  No runnable
reference exists in-tree (tutorial 18 ships no mesh), so these tests
assert the physics: assembly consistency, incompressibility, and the
lid-driven-cavity recirculation pattern.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from frontistr_tpu.meshgen import box_tet4
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import fluid as flib
from frontistr_tpu.assembly import ell


def _fluid_mesh(n=3):
    m = box_tet4(n, n, n)
    b = m.blocks[0]
    m.blocks = [dataclasses.replace(b, etype=3414)]
    return m


def _cavity_cfg(mu=1.0, rho=1.0, dt=0.1, lid=1.0, maxiter=30):
    from frontistr_tpu.io.ctrlio import AnalysisConfig, Card, StepInfo

    cfg = AnalysisConfig()
    cfg.solution_type = "DYNAMIC"
    from frontistr_tpu.io.ctrlio import DynamicConfig
    cfg.dynamic = DynamicConfig(n_step=5, t_delta=dt)
    st = StepInfo()
    st.max_iter = maxiter
    st.converg = 1e-10
    cfg.steps = [st]
    # walls no-slip, lid slides in +x
    cfg.boundaries = [
        Card("BOUNDARY", {}, [["X0", "1", "3", "0.0"],
                              ["X1", "1", "3", "0.0"],
                              ["Y0", "1", "3", "0.0"],
                              ["Y1", "1", "3", "0.0"],
                              ["Z0", "1", "3", "0.0"],
                              ["Z1", "1", "1", str(lid)],
                              ["Z1", "2", "3", "0.0"]])]

    class _M:
        fluid = Card("FLUID", {"TYPE": "INCOMP_NEWTONIAN"}, [[str(mu)]])
        density = Card("DENSITY", {}, [[str(rho)]])
    cfg.materials = [_M()]
    return cfg


def test_element_matrix_structure():
    """K blocks: symmetric Stokes limit checks + PSPG positivity."""
    m = _fluid_mesh(2)
    conn = np.asarray(m.blocks[0].conn)
    table = get_table(3414)
    x = jnp.asarray(m.coords)[jnp.asarray(conn)]
    v0 = jnp.zeros((conn.shape[0], 4, 4))
    K, b = flib.stf_load_c3_vp(table, x, v0, 1.0, 1.0, 1e12)
    K = np.asarray(K)
    assert np.all(np.isfinite(K)) and np.abs(b).max() < 1e-6
    # at rest with dt -> inf the velocity block is the symmetric
    # (grad-div augmented) viscous operator
    for e in range(3):
        Kv = K[e].reshape(4, 4, 4, 4)[:, :3, :, :3]
        Kv = Kv.reshape(12, 12)
        assert np.abs(Kv - Kv.T).max() < 1e-10 * np.abs(Kv).max()
    # pressure-pressure block (PSPG) is PSD on each element
    for e in range(3):
        Kp = K[e].reshape(4, 4, 4, 4)[:, 3, :, 3]
        w = np.linalg.eigvalsh(0.5 * (Kp + Kp.T))
        assert w.min() > -1e-12 * max(w.max(), 1)


def test_global_assembly_matches_elementwise():
    """ELL ndof=4 assembly of K reproduces the elementwise matvec."""
    m = _fluid_mesh(2)
    conn = np.asarray(m.blocks[0].conn, np.int64)
    n = m.n_node
    table = get_table(3414)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((n, 4)) * 0.1
    x = jnp.asarray(m.coords)[jnp.asarray(conn)]
    K, b = flib.stf_load_c3_vp(table, x, jnp.asarray(v)[jnp.asarray(conn)],
                               0.7, 1.3, 0.5)
    prof = ell.build_profile([conn], n, 4)
    blocks = ell._assemble_jit(prof.device(), (K,), (4,))
    op = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                         diag_slot=jnp.asarray(prof.diag_slot),
                         n_node=n, ndof=4,
                         free_mask=jnp.ones(n * 4))
    w = rng.standard_normal(n * 4)
    got = np.asarray(op.matvec(jnp.asarray(w)))
    want = np.zeros(n * 4)
    we = w.reshape(n, 4)[conn].reshape(-1, 16)
    r = np.einsum("eij,ej->ei", np.asarray(K), we)
    np.add.at(want, (conn[:, :, None] * 4
                     + np.arange(4)[None, None, :]).reshape(-1),
              r.reshape(-1))
    assert np.abs(got - want).max() < 1e-8 * max(np.abs(want).max(), 1)


def test_lid_driven_cavity():
    from frontistr_tpu.analysis.flow import run_flow

    n = 4
    m = _fluid_mesh(n)
    cfg = _cavity_cfg(mu=1.0, rho=1.0, dt=0.25, lid=1.0)
    res = run_flow(m, cfg, n_step=6)
    assert res.resid < 1e-6
    v = res.v
    nn1 = n + 1
    idx = np.arange(m.n_node).reshape(nn1, nn1, nn1)
    # lid BC held exactly
    lid = idx[:, :, -1].ravel()
    assert np.allclose(v[lid, 0], 1.0) and np.allclose(v[lid, 1:3], 0.0)
    # recirculation: x-velocity positive near the lid mid-column,
    # negative (return flow) in the lower half
    mid = n // 2
    assert v[idx[mid, mid, n - 1], 0] > 0.05
    assert v[idx[mid, mid, 1], 0] < -1e-3
    # global mass conservation: the signed integral of div v vanishes
    # exactly (PSPG enforces incompressibility weakly, so pointwise div
    # is only h-convergent; the closed-cavity net flux must be 0)
    table = get_table(3414)
    conn = np.asarray(m.blocks[0].conn)
    eps, _ = flib.update_c3_vp(table, jnp.asarray(m.coords)[
        jnp.asarray(conn)], jnp.asarray(v)[jnp.asarray(conn)])
    div = np.asarray(eps)[..., :3].sum(axis=-1).mean(axis=1)
    vol = np.abs(np.linalg.det(m.coords[conn][:, 1:]
                               - m.coords[conn][:, :1])) / 6
    assert abs((div * vol).sum()) < 1e-10
    assert np.abs(div).max() < 1.5    # coarse-mesh corner bound


def test_cavity_reaches_steady_state():
    from frontistr_tpu.analysis.flow import run_flow

    m = _fluid_mesh(3)
    cfg = _cavity_cfg(mu=1.0, rho=1.0, dt=0.5)
    r1 = run_flow(m, cfg, n_step=8)
    r2 = run_flow(m, cfg, n_step=16)
    # doubling the horizon barely moves the velocity field (pressure
    # settles slower through the PSPG gauge; velocity is the physics)
    d = np.abs(r2.v[:, :3] - r1.v[:, :3]).max()
    assert d < 0.03 * np.abs(r1.v[:, 0]).max()


def test_flow_result_writer(tmp_path):
    from frontistr_tpu.analysis.flow import run_flow, write_flow_result
    from frontistr_tpu.io.resfile import read_result_any

    m = _fluid_mesh(2)
    cfg = _cavity_cfg()
    res = run_flow(m, cfg, n_step=2)
    p = tmp_path / "flow.res.0.2"
    write_flow_result(str(p), m, res, step=2)
    comps = read_result_any(str(p))
    names = [c[0] for c in comps["node_comps"]]
    assert "VELOCITY" in names and "PRESSURE" in names
