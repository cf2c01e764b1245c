"""!EQUATION (MPC) on contact decks.

The reference applies hecmw_mat_ass_equation at the middleware level
before EVERY solve — contact decks included — so MPCs must constrain
the contact solver arms too (round-3 gap: they were warned + dropped).

Strategy: a REDUNDANT tie — an equation the symmetric solution already
satisfies — run through each contact arm.  The elimination machinery
transforms the operator (wrong wiring would change the answer or blow
up the Krylov solve), while the correct answer stays bit-comparable to
the no-MPC run.  Each test asserts (a) the solution matches the no-MPC
reference run, (b) the equation is satisfied to solver precision.
"""

import os

import numpy as np
import pytest

from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.io.meshio import ContactPairDef, ElemBlock, Equation
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model
from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
from frontistr_tpu.analysis.dynamic import run_dynamic


def _two_block(algo="ALAGRANGE", tie=False, dynamic=False, n_step=4,
               dt=0.01):
    """Two stacked 1x1x1 blocks, each 2 elements tall, compressed
    uniaxially through a node-to-surface contact interface at z=1.
    tie=True adds a redundant !EQUATION u3(A)=u3(B) between two
    mid-layer nodes of the LOWER block (z=0.5) — symmetric, so the
    constrained answer equals the unconstrained one, and the tie nodes
    are disjoint from every contact surface (SLag composition valid)."""
    m = box_hex8(1, 1, 2)                      # nodes at z = 0, .5, 1
    n1 = m.n_node
    coords = np.vstack([m.coords, m.coords + np.array([0.0, 0.0, 1.0])])
    conn1 = m.blocks[0].conn
    conn2 = conn1 + n1
    E1 = conn1.shape[0]
    m.coords = coords
    m.node_ids = np.arange(1, len(coords) + 1)
    m.id2idx = {int(i): int(i) - 1 for i in m.node_ids}
    m.blocks = [ElemBlock(361, np.arange(1, E1 + 1), conn1, conn1),
                ElemBlock(361, np.arange(E1 + 1, 2 * E1 + 1), conn2,
                          conn2)]
    idx = np.arange(len(coords))
    slave = idx[(idx >= n1) & np.isclose(coords[:, 2], 1.0)]
    m.node_groups = {
        "ALL": idx,
        "BOT": idx[np.isclose(coords[:, 2], 0.0)],
        "TOP": idx[np.isclose(coords[:, 2], 2.0)],
        "SLAVE": slave,
        "XA": idx[np.isclose(coords[:, 0], 0.0)],
        "YA": idx[np.isclose(coords[:, 1], 0.0)]}
    # master = top face (face 2) of the lower block's upper element
    top_el = int(np.nonzero(
        np.isclose(coords[conn1][:, :, 2].mean(1), 0.75))[0][0]) + 1
    m.surf_groups = {"MAST": np.asarray([[top_el, 2]])}
    m.elem_groups = {"ALL": np.arange(1, 2 * E1 + 1)}
    m.contact_pairs = [ContactPairDef("CP1", "NODE-SURF", "SLAVE",
                                      "MAST")]
    mid = idx[np.isclose(coords[:, 2], 0.5)]
    tie_pair = (int(mid[0]), int(mid[-1]))
    if tie:
        a, b = tie_pair
        m.equations = [Equation(np.asarray([a, b]),
                                np.asarray([3, 3]),
                                np.asarray([1.0, -1.0]), 0.0)]
    if dynamic:
        body = f"""!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 1, 1
 0.0, {n_step * dt}, {n_step}, {dt}
 0.5, 0.25
 1, 1, 2.0, 0.0
 10
!BOUNDARY, GRPID=1
 BOT, 3, 3, 0.0
 XA, 1, 1, 0.0
 YA, 2, 2, 0.0
!CLOAD, GRPID=1
 TOP, 3, -2.0
!STEP, SUBSTEPS=1, CONVERG=1.0e-9
 BOUNDARY, 1
 LOAD, 1
 CONTACT, 1"""
    else:
        body = """!SOLUTION, TYPE=NLSTATIC
!BOUNDARY, GRPID=1
 BOT, 3, 3, 0.0
 XA, 1, 1, 0.0
 YA, 2, 2, 0.0
 TOP, 3, 3, -0.01
!STEP, SUBSTEPS=2, CONVERG=1.0e-9
 BOUNDARY, 1
 CONTACT, 1"""
    cnt = f"""!VERSION
 3
{body}
!CONTACT_ALGO, TYPE={algo}
!CONTACT, GRPID=1
 CP1, 0.0
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
    import tempfile as tf
    with tf.NamedTemporaryFile("w", suffix=".cnt", delete=False) as f:
        f.write(cnt)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    return build_struct_model(m, cfg), m, tie_pair


@pytest.mark.parametrize("algo", ["ALAGRANGE", "SLAGRANGE"])
def test_static_contact_mpc_redundant_tie(algo):
    model0, _, _ = _two_block(algo=algo, tie=False)
    u0 = np.asarray(run_nonlinear_static(model0).u)

    model1, _, (a, b) = _two_block(algo=algo, tie=True)
    u1 = np.asarray(run_nonlinear_static(model1).u)

    assert np.abs(u0).max() > 1e-4
    # equation satisfied to solver precision
    assert abs(u1[a, 2] - u1[b, 2]) < 1e-10
    # redundant tie: constrained answer == unconstrained answer
    np.testing.assert_allclose(u1, u0, rtol=1e-6,
                               atol=1e-8 * np.abs(u0).max())


def test_dynamic_contact_mpc_redundant_tie():
    model0, _, _ = _two_block(algo="ALAGRANGE", tie=False, dynamic=True)
    out0 = run_dynamic(model0)
    u0 = np.asarray(out0.u)

    model1, _, (a, b) = _two_block(algo="ALAGRANGE", tie=True,
                                   dynamic=True)
    out1 = run_dynamic(model1)
    u1 = np.asarray(out1.u)

    assert np.abs(u0).max() > 1e-6
    assert abs(u1[a, 2] - u1[b, 2]) < 1e-10
    np.testing.assert_allclose(u1, u0, rtol=1e-6,
                               atol=1e-8 * np.abs(u0).max())


def test_dynamic_contact_mpc_slag_redundant_tie():
    model0, _, _ = _two_block(algo="SLAGRANGE", tie=False, dynamic=True)
    u0 = np.asarray(run_dynamic(model0).u)

    model1, _, (a, b) = _two_block(algo="SLAGRANGE", tie=True,
                                   dynamic=True)
    u1 = np.asarray(run_dynamic(model1).u)

    assert np.abs(u0).max() > 1e-6
    assert abs(u1[a, 2] - u1[b, 2]) < 1e-10
    np.testing.assert_allclose(u1, u0, rtol=1e-6,
                               atol=1e-8 * np.abs(u0).max())


def test_sharded_contact_al_mpc_matches(monkeypatch):
    """AL contact + !EQUATION under FRONTISTR_TPU_SHARDS: the MPC
    elimination rides the sharded contact-extended solve (row-sharded
    mask, replicated tables) — 1-vs-8-device equality."""
    def run():
        model, _, (a, b) = _two_block(algo="ALAGRANGE", tie=True)
        u = np.asarray(run_nonlinear_static(model).u)
        assert abs(u[a, 2] - u[b, 2]) < 1e-10
        return u

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u1 = run()
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    u8 = run()

    assert np.abs(u1).max() > 1e-4
    np.testing.assert_allclose(u8, u1, rtol=1e-6,
                               atol=1e-8 * np.abs(u1).max())


def test_sharded_contact_slag_matches(monkeypatch):
    """SLAGRANGE elimination under FRONTISTR_TPU_SHARDS: the T_c^t A T_c
    wrap rides inside the GSPMD-sharded jitted solve (replicated cn
    slots, row-sharded vectors) — 1-vs-8-device equality, with and
    without a composed !EQUATION tie."""
    for tie in (False, True):
        def run():
            model, _, (a, b) = _two_block(algo="SLAGRANGE", tie=tie)
            u = np.asarray(run_nonlinear_static(model).u)
            if tie:
                assert abs(u[a, 2] - u[b, 2]) < 1e-10
            return u

        monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
        u1 = run()
        monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
        u8 = run()

        assert np.abs(u1).max() > 1e-4
        np.testing.assert_allclose(u8, u1, rtol=1e-6,
                                   atol=1e-8 * np.abs(u1).max())


def test_sharded_dynamic_contact_slag_matches(monkeypatch):
    """Newmark + SLAGRANGE contact under FRONTISTR_TPU_SHARDS equals
    single-device (elimination on the sharded effective matrix
    c1 K + c2 M)."""
    def run():
        model, _, _ = _two_block(algo="SLAGRANGE", tie=False,
                                 dynamic=True)
        return np.asarray(run_dynamic(model).u)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u1 = run()
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    u8 = run()

    assert np.abs(u1).max() > 1e-6
    np.testing.assert_allclose(u8, u1, rtol=1e-6,
                               atol=1e-8 * np.abs(u1).max())
