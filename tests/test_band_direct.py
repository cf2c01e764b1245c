"""In-house ON-DEVICE direct factorization (solver/band.py): blocked
band Cholesky vs host SuperLU, and the FRONTISTR_TPU_DIRECT=band arm of
the METHOD=DIRECT eigen / implicit-dynamics drivers (the reference's
hecmw_solver_direct.f90 counterpart, scipy retired)."""

import numpy as np
import pytest

from tests.test_direct_drivers import _cfg, DYN, EIG
from frontistr_tpu.meshgen import box_tet4, box_hex8
from frontistr_tpu.assembly.model import build_struct_model


def test_band_cholesky_matches_superlu():
    import jax
    import jax.numpy as jnp
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.solver.band import BandCholesky
    from frontistr_tpu.solver.direct import assemble_csr
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    mesh = box_hex8(4, 3, 5)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    table = get_table(361)
    E = conn.shape[0]
    D1 = elastic_D(210e3, 0.3, D3)
    D_e = jnp.asarray(np.broadcast_to(D1, (E,) + D1.shape))
    ke = np.asarray(solid.stiffness_linear(
        table, jnp.asarray(mesh.coords)[conn], D_e))
    dofs = (conn[:, :, None] * 3 +
            np.arange(3)[None, None, :]).reshape(E, -1)
    free = np.ones(n_node * 3)
    free[(mesh.node_groups["X0"][:, None] * 3 +
          np.arange(3)).ravel()] = 0.0

    bc = BandCholesky([ke], [dofs], n_node * 3, free, [conn], n_node)
    A = assemble_csr([ke], [dofs], n_node * 3)
    P = sp.diags(free)
    Ac = P @ A @ P + sp.diags(1.0 - free)
    lu = spla.splu(Ac.tocsc())
    rng = np.random.default_rng(0)
    for _ in range(3):
        b = rng.standard_normal(n_node * 3)
        x0 = lu.solve(b)
        x1 = bc.solve(b)
        np.testing.assert_allclose(x1, x0, rtol=1e-10,
                                   atol=1e-12 * np.abs(x0).max())


def test_band_eigen_matches_superlu(monkeypatch):
    from frontistr_tpu.analysis.eigen import run_eigen

    def run():
        model = build_struct_model(box_tet4(3, 3, 3),
                                   _cfg(EIG, "DIRECT"))
        return run_eigen(model)

    r_slu = run()
    monkeypatch.setenv("FRONTISTR_TPU_DIRECT", "band")
    r_band = run()
    np.testing.assert_allclose(r_band.freq, r_slu.freq, rtol=1e-8)


def test_band_dynamics_matches_superlu(monkeypatch):
    from frontistr_tpu.analysis.dynamic import run_dynamic

    def run():
        model = build_struct_model(box_tet4(3, 3, 3),
                                   _cfg(DYN, "DIRECT"))
        out = run_dynamic(model)
        return np.asarray(out.u), np.asarray(out.vel)

    u0, v0 = run()
    monkeypatch.setenv("FRONTISTR_TPU_DIRECT", "band")
    u1, v1 = run()
    assert np.abs(u0).max() > 1e-8
    np.testing.assert_allclose(u1, u0, rtol=1e-8,
                               atol=1e-11 * np.abs(u0).max())
    np.testing.assert_allclose(v1, v0, rtol=1e-8,
                               atol=1e-11 * max(np.abs(v0).max(), 1.0))
