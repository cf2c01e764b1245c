"""F-bar hex8 (361 formulation 4): patch consistency, locking relief,
and tangent/internal-force consistency of the nonlinear arms.

Reference: fistr1/src/lib/static_LIB_Fbar.f90 (STF_C3D8Fbar /
Update_C3D8Fbar).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.fem.material import elastic_D, D3


def _distorted(nx=2, ny=2, nz=2, amp=0.12, seed=0):
    mesh = box_hex8(nx, ny, nz)
    rng = np.random.default_rng(seed)
    coords = mesh.coords.copy()
    interior = ((coords > 1e-9) & (coords < 1.0 - 1e-9)).all(axis=1)
    coords[interior] += amp * (rng.random((interior.sum(), 3)) - 0.5) \
        / max(nx, ny, nz)
    return mesh, coords


def test_fbar_linear_patch():
    """Uniform-strain field: the F-bar dilatation correction vanishes, so
    K_fbar @ u_affine == K_FI @ u_affine even on distorted elements."""
    mesh, coords = _distorted()
    conn = mesh.blocks[0].conn
    E = conn.shape[0]
    table = get_table(361)
    D = jnp.asarray(np.broadcast_to(elastic_D(210e3, 0.3, D3),
                                    (E, 6, 6)))
    ce = jnp.asarray(coords[conn])
    ke_fi = solid.stiffness_linear(table, ce, D)
    ke_fb = solid.stiffness_hex8fbar(table, ce, D)
    A = np.array([[2e-4, 1e-4, 0.0], [0.0, -3e-4, 2e-4],
                  [1e-4, 0.0, 1e-4]])
    u_lin = (coords @ A.T)[conn].reshape(E, -1)
    f_fi = np.asarray(jnp.einsum("eij,ej->ei", ke_fi, u_lin))
    f_fb = np.asarray(jnp.einsum("eij,ej->ei", ke_fb, u_lin))
    np.testing.assert_allclose(f_fb, f_fi, rtol=1e-8,
                               atol=1e-10 * np.abs(f_fi).max())
    # symmetric
    np.testing.assert_allclose(np.asarray(ke_fb),
                               np.asarray(jnp.swapaxes(ke_fb, 1, 2)),
                               rtol=1e-9, atol=1e-6)


def test_fbar_relieves_volumetric_locking():
    """Near-incompressible cantilever: F-bar deflection must far exceed
    full integration (which locks) and track B-bar closely."""
    mesh = box_hex8(1, 1, 6)
    conn = mesh.blocks[0].conn
    E = conn.shape[0]
    table = get_table(361)
    D = jnp.asarray(np.broadcast_to(elastic_D(1000.0, 0.4999, D3),
                                    (E, 6, 6)))
    ce = jnp.asarray(mesh.coords[conn])
    n_node = mesh.n_node

    def tip_deflection(ke):
        K = np.zeros((n_node * 3, n_node * 3))
        dofs = (conn[:, :, None] * 3 + np.arange(3)).reshape(E, -1)
        for e in range(E):
            K[np.ix_(dofs[e], dofs[e])] += np.asarray(ke[e])
        fixed = (mesh.node_groups["Z0"][:, None] * 3 +
                 np.arange(3)).reshape(-1)
        f = np.zeros(n_node * 3)
        f[mesh.node_groups["Z1"] * 3 + 0] = 1.0
        keep = np.setdiff1d(np.arange(n_node * 3), fixed)
        x = np.zeros(n_node * 3)
        x[keep] = np.linalg.solve(K[np.ix_(keep, keep)], f[keep])
        return np.abs(x[mesh.node_groups["Z1"] * 3 + 0]).max()

    d_fi = tip_deflection(solid.stiffness_linear(table, ce, D))
    d_fb = tip_deflection(solid.stiffness_hex8fbar(table, ce, D))
    zeros = jnp.zeros((E, table.nq, 6))
    d_bb = tip_deflection(solid.stiffness_nlgeom(
        table, ce, jnp.zeros_like(ce), D, zeros, 0, bbar=True))
    assert d_fb > 3.0 * d_fi, (d_fb, d_fi)
    assert abs(d_fb - d_bb) < 0.25 * d_bb, (d_fb, d_bb)


@pytest.mark.parametrize("nlgeom_flag", ["TOTALLAG", "UPDATELAG"])
def test_fbar_tangent_consistency(nlgeom_flag):
    """The hand-coded F-bar tangent (reference formula) must track the
    exact autodiff jacobian of the internal force closely.  The reference
    formula is itself slightly inconsistent at finite strain (the Jr
    linearization drops higher-order jacob_ave cross terms), so the band
    is 2%; at u=0 agreement is exact (checked separately)."""
    import tempfile
    import os
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import (BlockPrograms,
                                                  init_block_state)
    from frontistr_tpu.fem import material as mat

    mesh, coords = _distorted(1, 1, 2, amp=0.05)
    mesh.coords[:] = coords
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write("!VERSION\n 3\n!SOLUTION, TYPE=NLSTATIC\n"
                 "!SECTION, SECNUM=1, FORM361=FBAR\n"
                 "!BOUNDARY\n Z0, 1, 3, 0.0\n!CLOAD\n Z1, 1, 0.1\n"
                 "!STEP, SUBSTEPS=1, CONVERG=1.0e-10\n"
                 "!SOLVER, METHOD=CG\n 2000, 1\n 1.0e-12, 1.0, 0.0\n"
                 "!END\n")
        p = fh.name
    cfg = read_cnt(p)
    os.unlink(p)
    cfg.nlgeom = True
    model = build_struct_model(mesh, cfg)
    b = model.blocks[0]
    assert b.formulation == "FBAR"
    prog = BlockPrograms(model, b)
    prog.flag = getattr(mat, nlgeom_flag)
    state = init_block_state(b, prog.table)

    rng = np.random.default_rng(1)
    E, nn = b.conn.shape
    u_e = jnp.asarray(0.02 * rng.standard_normal((E, nn, 3)))

    def qf_of(du_flat):
        du_e = du_flat.reshape(E, nn, 3)
        _, qf = prog._update_fn(u_e, du_e, state, 0.0, 0.0)
        return qf

    J = jax.jacfwd(qf_of)(jnp.zeros(E * nn * 3))
    Jad = np.stack([np.asarray(J[e, :, e * 24:(e + 1) * 24])
                    for e in range(E)])
    st1 = prog._update_fn(u_e, jnp.zeros_like(u_e), state, 0.0, 0.0)[0]
    ke = np.asarray(prog._tangent_fn(u_e, jnp.zeros_like(u_e), st1,
                                     0.0, 0.0))
    scale = np.abs(Jad).max()
    assert np.abs(ke - Jad).max() <= 0.02 * scale
    # symmetric
    np.testing.assert_allclose(ke, ke.transpose(0, 2, 1), rtol=0,
                               atol=1e-8 * scale)
    # exact agreement at u = 0
    u0 = jnp.zeros_like(u_e)

    def qf_of0(du_flat):
        _, qf = prog._update_fn(u0, du_flat.reshape(E, nn, 3), state,
                                0.0, 0.0)
        return qf

    J0 = jax.jacfwd(qf_of0)(jnp.zeros(E * nn * 3))
    Jad0 = np.stack([np.asarray(J0[e, :, e * 24:(e + 1) * 24])
                     for e in range(E)])
    st0 = prog._update_fn(u0, u0, state, 0.0, 0.0)[0]
    ke0 = np.asarray(prog._tangent_fn(u0, u0, st0, 0.0, 0.0))
    np.testing.assert_allclose(ke0, Jad0, rtol=0,
                               atol=1e-9 * np.abs(Jad0).max())


def test_fbar_nlgeom_solve_converges():
    """End-to-end: an NLGEOM F-bar deck runs through the Newton driver
    and converges; result close to the B-bar solution of the same deck."""
    import tempfile
    import os
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    def run(form):
        mesh = box_hex8(1, 1, 4)
        with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                         delete=False) as fh:
            fh.write("!VERSION\n 3\n"
                     "!SOLUTION, TYPE=NLSTATIC, NLGEOM=YES\n"
                     f"!SECTION, SECNUM=1, FORM361={form}\n"
                     "!BOUNDARY\n Z0, 1, 3, 0.0\n"
                     "!CLOAD\n Z1, 1, 2.0\n"
                     "!STEP, SUBSTEPS=2, CONVERG=1.0e-8\n"
                     " 0.5, 1.0\n"
                     "!SOLVER, METHOD=CG\n 2000, 1\n"
                     " 1.0e-12, 1.0, 0.0\n!END\n")
            p = fh.name
        cfg = read_cnt(p)
        os.unlink(p)
        model = build_struct_model(mesh, cfg)
        assert model.blocks[0].formulation == form
        res = run_nonlinear_static(model)
        return np.asarray(res.u)

    u_fb = run("FBAR")
    u_bb = run("BBAR")
    assert np.isfinite(u_fb).all()
    m = np.abs(u_bb).max()
    assert np.abs(u_fb - u_bb).max() < 0.05 * m, (
        np.abs(u_fb - u_bb).max(), m)
