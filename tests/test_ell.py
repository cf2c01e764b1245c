"""Block-ELL operator equivalence vs the incidence-gather operator."""
import numpy as np
import jax.numpy as jnp
import pytest

from frontistr_tpu.assembly import ell, femop
from frontistr_tpu.assembly import operators as ops
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.fem.material import elastic_D, D3
from frontistr_tpu.meshgen import box_hex8


def _hex_model(nx=4, ny=3, nz=2):
    mesh = box_hex8(nx, ny, nz)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    ndof = 3
    table = get_table(361)
    D1 = elastic_D(210e3, 0.3, D3)
    E = conn.shape[0]
    D_e = jnp.asarray(np.broadcast_to(D1, (E,) + D1.shape))
    coords_e = jnp.asarray(mesh.coords[conn])
    ke = solid.stiffness_linear(table, coords_e, D_e)
    dofs = (conn[:, :, None] * ndof +
            np.arange(ndof)[None, None, :]).reshape(E, -1).astype(np.int32)
    fixed = (mesh.node_groups["X0"][:, None] * 3 +
             np.arange(3)[None, :]).reshape(-1)
    free = np.ones(n_node * ndof)
    free[fixed] = 0.0
    return mesh, conn, ke, dofs, n_node, ndof, free


def test_ell_matvec_matches_femop():
    mesh, conn, ke, dofs, n_node, ndof, free = _hex_model()
    inc, total_en = femop.build_incidence([conn], n_node)
    fop = femop.FEOperator(kes=[ke], dofs=[jnp.asarray(dofs)], nns=[8],
                           inc=jnp.asarray(inc), total_en=total_en,
                           n_node=n_node, ndof=ndof,
                           free_mask=jnp.asarray(free))
    prof = ell.build_profile([conn], n_node, ndof)
    blocks = ell.assemble_blocks(prof, [ke], [8])
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=ndof,
                          free_mask=jnp.asarray(free))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_node * ndof))
    np.testing.assert_allclose(np.asarray(eop.matvec(x)),
                               np.asarray(fop.matvec(x)),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(eop.apply_constrained(x)),
                               np.asarray(fop.apply_constrained(x)),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(eop.diag_blocks()),
                               np.asarray(fop.diag_blocks()),
                               rtol=1e-12, atol=1e-9)
    # block-jacobi application
    r = jnp.asarray(rng.standard_normal(n_node * ndof))
    np.testing.assert_allclose(np.asarray(eop.block_jacobi()(r)),
                               np.asarray(fop.block_jacobi()(r)),
                               rtol=1e-10, atol=1e-10)


def test_ell_mixed_blocks_tet_and_hex():
    """Two element blocks sharing nodes (hex box split into hex + tets)."""
    from frontistr_tpu.meshgen import box_hex8
    mesh = box_hex8(3, 2, 2)
    conn_hex = mesh.blocks[0].conn
    n_node = mesh.n_node
    ndof = 3
    # fabricate a tet block on top of some hex nodes (structure test only)
    rng = np.random.default_rng(1)
    conn_tet = np.stack([
        conn_hex[:5, 0], conn_hex[:5, 1], conn_hex[:5, 2], conn_hex[:5, 5],
    ], axis=1).astype(conn_hex.dtype)
    table_h = get_table(361)
    D1 = elastic_D(100.0, 0.25, D3)
    Dh = jnp.asarray(np.broadcast_to(D1, (conn_hex.shape[0], 6, 6)))
    keh = solid.stiffness_linear(table_h, jnp.asarray(mesh.coords[conn_hex]),
                                 Dh)
    # random symmetric tet "stiffness"
    A = rng.standard_normal((conn_tet.shape[0], 12, 12))
    ket = jnp.asarray(A + np.swapaxes(A, 1, 2))
    dofs_h = (conn_hex[:, :, None] * 3 + np.arange(3)).reshape(
        conn_hex.shape[0], -1).astype(np.int32)
    dofs_t = (conn_tet[:, :, None] * 3 + np.arange(3)).reshape(
        conn_tet.shape[0], -1).astype(np.int32)
    free = np.ones(n_node * 3)
    free[:6] = 0.0
    inc, total_en = femop.build_incidence([conn_hex, conn_tet], n_node)
    fop = femop.FEOperator(kes=[keh, ket],
                           dofs=[jnp.asarray(dofs_h), jnp.asarray(dofs_t)],
                           nns=[8, 4], inc=jnp.asarray(inc),
                           total_en=total_en, n_node=n_node, ndof=3,
                           free_mask=jnp.asarray(free))
    prof = ell.build_profile([conn_hex, conn_tet], n_node, 3)
    blocks = ell.assemble_blocks(prof, [keh, ket], [8, 4])
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=3,
                          free_mask=jnp.asarray(free))
    x = jnp.asarray(rng.standard_normal(n_node * 3))
    np.testing.assert_allclose(np.asarray(eop.matvec(x)),
                               np.asarray(fop.matvec(x)),
                               rtol=1e-12, atol=1e-9)


def test_ell_ndof1_heat_graph():
    """ndof=1 (heat) path."""
    mesh = box_hex8(3, 3, 2)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    rng = np.random.default_rng(2)
    A = rng.standard_normal((conn.shape[0], 8, 8))
    ke = jnp.asarray(A + np.swapaxes(A, 1, 2))
    free = np.ones(n_node)
    free[mesh.node_groups["X0"]] = 0.0
    inc, total_en = femop.build_incidence([conn], n_node)
    fop = femop.FEOperator(kes=[ke], dofs=[jnp.asarray(conn.astype(
        np.int32))], nns=[8], inc=jnp.asarray(inc), total_en=total_en,
        n_node=n_node, ndof=1, free_mask=jnp.asarray(free))
    prof = ell.build_profile([conn], n_node, 1)
    blocks = ell.assemble_blocks(prof, [ke], [8])
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=1,
                          free_mask=jnp.asarray(free))
    x = jnp.asarray(rng.standard_normal(n_node))
    np.testing.assert_allclose(np.asarray(eop.matvec(x)),
                               np.asarray(fop.matvec(x)),
                               rtol=1e-12, atol=1e-9)
