"""Aggregation-AMG V-cycle preconditioner: convergence + correctness."""
import numpy as np
import jax.numpy as jnp

from frontistr_tpu.assembly import ell
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.fem.material import elastic_D, D3
from frontistr_tpu.meshgen import box_tet4
from frontistr_tpu.solver import amg
from frontistr_tpu.solver.cg import pcg


def _setup(n=10):
    mesh = box_tet4(n, n, n)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    table = get_table(341)
    D1 = elastic_D(210e3, 0.3, D3)
    E = conn.shape[0]
    ke = solid.stiffness_linear(table, jnp.asarray(mesh.coords[conn]),
                                jnp.asarray(np.broadcast_to(D1, (E, 6, 6))))
    prof = ell.build_profile([conn], n_node, 3)
    blocks = ell.assemble_blocks(prof, [ke], [4])
    fixed = (mesh.node_groups["X0"][:, None] * 3 +
             np.arange(3)).reshape(-1)
    free = np.ones(n_node * 3)
    free[fixed] = 0.0
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=3,
                          free_mask=jnp.asarray(free))
    f = np.zeros(n_node * 3)
    f[mesh.node_groups["X1"] * 3 + 2] = -1.0
    return mesh, prof, eop, jnp.asarray(f * free)


def test_amg_beats_jacobi_iterations():
    mesh, prof, eop, b = _setup(10)
    res_j = pcg(eop.apply_constrained, b, M=eop.block_jacobi(),
                tol=1e-8, maxiter=3000)
    maps = amg.build_maps(prof.cols, eop.n_node, 3, S0=24, S1=16)
    M = amg.setup_amg(maps, eop.blocks, eop.cols,
                      jnp.asarray(mesh.coords), eop.free_mask,
                      eop.apply_constrained, eop.block_jacobi())
    res_a = pcg(eop.apply_constrained, b, M=M, tol=1e-8, maxiter=3000)
    assert bool(res_a.converged)
    # same solution
    np.testing.assert_allclose(np.asarray(res_a.x), np.asarray(res_j.x),
                               rtol=0, atol=1e-6 * float(
                                   jnp.abs(res_j.x).max()))
    # the point of AMG: much lower iteration count than block-Jacobi
    assert int(res_a.iters) < int(res_j.iters) / 3, \
        (int(res_a.iters), int(res_j.iters))


def test_amg_heat_ndof1():
    mesh = box_tet4(8, 8, 8)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    rng = np.random.default_rng(3)
    # SPD "conductance": graph Laplacian per element + small mass
    ke = np.zeros((conn.shape[0], 4, 4))
    ke[:] = -1.0
    ke[:, np.arange(4), np.arange(4)] = 3.0 + 0.1
    ke = jnp.asarray(ke)
    prof = ell.build_profile([conn], n_node, 1)
    blocks = ell.assemble_blocks(prof, [ke], [4])
    free = np.ones(n_node)
    free[mesh.node_groups["X0"]] = 0.0
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=1,
                          free_mask=jnp.asarray(free))
    b = jnp.asarray(rng.standard_normal(n_node)) * eop.free_mask
    maps = amg.build_maps(prof.cols, n_node, 1, S0=32, S1=16)
    M = amg.setup_amg(maps, eop.blocks, eop.cols,
                      jnp.asarray(mesh.coords), eop.free_mask,
                      eop.apply_constrained, eop.block_jacobi())
    res = pcg(eop.apply_constrained, b, M=M, tol=1e-8, maxiter=2000)
    assert bool(res.converged)
    r = np.asarray(b - eop.apply_constrained(res.x))
    assert np.linalg.norm(r) <= 1e-7 * np.linalg.norm(np.asarray(b))
