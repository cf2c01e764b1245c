"""Cluster-ELL operator equivalence vs scalar ELL / incidence-gather."""
import numpy as np
import jax.numpy as jnp

from frontistr_tpu.assembly import bell, ell, femop
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.fem.material import elastic_D, D3
from frontistr_tpu.meshgen import box_hex8, box_tet4


def _setup(mesh, etype):
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    table = get_table(etype)
    E = conn.shape[0]
    D1 = elastic_D(210e3, 0.3, D3)
    ke = solid.stiffness_linear(
        table, jnp.asarray(mesh.coords[conn]),
        jnp.asarray(np.broadcast_to(D1, (E, 6, 6))))
    prof = ell.build_profile([conn], n_node, 3)
    blocks = ell.assemble_blocks(prof, [ke], [table.nn])
    free = np.ones(n_node * 3)
    free[(mesh.node_groups["X0"][:, None] * 3 +
          np.arange(3)).reshape(-1)] = 0.0
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=3,
                          free_mask=jnp.asarray(free))
    cprof = bell.build_cluster_profile([conn], n_node, 3, scalar=prof)
    cb, raw = bell.assemble_cluster(cprof.device(), [ke], [table.nn])
    diag = bell.extract_diag(cprof.device(), raw)
    cop = bell.ClusterOperator(blocks=cb, ccols=jnp.asarray(cprof.ccols),
                               diag=diag, n_node=n_node, ndof=3,
                               G=cprof.G, free_mask=jnp.asarray(free))
    return prof, cprof, eop, cop, raw


def test_cluster_matvec_matches_scalar_tet():
    mesh = box_tet4(5, 4, 3)
    prof, cprof, eop, cop, raw = _setup(mesh, 341)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.n_node * 3))
    y_s = np.asarray(eop.matvec(x))
    y_c = np.asarray(cop.matvec(x))
    np.testing.assert_allclose(y_c, y_s, rtol=1e-12,
                               atol=1e-12 * np.abs(y_s).max())
    yc_con = np.asarray(cop.apply_constrained(x))
    ys_con = np.asarray(eop.apply_constrained(x))
    np.testing.assert_allclose(yc_con, ys_con, rtol=1e-12,
                               atol=1e-12 * np.abs(ys_con).max())


def test_cluster_matvec_matches_scalar_hex():
    mesh = box_hex8(4, 3, 5)
    prof, cprof, eop, cop, raw = _setup(mesh, 361)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(mesh.n_node * 3))
    np.testing.assert_allclose(
        np.asarray(cop.matvec(x)), np.asarray(eop.matvec(x)),
        rtol=1e-12, atol=1e-12)


def test_scalar_extraction_and_diag():
    mesh = box_tet4(4, 4, 4)
    prof, cprof, eop, cop, raw = _setup(mesh, 341)
    sb = bell.extract_scalar_blocks(cprof.device(), raw, prof.device())
    # planes form: nd*nd arrays of (N, W)
    sb4 = np.stack([np.stack([np.asarray(sb[i * 3 + j])
                              for j in range(3)], axis=-1)
                    for i in range(3)], axis=2)
    np.testing.assert_allclose(sb4, np.asarray(eop.blocks),
                               rtol=1e-12, atol=1e-12)
    n = jnp.arange(mesh.n_node)
    np.testing.assert_allclose(
        np.asarray(cop.diag),
        np.asarray(eop.blocks[n, eop.diag_slot]), rtol=1e-12, atol=0)


def test_cluster_cg_solves():
    from frontistr_tpu.solver.cg import pcg
    mesh = box_tet4(5, 5, 5)
    prof, cprof, eop, cop, raw = _setup(mesh, 341)
    f = np.zeros(mesh.n_node * 3)
    f[mesh.node_groups["X1"] * 3 + 2] = -1.0
    b = jnp.asarray(f) * cop.free_mask
    res_c = pcg(cop.apply_constrained, b, M=cop.block_jacobi(),
                tol=1e-10, maxiter=3000)
    res_s = pcg(eop.apply_constrained, b, M=eop.block_jacobi(),
                tol=1e-10, maxiter=3000)
    assert bool(res_c.converged)
    np.testing.assert_allclose(np.asarray(res_c.x), np.asarray(res_s.x),
                               rtol=1e-6,
                               atol=1e-8 * float(jnp.abs(res_s.x).max()))


def test_cluster_from_model_multiblock():
    """Mixed hex+tet model through bell.from_model vs femop gather."""
    import tempfile
    import os
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import compute_element_stiffness

    mesh = box_tet4(4, 4, 4)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write("!VERSION\n 3\n!SOLUTION, TYPE=STATIC\n"
                 "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
                 "!SOLVER, METHOD=CG\n 2000, 1\n 1.0e-10, 1.0, 0.0\n"
                 "!END\n")
        p = fh.name
    cfg = read_cnt(p)
    os.unlink(p)
    model = build_struct_model(mesh, cfg)
    kes = compute_element_stiffness(model)
    cop = bell.from_model(model, kes)
    fop = femop.from_model(model, kes)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(model.n_dof_total))
    np.testing.assert_allclose(np.asarray(cop.matvec(x)),
                               np.asarray(fop.matvec(x)),
                               rtol=1e-10, atol=1e-10)
