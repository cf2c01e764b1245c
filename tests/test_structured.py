"""Structured stencil operator == unstructured femop on box meshes."""

import numpy as np


def test_structured_matches_femop():
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.assembly import femop
    from frontistr_tpu.assembly.structured import (StructuredHexOperator,
                                                   soa_from_blocks)
    nx, ny, nz = 3, 4, 5
    mesh = box_hex8(nx, ny, nz)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    t = get_table(361)
    E = conn.shape[0]
    D1 = elastic_D(210e3, .3, D3)
    ke = solid.stiffness_linear(
        t, jnp.asarray(mesh.coords[conn]),
        jnp.asarray(np.broadcast_to(D1, (E, 6, 6))))
    inc, ten = femop.build_incidence([conn], n_node)
    free = np.ones(n_node * 3)
    free[:9] = 0.0
    dofs = jnp.asarray((conn[:, :, None] * 3 +
                        np.arange(3)).reshape(E, 24).astype(np.int32))
    op = femop.FEOperator(kes=[ke], dofs=[dofs], nns=[8],
                          inc=jnp.asarray(inc), total_en=ten,
                          n_node=n_node, ndof=3,
                          free_mask=jnp.asarray(free))
    sop = StructuredHexOperator(nx, ny, nz, soa_from_blocks(ke),
                                jnp.asarray(free))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_node * 3))
    np.testing.assert_allclose(np.asarray(sop.matvec(x)),
                               np.asarray(op.matvec(x)),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sop.apply_constrained(x)),
                               np.asarray(op.apply_constrained(x)),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sop.diag_blocks()),
                               np.asarray(op.diag_blocks()),
                               rtol=1e-12, atol=1e-9)


def test_const_operator_matches_soa_on_uniform_box():
    """StructuredHexOperatorConstD (ONE 24x24 ke, single-matmul matvec)
    equals the per-element SoA operator on a uniform box — the identity
    the bench's assembly-free f64 true-residual path rests on."""
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.assembly.structured import (
        StructuredHexOperatorConstD, StructuredHexOperatorD,
        soa_from_blocks)
    n = 4
    mesh = box_hex8(n, n, n)
    conn = mesh.blocks[0].conn
    t = get_table(361)
    lam = 210e3 * 0.3 / ((1 + 0.3) * (1 - 0.6))
    mu = 210e3 / 2.6
    coords = jnp.asarray(mesh.coords)
    ke = solid.stiffness_linear_iso(t, coords[conn], lam, mu)
    free = np.ones(mesh.n_node * 3)
    free[: 3 * (n + 1) ** 2] = 0.0
    fj = jnp.asarray(free)
    sop = StructuredHexOperatorD(n, n, n, soa_from_blocks(ke), fj)
    cop = StructuredHexOperatorConstD(n, n, n, ke[0], fj)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(mesh.n_node * 3))
    np.testing.assert_allclose(np.asarray(cop.matvec(x)),
                               np.asarray(sop.matvec(x)),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cop.apply_constrained(x)),
                               np.asarray(sop.apply_constrained(x)),
                               rtol=1e-12, atol=1e-9)
