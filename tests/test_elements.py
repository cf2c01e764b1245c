"""Unit tests for the element registry: partition of unity, derivative
consistency, quadrature volumes — per-kernel numeric tests the reference
lacks (SURVEY.md section 4 strategy (a))."""

import numpy as np
import pytest

from frontistr_tpu.elements.tables import ETYPE_INFO, get_table

SOLID_ETYPES = [231, 232, 241, 242, 341, 342, 351, 352, 361, 362]


@pytest.mark.parametrize("etype", SOLID_ETYPES)
def test_partition_of_unity(etype):
    t = get_table(etype)
    assert t.N.shape == (t.nq, t.nn)
    np.testing.assert_allclose(t.N.sum(axis=1), 1.0, atol=1e-12)


@pytest.mark.parametrize("etype", SOLID_ETYPES)
def test_deriv_sums_to_zero(etype):
    t = get_table(etype)
    np.testing.assert_allclose(t.dN.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("etype,vol", [
    (341, 1.0 / 6.0), (342, 1.0 / 6.0),       # unit tet
    (361, 8.0), (362, 8.0),                   # [-1,1]^3 cube
    (351, 1.0), (352, 1.0),                   # unit-tri prism, height 2 -> 1
    (231, 0.5), (232, 0.5),                   # unit triangle
    (241, 4.0), (242, 4.0),                   # [-1,1]^2 quad
])
def test_reference_volume(etype, vol):
    """Integrating 1 over the reference element must give its volume."""
    t = get_table(etype)
    # nodes at reference positions: invert isoparametric map by using the
    # natural coordinates of the element's own nodes
    coords = _reference_nodes(etype)
    import jax.numpy as jnp
    from frontistr_tpu.fem.solid import volumes
    v = volumes(t, jnp.asarray(coords)[None])
    np.testing.assert_allclose(np.asarray(v)[0], vol, rtol=1e-12)


def _reference_nodes(etype):
    if etype in (341, 342):
        corners = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                           float)
        if etype == 341:
            return corners
        mids_pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
        mids = np.array([(corners[a] + corners[b]) / 2 for a, b in mids_pairs])
        return np.vstack([corners, mids])
    if etype in (361, 362):
        c = np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                      [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], float)
        if etype == 361:
            return c
        pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        mids = np.array([(c[a] + c[b]) / 2 for a, b in pairs])
        return np.vstack([c, mids])
    if etype in (351, 352):
        c = np.array([[0, 0, -1], [1, 0, -1], [0, 1, -1],
                      [0, 0, 1], [1, 0, 1], [0, 1, 1]], float)
        if etype == 351:
            return c
        pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3),
                 (0, 3), (1, 4), (2, 5)]
        mids = np.array([(c[a] + c[b]) / 2 for a, b in pairs])
        return np.vstack([c, mids])
    if etype in (231, 232):
        c = np.array([[0, 0], [1, 0], [0, 1]], float)
        if etype == 231:
            return c
        pairs = [(0, 1), (1, 2), (2, 0)]
        mids = np.array([(c[a] + c[b]) / 2 for a, b in pairs])
        return np.vstack([c, mids])
    if etype in (241, 242):
        c = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
        if etype == 241:
            return c
        pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
        mids = np.array([(c[a] + c[b]) / 2 for a, b in pairs])
        return np.vstack([c, mids])
    raise ValueError(etype)


def test_stiffness_patch_tet4():
    """Single regular tet4: K must be symmetric, PSD, with 6 rigid-body
    zero modes."""
    import jax.numpy as jnp
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.fem.solid import stiffness_linear
    t = get_table(341)
    coords = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    D = elastic_D(210e3, 0.3, D3)
    ke = np.asarray(stiffness_linear(t, jnp.asarray(coords)[None],
                                     jnp.asarray(D)[None]))[0]
    np.testing.assert_allclose(ke, ke.T, atol=1e-8)
    w = np.linalg.eigvalsh(ke)
    assert (w > -1e-8).all()
    assert (np.abs(w) < 1e-6).sum() == 6  # rigid body modes


def test_stiffness_linear_iso_matches_generic():
    """Gram-matrix isotropic closed form == B^T D B to f64 roundoff
    (the f64 fast path behind bench asm64: 5.3 s -> 1.3 s at 1M dof)."""
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_hex8, box_tet4
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.elements.tables import get_table

    Em, nu = 210e3, 0.3
    lam = Em * nu / ((1 + nu) * (1 - 2 * nu))
    mu = Em / (2 * (1 + nu))
    for etype, mesh in ((361, box_hex8(2, 2, 2)), (341, box_tet4(2, 2, 2))):
        conn = mesh.blocks[0].conn
        E = conn.shape[0]
        t = get_table(etype)
        x = jnp.asarray(mesh.coords)[jnp.asarray(conn)]
        x = x + 0.05 * jnp.sin(x * 7.0)     # non-uniform geometry
        ref = solid.stiffness_linear(
            t, x, jnp.broadcast_to(jnp.asarray(elastic_D(Em, nu, D3)),
                                   (E, 6, 6)))
        iso = solid.stiffness_linear_iso(t, x, lam, mu)
        err = float(jnp.abs(ref - iso).max() / jnp.abs(ref).max())
        assert err < 1e-13, (etype, err)
