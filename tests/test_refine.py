"""Uniform refinement: volume/group preservation + solution convergence."""

import numpy as np


def _volumes(mesh):
    import jax.numpy as jnp
    from frontistr_tpu.fem.solid import volumes
    from frontistr_tpu.elements.tables import get_table
    tot = 0.0
    for b in mesh.blocks:
        t = get_table(b.etype)
        v = volumes(t, jnp.asarray(mesh.coords[b.conn]))
        tot += float(np.asarray(v).sum())
    return tot


def test_refine_hex_box():
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.refine import refine_mesh
    m0 = box_hex8(2, 2, 2)
    m1 = refine_mesh(m0, 1)
    assert m1.n_elem == 8 * m0.n_elem
    assert m1.n_node == 5 ** 3
    np.testing.assert_allclose(_volumes(m1), _volumes(m0), rtol=1e-12)
    # X0 face group: 5x5 = 25 nodes after refinement
    assert len(m1.node_groups["X0"]) == 25
    assert len(m1.node_groups["X1"]) == 25
    # all coords of refined X0 group on x=0
    assert np.allclose(m1.coords[m1.node_groups["X0"], 0], 0.0)


def test_refine_tet_volume_and_solution():
    from frontistr_tpu.meshgen import box_tet4
    from frontistr_tpu.io.refine import refine_mesh
    m0 = box_tet4(2, 2, 2)
    m1 = refine_mesh(m0, 1)
    assert m1.n_elem == 8 * m0.n_elem
    np.testing.assert_allclose(_volumes(m1), _volumes(m0), rtol=1e-12)
    # solve cantilever on coarse vs refined: refined is softer (closer
    # to the continuum), both converge
    import tempfile, os
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    cnt = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 X0, 1, 3, 0.0
!CLOAD
 X1, 3, -1.0
!MATERIAL, NAME=M1
!ELASTIC
 1000., 0.3
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(cnt)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    r0 = run_linear_static(build_struct_model(m0, cfg))
    r1 = run_linear_static(build_struct_model(m1, cfg))
    w0 = np.abs(r0.u[:, 2]).max()
    w1 = np.abs(r1.u[:, 2]).max()
    assert w1 > w0  # tet4 locking relaxes under refinement
    assert w1 < 5 * w0
