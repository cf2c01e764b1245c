"""Coupler: cross-mesh interface mapping + staggered thermal-stress."""

import numpy as np


def test_linear_field_exact():
    from frontistr_tpu.meshgen import box_hex8, box_tet4
    from frontistr_tpu.couple.mapping import build_map
    src = box_hex8(3, 3, 3)
    dst = box_tet4(4, 4, 4)
    f = 2.0 * src.coords[:, 0] - 0.7 * src.coords[:, 1] \
        + 0.3 * src.coords[:, 2]
    m = build_map(src, dst.coords)
    want = 2.0 * dst.coords[:, 0] - 0.7 * dst.coords[:, 1] \
        + 0.3 * dst.coords[:, 2]
    np.testing.assert_allclose(m.transfer(f), want, atol=1e-12)
    assert not m.outside.any()


def test_staggered_heat_to_stress():
    """Steady heat on a coarse mesh -> temperature mapped to a finer
    mesh -> thermal stress there (the in-process analogue of the
    reference's coupled analysis)."""
    import os
    import tempfile
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.couple.mapping import StaggeredCoupling
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    from frontistr_tpu.assembly.loads import thermal_load

    src = box_hex8(2, 2, 2)
    dst = box_hex8(3, 3, 3)
    # analytic "heat result" on the coarse mesh: T = 100 x
    T_src = 100.0 * src.coords[:, 0]
    sc = StaggeredCoupling(src, dst)
    T_dst = sc.transfer(T_src)
    np.testing.assert_allclose(T_dst, 100.0 * dst.coords[:, 0],
                               atol=1e-10)

    cnt = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 X0, 1, 1, 0.0
 Y0, 2, 2, 0.0
 Z0, 3, 3, 0.0
!MATERIAL, NAME=M1
!ELASTIC
 210000., 0.3
!EXPANSION_COEFF
 1.0e-5
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
    model = build_struct_model(dst, cfg)
    model.temperature = T_dst
    model.f_ext = model.f_ext + thermal_load(model, T_dst)
    res = run_linear_static(model)
    # free thermal expansion of T = 100x from reftemp 0: nonzero expansion
    assert np.abs(res.u).max() > 1e-5
    assert np.isfinite(res.u).all()
