"""Device-side follower DLOAD assembly must match the host numpy path
bit-for-bit-ish (same math, traced): collect_dload(coords0+u) vs
FollowerDload(u) for body forces, gravity, centrifugal, and face
pressure on a deformed configuration."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from frontistr_tpu.meshgen import box_hex8, box_tet4
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model
from frontistr_tpu.assembly.loads import collect_dload, FollowerDload


CNT = """!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY
 X0, 1, 3, 0.0
!DLOAD
 ALL, P2, 8.0
 ALL, GRAV, 9.8, 0.0, 0.0, -1.0
 ALL, BX, 1.5
 ALL, CENT, 3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0
!STEP, SUBSTEPS=1, CONVERG=1.0e-6
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.3
!DENSITY
 2.5
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-10, 1.0, 0.0
!END
"""


def _model(mesh):
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(CNT)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    return build_struct_model(mesh, cfg)


def test_follower_device_matches_host():
    for mesh in (box_hex8(2, 2, 2), box_tet4(2, 2, 2)):
        model = _model(mesh)
        cards, lgrp = model.dload_grp
        fol = FollowerDload(model, cards, lgrp)
        assert fol.ok
        rng = np.random.default_rng(7)
        u = rng.normal(scale=0.05, size=model.n_dof_total)
        coords_def = model.coords + u.reshape(model.n_node,
                                              model.ndof)[:, :model.dim]
        f_host = collect_dload(model.mesh, model, cards, lgrp,
                               coords=coords_def)
        f_dev = np.asarray(fol(jnp.asarray(u)))
        np.testing.assert_allclose(f_dev, f_host, rtol=1e-12, atol=1e-12)


def test_follower_device_rejects_shell():
    """6-dof / shell models keep the host path (ok=False)."""
    from frontistr_tpu.io.meshio import read_mesh
    msh = """!HEADER
 sh
!NODE
 1, 0., 0., 0.
 2, 1., 0., 0.
 3, 1., 1., 0.
 4, 0., 1., 0.
!ELEMENT, TYPE=741
 1, 1, 2, 3, 4
!SECTION, TYPE=SHELL, EGRP=ALL, MATERIAL=M1
 0.1, 5
!END
"""
    cnt = """!VERSION
 3
!SOLUTION, TYPE=NLSTATIC
!BOUNDARY
 1, 1, 6, 0.0
!DLOAD
 ALL, P0, 1.0
!STEP, SUBSTEPS=1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.3
!DENSITY
 1.0
!SOLVER,METHOD=CG
 100, 1
 1.0e-10, 1.0, 0.0
!END
"""
    with tempfile.TemporaryDirectory() as d:
        mp, cp = os.path.join(d, "m.msh"), os.path.join(d, "m.cnt")
        open(mp, "w").write(msh)
        open(cp, "w").write(cnt)
        mesh = read_mesh(mp)
        cfg = read_cnt(cp)
    model = build_struct_model(mesh, cfg)
    cards = cfg.dloads
    fol = FollowerDload(model, cards)
    assert not fol.ok
