"""User plug points (uelastic/umat/uload equivalents): a registered JAX
umat drives '!MATERIAL' + '!USER_MATERIAL' decks; uload adds force."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

import frontistr_tpu.user as fuser
from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model


@pytest.fixture(autouse=True)
def _clean_registry():
    fuser.clear()
    yield
    fuser.clear()


def _cnt(extra=""):
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write("!VERSION\n 3\n!SOLUTION, TYPE=NLSTATIC\n"
                "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
                + extra +
                "!STEP, SUBSTEPS=1, CONVERG=1.0e-8\n"
                "!SOLVER, METHOD=CG\n 4000, 1\n 1.0e-12, 1.0, 0.0\n"
                "!END\n")
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    return cfg


def test_user_material_matches_builtin_elastic():
    """A umat implementing isotropic elasticity reproduces the built-in
    ELASTIC result through the Newton driver."""
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    E_, nu = 1000.0, 0.3

    @fuser.register_umat("UM1")
    def umat(matl, strain, stress, fstat, dtime, ttime):
        lam = matl[0] * matl[1] / ((1 + matl[1]) * (1 - 2 * matl[1]))
        mu = matl[0] / (2 * (1 + matl[1]))
        D = jnp.zeros((6, 6))
        D = D.at[:3, :3].set(lam)
        D = D.at[jnp.arange(3), jnp.arange(3)].add(2 * mu)
        D = D.at[jnp.arange(3, 6), jnp.arange(3, 6)].set(mu)
        sig = D @ strain
        return D, sig, fstat + 1.0

    mesh = box_hex8(2, 2, 2)
    cfg_u = _cnt("!MATERIAL, NAME=UM1\n"
                 "!USER_MATERIAL, NSTATUS=1, INFINITE\n"
                 f" {E_}, {nu}\n")
    # mesh material name is M1; rename the cnt material to match
    cfg_u.materials["M1"] = cfg_u.materials.pop("UM1")

    @fuser.register_umat("M1")
    def umat2(matl, strain, stress, fstat, dtime, ttime):
        return umat(matl, strain, stress, fstat, dtime, ttime)

    model_u = build_struct_model(mesh, cfg_u)
    assert model_u.blocks[0].material.mtype == "USERMATERIAL"
    res_u = run_nonlinear_static(model_u)

    cfg_b = _cnt(f"!MATERIAL, NAME=M1\n!ELASTIC, INFINITE\n"
                 f" {E_}, {nu}\n")
    model_b = build_struct_model(mesh, cfg_b)
    res_b = run_nonlinear_static(model_b)
    np.testing.assert_allclose(res_u.u, res_b.u, rtol=1e-7,
                               atol=1e-12)


def test_uload_adds_force():
    from frontistr_tpu.analysis.static import run_linear_static

    @fuser.register_uload
    def pull(coords, t):
        f = np.zeros((len(coords), 3))
        f[:, 2] = 0.5
        return f

    mesh = box_hex8(2, 2, 2)
    cfg = _cnt("!MATERIAL, NAME=M1\n!ELASTIC, INFINITE\n 1000.0, 0.3\n")
    cfg.solution_type = "STATIC"
    model = build_struct_model(mesh, cfg)
    # every node got +0.5 in z on top of the CLOAD
    f = np.asarray(model.f_ext).reshape(-1, 3)
    assert np.allclose(f[:, 2].sum(),
                       0.5 * mesh.n_node - 1.0 * len(
                           mesh.node_groups["X1"]))
