"""CLI-level !RESTART: write checkpoints (FREQUENCY>0), resume
(FREQUENCY<0) — examples/static/restart deck pair (shear.cnt writes,
restart.cnt resumes; fstr_setup.f90 restart semantics)."""
import os
import shutil

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

D = os.path.join(REFERENCE, "examples", "static", "restart")


def _last_u1(log):
    out = None
    for ln in open(log):
        if "//U1" in ln:
            out = [float(t) for t in ln.split()[1:3]]
    return out


@requires_reference
def test_restart_deck_pair(tmp_path):
    for f in ("shear.cnt", "shear.msh", "restart.cnt"):
        shutil.copy(os.path.join(D, f), tmp_path)
    (tmp_path / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-ENTIRE\n shear.msh\n"
        "!CONTROL, NAME=fstrCNT\n shear.cnt\n"
        "!RESULT, NAME=fstrRES, IO=OUT\n shear.res\n"
        "!RESTART, NAME=restart_out, IO=OUT\n shear.restart\n")
    from frontistr_tpu.run import run_directory
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        run_directory(".")
        assert os.path.exists("shear.restart.npz")
        u1_full = _last_u1("0.log")
        os.replace("0.log", "0_phase1.log")
        # resume with the FREQUENCY=-2 deck
        txt = (tmp_path / "hecmw_ctrl.dat").read_text()
        (tmp_path / "hecmw_ctrl.dat").write_text(
            txt.replace("shear.cnt", "restart.cnt"))
        run_directory(".")
        u1_res = _last_u1("0.log")
    finally:
        os.chdir(cwd)
    assert u1_full is not None and u1_res is not None
    # resumed run reproduces the straight-through final state
    np.testing.assert_allclose(u1_res, u1_full, rtol=1e-10)
    assert abs(u1_full[0] - 0.1) < 1e-8      # prescribed shear reached
