"""Per-interval result files + in-situ visualization for transient
analyses: '!WRITE,RESULT,FREQUENCY=n' / '!WRITE,VISUAL,FREQUENCY=n'
must emit a snapshot every n time steps — the reference writes the
result file AND calls the visualizer inside the time loop
(heat_solve_TRAN.f90:268-270; fstr_solve_dynamic output cadence), not
once at the end."""
import os
import re
import shutil

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE


def _workdir(tmp_path, msh_src, cnt_text, msh_name, cnt_name):
    shutil.copy(msh_src, tmp_path / msh_name)
    (tmp_path / cnt_name).write_text(cnt_text)
    (tmp_path / "hecmw_ctrl.dat").write_text(
        f"!MESH, NAME=fstrMSH, TYPE=HECMW-ENTIRE\n {msh_name}\n"
        f"!CONTROL, NAME=fstrCNT\n {cnt_name}\n"
        f"!RESULT, NAME=fstrRES, IO=OUT\n out.res\n")


@requires_reference
def test_heat_transient_interval_files(tmp_path):
    """exU U231 shortened to 6 steps: RESULT every 2 steps -> .0.2/.0.4/
    .0.6; VISUAL every 3 -> result.3.bmp/result.6.bmp; each snapshot
    carries the temperature OF THAT step (monotone DFLUX heating)."""
    d = os.path.join(REFERENCE, "examples", "heat", "exU")
    cnt = open(os.path.join(d, "U231.cnt")).read()
    cnt = cnt.replace(" 120., 34560.", " 120., 720.")
    cnt = ("!WRITE,RESULT,FREQUENCY=2\n!WRITE,VISUAL,FREQUENCY=3\n"
           "!VISUAL, METHOD=PSR\n!x_resolution = 40\n!y_resolution = 40\n"
           + cnt)
    _workdir(tmp_path, os.path.join(d, "U231.msh"), cnt,
             "U231.msh", "U231.cnt")
    from frontistr_tpu.run import run_directory
    out = run_directory(str(tmp_path))
    assert out["heat"].steps == 6
    for k in (2, 4, 6):
        assert (tmp_path / f"out.res.0.{k}").exists()
    for k in (1, 3, 5):
        assert not (tmp_path / f"out.res.0.{k}").exists()
    for k in (3, 6):
        assert (tmp_path / f"result.{k}.bmp").exists()
    # snapshots are the evolving field, not copies of the final state
    from frontistr_tpu.io.resfile import read_result
    T2 = np.asarray(read_result(
        str(tmp_path / "out.res.0.2"))["node_comps"][0][1]).reshape(-1)
    T6 = np.asarray(read_result(
        str(tmp_path / "out.res.0.6"))["node_comps"][0][1]).reshape(-1)
    # max T is pinned at FIXTEMP; the DFLUX keeps warming the rest
    assert T6.sum() > T2.sum() + 1e-6


@requires_reference
def test_dynamic_interval_files(tmp_path):
    """exX W361 implicit shortened to 10 steps: RESULT every 3 steps ->
    .0.3/.0.6/.0.9 plus the final-state fallback .0.10; VISUAL every 5
    -> result.5.bmp/result.10.bmp."""
    d = os.path.join(REFERENCE, "examples", "dynamic", "exX")
    cnt = open(os.path.join(d, "W361_c0_im_m2_t1.cnt")).read()
    cnt = cnt.replace(" 0.0, 1.0, 50, 1.0000e-6",
                      " 0.0, 0.2, 10, 1.0000e-6")
    cnt = cnt.replace("!WRITE,RESULT,FREQUENCY=10",
                      "!WRITE,RESULT,FREQUENCY=3\n"
                      "!WRITE,VISUAL,FREQUENCY=5\n"
                      "!VISUAL, METHOD=PSR\n!x_resolution = 40\n"
                      "!y_resolution = 40")
    _workdir(tmp_path, os.path.join(d, "W361_step.msh"), cnt,
             "W361_step.msh", "W361.cnt")
    from frontistr_tpu.run import run_directory
    out = run_directory(str(tmp_path))
    assert out["dynamic"].steps == 10
    for k in (3, 6, 9, 10):
        assert (tmp_path / f"out.res.0.{k}").exists(), k
    for k in (1, 2, 4, 5):
        assert not (tmp_path / f"out.res.0.{k}").exists(), k
    for k in (5, 10):
        assert (tmp_path / f"result.{k}.bmp").exists(), k
    # displacement grows from snapshot 3 to 9 under the step load
    from frontistr_tpu.io.resfile import read_result
    u3 = np.abs(np.asarray(read_result(
        str(tmp_path / "out.res.0.3"))["node_comps"][0][1])).max()
    u9 = np.abs(np.asarray(read_result(
        str(tmp_path / "out.res.0.9"))["node_comps"][0][1])).max()
    assert u9 > u3
