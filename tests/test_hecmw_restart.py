"""Reference-format restart interchange (hecmw_restart.c blob stream +
fstr_Restart.f90 v5 record sequence): byte framing, round trip, and a
checkpoint/resume run through the blob format."""

import os
import shutil
import struct

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE


def test_record_framing(tmp_path):
    """Each record = native size_t + payload; first record is the
    3-int step counter (fstr_write_restart record #1)."""
    from frontistr_tpu.io.hecmw_restart import write_fstr_restart
    p = str(tmp_path / "r.bin")
    write_fstr_restart(p, cstep_ext=2, substep=3, step_count=7,
                       ctime=0.5, dtime=0.1, steptime=0.5,
                       unode=np.arange(6.0), qforce=np.zeros(6),
                       gauss=[{"strain": np.arange(6.0),
                               "stress": np.ones(6)}])
    raw = open(p, "rb").read()
    size0 = struct.unpack_from("=Q", raw, 0)[0]
    assert size0 == 12                       # 3 x int32
    assert struct.unpack_from("=3i", raw, 8) == (2, 3, 7)
    size1 = struct.unpack_from("=Q", raw, 8 + 12)[0]
    assert size1 == 24                       # 3 x f64 times


def test_roundtrip(tmp_path):
    from frontistr_tpu.io.hecmw_restart import (write_fstr_restart,
                                                read_fstr_restart)
    p = str(tmp_path / "r.bin")
    g = [{"strain": np.arange(6.0), "stress": -np.arange(6.0),
          "istatus": np.asarray([1], np.int32),
          "fstatus": np.asarray([0.25])},
         {"strain": np.zeros(6), "stress": np.ones(6)}]
    write_fstr_restart(p, cstep_ext=1, substep=2, step_count=5,
                       ctime=1.5, dtime=0.5, steptime=1.0,
                       unode=np.arange(12.0), qforce=np.ones(12),
                       gauss=g, loads_prev=[4, 9])
    d = read_fstr_restart(p)
    assert (d["cstep_ext"], d["substep"], d["step_count"]) == (1, 2, 5)
    assert d["ctime"] == 1.5 and d["steptime"] == 1.0
    np.testing.assert_array_equal(d["loads_prev"], [4, 9])
    np.testing.assert_array_equal(d["unode"], np.arange(12.0))
    assert len(d["gauss"]) == 2
    np.testing.assert_array_equal(d["gauss"][0]["istatus"], [1])
    np.testing.assert_array_equal(d["gauss"][0]["fstatus"], [0.25])
    assert "istatus" not in d["gauss"][1]


@requires_reference
def test_resume_through_hecmw_blob(tmp_path, monkeypatch):
    """The restart deck pair runs with FRONTISTR_TPU_RESTART_FORMAT=
    hecmw: phase 1 checkpoints as a reference blob, phase 2 resumes
    from it, final state equals the straight-through run."""
    D = os.path.join(REFERENCE, "examples", "static", "restart")
    for f in ("shear.cnt", "shear.msh", "restart.cnt"):
        shutil.copy(os.path.join(D, f), tmp_path)
    (tmp_path / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-ENTIRE\n shear.msh\n"
        "!CONTROL, NAME=fstrCNT\n shear.cnt\n"
        "!RESULT, NAME=fstrRES, IO=OUT\n shear.res\n"
        "!RESTART, NAME=restart_out, IO=OUT\n shear.restart\n")
    monkeypatch.setenv("FRONTISTR_TPU_RESTART_FORMAT", "hecmw")
    from frontistr_tpu.run import run_directory

    def last_u1(log):
        out = None
        for ln in open(log):
            if "//U1" in ln:
                out = [float(t) for t in ln.split()[1:3]]
        return out

    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        run_directory(".")
        ck = "shear.restart.npz"
        assert os.path.exists(ck)
        with open(ck, "rb") as fh:
            assert fh.read(2) != b"PK"       # blob, not npz
        u1_full = last_u1("0.log")
        os.replace("0.log", "0_phase1.log")
        txt = (tmp_path / "hecmw_ctrl.dat").read_text()
        (tmp_path / "hecmw_ctrl.dat").write_text(
            txt.replace("shear.cnt", "restart.cnt"))
        run_directory(".")
        u1_res = last_u1("0.log")
    finally:
        os.chdir(cwd)
    np.testing.assert_allclose(u1_res, u1_full, rtol=1e-9)
