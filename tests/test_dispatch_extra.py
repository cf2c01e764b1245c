"""CLI dispatch of !SOLUTION TYPE=STATICEIGEN and ELEMCHECK/NZPROF
(fstr_main.f90:84-86 kstSTATICEIGEN / kstPRECHECK / kstNZPROF)."""

import os
import textwrap

import numpy as np

from frontistr_tpu.run import run_directory

MSH = "/root/reference/examples/static/exA/A341.msh"

CNT_SE = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE=STATICEIGEN
    !BOUNDARY
     FIX, 1, 3, 0.0
    !CLOAD
     CL1, 3, -1.0
    !MATERIAL, NAME=M1
    !ELASTIC
     4000.0, 0.3
    !DENSITY
     1.0
    !EIGEN
     3, 1.0e-8, 40
    !STEP, SUBSTEPS=1
     BOUNDARY, 1
     LOAD, 1
    !SOLVER, METHOD=CG, ITERLOG=NO, TIMELOG=NO
     10000, 1
     1.0e-10, 1.0, 0.0
    !END
""")

CNT_PC = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE={T}
    !SOLVER, METHOD=CG
     10000, 1
     1.0e-8, 1.0, 0.0
    !END
""")


def _prep(tmp_path, cnt_text, name):
    wd = tmp_path / name
    wd.mkdir()
    (wd / "m.msh").write_text(open(MSH).read())
    (wd / "c.cnt").write_text(cnt_text)
    (wd / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-ENTIRE\n m.msh\n"
        "!CONTROL, NAME=fstrCNT\n c.cnt\n")
    return str(wd)


def test_staticeigen_dispatch(tmp_path):
    """STATICEIGEN runs static + eigen-about-deformed-tangent from the
    CLI; 0.log carries BOTH the static summary and the EGLIST block."""
    wd = _prep(tmp_path, CNT_SE, "se")
    out = run_directory(wd)
    assert "static" in out and "eigen" in out
    assert np.abs(np.asarray(out["static"].u)).max() > 0
    assert np.all(np.asarray(out["eigen"].freq) > 0)
    log = open(os.path.join(wd, "0.log")).read()
    assert "Global Summary" in log
    assert "RESULT OF EIGEN VALUE ANALYSIS" in log


def test_staticeigen_stress_stiffening(tmp_path):
    """The eigen pass uses the DEFORMED tangent: a tensile prestress
    raises the bending frequencies vs the unloaded eigenproblem."""
    wd1 = _prep(tmp_path, CNT_SE.replace("CL1, 3, -1.0",
                                         "CL1, 3, -0.001"), "se_lo")
    wd2 = _prep(tmp_path, CNT_SE.replace("CL1, 3, -1.0",
                                         "CL1, 3, -40.0"), "se_hi")
    f_lo = np.asarray(run_directory(wd1)["eigen"].freq)
    f_hi = np.asarray(run_directory(wd2)["eigen"].freq)
    assert not np.allclose(f_lo, f_hi, rtol=1e-6), \
        "deformed-state tangent had no effect on the spectrum"


def test_precheck_nzprof_dispatch(tmp_path):
    wd = _prep(tmp_path, CNT_PC.replace("{T}", "ELEMCHECK"), "pc")
    out = run_directory(wd)
    rep = out["precheck"]
    assert rep.total_volume > 0 and rep.n_degenerate == 0
    assert "PRECHECK SUMMARY" in open(os.path.join(wd, "0.log")).read()

    wd = _prep(tmp_path, CNT_PC.replace("{T}", "NZPROF"), "nz")
    out = run_directory(wd)
    prof = out["nzprof"]
    assert os.path.exists(prof["dat"]) and os.path.exists(prof["plt"])
    # symmetric profile: every off-diagonal pair appears twice + diagonal
    rows = open(prof["dat"]).read().strip().splitlines()
    assert len(rows) == prof["nnz"]
    assert prof["n"] == out["mesh"].n_node
