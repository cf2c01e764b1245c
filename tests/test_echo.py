"""!ECHO card: the consumed mesh + deck is dumped into 0.log
(static_echo.f90:24-101 / heat_echo.f90:27-300; IECHO set by the
!ECHO control card)."""

import os
import textwrap

import numpy as np

from frontistr_tpu.run import run_directory

MSH = "/root/reference/examples/static/exA/A341.msh"

CNT = textwrap.dedent("""\
    !VERSION
     3
    !SOLUTION, TYPE=STATIC
    !ECHO
    !BOUNDARY
     FIX, 1, 3, 0.0
    !CLOAD
     CL1, 3, -1.0
    !MATERIAL, NAME=M1
    !ELASTIC
     4000.0, 0.3
    !STEP, SUBSTEPS=1
     BOUNDARY, 1
     LOAD, 1
    !SOLVER, METHOD=CG, ITERLOG=NO, TIMELOG=NO
     10000, 1
     1.0e-10, 1.0, 0.0
    !END
""")


def test_echo_block_in_log(tmp_path):
    wd = tmp_path / "echo"
    wd.mkdir()
    (wd / "m.msh").write_text(open(MSH).read())
    (wd / "c.cnt").write_text(CNT)
    (wd / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-ENTIRE\n m.msh\n"
        "!CONTROL, NAME=fstrCNT\n c.cnt\n")
    out = run_directory(str(wd))
    log = (wd / "0.log").read_text()
    mesh = out["mesh"]

    # echo sits at the TOP of the log, before the analysis summary
    assert log.index("### Number of nodes") < log.index("Global Summary")
    assert f"### Number of nodes {mesh.n_node}" in log
    assert f"### Elements {mesh.n_elem}" in log
    assert "### Ngroup" in log and "### Egroup" in log
    # every node id appears in the coordinate table
    for nid in np.asarray(mesh.node_ids)[:: max(1, mesh.n_node // 7)]:
        assert f"{int(nid):8d}" in log
    # material + reftemp summaries
    assert "### Materials" in log and "M1: elastic" in log
    assert "### Reftemp" in log
    # the analysis itself still ran and wrote its summary
    assert "Global Summary" in log


def test_no_echo_without_card(tmp_path):
    wd = tmp_path / "noecho"
    wd.mkdir()
    (wd / "m.msh").write_text(open(MSH).read())
    (wd / "c.cnt").write_text(CNT.replace("!ECHO\n", ""))
    (wd / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-ENTIRE\n m.msh\n"
        "!CONTROL, NAME=fstrCNT\n c.cnt\n")
    run_directory(str(wd))
    log = (wd / "0.log").read_text()
    assert "### Number of nodes" not in log
