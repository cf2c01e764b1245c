"""!TEMPERATURE, READRESULT: thermal stress driven by a heat-analysis
result file (examples/static/thermal_stress/sample1; readtemp.f90
read_temperature_result + T-dependent E(T)/alpha(T) tables)."""
import os
import shutil

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

SAMPLE = os.path.join(REFERENCE, "examples", "static", "thermal_stress",
                      "sample1")


@requires_reference
def test_thermal_stress_readresult(tmp_path):
    for f in os.listdir(SAMPLE):
        shutil.copy(os.path.join(SAMPLE, f), tmp_path)
    # the shipped V361.res.0.* snapshots come from a COARSER heat mesh
    # (99 ids vs the 525-node structural mesh) — regenerate consistent
    # snapshots with a known T(x) ramp so the response is checkable
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.resfile import write_result
    msh = read_mesh(os.path.join(SAMPLE, "A361.msh"))
    for k in range(1, 9):
        Tk = 20.0 + (k / 8.0) * 40.0 * msh.coords[:, 0]   # 20..420
        write_result(str(tmp_path / f"V361.res.0.{k}"),
                     "*fstrresult", msh.node_ids,
                     np.arange(1, 2),
                     [("TEMPERATURE", Tk.reshape(-1, 1))], [])
    from frontistr_tpu.run import run_directory
    out = run_directory(str(tmp_path))
    res = out["static"]
    model = out["model"]
    mesh = out["mesh"]
    T = model.temperature
    assert T is not None and T.max() > 400.0       # field was imported
    u = res.u.reshape(mesh.n_node, 3)
    x = mesh.coords[:, 0]
    # clamped at x=0 (FIX group), heated bar expands in +x
    assert u[:, 0].min() > -1e-10
    # independent 1D estimate: u_tip = int alpha(T) (T - ref) dx along
    # the axis (slender free-sided bar; Poisson effects are small)
    axis = np.flatnonzero(
        (np.abs(mesh.coords[:, 1] - mesh.coords[:, 1].mean()) < 1e-6)
        & (np.abs(mesh.coords[:, 2] - mesh.coords[:, 2].mean()) < 1e-6))
    order = axis[np.argsort(x[axis])]
    from frontistr_tpu.io.ctrlio import read_cnt
    cfg = out["cfg"]
    # alpha(T) table from the deck
    exp = None
    for m in cfg.materials.values():
        if getattr(m, "expansion", None) is not None:
            exp = np.asarray([[float(v) for v in row]
                              for row in m.expansion.data])
    assert exp is not None
    ref = cfg.reftemp
    xt, Tt = x[order], T[order]
    alpha = np.interp(0.5 * (Tt[1:] + Tt[:-1]), exp[:, 1], exp[:, 0])
    u_est = np.sum(alpha * (0.5 * (Tt[1:] + Tt[:-1]) - ref)
                   * np.diff(xt))
    u_tip = u[order[-1], 0]
    assert abs(u_tip - u_est) < 0.25 * abs(u_est), (u_tip, u_est)
    # lateral symmetry of the response
    assert abs(abs(u[:, 1]).max() - abs(u[:, 2]).max()) < 1e-8
