"""Dynamics golden regressions vs examples/dynamic/exW fixtures
(Newmark-beta implicit and central-difference explicit, final-step
Global Summary @Node, new log format)."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

EXW = os.path.join(REFERENCE, "examples", "dynamic", "exW")


def _run(mesh_name, cnt_name):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.dynamic import run_dynamic
    from frontistr_tpu.io.logio import parse_log_summaries
    mesh = read_mesh(os.path.join(EXW, mesh_name))
    cfg = read_cnt(os.path.join(EXW, cnt_name))
    model = build_struct_model(mesh, cfg)
    out = run_dynamic(model)
    golden = parse_log_summaries(
        os.path.join(EXW, cnt_name.replace(".cnt", "_correct.log")))
    return model, out, golden


@requires_reference
@pytest.mark.parametrize("mesh_name,cnt", [
    ("W361_step.msh", "W361_c0_im_m2_t1.cnt"),
    ("W361_step.msh", "W361_c0_ex_m2_t1.cnt"),
    ("W342_step.msh", "W342_c0_im_m2_t1.cnt"),
    ("W342_step.msh", "W342_c0_ex_m2_t1.cnt"),
])
def test_dynamic_golden(mesh_name, cnt):
    model, out, golden = _run(mesh_name, cnt)
    gn = golden["Node"]
    sel = out.final.node_count > 0
    fields = {}
    for dname, a in (("U", out.u), ("V", out.vel), ("A", out.acc)):
        for k in range(model.dim):
            fields[f"{dname}{k+1}"] = a[sel, k]
    errs = []
    for key, arr in fields.items():
        if key not in gn:
            continue
        gmax, gmin = gn[key]
        scale = max(abs(gmax), abs(gmin), 1.0)
        # golden has 4 significant digits; compare relative to field scale
        if abs(arr.max() - gmax) > 5e-4 * scale:
            errs.append(f"{key} max {arr.max():.6g} vs {gmax:.6g}")
        if abs(arr.min() - gmin) > 5e-4 * scale:
            errs.append(f"{key} min {arr.min():.6g} vs {gmin:.6g}")
    assert not errs, "; ".join(errs)
