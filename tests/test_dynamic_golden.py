"""Dynamics golden regressions vs examples/dynamic/exW fixtures
(Newmark-beta implicit and central-difference explicit, final-step
Global Summary @Node, new log format)."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

EXW = os.path.join(REFERENCE, "examples", "dynamic", "exW")


def _run(mesh_name, cnt_name, suite="exW", log_suffix="_correct.log"):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.dynamic import run_dynamic
    from frontistr_tpu.io.logio import parse_log_summaries
    d = os.path.join(REFERENCE, "examples", "dynamic", suite)
    mesh = read_mesh(os.path.join(d, mesh_name))
    cfg = read_cnt(os.path.join(d, cnt_name))
    model = build_struct_model(mesh, cfg)
    out = run_dynamic(model)
    golden = parse_log_summaries(
        os.path.join(d, cnt_name.replace(".cnt", log_suffix)))
    return model, out, golden


@requires_reference
@pytest.mark.parametrize("mesh_name,cnt,suite,sfx", [
    ("W361_step.msh", "W361_c0_im_m2_t1.cnt", "exW", "_correct.log"),
    ("W361_step.msh", "W361_c0_ex_m2_t1.cnt", "exW", "_correct.log"),
    ("W342_step.msh", "W342_c0_im_m2_t1.cnt", "exW", "_correct.log"),
    ("W342_step.msh", "W342_c0_ex_m2_t1.cnt", "exW", "_correct.log"),
    # exX: '!DYNAMIC, TYPE=NONLINEAR' (nlgeom) step-load variants,
    # V4.5-format goldens.  The explicit *_MUMPS_V4_5.log goldens are
    # inconsistent with their decks (5000 x 1e-9 s = 3% of the first
    # bending period cannot reach the implicit-scale U3 = -0.445 they
    # record) and are excluded.
    ("W361_step.msh", "W361_c0_im_m2_t1.cnt", "exX", "_CG_V4_5.log"),
    ("W342_step.msh", "W342_c0_im_m2_t1.cnt", "exX", "_CG_V4_5.log"),
])
def test_dynamic_golden(mesh_name, cnt, suite, sfx):
    model, out, golden = _run(mesh_name, cnt, suite, sfx)
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
        # golden has 4 significant digits; compare relative to field
        # scale.  exX runs Newton at CONVERG=1e-3, and V/A multiply the
        # per-step du error by gamma/(beta*dt) — the golden's own V/A
        # carry O(1e-2) uncertainty there.
        tol = 5e-4
        if suite == "exX" and key[0] in "VA":
            tol = 1.5e-2
        if abs(arr.max() - gmax) > tol * scale:
            errs.append(f"{key} max {arr.max():.6g} vs {gmax:.6g}")
        if abs(arr.min() - gmin) > tol * scale:
            errs.append(f"{key} min {arr.min():.6g} vs {gmin:.6g}")
    assert not errs, "; ".join(errs)
