"""Surface-group heat BCs (!SFLUX/!SFILM/!SRADIATE), !WELD_LINE, and
heat transient restart.

No reference golden exercises these cards (grep over examples/tutorial/
tests finds none), so the tests are equivalence + physics checks:
  - a surface-group card addressing the same (elem, face) set as the
    element-group DFLUX-S/FILM/RADIATE arm must reproduce the exP/exQ/exR
    golden-verified temperature fields (fstr_ctrl_heat.f90
    fstr_ctrl_get_SFLUX/SFILM/SRADIATE; heat_mat_ass_bc_DFLUX.f90 Q_SUF)
  - the weld line deposits exactly I*U*coe total power while the torch
    window is active and nothing outside it
    (heat_mat_ass_bc_DFLUX.f90:112-180 Bbak/vol normalization)
  - a transient heat run interrupted at a checkpoint resumes bit-exactly
    (heat_solve_TRAN.f90 restart block)
"""
import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

HEAT = os.path.join(REFERENCE, "examples", "heat")

_CASES = [
    # suite, mesh, cnt, face card name, surface card name
    ("exP", "P231", "P230.cnt", "DFLUX", "SFLUX"),
    ("exQ", "Q231", "Q230.cnt", "FILM", "SFILM"),
    ("exR", "R231", "R230.cnt", "RADIATE", "SRADIATE"),
]


def _surfify_cnt(txt: str, card: str, scard: str):
    """Rewrite '!DFLUX\\n GRP, S1, v...' as '!SFLUX\\n SURF, v...' and
    return (new text, elem group, face number)."""
    lines = txt.splitlines()
    out, grp, face = [], None, None
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.strip().upper().startswith("!" + card):
            out.append("!" + scard)
            data = lines[i + 1].split(",")
            grp = data[0].strip()
            face = int(data[1].strip()[1:])      # 'S1'/'F1'/'R1' -> 1
            out.append(" SURF, " + ",".join(data[2:]))
            i += 2
            continue
        out.append(ln)
        i += 1
    return "\n".join(out) + "\n", grp, face


@requires_reference
@pytest.mark.parametrize("suite,mesh_name,cnt,card,scard", _CASES)
def test_surface_card_matches_face_card(tmp_path, suite, mesh_name, cnt,
                                        card, scard):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.analysis.heat import run_heat
    d = os.path.join(HEAT, suite)
    mesh = read_mesh(os.path.join(d, mesh_name + ".msh"))
    cfg0 = read_cnt(os.path.join(d, cnt))
    res0 = run_heat(mesh, cfg0, str(tmp_path))

    txt = open(os.path.join(d, cnt)).read()
    new, grp, face = _surfify_cnt(txt, card, scard)
    p = tmp_path / "s.cnt"
    p.write_text(new)
    cfg1 = read_cnt(str(p))
    assert not getattr(cfg1, card.lower() + ("es" if card.endswith("X")
                                             else "s"))
    eids = mesh.elem_groups[grp]
    mesh.surf_groups["SURF"] = np.stack(
        [eids, np.full(len(eids), face)], axis=1)
    res1 = run_heat(mesh, cfg1, str(tmp_path))
    np.testing.assert_allclose(res1.T, res0.T, rtol=0,
                               atol=1e-6 * max(abs(res0.T).max(), 1.0))


def _heat_box(n=3):
    from frontistr_tpu.meshgen import box_hex8
    mesh = box_hex8(n, n, n, lx=4.0, ly=1.0, lz=1.0)
    mesh.materials["M1"].items = {1: [[7.8e-6]], 2: [[4.6e2]],
                                  3: [[50.0]]}
    return mesh


def test_weld_flux_power_budget(tmp_path):
    """Active torch deposits exactly I*U*coe total nodal power; outside
    the [tstart, tstart+(n2-n1)/v] window it deposits nothing."""
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.analysis.heat import build_heat_model, weld_flux
    mesh = _heat_box()
    cnt = tmp_path / "w.cnt"
    cnt.write_text(
        "!SOLUTION, TYPE=HEAT\n!HEAT\n 0.1, 4.0\n"
        "!FIXTEMP\n X0, 0.0\n"
        "!WELD_LINE\n 120.0, 10.0, 0.5, 1.0\n"
        " ALL, 1, 0.0, 4.0, 0.7, 0.5\n"
        "!SOLVER, METHOD=CG\n 2000, 1\n 1.0e-8, 1.0, 0.0\n!END\n")
    cfg = read_cnt(str(cnt))
    model = build_heat_model(mesh, cfg)
    assert len(model.weldlines) == 1
    power = 120.0 * 10.0 * 0.5
    # torch at x=1.5 (t=2.0): active window, full power
    f = weld_flux(model, 2.0)
    np.testing.assert_allclose(f.sum(), power, rtol=1e-10)
    # moving torch heats different nodes at different times
    f2 = weld_flux(model, 3.5)
    np.testing.assert_allclose(f2.sum(), power, rtol=1e-10)
    assert np.abs(f - f2).max() > 1e-6
    # before tstart and after the line end: inactive
    assert weld_flux(model, 0.2).sum() == 0.0
    assert weld_flux(model, 4.9).sum() == 0.0


def test_weld_line_transient_moves_hotspot(tmp_path):
    """Transient with a moving torch: the hottest free node tracks the
    torch position along +x."""
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.analysis.heat import run_heat
    mesh = _heat_box(3)
    cnt = tmp_path / "w.cnt"
    cnt.write_text(
        "!SOLUTION, TYPE=HEAT\n!HEAT\n 0.25, 3.0\n"
        "!WELD_LINE\n 120.0, 10.0, 0.5, 1.0\n"
        " ALL, 1, 0.0, 3.0, 0.7, 0.0\n"
        "!SOLVER, METHOD=CG\n 2000, 1\n 1.0e-10, 1.0, 0.0\n!END\n")
    cfg = read_cnt(str(cnt))
    log = tmp_path / "0.log"
    res = run_heat(mesh, cfg, str(tmp_path), log_path=str(log))
    assert res.steps == 12
    assert np.isfinite(res.T).all() and res.T.max() > 0
    # early vs late: hotspot x position must increase (torch moved)
    # re-run to 1/3 of the line for the early snapshot
    cfg2 = read_cnt(str(cnt))
    cfg2.heat.total_time = 1.0
    res_early = run_heat(mesh, cfg2, str(tmp_path))
    x = mesh.coords[:, 0]
    x_early = x[int(np.argmax(res_early.T))]
    x_late = x[int(np.argmax(res.T))]
    assert x_late > x_early + 0.5, (x_early, x_late)


@requires_reference
def test_heat_transient_restart_bit_exact(tmp_path):
    """exU transient interrupted at step 3 and resumed == uninterrupted."""
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.analysis.heat import run_heat
    d = os.path.join(HEAT, "exU")
    mesh = read_mesh(os.path.join(d, "U231.msh"))

    cfg = read_cnt(os.path.join(d, "U231.cnt"))
    dt = cfg.heat.fixed_dt
    cfg.heat.total_time = dt * 6
    ref = run_heat(mesh, cfg, str(tmp_path))

    rp = str(tmp_path / "heat_restart.npz")
    cfg1 = read_cnt(os.path.join(d, "U231.cnt"))
    cfg1.heat.total_time = dt * 3          # "interrupted" after 3 steps
    run_heat(mesh, cfg1, str(tmp_path), restart_path=rp, restart_freq=3)
    assert os.path.exists(rp)

    cfg2 = read_cnt(os.path.join(d, "U231.cnt"))
    cfg2.heat.total_time = dt * 6
    res = run_heat(mesh, cfg2, str(tmp_path), restart_path=rp,
                   restart_freq=3)
    assert res.steps == 6
    np.testing.assert_array_equal(res.T, ref.T)
