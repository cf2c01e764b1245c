"""Tutorials 11/12/13: SLag contact statics on real meshes, linear
explicit dynamics, nonlinear (neo-Hooke) implicit dynamics — run-only
fixtures (no goldens shipped), asserted on physics."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

TUT = os.path.join(REFERENCE, "tutorial")


@requires_reference
def test_tutorial11_two_beam_contact():
    """Crossed beams, SLAGRANGE contact, plasticity, prescribed -3.0 on
    the upper beam end (shortened to 10 substeps): the load transmits
    through the contact to the lower beam, which deflects downward."""
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    d = os.path.join(TUT, "11_contact_2beam")
    mesh = read_mesh(os.path.join(d, "2beams.msh"))
    cfg = read_cnt(os.path.join(d, "2beams.cnt"))
    cfg.steps[0].num_substep = 10
    cfg.steps[0].initdt = 0.1
    model = build_struct_model(mesh, cfg)
    res = run_nonlinear_static(model)
    assert np.isfinite(res.u).all()
    # driven end reached the prescribed displacement
    ng3 = mesh.node_groups["ng3"]
    np.testing.assert_allclose(res.u[ng3, 2], -3.0, rtol=1e-6)
    # the lower beam picked up load through the interface: nodes NOT in
    # the driven group moved down too
    others = np.setdiff1d(np.arange(mesh.n_node),
                          np.concatenate([ng3,
                                          mesh.node_groups["ng1"],
                                          mesh.node_groups["ng2"]]))
    assert res.u[others, 2].min() < -0.1
    # plasticity engaged (yield 500, hardening 10)
    assert res.nodal_mises.max() > 500.0
    assert res.elem_mises.max() < 1500.0


@requires_reference
def test_tutorial12_linear_explicit_beam():
    """Linear explicit dynamics (central difference, 500k steps in the
    deck — shortened): tip loaded downward via AMP ramp, beam starts
    moving down, energy stays bounded."""
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.dynamic import run_dynamic
    d = os.path.join(TUT, "12_dynamic_beam")
    mesh = read_mesh(os.path.join(d, "beam.msh"))
    cfg = read_cnt(os.path.join(d, "beam.cnt"))
    cfg.dynamic.n_step = 2000
    model = build_struct_model(mesh, cfg)
    out = run_dynamic(model)
    assert np.isfinite(out.u).all() and np.isfinite(out.vel).all()
    cl1 = mesh.node_groups["CL1"]
    assert out.u[cl1, 2].mean() < 0.0        # tip moving down
    fix = mesh.node_groups["FIX"]
    assert np.abs(out.u[fix]).max() < 1e-14  # clamp holds


@requires_reference
def test_tutorial13_neohooke_implicit_beam():
    """Nonlinear implicit dynamics with the (E, nu)-form neo-Hooke
    material bound from header-less cnt cards (shortened)."""
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.dynamic import run_dynamic
    d = os.path.join(TUT, "13_dynamic_beam_nonlinear")
    mesh = read_mesh(os.path.join(d, "beam.msh"))
    cfg = read_cnt(os.path.join(d, "beam.cnt"))
    # header-less !HYPERELASTIC/!DENSITY bound to the mesh material
    assert "" in cfg.materials
    assert cfg.materials[""].hyperelastic is not None
    cfg.dynamic.n_step = 25
    model = build_struct_model(mesh, cfg)
    assert model.blocks[0].material.mtype == "NEOHOOKE" or \
        "NEOHOOKE" in str(model.blocks[0].material.mtype).upper()
    out = run_dynamic(model)
    assert np.isfinite(out.u).all()
    cl1 = mesh.node_groups["CL1"]
    assert out.u[cl1, 2].mean() < 0.0


@requires_reference
def test_tutorial17_frequency_response():
    """Tutorial 17: frequency-response deck (!DYNAMIC 11,2 + !FLOAD
    LOAD CASE=2) through the CLI dispatch — the modal-superposition
    sweep over [14 kHz, 16 kHz] must resonate at an in-window
    eigenfrequency."""
    import shutil
    import tempfile
    from frontistr_tpu.run import run_directory
    d = os.path.join(TUT, "17_freq_beam")
    with tempfile.TemporaryDirectory() as td:
        shutil.copy(os.path.join(d, "beam.msh"), td)
        shutil.copy(os.path.join(d, "beam_freq.cnt"), td)
        with open(os.path.join(td, "hecmw_ctrl.dat"), "w") as fh:
            fh.write("!MESH, NAME=fstrMSH,TYPE=HECMW-ENTIRE\n beam.msh\n"
                     "!CONTROL,NAME=fstrCNT\n beam_freq.cnt\n"
                     "!RESULT,NAME=fstrRES,IO=OUT\n beam.res\n")
        out = run_directory(td)
        fr = out["freq"]
        assert len(fr.freqs) == 20
        assert fr.freqs[0] == 14000.0 and fr.freqs[-1] == 16000.0
        assert np.isfinite(fr.disp_amp_max).all()
        # an eigenmode lies inside the window: the response peaks
        # strictly inside and dominates the edges
        k = int(np.argmax(fr.disp_amp_max))
        assert 0 < k < 19, fr.disp_amp_max
        # Rayleigh beta 7.2e-7 gives zeta ~ 0.034 at 15 kHz: a broad
        # resonance — peak ~2x the window edges, centered on the mode
        assert fr.disp_amp_max[k] > 1.5 * min(fr.disp_amp_max[0],
                                              fr.disp_amp_max[-1])
        # eigenfrequency consistency: the peak is the mode nearest the
        # window
        w = out["freq"].eigen.freq
        inwin = w[(w > 14000) & (w < 16000)]
        assert len(inwin) >= 1
        assert abs(fr.freqs[k] - inwin[0]) < 2 * (2000.0 / 19)
        # 0.log table written
        log = open(os.path.join(td, "0.log")).read()
        assert "FREQUENCY RESPONSE" in log


@requires_reference
def test_tutorial17_eigenread_decoupled_workflow():
    """Tutorial 17 as the reference's run.sh drives it: EIGEN run ->
    'mv 0.log eigen_0.log' -> freq run importing modes via !EIGENREAD +
    the 'result-in' IO=IN binding.  The imported-mode response must
    match the in-process recompute."""
    import shutil
    import tempfile
    from frontistr_tpu.run import run_directory
    d = os.path.join(TUT, "17_freq_beam")
    with tempfile.TemporaryDirectory() as td:
        for f in ("beam.msh", "beam_eigen.cnt", "beam_freq.cnt"):
            shutil.copy(os.path.join(d, f), td)
        shutil.copy(os.path.join(d, "hecmw_ctrl_eigen.dat"),
                    os.path.join(td, "hecmw_ctrl.dat"))
        run_directory(td)                        # writes eig_beam.res.0.k
        os.replace(os.path.join(td, "0.log"),
                   os.path.join(td, "eigen_0.log"))
        shutil.copy(os.path.join(d, "hecmw_ctrl_freq.dat"),
                    os.path.join(td, "hecmw_ctrl.dat"))
        out = run_directory(td)
        log = open(os.path.join(td, "0.log")).read()
        assert "modes imported via !EIGENREAD" in log
        fr = out["freq"]
        # recompute in-process for comparison (EIGENREAD files removed)
        for p in os.listdir(td):
            if p.startswith("eig_beam.res") or p == "eigen_0.log":
                os.remove(os.path.join(td, p))
        out2 = run_directory(td)
        log2 = open(os.path.join(td, "0.log")).read()
        assert "modes recomputed in-process" in log2
        fr2 = out2["freq"]
        # same resonance structure; file round-trip costs ~1e-4 in the
        # mode data, amplified near resonance -> few-% tolerance
        np.testing.assert_allclose(fr.freqs, fr2.freqs)
        k1 = int(np.argmax(fr.disp_amp_max))
        k2 = int(np.argmax(fr2.disp_amp_max))
        assert k1 == k2
        np.testing.assert_allclose(fr.disp_amp_max, fr2.disp_amp_max,
                                   rtol=5e-2)
