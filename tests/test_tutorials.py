"""End-to-end tutorial workload runs.

The reference ships no goldens for these directories and no Fortran
compiler exists in this image to generate them, so assertions are
physics-based: global force balance through the REACTION output
(internal force re-integrated from the converged state — wrong
constitutive updates, load assembly, or BC handling all break it),
yield onset, and axisymmetry of the cylinder workloads."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

TUT = os.path.join(REFERENCE, "tutorial")


def _run(subdir, mesh_name, cnt_name, shorten=None, result_writer=None,
         drop_time_material=False):
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    d = os.path.join(TUT, subdir)
    mesh = read_mesh(os.path.join(d, mesh_name))
    cfg = read_cnt(os.path.join(d, cnt_name))
    if shorten:
        cfg.steps[0].num_substep = shorten
        cfg.steps[0].initdt = 1.0 / shorten
    if drop_time_material:
        # elastic twin: same deck minus the visco/creep card — isolates
        # the time-dependent constitutive effect from geometric
        # nonlinearity in the secant-stiffness comparison
        for md in cfg.materials.values():
            md.viscoelastic = None
            md.creep = None
    model = build_struct_model(mesh, cfg)
    res = run_nonlinear_static(model, result_writer=result_writer)
    return model, res


def _secant_history(model, hist, grp="LOADS"):
    """|R_face(t)| / t per substep (u_prescribed ~ t, so this is the
    secant stiffness up to a constant)."""
    nodes = model.mesh.node_groups[grp]
    out = []
    for (t, r) in hist:
        Rz = abs(r.reaction[nodes, 2].sum())
        out.append(Rz / t)
    return np.asarray(out)


def _reaction_balance(model, res, axis=2):
    """Sum of reactions along `axis` over ALL constrained nodes must
    cancel the applied load (global equilibrium).  Returns
    (sum, applied, scale) where scale is the total |reaction| level the
    imbalance should be judged against (the Newton converg tolerance is
    relative to |Q|)."""
    R = res.reaction
    assert R is not None
    fixed_nodes = np.unique(np.asarray(model.fixed_dofs) // model.ndof)
    total = R[fixed_nodes, axis].sum()
    f_app = np.asarray(model.f_ext).reshape(-1, model.ndof)[:, axis].sum()
    scale = np.abs(R[fixed_nodes, axis]).sum() + 1.0
    return total, f_app, scale


@requires_reference
def test_tutorial03_hyperelastic():
    model, res = _run("03_hyperelastic_cylinder", "cylinder.msh",
                      "cylinder.cnt")
    # prescribed LOADS displacement is -7.0 at full load
    assert abs(np.abs(res.u).max() - 7.0) < 1e-6
    assert np.isfinite(res.nodal_mises).all()
    # compression: reaction at the loaded face resists (pushes back up);
    # equilibrium: sum of ALL constrained-dof reactions = -applied
    total, f_app, scale = _reaction_balance(model, res)
    assert abs(total + f_app) < 1e-4 * scale, (total, f_app, scale)
    assert scale > 1.5  # prescribed-displacement loading does work
    # axisymmetry: radial displacement magnitude symmetric wrt x<->y
    u = res.u
    c = model.coords
    r = np.hypot(c[:, 0], c[:, 1])
    sel = (np.abs(c[:, 2] - c[:, 2].min()) < 1e-9) & (r > 1e-9)
    ur = (u[sel, 0] * c[sel, 0] + u[sel, 1] * c[sel, 1]) / r[sel]
    # all bottom-ring nodes at the same radius bulge equally
    rr = np.round(r[sel], 6)
    for rv in np.unique(rr):
        g = ur[rr == rv]
        if len(g) > 2:
            assert g.std() < 5e-4 * (abs(g.mean()) + 1e-12) + 1e-9


@requires_reference
def test_tutorial05_plastic_necking():
    model, res = _run("05_plastic_cylinder", "necking.msh", "necking.cnt",
                      shorten=5)
    assert abs(np.abs(res.u).max() - 7.0) < 1e-6
    # yielding must have occurred (initial yield 450)
    assert res.nodal_mises.max() > 450.0
    # ...but the stress state stays ON the (hardening) yield surface:
    # no gauss point may exceed yield + hardening headroom wildly
    assert res.elem_mises.max() < 2000.0
    # necking converges on the rxnrm criterion; the force residual sits
    # at the Newton tolerance level (~0.5% here), not at machine noise
    total, f_app, scale = _reaction_balance(model, res)
    assert abs(total + f_app) < 1e-2 * scale, (total, f_app, scale)


@requires_reference
def test_tutorial07_viscoelastic():
    hist = []
    model, res = _run("07_viscoelastic_cylinder", "cylinder.msh",
                      "cylinder.cnt",
                      result_writer=lambda k, t, r: hist.append((t, r)))
    assert np.isfinite(res.u).all()
    assert np.abs(res.u).max() > 0
    total, f_app, scale = _reaction_balance(model, res)
    assert abs(total + f_app) < 1e-4 * scale, (total, f_app, scale)
    # stress relaxation: Prony (g=0.5, tau=1.0) over t in (0, 2].
    # Geometric stiffening (26% compression) masks the raw secant, so
    # compare against an elastic twin (same deck, VISCOELASTIC card
    # removed): the visco/elastic secant ratio must decay monotonically
    # and substantially — an elastic response keeps it at 1, a broken
    # Prony update breaks the magnitude
    k = _secant_history(model, hist)
    hist_e = []
    _run("07_viscoelastic_cylinder", "cylinder.msh", "cylinder.cnt",
         drop_time_material=True,
         result_writer=lambda kk, t, r: hist_e.append((t, r)))
    k_e = _secant_history(model, hist_e)
    ratio = k / k_e
    assert len(ratio) >= 5
    assert np.all(np.diff(ratio) < 0.0), ratio
    assert ratio[-1] < 0.85 * ratio[0], ratio


@requires_reference
def test_tutorial08_creep():
    hist = []
    model, res = _run("08_creep_cylinder", "cylinder.msh",
                      "cylinder.cnt", shorten=5,
                      result_writer=lambda k, t, r: hist.append((t, r)))
    assert np.isfinite(res.u).all()
    assert np.abs(res.u).max() > 0
    # Norton creep accumulates under the ramped compression: the
    # creep/elastic secant ratio decays monotonically across substeps;
    # a broken creep update (no strain growth between substeps) keeps
    # it at 1
    k = _secant_history(model, hist)
    hist_e = []
    _run("08_creep_cylinder", "cylinder.msh", "cylinder.cnt", shorten=5,
         drop_time_material=True,
         result_writer=lambda kk, t, r: hist_e.append((t, r)))
    k_e = _secant_history(model, hist_e)
    ratio = k / k_e
    assert len(ratio) >= 4
    assert np.all(np.diff(ratio) < 0.0), ratio
    assert ratio[-1] < 0.995 * ratio[0], ratio


@requires_reference
def test_tutorial06_plastic_can():
    """Tutorial 06 (Drucker-Prager can under surface pressure, tet10
    342 + follower S-DLOADs) at 5% load, one substep, direct solve.

    Full load collapses the can (elastic |u|max ~ 20: geometric
    snap-through the reference walks with 10 substeps of cutbacks) —
    CI runs the elastic-dominant regime and asserts global equilibrium
    through the reactions, which breaks under wrong tet10 kernels,
    S-pressure assembly, or the DP constitutive path."""
    from frontistr_tpu.io.meshio import read_mesh
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    d = os.path.join(TUT, "06_plastic_can")
    mesh = read_mesh(os.path.join(d, "can.msh"))
    cfg = read_cnt(os.path.join(d, "can.cnt"))
    cfg.steps[0].num_substep = 1
    cfg.steps[0].initdt = 1.0
    cfg.solver.method = "DIRECT"
    for card in cfg.dloads:
        card.data = [[row[0], row[1], str(float(row[2]) * 0.05)]
                     for row in card.data]
    model = build_struct_model(mesh, cfg)
    res = run_nonlinear_static(model)
    assert np.isfinite(res.u).all() and np.isfinite(res.nodal_mises).all()
    # thin can flexes visibly even at 5% pressure
    assert 0.1 < np.abs(res.u).max() < 5.0
    # global equilibrium per axis: sum of constrained-dof reactions
    # cancels the applied load to Newton tolerance
    R = res.reaction
    fixed = np.unique(np.asarray(model.fixed_dofs) // model.ndof)
    for ax in range(3):
        total = R[fixed, ax].sum()
        f_app = np.asarray(model.f_ext).reshape(-1, 3)[:, ax].sum()
        scale = np.abs(R[fixed, ax]).sum() + 1.0
        assert abs(total + f_app) < 1e-3 * scale, (ax, total, f_app)


@requires_reference
def test_direct_equals_cg_nonlinear():
    """The plain-deck METHOD=DIRECT Newton arm (host SuperLU per
    iteration) must reproduce the iterative-arm answer on an NLGEOM
    hyperelastic run (solve_LINEQ dispatches MUMPS/CG interchangeably
    in the reference)."""
    import textwrap
    import tempfile

    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static

    cnt = textwrap.dedent("""\
        !VERSION
         3
        !SOLUTION, TYPE=NLSTATIC
        !BOUNDARY
         X0, 1, 3, 0.0
        !CLOAD
         X1, 3, -2.0
        !MATERIAL, NAME=M1
        !HYPERELASTIC, TYPE=NEOHOOKE
         80.0, 200.0
        !STEP, SUBSTEPS=2, CONVERG=1.0e-10
         BOUNDARY, 1
         LOAD, 1
        !SOLVER, METHOD={M}
         10000, 1
         1.0e-12, 1.0, 0.0
        !END
    """)

    def run(method):
        with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                         delete=False) as f:
            f.write(cnt.replace("{M}", method))
            p = f.name
        cfg = read_cnt(p)
        os.unlink(p)
        model = build_struct_model(box_hex8(3, 3, 3), cfg)
        return np.asarray(run_nonlinear_static(model).u)

    u_cg = run("CG")
    u_dir = run("DIRECT")
    assert np.abs(u_cg).max() > 1e-3
    np.testing.assert_allclose(u_dir, u_cg, rtol=1e-7,
                               atol=1e-10 * np.abs(u_cg).max())
