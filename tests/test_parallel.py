"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_sharded_step_matches_single_device():
    import jax
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.parallel.spmd import device_mesh, \
        make_sharded_newton_step

    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual CPU devices"

    mesh = box_hex8(4, 4, 8)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    D1 = elastic_D(210e3, 0.3, D3)
    fixed = (mesh.node_groups["X0"][:, None] * 3 +
             np.arange(3)[None, :]).reshape(-1)
    f = np.zeros(n_node * 3)
    f[mesh.node_groups["X1"] * 3 + 2] = -1.0

    def run(ndev):
        jmesh = device_mesh(ndev)
        step, info = make_sharded_newton_step(jmesh, 361, conn, n_node, 3,
                                              D1, fixed, cg_iters=400,
                                              tol=1e-10)
        f_pad = np.zeros(info["n_tot"])
        f_pad[:len(f)] = f
        f_d = jax.device_put(jnp.asarray(f_pad), info["nd_sharding"])
        coords_d = jax.device_put(jnp.asarray(mesh.coords),
                                  info["replicated"])
        u = np.asarray(step(coords_d, f_d))
        return u[:n_node * 3]

    u1 = run(1)
    u8 = run(8)
    np.testing.assert_allclose(u8, u1, rtol=1e-8, atol=1e-12)
    assert np.abs(u1).max() > 0


def test_graft_entry():
    import __graft_entry__ as g
    fn, args = g.entry()
    u = np.asarray(fn(*args))
    assert np.isfinite(u).all() and np.abs(u).max() > 0


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_production_sharded_solve_matches(monkeypatch, tmp_path):
    """run_linear_static via FRONTISTR_TPU_SHARDS: the production driver's
    multi-chip path (GSPMD block-ELL CG) equals the single-device solve on
    an unstructured tet mesh."""
    from frontistr_tpu.meshgen import box_tet4
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import solve_linear

    cnt = tmp_path / "t.cnt"
    cnt.write_text(
        "!VERSION\n 3\n!SOLUTION, TYPE=STATIC\n"
        "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
        "!SOLVER, METHOD=CG\n 10000, 1\n 1.0e-10, 1.0, 0.0\n!END\n")
    cfg = read_cnt(str(cnt))
    mesh = box_tet4(5, 5, 5)
    model = build_struct_model(mesh, cfg)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    x1, it1, rr1, *_ = solve_linear(model)

    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    x8, it8, rr8, *_ = solve_linear(model)

    assert rr8 <= 1e-7
    np.testing.assert_allclose(x8, x1, rtol=1e-7,
                               atol=1e-10 * np.abs(x1).max())


def test_sharded_nonlinear_newton_matches(monkeypatch):
    """The GSPMD-sharded Newton hot loop (make_constrained_solver with
    FRONTISTR_TPU_SHARDS) equals the single-device solve on a
    hyperelastic NLGEOM run over 2 substeps (multi-chip semantics clone
    of the reference's per-iteration hecmw_update_3_R halo exchange)."""
    import textwrap

    import numpy as np

    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    cnt_text = textwrap.dedent("""\
        !VERSION
         3
        !SOLUTION, TYPE=STATIC
        !STATIC, TYPE=NLGEOM
        !BOUNDARY
         X0, 1, 3, 0.0
        !CLOAD
         X1, 3, -2.0
        !MATERIAL, NAME=M1
        !HYPERELASTIC, TYPE=NEOHOOKE
         80.0, 0.001
        !STEP, SUBSTEPS=2
         BOUNDARY, 1
         LOAD, 1
        !SOLVER, METHOD=CG, PRECOND=1, ITERLOG=NO, TIMELOG=NO
         10000, 1
         1.0e-10, 1.0, 0.0
        !END
    """)

    def run(tmp_path_str):
        cfg = read_cnt(tmp_path_str)
        model = build_struct_model(box_tet4(3, 3, 3), cfg)
        return np.asarray(run_nonlinear_static(model).u)

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(cnt_text)
        path = fh.name

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u1 = run(path)
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    u8 = run(path)

    assert np.abs(u1).max() > 1e-6
    np.testing.assert_allclose(u8, u1, rtol=1e-7,
                               atol=1e-9 * np.abs(u1).max())


def test_sharded_element_pipeline_engine(monkeypatch):
    """The fully-sharded element pipeline (ShardedNewton): (a) it is the
    path actually taken under FRONTISTR_TPU_SHARDS, (b) NO full-model
    array is device_put to a single device inside the Newton loop (only
    at substep boundaries), (c) a path-dependent elastoplastic
    multi-substep run still equals single-device bit-for-tolerance."""
    import textwrap
    import tempfile

    import jax
    import numpy as np

    from frontistr_tpu.analysis import nonlinear as nl
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    cnt_text = textwrap.dedent("""\
        !VERSION
         3
        !SOLUTION, TYPE=NLSTATIC
        !BOUNDARY
         X0, 1, 3, 0.0
        !CLOAD
         X1, 3, -0.8
        !MATERIAL, NAME=M1
        !ELASTIC
         1000.0, 0.3
        !PLASTIC, YIELD=MISES, HARDEN=BILINEAR
         5.0, 100.0
        !STEP, SUBSTEPS=2
         BOUNDARY, 1
         LOAD, 1
        !SOLVER, METHOD=CG, ITERLOG=NO, TIMELOG=NO
         10000, 1
         1.0e-10, 1.0, 0.0
        !END
    """)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(cnt_text)
        path = fh.name

    def run():
        cfg = read_cnt(path)
        model = build_struct_model(box_tet4(3, 3, 3), cfg)
        return np.asarray(nl.run_nonlinear_static(model).u), model

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u1, model1 = run()

    engines = []
    orig_engine = nl.ShardedNewton

    class SpyEngine(orig_engine):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            engines.append(self)

    monkeypatch.setattr(nl, "ShardedNewton", SpyEngine)

    # transfer guard: record every device_put onto a SINGLE device of an
    # array as large as the full dof vector
    n_dofs = model1.n_dof_total
    big_single_puts = []
    orig_put = jax.device_put

    def spy_put(x, device=None, **kw):
        try:
            from jax.sharding import SingleDeviceSharding
            single = isinstance(device, SingleDeviceSharding) or \
                (device is not None and not hasattr(device, "spec")
                 and not isinstance(device, (list, tuple)))
            if single and getattr(x, "size", 0) >= n_dofs:
                big_single_puts.append(getattr(x, "shape", None))
        except Exception:
            pass
        return orig_put(x, device=device, **kw)

    monkeypatch.setattr(jax, "device_put", spy_put)
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    u8, _ = run()
    monkeypatch.setattr(jax, "device_put", orig_put)

    assert len(engines) == 1, "sharded element pipeline was not engaged"
    eng = engines[0]
    # pad_vec runs exactly 3x per substep attempt (u, gl, dufix);
    # unpad_vec exactly 2x (du, Q).  Any EXTRA single-device put of a
    # full-dof array would mean a per-iteration round trip.
    attempts = eng.pad_puts // 3
    assert attempts >= 2 and eng.pad_puts == 3 * attempts
    assert eng.n_iters > attempts, "Newton loop did not iterate"
    assert len(big_single_puts) == 2 * attempts, (
        "per-iteration device_put round trip detected",
        len(big_single_puts), attempts)

    assert np.abs(u1).max() > 1e-6
    np.testing.assert_allclose(u8, u1, rtol=1e-7,
                               atol=1e-9 * np.abs(u1).max())


def test_sharded_heat_transient_matches(monkeypatch, tmp_path):
    """Transient heat under FRONTISTR_TPU_SHARDS equals single-device
    (sharded backward-Euler CG, _HeatSolver nshard arm)."""
    import numpy as np

    from frontistr_tpu.analysis.heat import run_heat
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    cnt = tmp_path / "h.cnt"
    cnt.write_text(
        "!VERSION\n 3\n!SOLUTION, TYPE=HEAT\n"
        "!HEAT\n 0.1, 1.0\n"
        "!FIXTEMP\n X0, 100.0\n"
        "!CFLUX\n X1, 5.0\n"
        "!SOLVER, METHOD=CG\n 10000, 1\n 1.0e-10, 1.0, 0.0\n!END\n")
    cfg = read_cnt(str(cnt))
    mesh = box_tet4(3, 3, 3)
    # heat material tables: conductivity/density/specific heat
    mesh.materials["M1"].items[1] = [[7.85e-6]]
    mesh.materials["M1"].items[2] = [[4.61e2]]
    mesh.materials["M1"].items[3] = [[5.0e1]]

    def run():
        return run_heat(mesh, cfg, str(tmp_path)).T

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    T1 = run()
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    T8 = run()

    assert np.abs(T1).max() > 1.0
    np.testing.assert_allclose(T8, T1, rtol=1e-7,
                               atol=1e-9 * np.abs(T1).max())


def test_sharded_amg_newton_matches(monkeypatch):
    """AMG V-cycle preconditioner under the sharded Newton solve (forced
    via FRONTISTR_TPU_PRECOND=amg) still converges to the same solution:
    the AMG setup's segment-sums/gathers are GSPMD-partitionable."""
    import textwrap

    import numpy as np

    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    cnt_text = textwrap.dedent("""\
        !VERSION
         3
        !SOLUTION, TYPE=STATIC
        !STATIC, TYPE=NLGEOM
        !BOUNDARY
         X0, 1, 3, 0.0
        !CLOAD
         X1, 3, -2.0
        !MATERIAL, NAME=M1
        !HYPERELASTIC, TYPE=NEOHOOKE
         80.0, 0.001
        !STEP, SUBSTEPS=1
         BOUNDARY, 1
         LOAD, 1
        !SOLVER, METHOD=CG, PRECOND=1, ITERLOG=NO, TIMELOG=NO
         10000, 1
         1.0e-10, 1.0, 0.0
        !END
    """)
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(cnt_text)
        path = fh.name

    def run():
        cfg = read_cnt(path)
        model = build_struct_model(box_tet4(3, 3, 3), cfg)
        return np.asarray(run_nonlinear_static(model).u)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    monkeypatch.delenv("FRONTISTR_TPU_PRECOND", raising=False)
    u1 = run()
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    monkeypatch.setenv("FRONTISTR_TPU_PRECOND", "amg")
    u8 = run()
    np.testing.assert_allclose(u8, u1, rtol=1e-7,
                               atol=1e-9 * np.abs(u1).max())


def test_sharded_implicit_dynamics_matches(monkeypatch):
    """Newmark implicit dynamics under FRONTISTR_TPU_SHARDS equals
    single-device: the effective solve c1 K + c2 M routes through the
    GSPMD cluster-ELL solver with the lumped mass folded into the
    assembled slots, preconditioner, and AMG inputs."""
    import textwrap
    import tempfile

    import numpy as np

    from frontistr_tpu.analysis.dynamic import run_dynamic
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    cnt_text = textwrap.dedent("""\
        !VERSION
         3
        !SOLUTION, TYPE=DYNAMIC
        !DYNAMIC
         1, 1
         0.0, 0.03, 3, 0.01
         0.5, 0.25
         1, 1, 0.5, 0.0
         10
        !BOUNDARY, GRPID=1
         X0, 1, 3, 0.0
        !CLOAD, GRPID=1
         X1, 3, -1.5
        !STEP, SUBSTEPS=1, CONVERG=1.0e-8
         BOUNDARY, 1
         LOAD, 1
        !MATERIAL, NAME=M1
        !ELASTIC
         500.0, 0.3
        !DENSITY
         2.0
        !SOLVER,METHOD=CG,PRECOND=1,ITERLOG=NO,TIMELOG=NO
         10000, 1
         1.0e-12, 1.0, 0.0
        !END
    """)

    def run(path):
        cfg = read_cnt(path)
        model = build_struct_model(box_tet4(3, 3, 3), cfg)
        out = run_dynamic(model)
        return np.asarray(out.u), np.asarray(out.vel)

    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(cnt_text)
        path = fh.name

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u1, v1 = run(path)
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    u8, v8 = run(path)

    assert np.abs(u1).max() > 1e-8
    np.testing.assert_allclose(u8, u1, rtol=1e-7,
                               atol=1e-10 * np.abs(u1).max())
    np.testing.assert_allclose(v8, v1, rtol=1e-7,
                               atol=1e-10 * max(np.abs(v1).max(), 1.0))


def test_sharded_eigen_matches(monkeypatch):
    """Lanczos under FRONTISTR_TPU_SHARDS equals single-device: every
    shift-invert apply K^{-1}(M q) routes through the GSPMD solver."""
    import textwrap
    import tempfile

    import numpy as np

    from frontistr_tpu.analysis.eigen import run_eigen
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    cnt_text = textwrap.dedent("""\
        !VERSION
         3
        !SOLUTION, TYPE=EIGEN
        !EIGEN
         4, 1.0e-10, 60
        !BOUNDARY
         X0, 1, 3, 0.0
        !MATERIAL, NAME=M1
        !ELASTIC
         1000.0, 0.3
        !DENSITY
         1.0
        !SOLVER,METHOD=CG,ITERLOG=NO,TIMELOG=NO
         10000, 1
         1.0e-10, 1.0, 0.0
        !END
    """)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(cnt_text)
        path = fh.name

    def run(path):
        cfg = read_cnt(path)
        model = build_struct_model(box_tet4(3, 3, 3), cfg)
        return run_eigen(model)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    r1 = run(path)
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    r8 = run(path)
    np.testing.assert_allclose(r8.freq, r1.freq, rtol=1e-7)


def test_sharded_linear_mpc_matches(monkeypatch, tmp_path):
    """!EQUATION on the sharded linear arm: the GSPMD solve with exact
    MPC elimination equals the single-device elimination path, and the
    constraint holds in the solution."""
    from frontistr_tpu.meshgen import box_tet4
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.io.meshio import Equation
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import solve_linear

    cnt = tmp_path / "t.cnt"
    cnt.write_text(
        "!VERSION\n 3\n!SOLUTION, TYPE=STATIC\n"
        "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
        "!SOLVER, METHOD=CG\n 10000, 1\n 1.0e-10, 1.0, 0.0\n!END\n")
    cfg = read_cnt(str(cnt))
    mesh = box_tet4(4, 4, 4)
    # tie uz of two X1-face nodes: u_a - u_b = 0
    a, b = (int(v) for v in mesh.node_groups["X1"][:2])
    mesh.equations.append(Equation(
        np.asarray([a, b]), np.asarray([3, 3]),
        np.asarray([1.0, -1.0]), 0.0))
    model = build_struct_model(mesh, cfg)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    x1, *_ = solve_linear(model)
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    x8, it8, rr8, *_ = solve_linear(model)

    assert rr8 <= 1e-7
    np.testing.assert_allclose(x8, x1, rtol=1e-7,
                               atol=1e-10 * np.abs(x1).max())
    assert abs(x8[a * 3 + 2] - x8[b * 3 + 2]) < 1e-12
    # the tie actually binds: solution differs from the untied one
    m0 = build_struct_model(box_tet4(4, 4, 4), cfg)
    x0, *_ = solve_linear(m0)
    assert np.abs(x8 - x0).max() > 1e-8


def test_sharded_contact_al_matches(monkeypatch):
    """AL/penalty contact under FRONTISTR_TPU_SHARDS: the sharded solve
    carries the contact slot blocks as replicated args (gather -> einsum
    -> scatter-add on the row-sharded vectors), so a contact deck runs
    the SAME GSPMD path as the plain Newton loop.  1-vs-8-device
    equality on the parabolic-indenter AL model (the reference's
    contact-extended iterative path, solve_LINEQ_contact.f90, runs
    per-rank the same way)."""
    import numpy as np

    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from tests.test_contact import _hertz_indenter_model

    def run():
        model, mesh, _ = _hertz_indenter_model(nx=12, nz=4)
        return np.asarray(run_nonlinear_static(model).u)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u1 = run()
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    u8 = run()

    assert np.abs(u1).max() > 1e-4
    np.testing.assert_allclose(u8, u1, rtol=1e-6,
                               atol=1e-8 * np.abs(u1).max())


def test_sharded_dynamic_contact_al_matches(monkeypatch):
    """AL contact in implicit dynamics under FRONTISTR_TPU_SHARDS: the
    Newmark effective solve c1 K + c2 M + K_c runs GSPMD-sharded with
    the contact slot blocks as replicated args.  1-vs-8-device equality
    on the two-cube compression deck (fstr_dynamic_nlimplicit.f90:374+
    contact arm)."""
    import numpy as np

    from tests.test_dynamic_contact import _run

    def go():
        model, out = _run(gap=0.0, n_step=5, dt=0.01, ray_m=0.5)
        return np.asarray(out.u)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u1 = go()
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    u8 = go()

    assert np.abs(u1).max() > 1e-5
    np.testing.assert_allclose(u8, u1, rtol=1e-6,
                               atol=1e-8 * np.abs(u1).max())


def test_fused_single_device_pipeline_matches(monkeypatch):
    """FRONTISTR_TPU_SHARDS=1: a 1-device GSPMD mesh runs the fully-
    fused Newton element pipeline (ShardedNewton) with no collectives —
    the recommended single-chip production arm (one jitted program per
    iteration instead of the eager-stitched loop).  Must equal the
    default path bit-for-bit at solver tolerance."""
    import textwrap
    import tempfile

    import numpy as np

    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    cnt_text = textwrap.dedent("""\
        !VERSION
         3
        !SOLUTION, TYPE=STATIC
        !STATIC, TYPE=NLGEOM
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
        !SOLVER, METHOD=CG
         10000, 1
         1.0e-12, 1.0, 0.0
        !END
    """)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write(cnt_text)
        path = fh.name

    def run():
        cfg = read_cnt(path)
        model = build_struct_model(box_tet4(3, 3, 3), cfg)
        return np.asarray(run_nonlinear_static(model).u)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    u0 = run()
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "1")
    u1 = run()

    assert np.abs(u0).max() > 1e-4
    np.testing.assert_allclose(u1, u0, rtol=1e-7,
                               atol=1e-10 * np.abs(u0).max())


def test_multihost_noop_single_process(monkeypatch):
    """maybe_init_distributed is a safe no-op without coordinator env
    and records idempotent state; with envs set but n=1 it stays off."""
    from frontistr_tpu.parallel import multihost as mh
    monkeypatch.setattr(mh.maybe_init_distributed, "_state", None,
                        raising=False)
    monkeypatch.delenv("FRONTISTR_TPU_COORDINATOR", raising=False)
    monkeypatch.delenv("FRONTISTR_TPU_NUM_PROCESSES", raising=False)
    st = mh.maybe_init_distributed()
    assert st == {"initialized": False, "process_id": 0,
                  "n_processes": 1}
    # idempotent: second call returns the same object
    assert mh.maybe_init_distributed() is st
    assert mh.global_device_count() >= 1
