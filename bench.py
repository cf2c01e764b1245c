"""Benchmark: 1M-DOF linear-elastic Newton step on one chip.

Mirrors BASELINE.json's driver metric: "Newton step wall-time and CG GFLOP/s
per chip at 1M DOF; assembly Melem/s".  Workload: structured hex8 box,
~1M dofs; batched f32 element assembly + a gather-free structured-stencil
matrix-free CG with f64 iterative refinement to true relative residual
<= 1e-8 (FrontISTR's convergence target at FrontISTR's accuracy, on the
TPU's fast path).

Design notes (measured on TPU v5e):
  - TPU gathers run ~0.6 GB/s: the unstructured incidence-gather matvec
    costs 120 ms at 1M dof, 115 ms of which is the two gathers.  On the
    structured box both gathers are strided slices
    (assembly/structured.py) -> ~2-3 ms/matvec.
  - the femop element matvec einsum runs at Precision.HIGHEST: the bf16
    default caps mixed-precision refinement at ~3 digits/pass.
  - each stage is its own jitted program; one monolithic 30s+ device
    program trips the remote-TPU execution watchdog, so the Krylov loop is
    chunked (CG_CHUNK iterations per device call, host warm-restarts).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import dataclasses as dc
import json
import os
import tempfile
import time

import numpy as np


def _tet_arm(verbose=False, out=None):
    """Unstructured-tet Newton step through the PRODUCTION path.

    This certifies the path real (FEMAP/Abaqus-numbered) meshes take —
    the structured-box headline certifies only the stencil fast path.
    Workload: ~1M-dof tet4 box with SHUFFLED node numbering ->
    production RCM/geometric reorder (ordering.maybe_reorder) ->
    linear-elastic tangent assembly -> make_constrained_solver (cluster-
    ELL blocks, MXU segment-sum assembly, AMG V-cycle, mixed-precision
    refinement on TPU) to true f64 relres <= 1e-8 — exactly the solve
    run_nonlinear_static runs per Newton iteration.  Reference hot path:
    hecmw_solver_las_33.f90:135-351 SpMV + SSOR/ML preconditioning.

    Results accumulate into `out` (if given) stage by stage, so a crash
    at any stage — the round-4 loss was an AOT compile error inside the
    first solve — still leaves every earlier stage's number in the
    artifact, plus a `tet_stage` marker saying where it died.
    """
    if out is None:
        out = {}
    import jax
    import jax.numpy as jnp
    from frontistr_tpu import ordering
    from frontistr_tpu.analysis import nonlinear as nl
    from frontistr_tpu.analysis.static import _solve_policy
    from frontistr_tpu.assembly import bell as bellmod
    from frontistr_tpu.assembly import femop
    from frontistr_tpu.assembly import operators as old_ops
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.meshgen import box_tet4

    _snorm = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def sync(x):
        return float(_snorm(x))

    n = int(os.environ.get("BENCH_TET_N", "69"))    # (n+1)^3*3 ~ 1.03M dof
    out["tet_stage"] = "meshgen"
    mesh = box_tet4(n, n, n)
    # production numbering is wild: shuffle, then reorder the production way
    rng = np.random.default_rng(3)
    mesh = ordering.permute_mesh(mesh, rng.permutation(mesh.n_node))
    t0 = time.perf_counter()
    mesh = ordering.maybe_reorder(mesh, min_nodes=0, verbose=verbose)
    t_reorder = time.perf_counter() - t0
    wc = ordering.cluster_width([b.conn for b in mesh.blocks], mesh.n_node)

    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as fh:
        fh.write("!VERSION\n 3\n!SOLUTION, TYPE=NLSTATIC\n"
                 "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
                 "!MATERIAL, NAME=M1\n!ELASTIC\n 210000.0, 0.3\n"
                 "!STEP, SUBSTEPS=1\n BOUNDARY, 1\n LOAD, 1\n"
                 "!SOLVER, METHOD=CG, ITERLOG=NO, TIMELOG=NO\n 10000, 1\n"
                 " 1.0e-8, 1.0, 0.0\n!END\n")
        cnt_path = fh.name
    cfg = read_cnt(cnt_path)
    os.unlink(cnt_path)
    model = build_struct_model(mesh, cfg)
    ndof = model.ndof
    n_dofs = model.n_dof_total
    out["tet_n_dofs"] = n_dofs
    out["tet_cluster_wc"] = int(wc)
    out["tet_reorder_s"] = round(t_reorder, 2)

    out["tet_stage"] = "solver_setup"
    t0 = time.perf_counter()
    programs = [nl.BlockPrograms(model, b) for b in model.blocks]
    states = [nl.init_block_state(b, p.table)
              for b, p in zip(model.blocks, programs)]
    inc, total_en = femop.build_incidence(
        [b.conn for b in model.blocks], model.n_node)
    inc_j = jnp.asarray(inc)
    free = jnp.asarray(old_ops.make_free_mask(n_dofs, model.fixed_dofs))
    dofs_j = [jnp.asarray(b.dofs) for b in model.blocks]
    nns = [b.conn.shape[1] for b in model.blocks]
    mixed = _solve_policy() == "mixed"
    solver = nl.make_constrained_solver(model, dofs_j, nns, inc_j,
                                        total_en, free, mixed)
    t_setup = time.perf_counter() - t0
    out["tet_setup_s"] = round(t_setup, 2)
    u = jnp.zeros(n_dofs)
    B = jnp.asarray(model.f_ext)
    zero = jnp.zeros_like(B)

    def newton_tangent():
        kes = []
        for p, s in zip(programs, states):
            u_e = u.reshape(model.n_node, ndof)[p.block.conn]
            kes.append(p.tangent(u_e, u_e * 0.0, s, 0.0, 0.0))
        return kes

    def newton_step():
        kes = newton_tangent()
        return solver(tuple(kes), B, zero), kes

    # warm-up compiles (profile/AMG maps build on host inside the
    # factory) — this IS the AOT compile smoke: if the production solver
    # program fails TPU lowering (the round-4 32-bit-addressing loss),
    # the exception surfaces here, labeled, with all setup numbers kept
    out["tet_stage"] = "aot_compile_and_warmup"
    dx, kes = newton_step()
    sync(dx)
    out["tet_aot_ok"] = True
    # free the warm-up tangent + solution BEFORE the timed step: holding
    # them while the next tangent assembles doubles the HBM peak (the
    # r05 ResourceExhausted at stage newton_timed — 1.13 GB of stale
    # kes on a chip the solve program already fills)
    del dx, kes

    out["tet_stage"] = "newton_timed"
    t0 = time.perf_counter()
    dx, kes = newton_step()
    sync(dx)
    t_newton = time.perf_counter() - t0
    iters = int(np.asarray(getattr(solver, "last_iters", -1)))
    out["newton_step_1mdof_tet_wall"] = round(t_newton, 4)
    out["tet_cg_iters"] = iters
    out["tet_refine_passes"] = int(np.asarray(
        getattr(solver, "last_passes", -1)))

    out["tet_stage"] = "residual64"
    # true f64 residual on free dofs
    fop = femop.FEOperator(kes=[k.astype(jnp.float64) for k in kes],
                           dofs=dofs_j, nns=nns, inc=inc_j,
                           total_en=total_en, n_node=model.n_node,
                           ndof=ndof, free_mask=free)
    r = (B - fop.matvec(dx)) * free
    relres = float(jnp.linalg.norm(r)) / max(
        float(jnp.linalg.norm(B * free)), 1e-300)
    out["tet_true_relres"] = relres

    out["tet_stage"] = "spmv_rate"
    # cluster-ELL matvec rate on the assembled operator (the CG hot op)
    cop = bellmod.from_model(model, [k.astype(jnp.float32) for k in kes])

    @jax.jit
    def mv50(op, x):
        def body(i, v):
            return op.matvec(v) / 27.0
        return jax.lax.fori_loop(0, 50, body, x)

    x32 = jnp.asarray(np.asarray(B), jnp.float32)
    sync(mv50(cop, x32))
    t0 = time.perf_counter()
    sync(mv50(cop, x32))
    t_mv = (time.perf_counter() - t0) / 50.0
    out["tet_spmv_ms"] = round(t_mv * 1e3, 3)
    # HBM traffic per matvec: block values + gathered x + y write.
    # v5e peak = 819 GB/s; the fraction tells whether SpMV regressions
    # are bandwidth or launch/gather overhead (VERDICT r04 weak #5).
    m = cop.G * cop.ndof
    C, Wc = cop.C, cop.ccols.shape[1]
    mv_bytes = (cop.blocks.size + C * Wc * m + 2 * C * m) * 4
    gbps = mv_bytes / t_mv / 1e9
    out["tet_spmv_hbm_gbps"] = round(gbps, 1)
    out["tet_spmv_hbm_frac"] = round(gbps / 819.0, 3)
    out["tet_stage"] = "done"
    return out


def _box_arm(verbose=False):
    import jax
    cache = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.assembly.structured import (StructuredHexOperatorD,
                                                   soa_from_blocks)
    from frontistr_tpu.solver.cg import pcg

    n = int(os.environ.get("BENCH_N", "69"))        # (n+1)^3*3 dofs ~ 1.03M
    use_mg = os.environ.get("BENCH_MG", "1") != "0" and n % 3 == 0
    mesh = box_hex8(n, n, n)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    ndof = 3
    n_dofs = n_node * ndof
    table = get_table(361)
    E = conn.shape[0]
    nn = table.nn
    D1 = elastic_D(210e3, 0.3, D3)

    # dof-major vector layout (v[d*n_node + node]): corner slices of the
    # (3, grid) array are natively (3, E) with elements on lanes -- the
    # node-major layout spends 7.3 of 11 ms/matvec in (E,3)<->(3,E)
    # lane shuffles
    free = np.ones((3, n_node))
    free[:, mesh.node_groups["X0"]] = 0.0
    free = free.reshape(-1)
    f = np.zeros((3, n_node))
    f[2, mesh.node_groups["X1"]] = -1.0
    f = f.reshape(-1)

    conn_j = jnp.asarray(conn)
    coords32 = jnp.asarray(mesh.coords, jnp.float32)
    coords64 = jnp.asarray(mesh.coords, jnp.float64)
    free32 = jnp.asarray(free, jnp.float32)
    free64 = jnp.asarray(free)
    D32 = jnp.asarray(np.broadcast_to(D1, (E, 6, 6)), jnp.float32)
    D64 = jnp.asarray(np.broadcast_to(D1, (E, 6, 6)), jnp.float64)
    f64 = jnp.asarray(f)

    def t32(t):
        return dc.replace(t, dN=t.dN.astype(np.float32),
                          N=t.N.astype(np.float32),
                          weights=t.weights.astype(np.float32))

    def make_op(keT, fm):
        return StructuredHexOperatorD(n, n, n, keT, fm)

    # geometric two-grid: coarse box re-discretized at 3h
    nc = n // 3
    mesh_c = box_hex8(nc, nc, nc)
    conn_c = mesh_c.blocks[0].conn
    Ec = conn_c.shape[0]
    conn_cj = jnp.asarray(conn_c)
    coords_c32 = jnp.asarray(mesh_c.coords, jnp.float32)
    D32c = jnp.asarray(np.broadcast_to(D1, (Ec, 6, 6)), jnp.float32)
    free_c = np.ones((3, mesh_c.n_node))
    free_c[:, mesh_c.node_groups["X0"]] = 0.0
    free_c32 = jnp.asarray(free_c.reshape(-1), jnp.float32)

    @jax.jit
    def assemble32c(c):
        ke = solid.stiffness_linear(t32(table), c[conn_cj], D32c)
        return soa_from_blocks(ke)

    def make_op_c(keTc):
        return StructuredHexOperatorD(nc, nc, nc, keTc, free_c32)

    @jax.jit
    def assemble32(c):
        """f32 element matrices straight into SoA (24, 24, E) layout."""
        ke = solid.stiffness_linear(t32(table), c[conn_j], D32)
        return soa_from_blocks(ke)

    # f64 operator for the TRUE residual.  Measured alternatives at 1M
    # dof: re-integrated element residual (matrix-free f64) costs
    # 1.9 s/call (f64 emulation is per-op-overhead-bound); generic
    # assembled B^T D B costs 5.3 s.  The isotropic gram-matrix closed
    # form (stiffness_linear_iso: ONE (24,q)@(q,24) gram matmul + cheap
    # relayouts, ~20x fewer f64 FLOPs) assembles the same f64 operator
    # in 1.3 s — f64 emulation cost tracks FLOPs almost 1:1.
    _E, _nu = 210e3, 0.3
    lam64 = _E * _nu / ((1 + _nu) * (1 - 2 * _nu))
    mu64 = _E / (2 * (1 + _nu))

    # Uniform grid: every element is the SAME cube, so the exact f64
    # operator is ONE 24x24 element matrix (stiffness_linear_iso on a
    # single element) applied through the const stencil operator — the
    # per-element f64 gram assembly this replaces cost 1.30 s of the
    # 3.05 s step at 1M dof (and its matvec rode the 2.9 GB f64 SoA).
    from frontistr_tpu.assembly.structured import \
        StructuredHexOperatorConstD
    ke64_c = solid.stiffness_linear_iso(
        table, coords64[conn_j[:1]], lam64, mu64)[0]     # (24, 24) f64

    @jax.jit
    def residual64(ke_c, x):
        op = StructuredHexOperatorConstD(n, n, n, ke_c, free64)
        y = op.matvec(x * free64) * free64
        return f64 * free64 - y

    # NOTE: one monolithic multi-thousand-iteration CG program runs 30s+
    # on device and trips the remote-TPU execution watchdog; chunk the
    # Krylov loop and warm-restart on the host.
    cg_chunk = int(os.environ.get("BENCH_CG_CHUNK", "600"))
    # per-pass contraction floors at eps_f32 * cond(M K) ~ 2e-3 (measured);
    # pushing the inner CG below that wastes iterations
    inner_tol = 1e-3

    from frontistr_tpu.solver.mg import make_transfers, make_twogrid
    prolong, restrict = make_transfers(n, n, n, 3) if use_mg else (None,
                                                                   None)

    @jax.jit
    def cg32(keT32, keTc32, lmax_c, b32, x0):
        op = make_op(keT32, free32)
        if use_mg:
            M = make_twogrid(op, make_op_c(keTc32), prolong, restrict,
                             lmax_c,
                             cheb_degree=int(os.environ.get(
                                 "BENCH_CHEB_DEG", "20")))
        else:
            M = op.block_jacobi()
        res = pcg(op.apply_constrained, b32, M=M,
                  x0=x0, tol=inner_tol, maxiter=cg_chunk)
        return res.x, res.iters, res.relres

    @jax.jit
    def coarse_lmax(keTc32):
        """Power iteration as ONE device program (the 15 separate calls
        of round 1 cost a tunnel round-trip each and dominated the
        Newton step)."""
        opc = make_op_c(keTc32)
        M = opc.block_jacobi()
        v0 = jax.random.normal(jax.random.PRNGKey(7),
                               (mesh_c.n_node * 3,), jnp.float32)

        def body(i, st):
            v, _ = st
            w = M(opc.apply_constrained(v))
            nrm = jnp.linalg.norm(w)
            return (w / nrm, nrm)

        _, lam = jax.lax.fori_loop(0, 15, body,
                                   (v0 / jnp.linalg.norm(v0),
                                    jnp.asarray(1.0, jnp.float32)))
        return lam * 1.05

    def cg32_restarting(keT32, keTc32, lmax_c, b32, max_chunks=6):
        x = jnp.zeros_like(b32)
        total = 0
        for _ in range(max_chunks):
            x, it, rr = cg32(keT32, keTc32, lmax_c, x0=x, b32=b32)
            total += int(it)
            if float(rr) <= inner_tol:
                break
        return x, total


    @jax.jit
    def mv50(keT32, x):
        op = make_op(keT32, free32)

        def body(i, v):
            return op.matvec(v)
        return jax.lax.fori_loop(0, 50, body, x)

    verbose = verbose or os.environ.get("BENCH_VERBOSE", "") == "1"

    def newton_step():
        """assemble (f32 + f64) + refined CG to true f64 relres <= 1e-8.

        full-f32 stencil matvecs let each inner CG reach 1e-5; 2-3
        refinement passes against the f64 operator hit 1e-8."""
        stamps = [("start", time.perf_counter())]
        keT32 = assemble32(coords32)
        keTc32 = assemble32c(coords_c32)
        lmax_c = coarse_lmax(keTc32)
        sync(lmax_c)
        stamps.append(("asm32+lmax", time.perf_counter()))
        x = jnp.zeros(n_dofs)
        bnrm = float(np.linalg.norm(f))
        total_iters = 0
        relres = 1.0
        for _ in range(6):
            r = residual64(ke64_c, x)
            relres = float(jnp.linalg.norm(r)) / bnrm
            if relres <= 1e-8:
                break
            dx, it = cg32_restarting(keT32, keTc32, lmax_c,
                                     r.astype(jnp.float32))
            total_iters += it
            x = x + dx.astype(jnp.float64)
            stamps.append((f"cg_pass({it}it)", time.perf_counter()))
        r = residual64(ke64_c, x)
        relres = float(jnp.linalg.norm(r)) / bnrm
        stamps.append(("final_resid", time.perf_counter()))
        if verbose:
            for (n1, t1s), (n2, t2s) in zip(stamps, stamps[1:]):
                print(f"  [newton] {n2:16s} {t2s - t1s:7.3f} s")
        return x, total_iters, relres

    # block_until_ready does not reliably synchronize through the remote
    # TPU (axon) tunnel; a scalar reduction + 8-byte device_get does.
    _snorm = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def sync(x):
        return float(_snorm(x))

    # ---- warm-up compiles (each piece separately) -------------------------
    keT32 = assemble32(coords32)
    sync(keT32)
    keTc32 = assemble32c(coords_c32)
    sync(keTc32)
    lmax_c = coarse_lmax(keTc32)
    x32 = jnp.asarray(f, jnp.float32)
    sync(mv50(keT32, x32))
    # warm-up MUST use the same positional/keyword arg structure as the
    # newton loop: jit caches on the call tree, and a kwarg-vs-positional
    # mismatch forces a fresh 60-80 s remote compile inside the timed
    # region (the round-1 bench regression)
    sync(cg32(keT32, keTc32, lmax_c, x0=jnp.zeros_like(x32),
              b32=x32)[0])
    sync(residual64(ke64_c, jnp.zeros(n_dofs)))

    t0 = time.perf_counter()
    sync(assemble32(coords32))
    t_asm = time.perf_counter() - t0

    t0 = time.perf_counter()
    sync(mv50(keT32, x32))
    t_mv50 = time.perf_counter() - t0

    t0 = time.perf_counter()
    u, iters, relres = newton_step()
    sync(u)
    t_newton = time.perf_counter() - t0

    melem_s = E / t_asm / 1e6
    flops_per_mv = 2.0 * E * (nn * ndof) ** 2
    gflops = flops_per_mv * 50 / t_mv50 / 1e9
    # SoA element-matrix stream dominates HBM traffic (757 MB at 1M dof)
    mv_bytes = (576 * E + 3 * n_dofs) * 4
    hbm_gbps = mv_bytes * 50 / t_mv50 / 1e9

    value = t_newton
    extras = dict(
        n_dofs=n_dofs, n_elems=E, cg_iters=iters, true_relres=relres,
        assembly_s=round(t_asm, 4), assembly_melem_s=round(melem_s, 3),
        spmv_gflop_s=round(gflops, 2), spmv_ms=round(t_mv50 / 50 * 1e3, 3),
        spmv_hbm_gbps=round(hbm_gbps, 1),
        spmv_hbm_frac=round(hbm_gbps / 819.0, 3),
        device=str(jax.devices()[0]),
        precision="f32+f64 refinement, structured stencil"
                  + (", two-grid" if use_mg else ""))

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    vs_baseline = 1.0
    try:
        if os.path.exists(base_path):
            with open(base_path) as fh:
                base = json.load(fh)
            if base.get("value") and base.get("n_dofs") == n_dofs:
                vs_baseline = base["value"] / value
        else:
            with open(base_path, "w") as fh:
                json.dump({"metric": "newton_step_1mdof_wall",
                           "value": value, "unit": "s",
                           "n_dofs": n_dofs}, fh)
    except Exception:
        pass

    out = {"metric": "newton_step_1mdof_wall", "value": round(value, 4),
           "unit": "s", "vs_baseline": round(vs_baseline, 4),
           "vs_baseline_note": "vs our round-1 TPU self-measurement "
                               "(bench_baseline.json); reference-machine "
                               "numbers are in BASELINE.md"}
    out.update(extras)
    # the box arm's device buffers (SoA operators, f64 vectors, grids)
    # are several GB of the 16 GB chip — release them before the tet arm
    # allocates its own working set
    import gc
    del keT32, keTc32, x32, u, f, free32, free64, coords32, coords64
    del mesh, conn, coords_c32
    gc.collect()
    return out


def _probe_backend(timeout_s, attempts):
    """Initialize the JAX backend in a SUBPROCESS with a hard timeout.

    Round 3 lost its entire perf artifact because the axon TPU backend
    hung ~20 min in init and then died at the first device_put — with no
    probe, no retry, and no fallback JSON.  A subprocess probe is the
    only way to bound a hang inside backend init (it happens before any
    Python-level signal handling can fire in-process).
    Returns the probe's stdout line on success, None on failure.
    """
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp; "
            "d = jax.devices(); "
            "x = jnp.ones((256, 256)); "
            "v = float((x @ x)[0, 0]); "
            "print('PROBE_OK', d[0].platform, v)")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return r.stdout.strip().splitlines()[-1]
            sys.stderr.write(f"[bench] probe attempt {i + 1}/{attempts} "
                             f"rc={r.returncode}: "
                             f"{(r.stderr or '')[-400:]}\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"[bench] probe attempt {i + 1}/{attempts} "
                             f"timed out after {timeout_s}s\n")
        except Exception as e:
            sys.stderr.write(f"[bench] probe attempt {i + 1}/{attempts} "
                             f"failed: {e}\n")
    return None


def _force_cpu():
    """The container's sitecustomize force-registers the axon TPU backend
    and overwrites JAX_PLATFORMS at interpreter startup — when the TPU is
    down that registration HANGS at the first device op even under
    JAX_PLATFORMS=cpu.  jax.config is the reliable override (same trick
    as tests/conftest.py)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def _worker(out_path):
    """Runs the workload; dumps the result JSON to out_path AFTER EVERY
    STAGE (not just at exit), so even a SIGKILL mid-solve leaves the
    stages that finished on disk.  Never raises; rc 0 always."""
    import sys
    verbose = os.environ.get("BENCH_VERBOSE", "") == "1"
    out = {"metric": "newton_step_1mdof_wall", "value": None,
           "unit": "s", "vs_baseline": None}

    def flush():
        tmp = out_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(out, fh)
        os.replace(tmp, out_path)

    flush()

    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "420"))
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    forced_cpu = (os.environ.get("BENCH_CPU", "") == "1"
                  or os.environ.get("JAX_PLATFORMS", "") == "cpu")
    if forced_cpu:
        _force_cpu()
    probe = (None if forced_cpu
             else _probe_backend(probe_timeout, attempts))

    if probe is None and not forced_cpu:
        # TPU down: never exit empty — emit the error plus a small-N CPU
        # sanity arm so the artifact still certifies the code path runs.
        out["error"] = "tpu_unavailable"
        flush()
        _force_cpu()
        os.environ.setdefault("BENCH_N", "12")
        os.environ.setdefault("BENCH_TET_N", "10")
        os.environ.setdefault("BENCH_CG_CHUNK", "300")
        try:
            sanity = _box_arm(verbose=verbose)
            out["cpu_sanity"] = {
                k: sanity[k] for k in ("value", "n_dofs", "cg_iters",
                                       "true_relres", "assembly_s")
                if k in sanity}
            out["cpu_sanity"]["note"] = (
                "small-N CPU fallback, NOT a TPU perf number")
        except Exception as e:
            out["cpu_sanity_error"] = f"{type(e).__name__}: {e}"
        flush()
        try:
            tet = {}
            _tet_arm(verbose=verbose, out=tet)
            out["cpu_sanity_tet"] = {
                "value": tet.get("newton_step_1mdof_tet_wall"),
                "n_dofs": tet.get("tet_n_dofs"),
                "cg_iters": tet.get("tet_cg_iters"),
                "true_relres": tet.get("tet_true_relres"),
                "note": "small-N CPU fallback, NOT a TPU perf number"}
        except Exception as e:
            out["cpu_sanity_tet_error"] = f"{type(e).__name__}: {e}"
        flush()
        return 0

    if probe is not None:
        out["probe"] = probe
    flush()
    try:
        out.update(_box_arm(verbose=verbose))
    except Exception as e:
        out["box_error"] = f"{type(e).__name__}: {e}"
    flush()
    # unstructured-tet production-path arm (shuffled numbering -> reorder
    # -> cluster-ELL + AMG + mixed precision): the numbers real meshes see
    if os.environ.get("BENCH_TET", "1") != "0":
        tet = {}
        try:
            _tet_arm(verbose=verbose, out=tet)
        except Exception as e:               # never lose the box metric
            tet["tet_error"] = f"{type(e).__name__}: {e}"
        out.update(tet)                      # partial stages survive
    flush()
    return 0


def main():
    """Parent shell: runs the workload in a SUBPROCESS whose stdout and
    stderr are captured to a log file, then prints the result JSON as
    the parent's ONLY stdout — async backend log lines (axon/libtpu)
    cannot trail or bury it (the round-4 artifact loss: rc=0 but the
    driver's tail held only backend ERROR spam, no JSON).  The JSON also
    persists at BENCH_OUT.json, updated after every worker stage."""
    import subprocess
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.environ.get("BENCH_OUT",
                              os.path.join(here, "BENCH_OUT.json"))
    log_path = os.environ.get("BENCH_LOG",
                              os.path.join(here, "BENCH_OUT.log"))
    timeout_s = int(os.environ.get("BENCH_WORKER_TIMEOUT", "5400"))
    env = dict(os.environ, BENCH_OUT=out_path)
    try:
        os.remove(out_path)
    except OSError:
        pass
    tail = ""
    try:
        with open(log_path, "w") as lg:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                stdout=lg, stderr=subprocess.STDOUT, env=env,
                timeout=timeout_s)
        rc = r.returncode
    except subprocess.TimeoutExpired:
        rc = "timeout"
    except Exception as e:
        rc = f"{type(e).__name__}: {e}"
    try:
        with open(log_path) as lg:
            tail = lg.read()[-800:]
    except OSError:
        pass
    try:
        with open(out_path) as fh:
            out = json.load(fh)
    except Exception:
        out = {"metric": "newton_step_1mdof_wall", "value": None,
               "unit": "s", "vs_baseline": None,
               "error": "worker produced no result file"}
    if rc != 0:
        out["worker_rc"] = str(rc)
        out["worker_tail"] = tail
        try:
            with open(out_path, "w") as fh:
                json.dump(out, fh)
        except OSError:
            pass
    sys.stdout.flush()
    print(json.dumps(out))
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    import sys
    if "--worker" in sys.argv:
        sys.exit(_worker(os.environ.get("BENCH_OUT", "BENCH_OUT.json")))
    sys.exit(main())
