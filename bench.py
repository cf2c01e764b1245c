"""Benchmark: 1M-DOF linear-elastic Newton step on one chip.

Mirrors BASELINE.json's driver metric: "Newton step wall-time and CG GFLOP/s
per chip at 1M DOF; assembly Melem/s".  Workload: structured hex8 box,
~1M dofs; batched f32 element assembly + gather-only matrix-free CG with
f64 iterative refinement to true relative residual <= 1e-8 (FrontISTR's
convergence target at FrontISTR's accuracy, on the TPU's fast path).

Each stage is its own jitted program (one monolithic graph makes the remote
TPU compile pathologically slow); the refinement loop is host-orchestrated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline compares against bench_baseline.json when present (first
recorded run at the same size), else 1.0.
"""

import dataclasses as dc
import json
import os
import time

import numpy as np


def main():
    import jax
    # persistent compile cache: the remote TPU compiles for the 1M-dof
    # programs take minutes; cache them across runs
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
    from frontistr_tpu.assembly import femop
    from frontistr_tpu.solver.cg import pcg

    n = int(os.environ.get("BENCH_N", "69"))        # (n+1)^3*3 dofs ~ 1.03M
    mesh = box_hex8(n, n, n)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    ndof = 3
    n_dofs = n_node * ndof
    table = get_table(361)
    E = conn.shape[0]
    nn = table.nn
    D1 = elastic_D(210e3, 0.3, D3)

    fixed = (mesh.node_groups["X0"][:, None] * 3 +
             np.arange(3)[None, :]).reshape(-1)
    free = np.ones(n_dofs)
    free[fixed] = 0.0
    f = np.zeros(n_dofs)
    f[mesh.node_groups["X1"] * 3 + 2] = -1.0

    inc, total_en = femop.build_incidence([conn], n_node)
    conn_j = jnp.asarray(conn)
    coords32 = jnp.asarray(mesh.coords, jnp.float32)
    coords64 = jnp.asarray(mesh.coords, jnp.float64)
    dofs = jnp.asarray((conn[:, :, None] * ndof +
                        np.arange(ndof)[None, None, :]).reshape(E, nn * ndof)
                       .astype(np.int32))
    inc_j = jnp.asarray(inc)
    free32 = jnp.asarray(free, jnp.float32)
    free64 = jnp.asarray(free)
    D32 = jnp.asarray(np.broadcast_to(D1, (E, 6, 6)), jnp.float32)
    D64 = jnp.asarray(np.broadcast_to(D1, (E, 6, 6)), jnp.float64)

    def t32(t):
        return dc.replace(t, dN=t.dN.astype(np.float32),
                          N=t.N.astype(np.float32),
                          weights=t.weights.astype(np.float32))

    def make_op(kes, fm):
        return femop.FEOperator(kes=[kes], dofs=[dofs], nns=[nn], inc=inc_j,
                                total_en=total_en, n_node=n_node, ndof=ndof,
                                free_mask=fm)

    @jax.jit
    def assemble32(c):
        return solid.stiffness_linear(t32(table), c[conn_j], D32)

    # NOTE: one monolithic 3000-iteration CG program runs ~30s+ on device
    # and trips the remote-TPU execution watchdog ("TPU worker process
    # crashed").  Chunk the Krylov loop: each call runs CG_CHUNK iterations
    # (a few seconds), the host warm-restarts until the inner tolerance.
    cg_chunk = int(os.environ.get("BENCH_CG_CHUNK", "400"))

    @jax.jit
    def cg32(ke32, b32, x0):
        op = make_op(ke32, free32)
        res = pcg(op.apply_constrained, b32, M=op.block_jacobi(),
                  x0=x0, tol=1e-6, maxiter=cg_chunk)
        return res.x, res.iters, res.relres

    def cg32_restarting(ke32, b32, max_chunks=10):
        x = jnp.zeros_like(b32)
        total = 0
        for _ in range(max_chunks):
            x, it, rr = cg32(ke32, b32, x)
            total += int(it)
            if float(rr) <= 1e-6:
                break
        return x, total

    m = nn * ndof

    @jax.jit
    def assemble64_flat(c):
        """f64 element matrices stored (E, m*m): the flat layout avoids the
        (E, 24, 24) -> (E, 32, 128) TPU tile padding (4GB -> 1.7GB)."""
        def chunk(ce, De):
            ke = solid.stiffness_linear(table, ce, De)
            return ke.reshape(ke.shape[0], m * m)
        return solid._chunked(chunk, c[conn_j], D64, chunk=32768)

    @jax.jit
    def residual64(ke64_flat, x):
        """r = P(b - A64 x) with the stored f64 matrix, chunked matvec."""
        xm = x * free64

        def chunk_fe(kf, de):
            return jnp.einsum("eij,ej->ei", kf.reshape(-1, m, m), xm[de])

        fe = solid._chunked(chunk_fe, ke64_flat, dofs, chunk=32768)
        flat = jnp.concatenate([fe.reshape(-1), jnp.zeros(3)])
        idx = inc_j[:, :, None] * 3 + jnp.arange(3)[None, None, :]
        y = flat[idx].sum(axis=1).reshape(-1) * free64
        return jnp.asarray(f) * free64 - y

    @jax.jit
    def mv50(ke32, x):
        op = make_op(ke32, free32)

        def body(i, v):
            return op.matvec(v)
        return jax.lax.fori_loop(0, 50, body, x)

    def newton_step():
        """assemble (f32 + f64) + refined CG to true f64 relres <= 1e-8.

        the femop matvec einsum runs at Precision.HIGHEST (full f32), so
        each inner CG reaches ~1e-6 and 2-3 refinement passes against the
        stored f64 matrix hit 1e-8."""
        ke32 = assemble32(coords32)
        ke64f = assemble64_flat(coords64)
        x = jnp.zeros(n_dofs)
        bnrm = float(np.linalg.norm(f))
        total_iters = 0
        relres = 1.0
        for _ in range(6):
            r = residual64(ke64f, x)
            relres = float(jnp.linalg.norm(r)) / bnrm
            if relres <= 1e-8:
                break
            dx, it = cg32_restarting(ke32, r.astype(jnp.float32))
            total_iters += it
            x = x + dx.astype(jnp.float64)
        r = residual64(ke64f, x)
        relres = float(jnp.linalg.norm(r)) / bnrm
        return x, total_iters, relres

    # ---- warm-up compiles (each piece separately) -------------------------
    ke32 = jax.block_until_ready(assemble32(coords32))
    x32 = jnp.asarray(f, jnp.float32)
    jax.block_until_ready(mv50(ke32, x32))
    jax.block_until_ready(cg32(ke32, x32, jnp.zeros_like(x32))[0])
    ke64f_w = jax.block_until_ready(assemble64_flat(coords64))
    jax.block_until_ready(residual64(ke64f_w, jnp.zeros(n_dofs)))
    del ke64f_w

    t0 = time.perf_counter()
    jax.block_until_ready(assemble32(coords32))
    t_asm = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(mv50(ke32, x32))
    t_mv50 = time.perf_counter() - t0

    t0 = time.perf_counter()
    u, iters, relres = newton_step()
    u = jax.block_until_ready(u)
    t_newton = time.perf_counter() - t0

    melem_s = E / t_asm / 1e6
    flops_per_mv = 2.0 * E * (nn * ndof) ** 2
    gflops = flops_per_mv * 50 / t_mv50 / 1e9

    value = t_newton
    extras = dict(
        n_dofs=n_dofs, n_elems=E, cg_iters=iters, true_relres=relres,
        assembly_s=round(t_asm, 4), assembly_melem_s=round(melem_s, 3),
        spmv_gflop_s=round(gflops, 2), device=str(jax.devices()[0]),
        precision="f32+f64 refinement")

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
           "unit": "s", "vs_baseline": round(vs_baseline, 4)}
    out.update(extras)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
