"""Benchmark: 1M-DOF linear-elastic Newton step on one chip.

Mirrors BASELINE.json's driver metric: "Newton step wall-time and CG GFLOP/s
per chip at 1M DOF; assembly Melem/s".  Workload: structured hex8 box,
~1M dofs; batched f32 element assembly + gather-only matrix-free CG with
f64 iterative refinement to true relative residual <= 1e-8 (FrontISTR's
convergence target at FrontISTR's accuracy, on the TPU's fast path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline compares against bench_baseline.json when present (first
recorded run), else 1.0.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.assembly import femop
    from frontistr_tpu.solver.mixed import refined_cg
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

    def make_op(kes, dtype):
        return femop.FEOperator(
            kes=[kes], dofs=[dofs], nns=[nn], inc=jnp.asarray(inc),
            total_en=total_en, n_node=n_node, ndof=ndof,
            free_mask=jnp.asarray(free, dtype), dtype=dtype)

    D32 = jnp.asarray(np.broadcast_to(D1, (E, 6, 6)), jnp.float32)
    D64 = jnp.asarray(np.broadcast_to(D1, (E, 6, 6)), jnp.float64)

    def _f32_table(t):
        import dataclasses as dc
        return dc.replace(t, dN=t.dN.astype(np.float32),
                          N=t.N.astype(np.float32),
                          weights=t.weights.astype(np.float32))

    f64v = jnp.asarray(f)

    free64 = jnp.asarray(free)
    inc_j = jnp.asarray(inc)

    def A64_matfree(x):
        """f64 constrained operator, assemble-on-the-fly in chunks (no
        stored f64 matrix: ke64 alone would cost ~6GB padded on TPU)."""
        xm = x * free64

        def chunk_fe(ce, De, de):
            ke = solid.stiffness_linear(table, ce, De)
            return jnp.einsum("eij,ej->ei", ke, xm[de])

        ce_all = coords64[conn_j]
        fe = solid._chunked(chunk_fe, ce_all, D64, dofs, chunk=32768)
        flat = jnp.concatenate([fe.reshape(-1), jnp.zeros(3)])
        idx = inc_j[:, :, None] * 3 + jnp.arange(3)[None, None, :]
        y = flat[idx].sum(axis=1).reshape(-1)
        return y * free64 + x * (1.0 - free64)

    @jax.jit
    def newton_step(coords32, coords64, fvec):
        ke32 = solid.stiffness_linear(_f32_table(table), coords32[conn_j],
                                      D32)
        op32 = make_op(ke32, jnp.float32)
        b = fvec * free64
        res = refined_cg(A64_matfree, op32.apply_constrained,
                         op32.block_jacobi(), b, tol=1e-8, inner_tol=1e-6,
                         maxiter=3000, max_passes=3)
        return res.x, res.iters, res.relres

    @jax.jit
    def mv_bench(coords32, x):
        ke32 = solid.stiffness_linear(_f32_table(table), coords32[conn_j],
                                      D32)
        op32 = make_op(ke32, jnp.float32)

        def body(i, v):
            return op32.matvec(v)
        return jax.lax.fori_loop(0, 50, body, x)

    @jax.jit
    def asm_bench(coords32):
        return solid.stiffness_linear(_f32_table(table), coords32[conn_j],
                                      D32)

    # warm-up compiles
    u, iters, relres = newton_step(coords32, coords64, f64v)
    u = jax.block_until_ready(u)
    x32 = jnp.asarray(f, jnp.float32)
    jax.block_until_ready(mv_bench(coords32, x32))
    jax.block_until_ready(asm_bench(coords32))

    t0 = time.perf_counter()
    jax.block_until_ready(asm_bench(coords32))
    t_asm = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(mv_bench(coords32, x32))
    t_mv50 = (time.perf_counter() - t0)

    t0 = time.perf_counter()
    u, iters, relres = newton_step(coords32, coords64, f64v)
    u = jax.block_until_ready(u)
    t_newton = time.perf_counter() - t0

    iters = int(iters)
    relres = float(relres)
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
                vs_baseline = base["value"] / value   # >1 = faster than base
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
