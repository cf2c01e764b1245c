"""Pallas windowed SpMV: correctness vs XLA ELL + timing.

Run: python scripts/bench_pallas_spmv.py [tet|hex] [n]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_hex8, box_tet4
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.assembly import ell
    from frontistr_tpu.ops import ell_spmv

    kind = sys.argv[1] if len(sys.argv) > 1 else "tet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mesh = box_tet4(n, n, n) if kind == "tet" else box_hex8(n, n, n)
    etype = 341 if kind == "tet" else 361
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    ndof = 3
    E = conn.shape[0]
    table = get_table(etype)
    nn = table.nn
    D1 = elastic_D(210e3, 0.3, D3)
    print(f"{kind} {E} elems {n_node} nodes ({n_node*3/1e6:.2f}M dof)",
          flush=True)

    import dataclasses as dc

    def t32(t):
        return dc.replace(t, dN=t.dN.astype(np.float32),
                          N=t.N.astype(np.float32),
                          weights=t.weights.astype(np.float32))

    conn_j = jnp.asarray(conn)
    D132 = jnp.asarray(D1, jnp.float32)

    @jax.jit
    def assemble_kes(c, conn_d, D1d):
        De = jnp.broadcast_to(D1d, (conn_d.shape[0], 6, 6))

        def chunk(ce, De):
            return solid.stiffness_linear(t32(table), ce, De)
        return solid._chunked(chunk, c[conn_d], De, chunk=65536)

    _snorm = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def sync(x):
        return float(_snorm(x.reshape(-1)))

    ke = assemble_kes(jnp.asarray(mesh.coords, jnp.float32), conn_j, D132)
    sync(ke)

    # original-order profile for the XLA reference op
    t0 = time.perf_counter()
    prof0 = ell.build_profile([conn], n_node, ndof)
    print(f"profile: {time.perf_counter()-t0:.1f}s W={prof0.W}", flush=True)
    t0 = time.perf_counter()
    perm = ell_spmv.rcm_order(prof0.cols, n_node)
    inv = np.empty(n_node, np.int64)
    inv[perm] = np.arange(n_node)
    conn_rcm = inv[conn]
    prof = ell.build_profile([conn_rcm], n_node, ndof)
    plan = ell_spmv.build_plan(prof.cols, ndof, perm)
    print(f"rcm+plan: {time.perf_counter()-t0:.1f}s winr={plan.winr} "
          f"T={plan.T} W={plan.W}", flush=True)

    blocks = ell.assemble_blocks(prof, [ke.astype(jnp.float32)], [nn])
    free = np.ones(n_node * 3, np.float32)
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=3,
                          free_mask=jnp.asarray(free))
    pop = ell_spmv.PallasELL(plan, blocks, eop.diag_blocks(),
                             jnp.asarray(free))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_node * 3), jnp.float32)
    xk = ell_spmv.to_kernel(plan, x)

    y_ref = np.asarray(eop.matvec(x))
    t0 = time.perf_counter()
    yk = pop.matvec(xk)
    y = np.asarray(ell_spmv.from_kernel(plan, yk))
    print(f"first kernel call (compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    print(f"pallas vs XLA ELL rel err: {err:.2e}", flush=True)

    @jax.jit
    def mv20_pallas(kb, xk):
        op2 = pop

        def body(i, v):
            y = ell_spmv._spmv(op2.statics, op2.win_off, op2.rlo, op2.rhi,
                               v, op2.iq, op2.ip, kb)
            return y / (27.0 * 1e3)
        return jax.lax.fori_loop(0, 20, body, xk)

    @jax.jit
    def mv20_ell(b, x):
        op = dc.replace(eop, blocks=b)

        def body(i, v):
            return op.matvec(v) / (27.0 * 1e3)
        return jax.lax.fori_loop(0, 20, body, x)

    sync(mv20_pallas(pop.kb, xk))
    t0 = time.perf_counter()
    sync(mv20_pallas(pop.kb, xk))
    t_p = (time.perf_counter() - t0) / 20
    print(f"pallas matvec: {t_p*1e3:8.3f} ms", flush=True)

    sync(mv20_ell(blocks, x))
    t0 = time.perf_counter()
    sync(mv20_ell(blocks, x))
    t_e = (time.perf_counter() - t0) / 20
    print(f"XLA ELL matvec: {t_e*1e3:7.3f} ms  (pallas speedup "
          f"{t_e/t_p:.1f}x)", flush=True)


if __name__ == "__main__":
    main()
