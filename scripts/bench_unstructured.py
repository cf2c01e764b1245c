"""Unstructured SpMV benchmark: femop gather vs assembled block-ELL.

The VERDICT round-1 'done' bar: <= 15 ms/matvec at 1M dof on a tet mesh.
Run: python scripts/bench_unstructured.py [tet|hex] [n]
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
    from frontistr_tpu.assembly import ell, femop

    kind = sys.argv[1] if len(sys.argv) > 1 else "tet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 69
    mesh = box_tet4(n, n, n) if kind == "tet" else box_hex8(n, n, n)
    etype = 341 if kind == "tet" else 361
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    ndof = 3
    E = conn.shape[0]
    table = get_table(etype)
    nn = table.nn
    D1 = elastic_D(210e3, 0.3, D3)
    D1_32 = jnp.asarray(D1, jnp.float32)
    coords32 = jnp.asarray(mesh.coords, jnp.float32)
    free = np.ones(n_node * 3, np.float32)
    free[(mesh.node_groups["X0"][:, None] * 3 + np.arange(3)).reshape(-1)] \
        = 0.0
    free_j = jnp.asarray(free)
    print(f"{kind} mesh: {E} elems, {n_node} nodes, {n_node*3/1e6:.2f}M dof")

    import dataclasses as dc

    def t32(t):
        return dc.replace(t, dN=t.dN.astype(np.float32),
                          N=t.N.astype(np.float32),
                          weights=t.weights.astype(np.float32))

    conn_j = jnp.asarray(conn)    # passed as a jit ARG: closure/np
                                  # constants are inlined as HLO literals
                                  # (HTTP 413 on the remote-compile tunnel)

    @jax.jit
    def assemble_kes(c, cj, D1d):
        De = jnp.broadcast_to(D1d, (cj.shape[0], 6, 6))

        def chunk(ce, De_):
            return solid.stiffness_linear(t32(table), ce, De_)
        return solid._chunked(chunk, c[cj], De, chunk=65536)

    # NO eager reshape here: an untraced reshape on (E, m, m) dispatches a
    # standalone copy into dense row-major T(8,128) layout — 14.2x padded
    # (15 GB at 1M-dof tet).  jnp.sum reduces any rank in place.
    _snorm = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def sync(x):
        return float(_snorm(x))

    t0 = time.perf_counter()
    ke = assemble_kes(coords32, conn_j, D1_32)
    sync(ke)
    t0 = time.perf_counter()
    ke = assemble_kes(coords32, conn_j, D1_32)
    sync(ke)
    t_ke = time.perf_counter() - t0
    print(f"element stiffness: {t_ke*1e3:.1f} ms ({E/t_ke/1e6:.1f} Melem/s)")

    # --- host profile build ---
    t0 = time.perf_counter()
    prof = ell.build_profile([conn], n_node, ndof)
    t_prof = time.perf_counter() - t0
    print(f"ELL profile (host): {t_prof:.2f} s, W={prof.W}, "
          f"pad fill={prof.cols.size/ (prof.seg_sorted.size and len(np.unique(prof.seg_sorted))):.2f}x")

    # --- device assembly (profile rides through jit as a pytree arg) ---
    prof_d = prof.device()

    @jax.jit
    def assemble_ell(p, ke):
        return ell.assemble_blocks(p, [ke], [nn])
    blocks = assemble_ell(prof_d, ke)
    sync(blocks)
    t0 = time.perf_counter()
    blocks = assemble_ell(prof_d, ke)
    sync(blocks)
    t_asm = time.perf_counter() - t0
    print(f"ELL assembly (device): {t_asm*1e3:.1f} ms")

    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=ndof, free_mask=free_j)

    dofs = (conn[:, :, None] * 3 + np.arange(3)).reshape(E, -1).astype(
        np.int32)
    inc, total_en = femop.build_incidence([conn], n_node)
    fop = femop.FEOperator(kes=[ke], dofs=[jnp.asarray(dofs)], nns=[nn],
                           inc=jnp.asarray(inc), total_en=total_en,
                           n_node=n_node, ndof=3, free_mask=free_j)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_node * 3), jnp.float32)

    @jax.jit
    def mv20_ell(op, x):
        def body(i, v):
            return op.matvec(v) / (1e3 * 27.0)
        return jax.lax.fori_loop(0, 20, body, x)

    @jax.jit
    def mv20_fem(op, x):
        def body(i, v):
            return op.matvec(v) / (1e6 * 27.0)
        return jax.lax.fori_loop(0, 20, body, x)

    sync(mv20_ell(eop, x))
    t0 = time.perf_counter()
    sync(mv20_ell(eop, x))
    t_ell = (time.perf_counter() - t0) / 20
    print(f"ELL matvec:   {t_ell*1e3:8.2f} ms")

    sync(mv20_fem(fop, x))
    t0 = time.perf_counter()
    sync(mv20_fem(fop, x))
    t_fem = (time.perf_counter() - t0) / 20
    print(f"femop matvec: {t_fem*1e3:8.2f} ms   (ELL speedup "
          f"{t_fem/t_ell:.1f}x)")

    # --- cluster-ELL (the production unstructured hot path) ---
    from frontistr_tpu.assembly import bell
    t0 = time.perf_counter()
    cprof = bell.build_cluster_profile([conn], n_node, ndof, scalar=prof)
    print(f"cluster profile (host): {time.perf_counter()-t0:.2f} s, "
          f"Wc={cprof.Wc}")
    cprof_d = cprof.device()
    cb, raw = bell._assemble_jit(cprof_d, (ke,), (nn,))
    sync(cb)
    t0 = time.perf_counter()
    cb, raw = bell._assemble_jit(cprof_d, (ke,), (nn,))
    sync(cb)
    t_casm = time.perf_counter() - t0
    print(f"cluster assembly (device): {t_casm*1e3:.1f} ms")
    diag = bell._diag_jit(cprof_d, raw)
    cop = bell.ClusterOperator(blocks=cb, ccols=cprof_d.ccols, diag=diag,
                               n_node=n_node, ndof=ndof, G=cprof.G,
                               free_mask=free_j)

    @jax.jit
    def mv20_cl(op, x):
        def body(i, v):
            return op.matvec(v) / (1e3 * 27.0)
        return jax.lax.fori_loop(0, 20, body, x)

    xf = x.reshape(-1)
    sync(mv20_cl(cop, xf))
    t0 = time.perf_counter()
    sync(mv20_cl(cop, xf))
    t_cl = (time.perf_counter() - t0) / 20
    print(f"cluster matvec: {t_cl*1e3:6.2f} ms   "
          f"({t_fem/t_cl:.1f}x femop, {t_ell/t_cl:.1f}x ELL)")

    # sanity: same result
    y1 = np.asarray(eop.matvec(x))
    y2 = np.asarray(fop.matvec(x))
    y3 = np.asarray(cop.matvec(xf))
    err = np.abs(y1 - y2).max() / max(np.abs(y2).max(), 1e-30)
    errc = np.abs(y3 - y2).max() / max(np.abs(y2).max(), 1e-30)
    print(f"ELL vs femop rel err: {err:.2e}; cluster: {errc:.2e}")


if __name__ == "__main__":
    main()
