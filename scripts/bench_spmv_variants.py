"""SpMV + assembly formulation shootout at 1M-dof tet (TPU).

Finds the fastest XLA formulation of the block-ELL matvec gather and the
ELL assembly segment-sum.  Profile arrays are cached to /tmp so repeated
runs skip the ~60 s host symbolic assembly.

Run: python scripts/bench_spmv_variants.py [n]
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_tet4
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.assembly import ell

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    cache = f"/tmp/ellprof_tet_{n}.npz"
    mesh = box_tet4(n, n, n)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    E = conn.shape[0]
    print(f"tet {E} elems, {n_node} nodes, {n_node*3/1e6:.2f}M dof")
    if os.path.exists(cache):
        z = np.load(cache)
        prof = ell.ELLProfile(
            n_node=n_node, ndof=3, W=int(z["W"]), cols=z["cols"],
            diag_slot=z["diag"], perm=z["perm"], seg_sorted=z["seg"],
            pair_counts=(E * 16,))
    else:
        t0 = time.perf_counter()
        prof = ell.build_profile([conn], n_node, 3)
        print(f"profile host build: {time.perf_counter()-t0:.1f} s")
        np.savez(cache, W=prof.W, cols=prof.cols, diag=prof.diag_slot,
                 perm=prof.perm, seg=prof.seg_sorted)
    W = prof.W
    print(f"W={W}, slots={prof.n_slots/1e6:.2f}M, P={prof.perm.size/1e6:.1f}M")

    table = get_table(341)
    D1 = elastic_D(210e3, 0.3, D3)
    D1_32 = jnp.asarray(D1, jnp.float32)
    coords32 = jnp.asarray(mesh.coords, jnp.float32)
    conn_j = jnp.asarray(conn)

    import dataclasses as dc

    def t32(t):
        return dc.replace(t, dN=t.dN.astype(np.float32),
                          N=t.N.astype(np.float32),
                          weights=t.weights.astype(np.float32))

    @jax.jit
    def assemble_kes(c, cj, D1d):
        De = jnp.broadcast_to(D1d, (cj.shape[0], 6, 6))

        def chunk(ce, De_):
            return solid.stiffness_linear(t32(table), ce, De_)
        return solid._chunked(chunk, c[cj], De, chunk=65536)

    _snorm = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def sync(x):
        return float(_snorm(x))

    def timeit(fn, *args, reps=3):
        o = fn(*args)
        sync(o if not isinstance(o, tuple) else o[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        sync(o if not isinstance(o, tuple) else o[0])
        return (time.perf_counter() - t0) / reps, o

    ke = assemble_kes(coords32, conn_j, D1_32)
    prof_d = prof.device()

    # ---------------- assembly variants ----------------
    S = prof.n_slots

    @jax.jit
    def asm_planes(p, ke):          # current: 9 gathers + 9 sorted segsums
        return ell.assemble_blocks(p, [ke], [4])

    @jax.jit
    def asm_rows(p, ke):            # 1 row-gather (P,9) + 1 segsum
        Ee = ke.shape[0]
        kr = ke.reshape(Ee, 4, 3, 4, 3)
        ent = jnp.transpose(kr, (1, 3, 0, 2, 4)).reshape(16 * Ee, 9)
        ent_s = ent[p.perm]
        out = jax.ops.segment_sum(ent_s, p.seg_sorted, num_segments=S,
                                  indices_are_sorted=True)
        return out.reshape(n_node, W, 3, 3)

    # unsorted scatter-add, no gather: seg ids in RAW pair order
    slot_raw = np.empty_like(prof.seg_sorted)
    slot_raw[prof.perm] = prof.seg_sorted
    slot_raw_j = jnp.asarray(slot_raw)

    @jax.jit
    def asm_unsorted(slot_raw, ke):
        Ee = ke.shape[0]
        kr = ke.reshape(Ee, 4, 3, 4, 3)
        planes = jnp.transpose(kr, (2, 4, 1, 3, 0)).reshape(9, 16 * Ee)
        outs = [jax.ops.segment_sum(planes[i], slot_raw, num_segments=S)
                for i in range(9)]
        return jnp.stack(outs, 1).reshape(n_node, W, 3, 3)

    t, blocks = timeit(asm_planes, prof_d, ke)
    print(f"assembly planes+sorted : {t*1e3:8.1f} ms")
    t, b2 = timeit(asm_rows, prof_d, ke)
    print(f"assembly rows+sorted   : {t*1e3:8.1f} ms  "
          f"err {float(jnp.abs(b2-blocks).max()):.2e}")
    t, b3 = timeit(asm_unsorted, slot_raw_j, ke)
    print(f"assembly unsorted      : {t*1e3:8.1f} ms  "
          f"err {float(jnp.abs(b3-blocks).max()):.2e}")

    # ---------------- matvec variants ----------------
    cols_j = jnp.asarray(prof.cols)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_node, 3)), jnp.float32)

    def loop20(fn):
        @jax.jit
        def go(blocks, cols, x):
            def body(i, v):
                return fn(blocks, cols, v) / 27.0
            return jax.lax.fori_loop(0, 20, body, x)
        return go

    def mv_rowgather(blocks, cols, x):        # current
        xg = x[cols]                          # (N, W, 3)
        return jnp.einsum("nwij,nwj->ni", blocks, xg,
                          precision=jax.lax.Precision.HIGHEST)

    def mv_wloop(blocks, cols, x):            # W separate row gathers
        y = jnp.zeros_like(x)
        for w in range(W):
            y = y + jnp.einsum("nij,nj->ni", blocks[:, w], x[cols[:, w]],
                               precision=jax.lax.Precision.HIGHEST)
        return y

    # dof-major: x (3, N); per-w minor gather
    def mv_dofmajor(blocksT, cols, xT):       # blocksT (W, 3, 3, N)
        y = jnp.zeros_like(xT)
        for w in range(W):
            xgw = xT[:, cols[:, w]]           # (3, N)
            y = y + jnp.einsum("ijn,jn->in", blocksT[w], xgw,
                               precision=jax.lax.Precision.HIGHEST)
        return y

    t, _ = timeit(loop20(mv_rowgather), blocks, cols_j, x, reps=1)
    print(f"matvec row-gather      : {t/20*1e3:8.2f} ms")
    t, _ = timeit(loop20(mv_wloop), blocks, cols_j, x, reps=1)
    print(f"matvec w-loop          : {t/20*1e3:8.2f} ms")

    blocksT = jnp.transpose(blocks, (1, 2, 3, 0))       # (W, 3, 3, N)
    xT = jnp.transpose(x)

    @jax.jit
    def go_dof(blocksT, cols, xT):
        def body(i, v):
            return mv_dofmajor(blocksT, cols, v) / 27.0
        return jax.lax.fori_loop(0, 20, body, xT)
    t, _ = timeit(lambda a, b, c: go_dof(a, b, c), blocksT, cols_j, xT,
                  reps=1)
    print(f"matvec dof-major       : {t/20*1e3:8.2f} ms")

    # flat-index gather: one (N, W*3) gather from x flat
    idx3 = (prof.cols[:, :, None] * 3 +
            np.arange(3)[None, None, :]).reshape(n_node, W * 3)
    idx3_j = jnp.asarray(idx3.astype(np.int32))

    def mv_flat(blocks, idx3, x):
        xg = x.reshape(-1)[idx3].reshape(n_node, W, 3)
        return jnp.einsum("nwij,nwj->ni", blocks, xg,
                          precision=jax.lax.Precision.HIGHEST)

    t, _ = timeit(loop20(mv_flat), blocks, idx3_j, x, reps=1)
    print(f"matvec flat-idx        : {t/20*1e3:8.2f} ms")

    # padded rows: x padded to (N, 8) so each gathered row is 32B
    def mv_pad8(blocks, cols, x):
        x8 = jnp.pad(x, ((0, 0), (0, 5)))
        xg = x8[cols][:, :, :3]
        return jnp.einsum("nwij,nwj->ni", blocks, xg,
                          precision=jax.lax.Precision.HIGHEST)

    t, _ = timeit(loop20(mv_pad8), blocks, cols_j, x, reps=1)
    print(f"matvec pad8-rows       : {t/20*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
