"""SpMV experiment round 2: decompose the matvec cost, cluster-ELL format,
and fast assembly formulations.  1M-dof tet mesh on TPU.

Run: python -u scripts/bench_spmv_variants2.py [n] [stages]
  stages: comma list from {mv, cluster, asm}; default all.
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from frontistr_tpu.meshgen import box_tet4
    from frontistr_tpu.elements.tables import get_table
    from frontistr_tpu.fem import solid
    from frontistr_tpu.fem.material import elastic_D, D3
    from frontistr_tpu.assembly import ell

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    stages = set((sys.argv[2] if len(sys.argv) > 2
                  else "mv,cluster,asm").split(","))
    cache = f"/tmp/ellprof_tet_{n}.npz"
    mesh = box_tet4(n, n, n)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    E = conn.shape[0]
    print(f"tet {E} elems, {n_node} nodes, {n_node*3/1e6:.2f}M dof",
          flush=True)
    if os.path.exists(cache):
        z = np.load(cache)
        prof = ell.ELLProfile(
            n_node=n_node, ndof=3, W=int(z["W"]), cols=z["cols"],
            diag_slot=z["diag"], perm=z["perm"], seg_sorted=z["seg"],
            pair_counts=(E * 16,))
    else:
        prof = ell.build_profile([conn], n_node, 3)
        np.savez(cache, W=prof.W, cols=prof.cols, diag=prof.diag_slot,
                 perm=prof.perm, seg=prof.seg_sorted)
    W = prof.W

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
    blocks = ell._assemble_jit(prof_d, (ke,), (4,))
    cols_j = jnp.asarray(prof.cols)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_node, 3)), jnp.float32)
    y_ref = None

    def loop20(fn):
        @jax.jit
        def go(a, b, x):
            def body(i, v):
                return fn(a, b, v) / 27.0
            return jax.lax.fori_loop(0, 20, body, x)
        return go

    if "mv" in stages:
        def m_gather(blocks, cols, x):
            return x[cols].sum(axis=1)
        t, _ = timeit(loop20(m_gather), blocks, cols_j, x, reps=1)
        print(f"m1 gather only          : {t/20*1e3:8.2f} ms", flush=True)

        blocksP = jnp.transpose(blocks, (2, 3, 1, 0))   # (3, 3, W, N)

        def m_full_T(blocksP, cols, x):          # x (N,3)
            xg = x[cols]                         # (N, W, 3)
            xgP = jnp.transpose(xg, (2, 1, 0))
            return jnp.einsum("ijwn,jwn->in", blocksP, xgP,
                              precision=jax.lax.Precision.HIGHEST).T

        t, _ = timeit(loop20(m_full_T), blocksP, cols_j, x, reps=1)
        print(f"m4 gather+T+planes      : {t/20*1e3:8.2f} ms", flush=True)

        colsT = jnp.asarray(prof.cols.T.copy())          # (W, N)

        def m_scalar3(blocksP, colsT, x):        # x (3, N) dof-major
            xg = jnp.stack([x[j][colsT] for j in range(3)])   # (3, W, N)
            return jnp.einsum("ijwn,jwn->in", blocksP, xg,
                              precision=jax.lax.Precision.HIGHEST)

        xT = jnp.transpose(x)

        @jax.jit
        def go5(blocksP, colsT, xT):
            def body(i, v):
                return m_scalar3(blocksP, colsT, v) / 27.0
            return jax.lax.fori_loop(0, 20, body, xT)
        t, _ = timeit(lambda a, b, c: go5(a, b, c), blocksP, colsT, xT,
                      reps=1)
        print(f"m5 3x scalar-gather     : {t/20*1e3:8.2f} ms", flush=True)

    if "cluster" in stages:
        for G in (8, 16):
            C = (n_node + G - 1) // G
            cl_of = np.minimum(np.arange(n_node) // G, C - 1)
            key = (np.repeat(cl_of, W).astype(np.int64) * C +
                   cl_of[prof.cols.reshape(-1)])
            uk = np.unique(key)
            ur = uk // C
            uc = (uk % C).astype(np.int32)
            cnt = np.bincount(ur, minlength=C)
            Wc = int(cnt.max())
            mem = C * Wc * (3 * G) ** 2 * 4
            print(f"   cluster G={G}: C={C}, Wc={Wc}, "
                  f"fill={len(uk)/(C*Wc):.2f}, mem={mem/1e9:.2f} GB",
                  flush=True)
            if mem > 5e9:
                print("   (skip: too much HBM)", flush=True)
                continue
            ccols = np.repeat(np.arange(C, dtype=np.int32)[:, None], Wc,
                              1)
            st = np.zeros(C + 1, np.int64)
            np.cumsum(cnt, out=st[1:])
            within = np.arange(len(uk)) - st[ur]
            ccols[ur, within] = uc
            # synthetic cluster blocks, generated ON DEVICE (timing only)
            Bc = jax.random.normal(
                jax.random.PRNGKey(1), (3 * G, 3 * G, Wc, C),
                jnp.float32) / (3 * G)
            ccols_j = jnp.asarray(ccols)
            xc = jnp.asarray(
                rng.standard_normal((C, G * 3)).astype(np.float32))

            def m_cluster(Bc, ccols, xc):
                xg = xc[ccols]                   # (C, Wc, G*3) row gather
                xgP = jnp.transpose(xg, (2, 1, 0))
                return jnp.einsum("abwc,bwc->ac", Bc, xgP,
                                  precision=jax.lax.Precision.HIGHEST).T

            @jax.jit
            def goc(Bc, ccols, xc):
                def body(i, v):
                    return m_cluster(Bc, ccols, v) / (3 * G * 27.0)
                return jax.lax.fori_loop(0, 20, body, xc)
            t, _ = timeit(lambda a, b, c: goc(a, b, c), Bc, ccols_j, xc,
                          reps=1)
            print(f"m6 cluster-ELL G={G:<3}    : {t/20*1e3:8.2f} ms",
                  flush=True)
            del Bc

    if "asm" in stages:
        S = prof.n_slots
        slot_raw = np.empty_like(prof.seg_sorted)
        slot_raw[prof.perm] = prof.seg_sorted
        slot_raw_j = jnp.asarray(slot_raw)

        @jax.jit
        def asm_rows_unsorted(slot_raw, ke):
            Ee = ke.shape[0]
            kr = ke.reshape(Ee, 4, 3, 4, 3)
            ent = jnp.transpose(kr, (1, 3, 0, 2, 4)).reshape(16 * Ee, 9)
            out = jax.ops.segment_sum(ent, slot_raw, num_segments=S)
            return out.reshape(n_node, W, 3, 3)

        t, b4 = timeit(asm_rows_unsorted, slot_raw_j, ke)
        print(f"a4 asm rows unsorted    : {t*1e3:8.1f} ms  "
              f"err {float(jnp.abs(b4-blocks).max()):.2e}", flush=True)

        # a5: K-padded slot gather
        seg = prof.seg_sorted.astype(np.int64)
        first = np.r_[True, seg[1:] != seg[:-1]]
        segstart_idx = np.where(first)[0]
        seg_of = np.cumsum(first) - 1
        kpos = np.arange(len(seg)) - segstart_idx[seg_of]
        Kmax = int(kpos.max()) + 1
        cnts = np.bincount(kpos, minlength=Kmax)
        print(f"   Kmax={Kmax}, cov K<=4: {cnts[:4].sum()/len(seg):.2f}, "
              f"K<=8: {cnts[:8].sum()/len(seg):.2f}", flush=True)
        P = len(seg)
        order = np.argsort(kpos * np.int64(S) + seg, kind="stable")
        # Gk[k, slot] = sorted-entry index with that (k, slot), else P
        Gk = np.full((Kmax, S), P, np.int64)
        Gk[kpos[order], seg[order]] = order
        Gk_j = jnp.asarray(Gk.astype(np.int32))
        perm_j2 = jnp.asarray(prof.perm)

        @jax.jit
        def asm_kpad(Gk, perm, ke):
            Ee = ke.shape[0]
            kr = ke.reshape(Ee, 4, 3, 4, 3)
            ent = jnp.transpose(kr, (1, 3, 0, 2, 4)).reshape(16 * Ee, 9)
            ent_s = ent[perm]
            ent_pad = jnp.concatenate(
                [ent_s, jnp.zeros((1, 9), ent.dtype)])
            out = jnp.zeros((S, 9), ent.dtype)
            for k in range(Gk.shape[0]):
                out = out + ent_pad[Gk[k]]
            return out.reshape(n_node, W, 3, 3)

        if Kmax <= 40:
            t, b5 = timeit(asm_kpad, Gk_j, perm_j2, ke)
            print(f"a5 asm K-padded gather  : {t*1e3:8.1f} ms  "
                  f"err {float(jnp.abs(b5-blocks).max()):.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
