"""Pallas segment-sum assembly vs XLA scatter at 1M-dof tet (TPU).

Run: python -u scripts/bench_segsum.py [n]
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
    from frontistr_tpu.assembly.segsum_pallas import make_segsum, V_PAD

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    cache = f"/tmp/ellprof_tet_{n}.npz"
    mesh = box_tet4(n, n, n)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    E = conn.shape[0]
    print(f"tet {E} elems, {n_node*3/1e6:.2f}M dof", flush=True)
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
    table = get_table(341)
    D1_32 = jnp.asarray(elastic_D(210e3, 0.3, D3), jnp.float32)
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

    ke = assemble_kes(coords32, conn_j, D1_32)
    prof_d = prof.device()

    # XLA baseline
    t0 = time.perf_counter()
    blocks = ell._assemble_jit(prof_d, (ke,), (4,))
    sync(blocks)
    t0 = time.perf_counter()
    blocks = ell._assemble_jit(prof_d, (ke,), (4,))
    sync(blocks)
    t_xla = time.perf_counter() - t0
    print(f"XLA scatter assembly : {t_xla*1e3:8.1f} ms", flush=True)

    # pallas path
    t0 = time.perf_counter()
    run, aux = make_segsum(prof.seg_sorted, prof.n_slots)
    print(f"segsum host setup    : {time.perf_counter()-t0:8.1f} s  "
          f"(nc={aux['nc']}, cmax={aux['cmax']}, R={aux['R']})",
          flush=True)
    # fuse perm into ent_map: padded chunk row -> RAW pair entry
    ent_map = np.asarray(aux["ent_map"])
    P = prof.perm.size
    full_map = np.where(ent_map < P, prof.perm[np.minimum(ent_map,
                                                          P - 1)], P)
    full_map_j = jnp.asarray(full_map.astype(np.int32))
    seg_pad, slot_src = aux["seg_pad"], aux["slot_src"]

    @jax.jit
    def assemble_pallas(ke, fm):
        Ee = ke.shape[0]
        kr = ke.reshape(Ee, 4, 3, 4, 3)
        # plane-major: (d1,d2) planes x (a,b,e) entry columns
        entp = jnp.transpose(kr, (2, 4, 1, 3, 0)).reshape(9, 16 * Ee)
        entp = jnp.pad(entp, ((0, V_PAD - 9), (0, 1)))  # P+1 pad col
        entT_sorted = entp[:, fm]
        raw = run(entT_sorted, seg_pad, slot_src)       # (V_PAD, S)
        return raw[:9].T.reshape(n_node, prof.W, 3, 3)

    b2 = assemble_pallas(ke, full_map_j)
    sync(b2)
    t0 = time.perf_counter()
    b2 = assemble_pallas(ke, full_map_j)
    sync(b2)
    t_pal = time.perf_counter() - t0
    err = float(jnp.abs(b2 - blocks).max()) / max(
        float(jnp.abs(blocks).max()), 1e-30)
    print(f"pallas assembly      : {t_pal*1e3:8.1f} ms  "
          f"({t_xla/t_pal:.1f}x, rel err {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
