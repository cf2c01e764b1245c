"""Microbenchmark: gather / SpMV layout candidates on the real TPU.

Measures the candidate block-ELL matvec formulations to pick the fast
unstructured operator (VERDICT item 2).  Mirrors the reference hot loop
hecmw1/src/solver/las/hecmw_solver_las_33.f90:135-351 (block CSR matvec).

Run: python scripts/microbench_gather.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 333_000          # nodes (~1M dof at nd=3)
    W = 27               # ELL width (hex box graph)
    nd = 3
    rng = np.random.default_rng(0)
    # banded-ish cols to mimic an RCM-ordered mesh (band ~ N^(2/3))
    band = 6000
    base = np.arange(N)[:, None]
    off = rng.integers(-band, band, size=(N, W))
    cols = np.clip(base + off, 0, N - 1).astype(np.int32)
    cols.sort(axis=1)

    X = rng.standard_normal((N, nd)).astype(np.float32)
    X8 = np.zeros((N, 8), np.float32)
    X8[:, :nd] = X
    blocks = rng.standard_normal((N, W, nd, nd)).astype(np.float32)
    blocks8 = np.zeros((N, W, 8, 8), np.float32)
    blocks8[:, :, :nd, :nd] = blocks

    cols_j = jnp.asarray(cols)
    X_j = jnp.asarray(X)
    X8_j = jnp.asarray(X8)
    B_j = jnp.asarray(blocks)
    B8_j = jnp.asarray(blocks8)
    flat_j = jnp.asarray(X.reshape(-1))
    # scalar-index variant (round-1 incidence style)
    idx_scal = (cols[:, :, None].astype(np.int64) * nd +
                np.arange(nd)[None, None, :]).astype(np.int32)
    idx_scal_j = jnp.asarray(idx_scal)

    _snorm = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def sync(x):
        return float(_snorm(x))

    def bench(name, fn, *args, iters=20, bytes_moved=None):
        f = jax.jit(fn)
        sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        gbs = (bytes_moved / dt / 1e9) if bytes_moved else 0.0
        print(f"{name:42s} {dt*1e3:9.3f} ms   {gbs:8.1f} GB/s")
        return dt

    def loop20(body):
        def fn(*args):
            def step(i, acc):
                return acc + body(*args, i)
            return jax.lax.fori_loop(0, 5, step, jnp.zeros(()))
        return fn

    print(f"N={N} W={W} nd={nd}  ({N*nd/1e6:.2f}M dof)")
    print("-" * 70)

    # 1. scalar flat gather (round-1 style): flat[(N,W,3)]
    bench("1 scalar flat gather (N,W,3) idx",
          lambda f, i: f[i].sum(axis=1).sum(),
          flat_j, idx_scal_j, bytes_moved=N * W * nd * 4)

    # 2. row gather (N,3) rows
    bench("2 row gather X(N,3)[cols]",
          lambda x, c: x[c].sum(axis=1).sum(),
          X_j, cols_j, bytes_moved=N * W * nd * 4)

    # 3. row gather padded to 8 lanes
    bench("3 row gather X(N,8)[cols]",
          lambda x, c: x[c].sum(axis=1).sum(),
          X8_j, cols_j, bytes_moved=N * W * 8 * 4)

    # 4. jnp.take rows
    bench("4 jnp.take(X(N,8), cols.ravel())",
          lambda x, c: jnp.take(x, c.reshape(-1), axis=0).sum(),
          X8_j, cols_j, bytes_moved=N * W * 8 * 4)

    # 5. full ELL matvec nd=3
    def ell_mv(B, x, c):
        xg = x[c]                                   # (N, W, nd)
        return jnp.einsum("nwij,nwj->ni", B, xg,
                          precision=jax.lax.Precision.HIGHEST)
    bench("5 ELL matvec (N,W,3,3)",
          ell_mv, B_j, X_j, cols_j,
          bytes_moved=(N * W * nd * nd + N * W * nd) * 4)

    # 6. ELL matvec 8-padded blocks (MXU-shaped)
    def ell_mv8(B, x, c):
        xg = x[c]
        return jnp.einsum("nwij,nwj->ni", B, xg,
                          precision=jax.lax.Precision.HIGHEST)
    bench("6 ELL matvec (N,W,8,8) padded",
          ell_mv8, B8_j, X8_j, cols_j,
          bytes_moved=(N * W * 8 * 8 + N * W * 8) * 4)

    # 7. per-slot gather: W separate (N,) gathers, W-major blocks
    BT_j = jnp.asarray(np.ascontiguousarray(blocks.transpose(1, 0, 2, 3)))
    colsT_j = jnp.asarray(np.ascontiguousarray(cols.T))

    def ell_mv_slot(BT, x, cT):
        def body(w, acc):
            xg = x[cT[w]]                           # (N, nd)
            return acc + jnp.einsum("nij,nj->ni", BT[w], xg,
                                    precision=jax.lax.Precision.HIGHEST)
        return jax.lax.fori_loop(0, W, body,
                                 jnp.zeros((N, nd), jnp.float32))
    bench("7 slot-major: W x (N,3) gathers",
          ell_mv_slot, BT_j, X_j, colsT_j,
          bytes_moved=(N * W * nd * nd + N * W * nd) * 4)

    # 8. assembly segment_sum: P sorted block entries -> N*W slots
    P = 20_000_000
    seg = np.sort(rng.integers(0, N * W, size=P)).astype(np.int32)
    vals = rng.standard_normal((P, nd, nd)).astype(np.float32)
    seg_j = jnp.asarray(seg)
    vals_j = jnp.asarray(vals)

    def assemble(v, s):
        return jax.ops.segment_sum(v, s, num_segments=N * W,
                                   indices_are_sorted=True)
    bench("8 segment_sum 20M blocks -> N*W", assemble, vals_j, seg_j,
          iters=5, bytes_moved=P * nd * nd * 4)

    # 9. scatter-add .at[].add equivalent
    def scatter_add(v, s):
        out = jnp.zeros((N * W, nd, nd), jnp.float32)
        return out.at[s].add(v)
    bench("9 scatter .at[].add 20M blocks", scatter_add, vals_j, seg_j,
          iters=5, bytes_moved=P * nd * nd * 4)

    # 10. reference: element-gather matvec (current femop path, hex8)
    E = 321_000
    nn = 8
    conn = rng.integers(0, N, size=(E, nn)).astype(np.int32)
    ke = rng.standard_normal((E, nn * nd, nn * nd)).astype(np.float32)
    inc_idx = rng.integers(0, E * nn, size=(N, 8)).astype(np.int32)
    conn_j2 = jnp.asarray(conn)
    ke_j = jnp.asarray(ke)
    inc_j = jnp.asarray(inc_idx)

    def femop_mv(ke, conn, inc, x):
        xe = x.reshape(N, nd)[conn].reshape(E, nn * nd)
        fe = jnp.einsum("eij,ej->ei", ke, xe,
                        precision=jax.lax.Precision.HIGHEST)
        flat = fe.reshape(E * nn, nd)
        return flat[inc].sum(axis=1)
    bench("10 femop element-gather matvec", femop_mv,
          ke_j, conn_j2, inc_j, jnp.asarray(X.reshape(-1)),
          bytes_moved=E * (nn * nd) ** 2 * 4)


if __name__ == "__main__":
    main()
