"""Mosaic dynamic_gather primitive support + windowed cascade-gather cost.

The Pallas ELL SpMV kernel needs an in-VMEM gather from a window.
tpu.dynamic_gather is restricted to a single source vreg along the gather
dimension (8 sublanes for f32), so a general window gather is a cascade of
per-source-vreg gathers + selects.  This measures that cost.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _snorm = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def sync(x):
        return float(_snorm(x))

    def bench(name, f, *args, iters=50):
        try:
            sync(f(*args))
        except Exception as e:
            msg = str(e)
            key = [ln for ln in msg.splitlines()
                   if "Not implemented" in ln or "error:" in ln.lower()]
            print(f"{name:48s} FAIL: {(key[0] if key else msg[:80])[:100]}")
            return None
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:48s} {dt*1e3:9.4f} ms")
        return dt

    rng = np.random.default_rng(0)

    # ---- G1: sublane gather, source (8, 1024): 1 vreg along axis 0 ----
    def k1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    def mk(shape_x, shape_i, shape_o, kern):
        @jax.jit
        def f(x, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(shape_o, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)
        return f

    x = jnp.asarray(rng.standard_normal((8, 1024)), jnp.float32)
    i8 = jnp.asarray(rng.integers(0, 8, (8, 1024)), jnp.int32)
    bench("G1 taa axis=0 src (8,1024)", mk((8, 1024), (8, 1024),
                                           (8, 1024), k1), x, i8)

    # ---- G2: lane gather axis=1, source (8, 128) -----------------------
    def k2(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x2 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    i2 = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    bench("G2 taa axis=1 src (8,128)", mk((8, 128), (8, 128),
                                          (8, 128), k2), x2, i2)

    # ---- G3: lane gather axis=1, source (8, 512) (4 vregs on lanes) ---
    x3 = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    i3 = jnp.asarray(rng.integers(0, 512, (8, 512)), jnp.int32)
    bench("G3 taa axis=1 src (8,512)", mk((8, 512), (8, 512),
                                          (8, 512), k2), x3, i3)

    # ---- G4: cascade full shuffle: window (WINV*8,128) -> out (8,128)
    # out[s,l] = win[q, p] with flat idx; cascade over WINV source vregs,
    # each: sublane-gather by (idx//128 % 8) then select on idx//1024.
    WINV = 8          # window = WINV*1024 floats

    def k4(w_ref, iq_ref, ip_ref, o_ref):
        # iq: idx // 128 (source row), ip: idx % 128 (source lane)
        acc = jnp.zeros((8, 128), jnp.float32)
        for v in range(WINV):
            src = w_ref[v * 8:(v + 1) * 8, :]          # (8,128) vreg
            g = jnp.take_along_axis(src, iq_ref[:] % 8, axis=0)
            # lane align: gather along lanes by ip
            g = jnp.take_along_axis(g, ip_ref[:], axis=1)
            acc = jnp.where((iq_ref[:] // 8) == v, g, acc)
        o_ref[:] = acc

    @jax.jit
    def f4(w, iq, ip):
        return pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, iq, ip)

    w = jnp.asarray(rng.standard_normal((WINV * 8, 128)), jnp.float32)
    flat = rng.integers(0, WINV * 1024, (8, 128))
    iq = jnp.asarray(flat // 128, jnp.int32)
    ip = jnp.asarray(flat % 128, jnp.int32)
    bench("G4 cascade shuffle win=8K out (8,128)", f4, w, iq, ip)

    # ---- G5: cascade at scale: grid of tiles, window 8K, out (256,128)
    # per grid step = 32 output vregs from one shared window
    TO = 256          # output rows per tile

    def k5(w_ref, iq_ref, ip_ref, o_ref):
        iq = iq_ref[:]
        ip = ip_ref[:]
        acc = jnp.zeros((TO, 128), jnp.float32)
        for v in range(WINV):
            src = w_ref[v * 8:(v + 1) * 8, :]
            # broadcast source vreg across all TO rows via modular taa
            g = jnp.take_along_axis(
                jnp.tile(src, (TO // 8, 1)), iq % 8, axis=0)
            g = jnp.take_along_axis(g, ip, axis=1)
            acc = jnp.where((iq // 8) == v, g, acc)
        o_ref[:] = acc

    NT = 64

    @jax.jit
    def f5(w, iq, ip):
        return pl.pallas_call(
            k5,
            out_shape=jax.ShapeDtypeStruct((NT * TO, 128), jnp.float32),
            grid=(NT,),
            in_specs=[pl.BlockSpec((WINV * 8, 128), lambda t: (t % 4, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TO, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TO, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TO, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
        )(w, iq, ip)

    wb = jnp.asarray(rng.standard_normal((4 * WINV * 8, 128)), jnp.float32)
    flatb = rng.integers(0, WINV * 1024, (NT * TO, 128))
    iqb = jnp.asarray(flatb // 128, jnp.int32)
    ipb = jnp.asarray(flatb % 128, jnp.int32)
    dt = bench("G5 cascade tiles 64x(256,128) win 8K", f5, wb, iqb, ipb,
               iters=20)
    if dt:
        vals = NT * TO * 128
        print(f"   -> {vals/dt/1e9:.2f} G gathered f32/s "
              f"(SpMV needs ~32M: {32e6*dt/vals*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
