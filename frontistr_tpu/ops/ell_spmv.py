"""Pallas block-ELL SpMV kernel: windowed in-VMEM gather matvec.

XLA gathers on TPU are latency-bound (~5 ns/index), which caps the XLA
block-ELL matvec at ~28 ms for 1M dof.  This kernel removes the HBM gather:

  host plan (once per mesh):
    - RCM-reorder nodes (scipy reverse_cuthill_mckee) so each 1024-node
      row tile reads x only from a bounded window (~11k nodes at 1M dof)
    - per tile: window offset; per (tile, slot): the source-row range
      [rlo, rhi) its columns span, plus window-relative (row, lane) indices
  kernel (grid over row tiles):
    - DMA the x window (nd planes x WINR x 128) HBM -> VMEM
    - per slot w: materialize xg[s,l] = x[cols[s,l]] by looping the
      (small) source-row range: broadcast window row r, lane-shuffle it
      with tpu.dynamic_gather (axis=1, single-vreg -> supported), select
      where iq == r.  Then y += blocks[w] * xg (VPU FMAs).

This is the TPU answer to the reference's OpenMP block-CSR matvec
(hecmw1/src/solver/las/hecmw_solver_las_33.f90:135-351): instead of
row-pointer loops + scalar indexing, a dense streaming kernel whose only
irregular op is an in-register lane shuffle.

All vectors inside the CG loop live in "kernel layout": (nd, NR, 128)
f32 planes over RCM-ordered padded nodes; converting in/out costs two
transposes per solve, not per matvec.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


TILE = 1024          # nodes per row tile (8 sublanes x 128 lanes)


@dataclasses.dataclass
class SpmvPlan:
    """Host-built static plan for the windowed SpMV kernel."""
    perm: np.ndarray        # (N,) original -> position: rcm order nodes
    iperm: np.ndarray       # (N,) inverse
    win_off: np.ndarray     # (T,) int32, window start in 128-row units
    rlo: np.ndarray         # (T, W) int32 first source row per slot
    rhi: np.ndarray         # (T, W) int32 one-past-last source row
    iq: np.ndarray          # (T, W, 8, 128) int32 window row of each col
    ip: np.ndarray          # (T, W, 8, 128) int32 lane of each col
    winr: int               # static window height (128-node rows)
    T: int
    W: int
    nd: int
    n_node: int             # original node count
    npad: int               # T * TILE

    @property
    def nr(self) -> int:
        return self.npad // 128


def rcm_order(cols: np.ndarray, n_node: int) -> np.ndarray:
    """Reverse Cuthill-McKee over the padded ELL column graph."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    W = cols.shape[1]
    rows = np.repeat(np.arange(n_node), W)
    A = csr_matrix((np.ones(n_node * W, np.int8),
                    (rows, cols.reshape(-1))), shape=(n_node, n_node))
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))


def build_plan(cols_rcm: np.ndarray, nd: int, perm: np.ndarray,
               max_winr: int = 448) -> Optional[SpmvPlan]:
    """Plan from RCM-ordered ELL columns.  Returns None when any tile's
    window exceeds max_winr*128 nodes (kernel would not fit VMEM) —
    callers fall back to the XLA matvec."""
    n_node, W = cols_rcm.shape
    T = (n_node + TILE - 1) // TILE
    npad = T * TILE
    cols_pad = np.repeat(np.arange(npad, dtype=np.int64)[:, None], W,
                         axis=1)
    cols_pad[:n_node] = cols_rcm
    ctile = cols_pad.reshape(T, TILE, W)
    lo = ctile.min(axis=1).min(axis=1)          # (T,)
    hi = ctile.max(axis=1).max(axis=1)
    win_off = (lo // 128).astype(np.int64)
    winr_needed = (hi // 128 - win_off + 1).astype(np.int64)
    winr = int(winr_needed.max())
    winr = -(-winr // 8) * 8                    # sublane-align
    if winr > max_winr:
        return None
    # clamp window starts so every window fits inside the padded x
    nr = npad // 128
    win_off = np.minimum(win_off, max(nr - winr, 0))
    q = ctile - (win_off[:, None, None] * 128)  # window-relative col
    iq = (q // 128).astype(np.int32)            # (T, TILE, W)
    ip = (q % 128).astype(np.int32)
    rlo = iq.min(axis=1).astype(np.int32)       # (T, W)
    rhi = (iq.max(axis=1) + 1).astype(np.int32)
    # (T, TILE, W) -> (T, W, 8, 128)
    iq = np.transpose(iq.reshape(T, 8, 128, W), (0, 3, 1, 2)).copy()
    ip = np.transpose(ip.reshape(T, 8, 128, W), (0, 3, 1, 2)).copy()
    inv = np.empty(n_node, np.int64)
    inv[perm] = np.arange(n_node)
    return SpmvPlan(perm=perm, iperm=inv, win_off=win_off.astype(np.int32),
                    rlo=rlo, rhi=rhi, iq=iq, ip=ip, winr=winr, T=T, W=W,
                    nd=nd, n_node=n_node, npad=npad)


# --------------------------------------------------------------------------
# layout conversions (device)
# --------------------------------------------------------------------------

def to_kernel(plan: SpmvPlan, x_flat: jnp.ndarray) -> jnp.ndarray:
    """(N*nd,) node-major (RCM order) -> (nd, NR, 128) planes."""
    nd = plan.nd
    xn = x_flat.reshape(plan.n_node, nd)
    xp = jnp.pad(xn, ((0, plan.npad - plan.n_node), (0, 0)))
    return jnp.transpose(xp, (1, 0)).reshape(nd, plan.nr, 128)


def from_kernel(plan: SpmvPlan, xk: jnp.ndarray) -> jnp.ndarray:
    nd = plan.nd
    xp = jnp.transpose(xk.reshape(nd, plan.npad), (1, 0))
    return xp[:plan.n_node].reshape(-1)


def blocks_to_kernel(plan: SpmvPlan, blocks: jnp.ndarray) -> jnp.ndarray:
    """(N, W, nd, nd) -> (T, W, nd*nd, 8, 128) f32."""
    nd, W = plan.nd, plan.W
    b = blocks.reshape(plan.n_node, W, nd * nd)
    b = jnp.pad(b, ((0, plan.npad - plan.n_node), (0, 0), (0, 0)))
    b = b.reshape(plan.T, 8, 128, W, nd * nd)
    return jnp.transpose(b, (0, 3, 4, 1, 2)).astype(jnp.float32)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _spmv(statics, win_off, rlo, rhi, xk, iq, ip, kb):
    T, W, nd, winr, nr = statics
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(off_ref, rlo_ref, rhi_ref, x_hbm, iq_ref, ip_ref, kb_ref,
               o_ref, xw, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(off_ref[t], winr), :], xw, sem)
        dma.start()
        dma.wait()
        accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(nd)]
        for w in range(W):
            iqw = iq_ref[0, w]
            ipw = ip_ref[0, w]

            def row_body(r, xg):
                mask = iqw == r
                out = []
                for d in range(nd):
                    bc = jnp.broadcast_to(xw[d, pl.ds(r, 1), :], (8, 128))
                    g = jnp.take_along_axis(bc, ipw, axis=1)
                    out.append(jnp.where(mask, g, xg[d]))
                return tuple(out)

            xg = jax.lax.fori_loop(
                rlo_ref[t, w], rhi_ref[t, w], row_body,
                tuple(jnp.zeros((8, 128), jnp.float32)
                      for _ in range(nd)))
            for do in range(nd):
                a = accs[do]
                for di in range(nd):
                    a = a + kb_ref[0, w, do * nd + di] * xg[di]
                accs[do] = a
        for d in range(nd):
            o_ref[0, d] = accs[d]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),               # x (HBM)
            pl.BlockSpec((1, W, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # iq
            pl.BlockSpec((1, W, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # ip
            pl.BlockSpec((1, W, nd * nd, 8, 128),
                         lambda t, *_: (t, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # blocks
        ],
        out_specs=pl.BlockSpec((1, nd, 8, 128),
                               lambda t, *_: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nd, winr, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    # the kernel is pure f32/int32; disable_x64 keeps take_along_axis
    # from promoting indices to (unsupported) int64 under jax x64 mode
    with jax.enable_x64(False):
        yk = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, nd, 8, 128), jnp.float32),
            grid_spec=grid_spec,
        )(win_off, rlo, rhi, xk, iq, ip, kb)
    # (T, nd, 8, 128) -> (nd, NR, 128)
    return jnp.transpose(yk, (1, 0, 2, 3)).reshape(nd, nr, 128)


class PallasELL:
    """Constrained SpMV in kernel layout, built from an RCM-ordered
    ELLOperator + plan.  API mirrors ELLOperator but all vectors are
    (nd, NR, 128) f32 planes."""

    def __init__(self, plan: SpmvPlan, blocks: jnp.ndarray,
                 diag_blocks: jnp.ndarray, free_mask: jnp.ndarray):
        self.plan = plan
        self.kb = blocks_to_kernel(plan, blocks)
        self.iq = jnp.asarray(plan.iq)
        self.ip = jnp.asarray(plan.ip)
        self.win_off = jnp.asarray(plan.win_off)
        self.rlo = jnp.asarray(plan.rlo)
        self.rhi = jnp.asarray(plan.rhi)
        nd = plan.nd
        self.free_k = to_kernel(plan, free_mask.astype(jnp.float32))
        # nodal block-jacobi in kernel layout: (nd, nd, NR, 128)
        fm = free_mask.reshape(plan.n_node, nd).astype(diag_blocks.dtype)
        D = diag_blocks * (fm[:, :, None] * fm[:, None, :])
        dd = D[:, jnp.arange(nd), jnp.arange(nd)]
        D = D.at[:, jnp.arange(nd), jnp.arange(nd)].add(
            jnp.where(dd == 0.0, 1.0, 0.0))
        if nd == 1:
            Dinv = 1.0 / D
        elif nd in (2, 3):
            from frontistr_tpu.fem.isoparam import det_inv_small
            _, Dinv = det_inv_small(D)
        else:
            from frontistr_tpu.utils.linalg import gauss_jordan_inv
            Dinv = gauss_jordan_inv(D)
        Dp = jnp.pad(Dinv.astype(jnp.float32),
                     ((0, plan.npad - plan.n_node), (0, 0), (0, 0)))
        self.Dinv_k = jnp.transpose(Dp, (1, 2, 0)).reshape(
            nd, nd, plan.nr, 128)

    @property
    def statics(self):
        p = self.plan
        return (p.T, p.W, p.nd, p.winr, p.nr)

    def matvec(self, xk: jnp.ndarray) -> jnp.ndarray:
        return _spmv(self.statics, self.win_off, self.rlo, self.rhi,
                     xk, self.iq, self.ip, self.kb)

    def apply_constrained(self, xk: jnp.ndarray) -> jnp.ndarray:
        xm = xk * self.free_k
        y = self.matvec(xm)
        return y * self.free_k + xk * (1.0 - self.free_k)

    def block_jacobi(self) -> Callable:
        Dinv = self.Dinv_k

        def apply(rk):
            return jnp.einsum("ijnl,jnl->inl", Dinv, rk)

        return apply
