"""Aggregation AMG preconditioner (TPU-native, fully batched).

The reference reaches low CG iteration counts with sequential SSOR/BILU
sweeps (hecmw1/src/solver/precond/33/hecmw_precond_SSOR_33.f90:55-174) or
Trilinos-ML smoothed aggregation (hecmw_ML_wrapper_33.c:260).  Neither
maps to a TPU.  This module is the TPU equivalent: an unsmoothed-
aggregation multigrid V-cycle with Chebyshev smoothers — every operation
is a dense batched einsum, reshape, or (sorted) segment_sum:

  level 0: the global block-ELL operator (N nodes x nd dofs)
  level 1: fixed-size aggregates of S0 consecutive nodes (nodes are
           RCM/band ordered, so consecutive chunks are spatially local);
           per-aggregate rigid-body-mode tentative prolongator
           (nd=3 -> 6 modes, nd=2 -> 3, nd=1 -> 1), orthonormalized
  level 2: piecewise-constant aggregation of S1 coarse nodes; the
           coarsest operator is densified and explicitly inverted (f32)

Galerkin products P^T A P are computed on device from the ELL blocks with
host-precomputed sorted segment maps (same machinery as assembly/ell.py).
The V-cycle is symmetric (pre+post Chebyshev with fixed coefficients), so
it is a valid SPD preconditioner for CG.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _n_modes(nd: int) -> int:
    return {1: 1, 2: 3, 3: 6}.get(nd, 0)


@dataclasses.dataclass
class AMGMaps:
    """Static aggregation maps (registered pytree).

    Built on host by build_maps; pass ``maps.device()`` THROUGH jit
    boundaries as an argument.  Closed-over concrete arrays (np or
    device) are inlined into the lowered module as dense literals and
    overflow the remote-compile payload at ~1M dof."""
    nd: int
    nv: int                 # modes per aggregate
    S0: int
    S1: int
    n_node: int
    Na: int                 # level-1 aggregates
    Na2: int                # level-2 aggregates
    Wc: int                 # level-1 ELL width
    cols1: np.ndarray       # (Na, Wc) int32
    diag_slot1: np.ndarray  # (Na,) int32
    perm01: np.ndarray      # sorts the N*W fine slots by coarse slot
    seg01: np.ndarray       # (N*W,) sorted coarse slot ids
    perm12: np.ndarray      # sorts Na*Wc slots by dense (a2, b2) id
    seg12: np.ndarray

    def device(self) -> "AMGMaps":
        """Device-resident copy (cached): zero-copy when passed as a jit
        argument, unlike the host np version (re-upload per call)."""
        if not hasattr(self, "_dev"):
            self._dev = AMGMaps(
                nd=self.nd, nv=self.nv, S0=self.S0, S1=self.S1,
                n_node=self.n_node, Na=self.Na, Na2=self.Na2, Wc=self.Wc,
                cols1=jnp.asarray(self.cols1),
                diag_slot1=jnp.asarray(self.diag_slot1),
                perm01=jnp.asarray(self.perm01),
                seg01=jnp.asarray(self.seg01),
                perm12=jnp.asarray(self.perm12),
                seg12=jnp.asarray(self.seg12))
        return self._dev


jax.tree_util.register_dataclass(
    AMGMaps,
    data_fields=["cols1", "diag_slot1", "perm01", "seg01", "perm12",
                 "seg12"],
    meta_fields=["nd", "nv", "S0", "S1", "n_node", "Na", "Na2", "Wc"])


def build_maps(cols: np.ndarray, n_node: int, nd: int,
               S0: int = 24, S1: int = 16) -> Optional[AMGMaps]:
    """Aggregation maps from the fine ELL columns (any node order; chunks
    of consecutive nodes form the aggregates)."""
    nv = _n_modes(nd)
    if nv == 0:
        return None
    N, W = cols.shape
    Na = (n_node + S0 - 1) // S0
    agg = np.minimum(np.arange(N) // S0, Na - 1)
    rows = np.repeat(np.arange(N, dtype=np.int64), W)
    a_r = agg[rows]
    a_c = agg[cols.reshape(-1)]
    key = a_r * Na + a_c
    uniq, inv = np.unique(key, return_inverse=True)
    urow = uniq // Na
    ucol = (uniq % Na).astype(np.int32)
    per_row = np.bincount(urow, minlength=Na)
    Wc = int(per_row.max())
    starts = np.zeros(Na + 1, np.int64)
    np.cumsum(per_row, out=starts[1:])
    within = np.arange(len(uniq)) - starts[urow]
    cols1 = np.repeat(np.arange(Na, dtype=np.int32)[:, None], Wc, axis=1)
    cols1[urow, within] = ucol
    uniq_slot = urow * Wc + within
    slot = uniq_slot[inv]
    perm01 = np.argsort(slot, kind="stable")
    seg01 = slot[perm01].astype(np.int32)
    diag_slot1 = np.zeros(Na, np.int32)
    isd = urow == ucol
    diag_slot1[urow[isd]] = within[isd].astype(np.int32)
    # level 1 -> 2 (dense coarsest)
    Na2 = (Na + S1 - 1) // S1
    agg2 = np.minimum(np.arange(Na) // S1, Na2 - 1)
    r2 = agg2[np.repeat(np.arange(Na), Wc)]
    c2 = agg2[cols1.reshape(-1)]
    did = r2 * Na2 + c2
    perm12 = np.argsort(did, kind="stable")
    seg12 = did[perm12].astype(np.int32)
    return AMGMaps(nd=nd, nv=nv, S0=S0, S1=S1, n_node=n_node, Na=Na,
                   Na2=Na2, Wc=Wc, cols1=cols1, diag_slot1=diag_slot1,
                   perm01=perm01.astype(np.int32), seg01=seg01,
                   perm12=perm12.astype(np.int32), seg12=seg12)


def _rigid_modes(maps: AMGMaps, coords: jnp.ndarray,
                 free_mask: jnp.ndarray,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Per-node mode matrix B (Npad=Na*S0, nd, nv): translations (+ in-plane
    /3D rotations), Dirichlet rows zeroed, orthonormalized per aggregate."""
    nd, nv, S0, Na, N = maps.nd, maps.nv, maps.S0, maps.Na, maps.n_node
    npad = Na * S0
    fm = free_mask.reshape(N, nd).astype(dtype)
    if nd == 1:
        B = fm[:, :, None]                                # (N, 1, 1)
    else:
        c = coords[:, :nd].astype(dtype)                  # (N, nd)
        cp = jnp.pad(c, ((0, npad - N), (0, 0)))
        cent = cp.reshape(Na, S0, nd)
        cnt = jnp.minimum(
            jnp.maximum(N - jnp.arange(Na) * S0, 1), S0).astype(dtype)
        cent = cent.sum(axis=1) / cnt[:, None]            # (Na, nd)
        d = c - cent[jnp.minimum(jnp.arange(N) // S0, Na - 1)]
        eye = jnp.broadcast_to(jnp.eye(nd, dtype=dtype), (N, nd, nd))
        if nd == 2:
            rot = jnp.stack([-d[:, 1], d[:, 0]], axis=1)[:, :, None]
            B = jnp.concatenate([eye, rot], axis=2)       # (N, 2, 3)
        else:
            z = jnp.zeros(N, dtype)
            rx = jnp.stack([z, -d[:, 2], d[:, 1]], axis=1)
            ry = jnp.stack([d[:, 2], z, -d[:, 0]], axis=1)
            rz = jnp.stack([-d[:, 1], d[:, 0], z], axis=1)
            B = jnp.concatenate(
                [eye, rx[:, :, None], ry[:, :, None], rz[:, :, None]],
                axis=2)                                   # (N, 3, 6)
        B = B * fm[:, :, None]
    Bp = jnp.pad(B, ((0, npad - N), (0, 0), (0, 0)))
    Ba = Bp.reshape(Na, S0 * nd, nv)
    G = jnp.einsum("akp,akq->apq", Ba, Ba)
    tr = jnp.trace(G, axis1=1, axis2=2)
    ridge = jnp.where(tr > 0, tr, 1.0) * 1e-7 + \
        jnp.where(tr > 0, 0.0, 1.0)
    G = G + ridge[:, None, None] * jnp.eye(nv, dtype=dtype)
    L = jnp.linalg.cholesky(G)
    from frontistr_tpu.utils.linalg import gauss_jordan_inv
    Linv = gauss_jordan_inv(L)                            # (Na, nv, nv)
    Bo = jnp.einsum("akp,aqp->akq", Ba, Linv)             # B L^-T
    return Bo.reshape(Na, S0, nd, nv)


def _block_inv(D: jnp.ndarray, nd: int) -> jnp.ndarray:
    dd = D[:, jnp.arange(nd), jnp.arange(nd)]
    D = D.at[:, jnp.arange(nd), jnp.arange(nd)].add(
        jnp.where(dd == 0.0, 1.0, 0.0))
    if nd == 1:
        return 1.0 / D
    if nd in (2, 3):
        from frontistr_tpu.fem.isoparam import det_inv_small
        return det_inv_small(D)[1]
    from frontistr_tpu.utils.linalg import gauss_jordan_inv
    return gauss_jordan_inv(D)


def _cheb(A: Callable, Minner: Callable, lmax, degree: int):
    """Fixed-coefficient Chebyshev correction: z ~= A^-1 r on
    [lmax/30, 1.05*lmax] — symmetric polynomial in A, SPD-safe."""
    lmax = 1.05 * lmax
    lmin = lmax / 30.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    def apply(r):
        b = Minner(r)
        d = b / theta
        z = d
        sigma = theta / delta
        rho_old = 1.0 / sigma
        resid = b - Minner(A(z))
        for _ in range(degree - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            d = rho * rho_old * d + (2.0 * rho / delta) * resid
            z = z + d
            resid = resid - Minner(A(d))
            rho_old = rho
        return z

    return apply


def _lmax_jit(A: Callable, Minner: Callable, v0: jnp.ndarray,
              iters: int = 12):
    def body(i, v):
        w = Minner(A(v))
        return (w / jnp.linalg.norm(w)).astype(v.dtype)

    v = jax.lax.fori_loop(0, iters, body, v0 / jnp.linalg.norm(v0))
    return jnp.linalg.norm(Minner(A(v)))


def setup_amg(maps: AMGMaps, blocks: jnp.ndarray, cols: jnp.ndarray,
              coords: jnp.ndarray, free_mask: jnp.ndarray,
              A0: Callable, Dinv0_apply: Callable,
              deg0: int = 2, deg1: int = 4):
    """Build the V-cycle preconditioner.  Traceable (jit-safe): all maps
    are static, all numerics are device ops.

    A0: the constrained fine operator (node-major flat vectors).
    Dinv0_apply: fine block-Jacobi apply.
    blocks: scalar ELL blocks, either a (N, W, nd, nd) array or a tuple
    of nd*nd (N, W) planes (the cluster path's extract_scalar_blocks
    form — the 4-D array is physically 21 GB at 1M dof).
    Returns M(r) for f32 node-major flat vectors.
    """
    nd, nv, Na, Wc, S0, S1, Na2, N = (maps.nd, maps.nv, maps.Na, maps.Wc,
                                      maps.S0, maps.S1, maps.Na2,
                                      maps.n_node)
    is_planes = isinstance(blocks, (list, tuple))
    f32 = (blocks[0] if is_planes else blocks).dtype
    perm01_j, seg01_j = maps.perm01, maps.seg01
    perm12_j, seg12_j = maps.perm12, maps.seg12
    cols1, diag1_j = maps.cols1, maps.diag_slot1
    Bo = _rigid_modes(maps, coords, free_mask, f32)       # (Na,S0,nd,nv)
    Bn = Bo.reshape(Na * S0, nd, nv)[:N]                  # per real node
    # mode-major copy for every per-plane product below: (small..., BIG)
    # so XLA's (8,128) minor tiling never pads a (nd,nv)-minor array
    # 21x (a (N, W, 6, 6) Galerkin intermediate is 21 GB at 1M dof — the
    # allocation that killed the tet bench on the real chip)
    Bpl = jnp.transpose(Bn, (1, 2, 0))                    # (nd, nv, N)
    # Galerkin level-1 blocks, plane-major:
    #   C[n,w,p,q] = sum_ij Bn[n,i,p] A[n,w,i,j] Bn[cols[n,w],j,q]
    # computed as nv*nv (N, W) planes (nd/nv loops unroll; XLA fuses the
    # broadcasts), each plane segment-summed straight into its slot row.
    b_ij = [[blocks[i * nd + j] if is_planes
             else blocks.astype(f32)[:, :, i, j] for j in range(nd)]
            for i in range(nd)]                           # (N, W) each
    # S[j][p] = sum_i Bn[n,i,p] * A[n,w,i,j]
    S_jp = [[sum(Bpl[i, p][:, None] * b_ij[i][j] for i in range(nd))
             for p in range(nv)] for j in range(nd)]
    b1p = []
    for p in range(nv):
        for q in range(nv):
            Cpq = sum(S_jp[j][p] * Bpl[j, q][cols] for j in range(nd))
            b1p.append(jax.ops.segment_sum(
                Cpq.reshape(-1)[perm01_j], seg01_j,
                num_segments=Na * Wc, indices_are_sorted=True))
    blocks1f = jnp.stack(b1p, axis=1)                     # (Na*Wc, nv*nv)
    D1 = blocks1f[jnp.arange(Na) * Wc + diag1_j].reshape(Na, nv, nv)
    tr1 = D1[:, jnp.arange(nv), jnp.arange(nv)].sum(axis=1)
    Dinv1 = _block_inv(D1, nv)

    def A1(x):
        xn = x.reshape(Na, nv)
        xg = [xn[:, q][cols1] for q in range(nv)]         # (Na, Wc) each
        ys = [sum((blocks1f[:, p * nv + q].reshape(Na, Wc) * xg[q])
                  .sum(axis=1) for q in range(nv)) for p in range(nv)]
        return jnp.stack(ys, axis=1).reshape(-1)

    def M1(r):
        return jnp.einsum("apq,aq->ap", Dinv1,
                          r.reshape(Na, nv)).reshape(-1)

    # level 2 (dense coarsest): piecewise-constant over S1 coarse nodes
    npad1 = Na2 * S1
    cnt1 = jnp.minimum(jnp.maximum(Na - jnp.arange(Na2) * S1, 1),
                       S1).astype(f32)
    w1 = 1.0 / jnp.sqrt(cnt1)                             # (Na2,)
    wnode = w1[jnp.minimum(jnp.arange(Na) // S1, Na2 - 1)]
    sblk = (wnode[jnp.repeat(jnp.arange(Na), Wc)] *
            wnode[cols1.reshape(-1)])                     # (Na*Wc,)
    ent2 = (blocks1f * sblk[:, None])[perm12_j]
    dense2 = jax.ops.segment_sum(
        ent2, seg12_j, num_segments=Na2 * Na2,
        indices_are_sorted=True).reshape(Na2, Na2, nv, nv)
    A2 = jnp.transpose(dense2, (0, 2, 1, 3)).reshape(Na2 * nv, Na2 * nv)
    d2 = jnp.diag(A2)
    ridge = jnp.where(tr1.sum() > 0, tr1.sum() / (Na * nv), 1.0) * 1e-6
    A2 = A2 + (ridge + jnp.where(d2 == 0, 1.0, 0.0) * 0.0) * \
        jnp.eye(Na2 * nv, dtype=f32)
    A2 = A2 + jnp.diag(jnp.where(d2 == 0, 1.0, 0.0))
    A2inv = jnp.linalg.inv(A2)

    # transfer operators in the same mode-major layout: (nv, Na, S0*nd)
    # — the (Na, S0, nd, nv) form tile-pads (nd, nv) -> (8, 128), 1.4 GB
    # resident at 1M dof for a 29 MB tensor
    Bt = jnp.transpose(Bo.reshape(Na, S0 * nd, nv), (2, 0, 1))

    def restrict0(d):                                     # (N*nd)->(Na*nv)
        # pad/reshape the FLAT vector: an (N, nd) intermediate tile-pads
        # the minor nd -> 128 (42.7x, 167 MB per buffer at 1M dof — six
        # of them were resident in the r05 tet OOM dump)
        dpa = jnp.pad(d, (0, Na * S0 * nd - N * nd)).reshape(Na, S0 * nd)
        return jnp.stack([(Bt[v] * dpa).sum(axis=1)
                          for v in range(nv)], axis=1).reshape(-1)

    def prolong0(xc):                                     # (Na*nv)->(N*nd)
        xn = xc.reshape(Na, nv)
        y = sum(Bt[v] * xn[:, v][:, None] for v in range(nv))
        return y.reshape(-1)[:N * nd]

    def restrict1(d):                                     # (Na*nv)->(n2)
        dp = jnp.pad(d.reshape(Na, nv), ((0, npad1 - Na), (0, 0)))
        y = dp.reshape(Na2, S1, nv).sum(axis=1) * w1[:, None]
        return y.reshape(-1)

    def prolong1(x2):
        y = jnp.repeat((x2.reshape(Na2, nv) * w1[:, None]), S1,
                       axis=0)[:Na]
        return y.reshape(-1)

    # jax.random (not numpy) so the start vectors are ops, not multi-MB
    # HLO literals, and so this is safe to trace inside a jitted solve
    k0, k1 = jax.random.split(jax.random.PRNGKey(11))
    v0 = jax.random.normal(k0, (N * nd,), f32)
    v1 = jax.random.normal(k1, (Na * nv,), f32)
    v0 = v0.astype(jax.eval_shape(A0, v0).dtype)
    lmax0 = _lmax_jit(A0, Dinv0_apply, v0)
    lmax1 = _lmax_jit(A1, M1, v1)
    cheb0 = _cheb(A0, Dinv0_apply, lmax0, deg0)
    cheb1 = _cheb(A1, M1, lmax1, deg1)
    fm = free_mask.astype(f32)

    def M(r):
        r0 = r * fm
        x0 = cheb0(r0)
        r1 = restrict0(r0 - A0(x0))
        x1 = cheb1(r1)
        r2 = restrict1(r1 - A1(x1))
        x2 = A2inv @ r2
        x1 = x1 + prolong1(x2)
        x1 = x1 + cheb1(r1 - A1(x1))
        x0 = x0 + prolong0(x1)
        x0 = x0 + cheb0(r0 - A0(x0))
        return x0 * fm + r * (1.0 - fm)

    return M


def eligible_maps(profile, n_dof_total: int,
                  policy: Optional[str] = None) -> Optional[AMGMaps]:
    """Device-resident AMG maps for an ELL profile if eligible, else None.

    Eligibility: node-block dof count with rigid-body modes (1/2/3),
    problem at least FRONTISTR_TPU_AMG_MIN dofs (default 30k; the V-cycle
    setup costs ~10 matvecs, not worth it for small systems), and policy
    not forcing jacobi.  Host maps are cached on the ELL profile; the
    returned pytree is meant to be passed THROUGH a jitted solve (pass
    None to get a block-Jacobi-only solve — the pytree structure is part
    of the jit cache key, so both variants co-exist compiled).
    """
    import os
    pol = policy or os.environ.get("FRONTISTR_TPU_PRECOND", "auto")
    if pol in ("jacobi", "diag", "ssor"):
        return None
    min_dof = int(os.environ.get("FRONTISTR_TPU_AMG_MIN", "30000"))
    if pol != "amg" and n_dof_total < min_dof:
        return None
    if _n_modes(profile.ndof) == 0:
        return None
    maps = getattr(profile, "_amg_maps", None)
    if maps is None:
        maps = build_maps(profile.cols, profile.n_node, profile.ndof)
        try:
            object.__setattr__(profile, "_amg_maps", maps)
        except Exception:
            pass
    if maps is None:
        return None
    return maps.device()
