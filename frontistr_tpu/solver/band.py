"""In-house ON-DEVICE direct factorization: blocked band Cholesky.

The reference ships its own direct LDL factorizations
(hecmw1/src/solver/solver_direct/hecmw_solver_direct.f90 — serial
multifrontal — and the parallel variant); the repo's METHOD=DIRECT
surfaces previously delegated everything to host SuperLU.  This module
retires that dependency for the FACTOR-ONCE paths (eigen shift-invert,
Newmark effective matrix): an RCM band reordering on the host, then a
blocked band Cholesky that runs entirely on device as a `lax.fori_loop`
of (nb x nb) matmuls — the MXU-friendly shape of a direct method.

Layout: after the dof-level RCM permutation the SPD matrix has
half-bandwidth b; it is stored block-banded as Ablk[k, l] =
A[block k, block k-l] (nb x nb blocks, l = 0..B-1, B = ceil(b/nb)+1).
Factorization is right-looking:

    L_kk L_kk^T = A_kk            (dense in-block Cholesky, fori over
                                   columns with rank-1 updates)
    L_(k+l)k    = A_(k+l)k L_kk^{-T}
    A_(k+j)(k+i) -= L_(k+j)k L_(k+i)k^T     (1 <= i <= j < B)

The solve is two block-triangular sweeps using the stored inverse
diagonal factors (no on-device triangular solve primitive needed —
f64 LAPACK custom calls are unavailable on the TPU path).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from frontistr_tpu.utils.linalg import gauss_jordan_inv


def _chol_dense(D: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of one (nb, nb) SPD block via a fori_loop of
    masked rank-1 updates (no LAPACK)."""
    nb = D.shape[0]
    ar = jnp.arange(nb)

    def body(j, M):
        d = jnp.maximum(M[j, j], 1e-300)
        c = M[:, j] * jax.lax.rsqrt(d) * (ar >= j)
        low = (ar[:, None] > j) & (ar[None, :] > j)
        M = M - jnp.outer(c, c) * low
        return M.at[:, j].set(c)

    L = jax.lax.fori_loop(0, nb, body, D)
    return L * (ar[:, None] >= ar[None, :])


@jax.jit
def _factor(Ablk: jnp.ndarray):
    """(nblk, B, nb, nb) block-band -> (Lpad, invD)."""
    nblk, B, nb, _ = Ablk.shape
    Apad = jnp.pad(Ablk, ((0, B), (0, 0), (0, 0), (0, 0)))
    invD0 = jnp.zeros((nblk, nb, nb), Ablk.dtype)

    def body(k, st):
        A, invD = st
        L11 = _chol_dense(A[k, 0])
        iL = gauss_jordan_inv(L11)
        A = A.at[k, 0].set(L11)
        invD = invD.at[k].set(iL)
        Ls = []
        for l in range(1, B):
            Lkl = A[k + l, l] @ iL.T
            A = A.at[k + l, l].set(Lkl)
            Ls.append(Lkl)
        for j in range(1, B):
            for i in range(1, j + 1):
                A = A.at[k + j, j - i].add(-(Ls[j - 1] @ Ls[i - 1].T))
        return (A, invD)

    return jax.lax.fori_loop(0, nblk, body, (Apad, invD0))


@jax.jit
def _solve(Lpad: jnp.ndarray, invD: jnp.ndarray, b: jnp.ndarray):
    """Forward + backward block-triangular sweeps; b: (nblk*nb,)."""
    nblk, nb, _ = invD.shape
    B = Lpad.shape[1]
    bb = b.reshape(nblk, nb)
    y0 = jnp.zeros((nblk + B, nb), b.dtype)     # offset B: y[k+B]

    def fwd(k, y):
        s = bb[k]
        for l in range(1, B):
            s = s - Lpad[k, l] @ y[k + B - l]
        return y.at[k + B].set(invD[k] @ s)

    y = jax.lax.fori_loop(0, nblk, fwd, y0)[B:]
    x0 = jnp.zeros((nblk + B, nb), b.dtype)     # x[k] at slot k

    def bwd(i, x):
        k = nblk - 1 - i
        s = y[k]
        for l in range(1, B):
            s = s - Lpad[k + l, l].T @ x[k + l]
        return x.at[k].set(invD[k].T @ s)

    x = jax.lax.fori_loop(0, nblk, bwd, x0)
    return x[:nblk].reshape(-1)


class BandCholesky:
    """Factor-once constrained SPD solve: P A P + (I-P) semantics
    identical to solver.direct.solve_direct, factored on device.

    kes/dofs_list: element blocks (host or device arrays);
    free: (n_dof,) 0/1 mask; conns/n_node: node graph for RCM."""

    def __init__(self, kes: Sequence, dofs_list: Sequence,
                 n_dof: int, free: np.ndarray,
                 conns: Sequence[np.ndarray], n_node: int,
                 nb: Optional[int] = None, dtype=np.float64,
                 scale: float = 1.0,
                 diag_add: Optional[np.ndarray] = None):
        from frontistr_tpu.ordering import rcm_order
        ndof = n_dof // n_node
        order = rcm_order([np.asarray(c) for c in conns], n_node)
        nperm = np.empty(n_node, np.int64)      # perm[old] = new
        nperm[order] = np.arange(n_node)
        perm = (nperm[:, None] * ndof +
                np.arange(ndof)[None, :]).reshape(-1)
        free = np.asarray(free, float)

        # dof-level half bandwidth over all element couplings
        b = 0
        pd_list = []
        for dofs in dofs_list:
            pd = perm[np.asarray(dofs)]
            pd_list.append(pd)
            b = max(b, int((pd.max(axis=1) - pd.min(axis=1)).max()))
        nb = nb or int(os.environ.get("FRONTISTR_TPU_BAND_NB", "32"))
        B = b // nb + 2
        nblk = -(-n_dof // nb)
        npad = nblk * nb

        # assemble the constrained band on the host (numpy only)
        Ab = np.zeros((npad, (B - 1) * nb + 1), dtype)
        fp = np.empty(npad, dtype)
        fp.fill(1.0)
        fp[perm] = free            # free mask in permuted numbering
        fp[n_dof:] = 0.0
        for ke, pd in zip(kes, pd_list):
            kv = np.asarray(ke, dtype) * scale
            E, m, _ = kv.shape
            r = np.repeat(pd, m, axis=1).reshape(-1)
            c = np.tile(pd[:, None, :], (1, m, 1)).reshape(-1)
            v = kv.reshape(-1) * fp[r] * fp[c]
            keep = r >= c
            np.add.at(Ab, (r[keep], r[keep] - c[keep]), v[keep])
        if diag_add is not None:           # K_eff = scale K + diag(add)
            Ab[perm, 0] += np.asarray(diag_add, dtype) * fp[perm]
        Ab[:, 0] = np.where(fp > 0, np.where(Ab[:, 0] == 0.0, 1.0,
                                             Ab[:, 0]), 1.0)
        # block-banded: Ablk[k, l, a, c] = A[k*nb+a, (k-l)*nb+c]
        Ablk = np.zeros((nblk, B, nb, nb), dtype)
        ii = np.arange(npad)
        for l in range(B):
            for cc in range(nb):
                d = ii % nb + l * nb - cc          # diag offset per row
                ok = (d >= 0) & (d <= (B - 1) * nb) & (ii - d >= 0)
                Ablk[ii[ok] // nb, l, ii[ok] % nb, cc] = \
                    Ab[ii[ok], d[ok]]

        self.n_dof, self.nb, self.B, self.nblk = n_dof, nb, B, nblk
        self.perm = perm
        self.iperm = np.argsort(perm)
        self.free = free
        with jax.enable_x64(True) if dtype == np.float64 else _null():
            self._L, self._invD = _factor(jnp.asarray(Ablk))
            jax.block_until_ready(self._L)
        self._dtype = dtype

    def solve(self, b: np.ndarray) -> np.ndarray:
        """x = (P A P + (I-P))^{-1} b.

        perm maps original dof -> permuted position, so the permuted
        rhs satisfies bp[perm] = b and the answer maps back as
        x_orig = xp[perm]."""
        bp = np.zeros(self.nblk * self.nb, self._dtype)
        bp[self.perm] = np.asarray(b, self._dtype)
        with jax.enable_x64(True) \
                if self._dtype == np.float64 else _null():
            xp = np.asarray(_solve(self._L, self._invD,
                                   jnp.asarray(bp)))
        return xp[self.perm]


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
