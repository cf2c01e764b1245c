"""Multicolor block-SSOR preconditioner (TPU-native Gauss-Seidel sweeps).

The reference's workhorse preconditioners are sequential forward/backward
block-SOR sweeps (hecmw1/src/solver/precond/33/hecmw_precond_SSOR_33.f90:
55-174) with an optional multicolor node ordering to expose parallelism
(hecmw1/src/matrix/hecmw_matrix_ordering_MC.f90).  A sequential sweep
cannot run on a TPU, but the MULTICOLOR variant can, exactly: nodes of
one color share no edges, so a whole color updates as one batched
gather -> block-matvec -> batched 3x3 solve.  A full forward+backward
sweep touches every ELL block twice — the same HBM traffic as two
matvecs — in ``ncolors`` fused device steps.

This is the fallback family for decks where aggregation AMG degrades
(thin/high-aspect elements, near-incompressibility, large material
jumps): select with FRONTISTR_TPU_PRECOND=ssor or !SOLVER PRECOND=10/11/
12/20/21 (the reference's BILU/SAINV/RIF ids — sweep-class methods).

M^{-1} = omega (2-omega) (D/omega + U)^{-1} D (D/omega + L)^{-1} in the
color ordering: SPD for SPD K and 0 < omega < 2, hence CG-safe (same
algebra as the reference's SSOR; L/U are the strict lower/upper parts
WITH RESPECT TO the color order, which is a reordered SSOR — equally
valid as a preconditioner).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SSORMaps:
    """Static multicolor maps (registered pytree; build on host once).

    rows[c, :] lists the nodes of color c, padded with n_node (a phantom
    row whose updates are discarded).  Row counts are uneven — greedy
    coloring front-loads color 0 — so each color is stored at its own
    length and padded only to a lane multiple via the shared Rmax slab.
    """
    ncol: int
    n_node: int
    rows: np.ndarray        # (ncol, Rmax) int32, pad = n_node

    def device(self) -> "SSORMaps":
        if not hasattr(self, "_dev"):
            self._dev = SSORMaps(ncol=self.ncol, n_node=self.n_node,
                                 rows=jnp.asarray(self.rows))
        return self._dev


jax.tree_util.register_dataclass(
    SSORMaps, data_fields=["rows"], meta_fields=["ncol", "n_node"])


def build_color_maps(cols: np.ndarray, n_node: int) -> SSORMaps:
    """Greedy smallest-available coloring of the node graph.

    Vectorized Jones-Plassmann-style rounds over the ELL adjacency:
    each round colors the maximal independent set of still-uncolored
    nodes whose index is a local minimum among uncolored neighbors
    (deterministic; the RCM/band order keeps rounds balanced).  For FEM
    meshes this lands near (max degree + 1) colors in ~2x that many
    rounds, all as whole-array numpy ops — no per-node Python loop.
    """
    N, W = cols.shape
    colsc = cols.astype(np.int64)
    color = np.full(N, -1, np.int64)
    self_m = colsc == np.arange(N)[:, None]
    # RANDOM priorities: index order degenerates on band-ordered meshes
    # (a path graph would color one node per round)
    pri = np.random.default_rng(7).permutation(N).astype(np.int64)
    while True:
        unc = color < 0
        if not unc.any():
            break
        # MIS of uncolored local-priority-minima; each member takes the
        # smallest color absent among its already-colored neighbors, so
        # the count stays at greedy's <= maxdeg+1 (not one per round)
        nb_unc = unc[colsc] & ~self_m
        nb_pri = np.where(nb_unc, pri[colsc], np.int64(2 * N))
        sel = np.flatnonzero(unc & (pri < nb_pri.min(axis=1)))
        nbc = color[colsc[sel]]                      # (s, W), -1 = none
        s = len(sel)
        used = np.zeros((s, W + 2), bool)
        valid = nbc >= 0
        used[np.repeat(np.arange(s), W)[valid.ravel()],
             nbc.ravel()[valid.ravel()]] = True
        color[sel] = np.argmax(~used, axis=1)
    ncol = int(color.max()) + 1
    counts = np.bincount(color, minlength=ncol)
    Rmax = int(counts.max())
    Rmax = max(-(-Rmax // 128) * 128, 128)
    rows = np.full((ncol, Rmax), N, np.int32)
    order = np.argsort(color, kind="stable")
    off = 0
    for k in range(ncol):
        rows[k, :counts[k]] = order[off:off + counts[k]]
        off += counts[k]
    return SSORMaps(ncol=ncol, n_node=n_node, rows=rows)


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


def setup_ssor(maps: SSORMaps,
               blocks: Union[jnp.ndarray, Sequence[jnp.ndarray]],
               cols: jnp.ndarray, diag: jnp.ndarray,
               free_mask: jnp.ndarray, ndof: int,
               omega: float = 1.0,
               sweeps: int = 1) -> Callable:
    """Build M(r) ~= K^{-1} r via `sweeps` multicolor SSOR sweeps.

    blocks: (N, W, nd, nd) array or tuple of nd*nd (N, W) planes (the
    cluster path's extract_scalar_blocks form).  diag: (N, nd, nd).
    Traceable: maps/blocks/cols/diag/free_mask may all be jit args.
    """
    nd = ndof
    is_planes = isinstance(blocks, (list, tuple))
    f = (blocks[0] if is_planes else blocks).dtype
    N = maps.n_node
    fm = free_mask.reshape(N, nd).astype(f)
    Dm = diag.astype(f) * (fm[:, :, None] * fm[:, None, :])
    Dinv = _block_inv(Dm, nd) * omega
    # pad one phantom row (zero) so rows == N gathers are inert
    fmp = jnp.pad(fm, ((0, 1), (0, 0)))
    Dinvp = jnp.pad(Dinv, ((0, 1), (0, 0), (0, 0)))
    Dmp = jnp.pad(Dm, ((0, 1), (0, 0), (0, 0)))
    colsp = jnp.pad(cols, ((0, 1), (0, 0)))
    if is_planes:
        planes = [jnp.pad(p.astype(f), ((0, 1), (0, 0))) for p in blocks]
    else:
        bl = blocks.astype(f)
        planes = [jnp.pad(bl[:, :, i, j], ((0, 1), (0, 0)))
                  for i in range(nd) for j in range(nd)]
    rows_j = maps.rows
    scale = omega * (2.0 - omega)

    def _color_rhs(rows_c, z):
        """(A z) restricted to rows_c, minus the self/diag term (z is
        zero on rows_c when called, so the diag term vanishes)."""
        cg = colsp[rows_c]                           # (Rc, W)
        zg = z[cg]                                   # (Rc, W, nd)
        zg = zg * fmp[cg]                            # constrained gather
        s = []
        for i in range(nd):
            si = planes[i * nd + 0][rows_c] * zg[:, :, 0]
            for j in range(1, nd):
                si = si + planes[i * nd + j][rows_c] * zg[:, :, j]
            s.append(si.sum(axis=1))
        return jnp.stack(s, axis=1)                  # (Rc, nd)

    def _half(rn, order):
        z = jnp.zeros((N + 1, nd), f)
        for c in order:
            rows_c = rows_j[c]
            s = _color_rhs(rows_c, z)
            rhs = rn[jnp.minimum(rows_c, N - 1)] * \
                (rows_c < N)[:, None].astype(f) - s
            zc = jnp.einsum("rij,rj->ri", Dinvp[rows_c], rhs)
            z = z.at[rows_c].set(zc, mode="drop",
                                 indices_are_sorted=False)
        return z[:N]

    fwd = list(range(maps.ncol))
    bwd = fwd[::-1]

    def M(r):
        rn = (r.astype(f) * free_mask.astype(f)).reshape(N, nd)
        x = jnp.zeros((N, nd), f)
        for k in range(sweeps):
            resid = rn if k == 0 else rn - _full_mv(x)
            z1 = _half(resid, fwd)                   # (D/w + L)^-1 r
            w = jnp.einsum("nij,nj->ni", Dm, z1) / omega
            z2 = _half(w, bwd)                       # (D/w + U)^-1 D z1
            x = x + scale * z2
        out = x.reshape(-1) * free_mask.astype(f)
        return out + r.astype(f) * (1.0 - free_mask.astype(f))

    def _full_mv(xn):
        xp = jnp.pad(xn * fm, ((0, 1), (0, 0)))
        xg = xp[colsp[:N]]
        y = []
        for i in range(nd):
            yi = planes[i * nd + 0][:N] * xg[:, :, 0]
            for j in range(1, nd):
                yi = yi + planes[i * nd + j][:N] * xg[:, :, j]
            y.append(yi.sum(axis=1))
        return jnp.stack(y, axis=1) * fm

    return M


def eligible_maps(profile, policy: str) -> Optional[SSORMaps]:
    """Color maps for an ELL profile when policy selects the sweep
    family; cached on the profile like amg.eligible_maps."""
    if policy != "ssor":
        return None
    maps = getattr(profile, "_ssor_maps", None)
    if maps is None:
        maps = build_color_maps(np.asarray(profile.cols), profile.n_node)
        try:
            object.__setattr__(profile, "_ssor_maps", maps)
        except Exception:
            pass
    return maps.device()
