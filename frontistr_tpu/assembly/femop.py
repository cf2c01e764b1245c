"""Gather-only global FE operator.

Profiling on TPU v5e showed XLA scatter-add is ~15x slower than the
element einsum it feeds (serialized scatter lowering), and f64 arithmetic is
~100x f32 (software emulation).  This module therefore implements the global
operator with **incidence gathers** instead of scatters:

    host setup:  for every node, the (element, local-node) pairs touching it
                 (padded to the max incidence) — the dual of the connectivity,
                 playing the role of HEC-MW's CSR profile
                 (hecmw1/src/solver/matrix/hecmw_mat_con.f90)
    device:      y = gather-sum over incidence of  f_e = k_e @ x_e

which is deterministic, scatter-free, and vectorizes onto the VPU/MXU.

Precision: the operator runs in a configurable dtype (f32 on TPU for speed);
solver/mixed.py wraps it with f64 iterative refinement to reach FrontISTR's
1e-8 displacement parity.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_incidence(conns: Sequence[np.ndarray], n_node: int):
    """Dual connectivity: for each node, indices into the concatenated
    element-node axis (sum_b E_b * nn_b), padded with `total_en` (which
    points at an appended zero row).

    Returns (inc (n_node, maxinc) int32, total_en).
    """
    total_en = sum(c.shape[0] * c.shape[1] for c in conns)
    nodes_all = np.concatenate([c.reshape(-1) for c in conns])
    en_idx = np.arange(total_en, dtype=np.int64)
    order = np.argsort(nodes_all, kind="stable")
    sorted_nodes = nodes_all[order]
    sorted_en = en_idx[order]
    counts = np.bincount(sorted_nodes, minlength=n_node)
    maxinc = int(counts.max()) if len(counts) else 1
    inc = np.full((n_node, maxinc), total_en, dtype=np.int64)
    starts = np.zeros(n_node + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    # ragged -> padded without a Python loop over nodes
    pos_in_node = np.arange(len(sorted_en)) - starts[sorted_nodes]
    inc[sorted_nodes, pos_in_node] = sorted_en
    return inc.astype(np.int32), total_en


@dataclasses.dataclass
class FEOperator:
    """Constrained global stiffness operator over element-type blocks.

    Registered pytree: pass through jit boundaries as an argument, never
    as a closure (closure arrays are inlined as module literals)."""
    kes: List[jnp.ndarray]          # per block (E, m, m)
    dofs: List[jnp.ndarray]         # per block (E, m) int32
    nns: List[int]                  # nodes per element per block
    inc: jnp.ndarray                # (n_node, maxinc) int32
    total_en: int
    n_node: int
    ndof: int
    free_mask: jnp.ndarray          # (n_dof,) 1.0 free / 0.0 fixed
    dtype: jnp.dtype = jnp.float64

    def __post_init__(self):
        # nns is pytree *metadata* (jit-cache key): must be hashable
        self.nns = tuple(self.nns)

    @property
    def n_dof(self) -> int:
        return self.n_node * self.ndof

    def element_forces_flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """f_e = k_e x_e for all blocks, flattened to (total_en*ndof + ndof,)
        with a trailing zero pad slot."""
        fes = []
        for ke, dofs in zip(self.kes, self.dofs):
            E, m, _ = ke.shape
            if x.dtype == jnp.float64:
                # f64 on TPU is emulated: a f64 dot_general X64-rewrites
                # into an 8-plane f32 expansion (11.8 GB at the 1M-dof
                # tet mesh — the r05 HBM OOM); unrolled ELEMENTWISE
                # products stay double-float pairs.  ke goes plane-major
                # ((m, m, E), minor E) once so each (i, j) plane is a
                # contiguous stream, and x gathers are 1-D per local
                # column — no (E, m) minor-tile padding on the inputs.
                kep = jnp.transpose(ke, (1, 2, 0)).astype(x.dtype)
                xj = [x[dofs[:, j]] for j in range(m)]
                cols = []
                for i in range(m):
                    acc = kep[i, 0] * xj[0]
                    for j in range(1, m):
                        acc = acc + kep[i, j] * xj[j]
                    cols.append(acc)
                fes.append(jnp.stack(cols, axis=1).reshape(-1))
                continue
            # HIGHEST: the TPU default is bf16-pass matmul (eps ~ 4e-3),
            # which caps the inner CG of the mixed-precision refinement
            # at ~3 digits/pass.  These tiny batched matmuls are
            # HBM-bound (reading ke dominates), so full-f32 accumulation
            # is free.
            fe = jnp.einsum("eij,ej->ei", ke, x[dofs],
                            precision=jax.lax.Precision.HIGHEST)
            fes.append(fe.reshape(-1))
        fes.append(jnp.zeros(self.ndof, x.dtype))
        return jnp.concatenate(fes)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        flat = self.element_forces_flat(x)
        # transposed gather: keep the LONG node axis minor so the TPU
        # (8,128) tile pads ~1x.  The (n_node, W, ndof) form pads its
        # minor ndof=3 to 128 lanes — 42.7x, two 3.92 GB f64-emulation
        # temps at the 1M-dof tet mesh (the r05 HBM OOM).
        inc_t = jnp.swapaxes(self.inc.astype(jnp.int32), 0, 1)
        idx = inc_t[:, None, :] * self.ndof + \
            jnp.arange(self.ndof, dtype=jnp.int32)[None, :, None]
        y = flat[idx].sum(axis=0)          # (ndof, n_node)
        return jnp.swapaxes(y, 0, 1).reshape(-1)

    def apply_constrained(self, x: jnp.ndarray) -> jnp.ndarray:
        """P A P x + (I-P) x — projection equivalent of hecmw_mat_ass_bc."""
        xm = x * self.free_mask
        y = self.matvec(xm)
        return y * self.free_mask + x * (1.0 - self.free_mask)

    def constrained_rhs(self, f: jnp.ndarray, u_fix: jnp.ndarray):
        y = self.matvec(u_fix)
        return (f - y) * self.free_mask + u_fix * (1.0 - self.free_mask)

    def diag_blocks(self) -> jnp.ndarray:
        """Nodal (ndof x ndof) diagonal blocks via incidence gather."""
        nd = self.ndof
        flats = []
        for ke, nn in zip(self.kes, self.nns):
            E, m, _ = ke.shape
            kr = ke.reshape(E, nn, nd, nn, nd)
            idx = jnp.arange(nn)
            kd = kr[:, idx, :, idx, :]                 # (nn, E, nd, nd)
            flats.append(jnp.swapaxes(kd, 0, 1).reshape(-1, nd, nd))
        flats.append(jnp.zeros((1, nd, nd), self.kes[0].dtype))
        flat = jnp.concatenate(flats, axis=0)
        return flat[self.inc].sum(axis=1)              # (n_node, nd, nd)

    def block_jacobi(self, scale=1.0, diag_add=None) -> Callable:
        """DIAG preconditioner: invert nodal blocks, identity on fixed and
        unused dofs.

        scale/diag_add form the Newmark effective diagonal
        c1 D + diag(c2 m) (fstr_dynamic_nlimplicit.f90 K_eff) without a
        second incidence gather; diag_add is a per-dof vector."""
        from frontistr_tpu.fem.isoparam import det_inv_small
        from frontistr_tpu.utils.linalg import gauss_jordan_inv
        nd = self.ndof
        D = self.diag_blocks() * scale
        if diag_add is not None:
            D = D.at[:, jnp.arange(nd), jnp.arange(nd)].add(
                diag_add.reshape(self.n_node, nd))
        fm = self.free_mask.reshape(self.n_node, nd)
        D = D * (fm[:, :, None] * fm[:, None, :])
        dd = D[:, jnp.arange(nd), jnp.arange(nd)]
        D = D.at[:, jnp.arange(nd), jnp.arange(nd)].add(
            jnp.where(dd == 0.0, jnp.ones_like(dd), jnp.zeros_like(dd)))
        if nd == 1:
            Dinv = 1.0 / D
        elif nd in (2, 3):
            _, Dinv = det_inv_small(D)
        else:
            Dinv = gauss_jordan_inv(D)

        def apply(r):
            rn = r.reshape(self.n_node, nd)
            return jnp.einsum("nij,nj->ni", Dinv, rn).reshape(-1)

        return apply

    def astype(self, dtype) -> "FEOperator":
        return FEOperator(
            kes=[k.astype(dtype) for k in self.kes], dofs=self.dofs,
            nns=self.nns, inc=self.inc, total_en=self.total_en,
            n_node=self.n_node, ndof=self.ndof,
            free_mask=self.free_mask.astype(dtype), dtype=dtype)


jax.tree_util.register_dataclass(
    FEOperator,
    data_fields=["kes", "dofs", "inc", "free_mask"],
    meta_fields=["nns", "total_en", "n_node", "ndof", "dtype"])


def from_model(model, kes, dtype=None) -> FEOperator:
    """Build the operator from a StructModel + per-block element matrices
    (plus any spring extra-blocks stored on the model)."""
    ex_conns, ex_dofs, ex_kes, ex_nns = getattr(model, "extras",
                                                ([], [], [], []))
    conns = [b.conn for b in model.blocks] + list(ex_conns)
    inc, total_en = build_incidence(conns, model.n_node)
    from frontistr_tpu.assembly import operators as old_ops
    free = old_ops.make_free_mask(model.n_dof_total, model.fixed_dofs)
    op = FEOperator(
        kes=[jnp.asarray(k) for k in kes] + [jnp.asarray(k)
                                             for k in ex_kes],
        dofs=[jnp.asarray(b.dofs) for b in model.blocks] +
             [jnp.asarray(d) for d in ex_dofs],
        nns=[b.conn.shape[1] for b in model.blocks] + list(ex_nns),
        inc=jnp.asarray(inc), total_en=total_en,
        n_node=model.n_node, ndof=model.ndof,
        free_mask=jnp.asarray(free))
    if dtype is not None:
        op = op.astype(dtype)
    return op
