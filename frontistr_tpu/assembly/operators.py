"""Global linear operators over element blocks.

The TPU replacement of HEC-MW's CSR SpMV layer
(hecmw1/src/solver/las/hecmw_solver_las_33.f90): a matrix-free operator
y = sum_blocks scatter(k_e @ gather(x)), built from per-block dense element
matrices.  All gathers/scatters are XLA-native (no atomics needed — XLA
scatter-add is deterministic).

Dirichlet conditions use a projection formulation equivalent to the
reference's row/column elimination (hecmw_mat_ass.f90:292-429):
    A_c x = P A P x + (I-P) x,   b_c = P (b - A u_fix) + u_fix
where P zeroes fixed dofs.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np


class BlockOp(NamedTuple):
    dofs: jnp.ndarray   # (E, m) int32
    ke: jnp.ndarray     # (E, m, m)


def matvec(blocks: List[BlockOp], x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.zeros_like(x)
    for b in blocks:
        xe = x[b.dofs]                          # (E, m)
        fe = jnp.einsum("eij,ej->ei", b.ke, xe)
        y = y.at[b.dofs.reshape(-1)].add(fe.reshape(-1))
    return y


def block_diagonal(blocks: List[BlockOp], n_node: int, ndof: int):
    """Accumulate ndof x ndof nodal diagonal blocks -> (n_node, ndof, ndof)."""
    D = jnp.zeros((n_node, ndof, ndof))
    for b in blocks:
        E, m, _ = b.ke.shape
        nn = m // ndof
        ke = b.ke.reshape(E, nn, ndof, nn, ndof)
        idx = jnp.arange(nn)
        diag = ke[:, idx, :, idx, :]              # (nn, E, ndof, ndof)
        nodes = b.dofs.reshape(E, nn, ndof)[:, :, 0] // ndof  # (E, nn)
        D = D.at[nodes.T.reshape(-1)].add(diag.reshape(-1, ndof, ndof))
    return D


def block_jacobi_precond(D: jnp.ndarray, free_mask_node: jnp.ndarray):
    """Invert nodal blocks (the DIAG preconditioner,
    hecmw1/src/solver/precond/33/hecmw_precond_DIAG_33.f90 semantics).

    Fixed dofs act as identity: their block rows/cols are masked out and a
    1.0 is placed on the diagonal.

    Args:
      D: (n_node, ndof, ndof) accumulated diagonal blocks.
      free_mask_node: (n_node, ndof) 1.0 free / 0.0 fixed.
    """
    n_node, ndof, _ = D.shape
    m2 = free_mask_node[:, :, None] * free_mask_node[:, None, :]
    Dm = D * m2
    fixdiag = 1.0 - free_mask_node
    Dm = Dm.at[:, jnp.arange(ndof), jnp.arange(ndof)].add(fixdiag)
    # nodes untouched by any element (meshes may carry unused nodes, e.g.
    # examples/static/exA) have zero blocks: act as identity there too
    dd = Dm[:, jnp.arange(ndof), jnp.arange(ndof)]
    Dm = Dm.at[:, jnp.arange(ndof), jnp.arange(ndof)].add(
        jnp.where(dd == 0.0, 1.0, 0.0))
    from frontistr_tpu.fem.isoparam import det_inv_small
    if ndof == 1:
        Dinv = 1.0 / Dm
    elif ndof in (2, 3):
        _, Dinv = det_inv_small(Dm)
    else:
        from frontistr_tpu.utils.linalg import gauss_jordan_inv
        Dinv = gauss_jordan_inv(Dm)

    def apply(r):
        rn = r.reshape(n_node, ndof)
        zn = jnp.einsum("nij,nj->ni", Dinv, rn)
        return zn.reshape(-1)

    return apply


def constrained_operator(blocks: List[BlockOp], free_mask: jnp.ndarray):
    """A_c(x) = P A (P x) + (I - P) x."""

    def apply(x):
        xm = x * free_mask
        y = matvec(blocks, xm)
        return y * free_mask + x * (1.0 - free_mask)

    return apply


def constrained_rhs(blocks: List[BlockOp], f: jnp.ndarray,
                    free_mask: jnp.ndarray, u_fix: jnp.ndarray):
    """b_c = P (f - A u_fix) + u_fix(on fixed dofs)."""
    y = matvec(blocks, u_fix)
    return (f - y) * free_mask + u_fix * (1.0 - free_mask)


def make_free_mask(n_dof: int, fixed_dofs: np.ndarray) -> np.ndarray:
    mask = np.ones(n_dof)
    if len(fixed_dofs):
        mask[fixed_dofs] = 0.0
    return mask


def full_fixed_vector(n_dof: int, fixed_dofs: np.ndarray,
                      fixed_vals: np.ndarray) -> np.ndarray:
    u = np.zeros(n_dof)
    if len(fixed_dofs):
        u[fixed_dofs] = fixed_vals
    return u
