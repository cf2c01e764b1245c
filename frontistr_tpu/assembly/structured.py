"""Gather-free matrix-free operator for structured hex8 boxes.

TPU gathers run at ~0.6 GB/s (measured: 53 ms for the (24, E) input
gather of a 1M-dof matvec, 62 ms for the incidence output gather, vs
1.6 ms for the actual element compute).  On a structured grid both
gathers are unnecessary: element nodal values are strided SLICES of the
(nx+1, ny+1, nz+1, 3) node array, and the transpose accumulation is 8
overlapping slice-adds — all dense strided ops the TPU streams at HBM
bandwidth.

This is the TPU-native analogue of structured-block FEM engines; the
general unstructured path (assembly/femop.py) remains for arbitrary
meshes.  Element storage is SoA (m, m, E) with the element axis on
vector lanes.

Element/node ordering matches meshgen.box_hex8: node (i,j,k) at
(i*(ny+1)+j)*(nz+1)+k, element (i,j,k) at (i*ny+j)*nz+k, corner order
(hex8): (0,0,0),(1,0,0),(1,1,0),(0,1,0) then the k+1 plane.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_OFFS = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
         (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]


@dataclasses.dataclass
class StructuredHexOperator:
    nx: int
    ny: int
    nz: int
    keT: jnp.ndarray           # (24, 24, E) SoA element matrices
    free_mask: jnp.ndarray     # (n_dof,)
    ndof: int = 3

    @property
    def n_node(self):
        return (self.nx + 1) * (self.ny + 1) * (self.nz + 1)

    @property
    def n_dof(self):
        return self.n_node * self.ndof

    @property
    def n_elem(self):
        return self.nx * self.ny * self.nz

    def _gather_stencil(self, x):
        """x (n_dof,) -> xeT (24, E) by strided slicing."""
        nx, ny, nz = self.nx, self.ny, self.nz
        X = x.reshape(nx + 1, ny + 1, nz + 1, 3)
        cs = [X[di:di + nx, dj:dj + ny, dk:dk + nz].reshape(-1, 3)
              for (di, dj, dk) in _OFFS]
        xe = jnp.stack(cs, axis=0)                 # (8, E, 3)
        return jnp.swapaxes(xe, 1, 2).reshape(24, -1)

    def _scatter_stencil(self, feT):
        """feT (24, E) -> y (n_dof,) by 8 overlapping slice-adds."""
        nx, ny, nz = self.nx, self.ny, self.nz
        fe = jnp.swapaxes(feT.reshape(8, 3, -1), 1, 2)   # (8, E, 3)
        Y = jnp.zeros((nx + 1, ny + 1, nz + 1, 3), feT.dtype)
        for c, (di, dj, dk) in enumerate(_OFFS):
            Y = Y.at[di:di + nx, dj:dj + ny, dk:dk + nz, :].add(
                fe[c].reshape(nx, ny, nz, 3))
        return Y.reshape(-1)

    def matvec(self, x):
        from frontistr_tpu.ops.pallas_mv import element_matvec_soa
        xeT = self._gather_stencil(x)
        feT = element_matvec_soa(self.keT, xeT)          # (24, E)
        return self._scatter_stencil(feT)

    def apply_constrained(self, x):
        xm = x * self.free_mask
        return self.matvec(xm) * self.free_mask + x * (1.0 - self.free_mask)

    def diag_blocks(self):
        """(n_node, 3, 3) nodal diagonal blocks via the same slice-adds."""
        nx, ny, nz = self.nx, self.ny, self.nz
        E = nx * ny * nz
        Y = jnp.zeros((nx + 1, ny + 1, nz + 1, 3, 3), self.keT.dtype)
        for c, (di, dj, dk) in enumerate(_OFFS):
            blk = self.keT[3 * c:3 * c + 3, 3 * c:3 * c + 3,
                           :self.n_elem]                         # (3,3,E)
            Y = Y.at[di:di + nx, dj:dj + ny, dk:dk + nz].add(
                jnp.transpose(blk, (2, 0, 1)).reshape(nx, ny, nz, 3, 3))
        return Y.reshape(-1, 3, 3)

    def block_jacobi(self):
        from frontistr_tpu.utils.linalg import gauss_jordan_inv
        D = self.diag_blocks()
        fm = self.free_mask.reshape(-1, 3)
        # zero blocks (no adjacent elements) -> identity
        zero = jnp.abs(D).sum(axis=(1, 2)) == 0.0
        D = D + zero[:, None, None] * jnp.eye(3, dtype=D.dtype)
        Dinv = gauss_jordan_inv(D)

        def M(r):
            rn = r.reshape(-1, 3)
            return jnp.einsum("nij,nj->ni", Dinv, rn).reshape(-1)
        return M


def soa_from_blocks(ke, pad: bool = True):
    """(E, m, m) -> (m, m, E_pad) SoA layout (element axis on lanes),
    padded once to the Pallas lane-block multiple."""
    keT = jnp.transpose(ke, (1, 2, 0))
    if pad:
        from frontistr_tpu.ops.pallas_mv import pad_soa
        keT = pad_soa(keT)
    return keT


@dataclasses.dataclass
class StructuredHexOperatorD:
    """Dof-major variant: vectors are laid out (3, n_node) flattened.

    The node-major operator spends 7.3 ms of an 11 ms matvec in
    (E, 3) <-> (3, E) small-dim transposes (TPU lane shuffles).  With
    x stored dof-major, corner slices of the (3, nx+1, ny+1, nz+1) grid
    are already (3, E) with elements on lanes: the whole matvec is
    transpose-free (measured ~4 ms at 1M dof).

    Vector layout: v[d * n_node + node] (node index in meshgen grid
    order); use to_dof_major / from_dof_major for conversion.
    """
    nx: int
    ny: int
    nz: int
    keT: jnp.ndarray           # (24, 24, E_pad) SoA, rows (corner-major)
    free_mask: jnp.ndarray     # (n_dof,) dof-major
    ndof: int = 3

    @property
    def n_node(self):
        return (self.nx + 1) * (self.ny + 1) * (self.nz + 1)

    @property
    def n_dof(self):
        return self.n_node * self.ndof

    @property
    def n_elem(self):
        return self.nx * self.ny * self.nz

    def _gather_stencil(self, x):
        nx, ny, nz = self.nx, self.ny, self.nz
        X = x.reshape(3, nx + 1, ny + 1, nz + 1)
        cs = [X[:, di:di + nx, dj:dj + ny, dk:dk + nz].reshape(3, -1)
              for (di, dj, dk) in _OFFS]
        return jnp.concatenate(cs, axis=0)         # (24, E) corner-major

    def _scatter_stencil(self, feT):
        nx, ny, nz = self.nx, self.ny, self.nz
        Y = jnp.zeros((3, nx + 1, ny + 1, nz + 1), feT.dtype)
        for c, (di, dj, dk) in enumerate(_OFFS):
            Y = Y.at[:, di:di + nx, dj:dj + ny, dk:dk + nz].add(
                feT[3 * c:3 * c + 3].reshape(3, nx, ny, nz))
        return Y.reshape(-1)

    def matvec(self, x):
        xeT = self._gather_stencil(x)
        E = self.n_elem
        feT = (self.keT[:, :, :E] * xeT[None, :, :]).sum(axis=1)
        return self._scatter_stencil(feT)

    def apply_constrained(self, x):
        xm = x * self.free_mask
        return self.matvec(xm) * self.free_mask + \
            x * (1.0 - self.free_mask)

    def diag_blocks(self):
        nx, ny, nz = self.nx, self.ny, self.nz
        Y = jnp.zeros((3, 3, nx + 1, ny + 1, nz + 1), self.keT.dtype)
        for c, (di, dj, dk) in enumerate(_OFFS):
            blk = self.keT[3 * c:3 * c + 3, 3 * c:3 * c + 3,
                           :self.n_elem]
            Y = Y.at[:, :, di:di + nx, dj:dj + ny, dk:dk + nz].add(
                blk.reshape(3, 3, nx, ny, nz))
        return Y                                    # (3, 3, grid...)

    def block_jacobi(self):
        from frontistr_tpu.utils.linalg import gauss_jordan_inv
        D = self.diag_blocks().reshape(3, 3, -1)
        D = jnp.transpose(D, (2, 0, 1))             # (n_node, 3, 3)
        zero = jnp.abs(D).sum(axis=(1, 2)) == 0.0
        D = D + zero[:, None, None] * jnp.eye(3, dtype=D.dtype)
        Dinv = gauss_jordan_inv(D)

        def M(r):
            rn = r.reshape(3, -1)
            return jnp.einsum("nij,jn->in", Dinv, rn).reshape(-1)
        return M


@dataclasses.dataclass
class StructuredHexOperatorConstD:
    """Uniform-grid variant of StructuredHexOperatorD: every element of
    a box_hex8(n,n,n) grid is the SAME cube, so the element stiffness is
    ONE (24, 24) matrix and the matvec collapses to a single
    (24,24) @ (24,E) MXU matmul over the corner slices.

    This computes the EXACT K @ x of the uniform box in any dtype — in
    f64 it replaces a full f64 element assembly (1.3 s at 1M dof on
    v5e) with a host-computed 24x24 constant, which is how the bench's
    true-residual check rides the MXU instead of the f64 emulation of
    328k element assemblies."""
    nx: int
    ny: int
    nz: int
    ke: jnp.ndarray            # (24, 24), rows/cols corner-major
    free_mask: jnp.ndarray     # (n_dof,) dof-major
    ndof: int = 3

    @property
    def n_node(self):
        return (self.nx + 1) * (self.ny + 1) * (self.nz + 1)

    @property
    def n_elem(self):
        return self.nx * self.ny * self.nz

    def matvec(self, x):
        nx, ny, nz = self.nx, self.ny, self.nz
        X = x.reshape(3, nx + 1, ny + 1, nz + 1)
        xeT = jnp.concatenate(
            [X[:, di:di + nx, dj:dj + ny, dk:dk + nz].reshape(3, -1)
             for (di, dj, dk) in _OFFS], axis=0)     # (24, E)
        feT = self.ke @ xeT                          # ONE MXU matmul
        Y = jnp.zeros((3, nx + 1, ny + 1, nz + 1), feT.dtype)
        for c, (di, dj, dk) in enumerate(_OFFS):
            Y = Y.at[:, di:di + nx, dj:dj + ny, dk:dk + nz].add(
                feT[3 * c:3 * c + 3].reshape(3, nx, ny, nz))
        return Y.reshape(-1)

    def apply_constrained(self, x):
        xm = x * self.free_mask
        return self.matvec(xm) * self.free_mask + \
            x * (1.0 - self.free_mask)


def to_dof_major(v, n_node, ndof=3):
    return jnp.transpose(v.reshape(n_node, ndof)).reshape(-1)


def from_dof_major(v, n_node, ndof=3):
    return jnp.transpose(v.reshape(ndof, n_node)).reshape(-1)


# pytrees: these operators cross jit boundaries as ARGUMENTS (closed-over
# concrete arrays are inlined into the lowered module as dense literals,
# which overflows the remote-compile payload at ~1M dof)
jax.tree_util.register_dataclass(
    StructuredHexOperator,
    data_fields=["keT", "free_mask"],
    meta_fields=["nx", "ny", "nz", "ndof"])
jax.tree_util.register_dataclass(
    StructuredHexOperatorD,
    data_fields=["keT", "free_mask"],
    meta_fields=["nx", "ny", "nz", "ndof"])
jax.tree_util.register_dataclass(
    StructuredHexOperatorConstD,
    data_fields=["ke", "free_mask"],
    meta_fields=["nx", "ny", "nz", "ndof"])
