"""Multi-chip SPMD execution.

The reference distributes via MPI domain decomposition with explicit halo
exchange (hecmw_update_3_R, hecmw1/src/solver/communication/
hecmw_comm_f.F90:669-841).  The TPU-native equivalent: shard the element
axis and the node/dof axis of every array over a ``jax.sharding.Mesh`` and
let XLA's SPMD partitioner insert the collectives (all-gathers for the
element->node gather, reduce-scatters for the incidence gather-sum, psums
for CG dots) over ICI.  Partition layout (which elements/nodes land on which
shard) comes from frontistr_tpu.parallel.partition so the gathers stay
shard-local except at subdomain halos.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frontistr_tpu.assembly import femop
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.solver import cg as krylov


def device_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_to_multiple(a: np.ndarray, m: int, axis: int = 0, fill=0):
    n = a.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return a, n
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, rem)
    return np.pad(a, pad, constant_values=fill), n


def make_sharded_newton_step(mesh: Mesh, etype: int, conn: np.ndarray,
                             n_node: int, ndof: int, D1: np.ndarray,
                             fixed_dofs: np.ndarray, cg_iters: int = 30,
                             tol: float = 1e-8):
    """Build a jitted, mesh-sharded linear(ized) Newton step:
    assemble element stiffness (element-sharded) -> constrained PCG over
    dof-sharded vectors -> displacement increment.

    Elements are padded to a multiple of the mesh size (padding elements
    carry zero material so they contribute nothing); node count is padded so
    the dof vector divides evenly across shards.
    """
    axis = mesh.axis_names[0]
    nshard = mesh.devices.size
    table = get_table(etype)
    E0 = conn.shape[0]
    conn_p, _ = pad_to_multiple(conn, nshard)
    Ep = conn_p.shape[0]
    nn = table.nn

    # pad the node axis so (n_node_tot * ndof) shards evenly
    n_node_tot = n_node + ((-n_node) % nshard)
    dofs = (conn_p[:, :, None] * ndof +
            np.arange(ndof)[None, None, :]).reshape(Ep, nn * ndof)
    Dstack = np.broadcast_to(D1, (Ep,) + D1.shape).copy()
    Dstack[E0:] = 0.0  # padding elements carry zero material

    inc, total_en = femop.build_incidence([conn_p], n_node_tot)

    free = np.ones(n_node_tot * ndof)
    free[fixed_dofs] = 0.0
    free[n_node * ndof:] = 0.0

    el_sh = NamedSharding(mesh, P(axis))
    nd_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    dofs_d = jax.device_put(jnp.asarray(dofs.astype(np.int32)), el_sh)
    D_d = jax.device_put(jnp.asarray(Dstack), el_sh)
    free_d = jax.device_put(jnp.asarray(free), nd_sh)
    conn_d = jax.device_put(jnp.asarray(conn_p), el_sh)
    inc_d = jax.device_put(jnp.asarray(inc), nd_sh)

    # tables enter as jit ARGUMENTS, not closure captures: in a
    # multi-process (DCN) run a program may not close over arrays that
    # span non-addressable devices
    @partial(jax.jit, out_shardings=nd_sh)
    def _step(coords, f, dofs_a, D_a, free_a, conn_a, inc_a):
        """coords: (>=n_node, dim) replicated; f: (n_dof_tot,) sharded."""
        coords_e = coords[conn_a]
        ke = solid.stiffness_linear(table, coords_e, D_a)
        op = femop.FEOperator(
            kes=[ke], dofs=[dofs_a], nns=[nn], inc=inc_a,
            total_en=total_en, n_node=n_node_tot, ndof=ndof,
            free_mask=free_a)
        b = f * free_a
        res = krylov.pcg(op.apply_constrained, b, M=op.block_jacobi(),
                         tol=tol, maxiter=cg_iters)
        return res.x

    def step(coords, f):
        return _step(coords, f, dofs_d, D_d, free_d, conn_d, inc_d)

    return step, dict(n_tot=n_node_tot * ndof, el_sharding=el_sh,
                      nd_sharding=nd_sh, replicated=rep, padded_elems=Ep)
