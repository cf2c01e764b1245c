"""Production multi-chip solve: GSPMD-sharded operators for the real
analysis drivers.

TPU redesign of the reference's MPI domain decomposition
(hecmw_update_3_R halo exchange + hecmw_InnerProduct_R allreduce,
hecmw1/src/solver/communication/hecmw_comm_f.F90:669-841): instead of
explicit import/export tables, every operator array is sharded over a 1-D
``jax.sharding.Mesh`` on its big axis and the SAME jitted solve runs under
GSPMD — XLA inserts the collectives (an all-gather of x for the sparse
row gather, psums for the CG dots) over ICI.  Row-sharded SpMV with a
replicated gather source is the standard TPU layout at this scale: at 1M
dof the x all-gather is 12 MB/iteration, well under an ICI hop, while
blocks/kes/cols (the HBM-heavy arrays) stay fully sharded.

Node/element counts are padded to a multiple of the device count with
inert rows (zero blocks, self-referencing columns, fixed dofs), so shard
boundaries are clean without renumbering; RCB reordering for halo
locality is a further optimization once explicit shard_map paths land.

Enable in the drivers with FRONTISTR_TPU_SHARDS=<n> (or "auto" = all
local devices).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frontistr_tpu.assembly import ell as ellmod
from frontistr_tpu.assembly import femop
from frontistr_tpu.solver import cg as krylov


def requested_shards() -> int:
    """Device count requested via FRONTISTR_TPU_SHARDS (0 = disabled).

    FRONTISTR_TPU_SHARDS=1 is a 1-device GSPMD mesh: no collectives, but
    the Newton drivers then run the fully-FUSED element pipeline
    (ShardedNewton — tangent/solve/update/norms as one jitted program
    per iteration) instead of the eager-stitched loop.  On the remote-
    TPU tunnel that replaces ~20 per-iteration dispatch round-trips with
    one, so it is the recommended single-chip production setting."""
    v = os.environ.get("FRONTISTR_TPU_SHARDS", "")
    if not v or v == "0":
        return 0
    n = len(jax.devices()) if v.lower() == "auto" else int(v)
    return max(n, 0)


def device_mesh(n: int, axis: str = "x") -> Mesh:
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def solver_shardings(jmesh: Mesh, axis: str = "x"):
    """(replicated, row-sharded) NamedShardings for the mesh."""
    from jax.sharding import PartitionSpec as P
    return (NamedSharding(jmesh, P()), NamedSharding(jmesh, P(axis)))


def put_row_or_rep(x, jmesh: Mesh, axis: str = "x"):
    """device_put with the leading axis sharded when divisible by the
    device count, replicated otherwise (GSPMD needs even shards)."""
    rep, row = solver_shardings(jmesh, axis)
    n = getattr(x, "shape", (0,))
    sh = row if (len(n) > 0 and n[0] % jmesh.devices.size == 0) else rep
    return jax.device_put(x, sh)


def shard_ell_operator(eop: ellmod.ELLOperator, jmesh: Mesh,
                       axis: str = "x") -> ellmod.ELLOperator:
    """Pad the node axis to a multiple of the mesh size and device_put
    every array with its node axis sharded.  Padded rows are inert: zero
    blocks, self-referencing columns, fixed (masked-out) dofs."""
    ns = jmesh.devices.size
    N, W, nd = eop.n_node, eop.cols.shape[1], eop.ndof
    Np = _ceil_to(N, ns)
    pad = Np - N
    blocks = jnp.pad(eop.blocks, ((0, pad), (0, 0), (0, 0), (0, 0)))
    pad_cols = jnp.broadcast_to(
        jnp.arange(N, Np, dtype=eop.cols.dtype)[:, None], (pad, W))
    cols = jnp.concatenate([eop.cols, pad_cols]) if pad else eop.cols
    diag = jnp.pad(eop.diag_slot, (0, pad))
    free = jnp.pad(eop.free_mask.reshape(N, nd),
                   ((0, pad), (0, 0))).reshape(-1)
    sh = NamedSharding(jmesh, P(axis))
    return ellmod.ELLOperator(
        blocks=jax.device_put(blocks, sh),
        cols=jax.device_put(cols, sh),
        diag_slot=jax.device_put(diag, sh),
        n_node=Np, ndof=nd,
        free_mask=jax.device_put(free, sh))


def pad_shard_vec(v: jnp.ndarray, n_dof_pad: int, jmesh: Mesh,
                  axis: str = "x") -> jnp.ndarray:
    vp = jnp.pad(v, (0, n_dof_pad - v.shape[0]))
    return jax.device_put(vp, NamedSharding(jmesh, P(axis)))


@partial(jax.jit, static_argnames=("tol", "maxiter", "hist_len"))
def _sharded_pcg(eop, b_c, tol, maxiter, hist_len=0):
    """The jitted sharded CG: identical math to the single-chip path —
    GSPMD partitions the while_loop from the argument shardings."""
    return krylov.pcg(eop.apply_constrained, b_c, M=eop.block_jacobi(),
                      tol=tol, maxiter=maxiter, hist_len=hist_len)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter"))
def _sharded_refined(eop64, eop32, b_c, tol, inner_tol, maxiter):
    from frontistr_tpu.solver.mixed import refined_cg
    return refined_cg(eop64.apply_constrained, eop32.apply_constrained,
                      eop32.block_jacobi(), b_c, tol=tol,
                      inner_tol=inner_tol, maxiter=maxiter)


def sharded_solve_linear(model, kes, f, u_fix, nshard: int,
                         mixed: bool = False):
    """Multi-chip constrained linear solve over the block-ELL operator.

    Returns (x (n_dof,) np.ndarray, iters, relres).  Works for every
    element family the ELL assembly supports (all etypes; springs via
    model extras).  The ELL assembly itself runs unsharded (it is one
    pass; the Krylov loop dominates) — element-sharded assembly comes
    with the shard_map path.
    """
    jmesh = device_mesh(nshard)
    eop = ellmod.from_model(model, kes)          # f64 blocks
    n_dof = eop.n_dof
    seop = shard_ell_operator(eop, jmesh)
    np_dof = seop.n_dof
    b = jnp.asarray(f)
    u_fix_j = jnp.asarray(u_fix)
    # constrained rhs on the unsharded operator (single pass), then shard
    b_c = eop.constrained_rhs(b, u_fix_j)
    b_cs = pad_shard_vec(b_c, np_dof, jmesh)
    sv = model.cfg.solver
    # !EQUATION under sharding: the same exact elimination as the heat
    # sharded arm — mpc arrays ride through jit as pytree args, padded
    # rows are never dependent
    from frontistr_tpu.assembly import extras as exmod
    mpc = exmod.mpc_arrays(model.mesh, model.ndof, np_dof)
    if mpc is not None:
        A = seop.apply_constrained
        b_cs = exmod.mpc_reduce_rhs(mpc, A, b_cs, 1.0)
        res = krylov.pcg(exmod.mpc_wrap(mpc, A), b_cs,
                         M=seop.block_jacobi(), tol=sv.resid,
                         maxiter=sv.nier)
        xr = exmod.mpc_recover(mpc, res.x, 1.0)
        x = np.asarray(jax.block_until_ready(xr))[:n_dof]
        return x, int(res.iters), float(res.relres)
    if mixed:
        res = _sharded_refined(seop, seop.astype(jnp.float32), b_cs,
                               tol=sv.resid, inner_tol=1e-6,
                               maxiter=sv.nier)
    else:
        res = _sharded_pcg(seop, b_cs, tol=sv.resid, maxiter=sv.nier)
    x = np.asarray(jax.block_until_ready(res.x))[:n_dof]
    return x, int(res.iters), float(res.relres)
