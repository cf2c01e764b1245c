"""Worker for tests/test_multihost.py — one process of a 2-process
jax.distributed CPU run (gloo collectives over localhost), exercising the
real `maybe_init_distributed` initialized branch that single-process CI
can never reach.

Reference semantics being re-created: the MPI rank join + halo-exchanged
solve of hecmw_comm_f.F90:669-841 — here ONE GSPMD program spans both
processes and XLA/gloo carries the cross-process legs.

Usage: python _mh_worker.py <outfile.npz>
Env (set by the parent test): FRONTISTR_TPU_COORDINATOR / _NUM_PROCESSES /
_PROCESS_ID (absent for the 1-process reference run), XLA_FLAGS with
--xla_force_host_platform_device_count so the GLOBAL device count is 4
either way (4 local for the reference, 2+2 for the distributed pair).
"""

import os
import sys

import numpy as np


def main(outfile: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from frontistr_tpu.parallel.multihost import maybe_init_distributed

    state = maybe_init_distributed()
    nproc = int(os.environ.get("FRONTISTR_TPU_NUM_PROCESSES", "1"))
    assert state["n_processes"] == nproc, state
    assert state["initialized"] == (nproc > 1), state

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from frontistr_tpu.parallel.spmd import (device_mesh,
                                             make_sharded_newton_step)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _small_model

    devs = jax.devices()
    assert len(devs) == 4, f"want 4 global devices, got {devs}"

    mesh_obj, conn, n_node, ndof, D1, fixed, f = _small_model(4, 4, 8)
    jmesh = device_mesh(4)
    step, info = make_sharded_newton_step(jmesh, 361, conn, n_node, ndof,
                                          D1, fixed, cg_iters=40)
    n_tot = info["n_tot"]
    f_pad = np.zeros(n_tot)
    f_pad[:len(f)] = f
    f_d = jax.device_put(jnp.asarray(f_pad), info["nd_sharding"])
    coords_d = jax.device_put(jnp.asarray(mesh_obj.coords),
                              info["replicated"])
    u = jax.block_until_ready(step(coords_d, f_d))
    ug = np.asarray(multihost_utils.process_allgather(
        u, tiled=True))[:n_node * ndof]
    assert np.isfinite(ug).all() and np.abs(ug).max() > 0.0
    if state["process_id"] == 0:
        np.savez(outfile, u=ug, n_processes=nproc)
    multihost_utils.sync_global_devices("mh_worker_done")


if __name__ == "__main__":
    main(sys.argv[1])
