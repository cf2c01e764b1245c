"""Multi-host execution: jax.distributed wiring for DCN-connected pods.

The reference scales across hosts with MPI ranks + halo exchange
(hecmw1/src/solver/communication/hecmw_comm_f.F90:14-393); the TPU
design keeps ONE program and grows the device mesh instead: every
sharded solve in this repo partitions over whatever `jax.devices()`
returns, so once the processes are joined into one runtime the same
GSPMD programs span hosts — XLA routes intra-host collectives over ICI
and cross-host legs over DCN.

Activation (before any other JAX use — run.py calls this first):

    FRONTISTR_TPU_COORDINATOR=<host:port>   coordinator address
    FRONTISTR_TPU_NUM_PROCESSES=<n>         world size
    FRONTISTR_TPU_PROCESS_ID=<i>            this process's rank

or the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID set, in which case `jax.distributed.initialize()` reads
them itself.  Single-process runs (none of the above set) are a no-op.

This image has one host, so multi-host execution is exercised only as
the single-process no-op + argument plumbing; the mesh-shaped design
it enables is the same one the 1-vs-8 virtual-device suite validates.
"""

from __future__ import annotations

import os


def maybe_init_distributed() -> dict:
    """Join a multi-host JAX runtime if requested via env; no-op else.

    Returns {"initialized": bool, "process_id": int, "n_processes": int}.
    Idempotent: a second call returns the recorded state.
    """
    if getattr(maybe_init_distributed, "_state", None) is not None:
        return maybe_init_distributed._state

    coord = os.environ.get("FRONTISTR_TPU_COORDINATOR") \
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("FRONTISTR_TPU_NUM_PROCESSES") \
        or os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("FRONTISTR_TPU_PROCESS_ID") \
        or os.environ.get("JAX_PROCESS_ID")

    state = {"initialized": False, "process_id": 0, "n_processes": 1}
    if coord and nproc and int(nproc) > 1:
        import jax
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid or 0))
        state = {"initialized": True,
                 "process_id": int(pid or 0),
                 "n_processes": int(nproc)}
        print(f"### multi-host: joined process {state['process_id']}"
              f"/{state['n_processes']} at {coord}")
    maybe_init_distributed._state = state
    return state


def global_device_count() -> int:
    """Devices across ALL joined hosts (== local count single-host)."""
    import jax
    return len(jax.devices())
