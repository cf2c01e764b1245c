"""Multi-host (multi-process) execution: 1-vs-2-process equality.

Launches the SAME sharded Newton step (a) in one process with 4 virtual
CPU devices and (b) as a real 2-process jax.distributed run (2 local
devices each, gloo collectives over localhost) joined through
`frontistr_tpu.parallel.multihost.maybe_init_distributed` — the branch
single-process CI can never execute.  The GSPMD program is identical;
only the process partitioning differs, so the displacement vectors must
match to solver tolerance.

Reference counterpart: MPI rank join + halo exchange
(hecmw1/src/solver/communication/hecmw_comm_f.F90:669-841).
"""

import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env(dev_count: int) -> dict:
    env = dict(os.environ)
    for k in ("FRONTISTR_TPU_COORDINATOR", "FRONTISTR_TPU_NUM_PROCESSES",
              "FRONTISTR_TPU_PROCESS_ID", "JAX_COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
              "FRONTISTR_TPU_SHARDS"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dev_count}")
    return env


def _run(env: dict, outfile: str) -> subprocess.Popen:
    return subprocess.Popen([sys.executable, WORKER, outfile],
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def test_two_process_equals_one_process(tmp_path):
    ref_out = str(tmp_path / "ref.npz")
    mh_out = str(tmp_path / "mh.npz")

    # reference: single process, 4 local virtual devices
    p = _run(_clean_env(4), ref_out)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"reference run failed:\n{out[-3000:]}"

    # distributed: 2 processes x 2 devices, joined via gloo
    port = _free_port()
    procs = []
    for rank in range(2):
        env = _clean_env(2)
        env["FRONTISTR_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
        env["FRONTISTR_TPU_NUM_PROCESSES"] = "2"
        env["FRONTISTR_TPU_PROCESS_ID"] = str(rank)
        procs.append(_run(env, mh_out))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"rank {rank} failed:\n{out[-3000:]}"
    assert "### multi-host: joined process 0/2" in outs[0]

    ref = np.load(ref_out)
    mh = np.load(mh_out)
    assert int(mh["n_processes"]) == 2
    np.testing.assert_allclose(mh["u"], ref["u"], rtol=1e-6, atol=1e-10)
