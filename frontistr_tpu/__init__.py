"""frontistr_tpu — a TPU-native finite-element solid-mechanics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of FrontISTR
(large-scale parallel implicit FEM: static linear/nonlinear, implicit/explicit
dynamics, eigenvalue, heat conduction, frequency response), designed for TPU:

- batched, vmapped element integration over element-type blocks (MXU-friendly
  dense micro-matmuls) instead of per-element Fortran loops,
- block-ELL sparse matrices + matrix-free operators instead of CSR,
- jit-compiled Krylov solvers with ``lax.while_loop`` instead of MPI-parallel
  Fortran CG,
- ``jax.sharding`` mesh + collectives instead of MPI halo exchange,
- a pytree ``State`` instead of mutable global structs.

Reads FrontISTR's ``hecmw_ctrl.dat`` / ``.msh`` / ``.cnt`` inputs and writes
compatible log/result files (reference: fistr1/src/main/fistr_main.f90).
"""

import jax as _jax

# FrontISTR is a double-precision code (kreal = float64,
# hecmw1/src/common/hecmw_util_f.F90:15-16).  Mixed/lower precision is opt-in
# per-kernel; the framework default must be f64 for the 1e-8 displacement
# parity target.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from frontistr_tpu.io.hecmw_ctrl import read_hecmw_ctrl  # noqa: E402,F401
from frontistr_tpu.io.meshio import read_mesh  # noqa: E402,F401
from frontistr_tpu.io.ctrlio import read_cnt  # noqa: E402,F401
