"""Pallas TPU kernel for the SoA element matvec.

fe[i, e] = sum_j ke[i, j, e] * xe[j, e]  with e on vector lanes.

XLA's lowering of the fused broadcast-multiply-reduce over the
(24, 24, E) element matrices runs at ~69 GB/s effective (11 ms at 1M
dof); a single-pass Pallas kernel that streams keT through VMEM in
element blocks runs at HBM bandwidth.  Falls back to the jnp expression
on CPU (tests) or when Pallas is unavailable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kernel(ke_ref, xe_ref, out_ref):
    # ke_ref: (m, m, Eb), xe_ref: (m, Eb), out_ref: (m, Eb).
    # Unrolled j-loop of 2D (m, Eb) multiply-accumulates: Mosaic handles
    # rank-2 tiles natively (a fused rank-3 reduce fails to legalize).
    m = xe_ref.shape[0]
    acc = ke_ref[:, 0, :] * xe_ref[0, :][None, :]
    for j in range(1, m):
        acc = acc + ke_ref[:, j, :] * xe_ref[j, :][None, :]
    out_ref[:] = acc


PAD_E = 2048      # element-axis padding unit (lane blocks must be 128k)


def pad_soa(keT):
    """Pad the element axis to a PAD_E multiple (done ONCE at assembly;
    padding inside the Krylov loop would re-copy 757MB per matvec)."""
    E = keT.shape[-1]
    pad = (-E) % PAD_E
    if pad:
        keT = jnp.pad(keT, ((0, 0), (0, 0), (0, pad)))
    return keT


def element_matvec_soa(keT, xeT, block_e: int = 0):
    """(m, m, E_pad), (m, E) -> (m, E) on TPU via Pallas; jnp elsewhere.

    keT's element axis must be padded to a PAD_E multiple (pad_soa)."""
    E = xeT.shape[-1]
    if jax.devices()[0].platform not in ("tpu",):
        return (keT[:, :, :E] * xeT[None, :, :]).sum(axis=1)
    from jax.experimental import pallas as pl
    m, _, E_pad = keT.shape
    if block_e == 0:
        # keep the double-buffered keT block under ~VMEM/2
        block_e = 2048 if keT.dtype == jnp.float32 else 1024
    if E_pad % block_e != 0:
        return (keT[:, :, :E] * xeT[None, :, :]).sum(axis=1)
    if E_pad > E:
        xeT = jnp.pad(xeT, ((0, 0), (0, E_pad - E)))
    grid = (E_pad // block_e,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, E_pad), keT.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, m, block_e), lambda i: (0, 0, i)),
            pl.BlockSpec((m, block_e), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, block_e), lambda i: (0, i)),
    )(keT, xeT)
    return out[:, :E]
