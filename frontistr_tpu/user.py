"""User plug points: the TPU-native uelastic/umat/uload surface.

The reference ships empty Fortran stubs the user recompiles into the
binary (fistr1/src/lib/user/{umat,uelastic,uload}.f90 — uMatlMatrix /
uUpdate / uloading).  Here the plug point is a registry of JAX-traceable
Python callables, applied batched over (element, gauss) points:

    import frontistr_tpu.user as fuser

    @fuser.register_umat("MYMAT")
    def my_material(matl, strain, stress, fstat, dtime, ttime):
        # matl (k,) material constants from the !USER_MATERIAL data rows
        # strain/stress (6,) at one gauss point; fstat (nstatus,)
        D = ...            # (6, 6) tangent
        sig = ...          # (6,) updated stress
        return D, sig, fstat

    @fuser.register_uload
    def my_load(coords, t):
        return f          # (n_node, ndof) additional external force

Functions must be jax-traceable (they are vmapped over all gauss points
and jitted into the Newton tangent/update programs).  CLI runs load the
module named by FRONTISTR_TPU_USER_MODULE (a .py path) before the
analysis dispatch, so decks using '!MATERIAL, TYPE=USER' /
'!USER_MATERIAL' work without touching framework code.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Callable, Dict, Optional

_UMAT: Dict[str, Callable] = {}
_ULOAD: list = []


def register_umat(name: str = "DEFAULT"):
    """Decorator: register a user material update for !USER_MATERIAL.

    fn(matl, strain, stress, fstat, dtime, ttime) -> (D, stress, fstat)
    with per-gauss-point shapes ((k,), (6,), (6,), (ns,)) ->
    ((6, 6), (6,), (ns,)); vmapped over all gauss points."""
    def deco(fn):
        _UMAT[name.upper()] = fn
        return fn
    return deco


def register_uload(fn):
    """Register an additional external-load hook (uloading):
    fn(coords (n_node, 3), t) -> (n_node, ndof) force."""
    _ULOAD.append(fn)
    return fn


def get_umat(name: str = "DEFAULT") -> Optional[Callable]:
    return _UMAT.get((name or "DEFAULT").upper(), _UMAT.get("DEFAULT"))


def uload_total(coords, ndof, t=0.0):
    """Sum of registered uload contributions, or None."""
    if not _ULOAD:
        return None
    import numpy as np
    out = None
    for fn in _ULOAD:
        f = np.asarray(fn(coords, t))
        out = f if out is None else out + f
    return out


def clear():
    _UMAT.clear()
    del _ULOAD[:]


def load_user_module(path: Optional[str] = None):
    """Import the user's plug-in module (FRONTISTR_TPU_USER_MODULE)."""
    path = path or os.environ.get("FRONTISTR_TPU_USER_MODULE")
    if not path:
        return None
    spec = importlib.util.spec_from_file_location("frontistr_tpu_user",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
