"""Iterative no-elimination contact (KKT saddle MINRES).

The reference's solve_LINEQ_iter_contact.f90:46-109 can solve the
contact saddle system iteratively WITHOUT eliminating the multipliers;
this is the TPU analogue's coverage:

1. forced saddle arm == SLag elimination arm on a plain contact deck;
2. a deck where !EQUATION dofs OVERLAP the contact surfaces (the SLag
   T_c^t T_m^t composition is invalid) now solves through the saddle
   arm instead of dropping the MPC.
"""

import os

import numpy as np
import pytest

from tests.test_contact_mpc import _two_block


def test_saddle_matches_elimination(monkeypatch):
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    model0, _, _ = _two_block(algo="SLAGRANGE")
    res0 = run_nonlinear_static(model0)
    monkeypatch.setenv("FRONTISTR_TPU_CONTACT_SOLVE", "saddle")
    model1, _, _ = _two_block(algo="SLAGRANGE")
    res1 = run_nonlinear_static(model1)
    np.testing.assert_allclose(res1.u, res0.u, rtol=1e-6, atol=1e-11)


def test_saddle_overlapping_mpc(capsys):
    """Tie u3 of two SLAVE nodes (on the contact surface itself): the
    elimination composition is invalid, so the driver must route to the
    saddle arm — and because the tie is symmetric (all slave u3 are
    equal by symmetry), the answer must equal the untied deck's."""
    from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
    from frontistr_tpu.io.meshio import Equation

    model0, _, _ = _two_block(algo="SLAGRANGE")
    res0 = run_nonlinear_static(model0)

    model1, m, _ = _two_block(algo="SLAGRANGE")
    slave = m.node_groups["SLAVE"]
    a, b = int(slave[0]), int(slave[-1])
    m.equations = [Equation(np.asarray([a, b]), np.asarray([3, 3]),
                            np.asarray([1.0, -1.0]), 0.0)]
    res1 = run_nonlinear_static(model1)
    out = capsys.readouterr().out
    assert "no-elimination arm" in out
    np.testing.assert_allclose(res1.u, res0.u, rtol=1e-6, atol=1e-10)
    # the MPC itself holds exactly at the solution
    assert abs(res1.u[a, 2] - res1.u[b, 2]) < 1e-10
