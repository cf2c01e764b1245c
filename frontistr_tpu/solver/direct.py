"""Direct linear solvers (the !SOLVER METHOD=DIRECT / MUMPS / MKL arm).

The reference carries three in-house/wrapped direct factorizations
(hecmw1/src/solver/solver_direct* multifrontal LDL, MUMPS and ClusterMKL
wrappers).  On TPU a sparse factorization has no hardware story — the
TPU-native answer is the iterative path — but the API surface must exist:
this module assembles the operator's blocks into scipy CSR on the host and
LU-factorizes (SuperLU), giving exact solves for small/ill-conditioned
systems and an oracle for tests.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def assemble_csr(kes, dofs_list, n_dof):
    """Element blocks -> scipy CSR."""
    import scipy.sparse as sp
    rows, cols, vals = [], [], []
    for ke, dofs in zip(kes, dofs_list):
        ke = np.asarray(ke)
        dofs = np.asarray(dofs)
        E, m, _ = ke.shape
        r = np.repeat(dofs, m, axis=1).reshape(E, m, m)
        c = np.tile(dofs[:, None, :], (1, m, 1))
        rows.append(r.reshape(-1))
        cols.append(c.reshape(-1))
        vals.append(ke.reshape(-1))
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n_dof, n_dof)).tocsr()
    return A


def solve_direct(op, b, u_fix=None):
    """Constrained direct solve matching FEOperator.apply_constrained
    semantics (P A P + (I-P)) via SuperLU."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    n = op.n_dof
    A = assemble_csr([np.asarray(k) for k in op.kes],
                     [np.asarray(d) for d in op.dofs], n)
    free = np.asarray(op.free_mask)
    P = sp.diags(free)
    Ac = P @ A @ P + sp.diags(1.0 - free)
    # unused free dofs (zero rows) -> identity
    d = Ac.diagonal()
    zero = (d == 0.0)
    if zero.any():
        Ac = Ac + sp.diags(zero.astype(float))
    b = np.asarray(b)
    if u_fix is not None:
        b = (b - A @ (np.asarray(u_fix) * (1.0 - free))) * free + \
            np.asarray(u_fix) * (1.0 - free)
    lu = spla.splu(Ac.tocsc())
    return lu.solve(b)


def solve_direct_lag(kes, dofs_list, n_dof, free, b, Blag, g,
                     u_fix=None):
    """Saddle-point direct solve with contact Lagrange rows
    (solve_LINEQ_direct_serial_lag.f90 capability):

        [ Ac  B^T ] [du ]   [ b ]
        [ B    0  ] [lam] = [ g ]

    Ac is the Dirichlet-constrained operator (P A P + (I-P)); B columns
    on fixed dofs must already be masked (slag.lag_rows does).  Returns
    (du, lam)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    A = assemble_csr([np.asarray(k) for k in kes],
                     [np.asarray(d) for d in dofs_list], n_dof)
    free = np.asarray(free)
    P = sp.diags(free)
    Ac = P @ A @ P + sp.diags(1.0 - free)
    d = Ac.diagonal()
    zero = (d == 0.0)
    if zero.any():
        Ac = Ac + sp.diags(zero.astype(float))
    b = np.asarray(b, dtype=float)
    if u_fix is not None:
        b = (b - A @ (np.asarray(u_fix) * (1.0 - free))) * free + \
            np.asarray(u_fix) * (1.0 - free)
    # drop all-zero constraint rows (fully released / fully fixed slots):
    # they would make the saddle matrix singular
    keep = np.diff(Blag.indptr) > 0
    if not keep.all():
        Blag = Blag[keep]
        g = g[keep]
    if Blag.shape[0] == 0:
        return spla.splu(Ac.tocsc()).solve(b), np.zeros(0)
    K = sp.bmat([[Ac, Blag.T], [Blag, None]], format="csc")
    sol = spla.splu(K).solve(np.concatenate([b, g]))
    return sol[:n_dof], sol[n_dof:]


def solve_direct_al(kes, dofs_list, n_dof, free, b, cdofs, cke,
                    u_fix=None):
    """Direct solve with AL-penalty contact blocks folded into the
    assembly (the reference's direct arm under kcaALagrange): the
    contact stiffness enters like extra elements."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    A = assemble_csr([np.asarray(k) for k in kes] + [np.asarray(cke)],
                     [np.asarray(d) for d in dofs_list] +
                     [np.asarray(cdofs)], n_dof)
    free = np.asarray(free)
    P = sp.diags(free)
    Ac = P @ A @ P + sp.diags(1.0 - free)
    d = Ac.diagonal()
    zero = (d == 0.0)
    if zero.any():
        Ac = Ac + sp.diags(zero.astype(float))
    b = np.asarray(b, dtype=float)
    if u_fix is not None:
        b = (b - A @ (np.asarray(u_fix) * (1.0 - free))) * free + \
            np.asarray(u_fix) * (1.0 - free)
    return spla.splu(Ac.tocsc()).solve(b)
