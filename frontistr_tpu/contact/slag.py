"""Exact-Lagrange (SLAGRANGE) contact: slave-dof elimination.

The reference's default contact algorithm eliminates each active contact
constraint exactly by expressing one slave dof through the master-face
dofs (T K T^t, solve_LINEQ_iter_contact.f90:115-500 choose_slaves /
make_BTmat / make_BTtmat), instead of the augmented-Lagrange penalty.

TPU design: fixed-shape constraint slots (one per slave node) with an
active mask, so the jitted solve never recompiles as the active set
changes.  Per active slave s with unit outward normal n and face shape
values shp_k:

    n . u_s - sum_k shp_k (n . u_mk) = -gap        (gap closure)

The dependent dof is the slave component with the largest |n_d|
(choose_slaves' pivot rule); the remaining slave components and all
master dofs become masters of the constraint.  Contact pressure is
recovered from the eliminated residual at the slave row and drives the
active-set release (lambda < 0 -> open).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class ContactEliminator:
    """Fixed-slot dynamic T K T^t eliminator for N2S contact."""

    MAXM = 14 + 1   # 4 master nodes x 3 dofs + 2 slave dofs (+ pad)

    def __init__(self, n_dof_total: int, ndof: int):
        self.n = n_dof_total
        self.ndof = ndof

    def build(self, proj, slave_nodes, active):
        """Host: constraint arrays from a search projection.

        Returns a pytree dict consumed by the jitted solve."""
        nrm = proj["normal"]
        shp = proj["shape"]
        conn = proj["conn"]                # (Ns, 1+4) node idx
        gap = proj["gap"]
        Ns, width = conn.shape
        nd = self.ndof
        dmax = np.argmax(np.abs(nrm), axis=1)           # pivot component
        dep = slave_nodes * nd + dmax
        c0 = nrm[np.arange(Ns), dmax]
        c0 = np.where(np.abs(c0) < 1e-12, 1.0, c0)
        mast = np.zeros((Ns, self.MAXM), np.int64)
        coef = np.zeros((Ns, self.MAXM))
        for s in range(Ns):
            k = 0
            for d in range(nd):
                if d == dmax[s]:
                    continue
                mast[s, k] = slave_nodes[s] * nd + d
                coef[s, k] = -nrm[s, d] / c0[s]
                k += 1
            for m in range(1, width):
                for d in range(nd):
                    mast[s, k] = conn[s, m] * nd + d
                    coef[s, k] = shp[s, m - 1] * nrm[s, d] / c0[s]
                    k += 1
        const = -gap / c0
        act = active.astype(np.float64)
        return dict(dep=jnp.asarray(dep), mast=jnp.asarray(mast),
                    coef=jnp.asarray(coef * act[:, None]),
                    const=jnp.asarray(const * act),
                    act=jnp.asarray(act), c0=jnp.asarray(c0))

    # ---- traced ops (cn = the dict from build, possibly a tracer) ----
    def dep_mask(self, cn):
        m = jnp.ones(self.n)
        return m.at[cn["dep"]].add(-cn["act"])   # 0 where active

    def T(self, cn, x):
        vals = (cn["coef"] * x[cn["mast"]]).sum(axis=1)
        keep = x[cn["dep"]]
        return x.at[cn["dep"]].set(
            jnp.where(cn["act"] > 0, vals, keep))

    def Tt(self, cn, y):
        add = cn["coef"] * (y[cn["dep"]] * cn["act"])[:, None]
        y = y.at[cn["mast"].reshape(-1)].add(add.reshape(-1))
        return y * self.dep_mask(cn)

    def g(self, cn):
        return jnp.zeros(self.n).at[cn["dep"]].add(cn["const"])

    def wrap(self, cn, A):
        dm = self.dep_mask(cn)

        def apply(x):
            y = self.Tt(cn, A(self.T(cn, x * dm)))
            return y + x * (1.0 - dm)
        return apply

    def recover(self, cn, x):
        return self.T(cn, x * self.dep_mask(cn)) + self.g(cn)

    def reduce_rhs(self, cn, A, b):
        return self.Tt(cn, b - A(self.g(cn)))

    def lagrange(self, cn, B):
        """Contact pressure per slot from the UNreduced residual at the
        dependent dof: the eliminated row carries -lambda * c0."""
        return -B[cn["dep"]] / cn["c0"] * cn["act"]


def lag_rows(proj, slave_nodes, act, ndof, n_dof, free=None):
    """Host: active contact constraints as explicit Lagrange rows
    B du = g for the direct saddle-point path (make_BTmat analog,
    solve_LINEQ_direct_serial_lag.f90).  Row per active slot:
    +n on the slave dofs, -shp_k n on the master-face dofs; g = -gap.
    Dirichlet-fixed columns are masked out via `free`."""
    import scipy.sparse as sp
    nrm = proj["normal"]
    shp = proj["shape"]
    conn = proj["conn"]
    gap = proj["gap"]
    dim = nrm.shape[1]
    idx = np.nonzero(np.asarray(act))[0]
    rows, cols, vals, g = [], [], [], []
    for r, s in enumerate(idx):
        for d in range(dim):
            rows.append(r)
            cols.append(int(slave_nodes[s]) * ndof + d)
            vals.append(nrm[s, d])
        for m in range(1, conn.shape[1]):
            for d in range(dim):
                rows.append(r)
                cols.append(int(conn[s, m]) * ndof + d)
                vals.append(-shp[s, m - 1] * nrm[s, d])
        g.append(-gap[s])
    B = sp.coo_matrix((vals, (rows, cols)),
                      shape=(len(idx), n_dof)).tocsr()
    if free is not None:
        B = B.multiply(np.asarray(free)[None, :]).tocsr()
    return B, np.asarray(g, dtype=float)
