"""Extra linear stiffness contributions: !SPRING and !EQUATION (MPC).

Both are expressed as additional element-like blocks (conn, ke, f) that ride
the same gather/incidence machinery as real elements:

- springs (fstr_AddSPRING, fistr1/src/analysis/static/fstr_Spring.f90):
  one-node blocks with k on the (dof,dof) diagonal; residual k*u.
- MPC equations via the penalty method (hecmw_mat_ass_equation penalty arm):
  per equation  K += p * c c^T  over the involved (node,dof)s and
  f += p * const * c, with p = mpc_penalty (cfg, default 1e10) scaled by
  the mean stiffness diagonal.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def spring_blocks(mesh, cfg, ndof: int, grpid_filter=None):
    """[(conn (E,1), ke (E,ndof,ndof))]."""
    from frontistr_tpu.assembly.model import _resolve_node_group
    out = []
    for c in cfg.springs:
        gid = c.iparam("GRPID", 1)
        if grpid_filter is not None and gid not in grpid_filter:
            continue
        for row in c.data:
            grp, d, val = row[0], int(float(row[1])), float(row[2])
            nodes = _resolve_node_group(mesh, grp)
            if len(nodes) == 0 or d > ndof:
                continue
            E = len(nodes)
            ke = np.zeros((E, ndof, ndof))
            ke[:, d - 1, d - 1] = val
            out.append((nodes.reshape(E, 1).astype(np.int32), ke))
    return out


def collect_extras(model, grpid_filter=None):
    """Returns (conns, dofs, kes, nns) spring blocks to append to the
    element blocks of any driver."""
    ndof = model.ndof
    conns, dofs, kes, nns = [], [], [], []
    for conn, ke in spring_blocks(model.mesh, model.cfg, ndof,
                                  grpid_filter):
        E, nn = conn.shape
        d = (conn[:, :, None] * ndof +
             np.arange(ndof)[None, None, :]).reshape(E, nn * ndof)
        conns.append(conn)
        dofs.append(d.astype(np.int32))
        kes.append(ke)
        nns.append(nn)
    return conns, dofs, kes, nns


def mpc_arrays(mesh, ndof: int, n_dof_total: int):
    """!EQUATION elimination tables in pytree-argument form for jitted
    solvers (None when the mesh has no equations).

    The traced helpers below (mpc_T/mpc_Tt/mpc_wrap/mpc_reduce_rhs/
    mpc_recover) are the stateless twins of MPCEliminator — every array
    rides through the jit boundary as an argument, so the same code path
    works single-device and GSPMD-sharded.  n_dof_total may be PADDED
    (sharded solvers): dof indices are in real numbering, padded rows are
    never dependent (mask = 1 there)."""
    elim = MPCEliminator(mesh, ndof, n_dof_total)
    if not elim.active:
        return None
    import jax.numpy as jnp
    mask = np.ones(n_dof_total)
    mask[np.asarray(elim.dep)] = 0.0
    return dict(dep=elim.dep, mast=elim.mast, coef=elim.coef,
                const=elim.const, mask=jnp.asarray(mask))


def mpc_T(m, x):
    """Expand: set dependent dofs from masters (u = T u_r)."""
    vals = (m["coef"].astype(x.dtype) * x[m["mast"]]).sum(axis=1)
    return x.at[m["dep"]].set(vals)


def mpc_Tt(m, y):
    """Reduce: accumulate dependent rows into masters, zero them."""
    add = m["coef"].astype(y.dtype) * y[m["dep"]][:, None]
    y = y.at[m["mast"].reshape(-1)].add(add.reshape(-1))
    return y * m["mask"].astype(y.dtype)


def mpc_g(m, x_like, factor):
    import jax.numpy as jnp
    g = jnp.zeros_like(x_like)
    return g.at[m["dep"]].set(m["const"].astype(g.dtype) * factor)


def mpc_wrap(m, A):
    """A_r(x) = T^T A T (x masked) + identity on dependent dofs."""
    if m is None:
        return A

    def apply(x):
        mask = m["mask"].astype(x.dtype)
        return mpc_Tt(m, A(mpc_T(m, x * mask))) + x * (1.0 - mask)
    return apply


def mpc_reduce_rhs(m, A, b, factor=0.0):
    return mpc_Tt(m, b - A(mpc_g(m, b, factor)))


def mpc_recover(m, x, factor=0.0):
    return mpc_T(m, x * m["mask"].astype(x.dtype)) + mpc_g(m, x, factor)


class MPCEliminator:
    """!EQUATION handling by dependent-dof elimination:
        u = T u_r + g,   K_r = T^T K T,   b_r = T^T (b - K g)
    — the operator-level equivalent of HEC-MW's T K T^t MPC elimination
    (hecmw1/src/solver/matrix/hecmw_local_matrix.f90 trimatmul; dependent
    dof = the equation's first (node,dof), fstr_Update_NDForce_MPC).
    """

    def __init__(self, mesh, ndof: int, n_dof_total: int):
        import jax.numpy as jnp
        deps, masters, coefs, consts = [], [], [], []
        maxm = 1
        for eq in mesh.equations:
            if len(eq.nodes) == 0:
                continue
            if int(np.max(eq.dofs)) > ndof:
                # e.g. structural-dof equations on a heat (ndof=1) run
                print("### WARNING: !EQUATION references dof "
                      f"{int(np.max(eq.dofs))} > ndof {ndof}; skipped")
                continue
            d0 = int(eq.nodes[0]) * ndof + int(eq.dofs[0]) - 1
            c0 = float(eq.coefs[0])
            ms = [int(n) * ndof + int(dd) - 1
                  for n, dd in zip(eq.nodes[1:], eq.dofs[1:])]
            cs = [-float(c) / c0 for c in eq.coefs[1:]]
            deps.append(d0)
            masters.append(ms)
            coefs.append(cs)
            consts.append(float(eq.const) / c0)
            maxm = max(maxm, len(ms))
        self.active = len(deps) > 0
        if not self.active:
            return
        K = len(deps)
        m_arr = np.zeros((K, maxm), np.int64)
        c_arr = np.zeros((K, maxm))
        for k in range(K):
            m_arr[k, :len(masters[k])] = masters[k]
            c_arr[k, :len(coefs[k])] = coefs[k]
        self.dep = jnp.asarray(np.asarray(deps, np.int64))
        self.mast = jnp.asarray(m_arr)
        self.coef = jnp.asarray(c_arr)
        self.const = jnp.asarray(np.asarray(consts))
        self.dep_mask_np = np.ones(n_dof_total)
        self.dep_mask_np[np.asarray(deps)] = 0.0
        self.dep_mask = jnp.asarray(self.dep_mask_np)

    def T(self, x):
        """Expand reduced vector: set dependent dofs from masters."""
        if not self.active:
            return x
        import jax.numpy as jnp
        vals = (self.coef * x[self.mast]).sum(axis=1)
        return x.at[self.dep].set(vals)

    def Tt(self, y):
        """Reduce: accumulate dependent rows into masters, zero them."""
        if not self.active:
            return y
        add = self.coef * y[self.dep][:, None]
        y = y.at[self.mast.reshape(-1)].add(add.reshape(-1))
        return y * self.dep_mask

    def g(self, n_dof_total, factor=1.0):
        import jax.numpy as jnp
        g = jnp.zeros(n_dof_total)
        if self.active:
            g = g.at[self.dep].set(self.const * factor)
        return g

    def wrap(self, A):
        """A_r(x) = T^T A T x + (I - P_dep) identity on dependent dofs."""
        if not self.active:
            return A

        def apply(x):
            y = self.Tt(A(self.T(x * self.dep_mask)))
            return y + x * (1.0 - self.dep_mask)
        return apply

    def recover(self, x, factor=1.0):
        if not self.active:
            return x
        return self.T(x * self.dep_mask) + self.g(x.shape[0], factor)

    def reduce_rhs(self, A, b, factor=1.0):
        if not self.active:
            return b
        g = self.g(b.shape[0], factor)
        return self.Tt(b - A(g))
