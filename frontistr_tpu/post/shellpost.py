"""Shell output assembly: nodal/element strain-stress for MITC shells.

Replicates the reference's fstr_NodalStress6D flow
(fistr1/src/analysis/static/fstr_NodalStress.f90:772-890) including two
deliberate quirks a golden-log match depends on:

1. **Prefix-sum nodal averaging.** The reference calls fstr_getavg_shell
   inside the element loop, and that routine reads the *running* nodal
   accumulation of the PLUS/MINUS surface arrays — so an element processed
   later contributes less.  For a node touched by elements e_1 < e_2 < ...
   < e_n (global processing order) the final nodal value is
   sum_l (n - l + 1)/n * c_l instead of the plain mean of c_l
   (fstr_NodalStress.f90:835-846 + fstr_getavg_shell:302-334).

2. **Element components beyond nn are zero.** fstr_getavg_shell fills
   estrain(j)/estress(j) for j = 1..nn (node index used as component
   index), so quad shells report only components 1-4 and triangles 1-3;
   E23/E13 (and E12 for 731) print as 0.0 in the @Element summary.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from frontistr_tpu.fem.shell import shell_nodal_stress
from frontistr_tpu.post.nodal import mises_3d


def shell_recover(model, u):
    """u: (n_node, 6).  Returns the smooth() result dict."""
    n = model.n_node
    nd_eps = np.zeros((n, 6))
    nd_sig = np.zeros((n, 6))
    count = np.zeros(n)
    est_list, ess_list, ems_list = [], [], []

    # per-element nodal mid-surface values, in global element order
    all_nodes, all_eps, all_sig = [], [], []
    order_base = 0
    for b in model.blocks:
        coords_e = jnp.asarray(model.coords[b.conn])
        ue = jnp.asarray(u[b.conn])
        eps, sig = shell_nodal_stress(coords_e, ue, b.thick,
                                      b.material.youngs,
                                      b.material.poisson, etype=b.etype)
        eps = np.asarray(eps)
        sig = np.asarray(sig)
        E, nn = b.conn.shape
        all_nodes.append(b.conn.reshape(-1))
        # incidence order: element-major (the reference's element loop)
        all_eps.append(eps.reshape(E * nn, 6))
        all_sig.append(sig.reshape(E * nn, 6))
        # element means with the j<=nn component quirk
        est = np.zeros((E, 6))
        ess = np.zeros((E, 6))
        est[:, :nn] = eps.mean(axis=1)[:, :nn]
        ess[:, :nn] = sig.mean(axis=1)[:, :nn]
        est_list.append(est)
        ess_list.append(ess)
        ems_list.append(mises_3d(ess))
        order_base += E

    nodes = np.concatenate(all_nodes)
    epsf = np.concatenate(all_eps)
    sigf = np.concatenate(all_sig)
    # incidence index encodes processing order (element-major already)
    order = np.arange(len(nodes))
    np.add.at(count, nodes, 1.0)
    # prefix-sum weights: for node i's l-th (0-based) contribution in
    # processing order, w = (n_i - l) / n_i
    sorter = np.lexsort((order, nodes))
    ns = nodes[sorter]
    starts = np.r_[0, np.flatnonzero(ns[1:] != ns[:-1]) + 1]
    pos = np.arange(len(ns)) - np.repeat(starts, np.diff(np.r_[starts,
                                                               len(ns)]))
    n_i = count[ns]
    w = (n_i - pos) / n_i
    np.add.at(nd_eps, ns, w[:, None] * epsf[sorter])
    np.add.at(nd_sig, ns, w[:, None] * sigf[sorter])
    nmises = mises_3d(nd_sig)
    return dict(strain=nd_eps, stress=nd_sig, mises=nmises, count=count,
                estrain=est_list, estress=ess_list, emises=ems_list)
