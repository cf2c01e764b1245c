"""Cluster-ELL operator: the fast general-mesh SpMV on TPU.

TPU gathers are row-rate-limited (~200 Mrow/s regardless of row size up
to ~1 KB), so the scalar block-ELL matvec — N*W rows of nd floats — is
gather-bound (38 ms at 1M-dof tet).  Grouping G=8 consecutive nodes into
clusters multiplies the bytes per gathered row by G and divides the row
count by ~G*G/Wc ratio: the same matrix moves as C*Wc rows of G*nd
floats (0.6M rows / 60 MB at 1M dof) and the multiply becomes a
(G*nd, G*nd) x (G*nd,) batched GEMM that streams the blocks at HBM
bandwidth.  Measured 7 ms/matvec at 1M-dof tet vs 38 ms scalar-ELL and
404 ms incidence-gather (this file's ancestors), vs the reference's CSR
SpMV (hecmw1/src/solver/las/hecmw_solver_las_33.f90:135-351).

Storage is plane-major (G*nd, G*nd, Wc, C): the big C axis lands on TPU
lanes, so the blocks stream without tile padding.  Cluster fill-in (node
pairs stored as zero inside a touched cluster pair) costs ~5-7x the
scalar-ELL bytes on tet meshes — HBM is the cheap resource; gather rows
are the scarce one.

Assembly reuses the scalar ELL entry planes (pair order (a, b, e)) with
a cluster-layout destination map, so the segment-sum cost is identical
to assembly/ell.py.  The diagonal nd x nd blocks ride along for the
block-Jacobi / AMG preconditioners.

A retired Pallas variant (ops/ell_spmv.py, removed) windowed the
gathers by hand inside a kernel; it measured no faster than this
XLA-gathered layout because the row-rate limit applies to in-kernel
dynamic slices too — the win comes from the layout (fewer, fatter
rows), not from hand-scheduling, so the Pallas arm was deleted.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from frontistr_tpu.assembly import ell as ellmod


@dataclasses.dataclass
class ClusterProfile:
    """Host-built cluster-ELL sparsity (registered pytree; pass
    ``.device()`` through jit boundaries as an argument)."""
    n_node: int
    ndof: int
    G: int                       # nodes per cluster
    C: int                       # clusters
    Wc: int                      # max neighbor clusters
    ccols: np.ndarray            # (C, Wc) int32, padded with row cluster
    diag_wc: np.ndarray          # (C,) int32: wc of the c->c slot
    perm: np.ndarray             # (P,) int32 sorts pair entries by slot2
    seg_sorted: np.ndarray       # (P,) int32 slot2, sorted
    scal_src: np.ndarray         # (N, W) int32 slot2 of each scalar slot
    pair_counts: tuple

    @property
    def n_slots(self) -> int:
        return self.C * self.Wc * self.G * self.G

    def pallas_assemble(self, nns):
        """Cached MXU segment-sum assembly (blocks, raw) for this
        profile (see ellmod.ELLProfile.pallas_assemble)."""
        cache = getattr(self, "_pal", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_pal", cache)
        key = tuple(int(n) for n in nns)
        fn = cache.get(key)
        if fn is None:
            from frontistr_tpu.assembly import segsum_pallas as sp
            nd, G, C, Wc = self.ndof, self.G, self.C, self.Wc

            def post(planes):
                return _planes_to_blocks(planes, nd, G, Wc, C), planes
            fn = sp.make_planes_segsum(self.seg_sorted, self.n_slots,
                                       self.perm, nd, key, post)
            cache[key] = fn
        return fn

    def device(self) -> "ClusterProfile":
        if not hasattr(self, "_dev"):
            object.__setattr__(self, "_dev", ClusterProfile(
                n_node=self.n_node, ndof=self.ndof, G=self.G, C=self.C,
                Wc=self.Wc, ccols=jnp.asarray(self.ccols),
                diag_wc=jnp.asarray(self.diag_wc),
                perm=jnp.asarray(self.perm),
                seg_sorted=jnp.asarray(self.seg_sorted),
                scal_src=jnp.asarray(self.scal_src),
                pair_counts=tuple(self.pair_counts)))
        return self._dev


jax.tree_util.register_dataclass(
    ClusterProfile,
    data_fields=["ccols", "diag_wc", "perm", "seg_sorted", "scal_src"],
    meta_fields=["n_node", "ndof", "G", "C", "Wc", "pair_counts"])


def build_cluster_profile(conns: Sequence[np.ndarray], n_node: int,
                          ndof: int, G: int = 8,
                          scalar: Optional[ellmod.ELLProfile] = None
                          ) -> ClusterProfile:
    """Symbolic cluster assembly.  Nodes n belong to cluster n // G
    (band-ordered meshes keep Wc small; reorder first for wild meshes)."""
    C = (n_node + G - 1) // G
    rows_l, cols_l, counts = [], [], []
    for c in conns:
        E, nn = c.shape
        ct = c.T
        rows_l.append(np.repeat(ct[:, None, :], nn, axis=1).reshape(-1))
        cols_l.append(np.broadcast_to(ct[None, :, :],
                                      (nn, nn, E)).reshape(-1))
        counts.append(E * nn * nn)
    rows = np.concatenate(rows_l).astype(np.int64)
    colsv = np.concatenate(cols_l).astype(np.int64)
    cr, cq = rows // G, colsv // G
    key = cr * C + cq
    from frontistr_tpu.assembly import profsort
    uniq = profsort.unique_sorted(key)
    ur, uc = uniq // C, (uniq % C).astype(np.int32)
    cnt = np.bincount(ur, minlength=C)
    Wc = max(int(cnt.max()) if len(cnt) else 1, 1)
    ccols = np.repeat(np.arange(C, dtype=np.int32)[:, None], Wc, axis=1)
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(cnt, out=starts[1:])
    within = np.arange(len(uniq), dtype=np.int64) - starts[ur]
    ccols[ur, within] = uc
    # wc per unique cluster pair, then per raw entry
    wc_of_pair = np.full(len(uniq), 0, np.int64)
    wc_of_pair[:] = within
    pair_idx = np.searchsorted(uniq, key)
    wc = wc_of_pair[pair_idx]
    # slot order (aoff, boff, wc, c): the per-plane segment-sum output is
    # then (G, G, Wc, C) with the big (Wc, C) axes MINOR — the later
    # permutation to (G*nd, G*nd, Wc, C) only moves small major dims and
    # never re-tiles (a (c, wc, aoff, boff) order pads the (8,8) minor to
    # (8,128): 16x, 24 GB at 1M dof)
    slot2 = (((rows % G) * G + colsv % G) * Wc + wc) * C + cr
    perm = profsort.stable_argsort(slot2.astype(np.int64))
    seg_sorted = slot2[perm].astype(np.int32)
    diag_wc = np.zeros(C, np.int32)
    isd = ur == uc
    diag_wc[ur[isd]] = within[isd].astype(np.int32)
    # scalar-slot -> slot2 map (for AMG / diag extraction)
    if scalar is None:
        scalar = ellmod.build_profile(conns, n_node, ndof)
    N, W = scalar.cols.shape
    n_idx = np.repeat(np.arange(N, dtype=np.int64), W)
    m_idx = scalar.cols.reshape(-1).astype(np.int64)
    scr, scq = n_idx // G, m_idx // G
    skey = scr * C + scq
    s_pair = np.searchsorted(uniq, skey)
    swc = wc_of_pair[np.clip(s_pair, 0, len(uniq) - 1)]
    scal_src = ((((n_idx % G) * G + m_idx % G) * Wc + swc) * C + scr) \
        .astype(np.int32).reshape(N, W)
    # scalar ELL pads each row's tail with (n, n): those slots would
    # alias the REAL diagonal cluster entry — redirect them to the last
    # raw slot + mark it zero via n_slots sentinel handled in extraction.
    # Real slots are the first per_row positions (ell.build_profile fills
    # real columns first, padding after).
    nkey = rows * np.int64(n_node) + colsv
    upairs = profsort.unique_sorted(nkey)
    per_row_s = np.bincount((upairs // n_node).astype(np.int64),
                            minlength=N)
    pad_mask = (np.arange(W)[None, :] >= per_row_s[:, None])
    scal_src[pad_mask] = -1
    return ClusterProfile(
        n_node=n_node, ndof=ndof, G=G, C=C, Wc=Wc, ccols=ccols,
        diag_wc=diag_wc, perm=perm.astype(np.int32),
        seg_sorted=seg_sorted, scal_src=scal_src,
        pair_counts=tuple(counts))


def _planes_to_blocks(planes, nd: int, G: int, Wc: int, C: int):
    """nd*nd slot planes (each (G*G*Wc*C,) in slot2 order) -> cluster
    blocks (G*nd, G*nd, Wc, C).  Only small MAJOR dims are stacked; the
    (Wc, C) minor tiles are untouched (no re-tile)."""
    six = jnp.stack([
        jnp.stack([planes[i * nd + j].reshape(G, G, Wc, C)
                   for j in range(nd)], axis=2)          # (G,G,nd,Wc,C)
        for i in range(nd)], axis=1)                     # (G,nd,G,nd,Wc,C)
    return six.reshape(G * nd, G * nd, Wc, C)


def assemble_cluster(profile: ClusterProfile, kes: Sequence[jnp.ndarray],
                     nns: Sequence[int]):
    """Numeric assembly to plane-major cluster blocks
    (G*nd, G*nd, Wc, C).  Same sorted 9-plane segment-sum as
    ell.assemble_blocks, cluster-layout destinations.

    The raw slot values travel as a TUPLE of nd*nd (n_slots,) planes —
    a (n_slots, nd*nd) matrix is physically illegal at 1M dof on TPU in
    either orientation: minor-tile padding blows (41M, 9) to 21 GB and
    (9, 41M) past the 2^31-byte addressing limit."""
    nd, G, C, Wc = (profile.ndof, profile.G, profile.C, profile.Wc)
    planes = []
    for ke, nn in zip(kes, nns):
        E = ke.shape[0]
        kr = ke.reshape(E, nn, nd, nn, nd)
        planes.append(jnp.transpose(kr, (2, 4, 1, 3, 0))
                      .reshape(nd * nd, nn * nn * E))
    ent = jnp.concatenate(planes, axis=1)
    outs = []
    for p in range(nd * nd):
        sp = ent[p][profile.perm]
        outs.append(jax.ops.segment_sum(sp, profile.seg_sorted,
                                        num_segments=profile.n_slots,
                                        indices_are_sorted=True))
    raw = tuple(outs)
    return _planes_to_blocks(raw, nd, G, Wc, C), raw


@dataclasses.dataclass
class ClusterOperator:
    """Constrained stiffness operator over cluster-ELL blocks (pytree).

    API-compatible subset of ELLOperator: matvec / apply_constrained /
    constrained_rhs / block_jacobi / astype."""
    blocks: jnp.ndarray          # (G*nd, G*nd, Wc, C)
    ccols: jnp.ndarray           # (C, Wc) int32
    diag: jnp.ndarray            # (N, nd, nd) nodal diagonal blocks
    n_node: int
    ndof: int
    G: int
    free_mask: jnp.ndarray       # (N*nd,)

    @property
    def C(self) -> int:
        return self.blocks.shape[3]

    @property
    def n_dof(self) -> int:
        return self.n_node * self.ndof

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        nd, G, C = self.ndof, self.G, self.C
        m = G * nd
        xp = jnp.pad(x, (0, C * m - x.shape[0]))
        xc = xp.reshape(C, m)
        xg = xc[self.ccols]                      # (C, Wc, m) row gather
        xgP = jnp.transpose(xg, (2, 1, 0))       # (m, Wc, C)
        y = jnp.einsum("abwc,bwc->ac", self.blocks, xgP,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.transpose(y).reshape(-1)[:x.shape[0]]

    def apply_constrained(self, x: jnp.ndarray) -> jnp.ndarray:
        xm = x * self.free_mask
        y = self.matvec(xm)
        return y * self.free_mask + x * (1.0 - self.free_mask)

    def constrained_rhs(self, f: jnp.ndarray, u_fix: jnp.ndarray):
        y = self.matvec(u_fix)
        return (f - y) * self.free_mask + u_fix * (1.0 - self.free_mask)

    def block_jacobi(self):
        from frontistr_tpu.fem.isoparam import det_inv_small
        from frontistr_tpu.utils.linalg import gauss_jordan_inv
        nd = self.ndof
        fm = self.free_mask.reshape(self.n_node, nd)
        D = self.diag * (fm[:, :, None] * fm[:, None, :])
        dd = D[:, jnp.arange(nd), jnp.arange(nd)]
        D = D.at[:, jnp.arange(nd), jnp.arange(nd)].add(
            jnp.where(dd == 0.0, jnp.ones_like(dd), jnp.zeros_like(dd)))
        if nd == 1:
            Dinv = 1.0 / D
        elif nd in (2, 3):
            _, Dinv = det_inv_small(D)
        else:
            Dinv = gauss_jordan_inv(D)

        def apply(r):
            rn = r.reshape(self.n_node, nd)
            return jnp.einsum("nij,nj->ni", Dinv, rn).reshape(-1)

        return apply

    def astype(self, dtype) -> "ClusterOperator":
        return ClusterOperator(
            blocks=self.blocks.astype(dtype), ccols=self.ccols,
            diag=self.diag.astype(dtype), n_node=self.n_node,
            ndof=self.ndof, G=self.G,
            free_mask=self.free_mask.astype(dtype))


jax.tree_util.register_dataclass(
    ClusterOperator,
    data_fields=["blocks", "ccols", "diag", "free_mask"],
    meta_fields=["n_node", "ndof", "G"])


def extract_scalar_blocks(cprof: ClusterProfile, raw: jnp.ndarray,
                          scalar: ellmod.ELLProfile):
    """Scalar block PLANES gathered out of the raw cluster slot planes —
    feeds the AMG Galerkin setup without a second assembly.  Returns a
    tuple of nd*nd (N, W) planes (a (N, W, nd, nd) array is physically
    21 GB at 1M dof under (8,128) minor tiling — the tet-bench OOM;
    setup_amg consumes the planes directly)."""
    nd = cprof.ndof
    N, W = scalar.cols.shape
    src = cprof.scal_src.reshape(-1)
    src0 = jnp.maximum(src, 0)
    live = (src >= 0).astype(raw[0].dtype)
    return tuple((raw[p][src0] * live).reshape(N, W)
                 for p in range(nd * nd))


def extract_diag(cprof: ClusterProfile, raw) -> jnp.ndarray:
    """Nodal diagonal nd x nd blocks from the raw cluster slot planes."""
    nd, G, C, Wc = cprof.ndof, cprof.G, cprof.C, cprof.Wc
    N = cprof.n_node
    n = jnp.arange(N, dtype=jnp.int32)
    c, off = n // G, n % G
    src = ((off * G + off) * Wc + cprof.diag_wc[c]) * C + c
    return jnp.stack([jnp.stack([raw[i * nd + j][src]
                                 for j in range(nd)], axis=-1)
                      for i in range(nd)], axis=1)       # (N, nd, nd)


_CPROFILE_CACHE: dict = {}


def cluster_profile_from_model(model,
                               scalar: Optional[ellmod.ELLProfile] = None,
                               n_node: Optional[int] = None
                               ) -> ClusterProfile:
    ex_conns = getattr(model, "extras", ([], [], [], []))[0]
    conns = [b.conn for b in model.blocks] + list(ex_conns)
    nn = model.n_node if n_node is None else n_node
    key = ellmod._profile_key(conns, nn, model.ndof) + "-bell"
    prof = _CPROFILE_CACHE.get(key)
    if prof is None:
        prof = _disk_load(conns, nn, model.ndof)
        if prof is None:
            prof = build_cluster_profile(conns, nn, model.ndof,
                                         scalar=scalar)
            _disk_save(conns, nn, model.ndof, prof)
        _CPROFILE_CACHE.clear()
        _CPROFILE_CACHE[key] = prof
    return prof


def _disk_load(conns, nn, ndof):
    """Persistent cluster-profile cache (see profcache / ell._disk_load)."""
    from frontistr_tpu.assembly import profcache
    if profcache.cache_dir() is None:
        return None
    z = profcache.load(profcache.conn_key(conns, nn, ndof, tag="bell"))
    if z is None:
        return None
    return ClusterProfile(
        n_node=nn, ndof=ndof, G=int(z["G"]), C=int(z["C"]),
        Wc=int(z["Wc"]), ccols=z["ccols"], diag_wc=z["diag_wc"],
        perm=z["perm"], seg_sorted=z["seg_sorted"],
        scal_src=z["scal_src"],
        pair_counts=tuple(int(v) for v in z["pair_counts"]))


def _disk_save(conns, nn, ndof, prof):
    from frontistr_tpu.assembly import profcache
    if profcache.cache_dir() is None:
        return
    profcache.save(
        profcache.conn_key(conns, nn, ndof, tag="bell"),
        dict(G=np.int64(prof.G), C=np.int64(prof.C),
             Wc=np.int64(prof.Wc), ccols=prof.ccols,
             diag_wc=prof.diag_wc, perm=prof.perm,
             seg_sorted=prof.seg_sorted, scal_src=prof.scal_src,
             pair_counts=np.asarray(prof.pair_counts, np.int64)))


def from_model(model, kes, dtype=None,
               profile: Optional[ClusterProfile] = None,
               want_scalar: bool = False,
               scalar: Optional[ellmod.ELLProfile] = None):
    """Assemble the cluster operator (and optionally scalar blocks for
    AMG) from a StructModel + element matrices."""
    from frontistr_tpu.assembly import operators as old_ops
    ex = getattr(model, "extras", ([], [], [], []))
    ex_conns, _, ex_kes, ex_nns = ex
    if profile is None:
        profile = cluster_profile_from_model(model, scalar=scalar)
    all_kes = [jnp.asarray(k) for k in kes] + \
        [jnp.asarray(k) for k in ex_kes]
    nns = [b.conn.shape[1] for b in model.blocks] + list(ex_nns)
    if dtype is not None:
        all_kes = [k.astype(dtype) for k in all_kes]
    prof_d = profile.device()
    if ellmod._use_pallas_asm(profile.perm.size, all_kes,
                              ndof=profile.ndof,
                              n_slots=profile.n_slots):
        blocks, raw = profile.pallas_assemble(tuple(nns))(tuple(all_kes))
    else:
        blocks, raw = _assemble_jit(prof_d, tuple(all_kes), tuple(nns))
    diag = _diag_jit(prof_d, raw)
    free = old_ops.make_free_mask(model.n_dof_total, model.fixed_dofs)
    fm = jnp.asarray(free, blocks.dtype)
    op = ClusterOperator(blocks=blocks, ccols=prof_d.ccols, diag=diag,
                         n_node=model.n_node, ndof=model.ndof,
                         G=profile.G, free_mask=fm)
    if want_scalar:
        sc = scalar if scalar is not None \
            else ellmod.profile_from_model(model)
        sb = _scal_jit(prof_d, raw, sc.device())
        return op, sb
    return op


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("nns",))
def _assemble_jit(profile: ClusterProfile, kes, nns):
    return assemble_cluster(profile, list(kes), list(nns))


@jax.jit
def _diag_jit(profile: ClusterProfile, raw):
    return extract_diag(profile, raw)


@jax.jit
def _scal_jit(profile: ClusterProfile, raw, scalar: ellmod.ELLProfile):
    return extract_scalar_blocks(profile, raw, scalar)


def blocks_from_raw(cprof: ClusterProfile, raw) -> jnp.ndarray:
    """Raw slot planes -> plane-major cluster blocks (assemble_cluster's
    final relayout, factored out so raw can be adjusted in between)."""
    return _planes_to_blocks(raw, cprof.ndof, cprof.G, cprof.Wc,
                             cprof.C)


def add_eff_mass(cprof: ClusterProfile, raw,
                 mvec: jnp.ndarray, c1: float, c2: float):
    """Newmark effective matrix on the assembled slot planes:
    raw <- c1*raw + c2*diag(m)  (K_eff = c1 K + c2 M with lumped mass,
    fstr_dynamic_nlimplicit.f90 K/D/AU/AL scaling block)."""
    nd, G, C, Wc = cprof.ndof, cprof.G, cprof.C, cprof.Wc
    N = cprof.n_node
    n = jnp.arange(N, dtype=jnp.int32)
    c, off = n // G, n % G
    src = ((off * G + off) * Wc + cprof.diag_wc[c]) * C + c
    out = [p * c1 for p in raw]
    m2 = mvec.reshape(N, nd).astype(out[0].dtype)
    for i in range(nd):
        out[i * nd + i] = out[i * nd + i].at[src].add(c2 * m2[:, i])
    return tuple(out)
