"""Assembled block-ELL operator: the fast unstructured SpMV path.

The round-1 gather operator (assembly/femop.py) re-reads every element
stiffness each matvec (~E*(nn*ndof)^2 floats: 2.9 GB at 1M dof hex8), which
measures ~120 ms/matvec on TPU v5e.  This module assembles the global block
matrix ONCE per tangent into an ELL (padded fixed-width rows) layout and
reads only the N*W nodal blocks per matvec — the TPU redesign of the
reference's block-CSR SpMV (hecmw1/src/solver/las/hecmw_solver_las_33.f90:
135-351) with ELL padding instead of CSR indirection so every row does
identical work (no row-pointer loops, pure batched einsum).

  host setup (once per mesh):  node adjacency graph -> cols (N, W) padded
      with the row itself; per-element (a, b) pair -> flat slot map; a
      permutation sorting all pair entries by destination slot.
  device assembly (per tangent): entries = ke blocks in (P, nd*nd) planes,
      permuted to slot order, segment-summed into (N, W, nd, nd).
  device matvec:  y = einsum(blocks, x[cols]) — one row gather + one
      batched small matmul, HBM-bound at N*W*nd*nd reads.

Dirichlet handling matches femop.FEOperator (projection form).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ELLProfile:
    """Static sparsity profile of the node graph (registered pytree).

    Plays the role of hecmw_mat_con (hecmw1/src/solver/matrix/
    hecmw_mat_con.f90): symbolic assembly from element connectivity.

    TPU CONTRACT: any array a traced computation touches must reach the
    jit as an ARGUMENT — closed-over concrete arrays (np OR device) are
    inlined into the lowered module as dense literals, which overflows
    the remote-compile payload at ~1M dof (HTTP 413).  ELLProfile is
    therefore a pytree: pass ``profile.device()`` straight through jit
    boundaries and read its fields inside the trace.
    """
    n_node: int
    ndof: int
    W: int                       # max neighbors (incl. self), padded width
    cols: np.ndarray             # (N, W) int32, padded with the row index
    diag_slot: np.ndarray        # (N,) int32 slot of the diagonal block
    perm: np.ndarray             # (P,) int sorts pair entries by slot
    seg_sorted: np.ndarray       # (P,) int32 destination slots, sorted
    pair_counts: tuple           # entries per block (E*nn*nn each)

    @property
    def n_slots(self) -> int:
        return self.n_node * self.W

    def pallas_assemble(self, nns):
        """Cached MXU segment-sum assembly fn (segsum_pallas) for this
        profile; ~6x faster than the XLA scatter path at 1M dof."""
        cache = getattr(self, "_pal", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_pal", cache)
        key = tuple(int(n) for n in nns)
        fn = cache.get(key)
        if fn is None:
            from frontistr_tpu.assembly import segsum_pallas as sp
            N, W, nd = self.n_node, self.W, self.ndof

            def post(raw):
                # raw: nd*nd slot planes, each (N*W,)
                return jnp.stack(
                    [jnp.stack([raw[i * nd + j].reshape(N, W)
                                for j in range(nd)], axis=-1)
                     for i in range(nd)], axis=2)    # (N, W, nd, nd)
            fn = sp.make_planes_segsum(self.seg_sorted, self.n_slots,
                                       self.perm, nd, key, post)
            cache[key] = fn
        return fn

    def device(self) -> "ELLProfile":
        """Device-resident copy (cached).  Pass THIS through jit args —
        passing the host (np) version would re-upload every call."""
        if not hasattr(self, "_dev"):
            object.__setattr__(self, "_dev", ELLProfile(
                n_node=self.n_node, ndof=self.ndof, W=self.W,
                cols=jnp.asarray(self.cols),
                diag_slot=jnp.asarray(self.diag_slot),
                perm=jnp.asarray(self.perm),
                seg_sorted=jnp.asarray(self.seg_sorted),
                pair_counts=tuple(self.pair_counts)))
        return self._dev


jax.tree_util.register_dataclass(
    ELLProfile,
    data_fields=["cols", "diag_slot", "perm", "seg_sorted"],
    meta_fields=["n_node", "ndof", "W", "pair_counts"])


def build_profile(conns: Sequence[np.ndarray], n_node: int,
                  ndof: int) -> ELLProfile:
    """Symbolic assembly: node graph -> padded ELL columns + scatter maps."""
    rows_l, cols_l, counts = [], [], []
    for c in conns:
        E, nn = c.shape
        ct = c.T                                          # (nn, E)
        # pair order (a, b, e): entry planes become pure reshapes of the
        # element matrices (big axis last -> no TPU lane-padding blowup)
        r = np.repeat(ct[:, None, :], nn, axis=1).reshape(-1)
        q = np.broadcast_to(ct[None, :, :], (nn, nn, E)).reshape(-1)
        rows_l.append(r.astype(np.int64))
        cols_l.append(q.astype(np.int64))
        counts.append(E * nn * nn)
    rows = np.concatenate(rows_l)
    colsv = np.concatenate(cols_l)
    key = rows * n_node + colsv
    # native radix unique (assembly/profsort.py): the comparison sort
    # here was the dominant host setup cost at 1M dof
    from frontistr_tpu.assembly import profsort
    uniq, inv = profsort.unique_inverse(key)
    urow = (uniq // n_node).astype(np.int64)
    ucol = (uniq % n_node).astype(np.int32)
    per_row = np.bincount(urow, minlength=n_node)
    W = max(int(per_row.max()) if len(per_row) else 1, 1)
    starts = np.zeros(n_node + 1, dtype=np.int64)
    np.cumsum(per_row, out=starts[1:])
    within = np.arange(len(uniq), dtype=np.int64) - starts[urow]
    cols_pad = np.repeat(np.arange(n_node, dtype=np.int32)[:, None], W,
                         axis=1)
    cols_pad[urow, within] = ucol
    uniq_slot = (urow * W + within).astype(np.int64)     # per unique pair
    slot = uniq_slot[inv]                                # per raw pair entry
    perm = profsort.stable_argsort(slot)
    seg_sorted = slot[perm].astype(np.int32)
    # diagonal slot: where the unique pair is (i, i)
    diag_slot = np.zeros(n_node, dtype=np.int32)
    is_diag = urow == ucol
    diag_slot[urow[is_diag]] = within[is_diag].astype(np.int32)
    # int32 perm: P < 2^31 always (31M pairs at 1M-dof tet) and it halves
    # the HBM cost of the assembly gather
    return ELLProfile(n_node=n_node, ndof=ndof, W=W, cols=cols_pad,
                      diag_slot=diag_slot, perm=perm.astype(np.int32),
                      seg_sorted=seg_sorted, pair_counts=tuple(counts))


def assemble_blocks(profile: ELLProfile, kes: Sequence[jnp.ndarray],
                    nns: Sequence[int]) -> jnp.ndarray:
    """Numeric assembly: per-element dense blocks -> (N, W, nd, nd).

    Deterministic (sorted segment_sum), scatter-free; the TPU equivalent of
    hecmw_mat_ass_elem's CSR binary-search scatter
    (hecmw1/src/solver/matrix/hecmw_mat_ass.f90:31-90).
    """
    nd = profile.ndof
    # (nd*nd, P) plane-major entries: pair order (a, b, e) within each
    # block, matching build_profile.  Big axis last — a (P, nd*nd) layout
    # would be lane-padded 14x by XLA and OOM at 1M dof.
    planes = []
    for ke, nn in zip(kes, nns):
        E = ke.shape[0]
        kr = ke.reshape(E, nn, nd, nn, nd)
        planes.append(jnp.transpose(kr, (2, 4, 1, 3, 0))
                      .reshape(nd * nd, nn * nn * E))
    ent = jnp.concatenate(planes, axis=1)                 # (nd*nd, P)
    perm_j, seg_j = profile.perm, profile.seg_sorted
    outs = []
    for p in range(nd * nd):
        sorted_p = ent[p][perm_j]
        outs.append(jax.ops.segment_sum(sorted_p, seg_j,
                                        num_segments=profile.n_slots,
                                        indices_are_sorted=True))
    blocks = jnp.stack(outs, axis=1)                      # (N*W, nd*nd)
    return blocks.reshape(profile.n_node, profile.W, nd, nd)


@dataclasses.dataclass
class ELLOperator:
    """Constrained global stiffness operator over assembled ELL blocks.

    API-compatible with femop.FEOperator (matvec / apply_constrained /
    constrained_rhs / diag_blocks / block_jacobi / astype).

    Registered pytree: pass it THROUGH jit boundaries as an argument;
    closing a jitted function over a concrete operator inlines its
    blocks/cols as module literals (payload blowup at scale).
    """
    blocks: jnp.ndarray          # (N, W, nd, nd)
    cols: jnp.ndarray            # (N, W) int32
    diag_slot: jnp.ndarray       # (N,) int32
    n_node: int
    ndof: int
    free_mask: jnp.ndarray       # (N*nd,) 1.0 free / 0.0 fixed

    @property
    def n_dof(self) -> int:
        return self.n_node * self.ndof

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        nd = self.ndof
        xn = x.reshape(self.n_node, nd)
        xg = xn[self.cols]                        # (N, W, nd) row gather
        y = jnp.einsum("nwij,nwj->ni", self.blocks, xg,
                       precision=jax.lax.Precision.HIGHEST)
        return y.reshape(-1)

    def apply_constrained(self, x: jnp.ndarray) -> jnp.ndarray:
        xm = x * self.free_mask
        y = self.matvec(xm)
        return y * self.free_mask + x * (1.0 - self.free_mask)

    def constrained_rhs(self, f: jnp.ndarray, u_fix: jnp.ndarray):
        y = self.matvec(u_fix)
        return (f - y) * self.free_mask + u_fix * (1.0 - self.free_mask)

    def diag_blocks(self) -> jnp.ndarray:
        n = jnp.arange(self.n_node)
        return self.blocks[n, self.diag_slot]     # (N, nd, nd)

    def block_jacobi(self) -> Callable:
        from frontistr_tpu.fem.isoparam import det_inv_small
        from frontistr_tpu.utils.linalg import gauss_jordan_inv
        nd = self.ndof
        D = self.diag_blocks()
        fm = self.free_mask.reshape(self.n_node, nd)
        D = D * (fm[:, :, None] * fm[:, None, :])
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

    def astype(self, dtype) -> "ELLOperator":
        return ELLOperator(blocks=self.blocks.astype(dtype),
                           cols=self.cols, diag_slot=self.diag_slot,
                           n_node=self.n_node, ndof=self.ndof,
                           free_mask=self.free_mask.astype(dtype))


jax.tree_util.register_dataclass(
    ELLOperator,
    data_fields=["blocks", "cols", "diag_slot", "free_mask"],
    meta_fields=["n_node", "ndof"])


from functools import partial as _partial


def _use_pallas_asm(n_pairs: int, kes, ndof: int = 3,
                    n_slots: int = 0) -> bool:
    """MXU segment-sum assembly pays off once the one-time host chunking
    (~0.3 s / 1e7 pairs) amortizes; f32 only (the kernel matmul is f32).

    Hard cap: the TPU AOT path addresses arrays with signed-32-bit BYTE
    offsets, so any single HLO result >= 2 GiB fails to compile
    ("indices exceed 32-bits" in the X64-rewrite pass).  The segsum
    pipeline's two biggest results after its chunk-group split
    (segsum_pallas.make_segsum) are the nsq-row entry gather
    (~nsq x 1.2*n_pairs after chunk padding) and the slot gather
    (nsq x n_slots); both must fit.  Above the cap the per-plane XLA
    segment-sum path (assemble_cluster / _assemble_jit) assembles in
    (1, n_pairs) slices that stay far under the limit."""
    flag = os.environ.get("FRONTISTR_TPU_PALLAS_ASM", "auto")
    if flag == "0":
        return False
    import jax as _jax
    if _jax.default_backend() != "tpu" and flag != "force":
        return False
    if any(k.dtype != jnp.float32 for k in kes):
        return False
    nsq = ndof * ndof
    limit = (1 << 31) - (1 << 26)
    # the entry streams and slot gathers are 1-D per plane (no sublane
    # padding — segsum_pallas), so the only 2^31-physical-byte exposure
    # left is the cluster blocks array itself (~nsq * n_slots values),
    # which both assembly paths materialize alike
    if nsq * int(n_slots) * 4 >= limit:
        return False
    return flag in ("1", "force") or n_pairs >= (1 << 21)


@_partial(jax.jit, static_argnames=("nns",))
def _assemble_jit(profile: ELLProfile, kes, nns):
    """Jitted numeric assembly; profile rides through as a pytree arg."""
    return assemble_blocks(profile, list(kes), list(nns))


_PROFILE_CACHE: dict = {}


def _profile_key(conns, n_node, ndof):
    import hashlib
    h = hashlib.sha1()
    h.update(np.int64(n_node).tobytes())
    h.update(np.int64(ndof).tobytes())
    for c in conns:
        h.update(np.int64(c.shape[0]).tobytes())
        h.update(np.ascontiguousarray(c[:: max(1, c.shape[0] // 64)])
                 .tobytes())
    return h.hexdigest()


def profile_from_model(model, n_node: Optional[int] = None) -> ELLProfile:
    """Build (and cache) the ELL profile for a StructModel, including any
    spring extra-blocks.  ``n_node`` may exceed the model's node count:
    the extra (phantom) rows get self-column pads and zero blocks — used
    by the sharded solve to pad the node axis to the device count."""
    ex_conns = getattr(model, "extras", ([], [], [], []))[0]
    conns = [b.conn for b in model.blocks] + list(ex_conns)
    nn = model.n_node if n_node is None else n_node
    key = _profile_key(conns, nn, model.ndof)
    prof = _PROFILE_CACHE.get(key)
    if prof is None:
        prof = _disk_load(conns, nn, model.ndof)
        if prof is None:
            prof = build_profile(conns, nn, model.ndof)
            _disk_save(conns, nn, model.ndof, prof)
        _PROFILE_CACHE.clear()        # hold one profile (they are large)
        _PROFILE_CACHE[key] = prof
    return prof


def _disk_load(conns, nn, ndof):
    """Persistent profile cache (profcache): the symbolic build is ~60 s
    at 1M dof and identical across CLI invocations of the same mesh."""
    from frontistr_tpu.assembly import profcache
    if profcache.cache_dir() is None:
        return None
    z = profcache.load(profcache.conn_key(conns, nn, ndof, tag="ell"))
    if z is None:
        return None
    return ELLProfile(n_node=nn, ndof=ndof, W=int(z["W"]),
                      cols=z["cols"], diag_slot=z["diag_slot"],
                      perm=z["perm"], seg_sorted=z["seg_sorted"],
                      pair_counts=tuple(int(v) for v in z["pair_counts"]))


def _disk_save(conns, nn, ndof, prof):
    from frontistr_tpu.assembly import profcache
    if profcache.cache_dir() is None:
        return
    profcache.save(
        profcache.conn_key(conns, nn, ndof, tag="ell"),
        dict(W=np.int64(prof.W), cols=prof.cols,
             diag_slot=prof.diag_slot, perm=prof.perm,
             seg_sorted=prof.seg_sorted,
             pair_counts=np.asarray(prof.pair_counts, np.int64)))


def from_model(model, kes, dtype=None,
               profile: Optional[ELLProfile] = None) -> ELLOperator:
    """Assemble the ELL operator from a StructModel + element matrices."""
    from frontistr_tpu.assembly import operators as old_ops
    ex = getattr(model, "extras", ([], [], [], []))
    ex_conns, _, ex_kes, ex_nns = ex
    if profile is None:
        profile = profile_from_model(model)
    all_kes = [jnp.asarray(k) for k in kes] + [jnp.asarray(k)
                                               for k in ex_kes]
    nns = [b.conn.shape[1] for b in model.blocks] + list(ex_nns)
    if dtype is not None:
        all_kes = [k.astype(dtype) for k in all_kes]
    if _use_pallas_asm(profile.perm.size, all_kes, ndof=profile.ndof,
                       n_slots=profile.n_slots):
        blocks = profile.pallas_assemble(tuple(nns))(tuple(all_kes))
    else:
        blocks = _assemble_jit(profile.device(), tuple(all_kes),
                               tuple(nns))
    free = old_ops.make_free_mask(model.n_dof_total, model.fixed_dofs)
    fm = jnp.asarray(free, blocks.dtype)
    return ELLOperator(blocks=blocks, cols=jnp.asarray(profile.cols),
                       diag_slot=jnp.asarray(profile.diag_slot),
                       n_node=model.n_node, ndof=model.ndof, free_mask=fm)
