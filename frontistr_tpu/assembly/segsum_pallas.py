"""Pallas sorted-segment-sum: the TPU kernel behind fast assembly.

XLA's segment_sum lowers to scatter, which runs ~90M elements/s on TPU
(3.3 s for the 283M scattered entries of a 1M-dof tet assembly).  This
kernel exploits the SORTED segment ids instead: entries are cut into
fixed-size chunks aligned to segment boundaries (host), so each chunk
covers a bounded, disjoint slot window; inside the kernel the chunk's
partial sums are ONE one-hot matmul on the MXU:

    partial (R, V) = onehot(R, C) @ ent (C, V)
    onehot[r, c]   = (seg[c] - s_lo == r)

The per-chunk windows land in a (nc*R, V) scratch layout; a final row
gather maps window rows to true slots.  No scatter anywhere.

Cost model at 1M-dof tet (P = 31.5M entries, V = 16):
  one-hot generation  P*R      = 16e9 VPU compares  ~  4 ms
  matmuls             2*P*R*V  = 0.5 TFLOP f32      ~ 10 ms
  combine gather      S rows of 64 B               ~ 25 ms
vs 3.3 s for the XLA scatter path.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_ENT = 1024          # entries per chunk
V_PAD = 16            # value lanes (nd*nd=9 padded to 16)
R_CAP = 2048          # max slots per chunk window (span cap)


def build_chunks(seg_sorted: np.ndarray, n_slots: int,
                 c_ent: int = C_ENT, r_cap: int = R_CAP):
    """Host: slot-aligned entry chunks.

    Returns (cuts (nc+1,), s_lo (nc,), R, cmax, slot_src (n_slots,))
    where chunk k holds sorted entries [cuts[k], cuts[k+1]) covering
    slots [s_lo[k], s_lo[k] + R) disjointly, and slot_src maps each true
    slot to its row in the (nc*R) window layout.

    Chunks are cut on BOTH an entry budget (c_ent) and a slot-SPAN cap
    (r_cap): the slot2 ordering jumps by ~C at every (aoff, boff, wc)
    plane boundary, so a chunk straddling one spans ~C slots — without
    the span cut R explodes to 343k at the 1M-dof tet bench and the
    (v_pad, nc*R) kernel output would be 679 GB / 10.6e9 elements per
    plane, past the TPU AOT 2^31-element addressing limit (the round-4
    lost-bench failure)."""
    P = len(seg_sorted)
    starts = np.flatnonzero(np.r_[True, seg_sorted[1:] != seg_sorted[:-1]])
    # int64 to match the Python-int needles: a dtype mismatch makes
    # numpy copy-promote the whole array on EVERY searchsorted call
    # (measured 3.3 ms/call -> 200 s for the cut loop)
    slot_at_start = seg_sorted[starts].astype(np.int64)
    cuts = [0]
    while cuts[-1] < P:
        cut0 = cuts[-1]
        # entry-budget cut: candidate at cut0 + c_ent, moved LEFT to a
        # segment start
        pos = cut0 + c_ent
        if pos >= P:
            cut = P
        else:
            i = np.searchsorted(starts, pos, side="right") - 1
            cut = int(starts[i])
            if cut <= cut0:
                # one segment longer than c_ent: cut mid-segment is
                # illegal; advance to the next segment start
                j = np.searchsorted(starts, cut0, side="right")
                cut = int(starts[j]) if j < len(starts) else P
        # span cut: first segment start whose slot leaves the window
        # (always a legal cut — entries of one segment share a slot)
        k = np.searchsorted(slot_at_start,
                            int(seg_sorted[cut0]) + r_cap, side="left")
        if k < len(starts):
            span_cut = int(starts[k])
            if cut0 < span_cut < cut:
                cut = span_cut
        cuts.append(cut)
    cuts = np.asarray(cuts, np.int64)
    nc = len(cuts) - 1
    s_lo = seg_sorted[cuts[:-1]].astype(np.int32)
    s_hi = seg_sorted[cuts[1:] - 1].astype(np.int64)
    span = (s_hi - s_lo + 1).astype(np.int64)
    R = int(span.max())
    R = max(int(-(-R // 128) * 128), 128)            # lane multiple
    # max entries per chunk after alignment (can exceed c_ent when a
    # single segment is huge)
    cmax = int((cuts[1:] - cuts[:-1]).max())
    cmax = max(int(-(-cmax // c_ent) * c_ent), c_ent)
    # row R-1 of EVERY chunk must be a guaranteed-zero row (slots with
    # no entries read it; the per-group slot gather in make_segsum needs
    # a zero row in its own chunk range), so R strictly exceeds max span
    if int(span.max()) >= R:
        R += 128
    # true-slot -> window-row map; empty slots point at row R-1 of the
    # chunk whose slot range covers them (keeps the map group-sliceable)
    slot_src = np.full(n_slots, -1, np.int64)
    for k in range(nc):
        lo = int(s_lo[k])
        hi = int(s_hi[k])
        slot_src[lo:hi + 1] = k * R + np.arange(lo, hi + 1) - lo
    empty = np.flatnonzero(slot_src < 0)
    owner = np.clip(np.searchsorted(s_lo, empty, side="right") - 1,
                    0, nc - 1)
    slot_src[empty] = owner * np.int64(R) + R - 1
    return cuts, s_lo, R, cmax, slot_src


def _imap(c):
    # under jax_enable_x64 a literal 0 traces as i64 while the program id
    # is i32; Mosaic rejects the mixed-type func.return
    return (jnp.zeros((), jnp.int32), c)


def _kernel(ent_ref, out_ref, *, R, VP):
    # V-major layout: entries ride LANES (a (P,16) layout would be tile-
    # padded 16->128 lanes = 8x HBM).  Chunk-local slot ids ride sublane
    # VP-1 as exact small-int f32 (host-normalized; < R <= 2048), so
    # the only inputs are plain (VP, cmax) tiles — no rank-1/SMEM specs,
    # which this Mosaic version cannot lower.
    blk = ent_ref[:, :]                              # (VP, C)
    ids = blk[VP - 1:VP, :].astype(jnp.int32)        # (1, C)
    # onehot in (R, C) orientation — ids broadcast over SUBLANES (cheap);
    # contract the C axis of both (no lane->sublane relayout, which the
    # (C,)->(C,1) formulation needs and this Mosaic version miscompiles)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (R, ids.shape[1]), 0)
              == ids).astype(jnp.float32)
    out_ref[:, :] = jax.lax.dot_general(
        blk, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


GROUP_BYTES = 1 << 30   # per-pallas_call input cap (sublane-padded f32)


def make_segsum(seg_sorted: np.ndarray, n_slots: int,
                c_ent: int = C_ENT, v_pad: int = V_PAD, nsq=None):
    """Host setup; returns (fn, aux) with fn(entT_pad, seg_pad, slot_src)
    -> (v_pad | nsq, n_slots) and aux holding the padded static arrays.

    32-bit addressing: the TPU AOT path rejects any HLO array whose
    element count crosses 2^31 ("indices exceed 32-bits" — measured on
    v5e: a 10.6e9-element gather operand fails, 2.6 GB / 650M elements
    compiles fine).  Four measures keep every intermediate bounded at
    any size the chip's HBM can hold:
      - span-capped chunks (build_chunks r_cap): R <= ~2 k always, so
        the window layout is O(P) rows, never O(nc * plane-jump)
      - chunk groups: the kernel input AND output are built and
        launched in slices of <= GROUP_BYTES along the chunk axis
      - per-group slot gathers: slot windows are chunk-aligned and
        disjoint, so each group's slots gather from THAT group's
        (v_pad, cpg*R) output alone and the results concatenate — no
        full (v_pad, nc*R) array ever exists
      - nsq mode: the caller passes only the true value rows and the id
        lane is appended HERE (row v_pad-1), so the caller's entry
        gather carries nsq rows instead of v_pad (9 vs 16 at nd=3)
    All device index arrays are int32 (host-asserted in range): s64
    gather indices force the AOT X64-rewrite pass onto every big gather.
    """
    cuts, s_lo, R, cmax, slot_src = build_chunks(seg_sorted, n_slots,
                                                 c_ent)
    nc = len(s_lo)
    P = len(seg_sorted)
    assert nc * R < (1 << 31) and slot_src.max() < (1 << 31), \
        (nc, R, n_slots)
    # pad chunks to fixed cmax entries: entry k of chunk c sits at
    # row c*cmax + k; padding rows carry value 0 and seg = s_lo (adds 0)
    ent_map = np.full(nc * cmax, P, np.int64)        # P -> zero pad row
    # chunk-LOCAL slot ids (seg - s_lo[chunk]), pre-normalized so the
    # kernel needs no per-chunk scalars
    seg_pad = np.zeros(nc * cmax, np.int32)
    for k in range(nc):
        n = int(cuts[k + 1] - cuts[k])
        ent_map[k * cmax:k * cmax + n] = np.arange(cuts[k], cuts[k + 1])
        seg_pad[k * cmax:k * cmax + n] = \
            seg_sorted[cuts[k]:cuts[k + 1]] - s_lo[k]

    kernel = partial(_kernel, R=R, VP=v_pad)
    # group size bounded by BOTH the kernel input (v_pad, cpg*cmax) and
    # output (v_pad, cpg*R) byte footprints
    cpg = max(int(GROUP_BYTES // (v_pad * max(cmax, R) * 4)), 1)
    bounds = list(range(0, nc, cpg)) + [nc]
    # slot ranges owned by each chunk group (slot_src rows of slots in
    # [sb[g], sb[g+1]) all fall inside group g's chunk windows)
    slot_bounds = [0] + [int(s_lo[b]) for b in bounds[1:-1]] + [n_slots]

    @partial(jax.jit, static_argnames=())
    def run(entT_sorted_pad, seg_pad_j, slot_src_j):
        """entT_sorted_pad: (v_pad, nc*cmax) f32 (pad cols 0), or in nsq
        mode a TUPLE of nsq 1-D (nc*cmax,) plane arrays — 1-D arrays
        have no sublane padding, so the entry stream never crosses the
        2^31 physical-byte line at any size that fits HBM."""
        interp = jax.default_backend() != "tpu"
        slot_outs = []                # per group: (v_pad|nsq, slots_g)
        for gi, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            cols = slice(lo * cmax, hi * cmax)
            if nsq is None:
                aug = entT_sorted_pad[:, cols].at[v_pad - 1, :].set(
                    seg_pad_j[cols])
            else:
                ncol = (hi - lo) * cmax
                aug = jnp.concatenate([
                    jnp.stack([p[cols] for p in entT_sorted_pad]),
                    jnp.zeros((v_pad - nsq - 1, ncol), jnp.float32),
                    seg_pad_j[None, cols]], axis=0)
            out_g = pl.pallas_call(
                kernel,
                grid=(hi - lo,),
                interpret=interp,
                in_specs=[
                    pl.BlockSpec((v_pad, cmax), _imap),
                ],
                out_specs=pl.BlockSpec((v_pad, R), _imap),
                out_shape=jax.ShapeDtypeStruct((v_pad, (hi - lo) * R),
                                               jnp.float32),
            )(aug)
            # this group's slots, window rows rebased to the group
            src_g = slot_src_j[slot_bounds[gi]:slot_bounds[gi + 1]] \
                - np.int32(lo * R)
            if nsq is None:
                slot_outs.append(out_g[:, src_g])
            else:
                slot_outs.append(tuple(out_g[p][src_g]
                                       for p in range(nsq)))
        # sublane V_PAD-1 of the output holds onehot-row sums of the id
        # lane.  nsq mode returns PER-PLANE 1-D results: a 2-D
        # (nsq, n_slots) array is sublane-padded nsq->16 (21 GB at 41M
        # slots); nsq separate (n_slots,) planes are ~165 MB each.
        if len(slot_outs) == 1:
            return slot_outs[0]
        if nsq is None:
            return jnp.concatenate(slot_outs, axis=1)
        return tuple(jnp.concatenate([g[p] for g in slot_outs])
                     for p in range(nsq))

    aux = dict(ent_map=jnp.asarray(ent_map),
               seg_pad=jnp.asarray(seg_pad.astype(np.float32)),
               s_lo=jnp.asarray(s_lo),
               slot_src=jnp.asarray(slot_src.astype(np.int32)),
               nc=nc, cmax=cmax, R=R)
    return run, aux


def make_planes_segsum(seg_sorted: np.ndarray, n_slots: int,
                       perm: np.ndarray, nd: int, nns, post=None,
                       c_ent: int = C_ENT):
    """Assembly-shaped wrapper used by ell/bell: returns a jitted
    ``assemble(kes) -> post(raw (n_slots, nd*nd))`` running the sorted
    segment-sum on the MXU instead of XLA scatter (f32 only).

    ``perm`` (raw pair entry -> slot order) is fused into the chunk pad
    map on the host, so the device does ONE lane-gather of the plane-
    major entries.  All big arrays ride through jit as arguments (the
    closure-inlining rule; see ELLProfile docstring)."""
    nsq = nd * nd
    vp = max(int(-(-(nsq + 1) // 8) * 8), 8)
    run, aux = make_segsum(seg_sorted, n_slots, c_ent=c_ent, v_pad=vp,
                           nsq=nsq)
    P = int(perm.size)
    ent_map = np.asarray(aux["ent_map"])
    full_map = np.where(
        ent_map < P,
        np.asarray(perm, np.int64)[np.minimum(ent_map, P - 1)], P)
    fm_j = jnp.asarray(full_map.astype(np.int32))
    sg_j, ss_j = aux["seg_pad"], aux["slot_src"]
    nns = tuple(int(n) for n in nns)

    @jax.jit
    def _asm(fm, sg, ss, *kes):
        # per-plane 1-D entry streams: plane (i,j) in pair order
        # (a, b, e) — e fastest — matching ell/bell build_profile.  A
        # (nsq, P) 2-D form is sublane-padded nsq->16: 2 GB physical at
        # 31M pairs, right at the TPU 2^31 addressing line; nsq 1-D
        # arrays have no padding and scale to HBM capacity.
        gathered = []
        for i in range(nd):
            for j in range(nd):
                parts = []
                for ke, nn in zip(kes, nns):
                    E = ke.shape[0]
                    kr = ke.reshape(E, nn, nd, nn, nd)[:, :, i, :, j]
                    parts.append(jnp.transpose(kr, (1, 2, 0))
                                 .reshape(nn * nn * E))
                v = jnp.concatenate(parts).astype(jnp.float32) \
                    if len(parts) > 1 else parts[0].astype(jnp.float32)
                vp_ = jnp.pad(v, (0, 1))               # pad idx P -> 0
                gathered.append(vp_[fm])               # (nc*cmax,) 1-D
        # id lane + zero rows are appended inside run, per chunk group;
        # raw comes back as nd*nd per-plane (n_slots,) arrays
        raw = run(tuple(gathered), sg, ss)
        return post(raw) if post is not None else raw

    class _Planes:
        """fn(fm, sg, ss, *kes) jitted; args = the device aux arrays.
        Exposed separately so outer jits (e.g. the Newton-loop solver)
        can thread the aux through their own boundary as ARGUMENTS
        instead of closing over them (closure-inlining rule)."""
        fn = staticmethod(_asm)
        args = (fm_j, sg_j, ss_j)

        def __call__(self, kes):
            return _asm(fm_j, sg_j, ss_j, *kes)

    return _Planes()
