"""Batched solid element kernels (the TPU equivalent of STF_C3 / UPDATE_C3 /
STF_C2 / UPDATE_C2, fistr1/src/lib/static_LIB_3d.f90:47-205 and
static_LIB_2d.f90).

Instead of the reference's per-element OpenMP loop, every element type block
is processed as one batched einsum chain over the whole block; quadrature is
a short static unroll (nq <= 27) that XLA fuses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from frontistr_tpu.elements.tables import ElementTable
from frontistr_tpu.fem.isoparam import (
    b_matrix,
    jacobians,
    strain_selector_2d,
    strain_selector_3d,
)


def _selector(dim: int):
    return strain_selector_3d() if dim == 3 else strain_selector_2d()


# Element-batch chunk size: bounds the B/DB temporaries regardless of XLA's
# fusion choices (v5e HBM is 16GB; 64k hex8 chunks peak at ~300MB f32).
import os as _os
CHUNK = int(_os.environ.get("FRONTISTR_TPU_CHUNK", "65536"))


def _chunked(fn, *arrays, chunk: int = None):
    """Apply fn over the element axis in fixed-size chunks via lax.map.

    fn must map (chunk, ...) arrays -> a single (chunk, ...) array.

    The per-chunk output is flattened to (chunk, prod(trailing)) inside the
    scan: lax.map stacks chunk outputs with a dynamic-update-slice whose
    layout tiles the LAST TWO dims to (8, 128) — for element matrices
    (chunk, 12, 12) that is a 14x padding blowup (15.5 GB at 1M dof tet).
    Flattening keeps the padding to <2x.
    """
    c = chunk or CHUNK
    E = arrays[0].shape[0]
    if E <= c:
        return fn(*arrays)
    pad = (-E) % c
    padded = [jnp.concatenate([a, jnp.broadcast_to(
        a[:1], (pad,) + a.shape[1:])]) if pad else a for a in arrays]
    stacked = [a.reshape(-1, c, *a.shape[1:]) for a in padded]
    out_sd = jax.eval_shape(fn, *(a[:c] for a in padded))
    trail = out_sd.shape[1:]
    out = jax.lax.map(lambda xs: fn(*xs).reshape(c, -1), tuple(stacked))
    return out.reshape(-1, *trail)[:E]



def _expand_D(D_e, E):
    """Lazily broadcast a constant-D block (leading dim 1, the carry
    compression of BlockPrograms) to E elements.  Inside a chunk this is
    a fused broadcast op; passing the FULL broadcast through _chunked
    would materialize it (reshape + lax.map need real buffers — a
    21x-padded f64 (E,6,6) is 11 GB at 1M-dof tet)."""
    if D_e.shape[0] == 1 and E != 1:
        return jnp.broadcast_to(D_e, (E,) + D_e.shape[1:])
    return D_e


def stiffness_linear_iso(table: ElementTable, coords_e: jnp.ndarray,
                         lam, mu) -> jnp.ndarray:
    """Isotropic small-strain stiffness via the gram-matrix closed form.

    For isotropic D the B^T D B integrand collapses to
        ke[(a,i),(b,j)] = int lam g_ai g_bj + mu (d_ij g_a.g_b
                                                  + g_aj g_bi)
    so the whole element matrix is ONE (3n x q)@(q x 3n) gram matmul of
    sqrt(wg)-scaled derivatives plus cheap relayouts — ~20x fewer FLOPs
    than the generic masked-D path.  This is the f64 fast path: TPU f64
    is software-emulated, so cutting FLOPs cuts wall time almost 1:1
    (bench asm64: 5.3 s generic -> sub-second).  Matches
    stiffness_linear(table, x, elastic_D(E, nu, D3)) to f64 roundoff
    (same quadrature; STF_C3D8/stiffness integrand of
    static_LIB_3d.f90:330-420 in closed form).  3D only.
    """
    if coords_e.shape[0] > CHUNK:
        return _chunked(lambda c, _u: stiffness_linear_iso(
            table, c, lam, mu), coords_e,
            jnp.zeros((coords_e.shape[0], 1), coords_e.dtype))
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    det, g = jacobians(dN, coords_e)                 # (E,q), (E,q,n,3)
    w = jnp.asarray(table.weights, dt)
    wg = w[None, :] * det
    gs = g * jnp.sqrt(wg)[..., None, None]
    E, q, n, _ = g.shape
    G = gs.reshape(E, q, n * 3)
    M = jnp.einsum("eqm,eqn->emn", G, G,
                   precision=jax.lax.Precision.HIGHEST)
    M5 = M.reshape(E, n, 3, n, 3)                    # [a,i,b,j]
    S = jnp.einsum("eakbk->eab", M5)                 # grad dot grad
    ke = lam * M5 + mu * jnp.transpose(M5, (0, 1, 4, 3, 2))
    ke = ke + mu * S[:, :, None, :, None] \
        * jnp.eye(3, dtype=dt)[None, None, :, None, :]
    return ke.reshape(E, n * 3, n * 3)


def stiffness_linear(table: ElementTable, coords_e: jnp.ndarray,
                     D_e: jnp.ndarray, thick: float = 1.0) -> jnp.ndarray:
    """Small-strain elastic stiffness for a block of elements.

    Args:
      table: static element tables.
      coords_e: (E, nn, dim).
      D_e: (E, ns, ns) elastic matrices (per element, supports varying
        materials in a block).
      thick: section thickness (2D only; STF_C2 PARAM1).

    Returns: (E, nn*dim, nn*dim) element stiffness.
    """
    if coords_e.shape[0] > CHUNK:
        if D_e.shape[0] == 1:     # constant-D: close over, don't chunk
            return _chunked(lambda c, _u: stiffness_linear(
                table, c, D_e, thick), coords_e,
                jnp.zeros((coords_e.shape[0], 1), coords_e.dtype))
        return _chunked(lambda c, D: stiffness_linear(table, c, D, thick),
                        coords_e, D_e)
    D_e = _expand_D(D_e, coords_e.shape[0])
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    det, gderiv = jacobians(dN, coords_e)
    S = jnp.asarray(_selector(table.dim), dt)
    w = jnp.asarray(table.weights, dt)
    scale = thick if table.dim == 2 else 1.0
    E, nn, _ = coords_e.shape
    ndof = table.dim
    ns = S.shape[0]
    m = nn * ndof
    nq = table.nq
    # all-quadrature B, then two batched GEMMs (pure MXU work; avoids both
    # the q-unrolled accumulation and per-q broadcast of D, each of which
    # XLA materialized as a multi-GB temp at 1M dof)
    # Precision.HIGHEST throughout: the TPU default feeds bf16 into the
    # MXU (~0.4% input rounding), and K = B^T D B entries carry heavy
    # cancellation between gauss terms -- measured ~10% error in the f32
    # element matrices at 1M dof, which breaks mixed-precision refinement.
    HI = jax.lax.Precision.HIGHEST
    B = jnp.einsum("kdj,eqnj->eqknd", S, gderiv,
                   precision=HI).reshape(E, nq, ns, m)
    if D_e.ndim == 4:
        # per-gauss material (temperature-dependent E(T), nu(T))
        DB = jnp.einsum("eqkl,eqlm->eqkm", D_e, B, precision=HI)
    else:
        # DB[e,q,k,j] = D[e,k,l] B[e,q,l,j] as (E, ns, nq*m) batched matmul
        B2 = jnp.swapaxes(B, 1, 2).reshape(E, ns, nq * m)
        DB = jnp.matmul(D_e, B2, preferred_element_type=dt, precision=HI)
        DB = jnp.swapaxes(DB.reshape(E, ns, nq, m), 1, 2)  # (E, nq, ns, m)
    wdet = (w * scale)[None, :] * det                    # (E, nq)
    DB = DB * wdet[:, :, None, None]
    # k[e,i,j] = sum_{q,k} B[e,q,k,i] DB[e,q,k,j]: (E, m, nq*ns)x(E, nq*ns, m)
    Bt = B.reshape(E, nq * ns, m)
    DBt = DB.reshape(E, nq * ns, m)
    return jnp.matmul(jnp.swapaxes(Bt, 1, 2), DBt,
                      preferred_element_type=dt,
                      precision=jax.lax.Precision.HIGHEST)


def centroid_gderiv(table: ElementTable, elem):
    """Global derivs at the element centroid (B-bar dilatation reference,
    STF_C3D8Bbar, static_LIB_C3D8.f90)."""
    from frontistr_tpu.elements.tables import shape_deriv
    import numpy as np
    with jax.ensure_compile_time_eval():
        dN0 = np.asarray(shape_deriv(table.etype,
                                     np.zeros(table.dim)))
    det0, g0 = jacobians(jnp.asarray(dN0, elem.dtype)[None], elem)
    return g0[:, 0]                                       # (E, nn, dim)


def _bbar_correction(S_like, g, g0):
    """Row-1..3 B-matrix correction: +(g0 - g)/3 on every direction column
    (STF_C3D8Bbar B4/B6/B8 terms). Returns (E, 3, nn*dim) to add to B."""
    E, nn, dim = g.shape
    corr = (g0 - g) / 3.0                                  # (E, nn, dim)
    rows = jnp.broadcast_to(corr[:, None, :, :], (E, 3, nn, dim))
    return rows.reshape(E, 3, nn * dim)


def volavg_gderiv(table: ElementTable, elem, jacob=None):
    """Volume-averaged global derivs: the F-bar dilatation reference
    (STF_C3D8Fbar gderiv1_ave, static_LIB_Fbar.f90:85-118).  With jacob
    (per-gauss J = det F) given, weights are jacob*wg as in the
    finite-strain arms; else jacob = 1 (INFINITE)."""
    dN = jnp.asarray(table.dN, elem.dtype)
    det, g = jacobians(dN, elem)
    w = jnp.asarray(table.weights, elem.dtype)
    wg = w[None, :] * det                                  # (E, nq)
    jwg = wg if jacob is None else wg * jacob
    denom = jwg.sum(axis=1)                                # (E,)
    g_ave = jnp.einsum("eq,eqnd->end", jwg, g) / denom[:, None, None]
    return g_ave, det, g


def _fbar_correction(g, g_ave):
    """Rows 1..3 of the F-bar B correction: +(g_ave - g)/3 on every
    direction column (static_LIB_Fbar.f90:166-178 INFINITE arm)."""
    E, nn, dim = g.shape
    corr = (g_ave - g) / 3.0
    rows = jnp.broadcast_to(corr[:, None, :, :], (E, 3, nn, dim))
    return rows.reshape(E, 3, nn * dim)


def stiffness_hex8fbar(table: ElementTable, coords_e, D_e):
    """Small-strain F-bar hex8 stiffness (STF_C3D8Fbar INFINITE arm,
    static_LIB_Fbar.f90:26-180): standard B with rows 1-3 corrected by the
    volume-averaged dilatation  B̄ = B + (ḡ - g)/3 on direction columns.
    Differs from B-bar only in using the volume average instead of the
    centroid value as the dilatation reference."""
    D_e = _expand_D(D_e, coords_e.shape[0])
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    g_ave, det, gderiv = volavg_gderiv(table, coords_e)
    S = jnp.asarray(_selector(3), dt)
    w = jnp.asarray(table.weights, dt)
    E, nn, dim = coords_e.shape
    m = nn * dim
    nq = table.nq
    HI = jax.lax.Precision.HIGHEST
    B = jnp.einsum("kdj,eqnj->eqknd", S, gderiv,
                   precision=HI).reshape(E, nq, 6, m)
    corr = _fbar_correction(
        gderiv.reshape(E * nq, nn, dim),
        jnp.broadcast_to(g_ave[:, None], (E, nq, nn, dim))
        .reshape(E * nq, nn, dim)).reshape(E, nq, 3, m)
    B = B.at[:, :, :3, :].add(corr)
    if D_e.ndim == 4:
        DB = jnp.einsum("eqkl,eqlm->eqkm", D_e, B, precision=HI)
    else:
        DB = jnp.einsum("ekl,eqlm->eqkm", D_e, B, precision=HI)
    wdet = w[None, :] * det
    return jnp.einsum("eqki,eqkj,eq->eij", B, DB, wdet, precision=HI)


def stiffness_nlgeom_fbar(table: ElementTable, coords_e, u_e, D_e,
                          stress_e, flag: int):
    """F-bar tangent with geometric terms (STF_C3D8Fbar TOTALLAG/UPDATELAG
    arms, static_LIB_Fbar.f90:120-334): material part with
    B̄ = Jr²(B0+B1)+B2 (TL) / B+B2 (UL), initial-stress part BNᵀ S BN with
    the F-bar-corrected BN, and the d(dFbar) second-variation block."""
    from frontistr_tpu.fem.material import TOTALLAG, UPDATELAG
    D_e = _expand_D(D_e, coords_e.shape[0])
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    E, nn, dim = coords_e.shape
    m = nn * dim
    nq = table.nq
    S = jnp.asarray(_selector(3), dt)
    w = jnp.asarray(table.weights, dt)
    HI = jax.lax.Precision.HIGHEST
    eye = jnp.eye(3, dtype=dt)

    elem0 = coords_e
    elem1 = coords_e + u_e
    elem = elem1 if flag == UPDATELAG else coords_e

    # averages on the reference mesh (det0, gderiv0) with jacob weights
    det0, g0 = jacobians(dN, elem0)
    dudx0 = jnp.einsum("end,eqnj->eqdj", u_e, g0)          # du_d/dX_j
    F = eye[None, None] + dudx0                            # (E, nq, 3, 3)
    jacob = jnp.linalg.det(F)
    Jratio = jacob ** (-1.0 / 3.0)                         # (E, nq)
    det1, g1 = jacobians(dN, elem1)
    wg0 = w[None, :] * det0
    jwg = wg0 * jacob
    V0J = jnp.einsum("eq->e", jwg)
    g1_ave = jnp.einsum("eq,eqnd->end", jwg, g1) / V0J[:, None, None]
    jacob_ave = V0J / wg0.sum(axis=1)
    Jr = (jacob_ave ** (1.0 / 3.0))[:, None] * Jratio      # (E, nq)
    # gderiv2_ave[(n,i),(m,j)] cross term (static_LIB_Fbar.f90:100-110):
    # sum_q jwg * (g1[n,i] g1[m,j] - g1[m,i] g1[n,j]) / (V0 jacob_ave)
    g2 = (jnp.einsum("eq,eqni,eqmj->enimj", jwg, g1, g1)
          - jnp.einsum("eq,eqmi,eqnj->enimj", jwg, g1, g1)) \
        / V0J[:, None, None, None, None]

    det, gderiv = jacobians(dN, elem)
    wgt = w[None, :] * det
    k = jnp.zeros((E, m, m), dt)
    for q in range(nq):
        g = gderiv[:, q]
        B = b_matrix(S, g)                                 # (E, 6, m)
        if flag == TOTALLAG:
            dudx = jnp.einsum("end,enj->edj", u_e, g)
            B1 = jnp.einsum("kij,edi,enj->eknd", S, dudx, g) \
                .reshape(E, 6, m)
            Fb = Jr[:, q, None, None] * (eye[None] + dudx)  # (E,3,3)
            C = jnp.einsum("eki,ekj->eij", Fb, Fb)
            dstrain = jnp.stack([
                0.5 * (C[:, 0, 0] - 1), 0.5 * (C[:, 1, 1] - 1),
                0.5 * (C[:, 2, 2] - 1), C[:, 0, 1], C[:, 1, 2],
                C[:, 2, 0]], axis=1)                       # (E, 6)
            z1 = (g1_ave - g1[:, q]) / 3.0                 # (E, nn, 3)
            fac = jnp.concatenate([2 * dstrain[:, :3] + 1.0,
                                   2 * dstrain[:, 3:]], axis=1)
            B2 = jnp.einsum("ek,end->eknd", fac, z1).reshape(E, 6, m)
            Bbar = Jr[:, q, None, None] ** 2 * (B + B1) + B2
            coeff = Jr[:, q]
            sff = jnp.einsum("ek,ek->e", stress_e[:, q], dstrain)
            gq1 = g1[:, q]
            wg = wgt[:, q]
        else:  # UPDATELAG
            z1 = (g1_ave - g) / 3.0
            B2rows = jnp.broadcast_to(z1[:, None], (E, 3, nn, 3)) \
                .reshape(E, 3, m)
            Bbar = B.at[:, :3, :].add(B2rows)
            Fb = jnp.broadcast_to(eye[None], (E, 3, 3))
            coeff = jnp.ones((E,), dt)
            sig = stress_e[:, q]
            sff = sig[:, 0] + sig[:, 1] + sig[:, 2]
            dstrain = None
            gq1 = g
            wg = Jr[:, q] ** 3 * wgt[:, q]
        Dq = D_e if D_e.ndim == 3 else D_e[:, q]
        DB = jnp.einsum("ekl,elj->ekj", Dq, Bbar, precision=HI)
        k = k + jnp.einsum("eki,ekj,e->eij", Bbar, DB, wg, precision=HI)

        # initial stress (1): BN^T Smat BN with F-bar-corrected BN
        # BN[(d,i),(n,p)] = coeff*delta_ip*g[n,d] + Fbar[i,d]*z1[n,p]
        sig = stress_e[:, q]
        Sm = _stress_tensor(sig, 3)                        # (E, 3, 3)
        z1q = (g1_ave - gq1) / 3.0                         # (E, nn, 3)
        # BN as (E, 3(d), 3(i), nn, 3(p))
        BN = coeff[:, None, None, None, None] * \
            jnp.einsum("ip,end->edinp", eye, g) + \
            jnp.einsum("eid,enp->edinp", Fb, z1q)
        # Smat[(d,i),(f,j)] = sigma_df delta_ij -> contract deriv index d
        SBN = jnp.einsum("edf,efinp->edinp", Sm, BN, precision=HI)
        kg = jnp.einsum("edinp,edimq->enpmq", BN, SBN, precision=HI)
        k = k + (kg * wg[:, None, None, None, None]).reshape(E, m, m)

        # initial stress (2): d(dFbar)*Stress (static_LIB_Fbar.f90:305-331)
        FS = jnp.einsum("eid,edj->eij", Fb, Sm)            # F S (E,3,3)
        GFS = coeff[:, None, None] * \
            jnp.einsum("eij,enj->eni", FS, g)              # (E, nn, 3)
        ddA = jnp.einsum("enp,emq->enpmq", z1q, z1q)
        ddB = (g2 - jnp.einsum("enp,emq->enpmq", g1_ave, g1_ave)) / 3.0
        ddC = jnp.einsum("enq,emp->enpmq", gq1, gq1) / 3.0
        dd = sff[:, None, None, None, None] * (ddA + ddB + ddC) + \
            jnp.einsum("enp,emq->enpmq", z1q, GFS) + \
            jnp.einsum("emq,enp->enpmq", z1q, GFS)
        k = k + (dd * wg[:, None, None, None, None]).reshape(E, m, m)
    return k


def stiffness_nlgeom(table: ElementTable, coords_e, u_e, D_e, stress_e,
                     flag: int, thick: float = 1.0, bbar: bool = False):
    """Tangent stiffness with geometric terms (STF_C3 TOTALLAG/UPDATELAG arms,
    static_LIB_3d.f90:137-204; bbar=True adds the volumetric centroid
    correction of STF_C3D8Bbar).

    Args:
      u_e: (E, nn, dim) total displacement at element nodes.
      stress_e: (E, nq, ns) 2nd PK (TL) / Cauchy (UL) stress at gauss points.
      flag: 1 TOTALLAG, 2 UPDATELAG.
    """
    from frontistr_tpu.fem.material import TOTALLAG, UPDATELAG
    if coords_e.shape[0] > CHUNK:
        # fixed-size element chunks: the full-E (E,nn,dim,nn,dim) / B /
        # DB temporaries at 1M-dof tet otherwise materialize with
        # (3,3)-minor tiled layouts and exceed HBM (the tangent is the
        # production Newton hot op — same guard as stiffness_linear)
        if D_e.shape[0] == 1:     # constant-D: close over, don't chunk
            return _chunked(
                lambda c, u, s: stiffness_nlgeom(
                    table, c, u, D_e, s, flag, thick=thick, bbar=bbar),
                coords_e, u_e, stress_e)
        return _chunked(
            lambda c, u, D, s: stiffness_nlgeom(
                table, c, u, D, s, flag, thick=thick, bbar=bbar),
            coords_e, u_e, D_e, stress_e)
    D_e = _expand_D(D_e, coords_e.shape[0])
    dN = jnp.asarray(table.dN, coords_e.dtype)
    elem = coords_e + u_e if flag == UPDATELAG else coords_e
    det, gderiv = jacobians(dN, elem)
    g0 = centroid_gderiv(table, elem) if bbar else None
    S = jnp.asarray(_selector(table.dim), coords_e.dtype)
    w = jnp.asarray(table.weights, coords_e.dtype)
    scale = thick if table.dim == 2 else 1.0
    E, nn, dim = coords_e.shape
    ndof = dim
    k = jnp.zeros((E, nn * ndof, nn * ndof), coords_e.dtype)
    for q in range(table.nq):
        g = gderiv[:, q]                                  # (E, nn, dim)
        wg = (w[q] * scale) * det[:, q]
        B = b_matrix(S, g)
        if bbar:
            B = B.at[:, :3, :].add(_bbar_correction(S, g, g0))
        if flag == TOTALLAG:
            # BL1 (static_LIB_3d.f90:137-167):
            # B1[k, (n,d)] = sum_{ij} S[k,i,j] * dudx[d,i] * g[n,j]
            dudx = jnp.einsum("end,enj->edj", u_e, g)     # du_d/dx_j
            B1 = jnp.einsum("kij,edi,enj->eknd", S, dudx, g)
            B = B + B1.reshape(E, B.shape[1], nn * ndof)
        Dq = D_e if D_e.ndim == 3 else D_e[:, q]
        DB = jnp.einsum("ekl,elj->ekj", Dq, B)
        k = k + jnp.einsum("eki,ekj,e->eij", B, DB, wg)
        # geometric (initial stress) stiffness: kg[(a,i),(b,j)] =
        #   delta_ij * g[a,:]^T sigma g[b,:]  (BN^T Smat BN form,
        #   static_LIB_3d.f90:176-203); TL/UL only
        if flag in (TOTALLAG, UPDATELAG):
            sig = stress_e[:, q]
            Sm = _stress_tensor(sig, dim)
            gsg = jnp.einsum("eak,ekl,ebl,e->eab", g, Sm, g, wg)
            kg = jnp.einsum("eab,ij->eaibj", gsg,
                            jnp.eye(dim, dtype=k.dtype))
            k = k + kg.reshape(E, nn * ndof, nn * ndof)
    return k


def _stress_tensor(sig, dim):
    """Voigt stress -> full tensor. 3D order (11,22,33,12,23,13)."""
    if dim == 3:
        s11, s22, s33, s12, s23, s13 = (sig[..., i] for i in range(6))
        row0 = jnp.stack([s11, s12, s13], -1)
        row1 = jnp.stack([s12, s22, s23], -1)
        row2 = jnp.stack([s13, s23, s33], -1)
        return jnp.stack([row0, row1, row2], -2)
    s11, s22, s12 = sig[..., 0], sig[..., 1], sig[..., 2]
    row0 = jnp.stack([s11, s12], -1)
    row1 = jnp.stack([s12, s22], -1)
    return jnp.stack([row0, row1], -2)


def _hex8ic_gderivs(table: ElementTable, coords_e):
    """Global derivs for the hex8 incompatible-mode (Wilson) element:
    8 real nodes + 3 enhanced bending modes (STF_C3D8IC,
    static_LIB_3dIC.f90:100-103: gderiv(nn+k,:) = -2*xi_k * J0^{-1}(k,:) *
    det0 / det_q with J0 the center Jacobian).

    Returns det (E, nq) and g_full (E, nq, 11, 3).
    """
    from frontistr_tpu.elements.tables import shape_deriv
    import numpy as np
    with jax.ensure_compile_time_eval():
        dN0 = np.asarray(shape_deriv(361, np.zeros(3)))       # (8,3)
    # XJ0(i,j) = sum_n x_i dN0(n,j)  (reference getJacobian orientation)
    from frontistr_tpu.fem.isoparam import det_inv_small
    XJ0 = jnp.einsum("eni,nj->eij", coords_e,
                     jnp.asarray(dN0, coords_e.dtype))
    det0, XJ0inv = det_inv_small(XJ0)
    dN = jnp.asarray(table.dN, coords_e.dtype)
    det, gderiv = jacobians(dN, coords_e)                     # (E,nq,8,3)
    pts = jnp.asarray(table.points, coords_e.dtype)           # (nq,3)
    # g_enh[e,q,k,j] = -2*pts[q,k] * XJ0inv[e,k,j] * det0[e] / det[e,q]
    g_enh = (-2.0 * pts[None, :, :, None] * XJ0inv[:, None, :, :]
             * (det0[:, None] / det)[..., None, None])
    g_full = jnp.concatenate([gderiv, g_enh], axis=2)         # (E,nq,11,3)
    return det, g_full


def _hex8ic_k_full(table: ElementTable, coords_e, D_e):
    det, g_full = _hex8ic_gderivs(table, coords_e)
    S = jnp.asarray(strain_selector_3d(), coords_e.dtype)
    w = jnp.asarray(table.weights, coords_e.dtype)
    E = coords_e.shape[0]
    m = 11 * 3
    B = jnp.einsum("kdj,eqnj->eqknd", S, g_full).reshape(
        E, table.nq, 6, m)
    wdet = w[None, :] * det
    if D_e.ndim == 4:
        DB = jnp.einsum("eqkl,eqlj,eq->eqkj", D_e, B, wdet)
    else:
        DB = jnp.einsum("ekl,eqlj,eq->eqkj", D_e, B, wdet)
    k = jnp.einsum("eqki,eqkj->eij", B, DB)
    return k, g_full


def stiffness_hex8ic(table: ElementTable, coords_e, D_e):
    """Statically-condensed incompatible-mode hex8 stiffness
    (STF_C3D8IC, static_LIB_3dIC.f90): K = Kdd - Kda Kaa^{-1} Kad."""
    D_e = _expand_D(D_e, coords_e.shape[0])
    k, _ = _hex8ic_k_full(table, coords_e, D_e)
    nd = 24
    from frontistr_tpu.utils.linalg import gauss_jordan_inv
    Kdd = k[:, :nd, :nd]
    Kda = k[:, :nd, nd:]
    Kaa = k[:, nd:, nd:]
    Kaa_inv = gauss_jordan_inv(Kaa)
    return Kdd - jnp.einsum("eij,ejk,ekl->eil", Kda, Kaa_inv,
                            jnp.swapaxes(Kda, 1, 2))


def strains_at_gauss_hex8ic(table: ElementTable, coords_e, u_e, D_e):
    """Strain recovery for the IC element (UpdateST_C3D8IC): recover the
    enhanced dofs a = -Kaa^{-1} Kad u, then eps = B_full [u; a]."""
    k, g_full = _hex8ic_k_full(table, coords_e, D_e)
    E, nn, dim = coords_e.shape
    nd = nn * dim
    from frontistr_tpu.utils.linalg import gauss_jordan_inv
    u_flat = u_e.reshape(E, nd)
    Kad = k[:, nd:, :nd]
    Kaa_inv = gauss_jordan_inv(k[:, nd:, nd:])
    a = -jnp.einsum("eij,ejk,ek->ei", Kaa_inv, Kad, u_flat)
    ua = jnp.concatenate([u_flat, a], axis=1)
    S = jnp.asarray(strain_selector_3d(), coords_e.dtype)
    eps = []
    for q in range(table.nq):
        B = b_matrix(S, g_full[:, q])
        eps.append(jnp.einsum("ekj,ej->ek", B, ua))
    return jnp.stack(eps, axis=1)


def strains_at_gauss(table: ElementTable, coords_e, u_e):
    """Small strain at every gauss point: eps = B u (UPDATE_C3 linear arm).

    Returns (E, nq, ns).
    """
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    det, gderiv = jacobians(dN, coords_e)
    S = jnp.asarray(_selector(table.dim), dt)
    # eps[e,q,k] = S[k,d,j] gderiv[e,q,n,j] u[e,n,d]
    return jnp.einsum("kdj,eqnj,end->eqk", S, gderiv, u_e)


def internal_force(table: ElementTable, coords_e, stress_e, thick: float = 1.0):
    """Equivalent nodal force qf = sum_q wg * B^T sigma (UPDATE_C3 tail).

    stress_e: (E, nq, ns). Returns (E, nn*dim).
    """
    if coords_e.shape[0] > CHUNK:
        return _chunked(lambda c, s: internal_force(table, c, s, thick),
                        coords_e, stress_e)
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    det, gderiv = jacobians(dN, coords_e)
    S = jnp.asarray(_selector(table.dim), dt)
    w = jnp.asarray(table.weights, dt)
    scale = thick if table.dim == 2 else 1.0
    E, nn, dim = coords_e.shape
    wdet = (w * scale)[None, :] * det
    # qf[e,(n,d)] = sum_qk wdet S[k,d,j] g[e,q,n,j] sig[e,q,k]
    qf = jnp.einsum("kdj,eqnj,eqk,eq->end", S, gderiv, stress_e, wdet)
    return qf.reshape(E, nn * dim)


def lumped_mass(table: ElementTable, coords_e, rho_e, thick: float = 1.0):
    """Row-sum lumped mass per node dof (fstr_EIG_setMASS semantics).

    Returns (E, nn) nodal mass (same for each dof of the node).
    """
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    N = jnp.asarray(table.N, dt)
    det, _ = jacobians(dN, coords_e)
    w = jnp.asarray(table.weights, dt)
    scale = thick if table.dim == 2 else 1.0
    # consistent mass row sums: m_a = sum_q wg rho N_a(q) * sum_b N_b(q)
    # with partition of unity sum_b N_b = 1 -> m_a = sum_q wg rho N_a
    m = jnp.einsum("qn,eq,q->en", N, det, w) * (rho_e[:, None] * scale)
    return m


def volumes(table: ElementTable, coords_e, thick: float = 1.0):
    dt = coords_e.dtype
    dN = jnp.asarray(table.dN, dt)
    det, _ = jacobians(dN, coords_e)
    w = jnp.asarray(table.weights, dt)
    scale = thick if table.dim == 2 else 1.0
    return jnp.einsum("eq,q->e", det, w) * scale
