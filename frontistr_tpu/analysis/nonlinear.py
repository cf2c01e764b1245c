"""Nonlinear static analysis: Newton-Raphson with load substepping.

The TPU rebuild of FSTR_SOLVE_NLGEOM + fstr_Newton
(fistr1/src/analysis/static/fstr_solve_NLGEOM.f90:28-253,
fstr_solve_NonLinear.f90:29-167):

- all per-gauss state (strain/stress/plastic) lives in a pytree of batched
  arrays per element-type block (replacing the reference's
  elements(:)%gausses(:) object graph, mechgauss.f90:13-31)
- each Newton iteration runs two jitted programs per block: TANGENT
  (batched element stiffness) and UPDATE (strain/stress integration +
  internal force), then a constrained mixed-precision PCG
- convergence: rres = |B|/|Q| < converg  OR  rxnrm = |du|/|Du| < converg
  (fstr_solve_NonLinear.f90:110-135)
- divergence triggers cutback: restore committed state, halve the substep
  (fstr_solve_NLGEOM.f90:151-195, fstr_Cutback.f90)
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frontistr_tpu.assembly import femop
from frontistr_tpu.assembly.model import (StructModel, collect_boundary,
                                          collect_cload)
from frontistr_tpu.assembly import operators as old_ops
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import material as mat
from frontistr_tpu.fem import solid
from frontistr_tpu.fem.isoparam import jacobians, strain_selector_3d, \
    strain_selector_2d
from frontistr_tpu.solver import cg as krylov
from frontistr_tpu.solver.mixed import refined_cg
from frontistr_tpu.analysis.static import StaticResult, _solve_policy
from frontistr_tpu.post import nodal as postnodal


def _sel(dim):
    return strain_selector_3d() if dim == 3 else strain_selector_2d()


def init_block_state(block, table):
    if block.kind in ("shell", "beam", "beam341", "sshell") \
            or table is None:
        # linear structural elements carry no gauss history
        return dict()
    E, nq = len(block.elem_ids), table.nq
    ns = 6 if get_table(block.etype).dim == 3 else 4
    z = jnp.zeros((E, nq, ns))
    zs = jnp.zeros((E, nq))
    st = dict(strain=z, stress=z, strain_bak=z, stress_bak=z,
              pstrain=zs, pstrain_new=zs,
              yielded=jnp.zeros((E, nq), bool), back=z)
    m = block.material
    if m.mtype == mat.USERMATERIAL:
        st["fstat"] = jnp.zeros((E, nq, max(m.user_nstatus, 1)))
    if m.mtype == mat.VISCOELASTIC and m.visco_consts is not None:
        nterms = len(np.asarray(m.visco_consts).reshape(-1, 2))
        st["vq"] = jnp.zeros((E, nq, nterms, ns))
        st["vq_new"] = jnp.zeros((E, nq, nterms, ns))
        st["ven"] = z
    return st


def _plastic_params(m: mat.Material):
    from frontistr_tpu.fem.plastic import PlasticParams
    consts = m.plastic_consts
    table = None
    if m.hardening.upper() == "MULTILINEAR":
        table = np.asarray(consts).reshape(-1, 2)
        consts = table
    return PlasticParams(m.youngs, m.poisson, m.hardening.upper(),
                         np.asarray(consts).reshape(-1)
                         if m.hardening.upper() != "MULTILINEAR"
                         else np.asarray(consts).reshape(-1),
                         table=table, yield_func=m.yield_func.upper())


class BlockPrograms:
    """Jitted TANGENT / UPDATE programs for one element-type block."""

    def __init__(self, model: StructModel, block):
        self.block = block
        if block.kind in ("shell", "beam", "beam341", "sshell"):
            # linear structural elements: constant tangent, qf = ke u
            from frontistr_tpu.analysis.static import \
                compute_element_stiffness
            idx = model.blocks.index(block)
            ke = compute_element_stiffness(model)[idx]
            self.table = None
            self.mtype = mat.ELASTIC
            self.flag = mat.INFINITESIMAL
            self._carry = {"ke": jnp.asarray(ke)}
            self._tangent = jax.jit(
                lambda carry, u_e, ddu_e, st, t, dt: carry["ke"])
            self._update = jax.jit(lambda carry, u_e, ddu_e, st, t, dt: (
                st,
                jnp.einsum("eij,ej->ei", carry["ke"],
                           (u_e + ddu_e).reshape(carry["ke"].shape[0],
                                                 -1))))
            self._linear_struct = True
            return
        self._linear_struct = False
        self.table = get_table(block.etype)
        self.dim = self.table.dim
        self.ns = 6 if self.dim == 3 else 4
        m = block.material
        self.mtype = m.mtype
        self.flag = m.nlgeom
        self.coords_e = jnp.asarray(model.coords[block.conn])
        # constant-D compression: one material over the block means the
        # per-element (E, 6, 6) array is E identical copies — on device
        # it gets a T(8,128)-tiled layout copy (28x padding, 22 GB at
        # 1M-dof tet; even an eager [:1] slice of the device array OOMs
        # the layout pass).  Compress on the HOST, broadcast lazily at
        # use sites (_De / _expand_D: fused broadcast ops, no buffer).
        D_np = np.asarray(block.D)
        self._De_shape = D_np.shape
        if (D_np.ndim >= 3 and D_np.shape[0] > 1
                and not np.any(D_np[1:] != D_np[:1])):
            D_np = D_np[:1]
        self.D_e = jnp.asarray(D_np)
        self.thick = block.thick
        # Isotropic small-strain fast path: one gram matmul per element
        # (stiffness_linear_iso) instead of the generic B^T D B chain —
        # ~20x fewer f64-emulated FLOPs on TPU and none of the multi-GB
        # B/DB temporaries that OOM HBM at 1M-dof tet.  Valid when the
        # block's D is one isotropic matrix broadcast over elements.
        self.iso_lm = None
        if (m.mtype == mat.ELASTIC and self.dim == 3
                and m.ortho_consts is None and np.ndim(block.D) == 3
                and not np.any(block.D[1:] != block.D[:1])):
            E_, nu = float(m.youngs), float(m.poisson)
            self.iso_lm = (E_ * nu / ((1 + nu) * (1 - 2 * nu)),
                           E_ / (2 * (1 + nu)))
        if self.mtype in (mat.HYPERELASTIC_NEOHOOKE,
                          mat.HYPERELASTIC_MOONEYRIVLIN,
                          mat.HYPERELASTIC_ARRUDABOYCE):
            from frontistr_tpu.fem.hyper import make_hyper_fns
            # NEOHOOKE reads the material's (E, nu) — the reference's
            # law ignores the !HYPERELASTIC card values (see hyper.py)
            hc = ((m.youngs, m.poisson)
                  if self.mtype == mat.HYPERELASTIC_NEOHOOKE
                  else m.hyper_consts)
            self.pk2, self.hyper_tangent = make_hyper_fns(
                self.mtype, hc)
        if self.mtype == mat.EPLASTIC:
            self.pl = _plastic_params(m)

        if self.mtype == mat.VISCOELASTIC:
            vt = np.asarray(m.visco_consts).reshape(-1, 2)
            self.v_mus = jnp.asarray(vt[:, 0])
            self.v_taus = jnp.asarray(vt[:, 1])
            self.v_G = m.youngs / (2.0 * (1.0 + m.poisson))
            self.v_K = m.youngs / (3.0 * (1.0 - 2.0 * m.poisson))
            # TRS reduced time: dt' = a(T_gauss) dt (Viscoelastic.f90:128)
            self.v_tshift = None
            if m.trs_consts is not None and model.temperature is not None:
                from frontistr_tpu.fem.visco import trs_shift
                T_e = jnp.asarray(model.temperature)[jnp.asarray(
                    block.conn)]
                tq = jnp.einsum("qn,en->eq",
                                jnp.asarray(self.table.N), T_e)
                self.v_tshift = trs_shift(tq, m.trs_consts, m.trs_def)
        if self.mtype == mat.USERMATERIAL:
            from frontistr_tpu import user as fuser
            fn = fuser.get_umat(m.name)
            if fn is None:
                raise ValueError(
                    f"!USER_MATERIAL '{m.name}': no umat registered — "
                    "register one via frontistr_tpu.user.register_umat "
                    "or set FRONTISTR_TPU_USER_MODULE")
            self.user_fn = fn
            self.user_matl = jnp.asarray(
                m.user_consts if m.user_consts is not None
                else np.zeros(0))
        if self.mtype == mat.CREEP:
            cc = np.asarray(m.creep_consts).reshape(-1)
            self.c_A, self.c_n = float(cc[0]), float(cc[1])
            self.c_m = float(cc[2]) if len(cc) > 2 else 0.0
            self.c_G = m.youngs / (2.0 * (1.0 + m.poisson))

        # Big per-element constants ride through the jit boundary as
        # ARGUMENTS: a closed-over device array is inlined into the
        # lowered HLO as a dense literal, and at ~1M dof coords_e alone
        # is >100 MB of literal — the remote TPU compile endpoint
        # rejects the module (HTTP 413).  The traced fns temporarily
        # bind the carried tracers onto self so every self.coords_e /
        # self.D_e use inside _tangent_fn/_update_fn traces against the
        # argument, then restore the concrete arrays.
        self._carry = {"coords_e": self.coords_e, "D_e": self.D_e}
        if getattr(self, "v_tshift", None) is not None:
            self._carry["v_tshift"] = self.v_tshift

        def _bind(vals):
            for k, v in vals.items():
                setattr(self, k, v)

        def _tangent_c(carry, u_e, ddu_e, st, t, dt):
            _bind(carry)
            try:
                return self._tangent_fn(u_e, ddu_e, st, t, dt)
            finally:
                _bind(self._carry)

        def _update_c(carry, u_e, ddu_e, st, t, dt):
            _bind(carry)
            try:
                return self._update_fn(u_e, ddu_e, st, t, dt)
            finally:
                _bind(self._carry)

        self._tangent = jax.jit(_tangent_c)
        self._update = jax.jit(_update_c)

    @property
    def bbar(self):
        return self.block.etype == 361 and self.block.formulation == "BBAR"

    @property
    def fbar(self):
        return self.block.etype == 361 and self.block.formulation == "FBAR"

    # ---------------- tangent (fstr_StiffMatrix / STF_C3) ----------------
    def _tangent_fn(self, u_e, ddu_e, state, time, dtime):
        table, flag = self.table, self.flag
        total = u_e + ddu_e
        if flag == mat.INFINITESIMAL:
            D = self._material_D(state, time, dtime)
            if self.block.etype == 361 and self.block.formulation == "IC":
                return solid.stiffness_hex8ic(table, self.coords_e, D)
            if self.fbar:
                return solid.stiffness_hex8fbar(table, self.coords_e, D)
            if self.bbar:
                return solid.stiffness_nlgeom(
                    table, self.coords_e, total, D, state["stress"],
                    mat.INFINITESIMAL, thick=self.thick, bbar=True)
            if self.iso_lm is not None:
                return solid.stiffness_linear_iso(
                    table, self.coords_e, *self.iso_lm)
            return solid.stiffness_linear(table, self.coords_e, D,
                                          thick=self.thick)
        D = self._material_D(state, time, dtime)
        if flag == mat.UPDATELAG:
            # D <- D - geomat(sigma) (STF_C3:117-120)
            if D.ndim == 3:
                D = D[:, None] - _geomat(state["stress"], self.ns)
            else:
                D = D - _geomat(state["stress"], self.ns)
            stress = state["stress"]
            if self.fbar:
                return solid.stiffness_nlgeom_fbar(
                    table, self.coords_e, total, D, stress, mat.UPDATELAG)
            return solid.stiffness_nlgeom(table, self.coords_e, total, D,
                                          stress, mat.UPDATELAG,
                                          thick=self.thick, bbar=self.bbar)
        # TOTALLAG
        stress = state["stress"]
        if self.fbar:
            return solid.stiffness_nlgeom_fbar(
                table, self.coords_e, total, D, stress, mat.TOTALLAG)
        return solid.stiffness_nlgeom(table, self.coords_e, total, D,
                                      stress, mat.TOTALLAG, thick=self.thick,
                                      bbar=self.bbar)

    def _De(self):
        """Full-shape elastic D (lazily broadcast if compressed).
        _E_pad overrides the element count when the sharded Newton
        engine runs this program over a padded element axis."""
        shp = self._De_shape
        ep = getattr(self, "_E_pad", None)
        if ep:
            shp = (ep,) + tuple(shp[1:])
        return jnp.broadcast_to(self.D_e, shp)

    def _material_D(self, state, time=0.0, dtime=0.0):
        if self.mtype == mat.ELASTIC:
            # possibly constant-D compressed (1, 6, 6): the solid
            # kernels expand lazily inside their chunk bodies
            return self.D_e
        if self.mtype in (mat.HYPERELASTIC_NEOHOOKE,
                          mat.HYPERELASTIC_MOONEYRIVLIN,
                          mat.HYPERELASTIC_ARRUDABOYCE):
            # tangent at current strain, per gauss point: (E, nq, 6, 6)
            return self.hyper_tangent(state["strain"])
        if self.mtype == mat.EPLASTIC:
            from frontistr_tpu.fem.plastic import plastic_tangent
            De = self._De()[:, None, :, :] * jnp.ones(
                (1, self.table.nq, 1, 1))
            return plastic_tangent(self.pl, De, state["stress"],
                                   state["pstrain_new"], state["back"],
                                   state["yielded"])
        if self.mtype == mat.VISCOELASTIC:
            from frontistr_tpu.fem.visco import visco_D
            if self.v_tshift is not None:
                Dq = visco_D(dtime * self.v_tshift, self.v_G, self.v_K,
                             self.v_mus, self.v_taus)    # (E, nq, 6, 6)
                return Dq
            D1 = visco_D(dtime, self.v_G, self.v_K, self.v_mus,
                         self.v_taus)
            return D1[None]      # constant-D (1, 6, 6): expanded lazily
        if self.mtype == mat.USERMATERIAL:
            def one(eps, sig, fs):
                D, _, _ = self.user_fn(self.user_matl, eps, sig, fs,
                                       dtime, time)
                return D
            return jax.vmap(jax.vmap(one))(
                state["strain"], state["stress"], state["fstat"])
        if self.mtype == mat.CREEP:
            from frontistr_tpu.fem.visco import creep_tangent
            De = self._De()[:, None, :, :] * jnp.ones(
                (1, self.table.nq, 1, 1))
            return creep_tangent(De, state["stress"],
                                 state["pstrain_new"], self.c_G,
                                 self.c_A, self.c_n, self.c_m, time, dtime)
        return self._De()

    # ---------------- update (fstr_UpdateNewton / UPDATE_C3) -------------
    def _update_fn(self, u_e, ddu_e, state, time, dtime):
        table, flag = self.table, self.flag
        dt = self.coords_e.dtype
        total = u_e + ddu_e
        if flag == mat.UPDATELAG:
            elem = self.coords_e + u_e + 0.5 * ddu_e   # midpoint config
            elem1 = self.coords_e + total
            disp = ddu_e
        else:
            elem = self.coords_e
            elem1 = None
            disp = total
        dN = jnp.asarray(table.dN, dt)
        det, gderiv = jacobians(dN, elem)
        S = jnp.asarray(_sel(self.dim), dt)
        # displacement gradient at qps: (E, nq, dim, dim)
        dudx = jnp.einsum("end,eqnj->eqdj", disp, gderiv)
        # small-strain part (UPDATE_C3:131-139)
        eps = jnp.einsum("kdj,eqdj->eqk", S, dudx)
        g0 = None
        if self.bbar or (self.fbar and flag != mat.TOTALLAG):
            # volumetric dilatation correction: centroid reference for
            # B-bar (Update_C3D8Bbar:70-94,151-156), volume average for
            # F-bar (Update_C3D8Fbar:532-541 INFINITE / :587-597 UL
            # gderiv05_ave)
            if self.bbar:
                g0 = solid.centroid_gderiv(table, elem)
            else:
                g0, _, _ = solid.volavg_gderiv(table, elem)
            dudx0 = jnp.einsum("end,enj->edj", disp, g0)
            vol0 = jnp.trace(dudx0, axis1=-2, axis2=-1) / 3.0
            dvol = vol0[:, None] - jnp.trace(dudx, axis1=-2,
                                             axis2=-1) / 3.0
            eps = eps.at[..., :3].add(dvol[..., None])

        new_state = dict(state)
        fb_ctx = None
        if flag == mat.TOTALLAG and self.fbar:
            # F-bar Green-Lagrange strain from Fbar = Jr (I + du/dX)
            # (Update_C3D8Fbar:556-565)
            eye = jnp.eye(3, dtype=dt)
            F = eye[None, None] + dudx                    # (E, nq, 3, 3)
            jacob = jnp.linalg.det(F)
            elem1_t = self.coords_e + total
            det1, g1 = jacobians(dN, elem1_t)
            w = jnp.asarray(table.weights, dt)
            wg0 = w[None, :] * det
            jwg = wg0 * jacob
            V0J = jwg.sum(axis=1)
            g1_ave = jnp.einsum("eq,eqnd->end", jwg, g1) / \
                V0J[:, None, None]
            jacob_ave = V0J / wg0.sum(axis=1)
            Jr = (jacob_ave ** (1.0 / 3.0))[:, None] * \
                jacob ** (-1.0 / 3.0)                     # (E, nq)
            Fb = Jr[:, :, None, None] * F
            C = jnp.einsum("eqki,eqkj->eqij", Fb, Fb)
            eps = jnp.stack([
                0.5 * (C[..., 0, 0] - 1), 0.5 * (C[..., 1, 1] - 1),
                0.5 * (C[..., 2, 2] - 1), C[..., 0, 1], C[..., 1, 2],
                C[..., 2, 0]], axis=-1)                   # (E, nq, 6)
            fb_ctx = (Jr, g1, g1_ave, eps)
            new_state["strain"] = eps
            sig = self._stress_total(eps, state, new_state, time, dtime)
            new_state["stress"] = sig
        elif flag == mat.TOTALLAG:
            # Green-Lagrange quadratic terms (UPDATE_C3:154-168)
            quad = jnp.einsum("kij,eqdi,eqdj->eqk", _glq(self.ns, dt),
                              dudx, dudx)
            eps = eps + quad
            new_state["strain"] = eps
            sig = self._stress_total(eps, state, new_state, time, dtime)
            new_state["stress"] = sig
        elif flag == mat.INFINITESIMAL:
            new_state["strain"] = eps
            sig = self._stress_total(eps, state, new_state, time, dtime)
            new_state["stress"] = sig
        else:  # UPDATELAG: incremental with Jaumann rotation
            new_state["strain"] = state["strain_bak"] + eps
            dsig = (jnp.einsum("eqkl,eql->eqk", self._De(), eps)
                    if len(self._De_shape) == 4 else
                    jnp.einsum("ekl,eql->eqk", self._De(), eps))
            rot = 0.5 * (dudx - jnp.swapaxes(dudx, -1, -2))
            sig_b = _voigt_to_tensor(state["stress_bak"], self.dim)
            dum = rot @ sig_b - sig_b @ rot
            sig = state["stress_bak"] + dsig + _tensor_to_voigt(dum,
                                                                self.ns)
            if self.mtype == mat.CREEP:
                # Norton return mapping on the rotated trial
                # (UPDATE_C3 UPDATELAG NORTON arm)
                from frontistr_tpu.fem.visco import creep_return
                sig_c, dg, eqvs = creep_return(
                    sig, self.c_G, self.c_A, self.c_n, self.c_m, time,
                    dtime)
                apply_c = dtime > 0.0
                sig = jnp.where(apply_c, sig_c, sig)
                new_state["pstrain_new"] = jnp.where(apply_c, dg,
                                                     0.0 * dg)
            new_state["stress"] = sig

        if self.mtype == mat.EPLASTIC:
            from frontistr_tpu.fem.plastic import return_mapping
            sig, p_new, yielded, back = return_mapping(
                self.pl, new_state["stress"], state["pstrain"],
                state["back"])
            new_state["stress"] = sig
            new_state["pstrain_new"] = p_new
            new_state["yielded"] = yielded
            new_state["back"] = back

        # internal force (UPDATE_C3 tail): B evaluated per flag
        if flag == mat.TOTALLAG and self.fbar:
            # qf = [Jr^2 (B0 + B1) + B2]^T sigma
            # (Update_C3D8Fbar:663-733 TOTALLAG arm)
            Jr, g1, g1_ave, eps_fb = fb_ctx
            sig = new_state["stress"]
            w = jnp.asarray(table.weights, dt)
            wdet = w[None, :] * det
            wdet2 = wdet * Jr ** 2
            qf0 = jnp.einsum("kdj,eqnj,eqk,eq->end", S, gderiv, sig,
                             wdet2)
            qf1 = jnp.einsum("kij,eqdi,eqnj,eqk,eq->end", S, dudx,
                             gderiv, sig, wdet2)
            z1q = (g1_ave[:, None] - g1) / 3.0            # (E, nq, nn, 3)
            fac = jnp.concatenate([2 * eps_fb[..., :3] + 1.0,
                                   2 * eps_fb[..., 3:]], axis=-1)
            sf = jnp.einsum("eqk,eqk->eq", sig, fac)
            qf2 = jnp.einsum("eq,eqnd,eq->end", sf, z1q, wdet)
            E_ = gderiv.shape[0]
            qf = (qf0 + qf1 + qf2).reshape(E_, -1)
        elif flag == mat.TOTALLAG:
            qf = _qf_totallag(table, S, gderiv, det, dudx,
                              new_state["stress"], self.thick, self.dim)
            if self.bbar:
                qf = qf + _qf_bbar_extra(table, gderiv, g0, det,
                                         new_state["stress"], self.thick)
        elif flag == mat.UPDATELAG:
            det1, gderiv1 = jacobians(dN, elem1)
            if self.fbar:
                # qf = [B(elem1) + B2]^T sigma * Jr^3 w det1
                # (Update_C3D8Fbar:735-766 UPDATELAG arm); Jr and the
                # jacob-weighted g1_ave come from the TOTAL displacement
                # on the reference config (:430-456)
                eye = jnp.eye(3, dtype=dt)
                det0, g0d = jacobians(dN, self.coords_e)
                dudx_t = jnp.einsum("end,eqnj->eqdj", total, g0d)
                jacob = jnp.linalg.det(eye[None, None] + dudx_t)
                w = jnp.asarray(table.weights, dt)
                wg0 = w[None, :] * det0
                jwg = wg0 * jacob
                V0J = jwg.sum(axis=1)
                g1_ave = jnp.einsum("eq,eqnd->end", jwg, gderiv1) / \
                    V0J[:, None, None]
                jacob_ave = V0J / wg0.sum(axis=1)
                Jr = (jacob_ave ** (1.0 / 3.0))[:, None] * \
                    jacob ** (-1.0 / 3.0)
                sig = new_state["stress"]
                wdet = w[None, :] * det1 * Jr ** 3
                qf0 = jnp.einsum("kdj,eqnj,eqk,eq->end", S, gderiv1,
                                 sig, wdet)
                z1q = (g1_ave[:, None] - gderiv1) / 3.0
                tr_s = sig[..., 0] + sig[..., 1] + sig[..., 2]
                qf2 = jnp.einsum("eq,eqnd,eq->end", tr_s, z1q, wdet)
                E_ = gderiv1.shape[0]
                qf = (qf0 + qf2).reshape(E_, -1)
            else:
                qf = solid.internal_force(table, elem1,
                                          new_state["stress"],
                                          thick=self.thick)
                if self.bbar:
                    g01 = solid.centroid_gderiv(table, elem1)
                    qf = qf + _qf_bbar_extra(table, gderiv1, g01, det1,
                                             new_state["stress"],
                                             self.thick)
        else:
            if self.bbar or self.fbar:
                # F-bar INFINITE qf correction has the same (g0-g)/3 row
                # shape as B-bar, with the volume-averaged reference
                # (Update_C3D8Fbar:676-689)
                qf = solid.internal_force(table, self.coords_e,
                                          new_state["stress"],
                                          thick=self.thick)
                qf = qf + _qf_bbar_extra(table, gderiv, g0, det,
                                         new_state["stress"], self.thick)
            elif self.block.etype == 361 and self.block.formulation == "IC":
                # IC element: strains/stress already consistent; qf via
                # condensed stiffness times displacement
                ke = solid.stiffness_hex8ic(self.table, self.coords_e,
                                            self._De())
                E = ke.shape[0]
                qf = jnp.einsum("eij,ej->ei", ke,
                                disp.reshape(E, -1))
            else:
                qf = solid.internal_force(table, self.coords_e,
                                          new_state["stress"],
                                          thick=self.thick)
        return new_state, qf

    def _stress_total(self, eps, state, new_state, time, dtime):
        """Stress from total strain (INFINITE / TOTALLAG arms)."""
        if self.mtype == mat.USERMATERIAL:
            # uUpdate plug point (umat.f90:30-41), vmapped over gauss pts
            def one(e, s, fs):
                _, sig, fs2 = self.user_fn(self.user_matl, e, s, fs,
                                           dtime, time)
                return sig, fs2
            sig, fs2 = jax.vmap(jax.vmap(one))(
                eps, state["stress"], state["fstat"])
            new_state["fstat"] = fs2
            return sig
        if self.mtype in (mat.HYPERELASTIC_NEOHOOKE,
                          mat.HYPERELASTIC_MOONEYRIVLIN,
                          mat.HYPERELASTIC_ARRUDABOYCE):
            return self.pk2(eps)
        if self.mtype == mat.VISCOELASTIC:
            from frontistr_tpu.fem.visco import visco_update
            dte = dtime * self.v_tshift if self.v_tshift is not None \
                else dtime
            sig_v, vq_new = visco_update(eps, state["vq"], state["ven"],
                                         dte, self.v_G, self.v_K,
                                         self.v_mus, self.v_taus)
            sig_el = (jnp.einsum("eqkl,eql->eqk", self._De(), eps)
                      if len(self._De_shape) == 4 else
                      jnp.einsum("ekl,eql->eqk", self._De(), eps))
            use_v = dtime != 0.0
            new_state["vq_new"] = jnp.where(use_v, vq_new, state["vq"])
            return jnp.where(use_v, sig_v, sig_el)
        return (jnp.einsum("eqkl,eql->eqk", self._De(), eps)
                if len(self._De_shape) == 4 else
                jnp.einsum("ekl,eql->eqk", self._De(), eps))

    def tangent(self, u_e, ddu_e, state, time=0.0, dtime=0.0):
        return self._tangent(self._carry, u_e, ddu_e, state,
                             jnp.asarray(time), jnp.asarray(dtime))

    def update(self, u_e, ddu_e, state, time=0.0, dtime=0.0):
        return self._update(self._carry, u_e, ddu_e, state,
                            jnp.asarray(time), jnp.asarray(dtime))


def _glq(ns, dt):
    """Selector for Green-Lagrange quadratic terms: E_k += 0.5*u_{d,i}u_{d,j}
    with Voigt pairing identical to the linear selector."""
    import numpy as np
    if ns == 6:
        S = strain_selector_3d()
    else:
        S = strain_selector_2d()
    return jnp.asarray(0.5 * S, dt)


def _geomat(stress, ns):
    """GEOMAT_C3 (static_LIB_3d.f90): the UL material-matrix correction."""
    s = stress
    if ns != 6:
        raise NotImplementedError("UL currently 3D only")
    E, nq = s.shape[:2]
    G = jnp.zeros((E, nq, 6, 6), s.dtype)
    s11, s22, s33 = s[..., 0], s[..., 1], s[..., 2]
    s12, s23, s31 = s[..., 3], s[..., 4], s[..., 5]
    G = G.at[..., 0, 0].set(2 * s11)
    G = G.at[..., 1, 1].set(2 * s22)
    G = G.at[..., 2, 2].set(2 * s33)
    G = G.at[..., 0, 3].set(s12); G = G.at[..., 3, 0].set(s12)
    G = G.at[..., 1, 3].set(s12); G = G.at[..., 3, 1].set(s12)
    G = G.at[..., 1, 4].set(s23); G = G.at[..., 4, 1].set(s23)
    G = G.at[..., 2, 4].set(s23); G = G.at[..., 4, 2].set(s23)
    G = G.at[..., 0, 5].set(s31); G = G.at[..., 5, 0].set(s31)
    G = G.at[..., 2, 5].set(s31); G = G.at[..., 5, 2].set(s31)
    G = G.at[..., 3, 3].set(0.5 * (s11 + s22))
    G = G.at[..., 4, 4].set(0.5 * (s22 + s33))
    G = G.at[..., 5, 5].set(0.5 * (s11 + s33))
    G = G.at[..., 3, 4].set(0.5 * s31); G = G.at[..., 4, 3].set(0.5 * s31)
    G = G.at[..., 4, 5].set(0.5 * s12); G = G.at[..., 5, 4].set(0.5 * s12)
    G = G.at[..., 3, 5].set(0.5 * s23); G = G.at[..., 5, 3].set(0.5 * s23)
    return G


def _voigt_to_tensor(v, dim):
    if dim == 3:
        s11, s22, s33 = v[..., 0], v[..., 1], v[..., 2]
        s12, s23, s31 = v[..., 3], v[..., 4], v[..., 5]
        r0 = jnp.stack([s11, s12, s31], -1)
        r1 = jnp.stack([s12, s22, s23], -1)
        r2 = jnp.stack([s31, s23, s33], -1)
        return jnp.stack([r0, r1, r2], -2)
    s11, s22, s12 = v[..., 0], v[..., 1], v[..., 2]
    r0 = jnp.stack([s11, s12], -1)
    r1 = jnp.stack([s12, s22], -1)
    return jnp.stack([r0, r1], -2)


def _tensor_to_voigt(t, ns):
    if ns == 6:
        return jnp.stack([t[..., 0, 0], t[..., 1, 1], t[..., 2, 2],
                          t[..., 0, 1], t[..., 1, 2], t[..., 2, 0]], -1)
    out = jnp.stack([t[..., 0, 0], t[..., 1, 1], t[..., 0, 1]], -1)
    pad = jnp.zeros(out.shape[:-1] + (1,), out.dtype)
    return jnp.concatenate([out, pad], -1)


def _qf_bbar_extra(table, gderiv, g0, det, stress, thick):
    """B-bar internal-force correction: the modified rows add
    (g0-g)/3 * tr(sigma) per direction column (Update_C3D8Bbar:261-276)."""
    w = jnp.asarray(table.weights, det.dtype)
    wdet = w[None, :] * det
    trs = stress[..., 0] + stress[..., 1] + stress[..., 2]
    corr = (g0[:, None] - gderiv) / 3.0                  # (E, nq, nn, dim)
    E, _, nn, dim = corr.shape
    out = jnp.einsum("eqnd,eq,eq->end", corr, trs, wdet)
    return out.reshape(E, nn * dim)


def _qf_totallag(table, S, gderiv, det, dudx, stress, thick, dim):
    """qf = (B0+B1)^T S integrated on the reference config
    (UPDATE_C3:252-297)."""
    w = jnp.asarray(table.weights, det.dtype)
    scale = thick if dim == 2 else 1.0
    wdet = (w * scale)[None, :] * det
    # B0^T sigma
    qf0 = jnp.einsum("kdj,eqnj,eqk,eq->end", S, gderiv, stress, wdet)
    # B1^T sigma: B1[k,(n,d)] = S[k,i,j] dudx[d,i] g[n,j] (sym in i<->j via S)
    qf1 = jnp.einsum("kij,eqdi,eqnj,eqk,eq->end", S, dudx, gderiv, stress,
                     wdet)
    E, nn = gderiv.shape[0], gderiv.shape[2]
    return (qf0 + qf1).reshape(E, nn * dim)


def make_contact_solver(model, dofs_j, nns, inc_j, total_en, free,
                        friction: bool = False, eff=None, mass=None,
                        mpc: bool = True):
    """Jitted solve with a varying contact block applied outside the static
    incidence (scatter-add; contact conn changes face targets per search).

    friction=True switches the Krylov method to BiCGSTAB: the consistent
    Coulomb slip tangent is nonsymmetric (the reference solves it with
    MUMPS or the contact-extended iterative path,
    solve_LINEQ_contact.f90).

    eff=(c1, c2) with mass = lumped per-dof mass solves the Newmark
    effective system c1 K + c2 M + K_c instead of K + K_c (the implicit-
    dynamics contact arm, fstr_dynamic_nlimplicit.f90:374+); the contact
    tangent K_c enters unscaled — it linearizes the contact force in the
    residual, which carries no Rayleigh factor.

    !EQUATION constraints are eliminated on the contact-extended
    operator T^t (K + K_c) T — the reference applies
    hecmw_mat_ass_equation at the middleware level before EVERY solve,
    contact decks included; the AL/penalty contact force lives in the
    full dof space, so eliminating the MPC dofs from it constrains the
    contact force consistently."""
    n_node, ndof = model.n_node, model.ndof
    sv = model.cfg.solver
    nns_t = tuple(nns)
    c1, c2 = eff if eff is not None else (1.0, 0.0)
    from frontistr_tpu.assembly import extras as exmod
    mpc_a = exmod.mpc_arrays(model.mesh, ndof, n_node * ndof) \
        if mpc else None

    @jax.jit
    def _solve(ctx, kes, B, dirichlet_inc, cdofs, cke, gfac):
        dofs, inc, free, m_eff, mpc = ctx

        op = femop.FEOperator(list(kes), dofs, nns_t, inc, total_en,
                              n_node, ndof, free)

        def A_raw(x):
            y = op.matvec(x)
            if eff is not None:
                y = c1 * y + c2 * m_eff * x
            fe = jnp.einsum("eij,ej->ei", cke, x[cdofs])
            return y.at[cdofs.reshape(-1)].add(fe.reshape(-1))

        def A(x):
            y = A_raw(x * free)
            return y * free + x * (1.0 - free)

        b_c = (B - A_raw(dirichlet_inc)) * free + \
            dirichlet_inc * (1.0 - free)
        A_cg = A
        if mpc is not None:
            b_c = exmod.mpc_reduce_rhs(mpc, A, b_c, gfac)
            A_cg = exmod.mpc_wrap(mpc, A)
        M_pc = op.block_jacobi(scale=c1, diag_add=(
            c2 * m_eff if eff is not None else None))
        solver = krylov.bicgstab if friction else krylov.pcg
        res = solver(A_cg, b_c, M=M_pc, tol=sv.resid,
                     maxiter=sv.nier)
        x = res.x
        if mpc is not None:
            x = exmod.mpc_recover(mpc, x, gfac)
        return x

    ctx = (list(dofs_j), inc_j, free,
           mass if mass is not None else jnp.zeros(0), mpc_a)

    def solve(kes, B, dirichlet_inc, cdofs, cke, gfac=0.0):
        return _solve(ctx, kes, B, dirichlet_inc, cdofs, cke,
                      jnp.asarray(float(gfac)))

    solve.has_mpc = mpc_a is not None
    return solve


def contact_mpc_disjoint(cm, model) -> bool:
    """Host check: do the contact constraints and the !EQUATION MPCs
    touch disjoint dofs?  Required for the exact composition
    T_c^t T_m^t A T_m T_c in the SLag contact arm (the transforms
    commute only when neither eliminates or references the other's
    dofs).  Conservative: ALL slave-node dofs and ALL candidate
    master-face-node dofs count as contact dofs, so the answer holds
    for every active set / pivot choice."""
    from frontistr_tpu.assembly import extras as exmod
    ndof = model.ndof
    mpc_a = exmod.mpc_arrays(model.mesh, ndof, model.n_node * ndof)
    if mpc_a is None:
        return True
    cnodes = [np.asarray(cm.all_slaves)]
    for p in cm.pairs:
        f = np.asarray(p.faces).reshape(-1)
        cnodes.append(f[f >= 0])
    cnodes = np.unique(np.concatenate(cnodes))
    cdof = (cnodes[:, None] * ndof + np.arange(ndof)[None, :]).reshape(-1)
    mdof = np.unique(np.concatenate([
        np.asarray(mpc_a["dep"]).reshape(-1),
        np.asarray(mpc_a["mast"]).reshape(-1)]))
    return not np.intersect1d(cdof, mdof).size


def make_slag_contact_solver(model, dofs_j, nns, inc_j, total_en,
                             free, eff=None, mass=None,
                             mpc: bool = False):
    """Exact-Lagrange contact solve: slave-dof elimination T K T^t
    (solve_LINEQ_iter_contact.f90:115-500) with fixed-shape constraint
    slots so the active set never recompiles.  Returns
    (solve(kes, B, dirichlet_inc, cn), eliminator).

    eff=(c1, c2) + mass eliminates on the Newmark effective matrix
    c1 K + c2 M (implicit-dynamics SLag contact,
    fstr_dynamic_nlimplicit.f90:374+).

    !EQUATION constraints compose as the INNER elimination (the
    reference applies hecmw_mat_ass_equation to K before the contact
    path runs): A_r = T_c^t T_m^t A T_m T_c.  Valid when the MPC and
    contact constraints touch disjoint dofs — the driver verifies that
    on the host (contact_mpc_disjoint) and falls back loudly
    otherwise."""
    from frontistr_tpu.contact.slag import ContactEliminator
    n_node, ndof = model.n_node, model.ndof
    sv = model.cfg.solver
    nns_t = tuple(nns)
    elim = ContactEliminator(model.n_dof_total, ndof)
    c1, c2 = eff if eff is not None else (1.0, 0.0)
    from frontistr_tpu.assembly import extras as exmod
    mpc_a = None
    if mpc:
        mpc_a = exmod.mpc_arrays(model.mesh, ndof, n_node * ndof)

    @jax.jit
    def _solve(ctx, cn, kes, B, dirichlet_inc, gfac):
        dofs, inc, free, m_eff, mpc_t = ctx
        op = femop.FEOperator(list(kes), dofs, nns_t, inc, total_en,
                              n_node, ndof, free)

        def mv(x):
            y = op.matvec(x)
            if eff is not None:
                y = c1 * y + c2 * m_eff * x
            return y

        def A0(x):
            xm = x * free
            return mv(xm) * free + x * (1.0 - free)

        b_c = (B - mv(dirichlet_inc)) * free + \
            dirichlet_inc * (1.0 - free)
        A1, b1 = A0, b_c
        if mpc_t is not None:
            b1 = exmod.mpc_reduce_rhs(mpc_t, A0, b_c, gfac)
            A1 = exmod.mpc_wrap(mpc_t, A0)
        A = elim.wrap(cn, A1)
        b_r = elim.reduce_rhs(cn, A1, b1)
        M_pc = op.block_jacobi(scale=c1, diag_add=(
            c2 * m_eff if eff is not None else None))
        res = krylov.pcg(A, b_r, M=M_pc, tol=sv.resid,
                         maxiter=sv.nier)
        x = elim.recover(cn, res.x)
        if mpc_t is not None:
            x = exmod.mpc_recover(mpc_t, x, gfac)
        return x

    ctx = (list(dofs_j), inc_j, free,
           mass if mass is not None else jnp.zeros(0), mpc_a)

    def solve(kes, B, dirichlet_inc, cn, gfac=0.0):
        return _solve(ctx, cn, kes, B, dirichlet_inc,
                      jnp.asarray(float(gfac)))

    solve.has_mpc = mpc_a is not None
    return solve, elim


def make_saddle_contact_solver(model, dofs_j, nns, inc_j, total_en,
                               free, eff=None, mass=None,
                               mpc: bool = False):
    """Iterative NO-ELIMINATION contact solve on the KKT saddle system
    (the reference's `solve_no_eliminate` arm,
    solve_LINEQ_iter_contact.f90:46-109):

        [ A    Bc^T  Bm^T ] [du]   [b      ]
        [ Bc   D_in       ] [lc] = [g_c    ]
        [ Bm              ] [lm]   [g_m    ]

    Contact constraints enter as explicit Lagrange rows built from the
    SAME fixed slots as the eliminator (dep/mast/coef from
    ContactEliminator.build: row = act*e_dep - coef at mast), and
    !EQUATION MPCs as additional rows — so this arm also covers decks
    where the MPC and contact dofs OVERLAP and the T_c^t T_m^t
    elimination composition is invalid.  D_in = diag(1-act) pins
    inactive slots' multipliers to zero, keeping the system nonsingular
    with shape-static slots.  MINRES handles the symmetric indefinite
    operator; the preconditioner is block-diagonal SPD: block-Jacobi on
    the displacement block, the Schur diagonal sum_j B_sj^2 / diag(A)_j
    on the multiplier blocks.

    Same call signature as make_slag_contact_solver's solve."""
    from frontistr_tpu.contact.slag import ContactEliminator
    from frontistr_tpu.solver.minres import minres
    from frontistr_tpu.assembly import extras as exmod
    n_node, ndof = model.n_node, model.ndof
    n = model.n_dof_total
    sv = model.cfg.solver
    nns_t = tuple(nns)
    elim = ContactEliminator(n, ndof)
    c1, c2 = eff if eff is not None else (1.0, 0.0)
    mpc_a = exmod.mpc_arrays(model.mesh, ndof, n) if mpc else None

    @jax.jit
    def _solve(ctx, cn, kes, B, dirichlet_inc, gfac):
        dofs, inc, free, m_eff, mpc_t = ctx
        op = femop.FEOperator(list(kes), dofs, nns_t, inc, total_en,
                              n_node, ndof, free)

        def mv(x):
            y = op.matvec(x)
            if eff is not None:
                y = c1 * y + c2 * m_eff * x
            return y

        def A0(x):
            xm = x * free
            return mv(xm) * free + x * (1.0 - free)

        b_c = (B - mv(dirichlet_inc)) * free + \
            dirichlet_inc * (1.0 - free)

        act = cn["act"]
        Ns = act.shape[0]

        def Bc_of(x):
            xg = x * free
            return act * xg[cn["dep"]] - \
                (cn["coef"] * xg[cn["mast"]]).sum(axis=1)

        def BcT(lam):
            y = jnp.zeros(n).at[cn["dep"]].add(act * lam)
            y = y.at[cn["mast"].reshape(-1)].add(
                (-cn["coef"] * lam[:, None]).reshape(-1))
            return y * free

        # constraint gap rhs minus the Dirichlet-carried part (the
        # unmasked row applied to the fixed-dof increment)
        g_c = cn["const"] * gfac - (
            act * dirichlet_inc[cn["dep"]] -
            (cn["coef"] * dirichlet_inc[cn["mast"]]).sum(axis=1))

        if mpc_t is not None:
            cm_, dm_ = mpc_t["coef"], mpc_t["dep"]
            mm_ = mpc_t["mast"]
            Nm = dm_.shape[0]

            def Bm_of(x):
                xg = x * free
                return xg[dm_] - (cm_ * xg[mm_]).sum(axis=1)

            def BmT(lam):
                y = jnp.zeros(n).at[dm_].add(lam)
                y = y.at[mm_.reshape(-1)].add(
                    (-cm_ * lam[:, None]).reshape(-1))
                return y * free

            g_m = mpc_t["const"] * gfac - (
                dirichlet_inc[dm_] -
                (cm_ * dirichlet_inc[mm_]).sum(axis=1))
        else:
            Nm = 0

        def A_sad(z):
            x, lc = z[:n], z[n:n + Ns]
            yx = A0(x) + BcT(lc)
            yc = Bc_of(x) + (1.0 - act) * lc
            if mpc_t is not None:
                lm = z[n + Ns:]
                yx = yx + BmT(lm)
                ym = Bm_of(x)
                return jnp.concatenate([yx, yc, ym])
            return jnp.concatenate([yx, yc])

        # block-diagonal SPD preconditioner
        M_K = op.block_jacobi(scale=c1, diag_add=(
            c2 * m_eff if eff is not None else None))
        Db = op.diag_blocks() * c1
        dk = Db[:, jnp.arange(ndof), jnp.arange(ndof)].reshape(-1)
        if eff is not None:
            dk = dk + c2 * m_eff
        dk = jnp.where((dk <= 0) | (free == 0.0), 1.0, dk)
        sc = (act * free[cn["dep"]]) / dk[cn["dep"]] + \
            (cn["coef"] ** 2 * free[cn["mast"]] / dk[cn["mast"]]) \
            .sum(axis=1)
        m_lc = 1.0 / (sc + (1.0 - act))
        parts_rhs = [b_c, g_c]
        if mpc_t is not None:
            sm = free[dm_] / dk[dm_] + \
                (cm_ ** 2 * free[mm_] / dk[mm_]).sum(axis=1)
            m_lm = 1.0 / jnp.maximum(sm, 1e-30)
            parts_rhs.append(g_m)

        def M_sad(r):
            zx = M_K(r[:n])
            zc = m_lc * r[n:n + Ns]
            if mpc_t is not None:
                return jnp.concatenate([zx, zc, m_lm * r[n + Ns:]])
            return jnp.concatenate([zx, zc])

        rhs = jnp.concatenate(parts_rhs)
        res = minres(A_sad, rhs, M=M_sad, tol=sv.resid,
                     maxiter=sv.nier)
        return res.x[:n], res.x[n:], res.iters

    ctx = (list(dofs_j), inc_j, free,
           mass if mass is not None else jnp.zeros(0), mpc_a)

    def solve(kes, B, dirichlet_inc, cn, gfac=0.0):
        x, lam, iters = _solve(ctx, cn, kes, B, dirichlet_inc,
                               jnp.asarray(float(gfac)))
        solve.last_lambda = lam
        solve.last_iters = iters
        return x

    solve.has_mpc = mpc_a is not None
    return solve, elim


def make_constrained_solver(model, dofs_j, nns, inc_j, total_en, free,
                            mixed: bool, nshard: int = 0,
                            eff=None, mass=None,
                            contact: bool = False,
                            friction: bool = False,
                            with_mpc: bool = True,
                            slag_elim: bool = False):
    """One jitted constrained-solve(kes, b_c) for the whole analysis —
    building it per Newton iteration would retrace the Krylov while_loop
    every call.

    TPU contract: every array the trace touches (ELL maps, AMG maps,
    incidence, dof tables, coords) rides through the jit boundary as a
    pytree ARGUMENT — closed-over concrete arrays are inlined into the
    lowered module as dense literals (remote-compile payload overflow at
    ~1M dof).

    nshard > 0 runs the SAME solve GSPMD-sharded over an nshard-device
    mesh (the multi-chip Newton hot loop — TPU redesign of the
    reference's per-iteration halo exchange, hecmw_comm_f.F90:669-841):
    the node axis is padded to a multiple of G*nshard with inert phantom
    rows, every node-axis array (ELL cols, cluster ccols/blocks, free
    mask, incidence, vectors) is sharded over the mesh, and XLA inserts
    the collectives (x all-gather for the row gather, psums for the CG
    dots) over ICI.  The ELEMENT axis is sharded too: each block's
    elements are padded to a multiple of nshard with phantom elements
    (self-connected to the last phantom node, zero matrices), the
    symbolic profiles are built over the padded connectivity, and the
    per-iteration element matrices enter the jit element-sharded — no
    device holds the full-E tangent or assembly pair set.

    eff=(c1, c2) with a lumped per-dof ``mass`` vector solves the
    Newmark effective system c1 K + c2 M instead of K (the multi-chip
    implicit-dynamics arm): the mass enters the assembled cluster slots,
    the diagonal preconditioner, and the AMG Galerkin blocks, so the
    V-cycle preconditions the true effective operator.

    contact=True adds fixed-shape AL/penalty contact slot args
    (cdofs (Ns, m), cke (Ns, m, m) from ContactManager.device_blocks)
    to the jitted solve: the slot term rides as a replicated gather →
    einsum → scatter-add on the row-sharded vectors, so the SAME GSPMD
    solve covers contact decks (the reference's contact-extended
    iterative path, solve_LINEQ_contact.f90, runs per-rank the same
    way).  The preconditioner stays K-only — identical to the
    single-device make_contact_solver arm.  friction=True switches the
    Krylov method to BiCGSTAB (nonsymmetric slip tangent)."""
    if contact and friction:
        mixed = False        # refined_cg is CG-based; friction → BiCGSTAB
    if slag_elim:
        mixed = False        # elimination wrap composes on the f64 arm
    n_node, ndof = model.n_node, model.ndof
    n_real = model.n_dof_total
    sv = model.cfg.solver
    c1, c2 = eff if eff is not None else (1.0, 0.0)
    from frontistr_tpu.assembly import bell as bellmod
    from frontistr_tpu.assembly import ell as ellmod
    from frontistr_tpu.solver import amg as amgmod
    from frontistr_tpu.solver import ssor as ssormod
    # preconditioner family: the .cnt PRECOND id maps the reference's
    # sweep-class methods (BILU 10/11/12, SAINV 20, RIF 21 —
    # hecmw_precond_33.f90:33-48) to multicolor block-SSOR, DIAG (3) to
    # block-Jacobi, and SSOR/ML (1/2/5) to the AMG V-cycle (our TPU
    # default); FRONTISTR_TPU_PRECOND overrides.
    pol = os.environ.get("FRONTISTR_TPU_PRECOND") or \
        {3: "jacobi", 10: "ssor", 11: "ssor", 12: "ssor",
         20: "ssor", 21: "ssor"}.get(getattr(sv, "precond", 1))
    cons = None
    if nshard:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        from frontistr_tpu.parallel import shard as shmod
        n_node = shmod._ceil_to(model.n_node, 8 * nshard)  # G=8 clusters
        jmesh = shmod.device_mesh(nshard)
        rep, row = shmod.solver_shardings(jmesh)

        def cons(x, *spec):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(jmesh, P(*spec)))

        ex_conns = getattr(model, "extras", ([], [], [], []))[0]
        conns = [b.conn for b in model.blocks] + list(ex_conns)
        # element-axis padding: phantom elements self-connected at the
        # last phantom node; their matrices enter as zeros, so they add
        # nothing anywhere (and the phantom node row is fixed-free=0)
        ph = n_node - 1
        e_pads = []
        conns_p = []
        for c in conns:
            ep = (-c.shape[0]) % nshard
            e_pads.append(ep)
            conns_p.append(np.concatenate(
                [c, np.full((ep, c.shape[1]), ph, c.dtype)]) if ep else c)
        conns = conns_p
        inc_np, total_en = femop.build_incidence(conns, n_node)
        inc_j = jax.device_put(jnp.asarray(inc_np), row)
        free_np = np.zeros(n_node * ndof)
        free_np[:n_real] = np.asarray(free)
        free = jax.device_put(jnp.asarray(free_np), row)
        row_e = NamedSharding(jmesh, P("x"))
        dofs_j = [jax.device_put(jnp.asarray(
            (c[:, :, None].astype(np.int64) * ndof +
             np.arange(ndof)[None, None, :]).reshape(c.shape[0], -1)),
            row_e) for c in conns]
        prof = ellmod.build_profile(conns, n_node, ndof)
        amaps = ssormod.eligible_maps(prof, pol) or \
            amgmod.eligible_maps(prof, n_node * ndof, policy=pol)
        cprof = bellmod.build_cluster_profile(conns, n_node, ndof,
                                              scalar=prof)
    else:
        prof = ellmod.profile_from_model(model, n_node=n_node)
        amaps = ssormod.eligible_maps(prof, pol) or \
            amgmod.eligible_maps(prof, n_node * ndof, policy=pol)
        cprof = bellmod.cluster_profile_from_model(model, scalar=prof,
                                                   n_node=n_node)
    if nshard:
        prof_d = ellmod.ELLProfile(
            n_node=prof.n_node, ndof=prof.ndof, W=prof.W,
            cols=jax.device_put(jnp.asarray(prof.cols), row),
            diag_slot=jax.device_put(jnp.asarray(prof.diag_slot), row),
            perm=jax.device_put(jnp.asarray(prof.perm), rep),
            seg_sorted=jax.device_put(jnp.asarray(prof.seg_sorted), rep),
            pair_counts=tuple(prof.pair_counts))
        cprof_d = bellmod.ClusterProfile(
            n_node=cprof.n_node, ndof=cprof.ndof, G=cprof.G, C=cprof.C,
            Wc=cprof.Wc,
            ccols=jax.device_put(jnp.asarray(cprof.ccols), row),
            diag_wc=jax.device_put(jnp.asarray(cprof.diag_wc), row),
            perm=jax.device_put(jnp.asarray(cprof.perm), rep),
            seg_sorted=jax.device_put(jnp.asarray(cprof.seg_sorted), rep),
            scal_src=jax.device_put(jnp.asarray(cprof.scal_src), row),
            pair_counts=tuple(cprof.pair_counts))
        if amaps is not None:
            amaps = jax.device_put(amaps, rep)
        coords_np = np.zeros((n_node, model.coords.shape[1]))
        coords_np[:model.n_node] = model.coords
        coords_j = jax.device_put(jnp.asarray(coords_np), row)
    else:
        prof_d = prof.device()
        cprof_d = cprof.device()
        coords_j = jnp.asarray(model.coords)
    # !EQUATION handling: exact dependent-dof elimination T K T^t
    # (hecmw_mat_ass_equation / hecmw_local_matrix.f90 trimatmul) folded
    # into the jitted solve — arrays ride as args, so the SAME path runs
    # sharded (the mask is row-sharded with the vectors).
    from frontistr_tpu.assembly import extras as exmod
    mpc_a = exmod.mpc_arrays(model.mesh, ndof, n_node * ndof) \
        if with_mpc else None
    if mpc_a is not None and nshard:
        mpc_a = {k: jax.device_put(v, row if k == "mask" else rep)
                 for k, v in mpc_a.items()}
    elim = None
    if slag_elim:
        # eliminator over the PADDED dof count (dep_mask/g build
        # full-length vectors inside the jit)
        from frontistr_tpu.contact.slag import ContactEliminator
        elim = ContactEliminator(n_node * ndof, ndof)
    nns_t = tuple(nns)
    # MXU segment-sum assembly (f32): ~6x the XLA scatter per Newton
    # iteration at 1M dof.  Aux arrays ride through _solve as args.
    # (Pallas kernels can't be GSPMD-partitioned — XLA path when sharded.)
    use_pal = not nshard and ellmod._use_pallas_asm(
        cprof.perm.size, [jnp.zeros((1,), jnp.float32)], ndof=ndof,
        n_slots=cprof.n_slots)
    pal = cprof.pallas_assemble(nns_t) if use_pal else None
    pal_fn = pal.fn if pal is not None else None
    pal_args = pal.args if pal is not None else None

    def _cluster_op(cprofile, kes, free_m, dtype, pal_a=None,
                    mass_v=None):
        if pal_fn is not None and pal_a is not None \
                and dtype == jnp.float32:
            blocks, raw = pal_fn(*pal_a,
                                 *[k.astype(dtype) for k in kes])
        else:
            blocks, raw = bellmod.assemble_cluster(
                cprofile, [k.astype(dtype) for k in kes], nns_t)
        if eff is not None:
            # Newmark effective operator: adjust the raw slots once,
            # then re-derive blocks/diag/AMG inputs from them
            raw = bellmod.add_eff_mass(cprofile, raw, mass_v, c1, c2)
            blocks = bellmod.blocks_from_raw(cprofile, raw)
        if cons is not None:
            blocks = cons(blocks, None, None, None, "x")
        diag = bellmod.extract_diag(cprofile, raw)
        if cons is not None:
            diag = cons(diag, "x")
        cop = bellmod.ClusterOperator(
            blocks=blocks, ccols=cprofile.ccols, diag=diag,
            n_node=n_node, ndof=ndof, G=cprofile.G,
            free_mask=free_m.astype(dtype))
        return cop, raw

    def _precond(cop, cprofile, raw, profile, am, coords):
        if am is None:
            return cop.block_jacobi()
        sb = bellmod.extract_scalar_blocks(cprofile, raw, profile)
        if isinstance(am, ssormod.SSORMaps):
            return ssormod.setup_ssor(am, sb, profile.cols, cop.diag,
                                      cop.free_mask, ndof)
        return amgmod.setup_amg(
            am, sb, profile.cols, coords.astype(cop.blocks.dtype),
            cop.free_mask, cop.apply_constrained, cop.block_jacobi())

    def _cwrap(Afn, free_m, cdofs, cke):
        """Constrained-space contact add-on: Afn(x) + masked slot term."""
        def A2(x):
            fm = free_m.astype(x.dtype)
            xm = x * fm
            fe = jnp.einsum("eij,ej->ei", cke.astype(x.dtype), xm[cdofs])
            add = jnp.zeros_like(x).at[cdofs.reshape(-1)].add(
                fe.reshape(-1))
            return Afn(x) + add * fm
        return A2

    if mixed:
        @jax.jit
        def _solve(profile, cprofile, am, ctx, kes, B, dirichlet_inc,
                   pal_a, mass_v, gfac, cdofs, cke):
            dofs, inc, free_m, coords, mpc = ctx
            # f64 TRUE operator: the matrix-free element path, whose f64
            # arithmetic is unrolled-elementwise (femop.element_forces_
            # flat) — an assembled f64 cluster operator is NOT viable on
            # TPU: its dot_general X64-rewrites into an 8-plane 11.8 GB
            # expansion, and an exact f64 assembly would pay a second
            # (slow) f64 segment-sum per Newton iteration
            op = femop.FEOperator(list(kes), dofs, nns_t, inc, total_en,
                                  n_node, ndof, free_m)

            def mv64(x):
                y = op.matvec(x)
                if eff is not None:
                    y = c1 * y + c2 * mass_v * x
                if cdofs is not None:
                    fe = jnp.einsum("eij,ej->ei", cke.astype(x.dtype),
                                    x[cdofs],
                                    precision=jax.lax.Precision.HIGHEST)
                    y = y.at[cdofs.reshape(-1)].add(fe.reshape(-1))
                return y

            def A64(x):
                xm = x * free_m
                return mv64(xm) * free_m + x * (1.0 - free_m)

            b_c = (B - mv64(dirichlet_inc)) * free_m + \
                dirichlet_inc * (1.0 - free_m)
            if cons is not None:
                b_c = cons(b_c, "x")
            # cluster-ELL f32 operator for the CG hot loop (~7 ms/matvec
            # at 1M-dof tet); f64 true residual via the femop op
            cop32, raw = _cluster_op(cprofile, kes, free_m, jnp.float32,
                                     pal_a, mass_v)
            A64_cg, A32_cg = A64, cop32.apply_constrained
            if cdofs is not None:
                A32_cg = _cwrap(A32_cg, free_m, cdofs, cke)
            if mpc is not None:
                # MPC eliminates on the contact-extended operator:
                # A64/A32_cg already carry the K_c slot term
                b_c = exmod.mpc_reduce_rhs(mpc, A64, b_c, gfac)
                A64_cg = exmod.mpc_wrap(mpc, A64)
                A32_cg = exmod.mpc_wrap(mpc, A32_cg)
            res = refined_cg(A64_cg, A32_cg,
                             _precond(cop32, cprofile, raw, profile, am,
                                      coords), b_c,
                             tol=sv.resid, inner_tol=1e-6,
                             maxiter=sv.nier, max_passes=6)
            x = res.x
            if mpc is not None:
                x = exmod.mpc_recover(mpc, x, gfac)
            if cons is not None:
                x = cons(x)
            return x, res.iters, res.passes
    else:
        @jax.jit
        def _solve(profile, cprofile, am, ctx, kes, B, dirichlet_inc,
                   pal_a, mass_v, gfac, cdofs, cke, cn=None):
            dofs, inc, free_m, coords, mpc = ctx
            op = femop.FEOperator(list(kes), dofs, nns_t, inc, total_en,
                                  n_node, ndof, free_m)

            def mv64(x):
                y = op.matvec(x)
                if eff is not None:
                    y = c1 * y + c2 * mass_v * x
                if cdofs is not None:
                    fe = jnp.einsum("eij,ej->ei", cke, x[cdofs])
                    y = y.at[cdofs.reshape(-1)].add(fe.reshape(-1))
                return y

            b_c = (B - mv64(dirichlet_inc)) * free_m + \
                dirichlet_inc * (1.0 - free_m)
            if cons is not None:
                b_c = cons(b_c, "x")
            cop, raw = _cluster_op(cprofile, kes, free_m, b_c.dtype,
                                   pal_a, mass_v)
            A_cg = cop.apply_constrained
            if cdofs is not None:
                A_cg = _cwrap(A_cg, free_m, cdofs, cke)
            if mpc is not None:
                def A64c(x):
                    xm = x * free_m
                    return mv64(xm) * free_m + x * (1.0 - free_m)
                b_c = exmod.mpc_reduce_rhs(mpc, A64c, b_c, gfac)
                A_cg = exmod.mpc_wrap(mpc, A_cg)
            if cn is not None:
                # SLAGRANGE slave-dof elimination T_c^t A T_c on the
                # (possibly MPC-reduced) operator — the GSPMD arm of
                # make_slag_contact_solver: cn rides replicated, the
                # gathers/scatters hit the row-sharded vectors and XLA
                # inserts the collectives
                b_c = elim.reduce_rhs(cn, A_cg, b_c)
                A_cg = elim.wrap(cn, A_cg)
            ksolve = krylov.bicgstab if (contact and friction) \
                else krylov.pcg
            res = ksolve(A_cg, b_c,
                         M=_precond(cop, cprofile, raw, profile, am,
                                    coords), tol=sv.resid,
                         maxiter=sv.nier)
            x = res.x
            if cn is not None:
                x = elim.recover(cn, x)
            if mpc is not None:
                x = exmod.mpc_recover(mpc, x, gfac)
            if cons is not None:
                x = cons(x)
            return x, res.iters, jnp.asarray(0)

    ctx = (list(dofs_j), inc_j, free, coords_j, mpc_a)

    if nshard:
        dev0 = jax.devices()[0]
        npad = n_node * ndof - n_real
        mass_d = None
        if eff is not None:
            m_np = np.zeros(n_node * ndof)
            m_np[:n_real] = np.asarray(mass)
            mass_d = jax.device_put(jnp.asarray(m_np), row)

        def _pad_inputs(kes, B, dirichlet_inc):
            # element-sharded matrices: zero-pad the phantom elements
            # then split the element axis over the mesh
            kes_s = tuple(jax.device_put(
                jnp.concatenate(
                    [k, jnp.zeros((ep,) + k.shape[1:], k.dtype)])
                if ep else k, row_e)
                for k, ep in zip(kes, e_pads))
            Bp = jax.device_put(jnp.pad(B, (0, npad)), row)
            dp = jax.device_put(jnp.pad(dirichlet_inc, (0, npad)), row)
            return kes_s, Bp, dp

        if contact and slag_elim:
            def solve(kes, B, dirichlet_inc, cn, gfac=0.0):
                kes_s, Bp, dp = _pad_inputs(kes, B, dirichlet_inc)
                cn_r = {k: jax.device_put(jnp.asarray(v), rep)
                        for k, v in cn.items()}
                x, it, ps = _solve(prof_d, cprof_d, amaps, ctx, kes_s, Bp,
                               dp, pal_args, mass_d,
                               jnp.asarray(float(gfac)), None, None,
                               cn_r)
                solve.last_iters = it
                solve.last_passes = ps
                return jax.device_put(x[:n_real], dev0)

            solve.has_mpc = mpc_a is not None
            return solve

        if contact:
            def solve(kes, B, dirichlet_inc, cdofs, cke, gfac=0.0):
                kes_s, Bp, dp = _pad_inputs(kes, B, dirichlet_inc)
                cd = jax.device_put(jnp.asarray(cdofs), rep)
                ck = jax.device_put(jnp.asarray(cke), rep)
                x, it, ps = _solve(prof_d, cprof_d, amaps, ctx, kes_s, Bp,
                               dp, pal_args, mass_d,
                               jnp.asarray(float(gfac)), cd, ck)
                solve.last_iters = it
                solve.last_passes = ps
                return jax.device_put(x[:n_real], dev0)

            solve.has_mpc = mpc_a is not None
            return solve

        def solve(kes, B, dirichlet_inc, gfac=0.0):
            kes_s, Bp, dp = _pad_inputs(kes, B, dirichlet_inc)
            x, it, ps = _solve(prof_d, cprof_d, amaps, ctx, kes_s, Bp, dp,
                           pal_args, mass_d, jnp.asarray(float(gfac)),
                           None, None)
            solve.last_iters = it         # device scalar, no host sync
            solve.last_passes = ps
            # back to the driver's single default device (legacy path;
            # the fully-sharded Newton engine uses solve.sharded instead)
            return jax.device_put(x[:n_real], dev0)

        def solve_sharded(kes_s, Bp, dp, gfac):
            """In-graph arm for the sharded Newton engine: inputs are
            already padded + element/row-sharded, output stays the
            PADDED row-sharded solution (no device round trip)."""
            return _solve(prof_d, cprof_d, amaps, ctx, kes_s, Bp, dp,
                          pal_args, mass_d, gfac, None, None)

        solve.sharded = solve_sharded
        # everything the sharded element pipeline (ShardedNewton) needs
        # to run tangent/update under the same mesh.  sharded_fn/args let
        # the engine's outer jit call _solve with its big arrays as traced
        # ARGUMENTS (closing over them would inline multi-100MB literals
        # into the lowered module — the remote-compile payload overflow).
        solve.sharded_fn = _solve
        solve.sharded_args = (prof_d, cprof_d, amaps, ctx, pal_args,
                              mass_d)
        solve.sharded_ctx = dict(
            nshard=nshard, jmesh=jmesh, row=row, row_e=row_e, rep=rep,
            conns_p=conns, e_pads=e_pads, n_node_pad=n_node, npad=npad,
            n_real=n_real, free_pad=free, inc_j=inc_j, total_en=total_en,
            dofs_j=dofs_j)
    else:
        mass_d = jnp.asarray(mass) if eff is not None else None

        if contact:
            def solve(kes, B, dirichlet_inc, cdofs, cke, gfac=0.0):
                x, it, ps = _solve(prof_d, cprof_d, amaps, ctx, kes, B,
                               dirichlet_inc, pal_args, mass_d,
                               jnp.asarray(float(gfac)), cdofs, cke)
                solve.last_iters = it
                solve.last_passes = ps
                return x
        else:
            def solve(kes, B, dirichlet_inc, gfac=0.0):
                x, it, ps = _solve(prof_d, cprof_d, amaps, ctx, kes, B,
                               dirichlet_inc, pal_args, mass_d,
                               jnp.asarray(float(gfac)), None, None)
                solve.last_iters = it     # device scalar, no host sync
                solve.last_passes = ps
                return x

    solve.has_mpc = mpc_a is not None
    return solve


class ShardedNewton:
    """Element pipeline under the device mesh: per-iteration tangent,
    linear solve, stress/QFORCE update, and convergence norms run as ONE
    jitted GSPMD program over padded element/node axes — no full-model
    array moves to a single device inside the Newton loop.  This is the
    TPU re-expression of the reference's per-rank element ownership
    (fstr_StiffMatrix.f90:53-57 OpenMP assembly per rank +
    fstr_Update.f90:25-293 re-integration per rank): each device owns an
    element shard AND a node-row shard; XLA inserts the collectives.

    Padding contract: phantom elements repeat each block's element 0
    (valid geometry — a degenerate phantom would NaN the Jacobian
    inverse, and NaN * 0 mask is still NaN); a per-block element mask
    then zeroes their ke/qf so they contribute exactly nothing — the
    in-graph equivalent of the explicit zero padding in
    make_constrained_solver's legacy solve() wrapper.  Gauss states are
    padded the same way and stay sharded across substeps; they are
    un-padded only at output/restart boundaries.
    """

    def __init__(self, model, programs, solver, ex_kes):
        sc = solver.sharded_ctx
        self.model = model
        self.programs = programs
        self.n_real = sc["n_real"]
        self.npad = sc["npad"]
        self.n_node_pad = sc["n_node_pad"]
        self.ndof = model.ndof
        self.row, self.row_e, self.rep = sc["row"], sc["row_e"], sc["rep"]
        self._sfn = solver.sharded_fn
        self._sargs = solver.sharded_args
        nb = len(model.blocks)
        conns_p, e_pads = sc["conns_p"], sc["e_pads"]
        self.E_orig = [len(b.elem_ids) for b in model.blocks]
        self.e_pads_blocks = list(e_pads[:nb])
        carries, masks, conns = [], [], []
        for i, p in enumerate(programs):
            cp, ep, E = conns_p[i], e_pads[i], self.E_orig[i]
            p._E_pad = cp.shape[0]   # _De() broadcasts to the padded E
            conns.append(jax.device_put(jnp.asarray(cp), self.row_e))
            m = np.ones(cp.shape[0])
            m[E:] = 0.0
            masks.append(jax.device_put(jnp.asarray(m), self.row_e))
            cd = {}
            for k, v in p._carry.items():
                a = jnp.asarray(v)
                if a.ndim >= 1 and a.shape[0] == E and ep:
                    a = jnp.concatenate(
                        [a, jnp.repeat(a[:1], ep, axis=0)])
                sh = self.row_e if (a.ndim >= 1
                                    and a.shape[0] == E + ep) else self.rep
                cd[k] = jax.device_put(a, sh)
            carries.append(cd)
        ex_p = []
        for j, k in enumerate(ex_kes):
            ep = e_pads[nb + j]
            kp = jnp.concatenate(
                [k, jnp.zeros((ep,) + k.shape[1:], k.dtype)]) if ep else k
            ex_p.append(jax.device_put(kp, self.row_e))
        self._aux = dict(carries=carries, masks=masks, conns=conns,
                         exkes=ex_p,
                         exdofs=[sc["dofs_j"][nb + j]
                                 for j in range(len(ex_kes))],
                         inc=sc["inc_j"], free=sc["free_pad"])
        self._iter = jax.jit(self._iter_impl)
        self._q0 = jax.jit(self._q0_impl)
        self.pad_puts = 0      # transfer-guard instrumentation for tests
        self.n_iters = 0

    # ---- padding helpers (substep boundaries only) --------------------
    def pad_vec(self, v):
        self.pad_puts += 1
        return jax.device_put(jnp.pad(jnp.asarray(v), (0, self.npad)),
                              self.row)

    def zeros(self):
        return jax.device_put(
            jnp.zeros(self.n_real + self.npad), self.row)

    def unpad_vec(self, v):
        return jax.device_put(v[:self.n_real], jax.devices()[0])

    def pad_states(self, states):
        """Idempotent: already-padded leading axes pass through."""
        out = []
        for st, E, ep in zip(states, self.E_orig, self.e_pads_blocks):
            if not st:
                out.append(st)
                continue
            d = {}
            for k, v in st.items():
                if v is None:
                    d[k] = v
                    continue
                a = jnp.asarray(v)
                if a.ndim >= 1 and a.shape[0] == E and ep:
                    a = jnp.concatenate(
                        [a, jnp.repeat(a[:1], ep, axis=0)])
                if a.ndim >= 1 and a.shape[0] == E + ep:
                    a = jax.device_put(a, self.row_e)
                d[k] = a
            out.append(d)
        return out

    def unpad_states(self, states):
        out = []
        for st, E in zip(states, self.E_orig):
            if not st:
                out.append(st)
                continue
            out.append({k: (v[:E] if (v is not None
                                      and hasattr(v, "ndim")
                                      and v.ndim >= 1
                                      and v.shape[0] >= E) else v)
                        for k, v in st.items()})
        return out

    # ---- traced bodies -------------------------------------------------
    def _update_all(self, aux, u, du, states, t, dt):
        nd = self.ndof
        U = u.reshape(self.n_node_pad, nd)
        DU = du.reshape(self.n_node_pad, nd)
        flats, new_states = [], []
        for p, carry, conn, mask, st in zip(
                self.programs, aux["carries"], aux["conns"],
                aux["masks"], states):
            ns_, qf = p._update(carry, U[conn], DU[conn], st, t, dt)
            new_states.append(ns_)
            flats.append(
                (qf * mask.reshape((-1,) + (1,) * (qf.ndim - 1)))
                .reshape(-1))
        tot = u + du
        for ke_x, d_x in zip(aux["exkes"], aux["exdofs"]):
            flats.append(jnp.einsum("eij,ej->ei", ke_x,
                                    tot[d_x]).reshape(-1))
        flats.append(jnp.zeros(nd, u.dtype))
        flat = jnp.concatenate(flats)
        idx = aux["inc"][:, :, None] * nd + jnp.arange(nd)[None, None, :]
        Q = flat[idx].sum(axis=1).reshape(-1)
        return new_states, Q

    def _q0_impl(self, aux, u, du, states, t, dt):
        _, Q = self._update_all(aux, u, du, states, t, dt)
        return Q

    def _iter_impl(self, aux, sargs, u, du, states, gl, dinc, Q_cur,
                   t, dt, gfac):
        nd = self.ndof
        U = u.reshape(self.n_node_pad, nd)
        DU = du.reshape(self.n_node_pad, nd)
        kes = []
        for p, carry, conn, mask, st in zip(
                self.programs, aux["carries"], aux["conns"],
                aux["masks"], states):
            ke = p._tangent(carry, U[conn], DU[conn], st, t, dt)
            kes.append(ke * mask.reshape((-1,) + (1,) * (ke.ndim - 1)))
        kes.extend(aux["exkes"])
        B = gl - Q_cur
        prof_d, cprof_d, amaps, ctx, pal_args, mass_d = sargs
        dx, _cg, _ps = self._sfn(prof_d, cprof_d, amaps, ctx,
                                 tuple(kes), B, dinc, pal_args, mass_d,
                                 gfac, None, None)
        du2 = du + dx
        new_states, Q = self._update_all(aux, u, du2, states, t, dt)
        Bres = gl - Q
        mpc = ctx[4]
        if mpc is not None:
            # reduced-space residual (fstr_Update_NDForce_MPC analog)
            from frontistr_tpu.assembly import extras as exmod
            Bres = exmod.mpc_Tt(mpc, Bres)
        Bres = Bres * aux["free"]
        norms = jnp.sqrt(jnp.stack(
            [jnp.vdot(Bres, Bres), jnp.vdot(Q, Q),
             jnp.vdot(dx, dx), jnp.vdot(du2, du2)]))
        return du2, new_states, Q, norms

    # ---- public per-substep API ---------------------------------------
    def qforce(self, u, du, states, t, dt):
        return self._q0(self._aux, u, du, states, jnp.asarray(float(t)),
                        jnp.asarray(float(dt)))

    def iterate(self, u, du, states, gl, dinc, Q_cur, t, dt, gfac=0.0):
        self.n_iters += 1
        return self._iter(self._aux, self._sargs, u, du, states, gl,
                          dinc, Q_cur, jnp.asarray(float(t)),
                          jnp.asarray(float(dt)),
                          jnp.asarray(float(gfac)))


def _newton_substep_sharded(eng, model, programs, states, u, gl, dufix,
                            step, ctime, tincr, gfac=0.0):
    """Sharded twin of the _newton_substep iteration loop (no contact,
    no follower loads): one host fetch per iteration (the four norms),
    everything else stays on the mesh."""
    up = eng.pad_vec(u)
    glp = eng.pad_vec(gl)
    dfp = eng.pad_vec(dufix)
    zero = eng.zeros()
    du = zero
    states_cur = states
    Q = eng.qforce(up, du, states_cur, ctime, tincr)
    conv = False
    iters = 0
    for it in range(1, step.max_iter + 1):
        iters = it
        dinc = dfp if it == 1 else zero
        du, states_cur, Q, norms = eng.iterate(
            up, du, states_cur, glp, dinc, Q, ctime, tincr,
            gfac if it == 1 else 0.0)
        res_n, qnrm, xnrm, dunrm = (float(v) for v in np.asarray(norms))
        if qnrm < 1e-8:
            qnrm = 1.0
        if it == 1:
            dunrm = xnrm
        rres = res_n / qnrm
        rxnrm = xnrm / max(dunrm, 1e-300)
        if os.environ.get("FRONTISTR_TPU_DEBUG_NEWTON"):
            print(f" Newton it={it:3d}  rres={rres:.6e}  "
                  f"rxnrm={rxnrm:.6e}  [sharded]")
        if not model.nlgeom and _all_linear(programs):
            conv = True
            break
        if rres < step.converg or rxnrm < step.converg:
            conv = True
            break
        if rres > step.maxres:
            return False, eng.unpad_vec(du), states_cur, iters, \
                eng.unpad_vec(Q)
    return conv, eng.unpad_vec(du), states_cur, iters, eng.unpad_vec(Q)


def _load_group_universe(cfg):
    """All GRPIDs appearing on load-type cards (CLOAD/DLOAD/TEMPERATURE)."""
    cards = list(cfg.cloads) + list(cfg.dloads) + list(cfg.temperatures)
    return {c.iparam("GRPID", 1) for c in cards}


def _active_sets(cfg, cstep):
    """Per-!STEP active load groups split by the reference's cross-step
    factor rule (fstr_ass_load.f90:69-70): groups active in the current step
    AND the previous one are held at factor 1.0, groups newly active this
    step ramp 0->1.  A step without LOAD sub-lines activates everything
    (single-step decks never list groups).

    Returns (sel_held, sel_ramp) as concrete sets of GRPIDs.
    """
    universe = _load_group_universe(cfg)

    def active(step_idx):
        if step_idx < 1:
            return set()
        lg = cfg.steps[step_idx - 1].load_groups
        return set(lg) if lg else set(universe)

    cur = active(cstep)
    prev = active(cstep - 1)
    return cur & prev, cur - prev


def _assemble_loads_sel(model, cfg, sel, coords=None):
    """External load vector (CLOAD + DLOAD + thermal) restricted to the load
    groups in `sel`.  Empty set -> zero vector."""
    if not sel:
        return np.zeros(model.n_dof_total)
    mesh = model.mesh
    f = collect_cload(mesh, cfg.cloads, model.ndof, model.n_node, sel,
                      coords=coords)
    if cfg.dloads:
        from frontistr_tpu.assembly.loads import collect_dload
        f = f + collect_dload(mesh, model, cfg.dloads, sel, coords=coords)
    if cfg.temperatures and getattr(model, "temperature", None) is not None:
        from frontistr_tpu.assembly.loads import (collect_temperature,
                                                  thermal_load)
        T = collect_temperature(mesh, cfg.temperatures, model.n_node,
                                cfg.reftemp, sel)
        if T is not None:
            f = f + thermal_load(model, T)
    return f


def _maybe_engine(model, programs, solver, ex_kes_j, cm):
    """Build the fully-sharded Newton engine when the sharded solver is
    active and the deck qualifies (no contact — warned off earlier; no
    follower loads, whose gl re-assembly is host-side per iteration)."""
    if cm is not None or getattr(solver, "sharded_ctx", None) is None:
        return None
    if model.nlgeom and model.dload_grp is not None:
        return None
    eng = ShardedNewton(model, programs, solver, ex_kes_j)
    solver.engine = eng
    return eng


@dataclasses.dataclass
class NewtonStats:
    substeps: int = 0
    total_iters: int = 0
    max_iters: int = 0
    cutbacks: int = 0


def run_nonlinear_static(model: StructModel, log_path: Optional[str] = None,
                         result_writer=None,
                         restart_path: Optional[str] = None,
                         restart_freq: int = 0):
    """Substep / Newton driver. Returns final StaticResult (+ history).

    restart_path/restart_freq: write a checkpoint every `restart_freq`
    substeps (fstr_write_restart cadence, fstr_solve_NLGEOM.f90:204-207);
    if the file exists at start it is loaded and the run resumes
    (fstr_read_restart semantics).
    """
    cfg = model.cfg
    ndof = model.ndof
    n = model.n_dof_total
    u = jnp.zeros(n)
    programs = [BlockPrograms(model, b) for b in model.blocks]
    states = [init_block_state(b, p.table)
              for b, p in zip(model.blocks, programs)]
    u_fix_total = old_ops.full_fixed_vector(n, model.fixed_dofs,
                                            model.fixed_vals)
    ex_conns, ex_dofs, ex_kes, ex_nns = getattr(model, "extras",
                                                ([], [], [], []))
    inc, total_en = femop.build_incidence(
        [b.conn for b in model.blocks] + list(ex_conns), model.n_node)
    inc_j = jnp.asarray(inc)
    free = jnp.asarray(old_ops.make_free_mask(n, model.fixed_dofs))
    dofs_j = [jnp.asarray(b.dofs) for b in model.blocks] + \
        [jnp.asarray(d) for d in ex_dofs]
    nns = [b.conn.shape[1] for b in model.blocks] + list(ex_nns)
    ex_kes_j = [jnp.asarray(k) for k in ex_kes]
    f_total = jnp.asarray(model.f_ext)
    sta_path = None
    if log_path is not None:
        import os as _os
        from frontistr_tpu.io.stafile import sta_init
        sta_path = _os.path.join(_os.path.dirname(_os.path.abspath(
            log_path)) or ".", "FSTR.sta")
        sta_init(sta_path)
    stats = NewtonStats()
    import os as _os
    resume = None
    if restart_path and _os.path.exists(restart_path):
        with open(restart_path, "rb") as _fh:
            _magic = _fh.read(2)
        if _magic == b"PK":                      # native .npz checkpoint
            from frontistr_tpu.io.restart import load_restart
            resume = load_restart(restart_path)
            u = jnp.asarray(resume["u"])
            states = [
                {k: (jnp.asarray(v) if v is not None else None)
                 for k, v in s.items()} for s in resume["states"]]
        else:
            # reference blob stream (hecmw_restart.c): a checkpoint the
            # REFERENCE binary wrote can resume this run
            from frontistr_tpu.io.hecmw_restart import import_solid_state
            u_r, t_r, sc_r, st_r = import_solid_state(
                restart_path, states, model.blocks)
            u = jnp.asarray(u_r)
            states = [{k: (jnp.asarray(v) if v is not None else None)
                       for k, v in s.items()} for s in st_r]
            resume = dict(u=u_r, t=t_r, step_count=sc_r, states=st_r)
    mixed = _solve_policy() == "mixed"
    from frontistr_tpu.parallel import shard as shmod
    nshard = shmod.requested_shards()
    cm = None
    if model.mesh.contact_pairs and cfg.contacts:
        from frontistr_tpu.contact.ntos import ContactManager
        cm = ContactManager(model.mesh, model, cfg)
        if not cm.active:
            cm = None
    # plain METHOD=DIRECT decks never touch the iterative solver — skip
    # its profile/jit setup (MPC decks stay iterative: exact T^tKT)
    plain_direct = (model.cfg.solver.method.upper() in (
        "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG")
        and cm is None and not model.mesh.equations)
    solver = None if plain_direct else make_constrained_solver(
        model, dofs_j, nns, inc_j, total_en, free, mixed, nshard=nshard)
    # !EQUATION on contact decks: the AL/penalty arms eliminate MPCs on
    # the contact-extended operator (reference: hecmw_mat_ass_equation
    # runs before every solve, contact included); SLag composes the two
    # eliminations when their dof sets are disjoint, else falls back
    # loudly; the host direct arms do not take MPCs.
    slag_mpc = False
    direct_m = model.cfg.solver.method.upper() in (
        "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG")
    if cm is not None and model.mesh.equations:
        if direct_m:
            print("### WARNING: !EQUATION constraints are not applied "
                  "to the DIRECT contact arms; MPC ignored for this run")
        elif cm.algo == "SLAGRANGE" and not cm.has_friction:
            slag_mpc = contact_mpc_disjoint(cm, model)
            if not slag_mpc:
                print("### NOTE: !EQUATION dofs overlap the contact "
                      "surfaces; SLAGRANGE elimination composition is "
                      "invalid — solving the KKT saddle system "
                      "iteratively instead (no-elimination arm)")
    engine = _maybe_engine(model, programs, solver, ex_kes_j, cm)
    if engine is not None:
        states = engine.pad_states(states)

    def _build_contact_solver(free_v):
        if cm.algo == "SLAGRANGE" and not cm.has_friction:
            # no-elimination saddle arm: forced by env, or required when
            # MPC/contact dofs overlap (elimination composition invalid)
            use_saddle = (os.environ.get(
                "FRONTISTR_TPU_CONTACT_SOLVE", "") == "saddle") or \
                (model.mesh.equations and not slag_mpc and not direct_m)
            if use_saddle and not nshard:
                return make_saddle_contact_solver(
                    model, dofs_j, nns, inc_j, total_en, free_v,
                    mpc=bool(model.mesh.equations))
            if nshard:
                # GSPMD SLag: the elimination wrap rides inside the
                # sharded jitted solve (fixed-shape cn slots, replicated)
                from frontistr_tpu.contact.slag import ContactEliminator
                return make_constrained_solver(
                    model, dofs_j, nns, inc_j, total_en, free_v, mixed,
                    nshard=nshard, contact=True, with_mpc=slag_mpc,
                    slag_elim=True), \
                    ContactEliminator(model.n_dof_total, ndof)
            return make_slag_contact_solver(
                model, dofs_j, nns, inc_j, total_en, free_v,
                mpc=slag_mpc)
        if nshard:
            return make_constrained_solver(
                model, dofs_j, nns, inc_j, total_en, free_v, mixed,
                nshard=nshard, contact=True,
                friction=cm.has_friction,
                with_mpc=not direct_m), None
        return make_contact_solver(
            model, dofs_j, nns, inc_j, total_en, free_v,
            friction=cm.has_friction, mpc=not direct_m), None

    contact_solver = None
    slag = None
    if cm is not None:
        contact_solver, slag = _build_contact_solver(free)
    step_count = 0
    result = None
    Q_last = None

    multi = len(cfg.steps) > 1
    f_held = None
    f_ramp = f_total
    follow_sel = None
    for cstep, step in enumerate(cfg.steps, start=1):
        if multi:
            # per-!STEP BC/load bookkeeping (fstr_solve_NLGEOM's per-step
            # tables): rebuild the active Dirichlet set for this step and
            # split external loads into held (active in the previous step
            # too -> factor 1.0, fstr_ass_load.f90:69-70) and ramped
            # (newly active -> factor lam2) parts, so loads neither
            # un-ramp to zero at a step boundary nor double-apply.
            bgrp = set(step.boundary_groups) if step.boundary_groups \
                else None
            fx_d, fx_v = collect_boundary(model.mesh, cfg.boundaries,
                                          ndof, bgrp)
            u_fix_total = old_ops.full_fixed_vector(n, fx_d, fx_v)
            free = jnp.asarray(old_ops.make_free_mask(n, fx_d))
            sel_held, sel_ramp = _active_sets(cfg, cstep)
            follow_sel = (sel_held, sel_ramp)
            f_held = jnp.asarray(_assemble_loads_sel(model, cfg, sel_held))
            f_ramp = jnp.asarray(_assemble_loads_sel(model, cfg, sel_ramp))
            solver = make_constrained_solver(model, dofs_j, nns, inc_j,
                                             total_en, free, mixed,
                                             nshard=nshard)
            engine = _maybe_engine(model, programs, solver, ex_kes_j, cm)
            if engine is not None:
                states = engine.pad_states(states)
            if cm is not None:
                contact_solver, slag = _build_contact_solver(free)
        t_end = step.elapsetime
        dt = step.initdt
        ainc = _ainc_params(cfg, step)
        ainc_stat = 0
        tpoints = _time_points(cfg, step)
        t = 0.0
        if resume is not None and cstep == 1:
            t = float(np.asarray(resume.get("t", 0.0)))
            step_count = int(np.asarray(resume.get("step_count", 0)))
        sub = 0
        cb_count = 0
        while t < t_end - 1e-12:
            dt = min(dt, t_end - t)
            if tpoints is not None:
                # clip dt so substeps land exactly on !TIME_POINTS
                # (get_remain_to_next_timepoints, fstr_Ctrl_TimeInc.f90:219)
                nxt = tpoints[tpoints > t + 1e-12 * t_end]
                if len(nxt):
                    dt = min(dt, float(nxt[0]) - t)
            lam2 = (t + dt) / t_end
            lam1 = t / t_end
            sub += 1
            tincr = dt if step.solution == "VISCO" else 0.0
            max_cont = step.max_contiter if cm is not None else 1
            for cont_it in range(max_cont):
                converged, du, new_states, iters, Q_last = \
                    _newton_substep(
                    model, programs, states, u, f_ramp, free, u_fix_total,
                    lam1, lam2, step, inc_j, dofs_j, nns, total_en, mixed,
                    solve=solver, ctime=t + dt, tincr=tincr,
                    ex_kes=ex_kes_j,
                    ex_dofs=[jnp.asarray(d) for d in ex_dofs],
                    cm=cm, contact_solve=contact_solver, slag=slag,
                    f_held=f_held, follow_sel=follow_sel)
                if cm is None or not converged:
                    break
                coords_def = model.coords + np.asarray(
                    u + du).reshape(model.n_node, model.ndof)
                proj = cm.search(coords_def)
                char = float(np.abs(model.coords).max()) or 1.0
                if slag is not None:
                    # active-set scan at the converged pass
                    # (fstr_scan_contact_state): release tensile slots,
                    # re-activate penetrating ones; rerun the pass if
                    # the set changed or penetration remains
                    cact = cm._last_cact
                    cn_s = slag.build(proj, cm.all_slaves, cact)
                    lam_c = np.asarray(slag.lagrange(cn_s, cm._last_B))
                    scale = max(float(np.abs(lam_c).max()), 1.0)
                    rel_new = cact & (lam_c < -1e-8 * scale)
                    act_new = (~cact) & proj["touching"] & \
                        (proj["gap"] < -(cm.ntol if cm.ntol > 0 else 1e-5) * char)
                    cm.slag_released |= rel_new
                    cm.slag_released &= ~act_new
                    live = proj["touching"] & ~cm.slag_released
                    pen = float(np.maximum(-proj["gap"],
                                           0.0)[live].max()) \
                        if live.any() else 0.0
                    if not rel_new.any() and not act_new.any() and \
                            pen < (cm.ntol if cm.ntol > 0 else 1e-5) * char:
                        break
                    continue
                pen = float(np.maximum(-proj["gap"],
                                       0.0)[proj["touching"]].max()) \
                    if proj["touching"].any() else 0.0
                lam_pre = cm.lam.copy()
                cm.augment(proj)
                # Uzawa convergence: penetration resolved AND the
                # multiplier update settled — a large |dlam| (e.g. a
                # slot freed on separation) means the converged config
                # was computed with inconsistent contact forces and
                # needs another Newton pass
                dlam = float(np.abs(cm.lam - lam_pre).max()) \
                    if cm.lam.size else 0.0
                if pen < (cm.ntol if cm.ntol > 0 else 1e-5) * char and dlam <= cm.kn * (cm.ntol if cm.ntol > 0 else 1e-5) * char:
                    break
            stats.total_iters += iters
            stats.max_iters = max(stats.max_iters, iters)
            if not converged:
                cb_count += 1
                stats.cutbacks += 1
                if sta_path:
                    from frontistr_tpu.io.stafile import sta_status
                    sta_status(sta_path, cstep, sub, 1, iters, iters, t,
                               dt, cutback=cb_count,
                               message="Failed to converge due to "
                               "MAXITER.")
                ainc_stat = -1
                if cb_count > ainc["CBbound"] or dt <= step.mindt:
                    if sta_path:
                        from frontistr_tpu.io.stafile import sta_final
                        sta_final(sta_path, False)
                    raise RuntimeError(
                        f"Newton failed to converge at step {cstep} "
                        f"substep {sub} (dt={dt})")
                # cutback ratio Rc (fstr_TimeInc_SetTimeIncrement)
                dt = dt * ainc["Rc"]
                sub -= 1
                continue
            cb_count = 0
            if sta_path:
                from frontistr_tpu.io.stafile import sta_status
                sta_status(sta_path, cstep, sub, 1, iters,
                           stats.total_iters, t, dt)
            t += dt
            u = u + du
            # commit state (fstr_UpdateState)
            states = [_commit_state(s) for s in new_states]
            stats.substeps += 1
            step_count += 1
            if restart_path and restart_freq > 0 and \
                    step_count % restart_freq == 0:
                st_out = engine.unpad_states(states) \
                    if engine is not None else states
                if _os.environ.get("FRONTISTR_TPU_RESTART_FORMAT",
                                   "").lower() == "hecmw":
                    # reference blob stream: resumable by the
                    # reference binary (fstr_read_restart)
                    from frontistr_tpu.io.hecmw_restart import \
                        export_solid_state
                    export_solid_state(
                        restart_path, np.asarray(u),
                        np.asarray(Q_last) if Q_last is not None
                        else np.zeros_like(np.asarray(u)),
                        [{k: np.asarray(v) for k, v in s.items()}
                         for s in st_out], model.blocks,
                        step_count=step_count, ctime=float(t),
                        dtime=float(dt), steptime=float(t))
                else:
                    from frontistr_tpu.io.restart import save_restart
                    save_restart(restart_path, dict(
                        u=np.asarray(u), t=np.asarray(t),
                        step_count=np.asarray(step_count),
                        states=[{k: np.asarray(v)
                                 for k, v in s.items()}
                                for s in st_out]))
            if log_path is not None or result_writer is not None:
                result = _postprocess(
                    model, programs,
                    engine.unpad_states(states) if engine is not None
                    else states, u, Q=Q_last)
                if log_path is not None:
                    _append_log(log_path, model, result, step_count)
                if result_writer is not None:
                    # per-substep output hook (fstr_static_Output /
                    # OUTPUT FREQUENCY cadence)
                    result_writer(step_count, t, result)
            if step.inc_type == "AUTO":
                # !AUTOINC_PARAM heuristics (fstr_Ctrl_TimeInc.f90:168-210):
                # count successive substeps satisfying the NR-iteration
                # bounds, then scale dt by Rl / Rs
                dec = iters > min(ainc["bound_s"])
                inc = iters <= min(ainc["bound_l"])
                if dec:
                    ainc_stat = min(ainc_stat, 0) - 1
                elif inc:
                    ainc_stat = max(ainc_stat, 0) + 1
                else:
                    ainc_stat = 0
                if ainc_stat >= ainc["NRtimes_l"]:
                    dt = min(dt * ainc["Rl"], step.maxdt)
                elif ainc_stat <= -ainc["NRtimes_s"]:
                    dt = max(dt * ainc["Rs"], step.mindt)

    if result is None:
        result = _postprocess(
            model, programs,
            engine.unpad_states(states) if engine is not None else states,
            u, Q=Q_last)
        if log_path is not None:
            _append_log(log_path, model, result, max(step_count, 1))
    if sta_path:
        from frontistr_tpu.io.stafile import sta_final
        sta_final(sta_path, True)
    result.iters = stats.total_iters
    return result


def _time_points(cfg, step):
    """!TIME_POINTS NAME=..., TIME=STEP|TOTAL [,GENERATE] -> sorted array
    of step-relative times (fstr_ctrl_get_TIMEPOINTS,
    fstr_ctrl_common.f90:655-690)."""
    name = (getattr(step, "timepoints", "") or "").upper()
    cards = getattr(cfg, "time_points", [])
    if not cards:
        return None
    for c in cards:
        if name and (c.param("NAME") or "").upper() != name:
            continue
        rows = c.rows_f()
        if c.param("GENERATE") is not None:
            r = rows[0] + [0.0]
            ts = np.arange(r[0], r[1] + 1e-12, max(r[2], 1e-30))
        else:
            ts = np.asarray([r[0] for r in rows if r])
        return np.sort(ts)
    return None


def _ainc_params(cfg, step):
    """!AUTOINC_PARAM card (fstr_get_AUTOINC, fstr_ctrl_common.f90:572-640)
    with init_AincParam defaults (m_step.f90:160-180)."""
    p = dict(Rs=0.25, Rl=1.25, bound_s=(10, 50, 10), bound_l=(1, 1, 1),
             NRtimes_s=1, NRtimes_l=2, Rc=0.25, CBbound=5)
    name = (step.aincparam or "").upper()
    for c in getattr(cfg, "autoinc_params", []):
        if name and (c.param("NAME") or "").upper() != name:
            continue
        rows = c.rows_f()
        if len(rows) > 0 and rows[0]:
            r = rows[0] + [0] * 5
            p["Rs"] = r[0] or p["Rs"]
            p["bound_s"] = tuple(int(v) for v in r[1:4])
            p["NRtimes_s"] = int(r[4]) or 1
        if len(rows) > 1 and rows[1]:
            r = rows[1] + [0] * 5
            p["Rl"] = r[0] or p["Rl"]
            p["bound_l"] = tuple(int(v) for v in r[1:4])
            p["NRtimes_l"] = int(r[4]) or 1
        if len(rows) > 2 and rows[2]:
            r = rows[2] + [0] * 2
            p["Rc"] = r[0] or p["Rc"]
            p["CBbound"] = int(r[1]) or p["CBbound"]
        break
    return p


def _commit_state(s):
    if not s:               # linear structural blocks carry no state
        return s
    out = dict(s)
    out["strain_bak"] = s["strain"]
    out["stress_bak"] = s["stress"]
    out["pstrain"] = s["pstrain_new"]
    if "vq" in s:
        # updateViscoElasticState: shift q, store committed dev strain
        out["vq"] = s["vq_new"]
        eps = s["strain"]
        th = (eps[..., 0] + eps[..., 1] + eps[..., 2]) / 3.0
        out["ven"] = jnp.concatenate(
            [eps[..., :3] - th[..., None], 0.5 * eps[..., 3:]], -1)
    return out


def _newton_substep(model, programs, states, u, f_total, free, u_fix_total,
                    lam1, lam2, step, inc_j, dofs_j, nns, total_en, mixed,
                    solve=None, ctime=0.0, tincr=0.0, ex_kes=(),
                    ex_dofs=(), cm=None, contact_solve=None, slag=None,
                    f_held=None, follow_sel=None):
    n = model.n_dof_total
    ndof = model.ndof
    du = jnp.zeros(n)
    # prescribed displacement increment for this substep (fstr_AddBC)
    dufix = jnp.asarray(u_fix_total) * (lam2 - lam1)
    if getattr(model, "rot_bcs", None):
        # rotational BC: incremental Rodrigues rotation of the current
        # slave positions about the center (fstr_AddBC.f90:112-160)
        from frontistr_tpu.assembly.model import rot_bc_disp
        u_np = np.asarray(u)
        for ent in model.rot_bcs:
            dofs_r, vals_r = rot_bc_disp(ent, model.coords, u=u_np,
                                         factor=(lam2 - lam1))
            dufix = dufix.at[jnp.asarray(dofs_r)].set(
                jnp.asarray(vals_r))
    # multi-step decks split loads into a held part (groups already active
    # in the previous step, factor 1.0) and a ramped part
    gl = f_total * lam2 if f_held is None else f_held + f_total * lam2
    # follower loads: DLOAD re-assembled at the deformed geometry every
    # Newton iteration (DLOAD_follow=1 default under nlgeom,
    # fstr_solve_NonLinear.f90:103)
    follow = model.nlgeom and model.dload_grp is not None
    # device follower path: the DLOAD grouping is static, so the whole
    # re-assembly at coords0+u is one jitted gather+einsum+scatter — no
    # u pull to host and no numpy pass per Newton iteration
    fol_dev = None
    if follow and follow_sel is None:
        fol_dev = getattr(model, "_follower_dev", None)
        if fol_dev is None:
            from frontistr_tpu.assembly.loads import FollowerDload
            cards_f, lgrp_f = model.dload_grp
            fol_dev = FollowerDload(model, cards_f, lgrp_f)
            model._follower_dev = fol_dev
        if not fol_dev.ok:
            fol_dev = None
    f_base_j = jnp.asarray(model.f_base) if fol_dev is not None else None
    eng = getattr(solve, "engine", None)
    if eng is not None and cm is None and not follow:
        # fully-sharded element pipeline: states arrive (and return)
        # padded + element-sharded; u/gl/dufix are padded once here
        return _newton_substep_sharded(eng, model, programs, states, u,
                                       gl, dufix, step, ctime, tincr,
                                       gfac=lam2 - lam1)

    def _follow_gl(u_now):
        if fol_dev is not None:
            return (f_base_j + fol_dev(u_now)) * lam2
        from frontistr_tpu.assembly.loads import collect_dload
        cards, lgrp = model.dload_grp
        coords_def = model.coords + np.asarray(u_now).reshape(
            model.n_node, ndof)[:, :model.dim]
        if follow_sel is not None:
            sel_h, sel_r = follow_sel
            return jnp.asarray(
                _assemble_loads_sel(model, model.cfg, sel_h,
                                    coords=coords_def) +
                _assemble_loads_sel(model, model.cfg, sel_r,
                                    coords=coords_def) * lam2)
        fd = collect_dload(model.mesh, model, cards, lgrp,
                           coords=coords_def)
        return jnp.asarray(model.f_base + fd) * lam2
    states_cur = states
    conv = False
    iters = 0
    Q_cur = _qforce(model, programs, states_cur, u, du, inc_j, dofs_j,
                    nns, total_en, ctime, tincr, ex_kes, ex_dofs)
    for it in range(1, step.max_iter + 1):
        iters = it
        kes = []
        for p, s in zip(programs, states_cur):
            u_e = u.reshape(model.n_node, ndof)[p.block.conn]
            ddu_e = du.reshape(model.n_node, ndof)[p.block.conn]
            kes.append(p.tangent(u_e, ddu_e, s, ctime, tincr))
        kes.extend(ex_kes)
        if follow:
            gl = _follow_gl(u + du)
        # residual with current state
        B = gl - Q_cur
        dirichlet_inc = dufix if it == 1 else jnp.zeros_like(dufix)
        direct = model.cfg.solver.method.upper() in (
            "DIRECT", "DIRECTMKL", "MUMPS", "MKL", "DIRECTLAG")
        if cm is None and model.mesh.equations:
            # !EQUATION needs the operator-wise T^tKT elimination, which
            # lives in the iterative arm — keep exact physics over
            # method choice (the reference eliminates at the middleware
            # level, so its direct solvers see the reduced matrix)
            direct = False
        if cm is not None and slag is not None:
            # SLAGRANGE: exact gap closure by slave-dof elimination.
            # The active set is FROZEN for the whole Newton pass
            # (fstr_scan_contact_state runs between the outer
            # loopFORcontactAnalysis passes, never inside Newton —
            # flipping slots per iteration lets Newton 'converge' onto
            # an oscillating system); geometry coefficients still track
            # the deformed configuration per iteration.
            coords_def = model.coords + np.asarray(
                u + du).reshape(model.n_node, model.ndof)
            proj = cm.search(coords_def)
            if it == 1:
                g_tol = 1e-8 * max(float(np.abs(model.coords).max()),
                                   1.0)
                cact_frozen = proj["touching"] & \
                    (proj["gap"] <= g_tol) & ~cm.slag_released
                cm._last_cact = cact_frozen
            cact = cact_frozen
            cn = slag.build(proj, cm.all_slaves, cact)
            if direct:
                # METHOD=DIRECT on a contact deck: explicit Lagrange
                # rows + host saddle-point factorization
                # (solve_LINEQ_direct_serial_lag.f90).  A frictionless
                # body held only by contact can be exactly singular
                # (tangential rigid modes) — fall back to the iterative
                # arm, which solves in the range space, like the
                # reference's solver-retry path.
                from frontistr_tpu.contact.slag import lag_rows
                from frontistr_tpu.solver.direct import solve_direct_lag
                Bl, grows = lag_rows(proj, cm.all_slaves, cact, ndof, n,
                                     free=np.asarray(free))
                try:
                    dx_np, _ = solve_direct_lag(
                        [np.asarray(k) for k in kes],
                        [np.asarray(d) for d in dofs_j], n,
                        np.asarray(free), np.asarray(B), Bl, grows,
                        u_fix=np.asarray(dirichlet_inc))
                    dx = jnp.asarray(dx_np)
                except RuntimeError:
                    dx = contact_solve(tuple(kes), B, dirichlet_inc, cn,
                                       gfac=((lam2 - lam1)
                                             if it == 1 else 0.0))
            else:
                dx = contact_solve(tuple(kes), B, dirichlet_inc, cn,
                                   gfac=((lam2 - lam1)
                                         if it == 1 else 0.0))
        elif cm is not None:
            coords_def = model.coords + np.asarray(
                u + du).reshape(model.n_node, model.ndof)
            proj = cm.search(coords_def)
            cdofs, cke, cqf, _, _ = cm.device_blocks(proj)
            cdofs_j = jnp.asarray(cdofs)
            # contact internal force (Q_cur excludes it): B = gl - Q - Qc
            Bc = jnp.zeros_like(B).at[cdofs_j.reshape(-1)].add(
                jnp.asarray(cqf).reshape(-1))
            B = B - Bc
            if direct:
                from frontistr_tpu.solver.direct import solve_direct_al
                dx = jnp.asarray(solve_direct_al(
                    [np.asarray(k) for k in kes],
                    [np.asarray(d) for d in dofs_j], n,
                    np.asarray(free), np.asarray(B), cdofs, cke,
                    u_fix=np.asarray(dirichlet_inc)))
            else:
                dx = contact_solve(tuple(kes), B, dirichlet_inc, cdofs_j,
                                   jnp.asarray(cke),
                                   gfac=((lam2 - lam1)
                                         if it == 1 else 0.0))
        elif direct:
            # METHOD=DIRECT/MUMPS on a plain (no-contact) nonlinear deck:
            # host SuperLU on the current tangent each iteration
            # (fstr_solve_NonLinear.f90 calls solve_LINEQ, which
            # dispatches MUMPS/direct like every other solve)
            from types import SimpleNamespace
            from frontistr_tpu.solver.direct import solve_direct
            op_h = SimpleNamespace(
                kes=[np.asarray(k) for k in kes],
                dofs=[np.asarray(d) for d in dofs_j],
                free_mask=np.asarray(free), n_dof=n)
            dx = jnp.asarray(solve_direct(
                op_h, np.asarray(B), u_fix=np.asarray(dirichlet_inc)))
        else:
            if solve is None:
                solve = make_constrained_solver(model, dofs_j, nns, inc_j,
                                                total_en, free, mixed)
            dx = solve(tuple(kes), B, dirichlet_inc,
                       (lam2 - lam1) if it == 1 else 0.0)
        du = du + dx
        # stress/state update + internal force (one pass per block)
        new_states = []
        flats = []
        for p, s in zip(programs, states_cur):
            u_e = u.reshape(model.n_node, ndof)[p.block.conn]
            ddu_e = du.reshape(model.n_node, ndof)[p.block.conn]
            ns_, qf = p.update(u_e, ddu_e, s, ctime, tincr)
            new_states.append(ns_)
            flats.append(qf.reshape(-1))
        states_cur = new_states
        for ke_x, d_x in zip(ex_kes, ex_dofs):
            tot = (u + du)[d_x]
            flats.append(jnp.einsum("eij,ej->ei", ke_x, tot).reshape(-1))
        flats.append(jnp.zeros(ndof))
        flat = jnp.concatenate(flats)
        idx = inc_j[:, :, None] * ndof + jnp.arange(ndof)[None, None, :]
        Q = flat[idx].sum(axis=1).reshape(-1)
        Q_cur = Q
        Bres = (gl - Q) * free
        active_solve = solve if cm is None else contact_solve
        mpc_h = None
        if getattr(active_solve, "has_mpc", False):
            # !EQUATION: reduced-space residual so constraint-carrying
            # forces cancel between dependent and master dofs
            # (fstr_Update_NDForce_MPC)
            from frontistr_tpu.assembly import extras as exmod
            mpc_h = getattr(active_solve, "_mpc_h", None)
            if mpc_h is None:
                mpc_h = exmod.mpc_arrays(model.mesh, ndof, n)
                active_solve._mpc_h = mpc_h
        if cm is None and mpc_h is not None:
            Bres = exmod.mpc_Tt(mpc_h, gl - Q) * free
        if cm is not None and slag is not None:
            # reduced-space residual (active set stays frozen; the
            # tension/penetration scan runs in the outer contact loop);
            # with MPC composed, reduce T_c^t T_m^t r
            cm._last_B = gl - Q
            r = gl - Q
            if mpc_h is not None:
                r = exmod.mpc_Tt(mpc_h, r)
            Bres = np.asarray(slag.Tt(cn, r)) * np.asarray(free)
            Bres = jnp.asarray(Bres)
        elif cm is not None:
            coords_def = model.coords + np.asarray(
                u + du).reshape(model.n_node, model.ndof)
            proj_n = cm.search(coords_def)
            cdofs_n, _, cqf_n, _, _ = cm.device_blocks(proj_n)
            Qc = jnp.zeros_like(Bres).at[
                jnp.asarray(cdofs_n).reshape(-1)].add(
                jnp.asarray(cqf_n).reshape(-1))
            r = gl - Q - Qc
            if mpc_h is not None:
                r = exmod.mpc_Tt(mpc_h, r)
            Bres = r * free
        # ONE device->host fetch per Newton iteration: the four
        # convergence norms ride back together (each separate float()
        # is a full round-trip on the remote-TPU tunnel)
        res_n, qnrm, xnrm, dunrm = (
            float(v) for v in np.asarray(_conv_norms(Bres, Q, dx, du)))
        if qnrm < 1e-8:
            qnrm = 1.0
        if it == 1:
            dunrm = xnrm
        rres = res_n / qnrm
        rxnrm = xnrm / max(dunrm, 1e-300)
        if os.environ.get("FRONTISTR_TPU_DEBUG_NEWTON"):
            # per-iteration Newton residual trace (the reference prints
            # these at fstr_solve_NonLinear.f90 loglevel ILOG)
            print(f" Newton it={it:3d}  rres={rres:.6e}  "
                  f"rxnrm={rxnrm:.6e}")
        if not model.nlgeom and _all_linear(programs):
            conv = True
            break
        if rres < step.converg or rxnrm < step.converg:
            conv = True
            break
        if rres > step.maxres:
            return False, du, states_cur, iters, Q_cur
    if not conv:
        return False, du, states_cur, iters, Q_cur
    return True, du, states_cur, iters, Q_cur


@jax.jit
def _conv_norms(Bres, Q, dx, du):
    return jnp.sqrt(jnp.stack([jnp.vdot(Bres, Bres), jnp.vdot(Q, Q),
                               jnp.vdot(dx, dx), jnp.vdot(du, du)]))


def _all_linear(programs):
    return all(p.flag == mat.INFINITESIMAL and p.mtype == mat.ELASTIC
               for p in programs)


def _qforce(model, programs, states, u, du, inc_j, dofs_j, nns, total_en,
            ctime=0.0, tincr=0.0, ex_kes=(), ex_dofs=()):
    """Assemble global internal force QFORCE from per-block updates."""
    ndof = model.ndof
    flats = []
    for p, s in zip(programs, states):
        u_e = u.reshape(model.n_node, ndof)[p.block.conn]
        ddu_e = du.reshape(model.n_node, ndof)[p.block.conn]
        _, qf = p.update(u_e, ddu_e, s, ctime, tincr)
        flats.append(qf.reshape(-1))
    for ke_x, d_x in zip(ex_kes, ex_dofs):
        tot = (u + du)[d_x]
        flats.append(jnp.einsum("eij,ej->ei", ke_x, tot).reshape(-1))
    flats.append(jnp.zeros(ndof))
    flat = jnp.concatenate(flats)
    idx = inc_j[:, :, None] * ndof + jnp.arange(ndof)[None, None, :]
    return flat[idx].sum(axis=1).reshape(-1)


def _postprocess(model, programs, states, u, Q=None):
    un = np.asarray(u).reshape(model.n_node, model.ndof)
    # REACTION = internal force at the converged state minus applied
    # load (fstrSOLID%REACTION, static_make_result.f90:97-102).  Q is
    # the CONVERGED internal force from the Newton loop — recomputing it
    # here would re-apply the constitutive update (wrong for
    # path-dependent visco/plastic states).
    reaction = None
    if Q is not None:
        reaction = np.asarray(Q).reshape(model.n_node, model.ndof) - \
            np.asarray(model.f_ext).reshape(model.n_node, model.ndof)
    if any(b.kind == "shell" for b in model.blocks):
        from frontistr_tpu.post.shellpost import shell_recover
        sm = shell_recover(model, un)
        elem_ids = np.concatenate([b.elem_ids for b in model.blocks])
        return StaticResult(
            u=un, nodal_strain=sm["strain"], nodal_stress=sm["stress"],
            nodal_mises=sm["mises"], node_count=sm["count"],
            elem_strain=np.concatenate(sm["estrain"]),
            elem_stress=np.concatenate(sm["estress"]),
            elem_mises=np.concatenate(sm["emises"]),
            elem_ids=elem_ids, iters=0, relres=0.0,
            reaction=reaction)
    ns_out = 6 if model.dim == 3 else 3
    block_data = []
    for p, s in zip(programs, states):
        if p.table is None:          # beams: no continuum gauss state
            block_data.append(dict(
                etype=p.block.etype, conn=p.block.conn[:, :0],
                gauss_strain=np.zeros((len(p.block.elem_ids), 1, ns_out)),
                gauss_stress=np.zeros((len(p.block.elem_ids), 1, ns_out)),
                skip=True))
            continue
        block_data.append(dict(etype=p.block.etype, conn=p.block.conn,
                               gauss_strain=np.asarray(s["strain"]),
                               gauss_stress=np.asarray(s["stress"])))
    sm = postnodal.smooth(model.n_node, block_data, model.dim)
    elem_ids = np.concatenate([b.elem_ids for b in model.blocks])
    return StaticResult(
        u=un, nodal_strain=sm["strain"], nodal_stress=sm["stress"],
        nodal_mises=sm["mises"], node_count=sm["count"],
        elem_strain=np.concatenate(sm["estrain"]),
        elem_stress=np.concatenate(sm["estress"]),
        elem_mises=np.concatenate(sm["emises"]),
        elem_ids=elem_ids, iters=0, relres=0.0, reaction=reaction)


def _append_log(log_path, model, result, step_no):
    import os
    from frontistr_tpu.io import logio
    logio.write_static_log(
        log_path, step_no, model.dim, result.u, result.nodal_strain,
        result.nodal_stress, result.nodal_mises, result.elem_strain,
        result.elem_stress, result.elem_mises, model.mesh.node_ids,
        result.elem_ids, append=os.path.exists(log_path) and step_no > 1,
        node_count=result.node_count)
