"""Host-side model builder: mesh + control deck -> typed device arrays.

This is the TPU replacement for the reference's fstr_solid/fstr_param setup
(fistr1/src/common/fstr_setup.f90) + symbolic CSR assembly
(hecmw1/src/solver/matrix/hecmw_mat_con.f90): instead of a CSR graph we keep
per-element-type dense blocks plus gather/scatter dof maps; the global
operator is matrix-free (gather -> k_e @ u_e -> segment scatter-add) or an
assembled block-ELL (assembly/bell.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from frontistr_tpu.elements.tables import ETYPE_INFO, get_table
from frontistr_tpu.fem import material as mat
from frontistr_tpu.io.ctrlio import AnalysisConfig, Card, CntMaterial
from frontistr_tpu.io.meshio import Mesh


@dataclasses.dataclass
class KBlock:
    """One element-type block ready for batched kernels."""
    etype: int
    elem_ids: np.ndarray        # (E,)
    conn: np.ndarray            # (E, nn) node idx (FSTR ordering)
    dofs: np.ndarray            # (E, nn*ndof) global dof idx
    D: np.ndarray               # (E, ns, ns) elastic matrices
    thick: float
    iset: int                   # sect type for 2D (PLANE_STRESS/...)
    density: np.ndarray         # (E,)
    material: mat.Material      # block-uniform material record
    sect_id: int = 0
    # 361 formulation (fstr_setup.f90:365-379 defaults): FI / BBAR / IC / FBAR
    formulation: str = "FI"
    # "solid" | "shell" (MITC 731/741, 6 dof/node)
    kind: str = "solid"


def _resolve_material(mesh: Mesh, cnt_mats: Dict[str, CntMaterial],
                      name: str) -> mat.Material:
    """Merge mesh !MATERIAL items with .cnt !MATERIAL subcards.

    The .cnt definition wins when both exist (fstr_setup.f90 pass 2 overwrites
    mesh-derived values)."""
    m = mat.Material(name)
    md = mesh.materials.get(name)
    if md is not None:
        it1 = md.items.get(1)
        if it1:
            row = it1[0]
            m.youngs = row[0]
            if len(row) > 1:
                m.poisson = row[1]
        it2 = md.items.get(2)
        if it2:
            m.density = it2[0][0]
        it3 = md.items.get(3)
        if it3:
            m.expansion = it3[0][0]
    cm = cnt_mats.get(name)
    if cm is None and "" in cnt_mats:
        # header-less material cards (!HYPERELASTIC/!DENSITY/... with no
        # preceding !MATERIAL, e.g. tutorial/13): the reference binds
        # them to the (single) mesh-defined material
        cm = cnt_mats[""]
    if cm is not None:
        def _flag(card, default):
            # CAUCHY/KIRCHHOFF/INFINITE params (fstr_ctrl_material.f90)
            if card.has("INFINITE"):
                return mat.INFINITESIMAL
            if card.has("CAUCHY"):
                return mat.UPDATELAG
            if card.has("KIRCHHOFF"):
                return mat.TOTALLAG
            return default
        if cm.elastic is not None:
            rows = cm.elastic.rows_f()
            if (cm.elastic.param("TYPE") or "").upper().startswith("ORTHO"):
                c9 = [v for row in rows for v in row][:9]
                m.ortho_consts = np.asarray(c9)
                m.youngs, m.poisson = c9[0], c9[3]
            else:
                m.elastic_table = np.asarray(rows)
                m.youngs, m.poisson = rows[0][0], rows[0][1]
            m.nlgeom = _flag(cm.elastic, mat.TOTALLAG)
        if cm.density is not None:
            m.density = cm.density.rows_f()[0][0]
        if cm.expansion is not None:
            m.expansion = cm.expansion.rows_f()[0][0]
        if cm.hyperelastic is not None:
            m.mtype = (cm.hyperelastic.param("TYPE") or "MOONEY-RIVLIN").upper()
            m.hyper_consts = np.asarray(cm.hyperelastic.rows_f()[0])
            m.nlgeom = _flag(cm.hyperelastic, mat.TOTALLAG)
        if cm.plastic is not None:
            m.mtype = mat.EPLASTIC
            m.yield_func = (cm.plastic.param("YIELD") or "MISES").upper()
            m.hardening = (cm.plastic.param("HARDEN") or "LINEAR").upper()
            m.plastic_consts = np.asarray(
                [v for row in cm.plastic.rows_f() for v in row]).reshape(
                    len(cm.plastic.data), -1) if cm.plastic.data else None
            m.nlgeom = _flag(cm.plastic, mat.UPDATELAG)
        if cm.viscoelastic is not None:
            m.mtype = mat.VISCOELASTIC
            m.visco_consts = np.asarray(cm.viscoelastic.rows_f())
            m.nlgeom = _flag(cm.viscoelastic, mat.TOTALLAG)
        if cm.trs is not None:
            m.trs_consts = np.asarray(cm.trs.rows_f())
            m.trs_def = (cm.trs.param("DEFINITION") or "WLF").upper()
        if cm.creep is not None:
            m.mtype = mat.CREEP
            m.creep_consts = np.asarray(cm.creep.rows_f()[0])
            m.nlgeom = _flag(cm.creep, mat.UPDATELAG)
        if cm.user_material is not None:
            # '!USER_MATERIAL, NSTATUS=n' + constants rows
            # (fstr_ctrl_get_USERMATERIAL, fstr_ctrl_material.f90:31-51);
            # the update itself comes from the frontistr_tpu.user registry
            m.mtype = mat.USERMATERIAL
            m.user_nstatus = cm.user_material.iparam("NSTATUS", 1)
            rows = cm.user_material.rows_f()
            m.user_consts = np.asarray(
                [v for row in rows for v in row]) if rows else \
                np.zeros(0)
            m.nlgeom = _flag(cm.user_material, mat.INFINITESIMAL)
    return m


@dataclasses.dataclass
class StructModel:
    mesh: Mesh
    cfg: AnalysisConfig
    ndof: int
    dim: int
    n_node: int
    coords: np.ndarray          # (n_node, dim)
    blocks: List[KBlock]
    fixed_dofs: np.ndarray      # (nfix,) int
    fixed_vals: np.ndarray      # (nfix,)
    f_ext: np.ndarray           # (n_node*ndof,)
    nlgeom: bool = False
    temperature: Optional[np.ndarray] = None   # (n_node,) current temp
    # follower loads (DLOAD_follow=1 default under nlgeom): base vector
    # without DLOAD + the deck needed to re-assemble DLOAD at u
    f_base: Optional[np.ndarray] = None
    dload_grp: Optional[tuple] = None          # (cards, lgrp)
    reftemp: float = 0.0
    # spring blocks: (conns, dofs, kes, nns) from assembly.extras
    extras: tuple = ([], [], [], [])
    # rotational BOUNDARY entries (ROT_CENTER): applied via rot_bc_disp
    rot_bcs: list = dataclasses.field(default_factory=list)

    @property
    def n_dof_total(self) -> int:
        return self.n_node * self.ndof


def _resolve_node_group(mesh: Mesh, token: str) -> np.ndarray:
    """BC target: node group name or a literal node id
    (fstr_setup_util node_grp resolution semantics)."""
    if token in mesh.node_groups:
        return mesh.node_groups[token]
    try:
        nid = int(token)
    except ValueError:
        return np.zeros(0, np.int64)
    if nid in mesh.id2idx:
        return np.asarray([mesh.id2idx[nid]], dtype=np.int64)
    return np.zeros(0, np.int64)


def collect_boundary(mesh: Mesh, cards: List[Card], ndof: int,
                     grpid_filter=None):
    """!BOUNDARY rows: (group, dof_start, dof_end, value)."""
    fixed: Dict[int, float] = {}
    for c in cards:
        gid = c.iparam("GRPID", 1)
        if grpid_filter is not None and gid not in grpid_filter:
            continue
        if c.param("ROT_CENTER"):
            continue      # rotational BC rows handled by collect_rot
        for row in c.data:
            grp = row[0]
            ds = int(float(row[1])) if len(row) > 1 else 1
            de = int(float(row[2])) if len(row) > 2 else ds
            val = float(row[3]) if len(row) > 3 else 0.0
            nodes = _resolve_node_group(mesh, grp)
            for d in range(ds, de + 1):
                if d > ndof:
                    continue
                for n in nodes:
                    fixed[int(n) * ndof + (d - 1)] = val
    if not fixed:
        return np.zeros(0, np.int64), np.zeros(0)
    keys = np.asarray(sorted(fixed), dtype=np.int64)
    vals = np.asarray([fixed[int(k)] for k in keys])
    return keys, vals


def collect_cload(mesh: Mesh, cards: List[Card], ndof: int, n_node: int,
                  grpid_filter=None, coords=None) -> np.ndarray:
    f = np.zeros(n_node * ndof)
    for c in cards:
        gid = c.iparam("GRPID", 1)
        if grpid_filter is not None and gid not in grpid_filter:
            continue
        if c.param("ROT_CENTER"):
            for ent in collect_rot(mesh, [c], ndof):
                f += torque_forces(mesh, ent,
                                   coords if coords is not None
                                   else mesh.coords)
            continue
        for row in c.data:
            grp = row[0]
            d = int(float(row[1]))
            val = float(row[2])
            nodes = _resolve_node_group(mesh, grp)
            if d <= ndof:
                f[nodes * ndof + (d - 1)] += val
    return f


def collect_rot(mesh: Mesh, cards: List[Card], ndof: int,
                grpid_filter=None):
    """ROT_CENTER entries on !BOUNDARY/!CLOAD: one per card, with the
    rotation/torque vector accumulated across rows (fstr_AddBC.f90:
    70-85, fstr_ass_load.f90:51-93).  Returns dicts with 'nodes'
    (slave idx), 'center' (center-group idx), 'vec' (3,)."""
    out = []
    for c in cards:
        cg = c.param("ROT_CENTER")
        if not cg:
            continue
        gid = c.iparam("GRPID", 1)
        if grpid_filter is not None and gid not in grpid_filter:
            continue
        vec = np.zeros(3)
        nodes = None
        for row in c.data:
            grp = row[0]
            if len(row) >= 4:               # BOUNDARY: ds, de, val
                ds = int(float(row[1]))
                de = int(float(row[2]))
                val = float(row[3])
            else:                           # CLOAD: dof, val
                ds = de = int(float(row[1]))
                val = float(row[2])
            for d in range(ds, de + 1):
                vec[(d - 1) % 3] = val
            nodes = _resolve_node_group(mesh, grp)
        center = _resolve_node_group(mesh, cg)
        if nodes is None or len(nodes) == 0 or len(center) == 0:
            continue
        out.append(dict(nodes=nodes, center=center, vec=vec))
    return out


def torque_forces(mesh: Mesh, ent, coords) -> np.ndarray:
    """Torque CLOAD: per slave node F = (T/n)(a x r)/|a x r|^2 with a
    the unit axis and r the current position relative to the center
    (fstr_ass_load.f90:95-133) -- each node carries torque T/n exactly,
    independent of radius."""
    ndof = coords.shape[1] if coords.ndim == 2 else 3
    f = np.zeros(mesh.n_node * 3)
    vec = ent["vec"]
    T = float(np.linalg.norm(vec))
    if T < 1e-16:
        return f.reshape(mesh.n_node, 3)[:, :ndof].reshape(-1)
    a = vec / T
    c = coords[ent["center"]].mean(axis=0)
    tn = T / len(ent["nodes"])
    for n in ent["nodes"]:
        r = coords[int(n)] - c
        v = np.cross(a, r)
        nv2 = float(v @ v)
        if nv2 < 1e-16:
            raise ValueError("torque node coincides with the rotation "
                             "center (fstr_ass_load.f90:126)")
        f[3 * int(n):3 * int(n) + 3] = (tn / nv2) * v
    return f.reshape(mesh.n_node, 3)[:, :ndof].reshape(-1)


def rodrigues(vec: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Rotate r (n,3) by the rotation vector vec (angle = |vec|)."""
    th = float(np.linalg.norm(vec))
    if th < 1e-16:
        return r.copy()
    k = vec / th
    return (r * np.cos(th) + np.cross(k, r) * np.sin(th)
            + np.outer(r @ k, k) * (1.0 - np.cos(th)))


def rot_bc_disp(ent, coords, u=None, factor: float = 1.0) -> tuple:
    """Prescribed displacement increment of a rotational BC: du =
    R(factor*vec) r - r with r the current slave position relative to
    the center (fstr_AddBC.f90:112-160).  Returns (dofs, values)."""
    nd = coords.shape[1]
    cur = coords if u is None else coords + u.reshape(-1, nd)
    c = cur[ent["center"]].mean(axis=0)
    r = cur[ent["nodes"]] - c
    r3 = np.zeros((len(r), 3))
    r3[:, :nd] = r
    du = rodrigues(ent["vec"] * factor, r3) - r3
    dofs = (np.asarray(ent["nodes"])[:, None] * nd
            + np.arange(nd)[None, :]).reshape(-1)
    return dofs.astype(np.int64), du[:, :nd].reshape(-1)


def _orientation_frame(cfg: AnalysisConfig, sect_id: int):
    """Resolve cnt '!SECTION, SECNUM=n, ORIENTATION=name' to the 3x3 local
    frame (rows = local axes) defined by '!ORIENTATION,
    DEFINITION=COORDINATES' points a, b, c (fstr_setup_ORIENTATION:
    fstr_setup.f90:1517-1570: x = (a-c)/|a-c|, z = x cross (b-c), y = z
    cross x)."""
    name = None
    for c in cfg.sections:
        if c.iparam("SECNUM", 0) == sect_id + 1:
            name = (c.param("ORIENTATION") or "").upper() or None
    if name is None:
        return None
    known = [(c.param("NAME") or "").upper() for c in cfg.orientations]
    if name not in known:
        raise ValueError(f"!SECTION references undefined ORIENTATION "
                         f"'{name}' (defined: {known or 'none'})")
    for c in cfg.orientations:
        if (c.param("NAME") or "").upper() != name:
            continue
        dfn = (c.param("DEFINITION") or "COORDINATES").upper()
        if dfn != "COORDINATES":
            raise NotImplementedError("ORIENTATION DEFINITION=NODES")
        vals = [float(v) for v in c.rows_f()[0]] + [0.0] * 9
        a = np.asarray(vals[0:3])
        b = np.asarray(vals[3:6])
        c0 = np.asarray(vals[6:9])
        f1 = a - c0
        f1 = f1 / np.linalg.norm(f1)
        f3 = np.cross(f1, b - c0)
        f3 = f3 / np.linalg.norm(f3)
        f2 = np.cross(f3, f1)
        return np.stack([f1, f2, f3])
    return None


def _iset_from_section(sec) -> int:
    # fstr_setup.f90:1012-1021: sect_opt 0 -> PlaneStress(1),
    # 1 -> Planestrain(0), 2 -> AxisSymetric(2)
    return {0: mat.PLANE_STRESS, 1: mat.PLANE_STRAIN,
            2: mat.AXISYMMETRIC}.get(sec.opt, mat.PLANE_STRESS)


SHELL_ETYPES = (731, 741, 743)
SSHELL_ETYPES = (761, 781)   # solid-shell packing, 3 dof/node
BEAM6_ETYPES = (611,)          # 2-node beam, 6 dof/node
BEAM3_ETYPES = (641,)          # 3x4-dof beam packing (NDOF=3 system)


def build_struct_model(mesh: Mesh, cfg: AnalysisConfig) -> StructModel:
    six_blocks = [b for b in mesh.blocks
                  if b.etype in SHELL_ETYPES + BEAM6_ETYPES]
    solid_types = [b for b in mesh.blocks
                   if (b.etype in ETYPE_INFO and ETYPE_INFO[b.etype][0] >= 2)
                   or b.etype in BEAM3_ETYPES + SSHELL_ETYPES]
    if six_blocks:
        if solid_types:
            raise NotImplementedError("mixed shell/solid meshes")
        return _build_shell_model(mesh, cfg, six_blocks)
    if not solid_types:
        raise ValueError("no supported solid elements in mesh")
    dim = max([ETYPE_INFO[b.etype][0] for b in solid_types
               if b.etype in ETYPE_INFO] +
              ([3] if any(b.etype in BEAM3_ETYPES + SSHELL_ETYPES
                          for b in solid_types) else []))
    ndof = dim
    n_node = mesh.n_node
    coords = mesh.coords[:, :dim].copy()

    blocks: List[KBlock] = []
    for b in solid_types:
        sec = mesh.sections[b.section_id] if mesh.sections else None
        if b.etype in SSHELL_ETYPES:
            mname = sec.material if sec else next(iter(mesh.materials), "")
            m = _resolve_material(mesh, cfg.materials, mname)
            m.nlgeom = mat.INFINITESIMAL
            E = len(b.elem_ids)
            nn = b.conn.shape[1]
            thick = sec.values[0] if sec and sec.values else 1.0
            dofs = (b.conn[:, :, None] * ndof +
                    np.arange(ndof)[None, None, :]).reshape(E, nn * ndof)
            D1 = mat.elastic_D(m.youngs, m.poisson, mat.D3)
            blocks.append(KBlock(b.etype, b.elem_ids, b.conn,
                                 dofs.astype(np.int32),
                                 np.broadcast_to(D1, (E,) + D1.shape).copy(),
                                 thick, mat.D3, np.full(E, m.density), m,
                                 b.section_id, kind="sshell"))
            continue
        if b.etype in BEAM3_ETYPES:
            mname = sec.material if sec else next(iter(mesh.materials), "")
            m = _resolve_material(mesh, cfg.materials, mname)
            m.nlgeom = mat.INFINITESIMAL
            E = len(b.elem_ids)
            nn = b.conn.shape[1]
            dofs = (b.conn[:, :, None] * ndof +
                    np.arange(ndof)[None, None, :]).reshape(E, nn * ndof)
            D1 = mat.elastic_D(m.youngs, m.poisson, mat.D3)
            blocks.append(KBlock(b.etype, b.elem_ids, b.conn,
                                 dofs.astype(np.int32),
                                 np.broadcast_to(D1, (E,) + D1.shape).copy(),
                                 1.0, mat.D3, np.full(E, m.density), m,
                                 b.section_id, kind="beam341"))
            continue
        table = get_table(b.etype)
        mname = sec.material if sec else next(iter(mesh.materials), "")
        m = _resolve_material(mesh, cfg.materials, mname)
        if cfg.nlgeom:
            m.nlgeom = mat.TOTALLAG if m.nlgeom == mat.INFINITESIMAL \
                else m.nlgeom
        else:
            # linear STATIC: geometric nonlinearity off regardless of the
            # material cards (fstrPARAM%nlgeom gate)
            m.nlgeom = mat.INFINITESIMAL
        E = len(b.elem_ids)
        thick = 1.0
        iset = mat.D3
        if dim == 2:
            iset = _iset_from_section(sec) if sec else mat.PLANE_STRESS
            thick = sec.values[0] if sec and sec.values else 1.0
        if m.ortho_consts is not None and dim == 3:
            D1 = mat.elastic_D_ortho(m.ortho_consts)
            frame = _orientation_frame(cfg, b.section_id)
            if frame is not None:
                D1 = mat.rotate_D(D1, frame)
        else:
            D1 = mat.elastic_D(m.youngs, m.poisson, iset)
        D = np.broadcast_to(D1, (E,) + D1.shape).copy()
        nn = table.nn
        dofs = (b.conn[:, :, None] * ndof +
                np.arange(ndof)[None, None, :]).reshape(E, nn * ndof)
        form = "FI"
        if b.etype == 361:
            # default 361 formulation for STATIC/DYNAMIC/EIGEN
            # (fstr_setup.f90:365-379); overridable via !ELEMOPT or
            # per-section '!SECTION, SECNUM=n, FORM361=FI|BBAR|IC|FBAR'
            # (fstr_ctrl_common.f90:311-320)
            form = "BBAR" if cfg.nlgeom else "IC"
            if cfg.elemopt361:
                form = {1: "FI", 2: "BBAR", 3: "IC", 4: "FBAR"}.get(
                    cfg.elemopt361, form)
            for c in cfg.sections:
                if c.iparam("SECNUM", 0) == b.section_id + 1:
                    f361 = (c.param("FORM361") or "").upper()
                    if f361 in ("FI", "BBAR", "IC", "FBAR"):
                        form = f361
            if cfg.nlgeom and form == "IC":
                # IC unsupported under nlgeom -> B-bar
                # (fstr_setup.f90:841-845)
                form = "BBAR"
        blocks.append(KBlock(b.etype, b.elem_ids, b.conn,
                             dofs.astype(np.int32), D, thick, iset,
                             np.full(E, m.density), m, b.section_id,
                             formulation=form))

    step = cfg.steps[0]
    grpid = set(step.boundary_groups) if step.boundary_groups else None
    fixed_dofs, fixed_vals = collect_boundary(mesh, cfg.boundaries, ndof,
                                              grpid)
    rot_bcs = collect_rot(mesh, cfg.boundaries, ndof, grpid)
    if rot_bcs:
        # rotational BC slaves are Dirichlet in ALL dofs; the linear
        # path bakes the full-angle Rodrigues values in, the Newton
        # loop overrides them incrementally per substep
        add_d, add_v = [], []
        for ent in rot_bcs:
            dofs_r, vals_r = rot_bc_disp(ent, coords)
            add_d.append(dofs_r)
            add_v.append(vals_r)
        keep = ~np.isin(fixed_dofs, np.concatenate(add_d))
        fixed_dofs = np.concatenate([fixed_dofs[keep]] + add_d)
        fixed_vals = np.concatenate([fixed_vals[keep]] + add_v)
        order = np.argsort(fixed_dofs)
        fixed_dofs, fixed_vals = fixed_dofs[order], fixed_vals[order]
    lgrp = set(step.load_groups) if step.load_groups else None
    f_ext = collect_cload(mesh, cfg.cloads, ndof, n_node, lgrp)

    model = StructModel(mesh, cfg, ndof, dim, n_node, coords, blocks,
                        fixed_dofs, fixed_vals, f_ext, nlgeom=cfg.nlgeom,
                        reftemp=cfg.reftemp)
    model.rot_bcs = rot_bcs
    from frontistr_tpu.assembly.extras import collect_extras
    model.extras = collect_extras(model, grpid)
    if cfg.dloads:
        from frontistr_tpu.assembly.loads import collect_dload
        model.f_base = model.f_ext.copy()
        model.dload_grp = (cfg.dloads, lgrp)
        model.f_ext = model.f_ext + collect_dload(mesh, model, cfg.dloads,
                                                  lgrp)
    if cfg.temperatures:
        from frontistr_tpu.assembly.loads import (collect_temperature,
                                                  thermal_load)
        T = collect_temperature(mesh, cfg.temperatures, n_node, cfg.reftemp,
                                lgrp)
        if T is None and getattr(cfg, "temp_read_field", None) is not None:
            # READRESULT import (readtemp.f90): nodal field from the
            # heat-analysis result file
            T = np.asarray(cfg.temp_read_field, float)
        if T is not None:
            model.temperature = T
            # temperature-dependent E(T), nu(T): upgrade block D to
            # per-gauss matrices before assembling the thermal load
            for b in model.blocks:
                et = b.material.elastic_table
                if et is not None and len(np.asarray(et)) > 1 \
                        and b.kind == "solid":
                    t = get_table(b.etype)
                    tq = np.einsum("qn,en->eq", t.N, T[b.conn])
                    Eq, nuq = mat.elastic_at_T(et, tq)
                    b.D = mat.elastic_D_batch(Eq, nuq, b.iset)
            tl = thermal_load(model, T)
            model.f_ext = model.f_ext + tl
            if model.f_base is not None:
                model.f_base = model.f_base + tl
    # uload plug point (uload.f90 'uloading'): user-registered extra
    # external force
    from frontistr_tpu import user as fuser
    fu = fuser.uload_total(model.coords, ndof)
    if fu is not None:
        model.f_ext = model.f_ext + np.asarray(fu).reshape(-1)
        if model.f_base is not None:
            model.f_base = model.f_base + np.asarray(fu).reshape(-1)
    return model


def _build_shell_model(mesh: Mesh, cfg: AnalysisConfig,
                       shell_blocks) -> StructModel:
    """MITC shell analysis model: 6 dof/node (ux,uy,uz,tx,ty,tz), NDOF=6
    system like the reference shell path (fstr_NodalStress.f90:780+,
    static_LIB_shell.f90)."""
    dim, ndof = 3, 6
    n_node = mesh.n_node
    coords = mesh.coords[:, :3].copy()
    blocks: List[KBlock] = []
    for b in shell_blocks:
        sec = mesh.sections[b.section_id] if mesh.sections else None
        mname = sec.material if sec else next(iter(mesh.materials), "")
        m = _resolve_material(mesh, cfg.materials, mname)
        m.nlgeom = mat.INFINITESIMAL
        E = len(b.elem_ids)
        thick = sec.values[0] if sec and sec.values else 1.0
        D1 = mat.elastic_D(m.youngs, m.poisson, mat.D3)
        D = np.broadcast_to(D1, (E,) + D1.shape).copy()
        nn = b.conn.shape[1]
        dofs = (b.conn[:, :, None] * ndof +
                np.arange(ndof)[None, None, :]).reshape(E, nn * ndof)
        kind = "beam" if b.etype in BEAM6_ETYPES else "shell"
        blocks.append(KBlock(b.etype, b.elem_ids, b.conn,
                             dofs.astype(np.int32), D, thick, mat.D3,
                             np.full(E, m.density), m, b.section_id,
                             kind=kind))
    step = cfg.steps[0]
    grpid = set(step.boundary_groups) if step.boundary_groups else None
    fixed_dofs, fixed_vals = collect_boundary(mesh, cfg.boundaries, ndof,
                                              grpid)
    lgrp = set(step.load_groups) if step.load_groups else None
    f_ext = collect_cload(mesh, cfg.cloads, ndof, n_node, lgrp)
    model = StructModel(mesh, cfg, ndof, dim, n_node, coords, blocks,
                        fixed_dofs, fixed_vals, f_ext, nlgeom=False,
                        reftemp=cfg.reftemp)
    if cfg.dloads:
        from frontistr_tpu.assembly.loads import collect_dload
        model.f_ext = model.f_ext + collect_dload(mesh, model, cfg.dloads,
                                                  lgrp)
    return model
