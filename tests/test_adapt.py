"""Adaptive refinement (frontistr_tpu/adapt.py): ZZ marking +
red/green tet closure vs the reference adaptation subsystem
(hecmw_adapt_proc.f90 pipeline)."""
import dataclasses
from itertools import combinations

import numpy as np
import pytest

from frontistr_tpu.meshgen import box_tet4
from frontistr_tpu.adapt import (adapt_mesh, adapt_by_error, zz_error,
                                 mark_fraction)


def _vol(coords, conn):
    return np.abs(np.linalg.det(coords[conn[:, 1:]]
                                - coords[conn[:, :1]])) / 6.0


def _check_conforming(coords, conn):
    """Every interior face shared by exactly 2 tets, positive volumes,
    total volume preserved by construction checks elsewhere."""
    det = np.linalg.det(coords[conn[:, 1:]] - coords[conn[:, :1]])
    assert det.min() > 1e-14, "degenerate or inverted child"
    faces = {}
    for row in conn:
        for tri in combinations(sorted(map(int, row)), 3):
            faces[tri] = faces.get(tri, 0) + 1
    counts = np.asarray(list(faces.values()))
    assert counts.max() <= 2, "face shared by >2 tets (non-conforming)"
    # hanging-node check: no node lies strictly inside another face
    # (approximated: every face of count 1 must be on the domain hull)
    on_hull = 0
    for tri, cnt in faces.items():
        if cnt == 1:
            p = coords[list(tri)]
            hull = [np.allclose(p[:, d], p[0, d]) and
                    (abs(p[0, d]) < 1e-12 or abs(p[0, d] - 1) < 1e-12)
                    for d in range(3)]
            assert any(hull), f"interior face {tri} owned by one tet"
            on_hull += 1


def test_single_mark_conforming_and_volume():
    m = box_tet4(2, 2, 2)
    conn0 = m.blocks[0].conn
    v0 = _vol(m.coords, conn0).sum()
    m2 = adapt_mesh(m, [1])                     # mark first element
    conn = np.asarray(m2.blocks[0].conn)
    assert conn.shape[0] > conn0.shape[0]
    _check_conforming(m2.coords, conn)
    assert np.isclose(_vol(m2.coords, conn).sum(), v0)


def test_marked_region_refined_others_coarse():
    m = box_tet4(3, 3, 3)
    conn0 = m.blocks[0].conn
    # mark all elements touching the origin corner
    touch = np.flatnonzero((m.coords[conn0] ** 2).sum(-1).min(1) < 1e-12)
    eids = m.blocks[0].elem_ids[touch]
    m2 = adapt_mesh(m, eids)
    conn = np.asarray(m2.blocks[0].conn)
    _check_conforming(m2.coords, conn)
    v = _vol(m2.coords, conn)
    # near the marked corner elements shrank 8x; far corner untouched
    cen = m2.coords[conn].mean(axis=1)
    near = v[np.linalg.norm(cen, axis=1) < 0.25]
    far = v[np.linalg.norm(cen - 1.0, axis=1) < 0.45]
    assert near.max() < far.min()
    assert np.isclose(v.sum(), _vol(m.coords, conn0).sum())


def test_groups_propagate():
    m = box_tet4(2, 2, 2)
    m2 = adapt_mesh(m, m.blocks[0].elem_ids[:6])
    # face group Z0 still spans the z=0 plane
    z0 = m2.node_groups["Z0"]
    assert np.allclose(m2.coords[z0][:, 2], 0.0)
    have = set(map(tuple, np.round(m2.coords[z0][:, :2], 9)))
    # original plane nodes all retained
    for g in m.node_groups["Z0"]:
        assert tuple(np.round(m.coords[g][:2], 9)) in have
    assert len(m2.elem_groups["ALL"]) == m2.blocks[0].conn.shape[0]


def test_zz_marks_stress_concentration():
    """Clamped box with a corner point load: ZZ marks cluster there."""
    from frontistr_tpu.io.ctrlio import Card
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    from frontistr_tpu.io.ctrlio import AnalysisConfig, StepInfo

    m = box_tet4(3, 3, 3)
    cfg = AnalysisConfig()
    cfg.solution_type = "STATIC"
    cfg.steps = [StepInfo()]
    cfg.boundaries = [Card("BOUNDARY", {},
                           [["Z0", "1", "3", "0.0"]])]
    # concentrated load at the (1,1,1) corner node
    corner = int(np.argmin(((m.coords - 1.0) ** 2).sum(1)))
    cfg.cloads = [Card("CLOAD", {},
                       [[str(corner + 1), "3", "-1000.0"]])]
    model = build_struct_model(m, cfg)
    res = run_linear_static(model)
    eta = zz_error(m, res)
    eids = mark_fraction(eta, m.blocks[0].elem_ids, 0.15)
    conn0 = np.asarray(m.blocks[0].conn)
    marked_rows = np.asarray([int(e) - 1 for e in eids])
    cen = m.coords[conn0[marked_rows]].mean(axis=1)
    # marked elements concentrate near the loaded corner
    d_marked = np.linalg.norm(cen - 1.0, axis=1).mean()
    d_all = np.linalg.norm(
        m.coords[conn0].mean(axis=1) - 1.0, axis=1).mean()
    assert d_marked < 0.8 * d_all
    # full pipeline runs and yields a solvable conforming mesh
    m2 = adapt_by_error(m, res, 0.15)
    _check_conforming(m2.coords, np.asarray(m2.blocks[0].conn))
    model2 = build_struct_model(m2, cfg)
    res2 = run_linear_static(model2)
    assert res2.relres < 1e-6


def test_multiblock_adapt_conforming():
    """Two tet4 blocks (different sections) spanning one box: closure
    crosses the block interface without hanging nodes; children stay in
    their parent's block/section."""
    from frontistr_tpu.io.meshio import ElemBlock
    mesh = box_tet4(3, 3, 3)
    b = mesh.blocks[0]
    conn = np.asarray(b.conn)
    # split by element centroid x: two blocks, sections 0 and 1
    cx = mesh.coords[conn].mean(axis=1)[:, 0]
    lo = cx < 0.5
    e_ids = np.asarray(b.elem_ids)
    mesh.blocks = [
        ElemBlock(341, e_ids[lo], conn[lo], conn[lo].copy(),
                  section_id=0),
        ElemBlock(341, e_ids[~lo], conn[~lo], conn[~lo].copy(),
                  section_id=1)]
    # mark a few elements of block 0 near the interface
    marked = [int(e) for e in e_ids[lo][:4]]
    out = adapt_mesh(mesh, marked)
    assert len(out.blocks) == 2
    assert out.blocks[0].section_id == 0
    assert out.blocks[1].section_id == 1
    conn_all = np.concatenate([bb.conn for bb in out.blocks])
    _check_conforming(out.coords, np.asarray(conn_all))
    # volume preserved
    v0 = _vol(mesh.coords, conn).sum()
    v1 = _vol(out.coords, np.asarray(conn_all)).sum()
    assert np.isclose(v0, v1)
    # marked elements actually refined (block 0 grew)
    assert len(out.blocks[0].elem_ids) > lo.sum()
    # global element ids unique
    eids = np.concatenate([bb.elem_ids for bb in out.blocks])
    assert len(np.unique(eids)) == len(eids)


def _prism_grid(nx, ny, nz, lx=1.0, ly=1.0, lz=1.0):
    """Triangulated (nx,ny) layer extruded nz times -> prism6 Mesh."""
    from frontistr_tpu.io.meshio import Mesh, ElemBlock, Section, MaterialDef
    xs = np.linspace(0, lx, nx + 1)
    ys = np.linspace(0, ly, ny + 1)
    zs = np.linspace(0, lz, nz + 1)
    coords = np.array([(x, y, z) for z in zs for y in ys for x in xs])
    nid = lambda i, j, k: k * (nx + 1) * (ny + 1) + j * (nx + 1) + i
    conns = []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                a, b = nid(i, j, k), nid(i + 1, j, k)
                c, d = nid(i + 1, j + 1, k), nid(i, j + 1, k)
                A, B = nid(i, j, k + 1), nid(i + 1, j, k + 1)
                C, D = nid(i + 1, j + 1, k + 1), nid(i, j + 1, k + 1)
                conns.append([a, b, c, A, B, C])
                conns.append([a, c, d, A, C, D])
    conn = np.asarray(conns, np.int64)
    eids = np.arange(1, len(conn) + 1)
    ids = np.arange(1, len(coords) + 1)
    md = MaterialDef("M1")
    md.items[1] = [[210e3, 0.3]]
    return Mesh(header="", coords=coords, node_ids=ids,
                id2idx={int(g): int(g) - 1 for g in ids},
                blocks=[ElemBlock(351, eids, conn, conn.copy())],
                sections=[Section("SOLID", "ALL", "M1", [])],
                materials={"M1": md}, node_groups={},
                elem_groups={}, surf_groups={}, amplitudes={},
                equations=[], contact_pairs=[], initial_conditions={},
                zero_temp=0.0)


def _prism_vol(coords, conn):
    # split each prism into 3 tets (volume only; diagonal choice moot)
    t = np.concatenate([conn[:, [0, 1, 2, 3]], conn[:, [1, 2, 3, 4]],
                        conn[:, [2, 3, 4, 5]]])
    return np.abs(np.linalg.det(coords[t[:, 1:]]
                                - coords[t[:, :1]])).sum() / 6.0


def test_prism_adapt_conforming_and_volume():
    """Mark one prism: TYP-4 on it, TYP-1/2/3 closure on neighbors,
    vertical edges never split, volume preserved, tri faces conforming
    (hecmw_adapt_new_cell_351 semantics)."""
    m = _prism_grid(2, 2, 2)
    v0 = _prism_vol(m.coords, m.blocks[0].conn)
    m2 = adapt_mesh(m, [1])
    conn = np.asarray(m2.blocks[0].conn)
    assert m2.blocks[0].etype == 351
    assert conn.shape[0] > m.blocks[0].conn.shape[0]
    assert np.isclose(_prism_vol(m2.coords, conn), v0)
    # prisms stay z-aligned columns: top/bottom triangles congruent
    dz = m2.coords[conn[:, 3:]] - m2.coords[conn[:, :3]]
    assert np.allclose(dz[:, :, :2], 0.0)
    assert (dz[:, :, 2] > 1e-12).all()
    # triangle faces conforming: shared by at most 2 prisms
    faces = {}
    for row in conn:
        for tri in (tuple(sorted(row[:3])), tuple(sorted(row[3:]))):
            faces[tri] = faces.get(tri, 0) + 1
    assert max(faces.values()) <= 2


def test_mixed_tet_prism_interface_conforming():
    """One prism with one tet on its top triangle face: marking the
    prism splits the shared face edges; closure turns the tet green-3
    and the interface stays conforming."""
    from frontistr_tpu.io.meshio import Mesh, ElemBlock, Section, MaterialDef
    coords = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [0, 1, 1],
        [0.33, 0.33, 2.0]], float)
    pconn = np.asarray([[0, 1, 2, 3, 4, 5]], np.int64)
    tconn = np.asarray([[3, 4, 5, 6]], np.int64)
    md = MaterialDef("M1")
    md.items[1] = [[210e3, 0.3]]
    ids = np.arange(1, 8)
    m = Mesh(header="", coords=coords, node_ids=ids,
             id2idx={int(g): int(g) - 1 for g in ids},
             blocks=[ElemBlock(351, np.asarray([1]), pconn,
                               pconn.copy()),
                     ElemBlock(341, np.asarray([2]), tconn,
                               tconn.copy())],
             sections=[Section("SOLID", "ALL", "M1", [])],
             materials={"M1": md}, node_groups={}, elem_groups={},
             surf_groups={}, amplitudes={}, equations=[],
             contact_pairs=[], initial_conditions={}, zero_temp=0.0)
    m2 = adapt_mesh(m, [1])                     # mark the prism
    pb = [b for b in m2.blocks if b.etype == 351][0]
    tb = [b for b in m2.blocks if b.etype == 341][0]
    assert len(pb.elem_ids) == 4                # TYP-4
    assert len(tb.elem_ids) == 4                # green-3
    # interface conforming: the prism top triangles == tet bottom faces
    ptop = {tuple(sorted(r[3:])) for r in np.asarray(pb.conn)}
    iface_z = 1.0
    tfaces = set()
    for r in np.asarray(tb.conn):
        for tri in combinations(sorted(map(int, r)), 3):
            if np.allclose(m2.coords[list(tri), 2], iface_z):
                tfaces.add(tri)
    assert ptop == tfaces


def test_tet_cutting_prism_vertical_edge_raises():
    """A tet sharing a prism's vertical edge cannot be red-split —
    loud error, not silent non-conformity."""
    from frontistr_tpu.io.meshio import Mesh, ElemBlock, Section, MaterialDef
    coords = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [0, 1, 1],
        [-1.0, 0.0, 0.5]], float)
    pconn = np.asarray([[0, 1, 2, 3, 4, 5]], np.int64)
    tconn = np.asarray([[0, 3, 2, 6]], np.int64)   # edge (0,3) vertical
    md = MaterialDef("M1")
    md.items[1] = [[210e3, 0.3]]
    ids = np.arange(1, 8)
    m = Mesh(header="", coords=coords, node_ids=ids,
             id2idx={int(g): int(g) - 1 for g in ids},
             blocks=[ElemBlock(351, np.asarray([1]), pconn,
                               pconn.copy()),
                     ElemBlock(341, np.asarray([2]), tconn,
                               tconn.copy())],
             sections=[Section("SOLID", "ALL", "M1", [])],
             materials={"M1": md}, node_groups={}, elem_groups={},
             surf_groups={}, amplitudes={}, equations=[],
             contact_pairs=[], initial_conditions={}, zero_temp=0.0)
    with pytest.raises(NotImplementedError):
        adapt_mesh(m, [2])


def test_adapt_then_sharded_solve_matches(monkeypatch):
    """Parallel adaptation, the TPU way: the reference adapts the
    DISTRIBUTED mesh and keeps solving on N ranks (hecmw_adapt_proc on
    hecmwST_local_mesh).  Here adaptation produces an irregular
    red/green-refined mesh whose solve must still ride the GSPMD device
    mesh — adapt_by_error -> build -> FRONTISTR_TPU_SHARDS=8 equals the
    single-device answer bit-for-bit at solver tolerance."""
    from frontistr_tpu.io.ctrlio import Card
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    from frontistr_tpu.io.ctrlio import AnalysisConfig, StepInfo

    m = box_tet4(3, 3, 3)
    cfg = AnalysisConfig()
    cfg.solution_type = "STATIC"
    cfg.steps = [StepInfo()]
    cfg.boundaries = [Card("BOUNDARY", {}, [["Z0", "1", "3", "0.0"]])]
    corner = int(np.argmin(((m.coords - 1.0) ** 2).sum(1)))
    cfg.cloads = [Card("CLOAD", {},
                       [[str(corner + 1), "3", "-1000.0"]])]
    model = build_struct_model(m, cfg)
    res = run_linear_static(model)

    m2 = adapt_by_error(m, res, 0.2)
    assert m2.n_elem > m.n_elem            # refinement actually happened
    model2 = build_struct_model(m2, cfg)

    monkeypatch.delenv("FRONTISTR_TPU_SHARDS", raising=False)
    r1 = run_linear_static(model2)
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "8")
    r8 = run_linear_static(model2)

    assert r8.relres < 1e-6 and np.abs(r1.u).max() > 0
    np.testing.assert_allclose(r8.u, r1.u, rtol=1e-6,
                               atol=1e-9 * np.abs(r1.u).max())
