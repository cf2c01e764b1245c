"""Uniform mesh refinement (!MESH ... REFINE=n).

The reference refines the mesh at load time through the embedded
REVOCAP_Refiner (hecmw1/src/common/hecmw_dist_refine.c:401-475): each
element splits uniformly (hex8 -> 8 hexes, tet4 -> 8 tets, quad4 -> 4,
tri3 -> 4), node groups propagate to new nodes whose parent nodes all
belong to the group, element groups to all children, and surface groups
to the child faces lying on the parent face.

Host-side numpy implementation; applied once per REFINE level.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from frontistr_tpu.io.meshio import Mesh, ElemBlock


# child-corner lattice coordinates per etype; lattice index in {0,1,2}^dim
_HEX_CORNERS = [(0, 0, 0), (2, 0, 0), (2, 2, 0), (0, 2, 0),
                (0, 0, 2), (2, 0, 2), (2, 2, 2), (0, 2, 2)]
_QUAD_CORNERS = [(0, 0), (2, 0), (2, 2), (0, 2)]


def _hex_children():
    """8 children, each a list of 8 lattice points in hex8 order."""
    out = []
    for k in (0, 1):
        for j in (0, 1):
            for i in (0, 1):
                base = (i, j, k)
                out.append([(i + di, j + dj, k + dk)
                            for (di, dj, dk) in
                            [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                             (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]])
    return out


def _quad_children():
    out = []
    for j in (0, 1):
        for i in (0, 1):
            out.append([(i, j), (i + 1, j), (i + 1, j + 1), (i, j + 1)])
    return out


def _tet_children():
    """tet4 -> 8 tets: 4 corner tets + octahedron split on diagonal 4-6
    (node keys are frozensets of parent corner indices)."""
    c = [frozenset([i]) for i in range(4)]
    e = {}
    for a in range(4):
        for b in range(a + 1, 4):
            e[(a, b)] = frozenset([a, b])
    t = []
    # corner tets
    t.append([c[0], e[(0, 1)], e[(0, 2)], e[(0, 3)]])
    t.append([e[(0, 1)], c[1], e[(1, 2)], e[(1, 3)]])
    t.append([e[(0, 2)], e[(1, 2)], c[2], e[(2, 3)]])
    t.append([e[(0, 3)], e[(1, 3)], e[(2, 3)], c[3]])
    # octahedron: diagonal e01-e23
    t.append([e[(0, 1)], e[(1, 2)], e[(0, 2)], e[(2, 3)]])
    t.append([e[(0, 1)], e[(1, 2)], e[(2, 3)], e[(1, 3)]])
    t.append([e[(0, 1)], e[(0, 2)], e[(0, 3)], e[(2, 3)]])
    t.append([e[(0, 1)], e[(0, 3)], e[(1, 3)], e[(2, 3)]])
    return t


def _tri_children():
    c = [frozenset([i]) for i in range(3)]
    e01, e12, e20 = (frozenset([0, 1]), frozenset([1, 2]),
                     frozenset([0, 2]))
    return [[c[0], e01, e20], [e01, c[1], e12], [e20, e12, c[2]],
            [e01, e12, e20]]


def refine_mesh(mesh: Mesh, levels: int = 1) -> Mesh:
    m = mesh
    for _ in range(max(0, int(levels))):
        m = _refine_once(m)
    return m


def _refine_once(mesh: Mesh) -> Mesh:
    coords = [c for c in mesh.coords]
    new_of_key: Dict[frozenset, int] = {}
    parent_sets: Dict[int, frozenset] = {
        i: frozenset([i]) for i in range(len(coords))}

    def node_for(key: frozenset) -> int:
        """key = frozenset of parent node indices; mid = average."""
        if len(key) == 1:
            return next(iter(key))
        idx = new_of_key.get(key)
        if idx is None:
            pts = np.stack([mesh.coords[i] for i in key])
            coords.append(pts.mean(axis=0))
            idx = len(coords) - 1
            new_of_key[key] = idx
            parent_sets[idx] = key
        return idx

    blocks: List[ElemBlock] = []
    eid_children: Dict[int, List[int]] = {}
    next_eid = 1
    for b in mesh.blocks:
        etype = b.etype
        conns = []
        eids = []
        if etype in (361, 241, 731, 741):
            lat_children = _hex_children() if etype == 361 else \
                _quad_children()
            corners = _HEX_CORNERS if etype == 361 else _QUAD_CORNERS
            dimn = len(corners[0])
            for row_i, row in enumerate(b.conn):
                def key_of(lat):
                    # parents = corners with matching coords on that
                    # lattice point (those whose lattice coordinate
                    # pattern brackets it)
                    ps = [int(row[ci]) for ci, cc in enumerate(corners)
                          if all(abs(cc[d] - lat[d]) <= 1
                                 for d in range(dimn))]
                    return frozenset(ps)
                for ch in lat_children:
                    conns.append([node_for(key_of(p)) for p in ch])
                    eids.append(next_eid + len(eids))
                eid_children.setdefault(int(b.elem_ids[row_i]),
                                        []).extend(eids[-len(
                                            lat_children):])
        elif etype in (341, 231):
            children = _tet_children() if etype == 341 else \
                _tri_children()
            for row_i, row in enumerate(b.conn):
                for ch in children:
                    conns.append([node_for(frozenset(int(row[i])
                                                     for i in key))
                                  for key in ch])
                    eids.append(next_eid + len(eids))
                eid_children.setdefault(int(b.elem_ids[row_i]),
                                        []).extend(eids[-len(children):])
        else:
            raise NotImplementedError(
                f"uniform refinement for etype {etype}")
        conn = np.asarray(conns, np.int64)
        eid_arr = np.asarray(eids, np.int64)
        next_eid = int(eid_arr[-1]) + 1
        blocks.append(ElemBlock(etype, eid_arr, conn, conn.copy(),
                                section_id=b.section_id))

    coords_a = np.asarray(coords)
    node_ids = np.arange(1, len(coords_a) + 1)
    id2idx = {int(i): int(i) - 1 for i in node_ids}

    # node groups: a new node joins iff all its parents are members
    node_groups = {}
    for name, idx in mesh.node_groups.items():
        mem = np.zeros(len(mesh.coords), bool)
        mem[idx] = True
        out = list(np.nonzero(mem)[0])
        for key, nid in new_of_key.items():
            if all(mem[p] for p in key):
                out.append(nid)
        node_groups[name] = np.asarray(sorted(out), np.int64)

    elem_groups = {}
    for name, eids_g in mesh.elem_groups.items():
        out = []
        for eid in eids_g:
            out.extend(eid_children.get(int(eid), []))
        elem_groups[name] = np.asarray(sorted(out), np.int64)

    # surface groups: child faces whose corners' parent sets lie within
    # the parent face corner set
    from frontistr_tpu.assembly.loads import FACE_TABLES
    eid2loc_old = mesh.elem_id_to_block()
    eid2loc_new = {}
    for bi, b in enumerate(blocks):
        for k, eid in enumerate(b.elem_ids):
            eid2loc_new[int(eid)] = (bi, k)
    surf_groups = {}
    for name, pairs in mesh.surf_groups.items():
        out = []
        for (eid, face) in pairs:
            bi, k = eid2loc_old[int(eid)]
            ob = mesh.blocks[bi]
            ftab = FACE_TABLES.get(ob.etype)
            if ftab is None:
                continue
            _, lnodes = ftab[int(face) - 1]
            pset = set(int(ob.conn[k, i]) for i in lnodes)
            for ceid in eid_children.get(int(eid), []):
                cbi, ck = eid2loc_new[ceid]
                cb = blocks[cbi]
                for cf in range(len(FACE_TABLES[cb.etype])):
                    _, cl = FACE_TABLES[cb.etype][cf]
                    ok = all(parent_sets[int(cb.conn[ck, i])] <= pset
                             for i in cl)
                    if ok:
                        out.append([ceid, cf + 1])
        surf_groups[name] = np.asarray(out, np.int64).reshape(-1, 2)

    return dataclasses.replace(
        mesh, coords=coords_a, node_ids=node_ids, id2idx=id2idx,
        blocks=blocks, node_groups=node_groups, elem_groups=elem_groups,
        surf_groups=surf_groups)
