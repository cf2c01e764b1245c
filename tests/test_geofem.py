"""GEOFEM grid reader: synthetic grid matches the native-mesh solution."""
import os
import tempfile

import numpy as np

from frontistr_tpu.meshgen import box_tet4
from frontistr_tpu.io.geofemio import read_geofem
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model
from frontistr_tpu.analysis.static import run_linear_static


def _write_geofem(mesh, path):
    """Emit a single-PE GEOFEM grid from a meshgen Mesh (tet4 -> 311)."""
    with open(path, "w") as f:
        f.write("0 0\n\n")
        f.write(f"{mesh.n_node} {mesh.n_node}\n")
        for i in range(mesh.n_node):
            x, y, z = mesh.coords[i]
            f.write(f"{mesh.node_ids[i]} {x} {y} {z}\n")
        conn = mesh.blocks[0].conn
        E = len(conn)
        f.write(f"{E}\n")
        f.write(" ".join(["311"] * E) + "\n")
        for e in range(E):
            ids = " ".join(str(mesh.node_ids[n]) for n in conn[e])
            f.write(f"{e + 1} {ids}\n")
        f.write("\n\n")                    # import / export blanks
        groups = [(k, v) for k, v in mesh.node_groups.items()
                  if k in ("X0", "X1")]
        f.write(f"{len(groups)}\n")
        c = 0
        idx = []
        for _, v in groups:
            c += len(v)
            idx.append(c)
        f.write(" ".join(str(v) for v in idx) + "\n")
        for name, v in groups:
            f.write(name + "\n")
            f.write(" ".join(str(mesh.node_ids[n]) for n in v) + "\n")
        f.write("0\n0\n")                  # egrp / sgrp empty


def test_geofem_matches_native():
    mesh0 = box_tet4(3, 3, 3)
    with tempfile.NamedTemporaryFile("w", suffix=".grd",
                                     delete=False) as f:
        p = f.name
    _write_geofem(mesh0, p)
    mesh = read_geofem(p)
    os.unlink(p)
    assert mesh.n_node == mesh0.n_node
    assert mesh.blocks[0].etype == 341
    np.testing.assert_array_equal(np.sort(mesh.node_groups["X0"]),
                                  np.sort(mesh0.node_groups["X0"]))
    cnt = ("!VERSION\n 3\n!SOLUTION, TYPE=STATIC\n"
           "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
           "!SOLVER, METHOD=CG\n 4000, 1\n 1.0e-10, 1.0, 0.0\n!END\n")
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(cnt)
        pc = f.name
    cfg = read_cnt(pc)
    os.unlink(pc)
    res_g = run_linear_static(build_struct_model(mesh, cfg))
    res_n = run_linear_static(build_struct_model(mesh0, cfg))
    np.testing.assert_allclose(res_g.u, res_n.u, rtol=1e-9, atol=1e-14)
