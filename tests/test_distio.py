"""HECMW-DIST format: write/read round-trip, partitioner files, and an
end-to-end run through '!MESH, TYPE=HECMW-DIST'."""
import os

import numpy as np

from frontistr_tpu.meshgen import box_tet4, box_hex8
from frontistr_tpu.io import distio
from frontistr_tpu.parallel.partition import (partition_mesh,
                                              partition_to_files)


def test_dist_roundtrip(tmp_path):
    mesh = box_tet4(4, 3, 2)
    mesh.node_groups["X0"] = mesh.node_groups["X0"]
    part, subs = partition_mesh(mesh, 4)
    for r in range(4):
        dm = distio.dist_from_subdomain(mesh, subs, r, part=part)
        p = str(tmp_path / f"m.{r}")
        distio.write_dist(dm, p)
        back = distio.read_dist(p)
        assert back.n_node == dm.n_node
        assert back.nn_internal == dm.nn_internal
        np.testing.assert_array_equal(back.global_node_ID,
                                      dm.global_node_ID)
        np.testing.assert_allclose(back.node, dm.node)
        np.testing.assert_array_equal(back.elem_node_item,
                                      dm.elem_node_item)
        np.testing.assert_array_equal(back.elem_type, dm.elem_type)
        if dm.n_neighbor_pe:
            np.testing.assert_array_equal(back.import_item,
                                          dm.import_item)
            np.testing.assert_array_equal(back.export_item,
                                          dm.export_item)
        assert back.node_grp[0] == dm.node_grp[0]
        np.testing.assert_array_equal(back.node_grp[2], dm.node_grp[2])
        assert back.mat_name == dm.mat_name
        if dm.mat_val is not None:
            np.testing.assert_allclose(back.mat_val, dm.mat_val)


def test_dist_comm_tables_cover_ghosts(tmp_path):
    mesh = box_hex8(4, 4, 4)
    part, subs = partition_mesh(mesh, 4)
    paths = partition_to_files(mesh, 4, str(tmp_path / "dom"))
    dms = [distio.read_dist(p) for p in paths]
    # every ghost node imported exactly once, with a matching export on
    # the owner side (hecmw_update semantics)
    for r, dm in enumerate(dms):
        n_ghost = dm.n_node - dm.nn_internal
        assert int(dm.import_index[-1]) == n_ghost
        for k, nb in enumerate(np.asarray(dm.neighbor_pe)):
            imp = dm.import_item[dm.import_index[k]:dm.import_index[k+1]]
            exp_nb = dms[nb]
            kk = list(np.asarray(exp_nb.neighbor_pe)).index(r)
            exp = exp_nb.export_item[
                exp_nb.export_index[kk]:exp_nb.export_index[kk+1]]
            # same GLOBAL nodes in the same order
            gi = dm.global_node_ID[np.asarray(imp) - 1]
            ge = exp_nb.global_node_ID[np.asarray(exp) - 1]
            np.testing.assert_array_equal(gi, ge)


def test_dist_end_to_end_run(tmp_path):
    """Single-domain dist file drives the full CLI path and matches the
    direct in-memory run."""
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    from frontistr_tpu.run import run_directory

    mesh = box_tet4(3, 3, 3)
    paths = partition_to_files(mesh, 1, str(tmp_path / "mesh.dist"))
    cnt = ("!VERSION\n 3\n!SOLUTION, TYPE=STATIC\n"
           "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
           "!SOLVER, METHOD=CG\n 4000, 1\n 1.0e-10, 1.0, 0.0\n!END\n")
    (tmp_path / "run.cnt").write_text(cnt)
    (tmp_path / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-DIST\n mesh.dist\n"
        "!CONTROL, NAME=fstrCNT\n run.cnt\n")
    out = run_directory(str(tmp_path))
    u_dist = np.asarray(out["static"].u)

    cfg = read_cnt(str(tmp_path / "run.cnt"))
    model = build_struct_model(mesh, cfg)
    res = run_linear_static(model)
    # node order may differ (internal-first); compare via global ids
    ids_d = out["mesh"].node_ids
    ids_m = mesh.node_ids
    order = {int(g): i for i, g in enumerate(ids_m)}
    perm = np.asarray([order[int(g)] for g in ids_d])
    np.testing.assert_allclose(u_dist, np.asarray(res.u)[perm],
                               rtol=1e-8, atol=1e-12)
