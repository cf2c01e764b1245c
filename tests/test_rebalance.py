"""Dynamic load balancing (hecmw_dlb analogue, parallel/rebalance.py):
reassemble a partitioned DIST workdir, refine marked elements, and
re-partition it balanced in place — the reference's adaptation+DLB
pipeline (hecmw_dynamic_load_balancing.c -> ParMETIS AdaptiveRepartKway,
hecmw_dlb_mesh2graph.c:378-430) at the file level."""
import os

import numpy as np

from frontistr_tpu.meshgen import box_tet4
from frontistr_tpu.parallel.partition import partition_to_files
from frontistr_tpu.parallel.rebalance import (imbalance,
                                              rebalance_workdir,
                                              workdir_ranks)

CNT = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 X0, 1, 3, 0.0
!CLOAD
 X1, 3, -1.0
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.3
!SOLVER, METHOD=CG, ITERLOG=NO, TIMELOG=NO
 5000, 1
 1.0e-10, 1.0, 0.0
!END
"""


def _corner_marks(mesh, frac=1.0 / 3.0):
    """Global ids of elements whose centroid sits in one corner —
    concentrated refinement, the load-imbalance trigger for DLB."""
    lim = mesh.coords.max(axis=0) * frac
    eids = []
    for b in mesh.blocks:
        cent = mesh.coords[b.conn].mean(axis=1)
        hit = (cent < lim).all(axis=1)
        eids.extend(int(e) for e in b.elem_ids[hit])
    return eids


def _make_workdir(tmp_path, n_parts=4):
    mesh = box_tet4(6, 6, 6)
    base = str(tmp_path / "box.dist")
    partition_to_files(mesh, n_parts, base)
    (tmp_path / "box.cnt").write_text(CNT)
    (tmp_path / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-DIST\n box.dist\n"
        "!CONTROL, NAME=fstrCNT\n box.cnt\n"
        "!RESULT, NAME=fstrRES, IO=OUT\n box.res\n")
    return mesh, base


def test_rebalance_adapts_and_balances(tmp_path):
    mesh, base = _make_workdir(tmp_path)
    marked = _corner_marks(mesh)
    assert len(marked) > 10
    stats = rebalance_workdir(base, marked_eids=marked, verbose=True)
    assert stats["n_ranks"] == 4
    assert stats["n_elem_after"] > stats["n_elem_before"]
    # DLB contract: the fresh partition is balanced despite the
    # corner-concentrated refinement (ParMETIS default ubvec is 1.05;
    # RCB splits node counts exactly, element counts follow closely)
    assert stats["imb_after"] <= 1.35, stats
    assert sum(stats["after"]) == stats["n_elem_after"]

    # the rewritten workdir reassembles to EXACTLY the adapted model
    from frontistr_tpu import adapt
    from frontistr_tpu.io.distio import mesh_from_dist_ranks, read_dist
    ref = adapt.adapt_mesh(mesh, marked)
    got, _ = mesh_from_dist_ranks(
        [read_dist(p) for p in workdir_ranks(base)])
    assert got.n_node == ref.n_node
    assert got.n_elem == ref.n_elem

    def conn_sets(m):
        rows = set()
        for b in m.blocks:
            gn = m.node_ids[b.conn]
            for eid, row in zip(b.elem_ids, gn):
                rows.add((int(eid), tuple(int(v) for v in row)))
        return rows

    assert conn_sets(got) == conn_sets(ref)


def test_rebalanced_workdir_runs_and_matches_whole_model(tmp_path):
    """Physics equality: the rebalanced (adapted, 4-rank) workdir run
    end-to-end equals the same adapted model run as a single rank."""
    from frontistr_tpu.run import run_directory

    mesh, base = _make_workdir(tmp_path)
    marked = _corner_marks(mesh)[:8]       # cheap: few marks + closure
    rebalance_workdir(base, marked_eids=marked)
    out4 = run_directory(str(tmp_path))
    assert out4["partition"]["n_ranks"] == 4

    one = tmp_path / "one"
    one.mkdir()
    from frontistr_tpu import adapt
    adapted = adapt.adapt_mesh(mesh, marked)
    partition_to_files(adapted, 1, str(one / "box.dist"))
    os.rename(str(one / "box.dist.0"), str(one / "box.dist"))
    (one / "box.cnt").write_text(CNT)
    (one / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-DIST\n box.dist\n"
        "!CONTROL, NAME=fstrCNT\n box.cnt\n"
        "!RESULT, NAME=fstrRES, IO=OUT\n box.res\n")
    out1 = run_directory(str(one))

    u4 = np.asarray(out4["static"].u).reshape(-1, 3)
    u1 = np.asarray(out1["static"].u).reshape(-1, 3)
    m4, m1 = out4["mesh"], out1["mesh"]
    order = {int(g): i for i, g in enumerate(m1.node_ids)}
    perm = np.asarray([order[int(g)] for g in m4.node_ids])
    np.testing.assert_allclose(u4, u1[perm], rtol=1e-7,
                               atol=1e-10 * np.abs(u1).max())


def test_rebalance_changes_rank_count(tmp_path):
    _, base = _make_workdir(tmp_path, n_parts=4)
    stats = rebalance_workdir(base, n_parts=2)
    assert stats["n_ranks"] == 2
    assert os.path.exists(f"{base}.0") and os.path.exists(f"{base}.1")
    assert not os.path.exists(f"{base}.2")
    assert imbalance(np.asarray(stats["after"])) <= 1.2
    assert stats["n_elem_after"] == stats["n_elem_before"]
