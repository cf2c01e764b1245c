"""End-to-end partitioned workflow (the reference's signature loop:
hecmw_part1 -> per-rank fstr -> fstr_rmerge, hecmw_partition.c:2140-2165
/ fstr_rmerge.c:242): partition an exA golden mesh 4-way from the CLI,
run the DIST workdir (all ranks reassembled), check the 0.log against
the unpartitioned *_correct.log, and rmerge the per-rank result files
back into the entire-model result."""
import os
import shutil

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE

EXA = os.path.join(REFERENCE, "examples", "static", "exA")


def _golden_summary(path):
    out = {}
    with open(path) as f:
        lines = f.readlines()
    for i, ln in enumerate(lines):
        if "Global Summary" in ln:
            for lj in lines[i + 1:]:
                t = lj.split()
                if not t or not t[0].startswith("//"):
                    break
                out[t[0][2:]] = (float(t[1]), float(t[2]))
    return out


@requires_reference
def test_exa_partitioned_4way_matches_golden(tmp_path):
    from frontistr_tpu.tools import cli
    from frontistr_tpu.run import run_directory
    from frontistr_tpu.io.resfile import read_result

    msh = os.path.join(EXA, "A341.msh")
    base = str(tmp_path / "A341.dist")
    assert cli.part_main([msh, "-n", "4", "-o", base]) == 0
    for r in range(4):
        assert os.path.exists(f"{base}.{r}")

    shutil.copy(os.path.join(EXA, "A300.cnt"), tmp_path / "A300.cnt")
    (tmp_path / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-DIST\n A341.dist\n"
        "!CONTROL, NAME=fstrCNT\n A300.cnt\n"
        "!RESULT, NAME=fstrRES, IO=OUT\n A341.res\n")
    out = run_directory(str(tmp_path))
    assert out["partition"] is not None
    assert out["partition"]["n_ranks"] == 4

    # whole-model log matches the reference golden (1e-4 abs, the
    # reference harness threshold)
    got = _golden_summary(str(tmp_path / "0.log"))
    ref = _golden_summary(os.path.join(EXA, "A341_correct.log"))
    assert got and ref
    for k, (gmax, gmin) in ref.items():
        assert abs(got[k][0] - gmax) < 1e-4, (k, got[k], (gmax, gmin))
        assert abs(got[k][1] - gmin) < 1e-4, (k, got[k], (gmax, gmin))

    # per-rank result files tile the model exactly once, and rmerge
    # reassembles the entire-model result
    parts = [str(tmp_path / f"A341.res.{r}.1") for r in range(4)]
    for p in parts:
        assert os.path.exists(p), p
    merged = str(tmp_path / "A341.merged")
    assert cli.rmerge_main(parts + ["-o", merged]) == 0
    m = read_result(merged)
    mesh = out["mesh"]
    assert sorted(m["node_ids"]) == sorted(int(g) for g in mesh.node_ids)
    assert sorted(m["elem_ids"]) == sorted(
        int(e) for e in np.concatenate(
            [b.elem_ids for b in mesh.blocks]))
    # merged displacement equals the in-memory whole-model solution
    names = [n for n, _ in m["node_comps"]]
    U = np.asarray(m["node_comps"][names.index("DISPLACEMENT")][1])
    order = {int(g): i for i, g in enumerate(mesh.node_ids)}
    perm = np.asarray([order[int(g)] for g in m["node_ids"]])
    np.testing.assert_allclose(
        U, np.asarray(out["static"].u)[perm], rtol=1e-8, atol=1e-12)


def test_kmetis_spectral_partition_quality():
    """KMETIS (spectral K-way) balances parts and cuts no more edges
    than naive BLOCK; on a bent/elongated mesh it should track the
    geometry at least as well as RCB."""
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.parallel.partition import (partition_mesh,
                                                  edge_cut)
    mesh = box_hex8(24, 4, 4, lx=24.0, ly=1.0, lz=1.0)
    parts = {}
    for m in ("RCB", "BLOCK", "KMETIS"):
        part, subs = partition_mesh(mesh, 4, method=m)
        sizes = np.bincount(part, minlength=4)
        assert sizes.sum() == mesh.n_node
        assert sizes.max() <= 1.3 * sizes.min(), (m, sizes)
        parts[m] = edge_cut(mesh, part)
    # a long bar: every sane method cuts ~3 cross sections; spectral
    # must be in the same class as RCB (and not worse than BLOCK)
    assert parts["KMETIS"] <= parts["BLOCK"]
    assert parts["KMETIS"] <= 1.5 * parts["RCB"], parts


@requires_reference
def test_exa_partitioned_sharded_matches_golden(tmp_path, monkeypatch):
    """Partitioned workdir under GSPMD sharding: the partition drives
    the shard layout (nodes ordered by rank, contiguous shard splits on
    partition boundaries) and the whole-model log still matches the
    golden."""
    from frontistr_tpu.tools import cli
    from frontistr_tpu.run import run_directory

    msh = os.path.join(EXA, "A341.msh")
    base = str(tmp_path / "A341.dist")
    assert cli.part_main([msh, "-n", "4", "-m", "KMETIS",
                          "-o", base]) == 0
    shutil.copy(os.path.join(EXA, "A300.cnt"), tmp_path / "A300.cnt")
    (tmp_path / "hecmw_ctrl.dat").write_text(
        "!MESH, NAME=fstrMSH, TYPE=HECMW-DIST\n A341.dist\n"
        "!CONTROL, NAME=fstrCNT\n A300.cnt\n"
        "!RESULT, NAME=fstrRES, IO=OUT\n A341.res\n")
    monkeypatch.setenv("FRONTISTR_TPU_SHARDS", "4")
    out = run_directory(str(tmp_path))
    got = _golden_summary(str(tmp_path / "0.log"))
    ref = _golden_summary(os.path.join(EXA, "A341_correct.log"))
    for k, (gmax, gmin) in ref.items():
        assert abs(got[k][0] - gmax) < 1e-4, (k, got[k])
        assert abs(got[k][1] - gmin) < 1e-4, (k, got[k])
    # the ordering is partition-grouped: node_rank is non-decreasing
    # in mesh order
    pi = out["partition"]
    nr = np.asarray([pi["node_rank"][int(g)]
                     for g in out["mesh"].node_ids])
    assert (np.diff(nr) >= 0).all()
