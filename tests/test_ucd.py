"""AVS UCD (.inp) output: writer format, visualizer AVS mode, and the
partitioner's --check-mesh dump (hecmw_ucd_print.c re-creation)."""

import os

import numpy as np


def _run_deck(tmp_path, extra_cnt=""):
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.analysis.static import run_linear_static
    import tempfile
    mesh = box_hex8(2, 2, 2)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write("!VERSION\n 3\n!SOLUTION, TYPE=STATIC\n"
                "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
                f"{extra_cnt}"
                "!SOLVER, METHOD=CG\n 10000, 1\n 1.0e-10, 1.0, 0.0\n"
                "!END\n")
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    model = build_struct_model(mesh, cfg)
    return mesh, model, cfg, run_linear_static(model)


def test_ucd_writer_format(tmp_path):
    """Header, %.7E coords, hex corner permutation (ucd2hec_hex1 =
    [4,5,6,7,0,1,2,3]), and the data part layout."""
    from frontistr_tpu.io.ucd import write_ucd
    mesh, model, cfg, res = _run_deck(tmp_path)
    p = str(tmp_path / "out.inp")
    write_ucd(mesh, p, node_data=[("DISPLACEMENT", res.u[:, :3])],
              elem_data=[("RANK", np.zeros(8))])
    lines = open(p).read().splitlines()
    assert lines[0].startswith("#")
    assert lines[2] == "1" and lines[3] == "data" and lines[4] == "step1"
    nn, ne = (int(v) for v in lines[5].split())
    assert (nn, ne) == (mesh.n_node, 8)
    # node line: "1 X Y Z" in %.7E
    f = lines[6].split()
    assert f[0] == "1" and "E" in f[1]
    # first element line: "1 0 hex" + UCD corner order
    el = lines[6 + nn].split()
    assert el[:3] == ["1", "0", "hex"]
    hec = mesh.blocks[0].conn[0] + 1
    ucd = [hec[j] for j in (4, 5, 6, 7, 0, 1, 2, 3)]
    assert [int(v) for v in el[3:]] == ucd
    # node-data part: "1 3" header, label line, then per-node rows
    k = 6 + nn + ne
    assert lines[k].split() == ["1", "3"]
    assert lines[k + 1].startswith("DISPLACEMENT")
    row = lines[k + 2].split()
    assert row[0] == "1" and len(row) == 4
    # element-data part follows
    k2 = k + 2 + nn
    assert lines[k2].split() == ["1", "1"]
    assert lines[k2 + 1].startswith("RANK")


def test_ucd_legacy_header(tmp_path):
    from frontistr_tpu.io.ucd import write_ucd
    mesh, model, cfg, res = _run_deck(tmp_path)
    p = str(tmp_path / "leg.inp")
    write_ucd(mesh, p, node_data=[("U", res.u[:, :3])], legacy=True)
    first = open(p).readline().split()
    assert first == [str(mesh.n_node), "8", "3", "0", "0"]


def test_visualizer_avs_output(tmp_path):
    """output_type = COMPLETE_REORDER_AVS routes !WRITE,VISUAL to the
    UCD writer (hecmw_vis_surface_main.c AVS modes)."""
    from frontistr_tpu.vis.psf import visualize
    mesh, model, cfg, res = _run_deck(
        tmp_path, extra_cnt="!WRITE,VISUAL\n!VISUAL, METHOD=PSR\n"
                            "!output_type = COMPLETE_REORDER_AVS\n")
    out = visualize(mesh, model, res, str(tmp_path), cfg)
    assert out.endswith(".inp") and os.path.exists(out)
    txt = open(out).read()
    assert "DISPLACEMENT" in txt and "MISES" in txt


def test_part_check_mesh(tmp_path):
    """fistr-tpu-part --check-mesh writes a rank-colored UCD of the
    entire model; every element carries its owner rank."""
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.io.neu import write_fstr_msh
    from frontistr_tpu.tools.cli import part_main
    mesh = box_hex8(2, 2, 4)
    mp = str(tmp_path / "box.msh")
    write_fstr_msh(mesh, mp)
    out = str(tmp_path / "part")
    rc = part_main([mp, "-n", "2", "-o", out, "--check-mesh"])
    assert rc == 0
    cp = out + ".check.inp"
    assert os.path.exists(cp)
    lines = open(cp).read().splitlines()
    # element-data section exists and both ranks appear
    txt = "\n".join(lines)
    assert "ELEM_RANK" in txt and "NODE_RANK" in txt
    vals = []
    take = False
    for ln in lines:
        if ln.startswith("ELEM_RANK"):
            take = True
            continue
        if take and ln and ln[0].isdigit():
            vals.append(float(ln.split()[1]))
    assert set(vals) == {0.0, 1.0}
