"""External two-code coupling (REVOCAP-analog file protocol,
fstr_rcap_io.F90 surface): a mock 'fluid' peer publishes interface
traction per step; the solid run fetches it before each Newmark step
(dynamic_mat_ass_couple load insertion) and publishes interface
displacement/velocity/acceleration after (fstr_rcap_send)."""

import os
import tempfile
import threading

import numpy as np

from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model
from frontistr_tpu.analysis.dynamic import run_dynamic
from frontistr_tpu.couple.rcap import (FileCoupler, CoupleDriver,
                                       couple_traction_force)


CNT = """!VERSION
 3
!SOLUTION, TYPE=DYNAMIC
!DYNAMIC
 1, 1
 0.0, {T}, {N}, {DT}
 0.5, 0.25
 1, 1, 0.0, 0.0
 10
!BOUNDARY, GRPID=1
 X0, 1, 3, 0.0
!COUPLE, TYPE=1
 WET
!STEP, SUBSTEPS=1, CONVERG=1.0e-8
 BOUNDARY, 1
!MATERIAL, NAME=M1
!ELASTIC
 1000.0, 0.0
!DENSITY
 1.0
!SOLVER,METHOD=CG,PRECOND=1
 10000, 1
 1.0e-12, 1.0, 0.0
!END
"""


def _wet_mesh():
    """Unit cube; the +x face (face 4 of the single hex? use surface
    group from the two x=1 faces) is the wetted coupling surface."""
    m = box_hex8(1, 1, 1)
    # hex 361 face 4 per FACE_TABLES is nodes [5,6,2,1] — find the face
    # whose nodes all sit at x=1 instead of hard-coding
    from frontistr_tpu.assembly.loads import FACE_TABLES
    conn = m.blocks[0].conn[0]
    face_no = None
    for fi, (ft, ln) in enumerate(FACE_TABLES[361], start=1):
        if np.allclose(m.coords[conn[np.asarray(ln)]][:, 0], 1.0):
            face_no = fi
            break
    assert face_no is not None
    m.surf_groups = {"WET": np.asarray([[1, face_no]])}
    return m


def test_external_couple_roundtrip():
    mesh = _wet_mesh()
    n_step, dt = 4, 0.01
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(CNT.format(T=n_step * dt, N=n_step, DT=dt))
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    model = build_struct_model(mesh, cfg)

    with tempfile.TemporaryDirectory() as d:
        solid_ep = FileCoupler(d, role="solid", peer="fluid", timeout=60)
        fluid_ep = FileCoupler(d, role="fluid", peer="solid", timeout=60)
        px = 3.0                      # constant traction +x on the face

        def fluid():
            iface = fluid_ep.peer_interface()      # solid's handshake
            ids = iface["node_ids"]
            tr = np.zeros((len(ids), 3))
            tr[:, 0] = px
            for i in range(1, n_step + 1):
                fluid_ep.send(i, node_ids=ids, trac=tr)
                got = fluid_ep.get(i)              # solid's state
                assert "disp" in got and "velo" in got

        coupler = CoupleDriver(model, mesh, cfg.couple, solid_ep)
        th = threading.Thread(target=fluid)
        th.start()
        out = run_dynamic(model, coupler=coupler)
        th.join(timeout=60)
        assert not th.is_alive()

    assert np.isfinite(out.u).all()
    # the traction pushed the free cube face in +x: displacement grows
    ux = out.u[:, 0]
    assert ux.max() > 0, ux
    # the published files carried the actual interface displacement
    # (checked inside the fluid thread); final force balance sanity:
    # total applied force = px * area(1.0) = 3.0 split over 4 face nodes
    trac = {int(k): np.array([px, 0.0, 0.0])
            for k in coupler.nodes}
    fvec = couple_traction_force(model, mesh, cfg.couple, trac)
    assert np.isclose(fvec.reshape(-1, 3)[:, 0].sum(), px * 1.0)
    nonzero = np.nonzero(fvec.reshape(-1, 3)[:, 0])[0]
    assert sorted(nonzero) == sorted(coupler.nodes)
