"""PSF surface visualizer: surface extraction + BMP rendering."""

import os
import struct
import tempfile

import numpy as np


def test_extract_surface_box():
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.vis.psf import extract_surface
    mesh = box_hex8(2, 2, 2)
    tris = extract_surface(mesh)
    # 6 faces x 4 quads x 2 tris
    assert tris.shape == (48, 3)
    # all boundary nodes, none interior: the center node (idx of (1,1,1))
    interior = [i for i, c in enumerate(mesh.coords)
                if np.allclose(c, [0.5, 0.5, 0.5])]
    assert interior and interior[0] not in tris


def test_render_writes_valid_bmp():
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.vis.psf import extract_surface, render_surface
    mesh = box_hex8(2, 2, 2)
    tris = extract_surface(mesh)
    vals = mesh.coords[:, 0]
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "t.bmp")
        render_surface(mesh.coords, tris, vals, out, width=120, height=90)
        blob = open(out, "rb").read()
    assert blob[:2] == b"BM"
    w, h = struct.unpack("<ii", blob[18:26])
    assert (w, h) == (120, 90)
    row = w * 3 + (4 - (w * 3) % 4) % 4
    img = np.frombuffer(blob[54:], np.uint8)[:row * h].reshape(h, row)
    img = img[:, :w * 3].reshape(h, w, 3)
    # a box fills a good chunk of the frame and is colored
    nonwhite = (img != 255).any(-1).mean()
    assert nonwhite > 0.2
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 10
