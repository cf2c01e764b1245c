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


def test_pvr_volume_render(tmp_path):
    """PVR: a hot-centered spherical field renders with warm colors in
    the image center and background at the edges."""
    import numpy as np
    from frontistr_tpu.meshgen import box_hex8
    from frontistr_tpu.vis.pvr import render_pvr

    mesh = box_hex8(6, 6, 6)
    c = mesh.coords - 0.5
    vals = np.exp(-8.0 * (c ** 2).sum(axis=1))   # hot center
    out = str(tmp_path / "vol.bmp")
    p = render_pvr(mesh.coords, vals, out, width=120, height=120,
                   res=48, n_steps=96)
    assert p == out and os.path.exists(out)
    # decode BMP: 54-byte header, rows bottom-up, BGR
    raw = open(out, "rb").read()
    assert raw[:2] == b"BM"
    import struct
    w = struct.unpack("<i", raw[18:22])[0]
    h = struct.unpack("<i", raw[22:26])[0]
    assert (w, h) == (120, 120)
    row = (w * 3 + 3) // 4 * 4
    img = np.zeros((h, w, 3), np.uint8)
    off = struct.unpack("<I", raw[10:14])[0]
    for y in range(h):
        r = raw[off + y * row: off + y * row + w * 3]
        img[h - 1 - y] = np.frombuffer(r, np.uint8).reshape(w, 3)[:, ::-1]
    center = img[50:70, 50:70].astype(float)
    corner = img[:10, :10].astype(float)
    # center shows the volume (not the white background)
    assert center.mean() < 250.0
    assert corner.mean() > 250.0                  # background
    # center is warmer (red channel dominates blue) than the rim
    assert center[..., 0].mean() >= center[..., 2].mean() - 5.0
