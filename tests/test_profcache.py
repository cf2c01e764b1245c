"""Persistent symbolic-profile cache: a second process-equivalent build
loads the identical ELL/cluster profiles from disk (the 60 s 1M-dof host
setup must not be repaid per CLI invocation)."""

import os
import tempfile

import numpy as np
import pytest

from frontistr_tpu.meshgen import box_tet4
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.assembly.model import build_struct_model
from frontistr_tpu.assembly import ell, bell


CNT = """!VERSION
 3
!SOLUTION, TYPE=STATIC
!BOUNDARY
 X0, 1, 3, 0.0
!CLOAD
 X1, 3, -1.0
!MATERIAL, NAME=M1
!ELASTIC
 210000., 0.3
!SOLVER,METHOD=CG
 2000, 1
 1.0e-10, 1.0, 0.0
!END
"""


def _model():
    mesh = box_tet4(4, 4, 4)
    with tempfile.NamedTemporaryFile("w", suffix=".cnt",
                                     delete=False) as f:
        f.write(CNT)
        p = f.name
    cfg = read_cnt(p)
    os.unlink(p)
    return build_struct_model(mesh, cfg)


def test_profile_disk_roundtrip(monkeypatch, tmp_path):
    monkeypatch.setenv("FRONTISTR_TPU_CACHE_DIR", str(tmp_path))
    model = _model()
    ell._PROFILE_CACHE.clear()
    bell._CPROFILE_CACHE.clear()
    p0 = ell.profile_from_model(model)
    c0 = bell.cluster_profile_from_model(model)
    files = os.listdir(tmp_path)
    assert len([f for f in files if f.endswith(".npz")]) == 2, files
    # cold in-memory cache -> loads from disk, bit-identical maps
    ell._PROFILE_CACHE.clear()
    bell._CPROFILE_CACHE.clear()
    p1 = ell.profile_from_model(model)
    c1 = bell.cluster_profile_from_model(model)
    for a, b in ((p0.cols, p1.cols), (p0.perm, p1.perm),
                 (p0.seg_sorted, p1.seg_sorted),
                 (p0.diag_slot, p1.diag_slot)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (p0.W, p0.pair_counts) == (p1.W, p1.pair_counts)
    for a, b in ((c0.ccols, c1.ccols), (c0.perm, c1.perm),
                 (c0.seg_sorted, c1.seg_sorted),
                 (c0.scal_src, c1.scal_src), (c0.diag_wc, c1.diag_wc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (c0.G, c0.C, c0.Wc) == (c1.G, c1.C, c1.Wc)


def test_profile_cache_key_discriminates(monkeypatch, tmp_path):
    """Different connectivity must never hit the same entry."""
    from frontistr_tpu.assembly import profcache
    monkeypatch.setenv("FRONTISTR_TPU_CACHE_DIR", str(tmp_path))
    c1 = [np.asarray([[0, 1, 2, 3]])]
    c2 = [np.asarray([[0, 1, 2, 4]])]
    k1 = profcache.conn_key(c1, 5, 3, tag="ell")
    k2 = profcache.conn_key(c2, 5, 3, tag="ell")
    k3 = profcache.conn_key(c1, 5, 3, tag="bell")
    assert len({k1, k2, k3}) == 3


def test_profile_cache_disabled(monkeypatch, tmp_path):
    monkeypatch.setenv("FRONTISTR_TPU_CACHE_DIR", "0")
    model = _model()
    ell._PROFILE_CACHE.clear()
    ell.profile_from_model(model)
    assert not os.listdir(tmp_path)


def test_profile_cache_corrupt_entry_rebuilds(monkeypatch, tmp_path):
    from frontistr_tpu.assembly import profcache
    monkeypatch.setenv("FRONTISTR_TPU_CACHE_DIR", str(tmp_path))
    model = _model()
    ell._PROFILE_CACHE.clear()
    p0 = ell.profile_from_model(model)
    (entry,) = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    with open(tmp_path / entry, "wb") as fh:
        fh.write(b"garbage")
    ell._PROFILE_CACHE.clear()
    p1 = ell.profile_from_model(model)
    np.testing.assert_array_equal(np.asarray(p0.cols),
                                  np.asarray(p1.cols))
