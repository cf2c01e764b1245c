"""Pallas segment-sum assembly vs the XLA scatter path.

The MXU one-hot-matmul kernel (assembly/segsum_pallas.py) replaces
XLA's scatter-based segment_sum in ELL/cluster assembly on TPU
(FRONTISTR_TPU_PALLAS_ASM).  Off-TPU it runs in interpret mode, which
these tests use to pin down numerics and the chunk/pad/slot mappings.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from frontistr_tpu.assembly import ell, bell
from frontistr_tpu.assembly.segsum_pallas import make_segsum, build_chunks


def test_segsum_random_matches_numpy():
    rng = np.random.default_rng(0)
    P, S = 20000, 3000
    seg = np.sort(rng.integers(0, S, P)).astype(np.int32)
    ent = rng.standard_normal((P, 9)).astype(np.float32)
    run, aux = make_segsum(seg, S, c_ent=512)
    vp = 16
    ent_pad = np.zeros((P + 1, vp), np.float32)
    ent_pad[:P, :9] = ent
    fm = np.asarray(aux["ent_map"])
    entT = jnp.asarray(ent_pad[np.where(fm < P, fm, P)].T.copy())
    out = np.asarray(run(entT, aux["seg_pad"], aux["slot_src"]))
    ref = np.zeros((S, 9), np.float32)
    np.add.at(ref, seg, ent)
    assert np.abs(out[:9].T - ref).max() < 1e-4 * np.abs(ref).max()


def test_empty_slots_read_zero():
    # slots with no entries (padded ELL columns) must come back 0, not
    # alias chunk 0's first window row
    seg = np.asarray([0, 0, 5, 5, 5], np.int32)   # slots 1-4,6+ empty
    ent = np.ones((5, 9), np.float32)
    run, aux = make_segsum(seg, 10, c_ent=512)
    ent_pad = np.zeros((6, 16), np.float32)
    ent_pad[:5] = np.pad(ent, ((0, 0), (0, 7)))
    fm = np.asarray(aux["ent_map"])
    entT = jnp.asarray(ent_pad[np.where(fm < 5, fm, 5)].T.copy())
    out = np.asarray(run(entT, aux["seg_pad"], aux["slot_src"]))[:9].T
    assert np.allclose(out[0], 2.0) and np.allclose(out[5], 3.0)
    for s in (1, 2, 3, 4, 6, 7, 8, 9):
        assert np.allclose(out[s], 0.0), s


def test_long_segment_chunking():
    # one segment longer than c_ent forces a mid-stream oversized chunk
    rng = np.random.default_rng(1)
    seg = np.sort(np.r_[np.zeros(50, np.int64), np.full(700, 3),
                        rng.integers(4, 40, 400)]).astype(np.int32)
    ent = rng.standard_normal((len(seg), 9)).astype(np.float32)
    run, aux = make_segsum(seg, 40, c_ent=256)
    P = len(seg)
    ent_pad = np.zeros((P + 1, 16), np.float32)
    ent_pad[:P, :9] = ent
    fm = np.asarray(aux["ent_map"])
    entT = jnp.asarray(ent_pad[np.where(fm < P, fm, P)].T.copy())
    out = np.asarray(run(entT, aux["seg_pad"], aux["slot_src"]))[:9].T
    ref = np.zeros((40, 9), np.float32)
    np.add.at(ref, seg, ent)
    assert np.abs(out - ref).max() < 1e-4 * np.abs(ref).max()


def _tiny_tet_model():
    from frontistr_tpu.meshgen import box_tet4
    return box_tet4(3, 3, 3)


def test_ell_assembly_pallas_matches_xla(monkeypatch):
    monkeypatch.setenv("FRONTISTR_TPU_PALLAS_ASM", "force")
    mesh = _tiny_tet_model()
    conn = mesh.blocks[0].conn
    prof = ell.build_profile([conn], mesh.n_node, 3)
    rng = np.random.default_rng(2)
    E = conn.shape[0]
    kes = jnp.asarray(rng.standard_normal((E, 12, 12)), jnp.float32)
    want = np.asarray(ell._assemble_jit(prof.device(), (kes,), (4,)))
    got = np.asarray(prof.pallas_assemble((4,))((kes,)))
    assert np.abs(got - want).max() < 1e-4 * np.abs(want).max()


def test_cluster_assembly_pallas_matches_xla(monkeypatch):
    monkeypatch.setenv("FRONTISTR_TPU_PALLAS_ASM", "force")
    mesh = _tiny_tet_model()
    conn = mesh.blocks[0].conn
    prof = bell.build_cluster_profile([conn], mesh.n_node, 3)
    rng = np.random.default_rng(3)
    E = conn.shape[0]
    kes = jnp.asarray(rng.standard_normal((E, 12, 12)), jnp.float32)
    want_b, want_r = bell._assemble_jit(prof.device(), (kes,), (4,))
    got_b, got_r = prof.pallas_assemble((4,))((kes,))
    scale = max(float(jnp.abs(p).max()) for p in want_r)
    assert len(got_r) == len(want_r) == 9
    for gp, wp in zip(got_r, want_r):
        assert float(jnp.abs(gp - wp).max()) < 1e-4 * scale
    assert float(jnp.abs(got_b - want_b).max()) < 1e-4 * scale


def test_chunk_builder_covers_all_slots():
    rng = np.random.default_rng(4)
    seg = np.sort(rng.integers(0, 500, 5000)).astype(np.int32)
    cuts, s_lo, R, cmax, slot_src = build_chunks(seg, 600, c_ent=256)
    assert cuts[0] == 0 and cuts[-1] == len(seg)
    # chunks cut only at segment boundaries
    for c in cuts[1:-1]:
        assert seg[c] != seg[c - 1]
    # every populated slot maps inside its chunk's window
    nc = len(s_lo)
    for k in range(nc):
        hi = seg[cuts[k + 1] - 1]
        assert hi - s_lo[k] < R
    assert slot_src.shape == (600,)


def test_chunk_group_split_matches_single_group(monkeypatch):
    """The 32-bit-addressing chunk-group split (GROUP_BYTES slices of
    the kernel input, outputs concatenated) must be bit-identical to the
    single-launch result — forced here by shrinking GROUP_BYTES so a
    tiny model needs several pallas_call groups."""
    from frontistr_tpu.assembly import segsum_pallas as sp
    monkeypatch.setenv("FRONTISTR_TPU_PALLAS_ASM", "force")
    mesh = _tiny_tet_model()
    conn = mesh.blocks[0].conn
    prof = bell.build_cluster_profile([conn], mesh.n_node, 3)
    rng = np.random.default_rng(5)
    E = conn.shape[0]
    kes = jnp.asarray(rng.standard_normal((E, 12, 12)), jnp.float32)
    want_b, want_r = prof.pallas_assemble((4,))((kes,))

    monkeypatch.setattr(sp, "GROUP_BYTES", 16 * 1024)   # force ~many groups
    prof2 = bell.build_cluster_profile([conn], mesh.n_node, 3)
    got_b, got_r = prof2.pallas_assemble((4,))((kes,))
    for gp, wp in zip(got_r, want_r):
        assert np.array_equal(np.asarray(gp), np.asarray(wp))
    assert np.array_equal(np.asarray(got_b), np.asarray(want_b))
