"""Preconditioner robustness on decks that stress aggregation AMG, plus
the multicolor block-SSOR fallback family (VERDICT r04 items 4/6).

Decks: (a) aspect-100 thin box (shell-like hexes), (b) near-incompressible
nu=0.499, (c) 1e3 modulus jump.  Each pins CG iteration counts for BOTH
families so a regression in preconditioner quality fails loudly.
Reference quality bar: the SSOR-preconditioned reference converges these
classes in O(100) iterations (hecmw_solver_CG.f90 + SSOR_33)."""
import numpy as np
import jax.numpy as jnp
import pytest

from frontistr_tpu.assembly import ell
from frontistr_tpu.elements.tables import get_table
from frontistr_tpu.fem import solid
from frontistr_tpu.fem.material import elastic_D, D3
from frontistr_tpu.meshgen import box_hex8
from frontistr_tpu.solver import amg, ssor
from frontistr_tpu.solver.cg import pcg


def _operator(nx, ny, nz, scale=(1.0, 1.0, 1.0), nu=0.3,
              e_field=None):
    mesh = box_hex8(nx, ny, nz)
    coords = mesh.coords * np.asarray(scale)
    conn = mesh.blocks[0].conn
    n_node = mesh.n_node
    table = get_table(361)
    E = conn.shape[0]
    if e_field is None:
        Ee = np.full(E, 210e3)
    else:
        Ee = e_field(coords[conn].mean(axis=1))
    D = np.stack([np.asarray(elastic_D(e, nu, D3)) for e in
                  (210e3,)]).repeat(E, axis=0)
    D = D * (Ee / 210e3)[:, None, None]
    ke = solid.stiffness_linear(table, jnp.asarray(coords[conn]),
                                jnp.asarray(D))
    prof = ell.build_profile([conn], n_node, 3)
    blocks = ell.assemble_blocks(prof, [ke], [8])
    fixed = (mesh.node_groups["X0"][:, None] * 3 +
             np.arange(3)).reshape(-1)
    free = np.ones(n_node * 3)
    free[fixed] = 0.0
    eop = ell.ELLOperator(blocks=blocks, cols=jnp.asarray(prof.cols),
                          diag_slot=jnp.asarray(prof.diag_slot),
                          n_node=n_node, ndof=3,
                          free_mask=jnp.asarray(free))
    f = np.zeros(n_node * 3)
    f[mesh.node_groups["X1"] * 3 + 2] = -1.0
    return mesh, prof, eop, jnp.asarray(f * free), coords


def _amg_M(mesh, prof, eop, coords):
    maps = amg.build_maps(prof.cols, eop.n_node, 3, S0=24, S1=16)
    return amg.setup_amg(maps, eop.blocks, eop.cols,
                         jnp.asarray(coords), eop.free_mask,
                         eop.apply_constrained, eop.block_jacobi())


def _ssor_M(prof, eop):
    maps = ssor.build_color_maps(np.asarray(prof.cols), eop.n_node)
    return ssor.setup_ssor(maps.device(), eop.blocks, eop.cols,
                           eop.diag_blocks(), eop.free_mask, 3)


DECKS = {
    # name: (mesh args, amg iter cap, ssor iter cap) — caps are the
    # 2026-08 CPU-measured counts (875/2139, 190/487, 54/101) +~25%
    "aspect100": (dict(nx=12, ny=12, nz=2,
                       scale=(1.0, 1.0, 0.01)), 1100, 2700),
    "nu0499": (dict(nx=8, ny=8, nz=8, nu=0.499), 260, 650),
    "jump1e3": (dict(nx=8, ny=8, nz=8,
                     e_field=lambda c: np.where(c[:, 0] > 0.5,
                                                210e6, 210e3)), 80, 150),
}


@pytest.mark.parametrize("name", sorted(DECKS))
def test_amg_bounded_iters_hard_decks(name):
    args, cap_amg, _ = DECKS[name]
    mesh, prof, eop, b, coords = _operator(**args)
    M = _amg_M(mesh, prof, eop, coords)
    res = pcg(eop.apply_constrained, b, M=M, tol=1e-8, maxiter=4000)
    assert bool(res.converged), name
    assert int(res.iters) <= cap_amg, (name, int(res.iters))


@pytest.mark.parametrize("name", sorted(DECKS))
def test_ssor_fallback_bounded_iters_hard_decks(name):
    args, _, cap_ssor = DECKS[name]
    mesh, prof, eop, b, coords = _operator(**args)
    M = _ssor_M(prof, eop)
    res = pcg(eop.apply_constrained, b, M=M, tol=1e-8, maxiter=4000)
    assert bool(res.converged), name
    assert int(res.iters) <= cap_ssor, (name, int(res.iters))
    # solution correctness against jacobi-CG
    res_j = pcg(eop.apply_constrained, b, M=eop.block_jacobi(),
                tol=1e-10, maxiter=20000)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_j.x),
        atol=1e-5 * float(jnp.abs(res_j.x).max()))


def test_ssor_selectable_via_precond_card(tmp_path, monkeypatch):
    """!SOLVER PRECOND=10 routes make_constrained_solver to the SSOR
    family (reference BILU id — sweep class, hecmw_precond_33.f90)."""
    from frontistr_tpu.solver import ssor as ssormod
    import frontistr_tpu.analysis.nonlinear as nl

    seen = {}
    orig = ssormod.eligible_maps

    def spy(prof, policy):
        m = orig(prof, policy)
        seen["policy"] = policy
        seen["maps"] = m is not None
        return m

    monkeypatch.setattr(ssormod, "eligible_maps", spy)
    from frontistr_tpu.meshgen import box_tet4
    from frontistr_tpu.io.ctrlio import read_cnt
    from frontistr_tpu.assembly.model import build_struct_model
    from frontistr_tpu.assembly import femop
    from frontistr_tpu.assembly import operators as old_ops
    cnt = tmp_path / "t.cnt"
    cnt.write_text(
        "!VERSION\n 3\n!SOLUTION, TYPE=NLSTATIC\n"
        "!BOUNDARY\n X0, 1, 3, 0.0\n!CLOAD\n X1, 3, -1.0\n"
        "!MATERIAL, NAME=M1\n!ELASTIC\n 210000.0, 0.3\n"
        "!STEP, SUBSTEPS=1\n BOUNDARY, 1\n LOAD, 1\n"
        "!SOLVER, METHOD=CG, PRECOND=10, ITERLOG=NO, TIMELOG=NO\n"
        " 10000, 1\n 1.0e-8, 1.0, 0.0\n!END\n")
    cfg = read_cnt(str(cnt))
    assert cfg.solver.precond == 10
    mesh = box_tet4(4, 4, 4)
    model = build_struct_model(mesh, cfg)
    programs = [nl.BlockPrograms(model, bb) for bb in model.blocks]
    states = [nl.init_block_state(bb, p.table)
              for bb, p in zip(model.blocks, programs)]
    inc, total_en = femop.build_incidence(
        [bb.conn for bb in model.blocks], model.n_node)
    free = jnp.asarray(old_ops.make_free_mask(model.n_dof_total,
                                              model.fixed_dofs))
    dofs_j = [jnp.asarray(bb.dofs) for bb in model.blocks]
    nns = [bb.conn.shape[1] for bb in model.blocks]
    solver = nl.make_constrained_solver(model, dofs_j, nns,
                                        jnp.asarray(inc), total_en,
                                        free, mixed=False)
    assert seen["policy"] == "ssor" and seen["maps"]
    u = jnp.zeros(model.n_dof_total)
    kes = []
    for p, s in zip(programs, states):
        u_e = u.reshape(model.n_node, model.ndof)[p.block.conn]
        kes.append(p.tangent(u_e, u_e * 0.0, s, 0.0, 0.0))
    B = jnp.asarray(model.f_ext)
    x = solver(tuple(kes), B, jnp.zeros_like(B))
    fop = femop.FEOperator(kes=list(kes), dofs=dofs_j, nns=nns,
                           inc=jnp.asarray(inc), total_en=total_en,
                           n_node=model.n_node, ndof=model.ndof,
                           free_mask=free)
    r = (B - fop.matvec(x)) * free
    assert float(jnp.linalg.norm(r)) <= \
        1e-6 * float(jnp.linalg.norm(B * free))
