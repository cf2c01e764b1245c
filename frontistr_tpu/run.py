"""Top-level analysis runner — the equivalent of fstr_main
(fistr1/src/main/fistr_main.f90:38-114): read control files, dispatch on
solution type, write logs/results.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from frontistr_tpu.io.hecmw_ctrl import read_hecmw_ctrl
from frontistr_tpu.io.meshio import read_mesh
from frontistr_tpu.io.ctrlio import read_cnt
from frontistr_tpu.io import logio


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache for the CLI path.

    First jit compile of a deck shape costs seconds (TPU) to minutes
    (CPU f64 tet10); the reference pays an analogous one-time cost in
    its symbolic setup.  Keyed by host platform + CPU so an artifact
    compiled on another machine is never loaded (XLA's AOT loader only
    warns on a feature mismatch — SIGILL risk).  Opt out with
    FRONTISTR_TPU_COMPILE_CACHE=0; override dir with JAX_CACHE_DIR.
    """
    if os.environ.get("FRONTISTR_TPU_COMPILE_CACHE", "1") == "0":
        return
    try:
        import hashlib
        import platform

        import jax
        base = os.environ.get(
            "JAX_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "frontistr_tpu", "xla"))
        host = hashlib.sha1(
            (platform.machine() + platform.processor()
             + platform.version()).encode()).hexdigest()[:12]
        cache = os.path.join(base, host)
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass                      # cache is an optimization, never fatal


def run_directory(workdir: str, log_name: str = "0.log") -> dict:
    """Run the analysis configured by ``workdir/hecmw_ctrl.dat``.

    Returns a dict of result objects keyed by analysis type.
    """
    t_start = time.time()
    # multi-host pods: join the distributed runtime BEFORE any backend
    # touch (no-op unless FRONTISTR_TPU_COORDINATOR/... are set)
    from frontistr_tpu.parallel.multihost import maybe_init_distributed
    maybe_init_distributed()
    _enable_compile_cache()
    from frontistr_tpu.io.dbgfile import dbg_open, dbg
    dbg_open(workdir)                # FSTR.dbg.<rank> (fistr_main.f90:193)
    ctrl = read_hecmw_ctrl(os.path.join(workdir, "hecmw_ctrl.dat"))
    mb = ctrl.mesh()
    partinfo = None
    mtype = mb.params.get("TYPE", "HECMW-ENTIRE").upper()
    if mtype == "ABAQUS":
        from frontistr_tpu.io.abaqusio import read_abaqus
        mesh = read_abaqus(ctrl.path(mb))
    elif mtype == "NASTRAN":
        from frontistr_tpu.io.nastranio import read_nastran
        mesh = read_nastran(ctrl.path(mb))
    elif mtype == "GEOFEM":
        from frontistr_tpu.io.geofemio import read_geofem
        mesh = read_geofem(ctrl.path(mb))
    elif mtype == "HECMW-DIST":
        # partitioned workdir ('<base>.<rank>'): read EVERY rank and
        # reassemble the whole model (the reference runs one MPI process
        # per file; here one device mesh solves the reassembled model
        # and the partition drives per-rank result output)
        from frontistr_tpu.io.distio import read_dist, mesh_from_dist_ranks
        p = ctrl.path(mb)
        if os.path.exists(p):
            paths = [p]
        else:
            paths = []
            while os.path.exists(f"{p}.{len(paths)}"):
                paths.append(f"{p}.{len(paths)}")
            if not paths:
                raise FileNotFoundError(p)
        mesh, partinfo = mesh_from_dist_ranks(
            [read_dist(q) for q in paths])
        if partinfo:
            print(f"### HECMW-DIST: reassembled {len(paths)} ranks -> "
                  f"{mesh.n_node} nodes, {mesh.n_elem} elements")
    elif mtype in ("HECMW-ENTIRE", ""):
        mesh = read_mesh(ctrl.path(mb))
    else:
        raise NotImplementedError(f"!MESH TYPE={mtype}")
    refine = int(mb.params.get("REFINE", "0") or 0)
    if refine > 0:
        from frontistr_tpu.io.refine import refine_mesh
        mesh = refine_mesh(mesh, refine)
        print(f"### mesh refined x{refine}: {mesh.n_node} nodes, "
              f"{mesh.n_elem} elements")
    # production RCM node reordering: the cluster-ELL/AMG fast paths
    # assume banded numbering (hecmw_matrix_ordering_CM.f90 analog);
    # file output stays keyed by the original node ids.  A partitioned
    # workdir under GSPMD sharding instead orders nodes by (rank, RCM)
    # so the contiguous shard splits fall on the partition boundaries.
    from frontistr_tpu import ordering
    from frontistr_tpu.parallel import shard as _shmod
    if partinfo and _shmod.requested_shards():
        mesh = ordering.partition_reorder(mesh, partinfo)
    else:
        mesh = ordering.maybe_reorder(mesh)
    cfg = read_cnt(ctrl.path(ctrl.control()))
    # '!TEMPERATURE, READRESULT=n[,SSTEP=s][,INTERVAL=i]': temperature
    # imported from the fstrTEMP result binding (readtemp.f90
    # read_temperature_result; snapshots <base>.0.<k>).  The final
    # snapshot defines the step's full thermal state; the load ramp
    # factor plays the reference's TEMP_FACTOR interpolation role.
    tr = [c for c in cfg.temperatures
          if c.iparam("READRESULT", 0) > 0]
    if tr:
        from frontistr_tpu.io.resfile import read_result_any
        rb = ctrl.result("fstrTEMP")
        if rb is not None:
            base = ctrl.path(rb)
            c0 = tr[0]
            nstep = c0.iparam("READRESULT", 1)
            sstep = c0.iparam("SSTEP", 1)
            interval = c0.iparam("INTERVAL", 1)
            last = None
            for k in range(sstep, nstep + 1, interval):
                p = f"{base}.0.{k}"
                if os.path.exists(p):
                    last = p
            if last is not None:
                comps = read_result_any(last)
                vals = np.asarray(comps["node_comps"][0][1]).reshape(-1)
                # result rows are keyed by global node id — map into
                # mesh order, untouched nodes stay at REFTEMP
                T = np.full(mesh.n_node, cfg.reftemp, float)
                for nid, v in zip(comps["node_ids"], vals):
                    idx = mesh.id2idx.get(int(nid))
                    if idx is not None:
                        T[idx] = v
                cfg.temp_read_field = T
    out = {"mesh": mesh, "cfg": cfg, "ctrl": ctrl,
           "partition": partinfo}
    # user plug-in module (uelastic/umat/uload equivalents):
    # FRONTISTR_TPU_USER_MODULE=<path.py> registers hooks before dispatch
    from frontistr_tpu import user as fuser
    fuser.load_user_module()
    t_pre = time.time()

    sol = cfg.solution_type.upper()
    log_path = os.path.join(workdir, log_name)
    # production default on TPU: the fused single-chip pipeline
    # (FRONTISTR_TPU_SHARDS=1 — one jitted program per Newton iteration;
    # each eager dispatch is a round-trip on the remote-TPU tunnel).
    # Explicit FRONTISTR_TPU_SHARDS (incl. 0) always wins; multi-chip
    # runs request n or 'auto'.
    if "FRONTISTR_TPU_SHARDS" not in os.environ:
        try:
            import jax
            if jax.devices()[0].platform in ("tpu", "axon"):
                os.environ["FRONTISTR_TPU_SHARDS"] = "1"
        except Exception:
            pass
    dbg(f"mesh read: {mesh.n_node} nodes, {mesh.n_elem} elements, "
        f"type={mtype or 'HECMW-ENTIRE'}")
    dbg(f"setup done ({t_pre - t_start:.2f} s); solution type {sol}")

    # parsed-but-unapplied cards must fail LOUDLY, not silently
    # (fstr_setup.f90 aborts on unconsumed headers)
    if cfg.embeds:
        print("### WARNING: !EMBED parsed but embedded-contact "
              "constraints are not implemented yet; card IGNORED")

    # '!RESTART, FREQUENCY=n': n>0 write every n (sub)steps from a
    # fresh start; n<0 resume from the checkpoint then write every |n|
    # (fstr_setup.f90 restart semantics) — shared by the solid
    # nonlinear and transient heat paths
    rkw = {}
    if cfg.restart is not None:
        freq = cfg.restart.iparam("FREQUENCY", 1)
        rb = ctrl.restart()
        rpath = (ctrl.path(rb) if rb is not None
                 else os.path.join(workdir, "restart")) + ".npz"
        if freq > 0 and os.path.exists(rpath):
            os.remove(rpath)          # positive freq = fresh run
        rkw = dict(restart_path=rpath, restart_freq=abs(freq))

    # profiler wiring (the TPU answer to the reference's TIMELOG=2 +
    # fapp hooks): FRONTISTR_TPU_PROFILE=<dir> captures a jax.profiler
    # trace of the whole analysis for xprof/tensorboard
    prof_dir = os.environ.get("FRONTISTR_TPU_PROFILE")
    _prof_cm = None
    if prof_dir:
        import jax
        _prof_cm = jax.profiler.trace(prof_dir)
        _prof_cm.__enter__()

    if sol in ("STATIC", "NLSTATIC"):
        from frontistr_tpu.assembly.model import build_struct_model
        model = build_struct_model(mesh, cfg)
        # contact decks must take the nonlinear/contact loop even with
        # linear-elastic material (the reference forces fstr_Newton_contact*
        # whenever contact conditions exist)
        has_contact = bool(cfg.contacts) and bool(mesh.contact_pairs)
        if (sol == "NLSTATIC" or cfg.nlgeom or has_contact
                or _needs_newton(model)):
            from frontistr_tpu.analysis.nonlinear import run_nonlinear_static
            res = run_nonlinear_static(model, log_path=log_path, **rkw)
        else:
            from frontistr_tpu.analysis.static import run_linear_static
            res = run_linear_static(model)
            _write_static_log(log_path, model, res, step=1)
        out["static"] = res
        out["model"] = model
    elif sol == "HEAT":
        from frontistr_tpu.analysis.heat import run_heat
        cb, written = _snapshot_cb(ctrl, cfg, mesh, workdir, "heat")
        out["heat"] = run_heat(mesh, cfg, workdir, log_path=log_path,
                               on_interval=cb, **rkw)
        out["_snapshots"] = written
    elif sol == "EIGEN":
        from frontistr_tpu.assembly.model import build_struct_model
        from frontistr_tpu.analysis.eigen import run_eigen
        model = build_struct_model(mesh, cfg)
        out["eigen"] = run_eigen(model, log_path=log_path)
        out["model"] = model
    elif sol == "DYNAMIC" and cfg.dynamic is not None \
            and cfg.dynamic.idx_resp == 2:
        # frequency response (fstr_frequency_analysis): the !DYNAMIC
        # row-2 fields are the frequency window (f_start, f_end,
        # n_points, f_vis); Rayleigh from row 4.  Modes come from the
        # !EIGENREAD log/result import when those files exist (the
        # reference's decoupled eigen->freq workflow), else from an
        # in-process Lanczos run.
        from frontistr_tpu.assembly.model import build_struct_model
        from frontistr_tpu.analysis.freq import (run_frequency,
                                                 load_eigenread)
        d = cfg.dynamic
        model = build_struct_model(mesh, cfg)
        eig_in = None
        if cfg.eigenread is not None:
            eig_in = load_eigenread(cfg.eigenread, workdir, ctrl, model)
        fr = run_frequency(model, d.t_start, d.t_end,
                           n_freq=max(d.n_step, 1),
                           ray_alpha=d.ray_m, ray_beta=d.ray_k,
                           eigen_result=eig_in)
        out["freq"] = fr
        out["model"] = model
        with open(log_path, "w") as fh:
            fh.write(" FREQUENCY RESPONSE (modal superposition)\n")
            if cfg.eigenread is not None:
                fh.write("  modes imported via !EIGENREAD\n" if eig_in
                         is not None else
                         "  EIGENREAD files missing; modes recomputed "
                         "in-process\n")
            fh.write("  freq        disp_amp_max  vel_amp_max   "
                     "acc_amp_max\n")
            for k in range(len(fr.freqs)):
                fh.write(f"  {fr.freqs[k]:12.4E}{fr.disp_amp_max[k]:14.6E}"
                         f"{fr.vel_amp_max[k]:14.6E}"
                         f"{fr.acc_amp_max[k]:14.6E}\n")
    elif sol == "DYNAMIC":
        if any(b.etype == 3414 for b in mesh.blocks):
            # u-p flow meshes route to the SUPG/PSPG stepper
            # (fstr_dynamic_nlimplicit + dynamic_mat_ass_load 3414 arm)
            from frontistr_tpu.analysis.flow import run_flow
            out["flow"] = run_flow(mesh, cfg, workdir,
                                   log_path=log_path)
        else:
            from frontistr_tpu.assembly.model import build_struct_model
            from frontistr_tpu.analysis.dynamic import run_dynamic
            model = build_struct_model(mesh, cfg)
            cb, written = _snapshot_cb(ctrl, cfg, mesh, workdir, "dynamic")
            out["dynamic"] = run_dynamic(model, log_path=log_path,
                                         on_interval=cb, **rkw)
            out["model"] = model
            out["_snapshots"] = written
    elif sol == "STATICEIGEN":
        # fstr_main kstSTATICEIGEN (fistr_main.f90:84-85): nonlinear
        # static, then Lanczos about the deformed tangent; EGLIST block
        # appended to the same 0.log
        from frontistr_tpu.assembly.model import build_struct_model
        from frontistr_tpu.analysis.freq import run_static_eigen
        model = build_struct_model(mesh, cfg)
        res, eig = run_static_eigen(model, log_path=log_path)
        out["static"] = res
        out["eigen"] = eig
        out["model"] = model
    elif sol in ("ELEMCHECK", "PRECHECK", "NZPROF"):
        # fstr_main kstPRECHECK/kstNZPROF (fistr_main.f90:86 ->
        # fstr_precheck.f90): element quality summary; NZPROF also dumps
        # the node-graph nonzero profile + gnuplot script
        from frontistr_tpu.precheck import precheck, nzprof
        rep = precheck(mesh)
        out["precheck"] = rep
        print(" ****   STAGE PreCheck  **")
        print(rep.summary())
        with open(log_path, "w") as fh:
            fh.write(" ****   STAGE PreCheck  **\n")
            fh.write(rep.summary() + "\n")
        if sol == "NZPROF":
            prof = nzprof(mesh, workdir)
            out["nzprof"] = prof
            print(f" ### nonzero profile: N={prof['n']} "
                  f"NNZ={prof['nnz']} density={prof['density_pct']:.3e}%")
            print(' ### Command recommendation')
            print(f' gnuplot -persist "{os.path.basename(prof["plt"])}"')
    else:
        raise NotImplementedError(f"solution type {sol}")

    # !ECHO: prepend the consumed mesh + deck dump to the log
    # (static_echo.f90 / heat_echo.f90 write through ILOG at setup)
    if cfg.echo:
        from frontistr_tpu.io.echo import prepend_echo
        prepend_echo(log_path, mesh, cfg)

    # in-situ visualization (!WRITE,VISUAL + !VISUAL PSR surface render)
    if cfg.write_visual and "static" in out:
        try:
            from frontistr_tpu.vis.psf import visualize
            out["visual"] = visualize(mesh, out["model"], out["static"],
                                      workdir, cfg)
        except Exception as e:                      # vis must never kill FEM
            print(f"### visualizer skipped: {e}")

    # result file output (!WRITE,RESULT) for every analysis family
    # (hecmw_result_write_by_name: fstr writes <name>.<rank>.<step>)
    if cfg.write_result and ctrl.result() is not None:
        rb = ctrl.result()
        base = ctrl.path(rb)
        from frontistr_tpu.io.resfile import (write_static_result,
                                              write_result,
                                              write_result_bin)
        # '!RESULT, ..., TYPE=BINARY' selects the reference binary
        # format (hecmw_control.c:1235-1275; text is the default)
        binary = (rb.params.get("TYPE", "TEXT").upper() == "BINARY")
        if binary:
            write_result = write_result_bin
        snaps = out.get("_snapshots", set())
        if "static" in out and partinfo:
            # partitioned workdir: one result file per rank holding that
            # rank's OWNED nodes/elements (the reference's per-process
            # hecmw_result_write_by_name output; fstr_rmerge reassembles)
            res = out["static"]
            nrank = np.asarray([partinfo["node_rank"][int(g)]
                                for g in mesh.node_ids])
            erank = np.asarray([partinfo["elem_rank"].get(int(e), 0)
                                for e in np.asarray(res.elem_ids)])
            for r in range(partinfo["n_ranks"]):
                write_static_result(base + f".{r}.1", mesh, out["model"],
                                    res, step=1, binary=binary,
                                    node_sel=nrank == r,
                                    elem_sel=erank == r)
        elif "static" in out:
            write_static_result(base + ".0.1", mesh, out["model"],
                                out["static"], step=1, binary=binary)
        elif "heat" in out:
            # per-interval snapshots already written via _snapshot_cb;
            # guarantee at least the final state exists
            hr = out["heat"]
            if hr.steps not in snaps:
                write_result(base + f".0.{hr.steps}",
                             f"*fstrresult heat step={hr.steps}",
                             mesh.node_ids,
                             np.concatenate([b.elem_ids
                                             for b in mesh.blocks]),
                             [("TEMPERATURE", np.asarray(
                                 hr.T).reshape(-1, 1))], [])
        elif "dynamic" in out:
            dr = out["dynamic"]
            if dr.steps not in snaps:
                nd = np.asarray(dr.u).reshape(mesh.n_node, -1)
                nv = np.asarray(dr.vel).reshape(mesh.n_node, -1)
                na = np.asarray(dr.acc).reshape(mesh.n_node, -1)
                write_result(base + f".0.{dr.steps}",
                             f"*fstrresult dynamic step={dr.steps}",
                             mesh.node_ids,
                             np.concatenate([b.elem_ids
                                             for b in mesh.blocks]),
                             [("DISPLACEMENT", nd[:, :3]),
                              ("VELOCITY", nv[:, :3]),
                              ("ACCELERATION", na[:, :3])], [])
        elif "flow" in out:
            from frontistr_tpu.analysis.flow import write_flow_result
            fr = out["flow"]
            write_flow_result(base + f".0.{fr.steps}", mesh, fr,
                              step=fr.steps)
        elif "eigen" in out:
            er = out["eigen"]
            eids = np.concatenate([b.elem_ids for b in mesh.blocks])
            ndof = out["model"].ndof
            for k in range(er.eigenvectors.shape[1]):
                phi = er.eigenvectors[:, k].reshape(mesh.n_node, ndof)
                write_result(base + f".0.{k+1}",
                             f"*fstrresult eigen mode={k+1} "
                             f"freq={er.freq[k]:.6e}",
                             mesh.node_ids, eids,
                             [("DISPLACEMENT", phi[:, :3])], [])
    if _prof_cm is not None:
        _prof_cm.__exit__(None, None, None)
        print(f"### jax profiler trace written to {prof_dir}")
    out["total_time"] = time.time() - t_start
    _write_msg(workdir, t_pre - t_start, out["total_time"])
    dbg(f"analysis completed ({out['total_time']:.2f} s)")
    return out


def _snapshot_cb(ctrl, cfg, mesh, workdir, kind):
    """Per-interval !WRITE RESULT/VISUAL emission for transient analyses
    (heat_solve_TRAN.f90:268-270 writes the result file AND calls the
    visualizer every interval; dynamics likewise in fstr_solve_dynamic).
    Returns (callback, written_steps) — written_steps records the result
    snapshots so run_directory's final block doesn't duplicate them."""
    rb = ctrl.result()
    rfreq = cfg.result_frequency if (cfg.write_result and rb is not None) \
        else 0
    vfreq = cfg.visual_frequency if cfg.write_visual else 0
    written: set = set()
    if not rfreq and not vfreq:
        return None, written
    base = ctrl.path(rb) if rfreq else None
    binary = rfreq and (rb.params.get("TYPE", "TEXT").upper() == "BINARY")
    eids = np.concatenate([b.elem_ids for b in mesh.blocks])

    def cb(step, t, *fields):
        if rfreq and step % rfreq == 0:
            from frontistr_tpu.io.resfile import (write_result,
                                                  write_result_bin)
            wr = write_result_bin if binary else write_result
            if kind == "heat":
                (T,) = fields
                wr(base + f".0.{step}",
                   f"*fstrresult heat step={step} time={t:.6e}",
                   mesh.node_ids, eids,
                   [("TEMPERATURE", np.asarray(T).reshape(-1, 1))], [])
            else:
                u, v, a = (np.asarray(x).reshape(mesh.n_node, -1)
                           for x in fields)
                wr(base + f".0.{step}",
                   f"*fstrresult dynamic step={step} time={t:.6e}",
                   mesh.node_ids, eids,
                   [("DISPLACEMENT", u[:, :3]), ("VELOCITY", v[:, :3]),
                    ("ACCELERATION", a[:, :3])], [])
            written.add(step)
        if vfreq and step % vfreq == 0:
            try:
                from frontistr_tpu.vis import psf
                if kind == "heat":
                    psf.visualize_scalar(mesh, fields[0], workdir, cfg,
                                         basename=f"result.{step}")
                else:
                    import types
                    shim = types.SimpleNamespace(
                        u=np.asarray(fields[0]).reshape(mesh.n_node, -1))
                    psf.visualize(mesh, None, shim, workdir, cfg,
                                  basename=f"result.{step}")
            except Exception as e:          # vis must never kill FEM
                print(f"### visualizer skipped at step {step}: {e}")
    return cb, written


def _write_msg(workdir: str, t_pre: float, t_total: float) -> None:
    """FSTR.msg banner + timing block (fistr_main.f90:219-231, 100-104)."""
    try:
        with open(os.path.join(workdir, "FSTR.msg"), "w") as fh:
            fh.write(" :========================================:\n")
            fh.write(" :**   BEGIN FSTR Structural Analysis   **:\n")
            fh.write(" :========================================:\n")
            fh.write(" ====================================\n")
            fh.write(f"     TOTAL TIME (sec) :{t_total:10.2f}\n")
            fh.write(f"            pre (sec) :{t_pre:10.2f}\n")
            fh.write(f"          solve (sec) :{t_total - t_pre:10.2f}\n")
            fh.write(" ====================================\n")
    except OSError:
        pass


def _needs_newton(model) -> bool:
    from frontistr_tpu.fem import material as mat
    return any(b.material.mtype != mat.ELASTIC or b.material.nlgeom !=
               mat.INFINITESIMAL for b in model.blocks)


def _write_static_log(log_path, model, res, step=1):
    # node_count>0 excludes mesh nodes not attached to any element —
    # the reference summarizes over the analysis model only (unused
    # nodes would otherwise pin every min at 0, e.g. exA A341 SMS)
    logio.write_static_log(
        log_path, step, model.dim, np.asarray(res.u),
        res.nodal_strain, res.nodal_stress, res.nodal_mises,
        res.elem_strain, res.elem_stress, res.elem_mises,
        model.mesh.node_ids, res.elem_ids,
        node_count=getattr(res, "node_count", None))
