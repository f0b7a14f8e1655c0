"""Benchmark: the reference's production workload (Weld_rays.py) on one TPU.

Weld model 424x500, 62 transducers, 31 receiver travel-time fields, 961
top-bottom ray paths (SURVEY.md section 6).  Prints ONE json line:

  {"metric": ..., "value": <warm wall-clock seconds>, "unit": "s",
   "vs_baseline": <baseline_s / value>}

Baseline: the driver's target of 1.0 s for the full workload on one chip
(BASELINE.md); vs_baseline > 1 means faster than target.

Robustness layout: the measurement runs in a child process (this same
file with BENCH_CHILD=1) under a wall-clock budget enforced by the
parent, so a pathological compile / wedged device can never end the
bench without a parseable JSON line on stdout.  If the first child dies
*quickly* (e.g. a stale compilation cache poisoned by a libtpu version
change), the parent retries once with a fresh cache directory.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_S = 1.0
SUBGRID = 9
METRIC = "weld_31ttf_961rays_wall_clock"

# Overall wall-clock budget for the whole bench.  The round-1 driver run
# was killed at rc=124 with no JSON emitted, which points at a ~600 s
# outer timeout: stay inside it so the parent always gets to print a
# parseable line.  A fully cold compile of the pipeline takes ~495 s over
# the 1-core axon tunnel (measured round 2), so 560 s still admits a cold
# run; warm-cache runs finish in well under a minute.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "560"))

# Production ray-march configuration: long-stride plane search with
# Simpson candidate scoring and quad-scored Fermat relaxation.  Validated
# against the reference-geometry tracer on this workload (bench_data
# diags): mean |dt|/t ~ 5.6e-3 with a -2.8e-3 bias -- i.e. the relaxed
# long-stride polylines are *better* Fermat minimisers than the
# reference's 1-cell-jitter paths; exact final integration throughout.
# Round-5 tuning (bench_data/diag_rays_r5.py): stride 9 with a widened
# plane window (plane_dist=5 keeps the per-step bend cap at ~27 deg; at
# the default window stride 9 truncates 60% of rays at orientation-domain
# refractions) and 3-point Simpson scoring cuts the ray phase 0.45 ->
# 0.31 s at +1.8e-3 mean / +9e-3 p99 ray-time shift vs the round-4
# config, with all 961 rays still arriving (no truncation guard hits).
# max_steps=115 covers the measured 109-step worst ray; the shorter step
# buffer cuts relaxation + exact-integration cost proportionally.
RAY_OPTS = dict(max_cross=8, step_scale=9, plane_dist=5, quad_vel=3,
                relax_iters=1, relax_quad=3, max_steps=115, cand_stride=7.0)
RAY_OPTS.update(json.loads(os.environ.get("BENCH_RAY_OPTS", "{}")))
# Solver budgets (round-5 tuning, bench_data/diag_polish_r5.py): the final
# stage runs 3 residual-gated phase-1 passes at 3e-3 + 2 replace-polish
# (0.34 -> 0.22 s), patches 8 + 4 (measured NO accuracy change vs 10 + 5).
# Accuracy vs a generous accuracy-preset run: max 2.23e-2 / mean 2.0e-3
# relative (was 1.99e-2 / 1.8e-3 at the round-4 budgets).  sweep_block=4
# halves the final-stage XLA compile (cold-start robustness for the
# driver's ~600 s budget) at +2.6% final-stage runtime.
SOLVE_KW = dict(final_rel_tol=3e-3, final_polish_passes=2,
                patch_max_passes=8, polish_passes=4, sweep_block=4,
                patch_block=2)
# experiment override: BENCH_SOLVE_KW='{"patch_block": 4}' etc.
SOLVE_KW.update(json.loads(os.environ.get("BENCH_SOLVE_KW", "{}")))


def _emit(value, vs_baseline, **extra):
    line = {"metric": METRIC, "value": value, "unit": "s",
            "vs_baseline": vs_baseline}
    line.update(extra)
    print(json.dumps(line), flush=True)


# --------------------------------------------------------------------- #
# child: the actual measurement
# --------------------------------------------------------------------- #


def _validate_cache(cache_dir, log):
    """Wipe AOT cache entries written under a different client/terminal
    libtpu combination.

    Round-2 post-mortem: the persistent cache is only valid for the exact
    (jax, client libtpu, terminal libtpu) triple that wrote it -- a
    rolling libtpu upgrade mid-round poisons every entry, and loading a
    stale entry either raises FAILED_PRECONDITION (MULTICHIP_r0*.json) or
    wedges the warm-up past the bench budget (BENCH_r02.json).  The
    backend platform_version string carries both build stamps, so it is
    the fingerprint; on mismatch we delete the stale entries and eat the
    (shorter, known-size) cold compile instead of a wedged cache load.
    """
    import glob

    import jax
    import jax.extend as jex

    fp = jax.__version__ + "\n" + jex.backend.get_backend().platform_version
    os.makedirs(cache_dir, exist_ok=True)
    fp_file = os.path.join(cache_dir, "fingerprint.txt")
    old = None
    if os.path.exists(fp_file):
        with open(fp_file) as f:
            old = f.read()
    if old is not None and old != fp:
        stale = glob.glob(os.path.join(cache_dir, "*-cache"))
        log(f"cache fingerprint MISMATCH -- wiping {len(stale)} stale "
            f"entries (old: {old.splitlines()[-1] if old else '?'} / "
            f"new: {fp.splitlines()[-1]})")
        for p in stale:
            try:
                os.remove(p)
            except OSError:
                pass
    with open(fp_file, "w") as f:
        f.write(fp)


def child():
    import jax

    # NOTE: must go through jax.config -- jax 0.9 does not read the
    # JAX_COMPILATION_CACHE_DIR env var, and without a persistent cache
    # every bench run pays the full cold compile.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(HERE, "examples"))
    sys.path.insert(0, HERE)

    from weld_rays import build_workload

    from alifmm_tpu import grid as gridlib
    from alifmm_tpu import rays as rayslib
    from alifmm_tpu import solver

    def log(msg):
        print(f"[bench {time.time()-T0:7.1f}s] {msg}", file=sys.stderr,
              flush=True)

    T0 = time.time()
    cfg = solver.SolveConfig(**SOLVE_KW)

    # Early device/backend probe: a broken TPU runtime (e.g. libtpu
    # client/terminal skew, MULTICHIP_r0*.json) must fail HERE with a
    # readable diagnostic, not wedge the warm-up until the budget kills
    # us silently.  _validate_cache initialises the backend too
    # (get_backend() for the fingerprint), so it shares the guard.
    try:
        log(f"backend={jax.default_backend()}")
        _validate_cache(cache_dir, log)
        log("cache validated")
        float(jnp.zeros((8,)).sum())
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001 -- diagnostic path
        log(f"DEVICE PROBE FAILED: {type(e).__name__}: {e}")
        _emit(-1.0, 0.0, error=f"device probe failed: {e}"[:500])
        raise SystemExit(2)
    log("device probe ok")
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, dnx, dtype=jnp.float32
    )
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    # Fixed transducer-pair geometry: prepared once, device-resident
    # (the measurement is solver + rays, not host-side index building).
    pair_i, pair_j = np.nonzero(pairs == 1)
    # host-side float dnx: model.dnx is a device scalar, and eager ops
    # through the axon tunnel pay seconds-to-minutes of first-execution
    # latency (bench_data/FINDINGS_r2.md) -- keep index prep pure numpy
    isx = np.round(sx / dnx)
    isy = np.round(sy / dnx)
    src_xy = jnp.asarray(
        np.stack([isx[pair_i] * SUBGRID, isy[pair_i] * SUBGRID], 1)
    )
    rec_xy = jnp.asarray(
        np.stack([isx[pair_j] * SUBGRID, isy[pair_j] * SUBGRID], 1)
    )
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))
    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])
    log("model built")

    def run_once(eps, progress=None):
        # eps perturbs the source coordinates by < 1e-5 grid cells (same
        # rounded grid nodes, same rays) so the axon layer can never
        # dedupe the measured execution against the warm-up's.
        ttfs = solver.solve_ttf(model, scx + eps, scz, 1, cfg,
                                progress=progress)
        out = rayslib.trace_rays(
            model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp",
            **RAY_OPTS,
        )
        jax.block_until_ready(out)
        # robust sync: block_until_ready does not reliably wait through
        # the axon tunnel; a scalar host read does.
        float(jnp.asarray(out[3]).ravel()[0])
        return out

    def stage_log(stage, total, name, seconds):
        log(f"  warm-up stage {stage}/{total} [{name}] {seconds:.1f}s")

    t_probe = time.time() - T0
    t0 = time.time()
    run_once(0.0, progress=stage_log)  # compile warm-up (per-stage logged)
    t_warm = time.time() - t0
    log("warm-up done")
    t0 = time.time()
    # eps must exceed the f32 ulp of the largest source coordinate
    # (~7.5e-9 at 0.1 m) or the perturbation rounds away and the tunnel
    # can dedupe the run against the warm-up; 1e-7 is still < 1e-3 cells.
    run_once(1e-7)
    dt = time.time() - t0
    log(f"measured {dt:.3f}s")

    # Diagnosability breakdown (VERDICT round 3 "perf is green but
    # opaque"): a third warm run with per-stage synchronisation so the
    # record shows WHERE the wall-clock goes.  Per-stage sync adds
    # dispatch bubbles, so the stage times over-state the async total
    # (the measured number above stays the fully-async one); the ray
    # phase is timed separately the same way.
    stages = {}

    def stage_rec(stage, total, name, seconds):
        stages[f"s{stage}_{name.split(' ')[0].strip('[]')}"] = round(
            seconds, 4)

    t0 = time.time()
    ttfs, info = solver.solve_ttf(model, scx - 1e-7, scz, 1, cfg,
                                  progress=stage_rec, return_info=True)
    t_solve = time.time() - t0
    t0 = time.time()
    out = rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp",
        **RAY_OPTS,
    )
    jax.block_until_ready(out)
    float(jnp.asarray(out[3]).ravel()[0])
    t_rays = time.time() - t0
    # Throughput estimate for the dominant final stage: grid points x
    # sources x 4 directional sweeps x (phase-1 passes + polish) stencil
    # updates over its wall share.  Speed-of-light context: each update
    # evaluates ~16 ALI + 4 FD candidate stencils (branchless).
    f_pol = (cfg.polish_passes if cfg.final_polish_passes is None
             else cfg.final_polish_passes)
    n_pass = int(info.passes) + f_pol
    final_s = max(stages.get("s4_final", 1e-9), 1e-9)
    upd_per_s = (veln.shape[0] * veln.shape[1] * len(scx) * 4 * n_pass
                 / final_s)
    breakdown = dict(
        probe_s=round(t_probe, 2),
        warmup_s=round(t_warm, 2),
        solve_synced_s=round(t_solve, 4),
        rays_s=round(t_rays, 4),
        final_passes=n_pass,
        final_converged=bool(info.converged),
        final_gupd_per_s=round(upd_per_s / 1e9, 3),
        **stages,
    )
    breakdown.update(_roofline(model, scx, scz, cfg, ttfs, tidx, src_xy,
                               rec_xy, dt, stages, t_rays, n_pass, log))
    # Self-contained record semantics (VERDICT round 4 items 2/7):
    # * the headline value is the fully-async wall clock; per-stage times
    #   are synced, so their sum EXCEEDS it by the dispatch overlap;
    # * serial_python_est_s is the fitted pure-Python reference cost of
    #   this workload (t = a*N*log2 N per TTF, a = 8.72e-6 s measured at 3
    #   crop sizes, bench_data/diag_ref_serial_r4.py) -- the >=50x
    #   BASELINE target holds for any numba speedup < ~2700x over it.
    breakdown["note"] = (
        "value = async wall clock; stage times are individually synced "
        "and overlap under async dispatch, so solve_synced_s + rays_s > "
        "value. Roofline: update_flops is XLA's exact static count of the "
        "loop-free branchless stencil update; final-stage rates scale it "
        "by grid*sources*4 sweeps*passes. final_stage_mfu_pct is vs the "
        "dense-MXU bf16 peak (conventional MFU; an eikonal sweep has no "
        "matmuls, so this is inherently tiny) and "
        "final_stage_hbm_util_pct vs nominal HBM -- both small because "
        "the stage is bound by the sequential line-scan dependency, not "
        "by compute or bandwidth; march_gelem_per_s is the ray march's "
        "gather throughput (its governing resource)."
    )
    breakdown["serial_python_est_s"] = 118675
    breakdown["speedup_vs_serial_python"] = round(118675 / dt)
    # Real-TPU shard-path sidecar (VERDICT round 4 item 3): the halo-
    # sharded solve and sharded ray batch had only ever run on the
    # virtual CPU mesh; the Pallas/Mosaic episode (FINDINGS_r3.md) showed
    # CPU-validated != TPU-runnable.  A 1-device TPU mesh exercises the
    # same shard_map/ppermute programs under the real XLA:TPU toolchain.
    # Time-guarded so a slow cold compile can never blow the bench budget.
    if time.time() - T0 < 300:
        breakdown["tpu_shard"] = _tpu_shard_check(log)
    else:
        breakdown["tpu_shard"] = {"ok": None, "skipped": "budget"}
    log(f"breakdown {json.dumps(breakdown)}")
    _emit(round(dt, 4), round(BASELINE_S / dt, 3), breakdown=breakdown)


def _tpu_shard_check(log):
    """Run solve_ttf_halo + trace_rays_sharded on a 1-device TPU mesh
    (small synthetic anisotropic model) and report pass/fail + timing +
    agreement with the unsharded solver."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from alifmm_tpu import grid as gridlib
    from alifmm_tpu import rays as rayslib
    from alifmm_tpu import solver
    from alifmm_tpu.parallel import shard

    out = {}
    t0 = _t.time()
    try:
        from alifmm_tpu import materials as mats

        Z, X, dnx = 48, 56, 1e-3
        rng = np.random.default_rng(7)
        g, p = mats.generate_mode_curves(263e9, 145e9, 216e9, 129e9,
                                         7800.0, mode="qP")
        gtab = np.stack([np.arange(361.0), g], axis=1)
        ptab = np.stack([np.arange(361.0), p], axis=1)
        veln = np.round(rng.uniform(0, 180, (Z, X)))
        velpn = np.ones((Z, X), dtype=int)
        vel_map = np.ones((Z, X))
        model = gridlib.make_model(veln, velpn, vel_map, None, gtab, ptab,
                                   dnx, dtype=jnp.float32)
        stages = ((1, 9), (2, 3))
        # converged budgets on both sides (the CPU-mesh identity tests pin
        # rtol 1e-6 in f64 this way; in f32 the residual stops at f32-eps
        # levels, hence the 1e-3 gate below)
        cfg = solver.SolveConfig(sweep_block=4, patch_block=2,
                                 final_max_passes=48,
                                 final_polish_passes=8,
                                 final_rel_tol=1e-7, final_max_polish=48)
        mesh_g = Mesh(np.array(jax.devices()[:1]), ("gz",))
        scx = jnp.asarray([20 * dnx, 36 * dnx])
        scz = jnp.asarray([40 * dnx, 38 * dnx])
        ttfs = shard.solve_ttf_halo(model, scx, scz, mesh_g, axis="gz",
                                    cfg=cfg, stages=stages, seed_side=4)
        float(jnp.asarray(ttfs).ravel()[0])
        out["halo_compile_s"] = round(_t.time() - t0, 1)
        single = solver._staged_solve(model, scx, scz, stages, 4, -1.0, cfg)
        d = np.abs(np.asarray(ttfs) - np.asarray(single))
        sc = np.maximum(np.asarray(single), 1e-12)
        out["halo_vs_single_max_rel"] = float((d / sc).max())

        mesh_s = Mesh(np.array(jax.devices()[:1]), ("src",))
        s = 3
        src_xy = jnp.asarray([[4.0 * s, 4.0 * s], [50.0 * s, 2.0 * s]])
        rec_xy = jnp.asarray([[20.0 * s, 40.0 * s], [36.0 * s, 38.0 * s]])
        tidx = jnp.asarray([0, 1])
        t1 = _t.time()
        rx, ry, lens, times = shard.trace_rays_sharded(
            model, ttfs, tidx, src_xy, rec_xy, s, mesh_s,
            max_steps=64, step_scale=2, relax_iters=1, quad_vel=3,
        )
        float(jnp.asarray(times).ravel()[0])
        out["rays_compile_s"] = round(_t.time() - t1, 1)
        out["ray_times_finite"] = bool(np.isfinite(np.asarray(times)).all())
        ok = (out["halo_vs_single_max_rel"] < 1e-3
              and out["ray_times_finite"])
        out["ok"] = bool(ok)
        log(f"tpu shard sidecar: {out}")
    except Exception as e:  # noqa: BLE001 -- recorded, not fatal
        out["ok"] = False
        out["error"] = f"{type(e).__name__}: {e}"[:300]
        log(f"tpu shard sidecar FAILED: {out['error']}")
    return out


# Nominal public single-chip peaks by device kind: (dense bf16 FLOP/s,
# HBM bytes/s).  MFU against the MXU bf16 peak is the conventional
# definition; this pipeline is VPU/gather bound so treat it as context.
_PEAKS = {
    "v4": (275e12, 1.23e12),
    "v5 lite": (197e12, 8.19e11),
    "v5e": (197e12, 8.19e11),
    "v5p": (459e12, 2.765e12),
    "v6 lite": (918e12, 1.64e12),
    "v6e": (918e12, 1.64e12),
}


def _roofline(model, scx, scz, cfg, ttfs, tidx, src_xy, rec_xy, dt, stages,
              t_rays, n_pass, log):
    """Static-analysis roofline vs nominal chip peaks (VERDICT round 4
    item 2).  Best-effort: any failure returns partial numbers rather
    than killing the bench."""
    import jax
    import numpy as np

    out = {}
    try:
        kind = jax.devices()[0].device_kind
        out["device_kind"] = kind
        peak = next((v for k, v in _PEAKS.items() if k in kind.lower()),
                    None)

        def cost(jfn, *args, **kw):
            c = jfn.lower(*args, **kw).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return (float(c.get("flops", 0.0)),
                    float(c.get("bytes accessed", 0.0)))

        # Per-update flop/byte cost from the LOOP-FREE local_update body
        # (branchless straight-line code, so XLA's static count is exact;
        # whole-program cost_analysis counts while/scan bodies only once
        # and would understate loop-heavy stages by orders of magnitude).
        import jax.numpy as jnp

        from alifmm_tpu.ops import stencils as stencils_mod
        from alifmm_tpu.ops.stencils import OFFSETS

        n_src = len(scx)
        Z, X = model.shape
        S = max(Z, X)

        @jax.jit
        def one_line(band, veln_l, velpn_l, vmap_l, stif_l, fbs_l):
            tt_center = band[..., 2, 2 : 2 + S]
            nbr, known, inb = {}, {}, {}
            for (dz, dx) in OFFSETS:
                v = band[..., 2 + dz, 2 + dx : 2 + dx + S]
                nbr[(dz, dx)] = v
                known[(dz, dx)] = (v < 1e30) & (v < tt_center)
                inb[(dz, dx)] = jnp.ones((S,), bool)
            edges = {k: jnp.zeros((S,), bool)
                     for k in ("top", "bottom", "left", "right")}
            return stencils_mod.local_update(
                nbr, known, inb, tt_center, veln_l, velpn_l, vmap_l,
                stif_l, fbs_l, edges, model, model.dnx, causal=True,
            )

        band = jnp.zeros((n_src, 5, S + 4), jnp.float32)
        lf, lb = cost(one_line, band, jnp.zeros((S,)), jnp.zeros((S,)),
                      jnp.zeros((S,)), jnp.zeros((S, 5)),
                      jnp.zeros((4, S)))
        flops_per_upd = lf / (n_src * S)
        n_upd = float(Z) * X * n_src * 4 * n_pass
        final_s = max(stages.get("s4_final", 0.0), 1e-9)
        out["update_flops"] = round(flops_per_upd, 1)
        out["final_stage_gflop_per_s"] = round(
            flops_per_upd * n_upd / final_s / 1e9, 1)
        # Modeled streaming bytes per update: 5 band reads + 1 write of
        # the f32 field + ~12 material planes (veln, velpn, vel_map,
        # 5 stif, 4 fallback-slowness)
        bytes_per_upd = (6 + 12) * 4.0
        out["final_stage_gb_per_s"] = round(
            bytes_per_upd * n_upd / final_s / 1e9, 1)
        # Ray march roofline: the march is gather-throughput bound; count
        # gathered elements per while iteration (TTF bilinear corners +
        # Simpson material samples over R rays x K candidates).
        R = int(src_xy.shape[0])
        sd = RAY_OPTS.get("plane_dist", 3) * SUBGRID + 1
        K = int(np.ceil(2 * sd / RAY_OPTS["cand_stride"])) + 1
        n_q = 3 if RAY_OPTS.get("quad_vel") == 3 else 5
        gath_per_iter = R * K * (4 + n_q * 5)
        out["march_gelem_per_s"] = round(
            gath_per_iter * RAY_OPTS["max_steps"] / max(t_rays, 1e-9)
            / 1e9, 3)
        if peak is not None:
            pk_f, pk_b = peak
            out["final_stage_mfu_pct"] = round(
                100.0 * flops_per_upd * n_upd / final_s / pk_f, 3)
            out["final_stage_hbm_util_pct"] = round(
                100.0 * bytes_per_upd * n_upd / final_s / pk_b, 2)
    except Exception as e:  # noqa: BLE001 -- diagnostic-only path
        log(f"roofline estimate unavailable: {type(e).__name__}: {e}")
        out["roofline_error"] = str(e)[:200]
    return out


# --------------------------------------------------------------------- #
# parent: budget enforcement + retry-on-poisoned-cache
# --------------------------------------------------------------------- #


def _run_child(deadline, fresh_cache):
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    cache = os.path.join(HERE, ".jax_cache")
    if fresh_cache:
        import shutil

        cache = os.path.join(HERE, ".jax_cache_fresh")
        shutil.rmtree(cache, ignore_errors=True)  # truly fresh
    env.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    timeout = max(10.0, deadline - time.time())
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, cwd=HERE, timeout=timeout,
            stdout=subprocess.PIPE, text=True,
        )
    except subprocess.TimeoutExpired:
        return None, time.time() - t0, "timeout"
    for ln in (proc.stdout or "").splitlines():
        try:
            obj = json.loads(ln)
            if obj.get("metric") == METRIC and isinstance(
                obj.get("value"), (int, float)
            ):
                return obj, time.time() - t0, None
        except json.JSONDecodeError:
            continue
    return None, time.time() - t0, f"rc={proc.returncode}"


def parent():
    # Single full-budget first attempt: the tunnel's first-execution
    # latency is hugely variable (83-490 s measured, including waits for
    # a previous process's device lease to release), so any mid-budget
    # kill of a warm attempt risks killing a run that would have
    # finished -- and a post-kill cold retry cannot fit the remaining
    # budget anyway.  The in-child fingerprint check already converts
    # the poisoned-cache wedge (round-2's failure mode) into a clean
    # cold compile, and fast failures still get a fresh-cache retry.
    deadline = time.time() + BUDGET_S - 20.0
    obj, took, err = _run_child(deadline, fresh_cache=False)
    first_obj = obj
    failed = obj is None or obj.get("value", -1) < 0
    if failed and time.time() < deadline - 90:
        print(f"[bench] first attempt failed ({err}, {took:.0f}s); "
              "retrying with a fresh compile cache", file=sys.stderr,
              flush=True)
        obj, took, err = _run_child(deadline, fresh_cache=True)
        if obj is None or obj.get("value", -1) < 0:
            obj = obj or first_obj  # keep the most informative error line
    if obj is not None:
        print(json.dumps(obj), flush=True)
        return 0 if obj.get("value", -1) >= 0 else 1
    _emit(-1.0, 0.0, error=f"bench did not complete within budget ({err})")
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        child()
    else:
        sys.exit(parent())
