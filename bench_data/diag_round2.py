"""Round-2 perf diagnosis on the weld workload (TPU, warm cache).

Measures, with input perturbation between reps so no layer can dedupe
repeated executions:
  - solver: per-pass convergence profile of the final stage (python-loop
    gs_pass with explicit deltas), and wall time vs sweep_block.
  - rays: march-only vs +relax vs +final integration split.
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/examples")
sys.path.insert(0, "/root/repo")

from weld_rays import build_workload

from alifmm_tpu import grid as gridlib
from alifmm_tpu import rays as rayslib
from alifmm_tpu import solver
from alifmm_tpu.ops import sweep
from alifmm_tpu.ops.stencils import INF

SUBGRID = 9


def log(msg):
    print(msg, flush=True)


def bench_fn(fn, scx, scz, reps=3):
    """Min wall time over reps; perturbs the source coords per rep (same
    grid nodes after rounding) to defeat any execution dedup."""
    fn(scx, scz)
    best = 1e9
    for r in range(1, reps + 1):
        sx = scx + 1e-9 * r
        t0 = time.time()
        out = fn(sx, scz)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])
    st = solver._COARSE_STAGES
    ss = solver._COARSE_SEED_SIDE
    sg = float(solver._COARSE_SEED_SIGN)
    log(f"backend={jax.default_backend()}")

    # ---- stage wall times with perturbed inputs -------------------------
    cfg = solver.SolveConfig()

    def stages_through_3(sx_, sz_):
        tt, bz, bx = solver._stage_first(model, sx_, sz_, st[0][0], st[0][1],
                                         ss, sg, cfg)
        tt, bz, bx = solver._stage_next(model, sx_, sz_, tt, bz, bx,
                                        st[1][0], st[1][1], cfg)
        tt, bz, bx = solver._stage_next(model, sx_, sz_, tt, bz, bx,
                                        st[2][0], st[2][1], cfg)
        return tt, bz, bx

    t_pre = bench_fn(lambda a, b: stages_through_3(a, b), scx, scz)
    log(f"stages 1-3 (patches): {t_pre*1e3:.1f} ms")

    tt3, bz3, bx3 = stages_through_3(scx, scz)

    def final_with(cfg_):
        return lambda a, b: solver._stage_final(model, tt3, bz3, bx3, cfg_)

    for blk in (8, 16, 32):
        cfg_b = solver.SolveConfig(sweep_block=blk)
        t0 = time.time()
        f = final_with(cfg_b)
        f(scx, scz)  # compile (cached for 8)
        log(f"final stage block={blk}: compile+run {time.time()-t0:.1f}s")
        t = bench_fn(f, scx, scz)
        log(f"final stage block={blk}: warm {t*1e3:.1f} ms")

    # ---- pass-count profile of the final stage --------------------------
    Z, X = model.shape
    dtt = model.vel_map.dtype

    def inject_one(ptt, pbz, pbx):
        return solver._inject(ptt, (pbz, pbx), 3, (Z, X), (0, 0), 1, dtt, (Z, X))

    tt0, fixed = jax.vmap(inject_one)(tt3, bz3, bx3)
    gp = jax.jit(lambda t, rep: sweep.gs_pass(t, model, fixed, replace=rep,
                                              block=8))
    tt = tt0
    prev = None
    log("pass-by-pass (phase1 min-mode):")
    for k in range(16):
        tt_new = gp(tt, False)
        known = tt_new < INF * 0.5
        delta = float(jnp.max(jnp.where(known | (tt < INF * 0.5),
                                        jnp.abs(tt_new - tt), 0.0)))
        scale = float(jnp.max(jnp.where(known, tt_new, 0.0)))
        log(f"  pass {k+1}: rel_delta={delta/scale:.2e}")
        tt = tt_new
        if delta <= 1e-3 * scale and k >= 1:
            break
    log("polish (replace-mode):")
    ref = tt
    for k in range(6):
        tt_new = gp(tt, True)
        known = tt_new < INF * 0.5
        delta = float(jnp.max(jnp.where(known, jnp.abs(tt_new - tt), 0.0)))
        scale = float(jnp.max(jnp.where(known, tt_new, 0.0)))
        log(f"  polish {k+1}: rel_delta={delta/scale:.2e}")
        tt = tt_new

    # ---- rays phase split ------------------------------------------------
    cfg = solver.SolveConfig()
    ttfs = solver.solve_ttf(model, np.asarray(scx), np.asarray(scz), 1, cfg)
    ttfs.block_until_ready()
    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / model.dnx)
    isy = np.round(sy / model.dnx)
    src_xy = jnp.asarray(np.stack([isx[pair_i] * SUBGRID,
                                   isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(np.stack([isx[pair_j] * SUBGRID,
                                   isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))

    base = dict(max_cross=8, step_scale=6, quad_vel=True, max_steps=170,
                cand_stride=6.0)

    def rays_with(relax, **kw):
        opts = dict(base, relax_iters=relax, **kw)
        return lambda a, b: rayslib.trace_rays(
            model, ttfs, tidx, a, b, SUBGRID, mode="interp", **opts)

    def bench_rays(fn, reps=3):
        fn(src_xy, rec_xy)
        best = 1e9
        for r in range(1, reps + 1):
            sx_ = src_xy + 1e-6 * r
            t0 = time.time()
            out = fn(sx_, rec_xy)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return best

    for relax in (0, 1, 2):
        t = bench_rays(rays_with(relax))
        log(f"rays relax_iters={relax}: {t*1e3:.1f} ms")

    # march-only proxy: relax 0 and max_cross 2 on the final integration is
    # not separable through the public API; time ray_times directly
    bx, by, ln, tm = rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp",
        **dict(base, relax_iters=2))
    jax.block_until_ready((bx, by))
    mat_flat = rayslib._material_flat(model, False)
    rt = jax.jit(lambda x, y: rayslib.ray_times(model, mat_flat, x, y, ln,
                                                SUBGRID, 18))
    rt(bx, by)
    best = 1e9
    for r in range(3):
        xb = bx + 1e-6 * (r + 1)
        t0 = time.time()
        out = rt(xb, by)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    log(f"ray_times final integration alone: {best*1e3:.1f} ms")

    rx = jax.jit(lambda x, y: rayslib.relax_rays(
        model, mat_flat, x, y, ln, SUBGRID, iters=2, max_cross=18, quad=True))
    rx(bx, by)
    best = 1e9
    for r in range(3):
        xb = bx + 1e-6 * (r + 1)
        t0 = time.time()
        out = rx(xb, by)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    log(f"relax_rays(iters=2) alone: {best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
