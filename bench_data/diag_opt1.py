"""Optimization experiments on the weld workload (TPU, warm cache).

All timings use fresh input buffers (the axon tunnel dedupes repeated
executions of identical (program, buffers) pairs -- see diag_sync.py).
Accuracy deltas are reported against the current production config.
"""
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

SUBGRID = 9


def log(m):
    print(m, flush=True)


def fresh(a, rep):
    return a * (1.0 + 1e-6 * rep)


def timeit(fn, mk_inputs, reps=3):
    fn(*mk_inputs(0))  # warm/compile
    best = 1e9
    for r in range(1, reps + 1):
        args = mk_inputs(r)
        jax.block_until_ready(args)
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, fn(*mk_inputs(0))


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])
    st = solver._COARSE_STAGES
    log(f"backend={jax.default_backend()}")

    cfg0 = solver.SolveConfig()
    tt, bz, bx = solver._stage_first(model, scx, scz, st[0][0], st[0][1],
                                     solver._COARSE_SEED_SIDE,
                                     float(solver._COARSE_SEED_SIGN), cfg0)
    tt, bz, bx = solver._stage_next(model, scx, scz, tt, bz, bx, st[1][0],
                                    st[1][1], cfg0)
    tt3, bz3, bx3 = solver._stage_next(model, scx, scz, tt, bz, bx, st[2][0],
                                       st[2][1], cfg0)
    jax.block_until_ready(tt3)

    # baseline field
    base_field = solver._stage_final(model, tt3, bz3, bx3, cfg0)
    jax.block_until_ready(base_field)

    def field_diff(f):
        d = jnp.max(jnp.abs(f - base_field) / jnp.maximum(base_field, 1e-12))
        return float(d)

    variants = [
        ("block8 polish5 tol1e-3 (baseline)", cfg0),
        ("block16", solver.SolveConfig(sweep_block=16)),
        ("block32", solver.SolveConfig(sweep_block=32)),
        ("polish2", solver.SolveConfig(polish_passes=2)),
        ("polish3", solver.SolveConfig(polish_passes=3)),
        ("polish2 tol2e-3", solver.SolveConfig(polish_passes=2,
                                               rel_tol=2e-3)),
        ("polish3 block16", solver.SolveConfig(polish_passes=3,
                                               sweep_block=16)),
    ]
    for name, cfg in variants:
        t0 = time.time()
        f = solver._stage_final(model, tt3, bz3, bx3, cfg)
        jax.block_until_ready(f)
        tc = time.time() - t0
        t, f = timeit(
            lambda a: solver._stage_final(model, a, bz3, bx3, cfg),
            lambda r: (fresh(tt3, r),),
        )
        log(f"final[{name}]: {t*1e3:.1f} ms (first {tc:.1f}s) "
            f"Linf-vs-base={field_diff(f):.2e}")

    # ---------------- rays --------------------------------------------------
    ttfs = base_field
    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / model.dnx)
    isy = np.round(sy / model.dnx)
    src_xy = jnp.asarray(np.stack([isx[pair_i] * SUBGRID,
                                   isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(np.stack([isx[pair_j] * SUBGRID,
                                   isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))

    base_opts = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=2,
                     max_steps=170, cand_stride=6.0)

    def run_rays(opts):
        return lambda s_, r_: rayslib.trace_rays(
            model, ttfs, tidx, s_, r_, SUBGRID, mode="interp", **opts)

    t, out = timeit(run_rays(base_opts),
                    lambda r: (fresh(src_xy, r), rec_xy))
    bx_, by_, ln_, tm_base = out
    log(f"rays[baseline]: {t*1e3:.1f} ms  max_len={int(ln_.max())} "
        f"mean_len={float(ln_.mean()):.1f}")

    def ray_diff(tm):
        d = jnp.abs(tm - tm_base) / tm_base
        return float(d.mean()), float(d.max())

    ray_variants = [
        ("max_steps=120", dict(base_opts, max_steps=120)),
        ("quad3", dict(base_opts, quad_vel=3)),
        ("step8 ms=120", dict(base_opts, step_scale=8, max_steps=120)),
        ("step8 quad3 ms=120", dict(base_opts, step_scale=8, quad_vel=3,
                                    max_steps=120)),
        ("relax1", dict(base_opts, relax_iters=1)),
    ]
    for name, opts in ray_variants:
        t, out = timeit(run_rays(opts), lambda r: (fresh(src_xy, r), rec_xy))
        tm = out[3]
        mn, mx = ray_diff(tm)
        log(f"rays[{name}]: {t*1e3:.1f} ms  dt mean={mn:.2e} max={mx:.2e} "
            f"max_len={int(out[2].max())}")

    # descent/auto tracer
    def run_auto(s_, r_):
        return rayslib.trace_rays_auto(
            model, ttfs, tidx, s_, r_, SUBGRID, mode="interp")

    t, out = timeit(run_auto, lambda r: (fresh(src_xy, r), rec_xy))
    tm = out[3]
    mn, mx = ray_diff(tm)
    log(f"rays[auto-descent]: {t*1e3:.1f} ms  dt mean={mn:.2e} max={mx:.2e}")


if __name__ == "__main__":
    main()
