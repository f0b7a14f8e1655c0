"""Round-2b: search vs descent vs auto tracer on the weld workload (TPU).

Quality metric without an oracle (tune_rays.py rationale): all tracers
integrate their final polyline exactly, and rays are Fermat minimisers,
so lower summed/mean times = strictly better paths.  Reports warm
wall-clock and signed relative time deltas vs the production search
config (bench.py RAY_OPTS).
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
BASE = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=1,
            relax_quad=3, max_steps=170, cand_stride=6.0)


def main():
    T0 = time.time()

    def log(m):
        print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

    cfg = solver.SolveConfig(final_rel_tol=2e-3, final_polish_passes=3,
                             sweep_block=4)
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    ttfs = solver.solve_ttf(model, jnp.asarray(sx[rec]), jnp.asarray(sy[rec]),
                            1, cfg)
    jax.block_until_ready(ttfs)
    float(jnp.asarray(ttfs).ravel()[0])
    log("fields ready")

    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / dnx)
    isy = np.round(sy / dnx)
    src_xy = jnp.asarray(np.stack([isx[pair_i] * SUBGRID,
                                   isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(np.stack([isx[pair_j] * SUBGRID,
                                   isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))

    def timed(name, fn, reps=3):
        t0 = time.time()
        out = fn(0.0)
        t_i = np.asarray(out[3], dtype=np.float64)
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        best = 1e9
        for r in range(1, reps + 1):
            t0 = time.time()
            out = fn(r * 1e-9)
            float(jnp.asarray(out[3]).ravel()[0])
            best = min(best, time.time() - t0)
        log(f"{name}: warm {best*1e3:.0f} ms")
        return t_i, best

    results = {}

    def run_search(e):
        return rayslib.trace_rays(model, ttfs, tidx, src_xy + e, rec_xy,
                                  SUBGRID, mode="interp", **BASE)

    results["search(base)"] = timed("search(base)", run_search)
    t_base = results["search(base)"][0]

    for name, kw in [
        ("descent k5", dict(score_k=5, score_stride=2.0, relax_iters=1,
                            relax_quad=3, step_scale=6.0, max_steps=170,
                            max_cross=8)),
        ("descent k0", dict(score_k=0, relax_iters=1, relax_quad=3,
                            step_scale=6.0, max_steps=170, max_cross=8)),
    ]:
        def run_d(e, kw=kw):
            return rayslib.trace_rays_descent(
                model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID,
                mode="interp", **kw)
        results[name] = timed(name, run_d)

    for name, (t_i, best) in results.items():
        d = (t_i - t_base) / t_base
        print(f"{name:16s} warm {best*1e3:6.0f} ms   dt/t mean "
              f"{d.mean():+.2e}  p99 {np.percentile(d, 99):+.2e}  "
              f"max {d.max():+.2e}", flush=True)


if __name__ == "__main__":
    main()
