"""Round-5: what sets the ~1.3 ms/iteration floor of the ray march?

Probes, on the real TPU: (a) a bare while_loop with one tiny gather per
iteration (the loop-mechanism floor), (b) the production march with the
candidate count cut to ~3 (the candidate-work share), (c) the march as
usual.  If (a) ~ (c) the iteration count is the only lever; if (a) is
small the candidate work still has headroom.
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
CAND = dict(max_cross=8, step_scale=9, plane_dist=5, quad_vel=3,
            relax_iters=1, relax_quad=3, max_steps=115, cand_stride=7.0)

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def timed(name, fn, reps=5):
    t0 = time.time()
    out = fn(0.0)
    float(jnp.asarray(out[-1]).ravel()[0])
    log(f"{name}: compile+run {time.time()-t0:.1f}s")
    ts = []
    for r in range(1, reps + 1):
        t0 = time.time()
        out = fn(r * 1e-7)
        float(jnp.asarray(out[-1]).ravel()[0])
        ts.append(time.time() - t0)
    ts = np.array(ts) * 1e3
    log(f"{name}: best {ts.min():.0f} ms  median {np.median(ts):.0f} ms")
    return out


def main():
    cfg = solver.SolveConfig(final_rel_tol=2e-3, final_polish_passes=3,
                             sweep_block=4, patch_block=2)
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    ttfs = solver.solve_ttf(model, jnp.asarray(sx[rec]), jnp.asarray(sy[rec]),
                            1, cfg)
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

    # (a) bare while-loop floor: 110 iterations, one gather + fma on (961,)
    flat = ttfs.reshape(-1)

    @jax.jit
    def bare(eps):
        def body(state):
            x, k = state
            idx = (x * 1e5).astype(jnp.int32) % flat.shape[0]
            v = jnp.take(flat, idx)
            return (x + v * 1e-9 + eps, k + 1)

        def cond(state):
            return state[1] < 110

        x, _ = jax.lax.while_loop(cond, body,
                                  (jnp.zeros((961,), jnp.float32), 0))
        return (x,)

    timed("bare while 110x1gather", bare)

    # (a2) bare while with 12 dependent gathers per iteration
    @jax.jit
    def bare12(eps):
        def body(state):
            x, k = state
            for _ in range(12):
                idx = (x * 1e5).astype(jnp.int32) % flat.shape[0]
                x = x + jnp.take(flat, idx) * 1e-9 + eps
            return (x, k + 1)

        def cond(state):
            return state[1] < 110

        x, _ = jax.lax.while_loop(cond, body,
                                  (jnp.zeros((961,), jnp.float32), 0))
        return (x,)

    timed("bare while 110x12gather", bare12)

    # (b) candidate work cut to K=3
    kw3 = dict(CAND, cand_stride=46.0)
    timed("march K=3", lambda e: rayslib.trace_rays(
        model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
        **kw3))

    # (c) production march
    timed("march K=14", lambda e: rayslib.trace_rays(
        model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
        **CAND))

    # (d) no-relax variant to isolate the march itself
    timed("march K=14 norelax", lambda e: rayslib.trace_rays(
        model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
        **dict(CAND, relax_iters=0)))


if __name__ == "__main__":
    main()
