"""In-process A/B: sorted closed-form segment integrator vs the sequential
crossing walk, on the weld ray workload's final-integration shape.
Also re-times the production candidate config with best-of-6 reps.
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
BASE = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=1,
            relax_quad=3, max_steps=170, cand_stride=6.0)


def ray_times_walk(model, mat_flat, ray_x, ray_y, lengths, subgrid_size,
                   max_cross, chunk=256):
    R, P = ray_x.shape
    n_seg = P - 1
    n_chunks = -(-n_seg // chunk)
    pad = n_chunks * chunk - n_seg

    def prep(a):
        a = jnp.pad(a, ((0, 0), (0, pad)))
        return jnp.moveaxis(a.reshape(R, n_chunks, chunk), 1, 0)

    x1 = prep(ray_x[:, :-1])
    y1 = prep(ray_y[:, :-1])
    x2 = prep(ray_x[:, 1:])
    y2 = prep(ray_y[:, 1:])
    idx = jnp.arange(n_seg + pad).reshape(n_chunks, 1, chunk)[:, 0, :]

    def one_chunk(args):
        cx1, cy1, cx2, cy2, cidx = args
        seg_t = rayslib._segment_time_walk(
            model, mat_flat, cx1, cy1, cx2, cy2, subgrid_size, max_cross
        )
        mask = (cidx[None, :] + 1) < lengths[:, None]
        return jnp.sum(jnp.where(mask, seg_t, 0.0), axis=1)

    per_chunk = jax.lax.map(one_chunk, (x1, y1, x2, y2, idx))
    return jnp.sum(per_chunk, axis=0)


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

    def timed(name, fn, reps=6):
        t0 = time.time()
        out = fn(0.0)
        jax.block_until_ready(out)
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        ts = []
        for r in range(1, reps + 1):
            t0 = time.time()
            out = fn(r * 1e-9)
            jax.block_until_ready(out)
            float(jnp.asarray(out[-1]).ravel()[0])
            ts.append(time.time() - t0)
        ts = np.array(ts) * 1e3
        log(f"{name}: best {ts.min():.0f} ms  median {np.median(ts):.0f} ms")
        return out, ts.min()

    out_c, _ = timed("cand full", lambda e: rayslib.trace_rays(
        model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
        **CAND))
    bx, by, ln = out_c[0], out_c[1], out_c[2]
    mat_flat = rayslib._material_flat(model)
    P = bx.shape[1]

    # integrator A/B on identical polylines, k_eff=9 budgets
    fc_sorted = max(-(-8 // 2) + 1, 9 + 4)       # 13 per axis
    fc_walk = max(8, 2 * 9 + 6)                  # 24 combined (old rule)

    def integ_sorted(e):
        return (rayslib.ray_times(model, mat_flat, bx + e, by, ln, SUBGRID,
                                  fc_sorted, chunk=min(P - 1, 256)),)

    def integ_walk(e):
        return (ray_times_walk(model, mat_flat, bx + e, by, ln, SUBGRID,
                               fc_walk, chunk=min(P - 1, 256)),)

    (ts_out, _) = timed("integ sorted", jax.jit(integ_sorted))
    (tw_out, _) = timed("integ walk", jax.jit(integ_walk))
    d = np.asarray(ts_out[0]) - np.asarray(tw_out[0])
    log(f"sorted-vs-walk time delta: max abs {np.abs(d).max():.3e} s")

    timed("base full", lambda e: rayslib.trace_rays(
        model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
        **BASE))


if __name__ == "__main__":
    main()
