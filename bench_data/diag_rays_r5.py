"""Round-5 ray-phase breakdown on the weld workload (real TPU).

Where do the 0.40 s go?  Times the production trace_rays config against
ablations (no relax, integration alone) and reports per-ray step counts,
so the march / relax / exact-integration split is measured, not modeled.
Quality metric as in tune_rays2.py: all configs integrate exactly, rays
are Fermat minimisers, so lower times = strictly better paths.
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
        jax.block_until_ready(out)
        t_i = np.asarray(out[3], dtype=np.float64) if len(out) > 3 else None
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        best = 1e9
        for r in range(1, reps + 1):
            t0 = time.time()
            out = fn(r * 1e-9)
            jax.block_until_ready(out)
            float(jnp.asarray(out[-1]).ravel()[0])
            best = min(best, time.time() - t0)
        log(f"{name}: warm {best*1e3:.0f} ms")
        return out, t_i, best

    out_b, t_base, ms_base = timed(
        "base", lambda e: rayslib.trace_rays(
            model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
            **BASE))
    lens = np.asarray(out_b[2])
    log(f"step counts: max {lens.max()}  p99 {np.percentile(lens, 99):.0f}"
        f"  mean {lens.mean():.1f}")

    kw0 = dict(BASE, relax_iters=0)
    out_0, t_nr, ms_norelax = timed(
        "no-relax", lambda e: rayslib.trace_rays(
            model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
            **kw0))

    # exact integration alone on the base polylines
    mat_flat = rayslib._material_flat(model)
    bx, by, ln = out_b[0], out_b[1], out_b[2]
    final_cross = max(BASE["max_cross"], 2 * BASE["step_scale"] + 6)

    def integ(e):
        t = rayslib.ray_times(model, mat_flat, bx + e, by, ln, SUBGRID,
                              final_cross, chunk=min(bx.shape[1] - 1, 256))
        return (t,)

    _, _, ms_integ = timed("integrate", jax.jit(integ))

    # relax alone (1 iter, quad3) on the no-relax polylines
    bx0, by0, ln0 = out_0[0], out_0[1], out_0[2]

    def relax(e):
        rx, ry = rayslib.relax_rays(
            model, mat_flat, bx0 + e, by0, ln0, SUBGRID, iters=1,
            max_cross=max(8, 2 * 6 + 6), quad=3,
            chunk=min(bx0.shape[1] - 2, 256))
        return (rx, ry)

    _, _, ms_relax = timed("relax", jax.jit(relax))

    march = ms_norelax - ms_integ
    log(f"SPLIT: march ~{march*1e3:.0f} ms, relax ~{ms_relax*1e3:.0f} ms, "
        f"integrate ~{ms_integ*1e3:.0f} ms, total base {ms_base*1e3:.0f} ms")

    # adaptive (material-aware) stride: long steps in the uniform parent
    # metal, reference stride near the weld.  max_steps must stay ABOVE the
    # realized step count: truncated rays get their appended straight tail
    # under-integrated by the capped crossing walk (measured: the
    # max_steps=120/96 ablations reported impossibly 'better' times).
    # baseline truncation stats (guard-stopped rays get their appended tail
    # under-integrated by the capped crossing walk, so dt stats are only
    # valid on rays that ARRIVED in both configs)
    outr = rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy, SUBGRID,
                              mode="interp", return_reason=True, **BASE)
    reas_b = np.asarray(outr[4])
    log(f"base reasons: arrived {np.sum(reas_b == 0)}, oob "
        f"{np.sum(reas_b == 1)}, increasing {np.sum(reas_b == 2)}")

    for name, kw in [
        ("s9 pd5 q3 c7", dict(BASE, step_scale=9, plane_dist=5,
                              cand_stride=7.0, max_steps=115, quad_vel=3)),
    ]:
        out, t_i, best = timed(
            name, lambda e, kw=kw: rayslib.trace_rays(
                model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID,
                mode="interp", return_reason=True, **kw))
        d = (t_i - t_base) / t_base
        ln2 = np.asarray(out[2])
        reas = np.asarray(out[4])
        ok = (reas == 0) & (reas_b == 0)
        do = d[ok]
        log(f"  arrived {np.sum(reas == 0)}/961  dt/t(ok) mean "
            f"{do.mean():+.2e} p99 {np.percentile(do,99):+.2e} max "
            f"{do.max():+.2e}  maxlen {ln2.max()} (cap {kw['max_steps']})")


if __name__ == "__main__":
    main()
