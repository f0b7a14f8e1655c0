"""Descent tracer on the weld workload: time + accuracy vs t_field."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from weld_rays import build_workload
from alifmm_tpu import grid as gridlib
from alifmm_tpu import rays as rayslib
from alifmm_tpu import solver

SUBGRID = 9


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, dnx, dtype=jnp.float32
    )
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    ttfs = solver.solve_ttf(model, jnp.asarray(sx[rec]), jnp.asarray(sy[rec]), 1)
    jax.block_until_ready(ttfs)

    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / model.dnx)
    isy = np.round(sy / model.dnx)
    src_xy = jnp.asarray(np.stack([isx[pair_i] * SUBGRID, isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(np.stack([isx[pair_j] * SUBGRID, isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))
    t_field = np.asarray(ttfs)[np.asarray(tidx),
                               isy[pair_i].astype(int),
                               isx[pair_i].astype(int)]

    cfgs = [
        dict(step_scale=6.0, relax_iters=0),
        dict(step_scale=6.0, relax_iters=2),
        dict(step_scale=3.0, relax_iters=2),
    ]
    for kw in cfgs:
        f = lambda: rayslib.trace_rays_descent(
            model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp",
            return_reason=True, **kw)
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        o = f()
        jax.block_until_ready(o)
        dt = time.perf_counter() - t0
        ft = np.asarray(o[3])
        reason = np.asarray(o[4])
        d = np.abs(ft - t_field) / t_field
        sig = (ft - t_field) / t_field
        print(f"{kw}: {dt*1000:7.1f} ms  vs field: max {d.max():.2e} "
              f"mean {d.mean():.2e} p99 {np.percentile(d,99):.2e} "
              f"bias {sig.mean():+.1e} stalled {int((reason==1).sum())}")

    search_kw = dict(max_cross=8, step_scale=6, quad_vel=True,
                     max_steps=170, cand_stride=6.0)
    for dkw in (dict(step_scale=6.0, relax_iters=2),
                dict(step_scale=3.0, relax_iters=2)):
        f = lambda: rayslib.trace_rays_auto(
            model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp",
            descent_kw=dkw, search_kw=search_kw)
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        o = f()
        jax.block_until_ready(o)
        dt = time.perf_counter() - t0
        ft = np.asarray(o[3])
        d = np.abs(ft - t_field) / t_field
        print(f"auto {dkw}: {dt*1000:7.1f} ms  vs field: max {d.max():.2e} "
              f"mean {d.mean():.2e} p99 {np.percentile(d,99):.2e}")


if __name__ == "__main__":
    main()
