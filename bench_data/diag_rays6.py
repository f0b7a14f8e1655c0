"""Tracer accuracy vs the reference-geometry plane search (the oracle)."""
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


def t(f):
    o = f(); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(); jax.block_until_ready(o)
    return time.perf_counter() - t0, o


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

    # oracle: reference-geometry plane search (stride 1, default stepping)
    dt_ref, o_ref = t(lambda: rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp"))
    t_ref = np.asarray(o_ref[3])
    print(f"oracle (default search): {dt_ref*1000:7.1f} ms")

    def rep(name, dt, times):
        d = np.abs(times - t_ref) / t_ref
        sig = (times - t_ref) / t_ref
        print(f"{name}: {dt*1000:7.1f} ms  vs oracle: max {d.max():.2e} "
              f"mean {d.mean():.2e} p99 {np.percentile(d, 99):.2e} "
              f"bias {sig.mean():+.1e}")

    cfgs = [
        ("search ss6 st6 rx2", dict(max_cross=8, step_scale=6, quad_vel=True,
                                    relax_iters=2, max_steps=170,
                                    cand_stride=6.0)),
        ("search ss4 st4.5 rx2", dict(max_cross=8, step_scale=4,
                                      quad_vel=True, relax_iters=2,
                                      max_steps=250, cand_stride=4.5)),
        ("search ss6 st3 rx1", dict(max_cross=8, step_scale=6, quad_vel=True,
                                    relax_iters=1, max_steps=170,
                                    cand_stride=3.0)),
    ]
    for name, kw in cfgs:
        dt1, o1 = t(lambda: rayslib.trace_rays(
            model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp", **kw))
        rep(name, dt1, np.asarray(o1[3]))

    for name, kw in [("descent ss6 rx2", dict(step_scale=6.0, relax_iters=2)),
                     ("descent ss6 rx4", dict(step_scale=6.0, relax_iters=4))]:
        dt1, o1 = t(lambda: rayslib.trace_rays_descent(
            model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp", **kw))
        rep(name, dt1, np.asarray(o1[3]))


if __name__ == "__main__":
    main()
