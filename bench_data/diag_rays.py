"""Diagnose trace_rays cost: iteration counts, max_cross sensitivity."""

import os
import sys
import time

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

    out = rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy, SUBGRID,
                             mode="interp")
    jax.block_until_ready(out)
    bx, by, length, times = out
    ln = np.asarray(length)
    print("ray count:", ln.shape[0])
    print("length: min %d  median %d  p90 %d  max %d" %
          (ln.min(), np.median(ln), np.percentile(ln, 90), ln.max()))
    print("max_steps =", 5 * (model.shape[0] + model.shape[1]))

    # timing vs (max_cross, step_scale, quad_vel, relax_iters)
    for mc, ks, qv, rx in [(8, 3, True, 1), (8, 3, True, 2), (8, 3, True, 3),
                           (8, 4, True, 2)]:
        ms = -(-int(ln.max() + 30) // ks) + 10
        f = lambda: rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy,
                                       SUBGRID, mode="interp", max_cross=mc,
                                       step_scale=ks, quad_vel=qv,
                                       max_steps=ms, relax_iters=rx)
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        o = f()
        jax.block_until_ready(o)
        dt = time.perf_counter() - t0
        rel = np.abs(np.asarray(o[3]) - np.asarray(times)) / np.asarray(times)
        print(f"max_cross={mc} step={ks} quad={int(qv)} relax={rx}: "
              f"{dt*1000:8.1f} ms  "
              f"rel diff vs base max {rel.max():.2e} mean {rel.mean():.2e}")


if __name__ == "__main__":
    main()
