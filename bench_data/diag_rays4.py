"""Decompose fast-ray cost: march vs relax vs final integration."""

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

    base_kw = dict(max_cross=8, step_scale=6, quad_vel=True,
                   max_steps=170, cand_stride=6.0)
    dt0, o0 = t(lambda: rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy,
                                           SUBGRID, mode="interp",
                                           relax_iters=0, **base_kw))
    print(f"march + final integrate (relax=0): {dt0*1000:7.1f} ms")
    dt1, _ = t(lambda: rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy,
                                          SUBGRID, mode="interp",
                                          relax_iters=1, **base_kw))
    print(f"relax=1: {dt1*1000:7.1f} ms  (delta {1000*(dt1-dt0):.1f})")

    bx, by, lens = o0[0], o0[1], o0[2]
    mat_flat = rayslib._material_flat(model)
    f = jax.jit(lambda: rayslib.ray_times(model, mat_flat, bx, by, lens,
                                          SUBGRID, 18))
    dtf, _ = t(f)
    print(f"final ray_times alone (max_cross=18): {dtf*1000:7.1f} ms")
    f2 = jax.jit(lambda: rayslib.ray_times(model, mat_flat, bx, by, lens,
                                           SUBGRID, 18, chunk=176))
    dtf2, _ = t(f2)
    print(f"final ray_times chunk=P: {dtf2*1000:7.1f} ms")


if __name__ == "__main__":
    main()
