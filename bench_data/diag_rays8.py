"""Ablation: what dominates the plane-search march on the weld?

Monkeypatches rays._sample_ttf / segment_time_quad with cheap stand-ins and
forces a retrace via distinct max_steps values.  Times are NOT semantically
meaningful -- only the deltas matter.
"""
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

    base_kw = dict(max_cross=8, step_scale=6, quad_vel=True,
                   relax_iters=0, cand_stride=6.0)

    orig_sample = rayslib._sample_ttf
    orig_quad = rayslib.segment_time_quad

    def run(ms):
        f = lambda: rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy,
                                       SUBGRID, mode="interp", max_steps=ms,
                                       **base_kw)
        return t(f)[0]

    dt = run(170)
    print(f"full march (relax 0):        {dt*1000:7.1f} ms")

    def fake_sample(ttf, x, y, s, mode):
        return (x + y) * 1e-9
    rayslib._sample_ttf = fake_sample
    dt = run(171)
    print(f"no TTF sampling:             {dt*1000:7.1f} ms")

    rayslib._sample_ttf = orig_sample

    def fake_quad(model_, mat_flat, x1, y1, x2, y2, s):
        return jnp.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2) * (1e-3 / 3000.0)
    rayslib.segment_time_quad = fake_quad
    dt = run(172)
    print(f"no material scoring:         {dt*1000:7.1f} ms")

    rayslib._sample_ttf = fake_sample
    dt = run(173)
    print(f"neither:                     {dt*1000:7.1f} ms")

    rayslib._sample_ttf = orig_sample
    rayslib.segment_time_quad = orig_quad


if __name__ == "__main__":
    main()
