"""Breakdown timing of the weld benchmark: solve stages vs ray tracing."""

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


def t(label, f, *a, **k):
    out = f(*a, **k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*a, **k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt*1000:10.1f} ms")
    return out


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, dnx, dtype=jnp.float32
    )
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx, scz = sx[rec], sy[rec]
    cfg = solver.SolveConfig()

    # stage-by-stage
    base = model
    stages, seed_side, seed_sign = (
        solver._COARSE_STAGES, solver._COARSE_SEED_SIDE, solver._COARSE_SEED_SIGN
    )
    scx_j, scz_j = jnp.asarray(scx), jnp.asarray(scz)
    (h0, f0) = stages[0]
    r1 = t("stage_first (27x patch)", solver._stage_first, base, scx_j, scz_j,
           h0, f0, seed_side, float(seed_sign), cfg)
    tt, bz, bx = r1
    for (h, f) in stages[1:]:
        r = t(f"stage_next half={h} f={f}", solver._stage_next, base, scx_j,
              scz_j, tt, bz, bx, h, f, cfg)
        tt, bz, bx = r
    ttfs = t("stage_final (full grid)", solver._stage_final, base, tt, bz, bx,
             cfg)

    # rays
    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / model.dnx)
    isy = np.round(sy / model.dnx)
    src_xy = jnp.asarray(np.stack([isx[pair_i] * SUBGRID, isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(np.stack([isx[pair_j] * SUBGRID, isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))
    t("trace_rays (961)", rayslib.trace_rays, model, ttfs, tidx, src_xy,
      rec_xy, SUBGRID, mode="interp")


if __name__ == "__main__":
    main()
