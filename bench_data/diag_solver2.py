"""Per-stage timing of the telescoped weld solve (31 sources)."""

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
from alifmm_tpu import solver


def t(f, *a, **k):
    o = f(*a, **k); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*a, **k); jax.block_until_ready(o)
    return time.perf_counter() - t0, o


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, dnx, dtype=jnp.float32
    )
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec]); scz = jnp.asarray(sy[rec])
    cfg = solver.SolveConfig()
    stages = solver._COARSE_STAGES
    seed_side = solver._COARSE_SEED_SIDE
    seed_sign = solver._COARSE_SEED_SIGN

    (h0, f0) = stages[0]
    dt1, (tt, bz, bx) = t(solver._stage_first, model, scx, scz, h0, f0,
                          seed_side, float(seed_sign), cfg)
    print(f"stage1 (27x, half={h0}): {dt1*1000:7.1f} ms")
    prev = (tt, bz, bx)
    for i, (h, f) in enumerate(stages[1:]):
        dt2, (tt, bz, bx) = t(solver._stage_next, model, scx, scz, *prev, h,
                              f, cfg)
        print(f"stage{i+2} ({f}x, half={h}): {dt2*1000:7.1f} ms")
        prev = (tt, bz, bx)
    dtf, out = t(solver._stage_final, model, *prev, cfg)
    print(f"stage_final (424x500): {dtf*1000:7.1f} ms")


if __name__ == "__main__":
    main()
