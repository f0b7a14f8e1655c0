"""Solver pass-budget sweep: time + accuracy vs the default config."""

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

def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, dnx, dtype=jnp.float32
    )
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec]); scz = jnp.asarray(sy[rec])

    ref = None
    for (mp, fp, pp) in [(10, 16, 5), (8, 10, 4), (6, 8, 3), (6, 6, 2),
                         (4, 5, 2)]:
        cfg = solver.SolveConfig(patch_max_passes=mp, final_max_passes=fp,
                                 polish_passes=pp)
        f = lambda: solver.solve_ttf(model, scx, scz, 1, cfg)
        out = f(); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(); jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        a = np.asarray(out)
        if ref is None:
            ref = a
            print(f"patch={mp} final={fp} polish={pp}: {dt*1000:7.1f} ms (ref)")
        else:
            d = np.abs(a - ref) / np.maximum(ref, 1e-30)
            print(f"patch={mp} final={fp} polish={pp}: {dt*1000:7.1f} ms  "
                  f"rel vs ref: max {d.max():.2e} mean {d.mean():.2e}")


if __name__ == "__main__":
    main()
