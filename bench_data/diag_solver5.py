"""Blocked-sweep timing on the weld: block 1 vs defaults (8/4)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from weld_rays import build_workload
from alifmm_tpu import grid as gridlib
from alifmm_tpu import solver


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
    scx = jnp.asarray(sx[rec]); scz = jnp.asarray(sy[rec])

    cfg1 = dataclasses.replace(solver.SolveConfig(), sweep_block=1,
                               patch_block=1)
    dt0, tt0 = t(lambda: solver.solve_ttf(model, scx, scz, 1, cfg1))
    print(f"block 1/1: {dt0*1000:7.1f} ms")
    tt0 = np.asarray(tt0)

    for sb, pb in [(8, 4), (16, 8), (32, 8)]:
        cfg = dataclasses.replace(solver.SolveConfig(), sweep_block=sb,
                                  patch_block=pb)
        dt1, tt1 = t(lambda: solver.solve_ttf(model, scx, scz, 1, cfg))
        tt1 = np.asarray(tt1)
        d = np.abs(tt1 - tt0) / np.maximum(tt0, 1e-12)
        print(f"block {sb}/{pb}: {dt1*1000:7.1f} ms  vs block1: "
              f"max {d.max():.2e} mean {d.mean():.2e}")


if __name__ == "__main__":
    main()
