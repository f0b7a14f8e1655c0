"""Multigrid final-stage: timing + accuracy vs default on the weld."""
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

    base_cfg = solver.SolveConfig()
    dt0, tt0 = t(lambda: solver.solve_ttf(model, scx, scz, 1, base_cfg))
    print(f"default: {dt0*1000:7.1f} ms")
    tt0 = np.asarray(tt0)

    for passes, polish, fp in [(12, 2, None), (8, 1, 6)]:
        kw = dict(multigrid=True, mg_passes=passes, mg_polish=polish)
        if fp is not None:
            kw["final_max_passes"] = fp
        cfg = dataclasses_replace(base_cfg, **kw)
        dt1, tt1 = t(lambda: solver.solve_ttf(model, scx, scz, 1, cfg))
        tt1 = np.asarray(tt1)
        d = np.abs(tt1 - tt0) / np.maximum(tt0, 1e-12)
        print(f"mg p={passes} pol={polish} fp={fp}: {dt1*1000:7.1f} ms  "
              f"vs default: max {d.max():.2e} mean {d.mean():.2e}")


import dataclasses
def dataclasses_replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


if __name__ == "__main__":
    main()
