"""Compile + validate + time the Pallas sweep kernel on real TPU."""

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


def t(label, f, *a, **k):
    out = f(*a, **k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*a, **k)
    jax.block_until_ready(out)
    print(f"{label:44s} {(time.perf_counter()-t0)*1000:10.1f} ms")
    return out


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, dnx, dtype=jnp.float32
    )
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx, scz = jnp.asarray(sx[rec]), jnp.asarray(sy[rec])
    cfg = solver.SolveConfig()
    stages, seed_side, seed_sign = (
        solver._COARSE_STAGES, solver._COARSE_SEED_SIDE,
        solver._COARSE_SEED_SIGN,
    )

    print("pallas supported:", __import__(
        "alifmm_tpu.ops.pallas_sweep", fromlist=["supports_model"]
    ).supports_model(model))

    outs = {}
    for up in (False, True):
        (h0, f0) = stages[0]
        r = t(f"stage_first up={up}", solver._stage_first, model, scx, scz,
              h0, f0, seed_side, float(seed_sign), cfg, up)
        tt, bz, bx = r
        for (h, f) in stages[1:]:
            r = t(f"stage_next h={h} f={f} up={up}", solver._stage_next,
                  model, scx, scz, tt, bz, bx, h, f, cfg, up)
            tt, bz, bx = r
        outs[up] = t(f"stage_final up={up}", solver._stage_final, model, tt,
                     bz, bx, cfg, up)

    a = np.asarray(outs[False])
    b = np.asarray(outs[True])
    rel = np.abs(a - b) / np.maximum(np.minimum(a, b), 1e-12)
    big = a > 0.2 * a.max()
    print(f"pallas vs xla field: max rel {rel.max():.3e} "
          f"mean {rel.mean():.3e} significant-max {rel[big].max():.3e}")


if __name__ == "__main__":
    main()
