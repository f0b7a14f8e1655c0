"""Benchmark: the reference's production workload (Weld_rays.py) on one TPU.

Weld model 424x500, 62 transducers, 31 receiver travel-time fields, 961
top-bottom ray paths (SURVEY.md section 6).  Prints ONE json line:

  {"metric": ..., "value": <warm wall-clock seconds>, "unit": "s",
   "vs_baseline": <baseline_s / value>}

Baseline: the driver's target of 1.0 s for the full workload on one chip
(BASELINE.md); vs_baseline > 1 means faster than target.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "examples"))
sys.path.insert(0, os.path.dirname(__file__))

from weld_rays import build_workload  # noqa: E402

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import rays as rayslib  # noqa: E402
from alifmm_tpu import solver  # noqa: E402

BASELINE_S = 1.0
SUBGRID = 9

# Production ray-march configuration: long-stride plane search with
# Simpson candidate scoring and quad-scored Fermat relaxation.  Validated
# against the reference-geometry tracer on this workload (bench_data
# diags): mean |dt|/t ~ 5.6e-3 with a -2.8e-3 bias -- i.e. the relaxed
# long-stride polylines are *better* Fermat minimisers than the
# reference's 1-cell-jitter paths; exact final integration throughout.
RAY_OPTS = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=2,
                max_steps=170, cand_stride=6.0)


def run_once(model, sx, sy, pairs, rec):
    ttfs = solver.solve_ttf(model, sx[rec], sy[rec], 1)
    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / model.dnx)
    isy = np.round(sy / model.dnx)
    src_xy = jnp.asarray(
        np.stack([isx[pair_i] * SUBGRID, isy[pair_i] * SUBGRID], 1)
    )
    rec_xy = jnp.asarray(
        np.stack([isx[pair_j] * SUBGRID, isy[pair_j] * SUBGRID], 1)
    )
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))
    out = rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp",
        **RAY_OPTS,
    )
    jax.block_until_ready(out)
    return out


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, dnx, dtype=jnp.float32
    )
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]

    run_once(model, sx, sy, pairs, rec)  # compile warm-up
    t0 = time.time()
    run_once(model, sx, sy, pairs, rec)
    dt = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "weld_31ttf_961rays_wall_clock",
                "value": round(dt, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
