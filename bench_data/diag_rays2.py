"""Where do fast-knob ray times diverge?  Compare (a) default-knob times,
(b) fast-knob times, (c) the receiver TTF sampled at the source -- an
independent first-arrival estimate -- and correlate with truncation
reasons."""

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

    # independent estimate: receiver field at the source node
    t_field = np.asarray(ttfs)[np.asarray(tidx),
                               isy[pair_i].astype(int),
                               isx[pair_i].astype(int)]

    base = rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy, SUBGRID,
                              mode="interp", return_reason=True)
    jax.block_until_ready(base)
    bt = np.asarray(base[3])
    breason = np.asarray(base[4])

    fast = rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy, SUBGRID,
                              mode="interp", max_cross=8, step_scale=3,
                              quad_vel=True, relax_iters=1,
                              max_steps=330, return_reason=True)
    jax.block_until_ready(fast)
    ft = np.asarray(fast[3])
    freason = np.asarray(fast[4])

    print("reasons base:", np.bincount(breason, minlength=3),
          " fast:", np.bincount(freason, minlength=3))
    db = np.abs(bt - t_field) / t_field
    df = np.abs(ft - t_field) / t_field
    print("base vs field: max %.2e mean %.2e p99 %.2e" %
          (db.max(), db.mean(), np.percentile(db, 99)))
    print("fast vs field: max %.2e mean %.2e p99 %.2e" %
          (df.max(), df.mean(), np.percentile(df, 99)))
    # worst fast-vs-base offenders
    d = np.abs(ft - bt) / bt
    order = np.argsort(d)[::-1][:10]
    for k in order:
        print(f"pair ({pair_i[k]},{pair_j[k]}): base {bt[k]:.4e} "
              f"(r{breason[k]}) fast {ft[k]:.4e} (r{freason[k]}) "
              f"field {t_field[k]:.4e}  d={d[k]:.2e}")


if __name__ == "__main__":
    main()
