"""Measure actual weld ray lengths and the effect of max_steps on the ray
phase (march while_loop already early-exits; relax/integrate scale with the
padded buffer P = max_steps + 2)."""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo/examples")
sys.path.insert(0, "/root/repo")

from weld_rays import build_workload  # noqa: E402

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import rays as rayslib  # noqa: E402
from alifmm_tpu import solver  # noqa: E402

SUBGRID = 9
BASE = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=1,
            relax_quad=3, cand_stride=6.0)
SOLVE_KW = dict(final_rel_tol=2e-3, final_polish_passes=3, sweep_block=4)


def main():
    cfg = solver.SolveConfig(**SOLVE_KW)
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / dnx)
    isy = np.round(sy / dnx)
    src_xy = jnp.asarray(
        np.stack([isx[pair_i] * SUBGRID, isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(
        np.stack([isx[pair_j] * SUBGRID, isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))
    ttfs = solver.solve_ttf(model, jnp.asarray(sx[rec]), jnp.asarray(sy[rec]),
                            1, cfg)
    ttfs = jax.block_until_ready(ttfs)

    def run(ms, eps):
        return rayslib.trace_rays(
            model, ttfs, tidx, src_xy + eps, rec_xy, SUBGRID, mode="interp",
            max_steps=ms, **BASE)

    out = jax.block_until_ready(run(170, 0.0))
    lens = np.asarray(out[2])
    t170 = np.asarray(out[3], np.float64)
    print(json.dumps({"len_max": int(lens.max()), "len_p99": int(
        np.percentile(lens, 99)), "len_mean": float(lens.mean())}),
        flush=True)

    for ms in (170, int(lens.max()) + 8, 128):
        out = jax.block_until_ready(run(ms, 0.0))
        best = 1e9
        for r in (1, 2, 3):
            t0 = time.time()
            o = run(ms, 1e-9 * r)
            jax.block_until_ready(o)
            float(np.asarray(o[3]).ravel()[0])
            best = min(best, time.time() - t0)
        t = np.asarray(out[3], np.float64)
        d = (t - t170) / t170
        print(json.dumps({"max_steps": ms, "s": round(best, 4),
                          "dt_mean": float(np.abs(d).mean()),
                          "dt_max": float(np.abs(d).max())}), flush=True)


if __name__ == "__main__":
    main()
