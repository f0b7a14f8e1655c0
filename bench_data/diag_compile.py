"""Phase-by-phase cold-compile + warm-run timing of the bench pipeline."""
import os
import sys
import time

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
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
RAY_OPTS = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=2,
                max_steps=170, cand_stride=6.0)


def t(label, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {time.time()-t0:.1f}s", flush=True)
    return out


def main():
    sb = int(os.environ.get("SWEEP_BLOCK", "8"))
    pb = int(os.environ.get("PATCH_BLOCK", "4"))
    cfg = solver.SolveConfig(sweep_block=sb, patch_block=pb)
    print(f"blocks: sweep={sb} patch={pb}", flush=True)

    t0 = time.time()
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    print(f"model build: {time.time()-t0:.1f}s", flush=True)

    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])
    st = solver._COARSE_STAGES
    up = False
    for rep in ("cold", "warm"):
        tt, bz, bx = t(f"{rep} stage1 (27x)", lambda: solver._stage_first(
            model, scx, scz, st[0][0], st[0][1], solver._COARSE_SEED_SIDE,
            float(solver._COARSE_SEED_SIGN), cfg, use_pallas=up))
        tt, bz, bx = t(f"{rep} stage2 (9x)", lambda: solver._stage_next(
            model, scx, scz, tt, bz, bx, st[1][0], st[1][1], cfg,
            use_pallas=up))
        tt, bz, bx = t(f"{rep} stage3 (3x)", lambda: solver._stage_next(
            model, scx, scz, tt, bz, bx, st[2][0], st[2][1], cfg,
            use_pallas=up))
        ttfs = t(f"{rep} final", lambda: solver._stage_final(
            model, tt, bz, bx, cfg, use_pallas=up))

    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / dnx)
    isy = np.round(sy / dnx)
    src_xy = jnp.asarray(np.stack([isx[pair_i] * SUBGRID,
                                   isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(np.stack([isx[pair_j] * SUBGRID,
                                   isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))
    for rep in ("cold", "warm"):
        t(f"{rep} trace_rays", lambda: rayslib.trace_rays(
            model, ttfs, tidx, src_xy, rec_xy, SUBGRID, mode="interp",
            **RAY_OPTS))


main()
