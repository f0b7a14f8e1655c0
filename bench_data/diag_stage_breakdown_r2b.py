"""Per-phase timing with bench.py's EXACT production config (warm cache
after a bench run), plus patch-block variants for the three patch stages.

Usage: python bench_data/diag_stage_breakdown_r2b.py [--variants]
"""
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
RAY_OPTS = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=1,
                relax_quad=3, max_steps=170, cand_stride=6.0)
SOLVE_KW = dict(final_rel_tol=2e-3, final_polish_passes=3, sweep_block=4)


def emit(name, seconds):
    print(json.dumps({"phase": name, "s": round(seconds, 4)}), flush=True)


def timed(name, fn, reps=3):
    out = fn(0.0)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # true sync
    best = 1e9
    for r in range(1, reps + 1):
        eps = 1e-9 * r
        t0 = time.time()
        out = fn(eps)
        jax.block_until_ready(out)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - t0)
    emit(name, best)
    return fn(0.0)


def main():
    variants = "--variants" in sys.argv
    cfg = solver.SolveConfig(**SOLVE_KW)
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])
    st = solver._COARSE_STAGES
    ss = solver._COARSE_SEED_SIDE
    sg = float(solver._COARSE_SEED_SIGN)

    def stages_for(c):
        out1 = timed(f"stage1_27x_pb{c.patch_block}", lambda e: solver._stage_first(
            model, scx + e, scz, st[0][0], st[0][1], ss, sg, c))
        tt1, bz1, bx1 = jax.block_until_ready(out1)
        out2 = timed(f"stage2_9x_pb{c.patch_block}", lambda e: solver._stage_next(
            model, scx + e, scz, tt1, bz1, bx1, st[1][0], st[1][1], c))
        tt2, bz2, bx2 = jax.block_until_ready(out2)
        out3 = timed(f"stage3_3x_pb{c.patch_block}", lambda e: solver._stage_next(
            model, scx + e, scz, tt2, bz2, bx2, st[2][0], st[2][1], c))
        return jax.block_until_ready(out3)

    tt3, bz3, bx3 = stages_for(cfg)
    ttfs = timed("stage_final", lambda e: solver._stage_final(
        model, tt3 + e, bz3, bx3, cfg))
    ttfs = jax.block_until_ready(ttfs)

    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / dnx)
    isy = np.round(sy / dnx)
    src_xy = jnp.asarray(
        np.stack([isx[pair_i] * SUBGRID, isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(
        np.stack([isx[pair_j] * SUBGRID, isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))

    timed("rays_961", lambda e: rayslib.trace_rays(
        model, ttfs, tidx, src_xy + e, rec_xy, SUBGRID, mode="interp",
        **RAY_OPTS))

    if variants:
        for pb in (8, 16):
            c = solver.SolveConfig(patch_block=pb, **SOLVE_KW)
            stages_for(c)


if __name__ == "__main__":
    main()
