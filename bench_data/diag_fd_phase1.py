"""FD-only phase-1 for the weld final stage: per-pass cost + accuracy.

The final full-grid stage costs ~0.31 s (FINDINGS_r2): a while_loop of
full-ALI GS passes (phase 1, min-accumulation) + 3 replace-polish passes.
The FD update (4 stencil families) is much cheaper per line than the full
16-stencil ALI machinery; phase 1 only needs to *approach* the solution
(polish sets final values).  Measures:

  1. per-pass wall time: ALI vs FD (strict GS, block=4, weld final stage)
  2. convergence profile for three phase-1 variants:
       a) ALI passes (production)
       b) FD passes
       c) FD passes + ALI polish
  3. field + ray-time deviation of (c) vs production.
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/examples")
sys.path.insert(0, "/root/repo")

from weld_rays import build_workload

from alifmm_tpu import grid as gridlib
from alifmm_tpu import rays as rayslib
from alifmm_tpu import solver
from alifmm_tpu.ops import sweep
from alifmm_tpu.ops.stencils import INF

SUBGRID = 9
T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def sync(x):
    jax.block_until_ready(x)
    float(jnp.asarray(x).ravel()[0])
    return x


def main():
    cfg = solver.SolveConfig(final_rel_tol=2e-3, final_polish_passes=3,
                             sweep_block=4)
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])

    # patch stages -> final-stage injected input
    (h0, f0) = solver._COARSE_STAGES[0]
    tt, bz, bx = solver._stage_first(
        model, scx, scz, h0, f0, solver._COARSE_SEED_SIDE,
        float(solver._COARSE_SEED_SIGN), cfg)
    for (h, f) in solver._COARSE_STAGES[1:]:
        tt, bz, bx = solver._stage_next(model, scx, scz, tt, bz, bx, h, f,
                                        cfg)
    sync(tt)
    Z, X = model.shape

    @jax.jit
    def inject(ptt, pbz, pbx):
        def one(p, z, x):
            return solver._inject(p, (z, x), 3, (Z, X), (0, 0), 1,
                                  model.vel_map.dtype, (Z, X))
        return jax.vmap(one)(ptt, pbz, pbx)

    tt0, fixed = inject(tt, bz, bx)
    sync(tt0)
    log("final-stage input ready")

    @jax.jit
    def pass_ali(t, replace):
        return sweep.gs_pass(t, model, fixed, replace=replace, block=4)

    @jax.jit
    def pass_fd(t, replace):
        return sweep.gs_pass(t, model, fixed, replace=replace, block=4,
                             use_ali=False)

    # ---- per-pass cost ----
    for name, fn in (("ALI", pass_ali), ("FD", pass_fd)):
        out = sync(fn(tt0, jnp.asarray(False)))
        t0 = time.time()
        reps = 3
        cur = tt0
        for r in range(reps):
            cur = fn(cur, jnp.asarray(False))
        sync(cur)
        log(f"{name} pass: {(time.time()-t0)/reps*1e3:.1f} ms")

    # ---- convergence profiles ----
    def profile(fn, t, n, label):
        deltas = []
        for k in range(n):
            new = sync(fn(t, jnp.asarray(False)))
            known = np.asarray(new) < INF * 0.5
            d = np.abs(np.asarray(new) - np.asarray(t))
            d = np.where(known | (np.asarray(t) < INF * 0.5), d, 0.0).max()
            scale = np.where(known, np.asarray(new), 0.0).max()
            deltas.append(d / scale)
            t = new
        log(f"{label}: rel deltas " +
            " ".join(f"{x:.1e}" for x in deltas))
        return t

    t_ali = profile(pass_ali, tt0, 10, "phase1 ALI")
    t_fd = profile(pass_fd, tt0, 10, "phase1 FD ")

    # ---- production field (full solve, for ray comparison) ----
    prod = sync(solver._stage_final(model, tt, bz, bx, cfg))

    # ---- FD phase-1 (to 2e-3) + 3 ALI replace-polish ----
    def run_variant(n_fd, n_pol):
        t = tt0
        for _ in range(n_fd):
            t = pass_fd(t, jnp.asarray(False))
        for _ in range(n_pol):
            t = pass_ali(t, jnp.asarray(True))
        return sync(t)

    for n_fd in (4, 6, 8):
        t_var = run_variant(n_fd, 3)
        a = np.asarray(t_var)
        b = np.asarray(prod)
        m = (b < INF * 0.5) & (b > 0)
        rel = np.abs(a - b)[m] / b[m]
        log(f"FD{n_fd}+pol3 vs prod: mean {rel.mean():.2e} "
            f"max {rel.max():.2e}")

    # timing of the variant end-to-end vs production final stage
    def timed(fn, label, reps=3):
        sync(fn())
        best = 1e9
        for r in range(reps):
            t0 = time.time()
            sync(fn())
            best = min(best, time.time() - t0)
        log(f"{label}: {best*1e3:.0f} ms")

    timed(lambda: solver._stage_final(model, tt, bz, bx, cfg),
          "production _stage_final")
    timed(lambda: run_variant(6, 3), "FD6+pol3 (python-loop)")

    # ---- ray-time deviation through the FD6+pol3 fields ----
    pair_i, pair_j = np.nonzero(pairs == 1)
    isx = np.round(sx / dnx)
    isy = np.round(sy / dnx)
    src_xy = jnp.asarray(np.stack([isx[pair_i] * SUBGRID,
                                   isy[pair_i] * SUBGRID], 1))
    rec_xy = jnp.asarray(np.stack([isx[pair_j] * SUBGRID,
                                   isy[pair_j] * SUBGRID], 1))
    tidx = jnp.asarray(np.searchsorted(rec, pair_j))
    opts = dict(max_cross=8, step_scale=6, quad_vel=True, relax_iters=1,
                relax_quad=3, max_steps=170, cand_stride=6.0)

    def rays_through(f):
        out = rayslib.trace_rays(model, f, tidx, src_xy, rec_xy, SUBGRID,
                                 mode="interp", **opts)
        sync(out[3])
        return np.asarray(out[3], np.float64)

    t_prod = rays_through(prod)
    t_var = rays_through(run_variant(6, 3))
    d = (t_var - t_prod) / t_prod
    log(f"ray dt/t FD6+pol3 vs prod: mean {d.mean():+.2e} "
        f"p99 {np.percentile(np.abs(d), 99):.2e} max {np.abs(d).max():.2e}")


if __name__ == "__main__":
    main()
