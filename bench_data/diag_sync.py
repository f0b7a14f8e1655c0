"""Is block_until_ready truthful under the axon tunnel?  Time the final
solver stage and one gs_pass with (a) block_until_ready and (b) an explicit
scalar fetch, fresh input buffers per rep."""
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
from alifmm_tpu import solver
from alifmm_tpu.ops import sweep


def main():
    veln, velpn, vel_map, stif, sx, sy, pairs, dnx = build_workload()
    model = gridlib.make_model(veln, velpn, vel_map, stif, None, None, dnx,
                               dtype=jnp.float32)
    rec = np.nonzero(pairs.sum(axis=0) > 0)[0]
    scx = jnp.asarray(sx[rec])
    scz = jnp.asarray(sy[rec])
    st = solver._COARSE_STAGES
    cfg = solver.SolveConfig()
    print("backend:", jax.default_backend(), flush=True)

    tt, bz, bx = solver._stage_first(model, scx, scz, st[0][0], st[0][1],
                                     solver._COARSE_SEED_SIDE,
                                     float(solver._COARSE_SEED_SIGN), cfg)
    tt, bz, bx = solver._stage_next(model, scx, scz, tt, bz, bx, st[1][0],
                                    st[1][1], cfg)
    tt3, bz3, bx3 = solver._stage_next(model, scx, scz, tt, bz, bx, st[2][0],
                                       st[2][1], cfg)
    jax.block_until_ready(tt3)

    # warm final stage
    out = solver._stage_final(model, tt3, bz3, bx3, cfg)
    print("warm sum:", float(out.sum()), flush=True)

    for rep in range(3):
        tt_in = tt3 * (1.0 + 1e-6 * (rep + 1))
        jax.block_until_ready(tt_in)
        t0 = time.time()
        out = solver._stage_final(model, tt_in, bz3, bx3, cfg)
        jax.block_until_ready(out)
        t1 = time.time()
        s = float(out.sum())
        t2 = time.time()
        print(f"final: block={1e3*(t1-t0):.1f}ms +fetch={1e3*(t2-t1):.1f}ms "
              f"(sum={s:.3e})", flush=True)

    Z, X = model.shape
    dtt = model.vel_map.dtype

    def inject_one(ptt, pbz, pbx):
        return solver._inject(ptt, (pbz, pbx), 3, (Z, X), (0, 0), 1, dtt, (Z, X))

    tt0, fixed = jax.vmap(inject_one)(tt3, bz3, bx3)
    gp = jax.jit(lambda t: sweep.gs_pass(t, model, fixed, replace=False,
                                         block=8))
    gp(tt0)
    for rep in range(3):
        tt_in = tt0 * (1.0 + 1e-6 * (rep + 1))
        jax.block_until_ready(tt_in)
        t0 = time.time()
        out = gp(tt_in)
        jax.block_until_ready(out)
        t1 = time.time()
        s = float(out.sum())
        t2 = time.time()
        print(f"gs_pass: block={1e3*(t1-t0):.1f}ms +fetch={1e3*(t2-t1):.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
