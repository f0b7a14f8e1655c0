"""Round-3 halo probe D: reproduce with the REAL telescoped injection.

Runs the stage pipeline exactly as solve_ttf_halo does (batch 2, Z=32 --
all programs cached by earlier diags), then feeds the injected (tt0,
fixed) to solve_halo_sharded AND to the single-device solve_fixpoint,
and prints the seed differences vs the analytic hand seed that did NOT
reproduce the bug.
Run: python bench_data/diag_halo_r3d.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from alifmm_tpu.utils.io import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import solver  # noqa: E402
from alifmm_tpu.ops import sweep  # noqa: E402
from alifmm_tpu.parallel import shard  # noqa: E402

Z, X, DNX, V0 = 32, 40, 1e-3, 3000.0
STAGES = ((1, 9), (2, 3))
SEED = 4

model = gridlib.make_model(
    np.zeros((Z, X)), np.ones((Z, X), dtype=int), V0 * np.ones((Z, X)),
    None, None, None, DNX, dtype=jnp.float64,
)
cfg = solver.SolveConfig(final_max_passes=48, final_polish_passes=8,
                         final_rel_tol=1e-10)
scx = DNX * np.array([20.0, 20.0])
scz = DNX * np.array([15.0, 12.0])

# replicate solve_ttf_halo's stage pipeline + injection
(h0, f0) = STAGES[0]
tt, bz, bx = solver._stage_first(
    model, jnp.asarray(scx), jnp.asarray(scz), h0, f0, SEED, -1.0, cfg
)
for (h, f) in STAGES[1:]:
    tt, bz, bx = solver._stage_next(model, jnp.asarray(scx),
                                    jnp.asarray(scz), tt, bz, bx, h, f, cfg)


@jax.jit
def inject(tt, bz, bx):
    def one(ptt, pbz, pbx):
        return solver._inject(
            ptt, (pbz, pbx), 3, (Z, X), (0, 0), 1, jnp.float64, (Z, X)
        )

    return jax.vmap(one)(tt, bz, bx)


tt0, fixed = inject(tt, bz, bx)
tt0_h = np.asarray(tt0)
fx_h = np.asarray(fixed)

np.set_printoptions(linewidth=220, precision=6, suppress=False)
for b, sz in enumerate((15, 12)):
    print(f"--- src z={sz}: injected seed rows {sz-3}..{sz+3} ---")
    print("fixed:")
    print(fx_h[b, sz - 3 : sz + 4, 16:25].astype(int))
    v = np.where(tt0_h[b] > 1, np.nan, tt0_h[b] * 1e6)
    print("tt0 (us, NaN=INF):")
    print(v[sz - 3 : sz + 4, 16:25])

mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
sh = np.asarray(shard.solve_halo_sharded(
    tt0, model, fixed, mesh, rel_tol=1e-10, max_outer=48, max_polish=48,
    polish=8,
))
single, _ = jax.jit(
    lambda t, f: sweep.solve_fixpoint(
        t, model, f, rel_tol=1e-10, max_passes=48, polish_passes=8
    )
)(tt0, fixed)
single = np.asarray(single)

rel = np.abs(sh - single) / np.maximum(single, 1e-30)
for b, sz in enumerate((15, 12)):
    idx = np.unravel_index(np.argmax(rel[b]), rel[b].shape)
    print(f"src z={sz}: max rel {rel[b].max():.2e} at {idx}, "
          f"n>1e-3 {(rel[b] > 1e-3).sum()}")
    if rel[b].max() > 1e-3:
        print("rel block:")
        print(rel[b, sz - 2 : sz + 4, 16:25])
        print("single (us):")
        print(single[b, sz - 2 : sz + 4, 16:25] * 1e6)
        print("sharded (us):")
        print(sh[b, sz - 2 : sz + 4, 16:25] * 1e6)

# --- phase bisect: legacy fixed-budget, with/without polish ---
for n_outer, polish in ((1, 0), (8, 0), (8, 8)):
    shv = np.asarray(shard.solve_halo_sharded(
        tt0, model, fixed, mesh, n_outer=n_outer, n_inner=1, polish=polish,
    ))
    print(f"n_outer={n_outer} polish={polish}:")
    print("  row16[16:25] =", np.array2string(
        shv[0, 16, 16:25] * 1e6, precision=6))
    print("  row17[16:25] =", np.array2string(
        shv[0, 17, 16:25] * 1e6, precision=6))
    print("  (16,18):", shv[0, 16, 18] * 1e6,
          " (17,19):", shv[0, 17, 19] * 1e6)
