"""Round-3 halo probe E: is the divergent sharded field a fixpoint of the
SINGLE-DEVICE update operator?

Recomputes one causal replace-mode full-grid Jacobi update (the same
local operator the sweeps apply) on both converged fields and reports
where each field moves.  If the sharded field is stationary under the
global operator, the deviation is a genuine second fixpoint of the
upwind-restricted update (determinism/uniqueness design issue); if the
operator immediately lowers (16,18), the halo iteration failed to apply
some update the global sweeps would have made (solver bug).
Run: python bench_data/diag_halo_r3e.py
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
from alifmm_tpu.ops import stencils, sweep  # noqa: E402
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

mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
sh = shard.solve_halo_sharded(
    tt0, model, fixed, mesh, rel_tol=1e-10, max_outer=48, max_polish=48,
    polish=8,
)
single, _ = jax.jit(
    lambda t, f: sweep.solve_fixpoint(
        t, model, f, rel_tol=1e-10, max_passes=48, polish_passes=8
    )
)(tt0, fixed)


@jax.jit
def one_jacobi_replace(t, f):
    new = stencils.full_grid_update(t, model, f, causal=True)
    new = jnp.where(new < stencils.INF * 0.5, new, t)
    return jnp.where(f, t, new)


@jax.jit
def one_gs_replace(t, f):
    return sweep.gs_pass(t, model, f, replace=True)


for name, fld in (("sharded", sh), ("single", single)):
    fld = jnp.asarray(fld)
    jac = np.asarray(one_jacobi_replace(fld, fixed))
    gsr = np.asarray(one_gs_replace(fld, fixed))
    base = np.asarray(fld)
    for opname, upd in (("jacobi", jac), ("gs", gsr)):
        d = np.abs(upd - base) / np.maximum(base, 1e-30)
        b = 0
        i = np.unravel_index(np.argmax(d[b]), d[b].shape)
        print(f"{name} under one {opname} replace: max move {d[b].max():.3e}"
              f" at {i};  (16,18): {base[b,16,18]*1e6:.6f} ->"
              f" {upd[b,16,18]*1e6:.6f}")
