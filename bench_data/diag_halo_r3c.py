"""Round-3 halo probe: neighborhood values around a last-slab-row source.

Prints the converged sharded vs single fields around the source (15,20)
on Z=32 (slab boundary between rows 15 and 16) plus the fixed mask, to
see exactly which cells diverge and how.
Run: python bench_data/diag_halo_r3c.py
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
from alifmm_tpu.ops.stencils import INF  # noqa: E402
from alifmm_tpu.parallel import shard  # noqa: E402

Z, X, DNX, V0 = 32, 40, 1e-3, 3000.0
SZ, SX = 15, 20

model = gridlib.make_model(
    np.zeros((Z, X)), np.ones((Z, X), dtype=int), V0 * np.ones((Z, X)),
    None, None, None, DNX, dtype=jnp.float64,
)

# hand-built injection block mimicking the telescoped seed: 5x5 analytic
# values rows 13..17 x cols 18..22, frozen where dist <= 2 cells
zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
dist = np.hypot(zz - SZ, xx - SX)
tt0 = np.full((Z, X), INF)
fixed = np.zeros((Z, X), bool)
blk = (np.abs(zz - SZ) <= 2) & (np.abs(xx - SX) <= 2)
tt0[blk] = (dist * DNX / V0)[blk]
fixed[blk & (dist <= 2.0)] = True
tt0 = jnp.asarray(tt0)
fixedj = jnp.asarray(fixed)

single, _ = jax.jit(
    lambda t, f: sweep.solve_fixpoint(
        t, model, f, rel_tol=1e-10, max_passes=48, polish_passes=8
    )
)(tt0, fixedj)
single = np.asarray(single)

mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
sh = np.asarray(shard.solve_halo_sharded(
    tt0, model, fixedj, mesh, rel_tol=1e-10, max_outer=48, max_polish=48,
    polish=8,
))

np.set_printoptions(linewidth=220, precision=4, suppress=False)
r0, r1, c0, c1 = 12, 20, 15, 26
print("fixed mask:")
print(fixed[r0:r1, c0:c1].astype(int))
print("single (us):")
print(single[r0:r1, c0:c1] * 1e6)
print("sharded (us):")
print(sh[r0:r1, c0:c1] * 1e6)
rel = np.abs(sh - single) / np.maximum(single, 1e-30)
print("rel diff:")
print(rel[r0:r1, c0:c1])
print("max rel:", rel.max(), "at", np.unravel_index(np.argmax(rel), rel.shape))

# --- batched variant: same seed as a (1, Z, X) batch ---
sh_b = np.asarray(shard.solve_halo_sharded(
    tt0[None], model, fixedj[None], mesh, rel_tol=1e-10, max_outer=48,
    max_polish=48, polish=8,
))[0]
rel_b = np.abs(sh_b - single) / np.maximum(single, 1e-30)
print("batched max rel:", rel_b.max(), "at",
      np.unravel_index(np.argmax(rel_b), rel_b.shape))
print("batched rel diff block:")
print(rel_b[r0:r1, c0:c1])
