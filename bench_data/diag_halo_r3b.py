"""Round-3 halo bisect: source-on-slab-last-row vs Z-padding.

Reuses the shapes (Z=32 and Z=30) compiled by diag_halo_r3.py so every
case here is a cheap re-execution with a different traced source.
Run: python bench_data/diag_halo_r3b.py
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
from alifmm_tpu.parallel import shard  # noqa: E402


def _model(Z=32, X=40, dnx=1e-3, v0=3000.0):
    return gridlib.make_model(
        np.zeros((Z, X)), np.ones((Z, X), dtype=int), v0 * np.ones((Z, X)),
        None, None, None, dnx, dtype=jnp.float64,
    )

SMALL_STAGES = ((1, 9), (2, 3))
SMALL_SEED = 4
DNX = 1e-3


def run(tag, Z, srcs):
    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    cfg = solver.SolveConfig(final_max_passes=48, final_polish_passes=8,
                             final_rel_tol=1e-10)
    model = _model(Z=Z)
    scx = DNX * np.array([s[1] for s in srcs], dtype=float)
    scz = DNX * np.array([s[0] for s in srcs], dtype=float)
    sh = np.asarray(shard.solve_ttf_halo(
        model, scx, scz, mesh, cfg=cfg, stages=SMALL_STAGES,
        seed_side=SMALL_SEED,
    ))
    si = np.asarray(solver._staged_solve(
        model, jnp.asarray(scx), jnp.asarray(scz), SMALL_STAGES,
        SMALL_SEED, -1.0, cfg,
    ))
    rel = np.abs(sh - si) / np.maximum(si, 1e-30)
    for b, (sz, sx) in enumerate(srcs):
        r = rel[b]
        idx = np.unravel_index(np.argmax(r), r.shape)
        n_over = int((r > 1e-3).sum())
        # sign: undershoot (sharded < single) or overshoot?
        d = (sh[b] - si[b])[r > 1e-4]
        sign = ("undershoot" if (d < 0).mean() > 0.7 else
                "overshoot" if (d > 0).mean() > 0.7 else "mixed")
        print(f"{tag} Z={Z} src=({sz},{sx}): max {r.max():.2e} at {idx} "
              f"n>1e-3={n_over} {sign if n_over else ''}")


if __name__ == "__main__":
    # batch sizes match diag_halo_r3.py's compiles (2 for Z=32, 1 for
    # Z=30) so every case reuses a cached program.
    # A: Z=32 (no pad), sources on slab LAST rows (7, 15, 23) + mid-slab
    run("A", 32, [(15, 20), (7, 20)])
    run("A", 32, [(23, 20), (12, 20)])
    # B: Z=30 (pad), mid-slab sources far from slab edges
    for s in [(12, 20), (4, 20), (20, 20), (26, 20)]:
        run("B", 30, [s])
