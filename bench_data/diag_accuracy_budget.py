"""Weld-crop coarse-field accuracy vs solver budget (CPU x64).

BASELINE.md tracks 'time-field L-inf <= 1e-3 vs reference FMM'; this
measures where the sweep solver actually lands against the committed
weld-crop goldens at the default and a high iteration budget, separating
iteration error from the scheme's intrinsic (stencil/tie-break) deviation
from the heap march.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "true"
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import solver  # noqa: E402

REF = "/root/reference"
d = np.load("/root/repo/tests/golden/weld_crop.npz")
r0, r1 = d["rows"]
c0, c1 = d["cols"]
veln = np.load(os.path.join(REF, "weld_veln.npy"))[r0:r1, c0:c1]
velpn_raw = np.load(os.path.join(REF, "weld_velpn.npy"))[r0:r1, c0:c1]
vel_map = np.load(os.path.join(REF, "weld_vel_map.npy"))[r0:r1, c0:c1]
velpn = np.where(velpn_raw == 0, 2, 1).astype(int)
dnx = float(d["dnx"])
model = gridlib.make_model(
    veln, velpn, vel_map, None, d["group_tab"], d["phase_tab"], dnx,
    dtype=jnp.float64,
)
src = d["sources"]
want = d["fields"]

CFGS = {
    "default": solver.SolveConfig(),
    "bench": solver.SolveConfig(final_rel_tol=2e-3, final_polish_passes=3,
                                sweep_block=4),
    "high": solver.SolveConfig(rel_tol=1e-6, patch_max_passes=25,
                               final_max_passes=40, polish_passes=12),
}

for name, cfg in CFGS.items():
    got = np.asarray(
        solver.solve_ttf(
            model, src[:, 1].astype(float) * dnx,
            src[:, 0].astype(float) * dnx, 1, cfg,
        )
    )
    mask = want > 0
    rel = np.abs(got - want)[mask] / want[mask]
    q = np.quantile(rel, [0.5, 0.9, 0.99, 0.999])
    print(f"{name}: mean {rel.mean():.2e} max {rel.max():.2e} "
          f"p50/p90/p99/p99.9 {q[0]:.1e}/{q[1]:.1e}/{q[2]:.1e}/{q[3]:.1e}",
          flush=True)
