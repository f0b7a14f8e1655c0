"""Locate the error of the fine-grid edge-source weld-crop golden test."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax

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
s = int(d["fine_subgrid"])
sz, sx = d["fine_source"]
got = np.asarray(
    solver.solve_ttf(model, np.array([sx * dnx]), np.array([sz * dnx]), s)
)[0]
want = d["fine_field"]
mask = want > 0
rel = np.where(mask, np.abs(got - want) / np.where(mask, want, 1.0), 0.0)
print("shape", got.shape, "mean", rel[mask].mean(), "max", rel.max())
# where are the worst points?
idx = np.argsort(rel.ravel())[::-1][:20]
Zf, Xf = got.shape
for k in idx:
    z, x = divmod(int(k), Xf)
    print(f"  z={z} x={x} rel={rel[z, x]:.4f} got={got[z, x]:.6g} "
          f"want={want[z, x]:.6g}")
n_bad = (rel > 2e-2).sum()
print("n>2e-2:", int(n_bad), "of", int(mask.sum()))
# histogram of bad points' locations
zz, xx = np.nonzero(rel > 2e-2)
if len(zz):
    print("z range", zz.min(), zz.max(), "x range", xx.min(), xx.max())
    print("source fine coords: z", sz * s, "x", sx * s)
