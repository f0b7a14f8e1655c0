"""qSV arbitration: homogeneous medium, where t(x) = |x| / v_group(angle)
is exact.  Who is right -- the sweep solver or the heap oracle?

Run: python bench_data/diag_qsv_r3b.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from alifmm_tpu.utils.io import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.join(HERE, "..", ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import materials as mats  # noqa: E402
from alifmm_tpu import solver  # noqa: E402

from ref_shim import load_reference  # noqa: E402

ref = load_reference()

Z, X = 33, 37
DNX = 5e-4
VELN0 = 140.0
g, p = mats.generate_mode_curves(263e9, 145e9, 216e9, 129e9, 7800.0,
                                 mode="qSV")
gtab = np.stack([np.arange(361.0), g], axis=1)
ptab = np.stack([np.arange(361.0), p], axis=1)
veln = VELN0 * np.ones((Z, X))
velpn = np.ones((Z, X), dtype=int)
vel_map = np.ones((Z, X))
sz, sx = 16, 18

nsts = np.zeros((Z, X), dtype=int)
btg = np.zeros((round(0.5 * Z * X), 2), dtype=int)
ttn = np.zeros((Z, X))
want = ref.travel(
    sx * DNX, sz * DNX, nsts, btg, 0, ttn, veln, velpn.astype(int),
    vel_map, None, gtab, ptab, 0, 0, DNX, DNX, X, Z,
)

model = gridlib.make_model(
    veln, velpn, vel_map, None, gtab, ptab, DNX, dtype=jnp.float64
)
got = np.asarray(solver.solve_ttf(
    model, np.array([sx * DNX]), np.array([sz * DNX]), 1,
    solver.SolveConfig.for_mode("qsv"),
))[0]

# analytic: straight ray at geometric angle; group speed from the table
# at eff = (veln - angle) mod 180 (the reference's seed convention)
zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
dz = zz - sz
dx = xx - sx
ang = np.degrees(np.arctan2(dz, np.where((dx == 0) & (dz == 0), 1, dx)))
eff = np.mod(VELN0 - ang, 180.0)
vg = np.interp(eff, gtab[:, 0], gtab[:, 1])
d = np.hypot(dz, dx)
exact = d * DNX / np.maximum(vg, 1e-9)

mask = d > 2
for name, f in (("sweep", got), ("oracle", want)):
    rel = np.abs(f - exact)[mask] / exact[mask]
    print(f"{name} vs analytic: Linf {rel.max():.3e} mean {rel.mean():.3e}")
rel_ow = np.abs(got - want)[mask] / want[mask]
print(f"sweep vs oracle:  Linf {rel_ow.max():.3e} mean {rel_ow.mean():.3e}")
# a couple of concrete cells on different angles
for (i, j) in [(16, 30), (4, 18), (6, 8), (28, 28), (10, 26)]:
    print(f"  ({i},{j}) ang={ang[i,j]:6.1f} eff={eff[i,j]:5.1f} "
          f"exact={exact[i,j]*1e6:.4f} sweep={got[i,j]*1e6:.4f} "
          f"oracle={want[i,j]*1e6:.4f}")
print("table v_group min/max:", g.min(), g.max())
print("table v_phase min/max:", p.min(), p.max())
