"""Round-3 qSV localization: where does the qSV solve deviate 34% from
the heap oracle, and does either side match a finely-resolved truth?

Run: python bench_data/diag_qsv_r3.py
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
g, p = mats.generate_mode_curves(263e9, 145e9, 216e9, 129e9, 7800.0,
                                 mode="qSV")
gtab = np.stack([np.arange(361.0), g], axis=1)
ptab = np.stack([np.arange(361.0), p], axis=1)
zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
veln = np.round((20.0 + 70.0 * np.sin(zz / 6.0) * np.cos(xx / 5.0)) % 180)
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

d = np.hypot(zz - sz, xx - sx)
mask = want > 0
rel = np.where(mask, np.abs(got - want) / np.where(mask, want, 1), 0)
sign = np.sign(got - want)
print(f"Linf {rel.max():.3e} mean {rel[mask].mean():.3e} "
      f"n>2e-2 {(rel > 2e-2).sum()}")
order = np.argsort(rel.ravel())[::-1][:15]
for k in order:
    i, j = np.unravel_index(k, rel.shape)
    print(f"  ({i:2d},{j:2d}) d={d[i,j]:5.1f} veln={veln[i,j]:4.0f} "
          f"rel={rel[i,j]:+.3e}*{int(sign[i,j])} "
          f"got={got[i,j]*1e6:.4f} want={want[i,j]*1e6:.4f}")
# where do the bad cells cluster?
bad = rel > 2e-2
print("bad rows:", sorted(set(np.nonzero(bad)[0].tolist())))
print("bad cols:", sorted(set(np.nonzero(bad)[1].tolist())))
print("got>want on bad:", int((sign[bad] > 0).sum()), "/", int(bad.sum()))
