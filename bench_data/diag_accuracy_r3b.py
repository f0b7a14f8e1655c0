"""Round-3 accuracy probe B: what exactly is injected at the first ring
(d=13..15) for the isotropic golden case, and is it frozen?

Run: python bench_data/diag_accuracy_r3b.py
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
from alifmm_tpu import solver  # noqa: E402

from ref_shim import load_reference  # noqa: E402

ref = load_reference()

Z, X = 41, 45
DNX = 1e-3
V0 = 3000.0
veln = np.zeros((Z, X))
velpn = np.ones((Z, X), dtype=int)
vel_map = V0 * np.ones((Z, X))
tab = np.ones((361, 2))
tab[:, 0] = np.arange(361)
sz, sx = 20, 22

nsts = np.zeros((Z, X), dtype=int)
btg = np.zeros((round(0.5 * Z * X), 2), dtype=int)
ttn = np.zeros((Z, X))
want = ref.travel(
    sx * DNX, sz * DNX, nsts, btg, 0, ttn, veln, velpn.astype(int),
    vel_map, None, tab, tab, 0, 0, DNX, DNX, X, Z,
)

model = gridlib.make_model(
    veln, velpn, vel_map, None, tab, tab, DNX, dtype=jnp.float64
)
cfg = solver.SolveConfig.accuracy(stage3_half=None)
stages = solver.coarse_stages(cfg)
scx = jnp.asarray(np.array([sx * DNX]))
scz = jnp.asarray(np.array([sz * DNX]))
(h0, f0) = stages[0]
tt, bz, bx = solver._stage_first(
    model, scx, scz, h0, f0, solver._COARSE_SEED_SIDE,
    solver._COARSE_SEED_SIGN, cfg
)
for (h, f) in stages[1:]:
    tt, bz, bx = solver._stage_next(model, scx, scz, tt, bz, bx, h, f, cfg)


@jax.jit
def inject(tt, bz, bx):
    def one(ptt, pbz, pbx):
        return solver._inject(
            ptt, (pbz, pbx), 3, (Z, X), (0, 0), 1, jnp.float64, (Z, X)
        )

    return jax.vmap(one)(tt, bz, bx)


tt0, fixed = inject(tt, bz, bx)
tt0 = np.asarray(tt0)[0]
fixed = np.asarray(fixed)[0]
print("patch origin:", int(np.asarray(bz)[0]), int(np.asarray(bx)[0]))
for (i, j) in [(20, 9), (20, 10), (20, 11), (20, 35), (33, 22), (32, 22),
               (7, 22), (20, 12), (21, 9), (19, 9)]:
    v = tt0[i, j]
    print(f"  ({i:2d},{j:2d}) injected={'INF' if v > 1 else f'{v*1e6:.6f}'}"
          f" fixed={bool(fixed[i, j])} want={want[i, j]*1e6:.6f}")
# distribution of frozen disk
zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
d = np.hypot(zz - sz, xx - sx)
print("frozen count:", int(fixed.sum()), " max frozen d:",
      float(d[fixed].max()) if fixed.any() else None)
print("injected-but-unfrozen d range:",
      float(d[(tt0 < 1) & ~fixed].min()), float(d[(tt0 < 1) & ~fixed].max()))
