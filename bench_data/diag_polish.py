"""Truth-error of polish_passes variants vs the pure-Python reference
oracle (CPU, f64) on a small anisotropic model -- decides whether the
bench SolveConfig can run fewer polish passes."""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")

from ref_shim import load_reference
from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import solver

ref = load_reference()


def main():
    # square grid: the reference's stage-1 nnz/nnx swap quirk
    # (Anis_TTF_rays.py:1645) index-errors un-jitted on non-square models
    Z, X = 65, 65
    dnx = 5e-4
    rng = np.random.default_rng(3)
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.zeros((361, 2))
    p = np.zeros((361, 2))
    g[:, 0] = np.arange(361)
    p[:, 0] = np.arange(361)
    g[:, 1] = mats.generate_group_vel_curve(c22, c23, c33, c44, rho)
    p[:, 1] = mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    # source near the top edge like the weld transducers
    sz, sx = 1, 30

    t0 = time.time()
    nsts = np.zeros((Z, X), dtype=int)
    btg = np.zeros((round(0.5 * Z * X), 2), dtype=int)
    ttn = np.zeros((Z, X))
    want = ref.travel(
        sx * dnx, sz * dnx, nsts, btg, 0, ttn, veln, velpn.astype(int),
        vel_map, None, g, p, 0, 0, dnx, dnx, X, Z,
    )
    print(f"oracle done in {time.time()-t0:.0f}s", flush=True)

    model = gridlib.make_model(veln, velpn, vel_map, None, g, p, dnx,
                               dtype=jnp.float64)
    model32 = gridlib.make_model(veln, velpn, vel_map, None, g, p, dnx,
                                 dtype=jnp.float32)
    mask = want > 0

    for pp in (2, 3, 5, 8):
        for tag, m in (("f64", model), ("f32", model32)):
            cfg = solver.SolveConfig(polish_passes=pp)
            got = np.asarray(solver.solve_ttf(
                model if tag == "f64" else model32,
                np.array([sx * dnx]), np.array([sz * dnx]), 1, cfg))[0]
            rel = np.abs(got - want)[mask] / want[mask]
            print(f"polish={pp} {tag}: rel max={rel.max():.2e} "
                  f"mean={rel.mean():.2e}", flush=True)


if __name__ == "__main__":
    main()
