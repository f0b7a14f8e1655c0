"""Accuracy-mode tuning: which SolveConfig budget reaches <= 1e-3
relative L-inf vs the reference heap-march oracle (BASELINE.md bound)?

The sweep solver's phase-2 replace polish converges monotonically toward
the heap-march field; the default production budget stops early (speed).
This diag measures L-inf / mean vs the oracle as a function of budget on
the two golden models (isotropic 41x45, anisotropic-table 37x33).

Run: JAX_PLATFORMS=cpu python bench_data/diag_accuracy.py
"""

import os
import sys

# force (not setdefault): the session env may pin JAX_PLATFORMS=axon.
# NOTE the JAX_ENABLE_X64 env var is ignored by this jax build -- the
# config.update call below is the one that actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alifmm_tpu.utils.io import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.join(os.path.dirname(__file__), "..",
                                  ".jax_cache"))

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import materials as mats  # noqa: E402
from alifmm_tpu import solver  # noqa: E402

from ref_shim import load_reference  # noqa: E402

ref = load_reference()


def run_ref(veln, velpn, vel_map, g, p, dnx, scx, scz):
    Z, X = veln.shape
    nsts = np.zeros((Z, X), dtype=int)
    btg = np.zeros((round(0.5 * Z * X), 2), dtype=int)
    ttn = np.zeros((Z, X))
    return ref.travel(
        scx, scz, nsts, btg, 0, ttn, veln, velpn.astype(int), vel_map, None,
        g, p, 0, 0, dnx, dnx, X, Z,
    )


def iso_case():
    Z, X = 41, 45
    dnx = 1e-3
    veln = np.zeros((Z, X))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = 3000.0 * np.ones((Z, X))
    tab = np.ones((361, 2))
    tab[:, 0] = np.arange(361)
    sz, sx = 20, 22
    want = run_ref(veln, velpn, vel_map, tab, tab, dnx, sx * dnx, sz * dnx)
    model = gridlib.make_model(veln, velpn, vel_map, None, tab, tab, dnx,
                               dtype=jnp.float64)
    return "iso", model, sx * dnx, sz * dnx, want


def aniso_case():
    Z, X = 37, 33
    dnx = 5e-4
    rng = np.random.default_rng(7)
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.zeros((361, 2)); p = np.zeros((361, 2))
    g[:, 0] = np.arange(361); p[:, 0] = np.arange(361)
    g[:, 1] = mats.generate_group_vel_curve(c22, c23, c33, c44, rho)
    p[:, 1] = mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    sz, sx = 18, 16
    want = run_ref(veln, velpn, vel_map, g, p, dnx, sx * dnx, sz * dnx)
    model = gridlib.make_model(veln, velpn, vel_map, None, g, p, dnx,
                               dtype=jnp.float64)
    return "aniso", model, sx * dnx, sz * dnx, want


CFGS = {
    "default": solver.SolveConfig(),
    "acc-preset": solver.SolveConfig.accuracy(),
    "polish16": solver.SolveConfig(rel_tol=2e-4, patch_max_passes=16,
                                   final_max_passes=32, polish_passes=16,
                                   final_polish_passes=16),
    "polish32": solver.SolveConfig(rel_tol=1e-4, patch_max_passes=20,
                                   final_max_passes=48, polish_passes=32,
                                   final_polish_passes=32),
}


def main():
    for case_fn in (iso_case, aniso_case):
        name, model, cx, cz, want = case_fn()
        mask = want > 0
        for cname, cfg in CFGS.items():
            got = np.asarray(
                solver.solve_ttf(model, np.array([cx]), np.array([cz]),
                                 1, cfg)
            )[0]
            rel = np.abs(got - want)[mask] / want[mask]
            print(f"{name:6s} {cname:10s} Linf={rel.max():.2e} "
                  f"mean={rel.mean():.2e} p99={np.quantile(rel, 0.99):.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
