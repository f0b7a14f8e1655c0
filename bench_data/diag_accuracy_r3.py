"""Round-3 accuracy localization: where does the accuracy-preset field
deviate from the heap-march oracle, and is it budget-limited?

Run: python bench_data/diag_accuracy_r3.py
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


def run_ref(veln, velpn, vel_map, g, p, dnx, scx, scz):
    Z, X = veln.shape
    nsts = np.zeros((Z, X), dtype=int)
    btg = np.zeros((round(0.5 * Z * X), 2), dtype=int)
    ttn = np.zeros((Z, X))
    return ref.travel(
        scx, scz, nsts, btg, 0, ttn, veln, velpn.astype(int), vel_map, None,
        g, p, 0, 0, dnx, dnx, X, Z,
    )


def report(tag, got, want, sz, sx):
    Z, X = want.shape
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    d = np.hypot(zz - sz, xx - sx)
    mask = want > 0
    rel = np.where(mask, np.abs(got - want) / np.where(mask, want, 1), 0)
    annulus = (d >= 12.0) & (d <= 16.0)
    order = np.argsort(rel.ravel())[::-1][:6]
    print(f"{tag}: Linf {rel.max():.3e} mean {rel[mask].mean():.3e} "
          f"Linf-excl-ring {rel[~annulus].max():.3e} "
          f"ring-Linf {rel[annulus].max():.3e}")
    for k in order:
        i, j = np.unravel_index(k, rel.shape)
        print(f"   ({i:2d},{j:2d}) d={d[i,j]:5.1f} rel={rel[i,j]:.3e} "
              f"got={got[i,j]*1e6:.5f} want={want[i,j]*1e6:.5f}")


def main():
    from alifmm_tpu import materials as mats

    Z, X = 41, 45
    dnx = 1e-3
    v0 = 3000.0
    velpn = np.ones((Z, X), dtype=int)
    tab = np.ones((361, 2))
    tab[:, 0] = np.arange(361)
    sz, sx = 20, 22

    # anisotropic table + smooth orientation field
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(c22, c23, c33, c44, rho)], 1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)], 1)
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln_s = np.round((45 + 30 * np.sin(zz / 8.0) * np.cos(xx / 7.0)) % 180)

    rng = np.random.default_rng(7)
    veln_r = np.round(rng.uniform(0, 180, (Z, X)))
    cases = (
        ("iso", np.zeros((Z, X)), v0 * np.ones((Z, X)), tab, tab),
        ("smooth-aniso", veln_s, np.ones((Z, X)), g, p),
        ("random-aniso", veln_r, np.ones((Z, X)), g, p),
    )
    for name, veln, vel_map, gt, pt in cases:
        want = run_ref(veln, velpn, vel_map, gt, pt, dnx, sx * dnx, sz * dnx)
        model = gridlib.make_model(
            veln, velpn, vel_map, None, gt, pt, dnx, dtype=jnp.float64
        )
        for tag, cfg in (
            ("accuracy", solver.SolveConfig.accuracy()),
        ):
            got = np.asarray(solver.solve_ttf(
                model, np.array([sx * dnx]), np.array([sz * dnx]), 1,
                cfg))[0]
            report(f"{name} {tag}", got, want, sz, sx)


if __name__ == "__main__":
    main()
