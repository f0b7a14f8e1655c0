"""Round-4 diagnostic: ABSOLUTE accuracy vs closed-form truths (no oracle).

On homogeneous media the first-arrival field has an exact closed form:
    t(P) = dnx * |P - S| / v_group(eff),   eff = (veln - ray_angle) % 180
(the solver's own near-source seed formula, solver._analytic_seed /
Anis_TTF_rays.py:1546-1590, extended to the whole grid -- exact because
rays are straight in a homogeneous medium).  This measures the solver's
discretisation error independent of reference-oracle parity:

  (a) isotropic constant velocity, 3 resolutions -> convergence order
  (b) homogeneous anisotropic qP (austenite table, veln=0 and veln=30),
      3 resolutions -> convergence order
  (c) fine-grid path (subgrid_size=9, the ray production path) with the
      accuracy preset vs analytic truth on a homogeneous anisotropic model

Run:  JAX_PLATFORMS=cpu python bench_data/diag_analytic_r4.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

# jax 0.9 on this image ignores the JAX_PLATFORMS env var; pin via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from alifmm_tpu import grid as gridlib  # noqa: E402
from alifmm_tpu import materials as mats  # noqa: E402
from alifmm_tpu import solver  # noqa: E402
from alifmm_tpu.utils import io as iolib  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
iolib.enable_compile_cache(os.path.join(HERE, "..", ".jax_cache_cpu"))


def aniso_tables():
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(c22, c23, c33, c44, rho)], 1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)], 1)
    return g, p


def analytic_field(N, dnx, sz, sx, veln_deg, g_tab, subgrid=1, vel=1.0):
    """Exact homogeneous-medium field on the (refined) grid, original-grid
    time units like solve_ttf's output (ttn/subgrid rescale)."""
    Nf = subgrid * (N - 1) + 1
    szf, sxf = subgrid * sz, subgrid * sx
    zz, xx = np.meshgrid(np.arange(Nf), np.arange(Nf), indexing="ij")
    dz = zz - szf
    dx = xx - sxf
    ang = np.where(dx == 0, 90.0, np.degrees(np.arctan(dz / np.where(dx == 0, 1, dx))))
    eff = np.mod(veln_deg - ang, 180.0)
    ang_i = np.clip(eff, 0, 360)
    lo = np.floor(ang_i).astype(int)
    frac = ang_i - lo
    v = g_tab[lo, 1] * (1 - frac) + g_tab[np.minimum(lo + 1, 360), 1] * frac
    # reference semantics: velocity = table curve x vel_map cell value;
    # fine cells are dnx/subgrid wide (solve_ttf returns true seconds,
    # the reference's ttn/subgrid_size rescale, Anis_TTF_rays.py:2832)
    return dnx * np.hypot(dz, dx) / (v * vel) / subgrid


def run_case(N, dnx, veln_deg, g, p, cfg, subgrid=1, vel=1.0):
    sz = sx = N // 2
    veln = np.full((N, N), float(veln_deg))
    velpn = np.ones((N, N), dtype=int)
    vel_map = vel * np.ones((N, N))
    model = gridlib.make_model(veln, velpn, vel_map, None, g, p, dnx,
                               dtype=jnp.float64)
    t0 = time.time()
    got = np.asarray(
        solver.solve_ttf(model, np.array([sx * dnx]), np.array([sz * dnx]),
                         subgrid, cfg)
    )[0]
    wall = time.time() - t0
    want = analytic_field(N, dnx, sz, sx, veln_deg, g, subgrid, vel=vel)
    # exclude the source point itself (t=0); relative error elsewhere
    mask = want > 0
    rel = np.abs(got - want)[mask] / want[mask]
    # distance-resolved: near-source (inside the analytic seed) vs far
    Nf = subgrid * (N - 1) + 1
    zz, xx = np.meshgrid(np.arange(Nf), np.arange(Nf), indexing="ij")
    d = np.hypot(zz - subgrid * sz, xx - subgrid * sx)[mask] / subgrid
    far = d > 13  # outside the reference's widest telescoped window
    return dict(linf=rel.max(), mean=rel.mean(),
                linf_far=rel[far].max() if far.any() else 0.0,
                argmax_d=d[np.argmax(rel)], wall=wall)


def main():
    g, p = aniso_tables()
    iso = np.ones((361, 2))
    iso[:, 0] = np.arange(361)

    cfg = solver.SolveConfig.accuracy()
    print("== (a) isotropic constant v=3000, accuracy preset ==")
    iso_tab = iso.copy()
    for N in (41, 81, 161):
        r = run_case(N, 1e-3, 0.0, iso_tab, iso_tab, cfg, vel=3000.0)
        print(f"N={N:4d} linf={r['linf']:.3e} mean={r['mean']:.3e} "
              f"linf_far={r['linf_far']:.3e} argmax_d={r['argmax_d']:.1f} "
              f"wall={r['wall']:.1f}s")

    print("== (b) homogeneous anisotropic qP, veln=0 ==")
    for N in (41, 81, 161):
        r = run_case(N, 1e-3, 0.0, g, p, cfg)
        print(f"N={N:4d} linf={r['linf']:.3e} mean={r['mean']:.3e} "
              f"linf_far={r['linf_far']:.3e} argmax_d={r['argmax_d']:.1f} "
              f"wall={r['wall']:.1f}s")

    print("== (b2) homogeneous anisotropic qP, veln=30 ==")
    for N in (41, 81, 161):
        r = run_case(N, 1e-3, 30.0, g, p, cfg)
        print(f"N={N:4d} linf={r['linf']:.3e} mean={r['mean']:.3e} "
              f"linf_far={r['linf_far']:.3e} argmax_d={r['argmax_d']:.1f} "
              f"wall={r['wall']:.1f}s")

    print("== (c) fine-grid path subgrid=9, accuracy preset, veln=30 ==")
    for N in (21, 41):
        r = run_case(N, 1e-3, 30.0, g, p, cfg, subgrid=9)
        print(f"N={N:4d} linf={r['linf']:.3e} mean={r['mean']:.3e} "
              f"linf_far={r['linf_far']:.3e} argmax_d={r['argmax_d']:.1f} "
              f"wall={r['wall']:.1f}s")

    print("== (c2) fine-grid subgrid=9 DEFAULT config (current 4e-2 bound) ==")
    for N in (21,):
        r = run_case(N, 1e-3, 30.0, g, p, solver.SolveConfig(), subgrid=9)
        print(f"N={N:4d} linf={r['linf']:.3e} mean={r['mean']:.3e} "
              f"linf_far={r['linf_far']:.3e} argmax_d={r['argmax_d']:.1f} "
              f"wall={r['wall']:.1f}s")

    print("== (d) stage3_half study, isotropic N=81 (coarse-path absolute "
          "error knob: wider frozen window pushes the curvature-zone "
          "hand-off outward at 3x finer h) ==")
    for s3 in (None, 19, 25):
        cfg_d = solver.SolveConfig.accuracy(stage3_half=s3)
        r = run_case(81, 1e-3, 0.0, iso_tab, iso_tab, cfg_d, vel=3000.0)
        print(f"s3={s3} linf={r['linf']:.3e} mean={r['mean']:.3e} "
              f"argmax_d={r['argmax_d']:.1f} wall={r['wall']:.1f}s")

    print("== (d2) stage3_half on homogeneous aniso veln=30, N=81 ==")
    for s3 in (None, 25):
        cfg_d = solver.SolveConfig.accuracy(stage3_half=s3)
        r = run_case(81, 1e-3, 30.0, g, p, cfg_d)
        print(f"s3={s3} linf={r['linf']:.3e} mean={r['mean']:.3e} "
              f"argmax_d={r['argmax_d']:.1f} wall={r['wall']:.1f}s")


if __name__ == "__main__":
    main()
