"""Fit the reference's serial pure-Python cost curve from 3 crop sizes.

Round-3's diag_ref_serial.py timed ONE crop and node-count-scaled it;
the round-3 verdict asked for a FITTED curve (replacing any assumed
scaling) plus an explicit break-even.  Method: run the pure-Python
oracle's travel_finer_grid (the production per-receiver kernel,
Anis_TTF_rays.py:2120) on three weld crops of increasing size, fit

    t(N) = a * N * log2(N)        (the heap march's complexity)

by least squares on a, report the fit residuals, and extrapolate to the
full production workload (31 receivers x 3808x4492 fine nodes + 961
rays).  numba is NOT in this image, so the pure-Python -> numba factor
remains unknowable here; every speedup statement is therefore quoted
ONLY as (a) the measured pure-Python number and (b) the numba-factor
BREAK-EVEN below which the >=50x BASELINE target holds.

Usage: JAX_PLATFORMS=cpu python bench_data/diag_ref_serial_r4.py [tpu_s]
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))
sys.path.insert(0, os.path.join(HERE, ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from ref_shim import load_reference  # noqa: E402

REF = "/root/reference"
DNX = 2e-4
S = 3  # fine-grid factor for the crop runs (full workload uses 9)


def crop_tables(r1, c0, c1):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from alifmm_tpu import materials as mats

    veln = np.load(os.path.join(REF, "weld_veln.npy"))[0:r1, c0:c1]
    velpn = np.load(os.path.join(REF, "weld_velpn.npy"))[0:r1, c0:c1]
    vel_map = np.load(os.path.join(REF, "weld_vel_map.npy"))[0:r1, c0:c1]
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800.0
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(c22, c23, c33, c44, rho)],
                 1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)],
                 1)
    # weld crop: velpn 0 selects stif_den at runtime; substitute table
    # material 1 (the oracle cannot run the un-jitted stif path at crop
    # scale -- see tests/ref_shim.py notes)
    velpn = np.where(velpn == 0, 1, velpn).astype(int)
    return veln, velpn, vel_map.astype(float), g, p


def main():
    ref = load_reference()
    sizes = [(48, 222, 278), (72, 208, 292), (96, 194, 306)]
    Ns, Ts = [], []
    for (r1, c0, c1) in sizes:
        veln, velpn, vel_map, g, p = crop_tables(r1, c0, c1)
        Z, X = veln.shape
        sz, sx = Z // 2, X // 2
        t0 = time.time()
        fine = ref.travel_finer_grid(
            sx * DNX, sz * DNX, veln, velpn, vel_map, None, S, g, p,
            0, 0, DNX, DNX,
        )
        dt = time.time() - t0
        n = fine.shape[0] * fine.shape[1]
        Ns.append(n)
        Ts.append(dt)
        print(f"crop {Z}x{X} @ {S}x -> {n:,} fine nodes: {dt:.2f}s",
              flush=True)

    Ns = np.array(Ns, float)
    Ts = np.array(Ts, float)
    basis = Ns * np.log2(Ns)
    a = float(np.sum(basis * Ts) / np.sum(basis * basis))
    resid = Ts - a * basis
    print(f"fit t = a*N*log2(N): a = {a:.3e} s/node-log  "
          f"(residuals {100 * resid / Ts} %)")

    n_full = 3808 * 4492
    t_one = a * n_full * np.log2(n_full)
    # measured single-ray cost from round 3 (scales with path length):
    # 0.59 s on a 440-diagonal crop -> scale to the weld diagonal
    t_ray_crop, diag_crop = 0.59, float(np.hypot(286, 334))
    ray_scale = float(np.hypot(3808, 4492)) / diag_crop
    est_py = 31 * t_one + 961 * t_ray_crop * ray_scale
    tpu_s = float(sys.argv[1]) if len(sys.argv) > 1 else 0.87
    print(f"\nfitted serial pure-python full workload: "
          f"31 x {t_one:,.0f} s + rays = {est_py:,.0f} s "
          f"({est_py / 3600:.1f} h)")
    print(f"measured speedup vs pure-Python serial: "
          f"{est_py / tpu_s:,.0f}x  (TPU {tpu_s} s)")
    print(f">=50x BASELINE holds for any numba-over-python factor < "
          f"{est_py / (50 * tpu_s):,.0f}x")


if __name__ == "__main__":
    main()
