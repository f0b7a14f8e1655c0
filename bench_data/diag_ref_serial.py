"""Time the reference implementation serially on a weld crop.

Purpose: put a MEASURED number behind the BASELINE.json ">=50x vs serial
CPU FMM" target.  numba is not installed in this image, so the reference
runs as the pure-Python oracle (tests/ref_shim.py); the extrapolation to
its numba-jitted production speed is therefore an estimate and is labeled
as such wherever the number is quoted.

Method: run ref.travel_finer_grid (the production per-receiver kernel,
Anis_TTF_rays.py:2120) once on the tests/make_weld_crop_goldens.py crop
(96x112 at subgrid 3 -> 286x334 fine nodes) plus one find_ray, and scale:

  full workload = 31 receivers x (3808x4492 fine nodes) + 961 rays
  serial python est. = 31 * (N_full / N_crop) * t_crop + 961 * t_ray
  serial numba  est. = python est. / K   for K in {30, 100, 300}

Even at an implausibly generous K = 300x numba-over-python factor, the
result stays far above the 50x target vs our 0.87 s TPU wall-clock.

Usage: python bench_data/diag_ref_serial.py   (CPU-only; ~minutes)
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
import make_weld_crop_goldens as gg  # noqa: E402

DNX = gg.DNX
S = gg.FINE_SUBGRID


def main():
    ref = load_reference()
    veln, velpn, vel_map, g, p = gg.build_crop_tables()
    Z, X = veln.shape
    sz, sx = gg.FINE_SOURCE

    t0 = time.time()
    fine = ref.travel_finer_grid(
        sx * DNX, sz * DNX, veln, velpn, vel_map, None, S, g, p,
        0, 0, DNX, DNX,
    )
    t_ttf = time.time() - t0
    fine = np.array(fine)
    n_crop = fine.shape[0] * fine.shape[1]
    print(f"oracle travel_finer_grid crop ({Z}x{X} @ {S}x -> "
          f"{fine.shape[0]}x{fine.shape[1]} = {n_crop} nodes): {t_ttf:.1f}s",
          flush=True)

    rz, rx = gg.RAY_RECEIVERS[1]
    t0 = time.time()
    ray_x, ray_y, t = ref.find_ray(
        DNX, g, np.array([float(rx * S), float(rz * S)]),
        np.array([float(sx * S), float(sz * S)]),
        fine, veln, velpn, vel_map, None, S,
    )
    t_ray = time.time() - t0
    print(f"oracle find_ray: {t_ray:.2f}s (len {len(ray_x)})", flush=True)

    # full production workload (Weld_rays.py): 31 receiver TTFs on the
    # 424x500 grid at subgrid 9 -> 3808x4492 fine nodes each, 961 rays.
    n_full = 3808 * 4492
    # ray cost scales ~linearly with path length (grid diagonal):
    # crop fine diagonal ~ sqrt(286^2+334^2) ~ 440; weld ~ sqrt(3808^2+4492^2)
    ray_scale = float(np.hypot(3808, 4492) / np.hypot(*fine.shape))
    # NOTE: linear node-count scaling UNDERestimates the reference's
    # O(N log N) heap cost (log2 N grows 16.6 -> 24 from crop to full
    # workload), so est_py -- and every speedup quoted below -- is a
    # lower bound.
    est_py = 31 * (n_full / n_crop) * t_ttf + 961 * t_ray * ray_scale
    # TPU wall-clock to compare against: bench.py's measured value
    # (BENCH_r*.json); override when the bench number moves.
    tpu_s = float(os.environ.get("ALIFMM_TPU_S", sys.argv[1]
                                 if len(sys.argv) > 1 else 0.87))
    print(f"\nserial pure-python full-workload estimate: {est_py:,.0f} s "
          f"({est_py/3600:.1f} h)  [vs TPU {tpu_s} s from bench.py]")
    for k in (30, 100, 300):
        est = est_py / k
        print(f"  assuming numba = {k:>3}x python: serial CPU ~ {est:,.0f} s "
              f"-> speedup vs {tpu_s} s TPU = {est/tpu_s:,.0f}x")
    # >=50x target break-even: the numba-over-python factor at which the
    # speedup would drop to exactly 50x
    print(f"  >=50x holds for any numba factor < {est_py/(50*tpu_s):,.0f}x "
          "over pure Python")


if __name__ == "__main__":
    main()
