"""Size-scaled FMC example smoke (BASELINE config "Full 64-element
transducer array: vmapped multi-source TTFs + batched rays (FMC)").

Runs examples/fmc_rays.py ``main`` end-to-end -- default upper-triangle
pairing (Anis_TTF_rays.py:4291-4297), fused fields+rays, npy artifact
save -- on a real weld-model crop with 4 transducers, the same
size-scaling pattern as the executed tutorial notebook test.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.join(HERE, "..", "examples")
sys.path.insert(0, EXAMPLES)

REF = "/root/reference"
DATA = os.path.join(HERE, "..", "bench_data")


def _crop_workload():
    """4-transducer FMC workload on a crop of the real weld model."""
    r0, r1, c0, c1 = 0, 48, 222, 278
    veln = np.load(os.path.join(REF, "weld_veln.npy"))[r0:r1, c0:c1]
    velpn = np.load(os.path.join(REF, "weld_velpn.npy"))[r0:r1, c0:c1]
    vel_map = np.load(os.path.join(REF, "weld_vel_map.npy"))[r0:r1, c0:c1]
    stif_path = os.path.join(DATA, "weld_stif_den.npy")
    if not os.path.exists(stif_path):
        from make_weld_data import main as make_data

        make_data()
    stif = np.load(stif_path)[r0:r1, c0:c1]
    dnx = 2e-4
    nnz, nnx = veln.shape
    # 2 top + 2 bottom transducers, all inside the crop
    sx = dnx * np.array([10.0, nnx - 11.0, 10.0, nnx - 11.0])
    sy = dnx * np.array([0.0, 0.0, nnz - 1.0, nnz - 1.0])
    return veln, velpn.astype(int), vel_map, stif, sx, sy, dnx


def test_fmc_example_runs(tmp_path):
    import fmc_rays

    workload = _crop_workload()
    veln, velpn, vel_map, stif, sx, sy, dnx = workload
    n = len(sx)

    # small-grid budgets: modest solver budget, short-stride rays
    t_warm = fmc_rays.main(
        out_dir=str(tmp_path),
        workload=workload,
        subgrid_size=3,
        solve_opts=dict(final_rel_tol=1e-4, final_polish_passes=3),
        ray_opts=dict(max_steps=220, step_scale=2, max_cross=6),
    )
    assert t_warm > 0

    times = np.load(tmp_path / "fmc_trav_times.npy")
    ray_len = np.load(tmp_path / "fmc_ray_len.npy")
    rx = np.load(tmp_path / "fmc_ray_paths_x.npy")
    ry = np.load(tmp_path / "fmc_ray_paths_y.npy")
    assert times.shape == (n, n)
    assert ray_len.shape == (n, n)
    assert rx.shape[:2] == (n, n) and ry.shape[:2] == (n, n)

    # every upper-triangle pair got a ray and a physically sane time:
    # bounded below by the straight-line time at the fastest speed and
    # above by twice the straight-line time at the slowest speed
    vmax, vmin = 6500.0, 1500.0
    for i in range(n):
        for j in range(i + 1, n):
            d = np.hypot(sx[i] - sx[j], sy[i] - sy[j])
            t = times[i, j]
            assert ray_len[i, j] >= 2, (i, j)
            assert d / vmax * 0.99 < t < 2.0 * d / vmin, (i, j, t, d)

    # ray endpoints land on the transducers (original-grid coords)
    for i in range(n):
        for j in range(i + 1, n):
            L = int(ray_len[i, j])
            ends = {
                (round(rx[i, j, 0]), round(ry[i, j, 0])),
                (round(rx[i, j, L - 1]), round(ry[i, j, L - 1])),
            }
            want = {
                (round(sx[i] / dnx), round(sy[i] / dnx)),
                (round(sx[j] / dnx), round(sy[j] / dnx)),
            }
            assert ends == want, (i, j, ends, want)
