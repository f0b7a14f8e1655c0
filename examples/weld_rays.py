"""Weld example: 62-transducer array, 31 receiver travel-time fields, 961
ray paths -- the reference's production workload (Weld_rays.py:1-73),
running on the TPU-native engine (fields batched under one vmap, rays as
one device batch).

Saves trav_times.npy, ray_paths_x.npy, ray_paths_y.npy, ray_len.npy with
the reference's shapes/semantics (Weld_rays.py:69-72).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from alifmm_tpu import ALI_FMM  # noqa: E402

REF = "/root/reference"
DATA = os.path.join(os.path.dirname(__file__), "..", "bench_data")


def build_workload():
    veln = np.load(os.path.join(REF, "weld_veln.npy"))
    velpn = np.load(os.path.join(REF, "weld_velpn.npy")).astype(int)
    vel_map = np.load(os.path.join(REF, "weld_vel_map.npy"))
    stif_path = os.path.join(DATA, "weld_stif_den.npy")
    if not os.path.exists(stif_path):
        from make_weld_data import main as make_data

        make_data()
    stif_density = np.load(stif_path)

    # transducer geometry, mirroring Weld_rays.py:14-35
    dnx = 0.0002
    nnz, nnx = veln.shape
    n_trans = 31
    gap_len = 15
    center = nnx / 2
    trans_len = gap_len * (n_trans - 1)
    start_x = center - trans_len / 2
    end_x = center + trans_len / 2
    source_x = dnx * np.arange(start_x, end_x + gap_len / 2, gap_len)
    source_y = dnx * np.array([0, nnz - 1])
    sx = np.concatenate([source_x, source_x])
    sy = np.concatenate(
        [np.full(n_trans, source_y[0]), np.full(n_trans, source_y[1])]
    )

    # top->bottom pairs only (Weld_rays.py:52-55)
    trans_pairs = np.zeros((2 * n_trans, 2 * n_trans))
    trans_pairs[:n_trans, n_trans:] = 1
    return veln, velpn, vel_map, stif_density, sx, sy, trans_pairs, dnx


def main(out_dir=".", ttf_mode="interp"):
    from alifmm_tpu.utils import io as iolib

    iolib.enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache")
    )
    veln, velpn, vel_map, stif_density, sx, sy, trans_pairs, dnx = (
        build_workload()
    )
    fm = ALI_FMM(
        veln, velpn, vel_map, sx, sy, stif_den=stif_density, dnx=dnx,
        ttf_mode=ttf_mode,
    )
    t0 = time.time()
    trav_times = fm.find_all_TTF_rays_parallel(
        veln, velpn, vel_map, stif_den=stif_density, n_threads=8,
        trans_pairs=trans_pairs,
    )
    wall = time.time() - t0
    print(f"31 TTFs + 961 rays in {wall:.3f}s")

    max_len = np.max(fm.ray_len)
    np.save(os.path.join(out_dir, "trav_times.npy"), trav_times)
    np.save(
        os.path.join(out_dir, "ray_paths_x.npy"),
        fm.ray_paths_x[:, :, :max_len],
    )
    np.save(
        os.path.join(out_dir, "ray_paths_y.npy"),
        fm.ray_paths_y[:, :, :max_len],
    )
    np.save(os.path.join(out_dir, "ray_len.npy"), fm.ray_len)
    return wall


if __name__ == "__main__":
    main()
