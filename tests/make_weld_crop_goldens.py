"""Generate committed golden files for the weld-crop accuracy tests.

Runs the reference (pure-Python oracle, see ref_shim) ONCE on a crop of
the real weld model and stores its travel-time fields / ray paths under
tests/golden/.  The test suite then replays the comparison cheaply.

Why a table-material substitution: the un-jitted oracle cannot run the
stiffness/density code path (ref_shim docstring), but every weld cell has
vel_map == 1.0, so giving weld cells (velpn == 0) a table material whose
361-row group/phase curves are the austenite Christoffel closed forms is
*mathematically identical* to the stif_den path up to the reference's own
1-degree table interpolation (the same representation its tutorial uses,
Ray tracing example.ipynb cells 24-30; curves via ALI_FMM.generate_group_vel
/ generate_phase_vel, Anis_TTF_rays.py:4112-4206).

Usage:  python tests/make_weld_crop_goldens.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ref_shim import load_reference  # noqa: E402

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

# Crop of the real weld model: top-of-weld region -- curved weld/parent
# boundary, strongly rotating grain orientation, parent metal on both
# sides, and the transducer row z=0 on the crop edge.
ROWS = slice(0, 96)
COLS = slice(200, 312)
DNX = 2e-4  # Weld_rays.py:16

# Austenitic stainless weld stiffness (MPa) + density -- the same row
# examples/make_weld_data.py synthesises (upstream weld_stif_den.npy is
# missing from the mirror).
C22, C23, C33, C44, RHO = 263000, 148000, 216000, 129000, 8100

# golden sources (crop grid indices) for travel(): INTERIOR only -- the
# reference's travel() stage-1 passes nnx1 for nnz at one update() call
# site (Anis_TTF_rays.py:1645), which indexes out of bounds whenever the
# clamped source patch is non-square (any edge source).  numba compiles
# that to silent out-of-bounds reads; pure Python raises.  The weld
# production path (travel_finer_grid) passes the shapes correctly, so the
# fine-grid golden below does use an edge (transducer-row) source.
SOURCES = ((40, 30), (30, 80))
# fine-grid golden: one source, subgrid 3, a few rays to receivers
FINE_SOURCE = (0, 56)
FINE_SUBGRID = 3
RAY_RECEIVERS = ((95, 20), (95, 56), (95, 100))


def build_crop_tables():
    """Crop model + 361-row velocity tables (col 1 parent iso, col 2 weld)."""
    veln = np.load(os.path.join(REF, "weld_veln.npy"))[ROWS, COLS]
    velpn = np.load(os.path.join(REF, "weld_velpn.npy"))[ROWS, COLS]
    vel_map = np.load(os.path.join(REF, "weld_vel_map.npy"))[ROWS, COLS]
    # weld cells -> table material 2 (austenite curves, Pa inputs)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "alifmm_tpu"))
    from alifmm_tpu import materials as mats

    g = np.ones((361, 3))
    p = np.ones((361, 3))
    g[:, 0] = np.arange(361)
    p[:, 0] = np.arange(361)
    g[:, 2] = mats.generate_group_vel_curve(
        C22 * 1e6, C23 * 1e6, C33 * 1e6, C44 * 1e6, RHO
    )
    p[:, 2] = mats.generate_phase_vel_curve(
        C22 * 1e6, C23 * 1e6, C33 * 1e6, C44 * 1e6, RHO
    )
    velpn_tab = np.where(velpn == 0, 2, 1).astype(int)
    return veln, velpn_tab, vel_map, g, p


def main():
    ref = load_reference()
    veln, velpn, vel_map, g, p = build_crop_tables()
    Z, X = veln.shape
    os.makedirs(OUT, exist_ok=True)

    fields = []
    for sz, sx in SOURCES:
        t0 = time.time()
        nsts = np.zeros((Z, X), dtype=int)
        btg = np.zeros((round(0.5 * Z * X) + 8, 2), dtype=int)
        ttn = np.zeros((Z, X))
        out = ref.travel(
            sx * DNX, sz * DNX, nsts, btg, 0, ttn, veln, velpn, vel_map,
            None, g, p, 0, 0, DNX, DNX, X, Z,
        )
        fields.append(np.array(out))
        print(f"oracle travel ({sz},{sx}): {time.time()-t0:.1f}s", flush=True)

    # fine-grid oracle + rays
    sz, sx = FINE_SOURCE
    s = FINE_SUBGRID
    t0 = time.time()
    fine = ref.travel_finer_grid(
        sx * DNX, sz * DNX, veln, velpn, vel_map, None, s, g, p,
        0, 0, DNX, DNX,
    )
    fine = np.array(fine)
    print(f"oracle travel_finer_grid: {time.time()-t0:.1f}s", flush=True)

    rays_x, rays_y, times = [], [], []
    for rz, rx in RAY_RECEIVERS:
        t0 = time.time()
        ray_x, ray_y, t = ref.find_ray(
            DNX, g, np.array([float(rx * s), float(rz * s)]),
            np.array([float(sx * s), float(sz * s)]),
            fine, veln, velpn, vel_map, None, s,
        )
        rays_x.append(np.array(ray_x))
        rays_y.append(np.array(ray_y))
        times.append(float(t))
        print(f"oracle find_ray ->({rz},{rx}): t={t:.3e} len={len(ray_x)} "
              f"({time.time()-t0:.1f}s)", flush=True)

    # pad variable-length rays to a common length for storage
    ray_lens = np.array([len(r) for r in rays_x])
    P = int(ray_lens.max())
    rays_x = [np.pad(r, (0, P - len(r))) for r in rays_x]
    rays_y = [np.pad(r, (0, P - len(r))) for r in rays_y]

    np.savez_compressed(
        os.path.join(OUT, "weld_crop.npz"),
        rows=np.array([ROWS.start, ROWS.stop]),
        cols=np.array([COLS.start, COLS.stop]),
        dnx=DNX,
        sources=np.array(SOURCES),
        fields=np.stack(fields),
        fine_source=np.array(FINE_SOURCE),
        fine_subgrid=s,
        fine_field=fine,
        ray_receivers=np.array(RAY_RECEIVERS),
        ray_x=np.stack(rays_x),
        ray_y=np.stack(rays_y),
        ray_lens=ray_lens,
        ray_times=np.array(times),
        group_tab=g,
        phase_tab=p,
    )
    print("wrote", os.path.join(OUT, "weld_crop.npz"))


if __name__ == "__main__":
    main()
