"""Synthesise the weld stiffness/density map.

The upstream mirror of the reference repository is missing
``weld_stif_den.npy`` (large blob); its required shape and dtype are
(424, 500, 5) int64 per Weld_rays.py:12 and the ALI_FMM int64 validation
(Anis_TTF_rays.py:3820-3824).  This script reconstructs a physically
sensible equivalent from the available maps: every weld-metal point
(velpn == 0) gets the stiffness row of a transversely isotropic austenitic
stainless weld (values in MPa, density in kg/m^3); parent-metal points
(velpn == 1, isotropic via vel_map) get the same row, which is never used
there.  The anisotropic ORIENTATION comes from weld_veln.npy as in the
reference workload.

Run once to produce bench_data/weld_stif_den.npy.
"""

import os

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "bench_data")

# Austenitic stainless weld metal (literature-typical), MPa + kg/m^3:
# c22, c23, c33, c44, density
AUSTENITE = np.array([263000, 148000, 216000, 129000, 8100], dtype=np.int64)


def main():
    velpn = np.load(os.path.join(REF, "weld_velpn.npy"))
    Z, X = velpn.shape
    stif = np.zeros((Z, X, 5), dtype=np.int64)
    stif[:, :] = AUSTENITE
    os.makedirs(OUT, exist_ok=True)
    np.save(os.path.join(OUT, "weld_stif_den.npy"), stif)
    print("wrote", os.path.join(OUT, "weld_stif_den.npy"), stif.shape, stif.dtype)


if __name__ == "__main__":
    main()
